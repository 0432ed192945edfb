"""Java generics-erasure parity corpus — transcribed BY HAND from
javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/GenericsTests.scala
(one parity case per reference `in { }` block, citing its line range).

All goldens are the reference's erased-type spellings: type parameters
erase to their (first class-typed) bound or java.lang.Object, generic
types drop their argument lists in fullNames/signatures, wildcards erase
to the raw generic type.
"""

JQ = "javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying"
_S = f"{JQ}/GenericsTests.scala"

_UNRESOLVED_CODE = """import box.Box;

public class Foo {
  public static void test() {
    Box<Integer> b = new Box<>(0);
    b.get();
  }
}
"""

_GENERIC_METHODS_CODE = """package foo;

class Foo {
  public <S, T> T foo(S s) { return null; }

  static void test(Foo f) {
      f.<Integer, String>foo(0);
  }
}
"""

_PARAMETERIZED_RET_CODE = """package foo;

class Box<T> {
  public <S> Box<S> into() { return null; }

  public T get() { return null; }

  static void test(Box<String> stringBox) {
    stringBox.<Integer>into().get();
  }
}
"""

_UNRESOLVED_VAR_CODE = """package foo;
import a.*;
import b.*;

class Foo {

  void foo(Bar<Integer> b) {
    b.bar();
  }
}
"""

_OLD_CODE = """import java.util.function.Function;

class Box<T> {

    private T item;

    public T getItem() {
        return item;
    }

    public void setItem(T item) {
        this.item = item;
    }

    public <G> Box<G> map(Function<T, G> f) {
        G newValue = f.apply(item);
        Box<G> newBox = new Box<G>();
        return newBox.withValue(newValue);
    }

    public Box<T> withValue(T value) {
        this.item = value;
        return this;
    }

    public String toString() {
        return "Box(" + item.toString() + ")";
    }

    public static <K extends Number> K idK(K item) {
        return item;
    }

    public static <K extends Number & Comparable> K idKC(K item) {
        return item;
    }

    public static <K extends Comparable> K idC(K item) {
        return item;
    }

    public static void testWildCard(Box<? extends Comparable> b) {
        System.out.println(b);
    }

    public static void testWildCardLower(Box<? super Integer> b) {
        System.out.println(b);
    }
}


public class Test extends Box<String> {}
"""


def _c(name, code, cite_lines, **rels):
    return dict(name=name, lang="java", wrap=False, code=code,
                cite=f"{_S}:{cite_lines}", **rels)


CASES = [
    # :18-20 — unresolved generic ctor uses the erased/unresolved signature.
    _c("java-gen-unresolved-ctor", _UNRESOLVED_CODE, "18-20",
       callmfn=[["<init>", "box.Box.<init>:<unresolvedSignature>(1)"]]),
    # :22-24
    _c("java-gen-unresolved-get", _UNRESOLVED_CODE, "22-24",
       callmfn=[["get", "box.Box.get:<unresolvedSignature>(0)"]]),
    # :26-28 — local b keeps the raw generic type.
    _c("java-gen-unresolved-local", _UNRESOLVED_CODE, "26-28",
       locals=[["test.b", "Box b|box.Box"]]),
    # :43-45 — generic method fullName erases S,T to Object.
    _c("java-gen-method-fullname", _GENERIC_METHODS_CODE, "43-45",
       methods=[["foo", "foo.Foo.foo:java.lang.Object(java.lang.Object)"],
                ["test", "foo.Foo.test:void(foo.Foo)"],
                ["<init>", "foo.Foo.<init>:void()"]]),
    # :47-51 — explicit type-argument call site erases identically.
    _c("java-gen-call-mfn", _GENERIC_METHODS_CODE, "47-51",
       callmfn=[["foo",
                 "foo.Foo.foo:java.lang.Object(java.lang.Object)"]]),
    # :68-73 — parameterized return types erase to the raw generic.
    _c("java-gen-parameterized-ret", _PARAMETERIZED_RET_CODE, "68-73",
       callmfn=[["into", "foo.Box.into:foo.Box()"],
                ["get", "foo.Box.get:java.lang.Object()"]]),
    # :89-91 — unresolved wildcard-imported generic parameter type.
    _c("java-gen-unresolved-param", _UNRESOLVED_VAR_CODE, "89-91",
       params=[["foo.b", "1:<unresolvedNamespace>.Bar:BY_SHARING"]]),
    # :93-97
    _c("java-gen-unresolved-call", _UNRESOLVED_VAR_CODE, "93-97",
       callmfn=[["bar",
                 "<unresolvedNamespace>.Bar.bar:<unresolvedSignature>(0)"]]),
    # :109-111 — generic member types erase to the raw generic.
    _c("java-gen-member", """
package foo;
class Box<T> {}

class Foo {
  Box<Integer> box;
}
""", "109-111",
       members=[["Foo.box", "foo.Box"]]),
    # :182-186 — generic typeDecl keeps the plain fullName.
    _c("java-gen-old-typedecl", _OLD_CODE, "182-186",
       tdowner=[["Box", "java-gen-old-typedecl.java:<global>"],
                ["Test", "java-gen-old-typedecl.java:<global>"]]),
    # :188-193
    _c("java-gen-old-getitem", _OLD_CODE, "188-193",
       methods=[["getItem", "Box.getItem:java.lang.Object()"]],
       msig=[["getItem", "java.lang.Object()"]]),
    # :195-204
    _c("java-gen-old-setitem", _OLD_CODE, "195-204",
       methods=[["setItem", "Box.setItem:void(java.lang.Object)"]],
       msig=[["setItem", "void(java.lang.Object)"]],
       params=[["setItem.item", "1:java.lang.Object:BY_SHARING"],
               ["setItem.this", "0:Box:BY_SHARING"]]),
    # :206-213
    _c("java-gen-old-map", _OLD_CODE, "206-213",
       methods=[["map", "Box.map:Box(java.util.function.Function)"]],
       msig=[["map", "Box(java.util.function.Function)"]],
       params=[["map.f", "1:java.util.function.Function:BY_SHARING"],
               ["map.this", "0:Box:BY_SHARING"]]),
    # :215-221 — `new Box<G>()` in map resolves to the local ctor; the
    # comment-documented apply/withValue fullnames are included as goldens.
    _c("java-gen-old-ctor", _OLD_CODE, "215-221",
       callmfn=[["<init>", "Box.<init>:void()"],
                ["apply",
                 "java.util.function.Function.apply:java.lang.Object(java.lang.Object)"],
                ["withValue", "Box.withValue:Box(java.lang.Object)"]]),
    # :223-228
    _c("java-gen-old-withvalue", _OLD_CODE, "223-228",
       methods=[["withValue", "Box.withValue:Box(java.lang.Object)"]],
       msig=[["withValue", "Box(java.lang.Object)"]]),
    # :230-235 — class upper bound erases to the bound.
    _c("java-gen-old-idk", _OLD_CODE, "230-235",
       methods=[["idK", "Box.idK:java.lang.Number(java.lang.Number)"]],
       msig=[["idK", "java.lang.Number(java.lang.Number)"]]),
    # :237-242 — compound bound erases to the first bound.
    _c("java-gen-old-idkc", _OLD_CODE, "237-242",
       methods=[["idKC", "Box.idKC:java.lang.Number(java.lang.Number)"]],
       msig=[["idKC", "java.lang.Number(java.lang.Number)"]]),
    # :244-249 — interface bound erases to the interface.
    _c("java-gen-old-idc", _OLD_CODE, "244-249",
       methods=[["idC",
                 "Box.idC:java.lang.Comparable(java.lang.Comparable)"]],
       msig=[["idC", "java.lang.Comparable(java.lang.Comparable)"]]),
    # :251-256 — `? extends` wildcard erases to the raw generic.
    _c("java-gen-old-wildcard", _OLD_CODE, "251-256",
       methods=[["testWildCard", "Box.testWildCard:void(Box)"]],
       msig=[["testWildCard", "void(Box)"]]),
    # :258-263 — `? super` wildcard erases to the raw generic.
    _c("java-gen-old-wildcard-lower", _OLD_CODE, "258-263",
       methods=[["testWildCardLower", "Box.testWildCardLower:void(Box)"]],
       msig=[["testWildCardLower", "void(Box)"]]),
    # :265-269 — generic inheritance drops the type arguments.
    _c("java-gen-old-inherit", _OLD_CODE, "265-269",
       inherits=[["Test", "Box"]]),
]
