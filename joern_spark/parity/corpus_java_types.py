"""Java type-node parity corpus — transcribed BY HAND from
javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/TypeTests.scala
(NewTypeTests + TypeTests; one parity case per reference `in { }` block).

TYPE-node assertions (cpg.typ...) reduce to the declaration-side facts the
TYPE nodes are derived from (member/local/parameter/return typeFullNames —
TypeEvalPass builds TYPE nodes from exactly these), so the goldens here
assert those spellings; typeDeclFullName == fullName is structural in both
engines.
"""

JQ = "javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying"
_S = f"{JQ}/TypeTests.scala"

_WILDCARD_TMPL = """
import java.net.URLClassLoader;

class Foo {{
  public void foo(URIClassLoader classLoader) {{
    Class<{bound}> cls = Class.forName("testName", true, classLoader);
    Object instance = cls.newInstance();
  }}
}}
"""

_VARARGS_CODE = """
class Foo {
  public static String[] foo(boolean b, String... items) {
    return b ? items : new String[1];
  }

  public void test(boolean b, String item1, String item2) {
    String[] items = foo(b, item1, item2);
  }
}
"""

_TYPES_CODE = """
 package foo;

 class Foo {
   Long x;

   Integer myFunc(Object param) {
     Double y;
     return 1;
   }

   void foo() {
     UnknownType.run();
   }

   public Foo() {
     super();
   }

   static void bar(int[] xs) {}

   static void baz(Foo[] fs) {}
 }

 class Bar extends A<B<C>> {
   public D<E<F>> foo() {

   }
   @Override
   public Class<?> getObjectType() {
     return Bar.class;
   }
 }
"""


def _c(name, code, cite_lines, **rels):
    return dict(name=name, lang="java", wrap=False, code=code,
                cite=f"{_S}:{cite_lines}", **rels)


CASES = [
    # :12-26 — unbounded wildcard smoke: `instance` stays Object.
    _c("java-type-wildcard-unbounded", _WILDCARD_TMPL.format(bound="?"),
       "12-26",
       nodetype={("instance", 0, "IDENTIFIER"): "java.lang.Object"},
       locals=[["foo.instance", "Object instance|java.lang.Object"]]),
    # :28-42 — lower-bounded wildcard smoke.
    _c("java-type-wildcard-lower",
       _WILDCARD_TMPL.format(bound="? super Integer"), "28-42",
       nodetype={("instance", 0, "IDENTIFIER"): "java.lang.Object"},
       locals=[["foo.instance", "Object instance|java.lang.Object"]]),
    # :44-58 — upper-bounded wildcard smoke.
    _c("java-type-wildcard-upper",
       _WILDCARD_TMPL.format(bound="? extends Number"), "44-58",
       nodetype={("instance", 0, "IDENTIFIER"): "java.lang.Object"},
       locals=[["foo.instance", "Object instance|java.lang.Object"]]),
    # :74-79 — varargs become an array type in the method signature.
    _c("java-type-varargs-sig", _VARARGS_CODE, "74-79",
       methods=[["foo",
                 "Foo.foo:java.lang.String[](boolean,java.lang.String[])"],
                ["test",
                 "Foo.test:void(boolean,java.lang.String,java.lang.String)"],
                ["<init>", "Foo.<init>:void()"]],
       msig=[["foo", "java.lang.String[](boolean,java.lang.String[])"],
             ["test", "void(boolean,java.lang.String,java.lang.String)"],
             ["<init>", "void()"]]),
    # :81-93 — the varargs parameter node keeps the `String... items` code
    # with an array typeFullName.
    _c("java-type-varargs-param", _VARARGS_CODE, "81-93",
       params=[["foo.b", "1:boolean:BY_VALUE"],
               ["foo.items", "2:java.lang.String[]:BY_SHARING"]],
       paramcode=[["foo.b", "boolean b"],
                  ["foo.items", "String... items"]]),
    # :95-100 — the call site carries the array-typed signature.
    _c("java-type-varargs-call", _VARARGS_CODE, "95-100",
       callmfn=[["foo",
                 "Foo.foo:java.lang.String[](boolean,java.lang.String[])"]]),
    # :102-116 — excess varargs arguments wrap in an arrayInitializer.
    _c("java-type-varargs-wrap", _VARARGS_CODE, "102-116",
       ast={("foo(b, item1, item2)", 0): ["b", "item1, item2"]},
       nodetype={("item1", 0, "IDENTIFIER"): "java.lang.String",
                 ("item2", 0, "IDENTIFIER"): "java.lang.String"}),
    # :118-130 — a lambda targeting the multi-abstract-method Comparator
    # adopts compare's erased int(Object,Object) signature.
    _c("java-type-lambda-sort", """
import java.util.ArrayList;

public class Test {
    public static void main(String[] args) {
        ArrayList<Integer> xs = new ArrayList<Integer>();
        xs.sort((o1, o2) -> o1 - o2);
    }
}
""", "118-130",
       methods=[["<lambda>0",
                 "Test.<lambda>0:int(java.lang.Object,java.lang.Object)"],
                ["main", "Test.main:void(java.lang.String[])"],
                ["<init>", "Test.<init>:void()"]]),
    # :174-179 — TYPE for the class itself.
    _c("java-type-class", _TYPES_CODE, "174-179",
       tdowner=[["Foo", "java-type-class.java:foo"],
                ["Bar", "java-type-class.java:foo"]]),
    # :181-186 + :209-212 — member typed java.lang.Long; Long's TYPE links
    # back to member x.
    _c("java-type-member", _TYPES_CODE, "181-186,209-212",
       members=[["Foo.x", "java.lang.Long"]]),
    # :188-193 + :214-217 — Integer return type.
    _c("java-type-return", _TYPES_CODE, "188-193,214-217",
       methods=[["myFunc", "foo.Foo.myFunc:java.lang.Integer(java.lang.Object)"]],
       nodetype={("RET", 0, "METHOD_RETURN"): "java.lang.Integer"}),
    # :195-200 + :219-222 — Object parameter type.
    _c("java-type-param", _TYPES_CODE, "195-200,219-222",
       params=[["myFunc.param", "1:java.lang.Object:BY_SHARING"],
               ["myFunc.this", "0:foo.Foo:BY_SHARING"]]),
    # :202-207 + :224-227 — Double local type.
    _c("java-type-local", _TYPES_CODE, "202-207,224-227",
       locals=[["myFunc.y", "Double y|java.lang.Double"]]),
    # :229-232 — unresolved identifier defaults to ANY.
    _c("java-type-unresolved", _TYPES_CODE, "229-232",
       nodetype={("UnknownType", 0, "IDENTIFIER"): "ANY"}),
    # :234-240 — primitive array parameter.
    _c("java-type-prim-array", _TYPES_CODE, "234-240",
       params=[["bar.xs", "1:int[]:BY_SHARING"]]),
    # :242-248 — reference array parameter resolves against the package.
    _c("java-type-ref-array", _TYPES_CODE, "242-248",
       params=[["baz.fs", "1:foo.Foo[]:BY_SHARING"]]),
    # :250-264 — super() in Foo's ctor resolves to java.lang.Object.<init>.
    _c("java-type-super-call", _TYPES_CODE, "250-264",
       callmfn=[["<init>", "java.lang.Object.<init>:void()"]]),
]
