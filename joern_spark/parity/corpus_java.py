"""Java parity corpus — transcribed BY HAND from the reference's javasrc2cpg
golden tests. The CFG/CDG/dominator case is the exact fixture program of
javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/CfgTests.scala
(lines 8-20) with its assertions:

* ``cdg``  — `cpg.call("sink").controlledBy.isCall` contains "y < 10" and
  "x < 10" (CfgTests.scala:22-26; a *contains* assertion → PARTIAL relation)
* ``domby`` — `cpg.call("sink").dominatedBy.isCall.code` shouldBe exactly
  {"x < 10", "y < 10"} (CfgTests.scala:36-38)
* ``dom``  — `cpg.call("sink").dominates` shouldBe empty (CfgTests.scala:32-34)
"""

CASES = [
    dict(
        name="java-cfg-dominators", lang="java", wrap=False,
        code="""
class Foo {
 int foo(int x, int y) {
  if (y < 10)
    return -1;
  if (x < 10) {
   sink(x);
  }
  System.out.println("foo");
  return 0;
 }
}
""",
        cdg={"sink(x)": ["y < 10", "x < 10"]},
        domby={"sink(x)": ["x < 10", "y < 10"]},
        dom={"sink(x)": []},
        # exact-count closure assertions (CfgTests.scala:28-30, 40-46):
        # controls(y < 10) ∩ call("sink") == 1; postDominates(println) == 10;
        # postDominates(method foo) == 0
        controls_count=[["y < 10", "sink", 1]],
        postdom_count={"System.out.println(\"foo\")": 10, "foo": 0},
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/CfgTests.scala:8-46",
    ),
    dict(
        name="java-calls", lang="java", wrap=False,
        code="""
class Bar {
  int add(int a, int b) { return a + b; }
  int twice(int a) { return add(a, a); }
  void go() { twice(3); missingHelper(); }
}
""",
        calls=[["twice", "add"], ["go", "twice"], ["go", "missingHelper"]],
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/CallTests.scala (caller/callee name pairs)",
    ),
    dict(
        name="java-method-fullnames", lang="java", wrap=False,
        code=""" class Foo {
   int foo(int param1, int param2) {
     return 1;
   }
 }

 class Bar {
   static int bar(int param1, int param2) {
     return 1;
   }
 }

 class Baz {
   void baz() {}
 }
""",
        methods=[["foo", "Foo.foo:int(int,int)"],
                 ["bar", "Bar.bar:int(int,int)"],
                 ["baz", "Baz.baz:void()"]],
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/MethodTests.scala:30-53 (fullName/signature format Util.scala:15-17)",
    ),
    dict(
        name="java-inherits", lang="java", wrap=False,
        code="""
class Base { void run() {} }
interface Marker {}
class Derived extends Base implements Marker {
  void run() {}
}
""",
        inherits=[["Derived", "Base"], ["Derived", "Marker"]],
        cite="x2cpg TypeHierarchyPass.scala:14-31; javasrc2cpg TypeDeclTests.scala (extends/implements -> inheritsFromTypeFullName)",
    ),
]

# --------------------------------------------------------------------------- #
# Default constructor + member-initializer lowering (verdict r2 item 5).
# --------------------------------------------------------------------------- #

CASES += [
    # MemberTests.scala:133-160 — a class with no constructor gets a default
    # `<init>` (fullName Foo.<init>:void()) whose body carries the non-static
    # member initializer as `this.x = 1` (fieldAccess(this, x) + literal);
    # the MEMBER node itself keeps no children.
    dict(
        name="java-default-ctor", lang="java", wrap=False,
        code="""
class Foo {
    int x = 1;
}""",
        methods=[["<init>", "Foo.<init>:void()"]],
        ast={"this.x = 1": ["this.x", "1"], ("this.x", 0): ["this", "x"]},
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/MemberTests.scala:133-160; TypeDeclTests.scala:355-375",
    ),
    # TypeDeclTests.scala:166-174 — interfaces get NO default constructor:
    # typeDecl("Foo").method.fullName is exactly [Foo.foo:void()]. The
    # empty-obj row registers `<init>` as an asserted subject, so a wrongly
    # synthesized interface constructor scores a false positive.
    dict(
        name="java-iface-no-ctor", lang="java", wrap=False,
        code="""
interface Foo {
  public void foo();
}""",
        methods=[["foo", "Foo.foo:void()"], ["<init>", ""]],
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/TypeDeclTests.scala:166-174",
    ),
    # MemberTests.scala:115-132 — member initializers are added once per
    # constructor: both `<init>` overloads carry their own `this.x = 1`.
    dict(
        name="java-ctor-member-init", lang="java", wrap=False,
        code="""
class Foo {
  int x = 1;

  public Foo() {}

  public Foo(int y) {
    this.x = y;
  }
}""",
        methods=[["<init>", "Foo.<init>:void()"], ["<init>", "Foo.<init>:void(int)"]],
        ast={("this.x = 1", 0): ["this.x", "1"],
             ("this.x = 1", 1): ["this.x", "1"]},
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/MemberTests.scala:115-132",
    ),
]

CASES += [
    # LambdaTests.scala:121-155 — the lambda captures exactly `fallback`
    # (the enclosing method's parameter); its own param `s` and the unused
    # outer `b` are NOT captured. Subject-scoped exact: a spurious capture
    # of `b` or `s` under <lambda>0 scores a false positive.
    dict(
        name="java-lambda-capture", lang="java", wrap=False,
        code="""
class Foo {
  void test1(String fallback, String b) {
    java.util.function.Function<String,String> f = s -> s + fallback;
  }
}""",
        captures=[["<lambda>0", "fallback"]],
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/LambdaTests.scala:121-155",
    ),
]

# --------------------------------------------------------------------------- #
# Round-3 breadth: querying-suite transcriptions (verdict item 5).
# --------------------------------------------------------------------------- #

JQ = "javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying"

CASES += [
    # TypeDeclTests.scala:314-438 — the nested-class fixture: package-
    # qualified fullnames, `$` binary names for nested types, forward
    # `extends` resolution within the file, implicit java.lang.Object when
    # no explicit superclass, inner-interface method fullnames, and the
    # deep default constructor.
    dict(
        name="java-typedecl-nested", lang="java", wrap=False,
        code="""
 package a.b.c.d;
 class Bar extends Woo {
   int x;
   int method () { return 1; }
 };
 class Woo {}

 public class OuterClass {
   interface InnerInterface {
     int id(int x);
   }

   class InnerClass implements InnerInterface {
     public int id(int x) {
       return x;
     }

     class InnerClass2 {}
   }

   public int method(int bbb) {
     InnerInterface innerInterface = new InnerClass();
     return innerInterface.id(bbb);
   }
   public static void main(String[] args) { }

 }
""",
        inherits=[
            ["Bar", "a.b.c.d.Woo"],                                   # :389
            ["OuterClass$InnerInterface", "java.lang.Object"],        # :409
            ["OuterClass$InnerClass", "java.lang.Object"],            # :423-426
            ["OuterClass$InnerClass", "a.b.c.d.OuterClass$InnerInterface"],
        ],
        methods=[
            ["id", "a.b.c.d.OuterClass$InnerInterface.id:int(int)"],  # :412
            ["id", "a.b.c.d.OuterClass$InnerClass.id:int(int)"],      # :430
            # one default `<init>` per ctor-less class (TypeDeclTests:355-375):
            ["<init>",
             "a.b.c.d.OuterClass$InnerClass$InnerClass2.<init>:void()"],  # :363
            ["<init>", "a.b.c.d.Bar.<init>:void()"],
            ["<init>", "a.b.c.d.Woo.<init>:void()"],
            ["<init>", "a.b.c.d.OuterClass.<init>:void()"],
            ["<init>", "a.b.c.d.OuterClass$InnerClass.<init>:void()"],
            ["main", "a.b.c.d.OuterClass.main:void(java.lang.String[])"],
        ],
        cite=f"{JQ}/TypeDeclTests.scala:314-438",
    ),
    # ArithmeticOperationsTests.scala:12-75 — operator call argument shapes
    # and the type-prefixed var-decl assignment codes.
    dict(
        name="java-arith-ops", lang="java", wrap=False,
        code="""
 class Foo {
   static void main(int argc, char argv) {
     int a = 1;
     int b = 2.0;
     int c = a + b;
     int d = c - a;
     int e = a * b;
     int f = b / a;
   }
 }
""",
        ast={
            ("a + b", 0, "CALL"): ["a", "b"],       # :42-54
            ("c - a", 0, "CALL"): ["c", "a"],       # :56-61
            ("a * b", 0, "CALL"): ["a", "b"],       # :63-68
            ("b / a", 0, "CALL"): ["b", "a"],       # :70-75
            ("int a = 1", 0, "CALL"): ["a", "1"],   # :27-40 + VarDeclTests:29
        },
        cite=f"{JQ}/ArithmeticOperationsTests.scala:12-75",
    ),
    # BooleanOperationsTests.scala:10-120 — one call node per comparison /
    # logical operator with exact literal/identifier children.
    dict(
        name="java-bool-ops", lang="java", wrap=False,
        code="""
 public class Foo {
   public static void main(String[] args) {
     boolean a = 1 == 2;
     boolean b = 3 != 4;
     boolean c = 5 > 6;
     boolean d = 7 < 8;
     boolean e = 9 >= 10;
     boolean f = 11 <= 12;
     boolean g = a && b;
     boolean h = c || d;
     boolean i = !h;
     boolean j = a && (b || c);
     boolean k = true;
   }
 }
""",
        ast={
            ("1 == 2", 0, "CALL"): ["1", "2"],     # :54-59
            ("3 != 4", 0, "CALL"): ["3", "4"],     # :61-66
            ("5 > 6", 0, "CALL"): ["5", "6"],      # :68-73
            ("7 < 8", 0, "CALL"): ["7", "8"],      # :75-80
            ("9 >= 10", 0, "CALL"): ["9", "10"],   # :82-87
            ("11 <= 12", 0, "CALL"): ["11", "12"], # :89-94
            ("a && b", 0, "CALL"): ["a", "b"],     # :96-102
            ("c || d", 0, "CALL"): ["c", "d"],     # :104-110
            ("!h", 0, "CALL"): ["h"],              # :112-117
        },
        cite=f"{JQ}/BooleanOperationsTests.scala:10-120",
    ),
    # ConditionalTests.scala:10-31 — ternary lowered to <operator>.conditional
    # with (condition, then, else) arguments.
    dict(
        name="java-ternary", lang="java", wrap=False,
        code="""
class Foo {
  public int foo(int x) {
    int y = (x > 5) ? 10 : 2 + 20;
    return y;
  }
}
""",
        ast={
            ("(x > 5) ? 10 : 2 + 20", 0, "CALL"): ["x > 5", "10", "2 + 20"],
        },
        cite=f"{JQ}/ConditionalTests.scala:10-31",
    ),
    # ConditionalTests.scala:33-53 — ternary with fieldAccess branches.
    dict(
        name="java-ternary-fieldaccess", lang="java", wrap=False,
        code="""
class Foo {
  public int[] bar(boolean allowNull) {
    int[] y = allowNull ? this.cache : this.cacheNoNull;
    return y;
  }
}
""",
        ast={
            ("allowNull ? this.cache : this.cacheNoNull", 0, "CALL"):
                ["allowNull", "this.cache", "this.cacheNoNull"],
        },
        cite=f"{JQ}/ConditionalTests.scala:33-53",
    ),
    # FieldAccessTests.scala:9-68 — static / object field accesses lower to
    # <operator>.fieldAccess(identifier, fieldIdentifier).
    dict(
        name="java-field-access", lang="java", wrap=False,
        code="""
class Foo {
  public static int MAX_VALUE = 12;
  public int value;

  public void setValue(int value) {
    if (value <= MAX_VALUE) {
      this.value = value;
    }
  }
}

class Test {
public void foo() {
  int x = Foo.MAX_VALUE;
}

public void bar() {
  Foo f = new Foo(5);
  int y = f.value;
}

public void baz() {
  Foo g = new Foo(5);
  g.value = 66;
}
}
""",
        ast={
            ("Foo.MAX_VALUE", 0, "CALL"): ["Foo", "MAX_VALUE"],  # :46-52
            ("f.value", 0, "CALL"): ["f", "value"],              # :54-60
            ("g.value", 0, "CALL"): ["g", "value"],              # :62-68
        },
        cite=f"{JQ}/FieldAccessTests.scala:9-68",
    ),
    # LiteralTests.scala:10-64 — every Java literal form keeps its exact
    # source spelling as the literal code, under the type-prefixed var-decl
    # assignment.
    dict(
        name="java-literals", lang="java", wrap=False,
        code="""
class Test {
  public void foo() {
    byte a = 0b10110010;
    short b = 0;
    int c = 0175;
    int d = 0xABCD;
    long e = 9223372036854775807;
    float f = 0.42f;
    double g = 11d;
    double h = 11.0;
    double i = 1.0e2D;
    char j = 'j';
    char k = 062;
    char l = '\\n';
    String m = "Hello, world!";
    String n = null;
    boolean o = true;
    boolean p = false;
  }
}
""",
        ast={
            ("byte a = 0b10110010", 0, "CALL"): ["a", "0b10110010"],
            ("short b = 0", 0, "CALL"): ["b", "0"],
            ("int c = 0175", 0, "CALL"): ["c", "0175"],
            ("int d = 0xABCD", 0, "CALL"): ["d", "0xABCD"],
            ("long e = 9223372036854775807", 0, "CALL"):
                ["e", "9223372036854775807"],
            ("float f = 0.42f", 0, "CALL"): ["f", "0.42f"],
            ("double g = 11d", 0, "CALL"): ["g", "11d"],
            ("double h = 11.0", 0, "CALL"): ["h", "11.0"],
            ("double i = 1.0e2D", 0, "CALL"): ["i", "1.0e2D"],
            ("char j = 'j'", 0, "CALL"): ["j", "'j'"],
            ("char k = 062", 0, "CALL"): ["k", "062"],
            ("char l = '\\n'", 0, "CALL"): ["l", "'\\n'"],
            ('String m = "Hello, world!"', 0, "CALL"):
                ["m", '"Hello, world!"'],
            ("String n = null", 0, "CALL"): ["n", "null"],
            ("boolean o = true", 0, "CALL"): ["o", "true"],
            ("boolean p = false", 0, "CALL"): ["p", "false"],
        },
        cite=f"{JQ}/LiteralTests.scala:10-64",
    ),
    # VarDeclTests.scala:11-31 — combined declaration+assignment.
    dict(
        name="java-vardecl-combined", lang="java", wrap=False,
        code="""
public class Foo {
      public void test1() {
           int x = 1;
      }
}
""",
        ast={("int x = 1", 0, "CALL"): ["x", "1"]},
        cite=f"{JQ}/VarDeclTests.scala:11-31",
    ),
    # VarDeclTests.scala:33-54 — separated declaration / assignment keeps
    # the plain `x = 1` code (no type prefix).
    dict(
        name="java-vardecl-separated", lang="java", wrap=False,
        code="""
public class Foo {
    public void test2() {
        int x;
        x = 1;
    }
}
""",
        ast={("x = 1", 0, "CALL"): ["x", "1"]},
        cite=f"{JQ}/VarDeclTests.scala:33-54",
    ),
    # VarDeclTests.scala:86-115 — mixed declarators in one statement: only
    # the initialized declarator produces an `int y = 4` assignment; the
    # plain `x = 1` / `z = 2` statements stay unprefixed.
    dict(
        name="java-vardecl-mixed", lang="java", wrap=False,
        code="""
public class Foo {
    public void test4() {
        int x, y = 4, z;
        x = 1;
        z = 2;
    }
}
""",
        ast={
            ("int y = 4", 0, "CALL"): ["y", "4"],
            ("x = 1", 0, "CALL"): ["x", "1"],
            ("z = 2", 0, "CALL"): ["z", "2"],
        },
        cite=f"{JQ}/VarDeclTests.scala:86-115",
    ),
]

CASES += [
    # CallGraphTests.scala:9-43 — add called by main; main's named callees.
    dict(
        name="java-callgraph", lang="java", wrap=False,
        code="""
class Foo {
 int add(int x, int y) {
  return x + y;
 }
 int main(int argc, char argv) {
  System.out.println(add(1+2, 3));
 }
}
""",
        calls=[["main", "add"], ["main", "println"]],
        cite=f"{JQ}/CallGraphTests.scala:9-43",
    ),
    # ArrayTests.scala:11-53 — `new int[] {1, 2, 3}` IS the arrayInitializer
    # call with normalized code and the element literals as children.
    dict(
        name="java-array-init", lang="java", wrap=False,
        code="""
class Foo {
  public static void foo() {
    int[] xs;
    xs = new int[] {1, 2, 3};
  }
}
""",
        ast={("new int[] { 1, 2, 3 }", 0, "CALL"): ["1", "2", "3"]},
        cite=f"{JQ}/ArrayTests.scala:11-53",
    ),
    # ArrayTests.scala:56-78 — bare constant initializer `{0, 1, 2}`.
    dict(
        name="java-array-init-bare", lang="java", wrap=False,
        code="""
class Foo {
  public void foo() {
    int[] x = {0, 1, 2};
  }
}
""",
        ast={("{ 0, 1, 2 }", 0, "CALL"): ["0", "1", "2"]},
        cite=f"{JQ}/ArrayTests.scala:56-78",
    ),
    # ArrayTests.scala:80-98 — dimensioned creation without initializer is
    # <operator>.alloc with the dimension expressions as arguments.
    dict(
        name="java-array-alloc", lang="java", wrap=False,
        code="""
public class Foo {
  public void bar() {
    int[][] x = new int[5][2];
  }
}
""",
        ast={("new int[5][2]", 0, "CALL"): ["5", "2"]},
        cite=f"{JQ}/ArrayTests.scala:80-98",
    ),
    # ArrayTests.scala:100-136 — Java subscripts are <operator>.indexAccess
    # with (identifier, index) arguments, on both assignment sides.
    dict(
        name="java-array-index", lang="java", wrap=False,
        code="""
class Foo {
  public void baz() {
    int[] x = new int[2];
    x[0] = 1;
    x[1] = x[0] + 2;
  }
}
""",
        ast={
            ("x[0]", 0, "CALL"): ["x", "0"],
            ("x[0]", 1, "CALL"): ["x", "0"],
            ("x[1]", 0, "CALL"): ["x", "1"],
        },
        cite=f"{JQ}/ArrayTests.scala:100-136",
    ),
    # ArrayTests.scala:138-160 — array `.length` lowers to <operator>.sizeOf
    # over the array identifier (not a fieldAccess).
    dict(
        name="java-array-length", lang="java", wrap=False,
        code="""
class Foo {
  public void foo(String[] xs) {
    int l = xs.length;
  }
}
""",
        ast={("xs.length", 0, "CALL"): ["xs"]},
        cite=f"{JQ}/ArrayTests.scala:138-160",
    ),
]

CASES += [
    # EnumTests.scala:8-29 — enums implicitly extend java.lang.Enum (not
    # java.lang.Object); the `code` keeps modifiers ("public enum FuzzyBool").
    dict(
        name="java-enum-inherits", lang="java", wrap=False,
        code="""
public enum FuzzyBool {
  TRUE,
  FALSE,
  MAYBE
}
""",
        inherits=[["FuzzyBool", "java.lang.Enum"]],
        cite=f"{JQ}/EnumTests.scala:8-29",
    ),
]

CASES += [
    # MethodReturnTests.scala:9-31 — RETURN node code keeps the trailing
    # semicolon ("return 1;") with the literal as its only child; the
    # method fullname carries the int return type.
    dict(
        name="java-method-return", lang="java", wrap=False,
        code="""class Foo {
  int foo() { return 1; }
}
""",
        ast={("return 1;", 0, "RETURN"): ["1"]},
        methods=[["foo", "Foo.foo:int()"]],
        cite=f"{JQ}/MethodReturnTests.scala:9-31",
    ),
]

# --------------------------------------------------------------------------- #
# Round-4 breadth blitz: BindingTests / MethodParameterTests /
# SynchronizedTests / ControlStructureTests transcriptions (verdict r3 #1/#2).
# --------------------------------------------------------------------------- #

CASES += [
    # BindingTests.scala:7-27 — overriding a generic interface method binds
    # BOTH the declared signature and the super's erased one, each targeting
    # the override.
    dict(
        name="java-bindings-generic", lang="java", wrap=False,
        code="""
import java.util.function.Consumer;

class SomeConsumer implements Consumer<Integer> {
  public void accept(Integer i) {}
}
""",
        bindings=[
            ["SomeConsumer:accept",
             "void(java.lang.Integer)->SomeConsumer.accept:void(java.lang.Integer)"],
            ["SomeConsumer:accept",
             "void(java.lang.Object)->SomeConsumer.accept:void(java.lang.Integer)"],
        ],
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/BindingTests.scala:7-27",
    ),
    # BindingTests.scala:29-77 — a bounded-generic chain: OtherConsumer
    # carries its own erasure plus BOTH inherited erasures, all re-targeted
    # at its override; SomeConsumer keeps two.
    dict(
        name="java-bindings-chain", lang="java", wrap=False,
        code="""
import java.util.function.Consumer;

class SomeConsumer<I extends Number> implements Consumer<I> {
  public void accept(I i) {}
}

class OtherConsumer<U extends Integer> implements SomeConsumer<U> {
  public void accept(U i) {}
}
""",
        bindings=[
            ["SomeConsumer:accept",
             "void(java.lang.Number)->SomeConsumer.accept:void(java.lang.Number)"],
            ["SomeConsumer:accept",
             "void(java.lang.Object)->SomeConsumer.accept:void(java.lang.Number)"],
            ["OtherConsumer:accept",
             "void(java.lang.Integer)->OtherConsumer.accept:void(java.lang.Integer)"],
            ["OtherConsumer:accept",
             "void(java.lang.Number)->OtherConsumer.accept:void(java.lang.Integer)"],
            ["OtherConsumer:accept",
             "void(java.lang.Object)->OtherConsumer.accept:void(java.lang.Integer)"],
        ],
        cite="javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/BindingTests.scala:29-77",
    ),
]

CASES += [
    # BindingTable.scala createBindingTable: a plain (non-generic) override
    # re-targets the inherited row; a non-overridden method is inherited
    # as-is, still pointing at the super's implementation.
    dict(
        name="java-bindings-plain-override", lang="java", wrap=False,
        code="""
class BindBase {
  public int f(int x) { return x; }
  public int g() { return 0; }
}

class BindSub extends BindBase {
  public int f(int x) { return x + 1; }
}
""",
        bindings=[
            ["BindBase:f", "int(int)->BindBase.f:int(int)"],
            ["BindBase:g", "int()->BindBase.g:int()"],
            ["BindSub:f", "int(int)->BindSub.f:int(int)"],
            ["BindSub:g", "int()->BindBase.g:int()"],
        ],
        cite="javasrc2cpg/.../util/BindingTable.scala (createBindingTable)",
    ),
    # BindingTableAdapterImpls.scala: constructors never flow down the
    # hierarchy — BindCtorSub binds ONLY its own void() <init>, not the
    # super's void(int) one (an inherited ctor row would be an FP here
    # because the subject BindCtorSub:<init> is asserted).
    dict(
        name="java-bindings-ctor-noninherit", lang="java", wrap=False,
        code="""
class BindCtorBase {
  public BindCtorBase(int x) {}
  public int h() { return 1; }
}

class BindCtorSub extends BindCtorBase {
  public int h() { return 2; }
}
""",
        bindings=[
            ["BindCtorBase:<init>", "void(int)->BindCtorBase.<init>:void(int)"],
            ["BindCtorBase:h", "int()->BindCtorBase.h:int()"],
            ["BindCtorSub:<init>", "void()->BindCtorSub.<init>:void()"],
            ["BindCtorSub:h", "int()->BindCtorSub.h:int()"],
        ],
        cite="javasrc2cpg/.../util/BindingTableAdapterImpls.scala "
             "(constructor exclusion)",
    ),
    # Transitive chain with a gap: the middle class inherits the root's
    # method unchanged; the leaf's override re-targets rows inherited from
    # BOTH ancestors (DynamicCallLinker resolves through this closure).
    dict(
        name="java-bindings-deep-chain", lang="java", wrap=False,
        code="""
class ChainA {
  public int m(int x) { return x; }
}

class ChainB extends ChainA {
}

class ChainC extends ChainB {
  public int m(int x) { return 0; }
}
""",
        bindings=[
            ["ChainA:m", "int(int)->ChainA.m:int(int)"],
            ["ChainB:m", "int(int)->ChainA.m:int(int)"],
            ["ChainC:m", "int(int)->ChainC.m:int(int)"],
        ],
        cite="javasrc2cpg/.../util/BindingTable.scala + "
             "DynamicCallLinker.scala:37-42 (transitive closure)",
    ),
]

JQP = f"{JQ}/MethodParameterTests.scala"

CASES += [
    # MethodParameterTests.scala:8-50 — this/p1/p2 index, type, evaluation
    # strategy (primitives BY_VALUE, this BY_SHARING).
    dict(
        name="java-params-basic", lang="java", wrap=False,
        code="""
class Foo {
  int foo(int p1, int p2) {
     return 1;
  }
}
""",
        params=[["foo.this", "0:Foo:BY_SHARING"],
                ["foo.p1", "1:int:BY_VALUE"],
                ["foo.p2", "2:int:BY_VALUE"]],
        cite=f"{JQP}:8-50",
    ),
    # :52-63 — unbound generic method type -> java.lang.Object.
    dict(
        name="java-params-generic-unbound", lang="java", wrap=False,
        code="""
class Foo {
  <T> int foo(T p1) {
     return 1;
  }
}
""",
        params=[["foo.p1", "1:java.lang.Object:BY_SHARING"]],
        cite=f"{JQP}:52-63",
    ),
    # :65-77 — bounded generic method type -> the bound.
    dict(
        name="java-params-generic-bound", lang="java", wrap=False,
        code="""
class Foo {
  <T extends java.lang.Number> int foo(T p1) {
     return 1;
  }
}
""",
        params=[["foo.p1", "1:java.lang.Number:BY_SHARING"]],
        cite=f"{JQP}:65-77",
    ),
    # :79-91 — a bound that is itself a bounded type parameter chases
    # transitively.
    dict(
        name="java-params-generic-chained", lang="java", wrap=False,
        code="""
class Foo {
  <U extends java.lang.Number, T extends U> int foo(T p1) {
     return 1;
  }
}
""",
        params=[["foo.p1", "1:java.lang.Number:BY_SHARING"]],
        cite=f"{JQP}:79-91",
    ),
    # :93-106 — class-level unbound type parameter -> java.lang.Object.
    dict(
        name="java-params-class-generic", lang="java", wrap=False,
        code="""
class Foo<T> {
  int foo(T p1) {
     return 1;
  }
}
""",
        params=[["foo.p1", "1:java.lang.Object:BY_SHARING"]],
        cite=f"{JQP}:93-106",
    ),
    # :108-121 — class-level bounded type parameter -> the bound.
    dict(
        name="java-params-class-generic-bound", lang="java", wrap=False,
        code="""
class Foo<T extends java.lang.Number> {
  int foo(T p1) {
     return 1;
  }
}
""",
        params=[["foo.p1", "1:java.lang.Number:BY_SHARING"]],
        cite=f"{JQP}:108-121",
    ),
    # :123-136 — class-level chained bound.
    dict(
        name="java-params-class-generic-chained", lang="java", wrap=False,
        code="""
class Foo<U extends java.lang.Number, T extends U> {
  int foo(T p1) {
     return 1;
  }
}
""",
        params=[["foo.p1", "1:java.lang.Number:BY_SHARING"]],
        cite=f"{JQP}:123-136",
    ),
    # :139-151 — imported external type.
    dict(
        name="java-params-imported", lang="java", wrap=False,
        code="""
import foo.bar.Baz;
class Main {
 void run(Baz p1) {}
}
""",
        params=[["run.p1", "1:foo.bar.Baz:BY_SHARING"]],
        cite=f"{JQP}:139-151",
    ),
    # :167-179 — imported external generic type keeps only the raw type.
    dict(
        name="java-params-imported-generic", lang="java", wrap=False,
        code="""
import foo.bar.Baz;
class Main {
  void run(Baz<String> p1) {}
}
""",
        params=[["run.p1", "1:foo.bar.Baz:BY_SHARING"]],
        cite=f"{JQP}:167-179",
    ),
]

CASES += [
    # SynchronizedTests.scala:16-62 — a synchronized method parses like a
    # plain one; a synchronized statement lowers to a BLOCK holding the
    # SYNCHRONIZED modifier, the monitor expression and the body block.
    dict(
        name="java-synchronized", lang="java", wrap=False,
        code="""
public class Foo {
  public static synchronized String foo(String s) {
    return s;
  }

  public static String bar(String s) {
    synchronized (this) {
      s += "A";
    }
    return s;
  }
}
""",
        methods=[["foo", "Foo.foo:java.lang.String(java.lang.String)"],
                 ["bar", "Foo.bar:java.lang.String(java.lang.String)"]],
        params=[["foo.s", "1:java.lang.String:BY_SHARING"],
                ["bar.s", "1:java.lang.String:BY_SHARING"]],
        ast={("synchronized (this)", 0, "BLOCK"):
                 ["SYNCHRONIZED", "this", "<empty>"]},
        cite=f"{JQ}/SynchronizedTests.scala:16-62",
    ),
]

CASES += [
    # ControlStructureTests.scala:816-938 (old-style suite) — the classic
    # control-structure inventory: try/if/switch/for/while/do identification
    # plus break/continue codes and the complex boolean condition.
    dict(
        name="java-cs-inventory", lang="java", wrap=False,
        code="""
class Foo {
  int bar(boolean x, boolean y, boolean z) {
    if (x || (y && z)) {
      return 1;
    }
    return 2;
  }

  void foo(int x, int y) {
    try { } catch(Exception exc) {
    }

    for(int i = 0; i < 10; i++) {
      if (x > y) {
        continue;
      }
      while(y++ < x) {
        printf("foo");
      }
    }

    switch(y) {
      case 1:
        printf("bar");
        break;
      default:
    };

    int i = 0;
    do {
      i++;
    } while(i < 11);
  }

  public void elseTest(boolean b) {
    int x;
    if (b) {
      x = 42;
    } else {
      x = 39;
    }
  }
}
""",
        cs=[["foo:TRY", "try"],
            ["foo:SWITCH", "switch(y)"],
            ["foo:BREAK", "break;"],
            ["foo:CONTINUE", "continue;"],
            ["foo:FOR", "for (int i = 0; i < 10; i++)"],
            ["elseTest:IF", "if (b)"],
            ["bar:IF", "if (x || (y && z))"]],
        cscond=[["foo:IF", "x > y"],
                ["foo:FOR", "i < 10"],
                ["foo:WHILE", "y++ < x"],
                ["foo:DO", "i < 11"],
                ["foo:SWITCH", "y"],
                ["bar:IF", "x || (y && z)"],
                ["elseTest:IF", "b"]],
        # else branch is a plain false-body BLOCK (:920-938): the IF's
        # children are condition + then-block + else-block
        ast={("if (b)", 0, "CONTROL_STRUCTURE"): ["b", "<empty>"]},
        cite=f"{JQ}/ControlStructureTests.scala:816-938",
    ),
    # NewControlStructureTests:686-717 — if/else-if/else chain: the second
    # IF nests inside the first's false-body block.
    dict(
        name="java-if-elseif-else", lang="java", wrap=False,
        code="""
public class Foo {
  public static void foo(int c) {
    if (c > 10) {
      c -= 10;
    } else if (c < 10) {
      c += 10;
    } else {
      c = 10;
    }
  }
}
""",
        cs=[["foo:IF", "if (c > 10)"], ["foo:IF", "if (c < 10)"]],
        cscond=[["foo:IF", "c > 10"], ["foo:IF", "c < 10"]],
        ast={("if (c > 10)", 0, "CONTROL_STRUCTURE"): ["c > 10", "<empty>"],
             ("if (c < 10)", 0, "CONTROL_STRUCTURE"): ["c < 10", "<empty>"]},
        cite=f"{JQ}/ControlStructureTests.scala:686-717",
    ),
    # NewControlStructureTests:719-736 — do-while.
    dict(
        name="java-do-while", lang="java", wrap=False,
        code="""
public class Foo {
  public static void foo(int c) {
    do {
      c += 1;
    } while (c < 10);
  }
}
""",
        cs=[["foo:DO", "do"]],
        cscond=[["foo:DO", "c < 10"]],
        ast={("do", 0, "CONTROL_STRUCTURE"): ["<empty>", "c < 10"]},
        cite=f"{JQ}/ControlStructureTests.scala:719-736",
    ),
    # NewControlStructureTests:738-764 — try/catch/finally body wiring; the
    # catch/finally sub-structures hang off the TRY node in order.
    dict(
        name="java-try-catch-finally", lang="java", wrap=False,
        code="""
public class Foo {
  public static int foo(int c) {
    try {
      return 5 / c;
    } catch (Exception ex) {
      printf("catch");
    } finally {
      printf("finally");
    }
  }
}
""",
        cs=[["foo:TRY", "try"]],
        ast={("try", 0, "CONTROL_STRUCTURE"): ["<empty>", "catch", "finally"]},
        calls=[["foo", "printf"]],
        cite=f"{JQ}/ControlStructureTests.scala:738-764",
    ),
    # NewControlStructureTests:25-52 — multiple catches + finally; each arm's
    # calls stay inside the method.
    dict(
        name="java-try-multi-catch", lang="java", wrap=False,
        code="""
public class Foo {
  static void foo() {
    try { foo(); }
    catch (SomeException x1) { x1(); }
    catch (OtherException x2) { x2(); }
    finally { bar(); }
  }
}
""",
        cs=[["foo:TRY", "try"]],
        ast={("try", 0, "CONTROL_STRUCTURE"):
                 ["<empty>", "catch", "finally"]},
        calls=[["foo", "foo"], ["foo", "x1"], ["foo", "x2"], ["foo", "bar"]],
        cite=f"{JQ}/ControlStructureTests.scala:25-52",
    ),
    # NewControlStructureTests:766-783 — throw keeps the statement code and
    # carries the thrown expression as its argument.
    dict(
        name="java-throw", lang="java", wrap=False,
        code="""
public class Foo {
  public static void foo(Exception ex) {
    throw ex;
  }
}
""",
        cs=[["foo:THROW", "throw ex;"]],
        ast={("throw ex;", 0, "CONTROL_STRUCTURE"): ["ex"]},
        cite=f"{JQ}/ControlStructureTests.scala:766-783",
    ),
    # NewControlStructureTests:786-812 — classic for-loop full-header code.
    dict(
        name="java-for-classic", lang="java", wrap=False,
        code="""
public class Foo {
  public static int foo(int c) {
    for (int i = 0; i < c; i++) {
      printf("x", i);
    }
  }
}
""",
        cs=[["foo:FOR", "for (int i = 0; i < c; i++)"]],
        cscond=[["foo:FOR", "i < c"]],
        calls=[["foo", "printf"]],
        cite=f"{JQ}/ControlStructureTests.scala:786-812",
    ),
    # ControlStructureTests:940-954 — switch conditioned on `this`.
    dict(
        name="java-switch-on-this", lang="java", wrap=False,
        code="""
class Foo {
  public boolean isConnected() {
    switch (this) {
      case Reconnected:
        return true;

      case ConnectionLost:
      default:
        return false;
    }
  }
}
""",
        cs=[["isConnected:SWITCH", "switch(this)"]],
        cscond=[["isConnected:SWITCH", "this"]],
        cite=f"{JQ}/ControlStructureTests.scala:940-954",
    ),
    # ControlStructureTests:956-1027 — arrow-syntax switch expression lowers
    # to a MATCH control structure with selector + flat case body.
    dict(
        name="java-switch-arrow", lang="java", wrap=False,
        code="""
public class Foo {
  public String test(int x) {
    return switch (x) {
      case 1 -> "one";
      case 2 -> "two";
      default -> "other";
    };
  }
}
""",
        cs=[["test:MATCH", "switch(x)"]],
        cscond=[["test:MATCH", "x"]],
        ast={("switch(x)", 0, "CONTROL_STRUCTURE"): ["x", "<empty>"]},
        cite=f"{JQ}/ControlStructureTests.scala:956-1027",
    ),
]

# --------------------------------------------------------------------------- #
# GenericsTests / RecordTests / ConstructorInvocationTests / foreach /
# MethodParameterTests(java.util.*) transcriptions.
# --------------------------------------------------------------------------- #

JQG = f"{JQ}/GenericsTests.scala"

CASES += [
    # GenericsTests.scala:7-29 — unresolved external generic class: erased
    # call fullnames with <unresolvedSignature>(n); local keeps the raw type.
    dict(
        name="java-generics-unresolved-decl", lang="java", wrap=False,
        code="""import box.Box;

public class Foo {
  public static void test() {
    Box<Integer> b = new Box<>(0);
    b.get();
  }
}
""",
        callmfn=[["<init>", "box.Box.<init>:<unresolvedSignature>(1)"],
                 ["get", "box.Box.get:<unresolvedSignature>(0)"]],
        locals=[["test.b", "Box b|box.Box"]],
        cite=f"{JQG}:7-29",
    ),
    # :31-52 — generic method: erased fullname on the METHOD and the
    # explicit-type-arg call site.
    dict(
        name="java-generics-method", lang="java", wrap=False,
        code="""package foo;

class Foo {
  public <S, T> T foo(S s) { return null; }

  static void test(Foo f) {
      f.<Integer, String>foo(0);
  }
}
""",
        methods=[["foo", "foo.Foo.foo:java.lang.Object(java.lang.Object)"]],
        callmfn=[["foo", "foo.Foo.foo:java.lang.Object(java.lang.Object)"]],
        cite=f"{JQG}:31-52",
    ),
    # :54-74 — parameterized returns erase to the raw type in call
    # fullnames; chained calls resolve on the erased return.
    dict(
        name="java-generics-param-returns", lang="java", wrap=False,
        code="""package foo;

class Box<T> {
  public <S> Box<S> into() { return null; }

  public T get() { return null; }

  static void test(Box<String> stringBox) {
    stringBox.<Integer>into().get();
  }
}
""",
        callmfn=[["into", "foo.Box.into:foo.Box()"],
                 ["get", "foo.Box.get:java.lang.Object()"]],
        cite=f"{JQG}:54-74",
    ),
    # :76-97 — wildcard-import type stays <unresolvedNamespace>-prefixed in
    # both the parameter type and the call fullname.
    dict(
        name="java-generics-unresolved-var", lang="java", wrap=False,
        code="""package foo;
import a.*;
import b.*;

class Foo {

  void foo(Bar<Integer> b) {
    b.bar();
  }
}
""",
        params=[["foo.b", "1:<unresolvedNamespace>.Bar:BY_SHARING"]],
        callmfn=[["bar",
                  "<unresolvedNamespace>.Bar.bar:<unresolvedSignature>(0)"]],
        cite=f"{JQG}:76-97",
    ),
    # :99-112 — generic field types erase in member typeFullName.
    dict(
        name="java-generics-field", lang="java", wrap=False,
        code="""
package foo;
class Box<T> {}

class Foo {
  Box<Integer> box;
}
""",
        members=[["Foo.box", "foo.Box"]],
        cite=f"{JQG}:99-112",
    ),
    # :114-263 — the old generics suite: erasure across returns, params,
    # bounds, compound bounds, wildcards; constructor call; inheritance.
    dict(
        name="java-generics-old-suite", lang="java", wrap=False,
        code="""import java.util.function.Function;

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
""",
        methods=[
            ["getItem", "Box.getItem:java.lang.Object()"],          # :189-193
            ["setItem", "Box.setItem:void(java.lang.Object)"],      # :195-204
            ["map", "Box.map:Box(java.util.function.Function)"],    # :206-213
            ["withValue", "Box.withValue:Box(java.lang.Object)"],   # :223-228
            ["idK", "Box.idK:java.lang.Number(java.lang.Number)"],  # :230-235
            ["idKC", "Box.idKC:java.lang.Number(java.lang.Number)"],# :237-242
            ["idC",
             "Box.idC:java.lang.Comparable(java.lang.Comparable)"], # :244-249
            ["testWildCard", "Box.testWildCard:void(Box)"],         # :251-256
            ["testWildCardLower",
             "Box.testWildCardLower:void(Box)"],                    # :258-263
        ],
        params=[["setItem.item", "1:java.lang.Object:BY_SHARING"],  # :201-204
                ["map.f", "1:java.util.function.Function:BY_SHARING"]],
        callmfn=[["<init>", "Box.<init>:void()"]],                  # :215-221
        inherits=[["Test", "Box"]],                                 # :265-269
        cite=f"{JQG}:114-270",
    ),
]

CASES += [
    # MethodParameterTests.scala:153-165 — java.util.* wildcard import
    # resolves JDK collection types.
    dict(
        name="java-params-java-util-star", lang="java", wrap=False,
        code="""
import java.util.*;
class Main {
 void run(List<String> p1) {}
}
""",
        params=[["run.p1", "1:java.util.List:BY_SHARING"]],
        cite=f"{JQP}:153-165",
    ),
]

JQR = f"{JQ}/RecordTests.scala"

CASES += [
    # RecordTests.scala:10-131 — compact constructor: canonical params, the
    # synthesized `this.value = value` FIRST in the body, the private member,
    # the accessor method returning `this.value`, java.lang.Record supertype.
    dict(
        name="java-record-compact", lang="java", wrap=False,
        code="""
package foo;

record Foo(String value) {
  public Foo {
    System.out.println(value);
  }
}
""",
        inherits=[["Foo", "java.lang.Record"]],                       # :21-23
        methods=[["<init>", "foo.Foo.<init>:void(java.lang.String)"], # :26-27
                 ["value", "foo.Foo.value:java.lang.String()"]],      # :82-84
        params=[["<init>.this", "0:foo.Foo:BY_SHARING"],              # :29-34
                ["<init>.value", "1:java.lang.String:BY_SHARING"]],
        members=[["Foo.value", "java.lang.String"]],                  # :72-77
        calls=[["<init>", "println"]],                                # :61-66
        ast={("this.value = value", 0, "CALL"):
                 ["this.value", "value"],                             # :36-59
             ("return this.value", 0, "RETURN"): ["this.value"]},     # :101-112
        cite=f"{JQR}:10-131",
    ),
    # :133-217 — explicit non-canonical constructor COEXISTS with the
    # synthesized canonical one.
    dict(
        name="java-record-noncanonical", lang="java", wrap=False,
        code="""
package foo;

record Foo(String value) {
    public Foo() {
        this.value = "value";
    }
}
""",
        methods=[["<init>", "foo.Foo.<init>:void()"],                  # :147
                 ["<init>", "foo.Foo.<init>:void(java.lang.String)"],  # :179
                 ["value", "foo.Foo.value:java.lang.String()"]],
        ast={("this.value = \"value\"", 0, "CALL"):
                 ["this.value", "\"value\""]},                         # :153-175
        cite=f"{JQR}:133-217",
    ),
]

JQC = f"{JQ}/ConstructorInvocationTests.scala"

CASES += [
    # ConstructorInvocationTests.scala:111-127 — `new Foo(1)` resolves to the
    # declared ctor's fullname and signature.
    dict(
        name="java-ctor-invocation", lang="java", wrap=False,
        code="""
class Foo {
  Foo(long aaa) {
  }
  static void method() {
    Foo foo = new Foo(1);
  }
}
""",
        callmfn=[["<init>", "Foo.<init>:void(long)"]],
        methods=[["<init>", "Foo.<init>:void(long)"],
                 ["method", "Foo.method:void()"]],
        cite=f"{JQC}:111-127",
    ),
    # :179-243 — ctor overloads: fullnames, signatures, parameter names.
    dict(
        name="java-ctor-overloads", lang="java", wrap=False,
        code="""
class Foo {
  int x;

  public Foo(int x) {
    this.x = x;
  }

  public int getValue() {
    return x;
  }
}

class Bar extends Foo {
  public Bar(int x) {
  }

  public Bar(int x, int y) {
  }

  public static Bar id(Bar b) {
    return b;
  }

  public static void test1() {
    Bar b = new Bar(4, 2);
  }
}
""",
        methods=[["<init>", "Foo.<init>:void(int)"],
                 ["<init>", "Bar.<init>:void(int)"],        # :229-234
                 ["<init>", "Bar.<init>:void(int,int)"],    # :236-242
                 ["getValue", "Foo.getValue:int()"],
                 ["id", "Bar.id:Bar(Bar)"],
                 ["test1", "Bar.test1:void()"]],
        params=[["getValue.this", "0:Foo:BY_SHARING"],
                ["id.b", "1:Bar:BY_SHARING"]],
        inherits=[["Bar", "Foo"]],
        cite=f"{JQC}:179-243",
    ),
]

CASES += [
    # NewControlStructureTests:533-683 — foreach over a collection lowers to
    # iterator()/hasNext()/next() with the $iterLocal0 temp; the sink call
    # resolves statically.
    dict(
        name="java-foreach-collection", lang="java", wrap=False,
        code="""
import java.util.List;

public class Foo {
  public static void sink(String s) {}

  public static void foo(List<String> items) {
    for (String item : items) {
      sink(item);
    }
  }
}
""",
        locals=[["foo.$iterLocal0", "$iterLocal0|java.util.Iterator"],  # :548-557
                ["foo.item", "item|java.lang.String"]],                 # :636-639
        callmfn=[["iterator", "java.util.List.iterator:java.util.Iterator()"],  # :580-582
                 ["hasNext", "java.util.Iterator.hasNext:boolean()"],           # :605-607
                 ["next", "java.util.Iterator.next:java.lang.Object()"],        # :656-658
                 ["sink", "Foo.sink:void(java.lang.String)"],                   # :670-672
                 ["<operator>.assignment", "<operator>.assignment"]],
        cs=[["foo:WHILE", "while"]],
        cscond=[["foo:WHILE", "$iterLocal0.hasNext()"]],
        cite=f"{JQ}/ControlStructureTests.scala:533-683",
    ),
]

# --------------------------------------------------------------------------- #
# LocalTests / MethodTests / CallTests transcriptions.
# --------------------------------------------------------------------------- #

CASES += [
    # LocalTests.scala:7-30 — local name/code/typeFullName.
    dict(
        name="java-locals", lang="java", wrap=False,
        code="""
 class Foo {
   int foo() {
     int x;
     Integer y = null;
   }
 }
""",
        locals=[["foo.x", "int x|int"],
                ["foo.y", "Integer y|java.lang.Integer"]],
        cite=f"{JQ}/LocalTests.scala:7-30",
    ),
    # MethodTests.scala:77-92 — unqualified call from a nested class
    # resolves against the lexically enclosing class.
    dict(
        name="java-method-nested-call", lang="java", wrap=False,
        code="""
class Foo {
  static class Sub {
    void foo() {
      method(1);
    }
  }
  static void method(Integer x) {
  }
}
""",
        callmfn=[["method", "Foo.method:void(java.lang.Integer)"]],
        cite=f"{JQ}/MethodTests.scala:77-92",
    ),
    # MethodTests.scala:107-175 — generic/imported return types in method
    # fullnames and signatures.
    dict(
        name="java-method-return-types", lang="java", wrap=False,
        code="""
import java.util.*;
import foo.bar.Baz;
class Foo {
 List<String> run() {
   return null;
 }
 Baz<String> run2(Baz<String> x) {
   return x;
 }
}
""",
        methods=[["run", "Foo.run:java.util.List()"],
                 ["run2", "Foo.run2:foo.bar.Baz(foo.bar.Baz)"]],
        cite=f"{JQ}/MethodTests.scala:107-175",
    ),
]

JQCall = f"{JQ}/CallTests.scala"

CASES += [
    # CallTests.scala:136-151 — unresolved receivers: the unqualified call
    # prefixes the enclosing class; the chained member call on its unknown
    # result falls back to <unresolvedNamespace>.
    dict(
        name="java-call-unresolved-recv", lang="java", wrap=False,
        code="""
import a.*;

class Test {

  void test() {
    foo().bar();
  }
}
""",
        callmfn=[["foo", "Test.foo:<unresolvedSignature>(0)"],
                 ["bar", "<unresolvedNamespace>.bar:<unresolvedSignature>(0)"]],
        cite=f"{JQCall}:136-151",
    ),
    # :198-213 — varargs erase to an array parameter in the resolved call.
    dict(
        name="java-call-varargs", lang="java", wrap=False,
        code="""
class Test {
  void foo(String... inputs) {
    System.out.println(inputs.length);
  }

  void test() {
    foo("a", "b");
  }
}
""",
        callmfn=[["foo", "Test.foo:void(java.lang.String[])"]],
        methods=[["foo", "Test.foo:void(java.lang.String[])"]],
        cite=f"{JQCall}:198-213",
    ),
    # :345-407 (single-file adaptation) — hierarchy call resolution: a
    # member call on a Derived receiver resolves Base's method under the
    # receiver's static type; an unqualified call inside MoreDerived
    # resolves under MoreDerived.
    dict(
        name="java-call-hierarchy", lang="java", wrap=False,
        code="""
class Base {
  void method(int aaa) {}
}

class Derived extends Base {}

class MoreDerived extends Derived {
  void user2() {
    method(1);
  }
}

class User {
  static void user(Derived derived) {
    derived.method(1);
  }
}
""",
        callmfn=[["method", "Derived.method:void(int)"],
                 ["method", "MoreDerived.method:void(int)"]],
        inherits=[["Derived", "Base"], ["MoreDerived", "Derived"]],
        cite=f"{JQCall}:345-407",
    ),
]

# --------------------------------------------------------------------------- #
# Foreach / try-with-resources / enum / members / scope transcriptions.
# --------------------------------------------------------------------------- #

CASES += [
    # NewControlStructureTests:371-531 — foreach over a native array lowers
    # to the $idx0-indexed FOR with sizeOf condition and indexAccess body.
    dict(
        name="java-foreach-array", lang="java", wrap=False,
        code="""
public class Foo {
  public static void sink(String s) {}

  public static void foo(String[] items) {
    for (String item : items) {
      sink(item);
    }
  }
}
""",
        locals=[["foo.$idx0", "$idx0|int"],                       # :384-391
                ["foo.item", "String item|java.lang.String"]],    # :476-478
        callmfn=[["sink", "Foo.sink:void(java.lang.String)"],     # :511-513
                 ["<operator>.assignment", "<operator>.assignment"],
                 ["<operator>.lessThan", "<operator>.lessThan"],  # :422-425
                 ["<operator>.sizeOf", "<operator>.sizeOf"],      # :434-437
                 ["<operator>.postIncrement",
                  "<operator>.postIncrement"],                    # :453-456
                 ["<operator>.indexAccess", "<operator>.indexAccess"]],
        cscond=[["foo:FOR", "$idx0 < items.length"]],
        cite=f"{JQ}/ControlStructureTests.scala:371-531",
    ),
    # :169-369 — foreach over an array-initializer expression copies it into
    # $iterLocal0 first.
    dict(
        name="java-foreach-array-expr", lang="java", wrap=False,
        code="""
public class Foo {
  public static void sink(String s) {}

  public static void foo() {
    for (String item : new String[] {"a", "b", "c"}) {
      sink(item);
    }
  }
}
""",
        locals=[["foo.$iterLocal0", "$iterLocal0|java.lang.String[]"],  # :182-189
                ["foo.$idx0", "$idx0|int"],
                ["foo.item", "String item|java.lang.String"]],
        cscond=[["foo:FOR", "$idx0 < $iterLocal0.length"]],
        cite=f"{JQ}/ControlStructureTests.scala:169-369",
    ),
    # :54-124 — try-with-resources: one LOCAL + assignment + <init> per
    # resource, raw-type local codes.
    dict(
        name="java-try-with-resources", lang="java", wrap=False,
        code="""
import java.io.FileReader;
import java.io.IOException;
import java.io.BufferedReader;

public class Foo {
    static String foo(String path) throws IOException {
        try (FileReader fr = new FileReader(path);
             BufferedReader br = new BufferedReader(fr)) {
            return br.readLine();
        }
    }
}
""",
        locals=[["foo.fr", "FileReader fr|java.io.FileReader"],        # :81-83
                ["foo.br", "BufferedReader br|java.io.BufferedReader"]],  # :99-101
        callmfn=[["<init>",
                  "java.io.FileReader.<init>:<unresolvedSignature>(1)"],
                 ["<init>",
                  "java.io.BufferedReader.<init>:<unresolvedSignature>(1)"],
                 ["readLine",
                  "java.io.BufferedReader.readLine:<unresolvedSignature>(0)"]],
        cs=[["foo:TRY", "try"]],
        cite=f"{JQ}/ControlStructureTests.scala:54-124",
    ),
]

CASES += [
    # EnumTests.scala:8-29 + MemberTests basics — enum default ctor
    # fullname; member name/typeFullName inventory incl. statics.
    dict(
        name="java-enum-ctor", lang="java", wrap=False,
        code="""
public enum FuzzyBool {
  TRUE,
  FALSE,
  MAYBE
}
""",
        methods=[["<init>", "FuzzyBool.<init>:void()"]],
        inherits=[["FuzzyBool", "java.lang.Enum"]],
        cite=f"{JQ}/EnumTests.scala:8-29",
    ),
    # MemberTests.scala:10-35 — member typeFullNames (static + instance);
    # initializers move into the default ctor, the MEMBER keeps no children.
    dict(
        name="java-members", lang="java", wrap=False,
        code="""
class Foo {
  int x = 1;
  static int y;
  String s = "two";
}
""",
        members=[["Foo.x", "int"], ["Foo.y", "int"],
                 ["Foo.s", "java.lang.String"]],
        ast={("this.x = 1", 0, "CALL"): ["this.x", "1"],
             ("this.s = \"two\"", 0, "CALL"): ["this.s", "\"two\""]},
        cite=f"{JQ}/MemberTests.scala:10-35,133-160",
    ),
    # ScopeTests-style — locals keep their declaring block scope; inner
    # blocks see distinct locals; intra-class calls resolve, unknown names
    # get the enclosing-class unresolved fullname.
    dict(
        name="java-scopes", lang="java", wrap=False,
        code="""
class Foo {
  Integer method(Integer aaa) {
    Integer outerScope = counter();
    if (aaa == 1) {
      Integer irrelevantVariable = bbb();
    }
    return outerScope;
  }
  Integer counter() { return 1; }
}
""",
        locals=[["method.outerScope", "Integer outerScope|java.lang.Integer"],
                ["method.irrelevantVariable",
                 "Integer irrelevantVariable|java.lang.Integer"]],
        callmfn=[["counter", "Foo.counter:java.lang.Integer()"],
                 ["bbb", "Foo.bbb:<unresolvedSignature>(0)"],
                 ["<operator>.assignment", "<operator>.assignment"],
                 ["<operator>.equals", "<operator>.equals"]],
        cite=f"{JQ}/ScopeTests.scala (scope shapes); CallTests.scala:136-151 (unresolved prefix)",
    ),
]

CASES += [
    # CallTests "calls to instance methods in same class" (:283-330) —
    # implicit and explicit `this` receivers resolve identically.
    dict(
        name="java-call-this-receiver", lang="java", wrap=False,
        code="""
class Foo {
  public void test() {
    foo(42);
    this.foo(42);
  }

  public void foo(int x) {}
}
""",
        callmfn=[["foo", "Foo.foo:void(int)"]],
        calls=[["test", "foo"]],
        cite=f"{JQCall}:283-330",
    ),
    # NamespaceBlockTests / MethodTests — package-qualified fullnames on
    # interface methods; interface methods keep declared signatures.
    dict(
        name="java-package-interface", lang="java", wrap=False,
        code="""
package a.b;

interface Conn {
  int connect(String url);
}
""",
        methods=[["connect", "a.b.Conn.connect:int(java.lang.String)"]],
        params=[["connect.url", "1:java.lang.String:BY_SHARING"]],
        cite=f"{JQ}/NamespaceBlockTests.scala (package fullname scheme); TypeDeclTests.scala:166-174",
    ),
    # LambdaTests nested closures — the inner lambda captures BOTH the
    # enclosing method's parameter and the outer lambda's parameter.
    dict(
        name="java-lambda-nested-capture", lang="java", wrap=False,
        code="""
class Foo {
  void test1(String fallback) {
    java.util.function.Function<String,String> f = s -> {
      java.util.function.Function<String,String> g = t -> t + fallback + s;
      return g.apply(s);
    };
  }
}
""",
        captures=[["<lambda>1", "fallback"], ["<lambda>1", "s"]],
        cite=f"{JQ}/LambdaTests.scala:121-155 (capture rule, nested shape)",
    ),
    # ConditionalTests-adjacent: instanceof lowers to
    # <operator>.instanceOf with (expr, type) arguments
    # (SpecialOperatorTests.scala).
    dict(
        name="java-instanceof", lang="java", wrap=False,
        code="""
class Foo {
  public boolean foo(Object o) {
    return o instanceof String;
  }
}
""",
        ast={("o instanceof String", 0, "CALL"): ["o", "String"]},
        cite=f"{JQ}/SpecialOperatorTests.scala (instanceOf lowering)",
    ),
    # CastExpr — <operator>.cast with (TYPE_REF, expr) arguments
    # (SpecialOperatorTests.scala cast tests).
    dict(
        name="java-cast", lang="java", wrap=False,
        code="""
class Foo {
  public int foo(Object o) {
    int x = (int) o;
    return x;
  }
}
""",
        ast={("(int) o", 0, "CALL"): ["int", "o"]},
        cite=f"{JQ}/SpecialOperatorTests.scala (cast lowering)",
    ),
]

# --------------------------------------------------------------------------- #
# Round-4 breadth: ImportTests, java.lang resolution, static overloads,
# identifier/literal typeFullName golden values (nodetype relation).
# --------------------------------------------------------------------------- #

CASES += [
    # ImportTests.scala:9-37 — IMPORT nodes carry importedAs/importedEntity
    # and the semicolon-less code; wildcard imports keep importedAs "*".
    dict(
        name="java-imports", lang="java", wrap=False,
        code="""
package org.codeminers.controller;

import org.codeminers.thirdparty.ThirdParty;
import org.codeminers.thirdparty.util.*;

public class Controller {

    public void foo() {
        Request request = new Request();
        ThirdParty.getSgClient().api(request);
    }
}""",
        imports=[
            ["import org.codeminers.thirdparty.ThirdParty",
             "ThirdParty|org.codeminers.thirdparty.ThirdParty"],
            ["import org.codeminers.thirdparty.util.*",
             "*|org.codeminers.thirdparty.util"],
        ],
        cite=f"{JQ}/ImportTests.scala:9-37",
    ),
    # CallTests.scala:54-66 — static java.lang method resolved through the
    # implicit java.lang import with full JDK signature.
    dict(
        name="java-call-jdk-valueof", lang="java", wrap=False,
        code="""
class Test {
  public void test() {
    String.valueOf(true);
  }
}
""",
        callmfn=[["valueOf",
                  "java.lang.String.valueOf:java.lang.String(boolean)"]],
        cite=f"{JQCall}:54-66",
    ),
    # CallTests.scala:68-78 — instance method on a java.lang-typed receiver.
    dict(
        name="java-call-jdk-length", lang="java", wrap=False,
        code="""
class Test {
  public void test(String s) {
  s.length();
  }
}
""",
        callmfn=[["length", "java.lang.String.length:int()"]],
        cite=f"{JQCall}:68-78",
    ),
    # CallTests.scala:226-250 (single-file adaptation of the two-file
    # fixture) — static cross-class call picks the overload whose parameter
    # type matches the argument's static type.
    dict(
        name="java-call-static-overload", lang="java", wrap=False,
        code="""
public class Foo {
  public static Foo foo(String arg) {
    return new Foo();
  }

  public static Foo foo(int x) {
    return new Foo();
  }
}

class Bar {
  public static void bar(String barArg) {
    Foo.foo(barArg);
  }
}
""",
        callmfn=[["foo", "Foo.foo:Foo(java.lang.String)"]],
        cite=f"{JQCall}:226-250",
    ),
    # FieldAccessTests.scala:46-68 — the static-access receiver identifier
    # is TYPED as the class; object receivers keep their declared type.
    dict(
        name="java-field-access-types", lang="java", wrap=False,
        code="""
class Foo {
  public static int MAX_VALUE = 12;
  public int value;
}

class Test {
public void foo() {
  int x = Foo.MAX_VALUE;
}

public void bar() {
  Foo f = new Foo();
  int y = f.value;
}
}
""",
        nodetype={("Foo", 0, "IDENTIFIER"): "Foo",
                  ("f", 0, "IDENTIFIER"): "Foo"},
        ast={("Foo.MAX_VALUE", 0, "CALL"): ["Foo", "MAX_VALUE"],
             ("f.value", 0, "CALL"): ["f", "value"]},
        cite=f"{JQ}/FieldAccessTests.scala:46-68",
    ),
    # LiteralTests.scala:10-66 — identifier typeFullName for every literal
    # form's declared variable; `null` is a LITERAL (NullLiteralExpr ->
    # type "null", AstCreator.scala:349).
    dict(
        name="java-literal-ident-types", lang="java", wrap=False,
        code="""
class Test {
  public void foo() {
    byte a = 0b10110010;
    short b = 0;
    int c = 0175;
    int d = 0xABCD;
    long e = 9223372036854775807;
    float f = 0.42f;
    double g = 11d;
    double h = 11.0;
    double i = 1.0e2D;
    char j = 'j';
    char k = 062;
    char l = '\\n';
    String m = "Hello, world!";
    String n = null;
    boolean o = true;
    boolean p = false;
  }
}
""",
        nodetype={("a", 0, "IDENTIFIER"): "byte",
                  ("b", 0, "IDENTIFIER"): "short",
                  ("c", 0, "IDENTIFIER"): "int",
                  ("d", 0, "IDENTIFIER"): "int",
                  ("e", 0, "IDENTIFIER"): "long",
                  ("f", 0, "IDENTIFIER"): "float",
                  ("g", 0, "IDENTIFIER"): "double",
                  ("h", 0, "IDENTIFIER"): "double",
                  ("i", 0, "IDENTIFIER"): "double",
                  ("j", 0, "IDENTIFIER"): "char",
                  ("k", 0, "IDENTIFIER"): "char",
                  ("l", 0, "IDENTIFIER"): "char",
                  ("m", 0, "IDENTIFIER"): "java.lang.String",
                  ("n", 0, "IDENTIFIER"): "java.lang.String",
                  ("o", 0, "IDENTIFIER"): "boolean",
                  ("p", 0, "IDENTIFIER"): "boolean",
                  ("null", 0, "LITERAL"): "null"},
        cite=f"{JQ}/LiteralTests.scala:10-66",
    ),
]

# --------------------------------------------------------------------------- #
# MethodRefTests.scala — `A::b` METHOD_REF nodes.
# --------------------------------------------------------------------------- #

CASES += [
    # :9-35 (single-file adaptation of the two-file fixture; both classes
    # share package b) — resolved method ref: full signature + class type.
    dict(
        name="java-methodref-resolved", lang="java", wrap=False,
        code="""
package b;
class Bar {
  void bar(int x) {}
}

class Foo {
  void doNothing(Object c) {}

  void foo() {
    doNothing(Bar::bar);
  }
}
""",
        nodemfn={("Bar::bar", 0, "METHOD_REF"): "b.Bar.bar:void(int)"},
        nodetype={("Bar::bar", 0, "METHOD_REF"): "b.Bar"},
        cite=f"{JQ}/MethodRefTests.scala:9-35",
    ),
    # :37-60 — import-known type, unresolved member: signature-less
    # <unresolvedSignature> (no arity), type keeps the imported fullname.
    dict(
        name="java-methodref-known-type", lang="java", wrap=False,
        code="""
import b.Bar;

class Foo {
  void foo() {
    doNothing(Bar::bar);
  }
}
""",
        nodemfn={("Bar::bar", 0, "METHOD_REF"):
                 "b.Bar.bar:<unresolvedSignature>"},
        nodetype={("Bar::bar", 0, "METHOD_REF"): "b.Bar"},
        cite=f"{JQ}/MethodRefTests.scala:37-60",
    ),
    # :62-79 — fully unresolved method ref.
    dict(
        name="java-methodref-unresolved", lang="java", wrap=False,
        code="""
class Foo {
  void foo() {
    doNothing(Bar::bar);
  }
}
""",
        nodemfn={("Bar::bar", 0, "METHOD_REF"):
                 "<unresolvedNamespace>.bar:<unresolvedSignature>"},
        nodetype={("Bar::bar", 0, "METHOD_REF"): "ANY"},
        cite=f"{JQ}/MethodRefTests.scala:62-79",
    ),
    # :81-104 — instance method ref through a local receiver.
    dict(
        name="java-methodref-instance", lang="java", wrap=False,
        code="""
package foo;

public class Foo {
  void doNothing(Object c) {}

  void func(int x) {}

  void foo() {
    Foo f = new Foo();
    doNothing(f::func);
  }
}
""",
        nodemfn={("f::func", 0, "METHOD_REF"): "foo.Foo.func:void(int)"},
        nodetype={("f::func", 0, "METHOD_REF"): "foo.Foo"},
        cite=f"{JQ}/MethodRefTests.scala:81-104",
    ),
]

CASES += [
    # TypeTests.scala:62-121 — varargs: array-erased method/call signatures
    # AND the call-site lowering that packs trailing arguments into an
    # <operator>.arrayInitializer typed as the array parameter.
    dict(
        name="java-varargs-packing", lang="java", wrap=False,
        code="""
class Foo {
  public static String[] foo(boolean b, String... items) {
    return b ? items : new String[1];
  }

  public void test(boolean b, String item1, String item2) {
    String[] items = foo(b, item1, item2);
  }
}
""",
        methods=[["foo",
                  "Foo.foo:java.lang.String[](boolean,java.lang.String[])"]],
        callmfn=[["foo",
                  "Foo.foo:java.lang.String[](boolean,java.lang.String[])"]],
        params=[["foo.b", "1:boolean:BY_VALUE"],
                ["foo.items", "2:java.lang.String[]:BY_SHARING"]],
        ast={("foo(b, item1, item2)", 0, "CALL"): ["b", "item1, item2"],
             ("item1, item2", 0, "CALL"): ["item1", "item2"]},
        nodetype={("item1, item2", 0, "CALL"): "java.lang.String[]",
                  ("item1", 0, "IDENTIFIER"): "java.lang.String",
                  ("item2", 0, "IDENTIFIER"): "java.lang.String"},
        cite=f"{JQ}/TypeTests.scala:62-121",
    ),
]

# --------------------------------------------------------------------------- #
# CapturingTests.scala — lambda capture sets (captures relation: the
# exact set of enclosing-method declarations a closure references).
# --------------------------------------------------------------------------- #

CASES += [
    # :30-55 — explicit `this` in a lambda captures the enclosing `this`.
    dict(
        name="java-capture-this", lang="java", wrap=False,
        code="""
public class Foo {
  public void test() {
    Runnable r = () -> {
      System.out.println(this);
    };
  }
}
""",
        captures=[["<lambda>0", "this"]],
        cite=f"{JQ}/CapturingTests.scala:30-55",
    ),
    # :57-77 — `this.field` access captures `this`.
    dict(
        name="java-capture-this-field", lang="java", wrap=False,
        code="""
public class Foo {
  private String value = "test";

  public void test() {
    Runnable r = () -> {
      System.out.println(this.value);
    };
  }
}
""",
        captures=[["<lambda>0", "this"]],
        cite=f"{JQ}/CapturingTests.scala:57-77",
    ),
    # :79-99 — `this.method()` call captures `this`.
    dict(
        name="java-capture-this-call", lang="java", wrap=False,
        code="""
public class Foo {
  private void helper() {}

  public void test() {
    Runnable r = () -> {
      this.helper();
    };
  }
}
""",
        captures=[["<lambda>0", "this"]],
        cite=f"{JQ}/CapturingTests.scala:79-99",
    ),
    # :123-149 — try-with-resources: the lambda captures `path` but NOT
    # `reader` (declared inside the try resource clause). Exact-set: a
    # spurious reader capture is a false positive.
    dict(
        name="java-capture-try-resource", lang="java", wrap=False,
        code="""
import java.io.*;

public class Foo {
  public void test(String path) {
    Runnable r = () -> {
      try (BufferedReader reader = new BufferedReader(new FileReader(path))) {
        System.out.println(reader.readLine());
      } catch (IOException e) {
      }
    };
  }
}
""",
        captures=[["<lambda>0", "path"]],
        cite=f"{JQ}/CapturingTests.scala:123-149",
    ),
]

# --------------------------------------------------------------------------- #
# AnnotationTests.scala — ANNOTATION nodes with name/fullName/code and the
# parameter-assign tree (annot / annotkids relations).
# --------------------------------------------------------------------------- #

CASES += [
    # :31-72 — normal `k = v` annotation: node properties + parameterAssign
    # (code "value = \"classAnnotation\"") with ANNOTATION_PARAMETER "value"
    # and the quote-stripped AnnotationLiteral "classAnnotation".
    dict(
        name="java-annotation-normal", lang="java", wrap=False,
        code="""
import some.NormalAnnotation;
public class SomeClass {

  @NormalAnnotation(value = "classAnnotation")
  void function() {

  }
}
""",
        annot=[["function",
                'NormalAnnotation|some.NormalAnnotation|'
                '@NormalAnnotation(value = "classAnnotation")']],
        annotkids=[['@NormalAnnotation(value = "classAnnotation")',
                    'value = "classAnnotation"'],
                   ['value = "classAnnotation"', "value"],
                   ['value = "classAnnotation"', "classAnnotation"]],
        cite=f"{JQ}/AnnotationTests.scala:31-72",
    ),
    # :74-113 — single-value annotation: parameterAssign keeps the quoted
    # code, the implicit parameter is "value", the literal is stripped.
    dict(
        name="java-annotation-single", lang="java", wrap=False,
        code="""
import some.SingleAnnotation;
public class SomeClass {

  @SingleAnnotation("classAnnotation")
  void function() {

  }
}
""",
        annot=[["function",
                'SingleAnnotation|some.SingleAnnotation|'
                '@SingleAnnotation("classAnnotation")']],
        annotkids=[['@SingleAnnotation("classAnnotation")',
                    '"classAnnotation"'],
                   ['"classAnnotation"', "value"],
                   ['"classAnnotation"', "classAnnotation"]],
        cite=f"{JQ}/AnnotationTests.scala:74-113",
    ),
    # :115-138 — marker annotation `@MarkerAnnotation()`: no parameter
    # assigns (empty annotkids under the annotation = exact-set).
    dict(
        name="java-annotation-marker", lang="java", wrap=False,
        code="""
import some.MarkerAnnotation;
public class SomeClass {

  @MarkerAnnotation()
  void function() {

  }
}
""",
        annot=[["function",
                "MarkerAnnotation|some.MarkerAnnotation|@MarkerAnnotation()"]],
        annotkids=[],
        cite=f"{JQ}/AnnotationTests.scala:115-138",
    ),
    # :140-164 — constructor annotation attaches to <init>.
    dict(
        name="java-annotation-ctor", lang="java", wrap=False,
        code="""
import some.MarkerAnnotation;
public class SomeClass {

  @MarkerAnnotation()
  public SomeClass() {

  }
}
""",
        annot=[["<init>",
                "MarkerAnnotation|some.MarkerAnnotation|@MarkerAnnotation()"]],
        cite=f"{JQ}/AnnotationTests.scala:140-164",
    ),
    # :204-225 — integer-valued normal annotation.
    dict(
        name="java-annotation-int-value", lang="java", wrap=False,
        code="""
import some.NormalAnnotation;
public class SomeClass {

  @NormalAnnotation(value = 2)
  void function() {

  }
}
""",
        annot=[["function",
                "NormalAnnotation|some.NormalAnnotation|"
                "@NormalAnnotation(value = 2)"]],
        annotkids=[["@NormalAnnotation(value = 2)", "value = 2"],
                   ["value = 2", "value"],
                   ["value = 2", "2"]],
        cite=f"{JQ}/AnnotationTests.scala:204-225",
    ),
    # :9-29 (single-file adaptation: the @interface and its use share
    # package foo) — annotation type resolution through declared types.
    dict(
        name="java-annotation-resolved", lang="java", wrap=False,
        code="""
package foo;

@interface TestMarker {}

class Bar {
  @TestMarker
  public void bar() {}
}
""",
        annot=[["bar", "TestMarker|foo.TestMarker|@TestMarker"]],
        cite=f"{JQ}/AnnotationTests.scala:9-29",
    ),
]


CASES += [
    # AnonymousClassTests.scala:19-51 — anonymous classes under lambdas get
    # per-context `$N` indices and lambda-fullname prefixes.
    dict(
        name="java-anon-lambda", lang="java", wrap=False,
        code="""
package foo;

public class Foo {

    private static FirstProvider method1() {
        return firstTask -> {
            firstTask.doFirst(new Action() { });
        };
    }

    private SecondProvider method2() {
        return secondTask -> {
            secondTask.doSecond(new Action() { });
        };
    }
}
""",
        mcount=[("foo.Foo.<lambda>0.Action$0.<init>:void()", 1),
                ("foo.Foo.<lambda>1.Action$0.<init>:void()", 1)],
        cite="querying/AnonymousClassTests.scala:19-51 (mixed static/"
             "non-static anonymous classes as children of lambdas)",
    ),
    # :53-135 — anonymous class extending an interface in a method body:
    # naming, inheritance, bindings for the explicit method, the default
    # constructor's this/outerClass parameters and body, and the <init>
    # call site. (Argument-level lowering of the construction — receiver +
    # outerClass arguments at the call — is not asserted here: this engine
    # keeps the single-call `new` lowering.)
    dict(
        name="java-anon-interface", lang="java", wrap=False,
        code="""
package foo;

interface Bar {
  void bar();
}

class Foo {
  static void sink(String s) {}

  void foo() {
    Bar b = new Bar() {
      public void bar() {
        sink("BAR");
      }
    };

    b.bar();
  }
}
""",
        inherits=[("Bar", "java.lang.Object"),
                  ("Foo", "java.lang.Object"),
                  ("Bar$0", "foo.Bar")],
        bindings=[("Bar:bar", "void()->foo.Bar.bar:void()"),
                  ("Bar$0:bar", "void()->foo.Foo.foo.Bar$0.bar:void()"),
                  ("Bar$0:<init>", "void()->foo.Foo.foo.Bar$0.<init>:void()"),
                  ("Foo:sink",
                   "void(java.lang.String)->foo.Foo.sink:void(java.lang.String)"),
                  ("Foo:<init>", "void()->foo.Foo.<init>:void()")],
        mcount=[("foo.Foo.foo.Bar$0.<init>:void()", 1),
                ("foo.Foo.foo.Bar$0.bar:void()", 1)],
        params=[("<init>.this", "0:foo.Foo.foo.Bar$0:BY_SHARING"),
                ("<init>.this", "0:foo.Foo:BY_SHARING"),
                ("<init>.outerClass", "1:foo.Foo:BY_SHARING")],
        callmfn=[("<init>", "foo.Foo.foo.Bar$0.<init>:void()"),
                 ("bar", "foo.Foo.foo.Bar$0.bar:void()"),
                 ("sink", "foo.Foo.sink:void(java.lang.String)")],
        nodetype={("new Bar()", 0, "CALL"): "foo.Foo.foo.Bar$0"},
        cite="querying/AnonymousClassTests.scala:53-135",
    ),
    # :137-190 — anonymous class in an instance field initializer: the
    # `foo.Foo.b.Bar$0` naming and construction inside Foo's <init>.
    dict(
        name="java-anon-field", lang="java", wrap=False,
        code="""
package foo;

interface Bar {
  void bar();
}

class Foo {
  Bar b = new Bar() {
    void bar() {
      sink("BAR");
    }
  };

  void foo() {
    b.bar();
  }
}
""",
        inherits=[("Bar$0", "foo.Bar")],
        mcount=[("foo.Foo.b.Bar$0.<init>:void()", 1),
                ("foo.Foo.b.Bar$0.bar:void()", 1)],
        callmfn=[("<init>", "foo.Foo.b.Bar$0.<init>:void()"),
                 ("bar", "foo.Foo.b.Bar$0.bar:void()")],
        cite="querying/AnonymousClassTests.scala:137-190",
    ),
    # :192-232 — anonymous class in a STATIC field initializer: same
    # naming; construction moves to <clinit>; no outerClass parameter.
    dict(
        name="java-anon-static-field", lang="java", wrap=False,
        code="""
package foo;

interface Bar {
  void bar();
}

class Foo {
  static Bar b = new Bar() {
    public void bar() {
      sink("BAR");
    }
  };

  void foo() {
    b.bar();
  }
}
""",
        mcount=[("foo.Foo.b.Bar$0.<init>:void()", 1),
                ("foo.Foo.<clinit>:void()", 1)],
        params=[("<init>.this", "0:foo.Foo.b.Bar$0:BY_SHARING"),
                ("<init>.this", "0:foo.Foo:BY_SHARING")],
        callmfn=[("<init>", "foo.Foo.b.Bar$0.<init>:void()"),
                 ("bar", "foo.Foo.b.Bar$0.bar:void()")],
        cite="querying/AnonymousClassTests.scala:192-232",
    ),
    # :306-360 — multiple anonymous classes in the same method get
    # distinct indices, matched to their constructors and value types.
    dict(
        name="java-anon-multiple", lang="java", wrap=False,
        code="""
package foo;

interface Bar {
  void bar();
}

class Foo {
  void foo() {
    Bar a = new Bar() {
      void bar() {
        sink("A");
      }
    };
    Bar b = new Bar() {
      void bar() {
        sink("B");
      }
    };

    a.bar();
    b.bar();
  }
}
""",
        inherits=[("Bar$0", "foo.Bar"), ("Bar$1", "foo.Bar")],
        mcount=[("foo.Foo.foo.Bar$0.<init>:void()", 1),
                ("foo.Foo.foo.Bar$1.<init>:void()", 1)],
        callmfn=[("<init>", "foo.Foo.foo.Bar$0.<init>:void()"),
                 ("<init>", "foo.Foo.foo.Bar$1.<init>:void()"),
                 ("bar", "foo.Foo.foo.Bar$0.bar:void()"),
                 ("bar", "foo.Foo.foo.Bar$1.bar:void()")],
        nodetype={("new Bar()", 0, "CALL"): "foo.Foo.foo.Bar$0",
                  ("new Bar()", 1, "CALL"): "foo.Foo.foo.Bar$1"},
        cite="querying/AnonymousClassTests.scala:306-360",
    ),
]


CASES += [
    # LocalClassTests.scala:10-183 — a class declared in a method body:
    # `{methodFullName}.{Name}` naming, captured locals/params as MEMBERs
    # plus constructor parameters (outerClass first in instance contexts,
    # then alphabetical) with `this.<x> = <x>` assignments.
    dict(
        name="java-local-class", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    int capturedMember;
    static int staticMember;

    void enclosingMethod(int capturedParam) {
        int capturedLocal = 1;
        class Local {
            void noCaptures(int localParam) {
                sink(localParam);
            }

            void capturesParam() {
                sink(capturedParam);
            }

            void capturesMember() {
                sink(capturedMember);
            }

            void capturesLocal() {
                sink(capturedLocal);
            }

            void staticAccess() {
                sink(staticMember);
            }
        };
    }
}
""",
        inherits=[("Local", "java.lang.Object")],
        bindings=[("Local:noCaptures",
                   "void(int)->foo.Foo.enclosingMethod:void(int).Local."
                   "noCaptures:void(int)"),
                  ("Local:<init>",
                   "void()->foo.Foo.enclosingMethod:void(int).Local."
                   "<init>:void()")],
        members=[("Local.outerClass", "foo.Foo"),
                 ("Local.capturedLocal", "int"),
                 ("Local.capturedParam", "int")],
        mcount=[("foo.Foo.enclosingMethod:void(int).Local.noCaptures:void(int)", 1),
                ("foo.Foo.enclosingMethod:void(int).Local.<init>:void()", 1)],
        params=[("<init>.this",
                 "0:foo.Foo.enclosingMethod:void(int).Local:BY_SHARING"),
                ("<init>.this", "0:foo.Foo:BY_SHARING"),
                ("<init>.outerClass", "1:foo.Foo:BY_SHARING"),
                ("<init>.capturedLocal", "2:int:BY_VALUE"),
                ("<init>.capturedParam", "3:int:BY_VALUE")],
        ast={("this.outerClass = outerClass", 0, "CALL"):
                 ["this.outerClass", "outerClass"],
             ("this.capturedLocal = capturedLocal", 0, "CALL"):
                 ["this.capturedLocal", "capturedLocal"],
             ("this.capturedParam = capturedParam", 0, "CALL"):
                 ["this.capturedParam", "capturedParam"]},
        cite="querying/LocalClassTests.scala:10-183 (simple local classes)",
    ),
    # :185-290 — static enclosing method: no outerClass member/parameter.
    dict(
        name="java-local-class-static", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    int member;
    static int staticMember;

    static void enclosingMethod(int capturedParam) {
        int capturedLocal = 1;
        class Local {
            void noCaptures(int localParam) {
                sink(localParam);
            }

            void capturesParam() {
                sink(capturedParam);
            }

            void staticAccess() {
                sink(staticMember);
            }

            void capturesLocal() {
                sink(capturedLocal);
            }
        };
    }
}
""",
        members=[("Local.capturedLocal", "int"),
                 ("Local.capturedParam", "int")],
        params=[("<init>.this",
                 "0:foo.Foo.enclosingMethod:void(int).Local:BY_SHARING"),
                ("<init>.this", "0:foo.Foo:BY_SHARING"),
                ("<init>.capturedLocal", "1:int:BY_VALUE"),
                ("<init>.capturedParam", "2:int:BY_VALUE")],
        mcount=[("foo.Foo.enclosingMethod:void(int).Local.<init>:void()", 1)],
        cite="querying/LocalClassTests.scala:185-290 (static context)",
    ),
    # :310-375 — construction of a capture-less local class resolves to
    # the local fullname's constructor.
    dict(
        name="java-local-class-new", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    void enclosingMethod() {
        class Local { }

        Local l = new Local();
    }
}
""",
        members=[("Local.outerClass", "foo.Foo")],
        callmfn=[("<init>",
                  "foo.Foo.enclosingMethod:void().Local.<init>:void()")],
        mcount=[("foo.Foo.enclosingMethod:void().Local.<init>:void()", 1)],
        cite="querying/LocalClassTests.scala:310-375",
    ),
]


CASES += [
    # LocalRecordTests.scala:18-100 — records declared in method bodies:
    # method-scoped naming, java.lang.Record supertype, component member +
    # accessor + canonical constructor, implicit-static (no outerClass).
    dict(
        name="java-local-record", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    void enclosingMethod() {
        record LocalRecord(String value) {}
    }
}
""",
        inherits=[("LocalRecord", "java.lang.Record")],
        members=[("LocalRecord.value", "java.lang.String")],
        mcount=[("foo.Foo.enclosingMethod:void().LocalRecord.value:"
                 "java.lang.String()", 1),
                ("foo.Foo.enclosingMethod:void().LocalRecord.<init>:"
                 "void(java.lang.String)", 1)],
        bindings=[("LocalRecord:<init>",
                   "void(java.lang.String)->foo.Foo.enclosingMethod:void()."
                   "LocalRecord.<init>:void(java.lang.String)")],
        params=[("<init>.this",
                 "0:foo.Foo.enclosingMethod:void().LocalRecord:BY_SHARING"),
                ("<init>.this", "0:foo.Foo:BY_SHARING"),
                ("<init>.value", "1:java.lang.String:BY_SHARING")],
        ast={("this.value = value", 0, "CALL"): ["this.value", "value"],
             ("return this.value", 0, "RETURN"): ["this.value"]},
        cite="querying/LocalRecordTests.scala:18-100",
    ),
]


CASES += [
    # CapturingTests.scala:328-440 — instanceof binding-pattern variables
    # are declared WHERE they match: a lambda capturing `obj` does not
    # capture the pattern variable `s`; a pattern variable shadows a
    # same-named field inside its statement only (the later read wraps
    # back to `this.s`).
    dict(
        name="java-pattern-captures", lang="java", wrap=False,
        code="""
public class Foo {
  public void test(Object obj) {
    Runnable r = () -> {
      while (obj instanceof String s) {
        System.out.println(s);
        break;
      }
    };
  }
}
""",
        captures=[("<lambda>0", "obj")],
        cite="querying/CapturingTests.scala:328-350 (pattern matching in "
             "while loop condition)",
    ),
    dict(
        name="java-pattern-shadowing", lang="java", wrap=False,
        code="""
public class Foo {
  String s;
  public void test(Object obj) {
    Runnable r = () -> {
      while (obj instanceof String s) {
        System.out.println(s);
        break;
      }
      System.out.println(s);
    };
  }
}
""",
        # the lambda captures obj AND the enclosing `this` (the post-loop
        # field read goes through it: closureBindingId "...:<lambda>0:this")
        captures=[("<lambda>0", "obj"), ("<lambda>0", "this")],
        # the in-loop read refs the pattern LOCAL; the post-loop read is
        # the FIELD via implicit this (the reference asserts an identifier
        # then a fieldAccess, in order)
        ast={("System.out.println(s)", 1, "CALL"):
                 ["System.out", "this.s"]},
        cite="querying/CapturingTests.scala:352-395 (pattern shadowing a "
             "field capture)",
    ),
    dict(
        name="java-pattern-foreach", lang="java", wrap=False,
        code="""
import java.util.*;

public class Foo {
  public void test(List<Object> items) {
    Runnable r = () -> {
      for (Object item : items) {
        if (item instanceof String s) {
          System.out.println(s);
        }
      }
    };
  }
}
""",
        captures=[("<lambda>0", "items")],
        cite="querying/CapturingTests.scala:397-422 (pattern in for loop)",
    ),
]


CASES += [
    # LocalRecordTests.scala:97-140 — multi-component local record.
    dict(
        name="java-local-record-multi", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    void enclosingMethod() {
        record Point(int x, int y) {}
    }
}
""",
        members=[("Point.x", "int"), ("Point.y", "int")],
        mcount=[("foo.Foo.enclosingMethod:void().Point.x:int()", 1),
                ("foo.Foo.enclosingMethod:void().Point.y:int()", 1),
                ("foo.Foo.enclosingMethod:void().Point.<init>:void(int,int)", 1)],
        cite="querying/LocalRecordTests.scala:97-140",
    ),
    # :141-170 — explicit methods alongside accessors, with bindings.
    dict(
        name="java-local-record-method", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    void enclosingMethod() {
        record LocalRecord(String value) {
            String upper() {
                return value.toUpperCase();
            }
        }
    }
}
""",
        bindings=[("LocalRecord:upper",
                   "java.lang.String()->foo.Foo.enclosingMethod:void()."
                   "LocalRecord.upper:java.lang.String()")],
        mcount=[("foo.Foo.enclosingMethod:void().LocalRecord.upper:"
                 "java.lang.String()", 1),
                ("foo.Foo.enclosingMethod:void().LocalRecord.value:"
                 "java.lang.String()", 1)],
        cite="querying/LocalRecordTests.scala:141-170",
    ),
    # :172-260 — captures become members + ctor params (records stay
    # implicitly static: no outerClass; outer members/statics excluded).
    dict(
        name="java-local-record-captures", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    int capturedMember;

    void enclosingMethod(int capturedParam) {
        int capturedLocal = 1;
        record LocalRecord(String value) {
            void usesCaptures() {
                sink(capturedParam, capturedLocal, capturedMember);
            }
        }
    }
}
""",
        members=[("LocalRecord.value", "java.lang.String"),
                 ("LocalRecord.capturedParam", "int"),
                 ("LocalRecord.capturedLocal", "int")],
        mcount=[("foo.Foo.enclosingMethod:void(int).LocalRecord.<init>:"
                 "void(java.lang.String)", 1)],
        params=[("<init>.value", "1:java.lang.String:BY_SHARING"),
                ("<init>.capturedLocal", "2:int:BY_VALUE"),
                ("<init>.capturedParam", "3:int:BY_VALUE")],
        cite="querying/LocalRecordTests.scala:172-260",
    ),
    # :261-299 — compact constructor: component assignment precedes the
    # compact body.
    dict(
        name="java-local-record-compact", lang="java", wrap=False,
        code="""
package foo;

class Foo {
    void enclosingMethod() {
        record LocalRecord(String value) {
            public LocalRecord {
                System.out.println(value);
            }
        }
    }
}
""",
        mcount=[("foo.Foo.enclosingMethod:void().LocalRecord.<init>:"
                 "void(java.lang.String)", 1)],
        params=[("<init>.value", "1:java.lang.String:BY_SHARING")],
        ast={("this.value = value", 0, "CALL"): ["this.value", "value"]},
        cite="querying/LocalRecordTests.scala:261-299",
    ),
]

# ------------------------------------------------------------------- #
# CallTests.scala transcriptions (multi-file fixtures merged into one
# unit with the same package/class layout; asserted mfns unchanged).
# ------------------------------------------------------------------- #
JC = ("javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/"
      "CallTests.scala")

CASES += [
    dict(
        name="java-call-super-explicit", lang="java", wrap=False,
        code="""
class Foo {
    void foo() {}
}

class Bar extends Foo {
    void test() {
        super.foo();
    }
}
""",
        # receiver refs test's this param (:25-30); super receiver is an
        # Identifier named `this` code "super" typed by the superclass
        refs={("super", 0): ["this&test@0"]},
        nodetype={("super", 0): "Foo"},
        cite=f"{JC}:12-30",
    ),
    dict(
        name="java-call-super-implicit", lang="java", wrap=False,
        code="""
class Foo {
    void foo() {}
}

class Bar extends Foo {
    void test() {
        foo();
    }
}
""",
        refs={("this", 0): ["this&test@0"]},
        cite=f"{JC}:32-50",
    ),
    dict(
        name="java-call-base64-decode", lang="java", wrap=False,
        code="""
import java.util.Base64;

class Test {
  public void test(Base64.Decoder decoder, String src) {
    decoder.decode(src);
  }
}
""",
        callmfn=[["decode",
                  "java.util.Base64$Decoder.decode:byte[]"
                  "(java.lang.String)"]],
        cite=f"{JC}:80-92",
    ),
    dict(
        name="java-call-base64-getdecoder", lang="java", wrap=False,
        code="""
import java.util.Base64;

class Foo {
  void test() {
    Base64.getDecoder();
  }
}
""",
        callmfn=[["getDecoder",
                  "java.util.Base64.getDecoder:java.util.Base64$Decoder()"]],
        cite=f"{JC}:94-109",
    ),
    dict(
        # adapted: both classes share `package foo` in one unit
        name="java-call-static-crossfile", lang="java", wrap=False,
        code="""
package foo;

class Foo {
  public static String foo() {
    return "FOO";
  }
}

class Bar {
  void test() {
    Foo.foo();
  }
}
""",
        callmfn=[["foo", "foo.Foo.foo:java.lang.String()"]],
        cite=f"{JC}:111-135",
    ),
    dict(
        name="java-call-unresolved-receivers", lang="java", wrap=False,
        code="""
import a.*;

class Test {

  void test() {
    foo().bar();
  }
}
""",
        callmfn=[["foo", "Test.foo:<unresolvedSignature>(0)"],
                 ["bar", "<unresolvedNamespace>.bar:"
                         "<unresolvedSignature>(0)"]],
        nodetype={("foo()", 0): "ANY"},
        cite=f"{JC}:136-151",
    ),
    dict(
        name="java-call-ctor-init", lang="java", wrap=False,
        code="""
class Foo {
  Foo(long aaa) {
  }
  static void method() {
    Foo foo = new Foo(1);
  }
}
""",
        # <init> call mfn/signature (:188-192); its receiver identifier
        # REFs the newly-defined local (:194-197)
        callmfn=[["<init>", "Foo.<init>:void(long)"]],
        refs={("foo", 0): ["Foo foo&<empty>@1"]},
        cite=f"{JC}:177-198",
    ),
    dict(
        # adapted: the two files merge into one unit (no packages)
        name="java-call-varargs-crossfile", lang="java", wrap=False,
        code="""
class Foo {
  static void foo(String... inputs) {
    System.out.println(inputs.length);
  }
}

class Test {

  void test(String[] inputs) {
    Foo.foo("a", "b");
  }
}
""",
        callmfn=[["foo", "Foo.foo:void(java.lang.String[])"]],
        cite=f"{JC}:215-237",
    ),
    dict(
        name="java-call-overload-crossfile", lang="java", wrap=False,
        code="""
public class Foo {
  public static Foo foo(String arg) {
    return new Foo();
  }

  public static Foo foo(int x) {
    return new Foo();
  }
}

class Bar {
  public static void bar(String barArg) {
    Foo.foo(barArg);
  }
}
""",
        callmfn=[["foo", "Foo.foo:Foo(java.lang.String)"]],
        cite=f"{JC}:238-263",
    ),
    dict(
        name="java-call-unresolved-lambda-get", lang="java", wrap=False,
        code="""
class Foo {
  public void isSuccess(ExecutorService executorService) {
    var responses = executorService.invokeAll(flagCalls);
    responses.stream().filter(r -> {
      return r.get().getStatusCode() == 200;
    });
  }
}
""",
        callmfn=[["get", "<unresolvedNamespace>.get:"
                         "<unresolvedSignature>(0)"]],
        cite=f"{JC}:265-283",
    ),
    dict(
        name="java-call-super-tostring", lang="java", wrap=False,
        code="""
class Foo {
  @Override
  public String toString() {
    return super.toString();
  }
}
""",
        # super receiver: name `this`, code "super", java.lang.Object
        # (:560-569)
        nodetype={("super", 0): "java.lang.Object"},
        refs={("super", 0): ["this&toString@0"]},
        ast={"super.toString()": ["super"]},
        cite=f"{JC}:550-570",
    ),
    dict(
        name="java-call-static-inherited", lang="java", wrap=False,
        code="""
package foo;

class Foo {
  static String foo() { return "hello"; }
}

class Bar extends Foo {}

public class Test {
  public static String test() {
    return Bar.foo();
  }
}
""",
        # defining class in the fullname, receiver spelling in code
        # (:589-594)
        callmfn=[["foo", "foo.Foo.foo:java.lang.String()"]],
        ast={"return Bar.foo();": ["Bar.foo()"]},
        cite=f"{JC}:572-595",
    ),
    dict(
        name="java-call-static-nested-inherited", lang="java", wrap=False,
        code="""
package foo;

class Outer {
  static class Foo {
    static String foo() { return "hello"; }
  }
}

class Bar extends Outer.Foo {}

public class Test {
  public static String test() {
    return Bar.foo();
  }
}
""",
        callmfn=[["foo", "foo.Outer$Foo.foo:java.lang.String()"]],
        cite=f"{JC}:597-622",
    ),
    dict(
        name="java-call-derived-session", lang="java", wrap=False,
        code="""
class Session {
  public Query createQuery() {
    return new Query();
  }
}

class Query { }

class SessionFactory {
  private Session session;

  public Session getCurrentSession() {
    return session;
  }
}

class Base {
  SessionFactory sessionFactory;

  Session getCurrentSession() {
		return this.sessionFactory.getCurrentSession();
	}
}

class Derived extends Base{
 void foo() {
		Query q = getCurrentSession().createQuery();
		return;
	}
}
""",
        # createQuery prefix Session; the unqualified inherited call in
        # Derived keeps the enclosing class prefix (:655-662)
        callmfn=[["createQuery", "Session.createQuery:Query()"],
                 ["getCurrentSession", "Derived.getCurrentSession:Session()"],
                 ["getCurrentSession",
                  "SessionFactory.getCurrentSession:Session()"]],
        cite=f"{JC}:624-664",
    ),
    dict(
        name="java-call-builder-unresolved", lang="java", wrap=False,
        code="""
package example;
import org.Builder;
import org.Client;

class Main {
 static void main(String[] args) {
   Client foo = new Builder().foo().buildClient();
   new Builder().somethingElse().buildClient();
 }
}
""",
        callmfn=[["buildClient", "<unresolvedNamespace>.buildClient:"
                                 "<unresolvedSignature>(0)"]],
        cite=f"{JC}:666-694",
    ),
    dict(
        name="java-call-main-fixture", lang="java", wrap=False,
        code="""
package test;
 class Foo {
   int add(int x, int y) {
     return x + y;
   }

   int main(int argc, char argv) {
     return add(argc, 3);
   }

   int bar(int argc) {
     foo(argc);
   }
 }

class MyObject {
    public static String staticCall(String s) {
        return s;
    }

    public String myMethod(String s) {
        return s;
    }
}

public class Bar {
    MyObject obj = new MyObject();

    public static void staticMethod() {}

    public String foo(MyObject myObj) {
        return myObj.myMethod("Hello, world!");
    }

    public void bar() {
        foo(obj);
    }

    public void baz() {
        this.foo(obj);
    }

    public void qux() {
        staticMethod();
    }

    public void quux() {
      bar();
    }
}
""",
        # the canonical call-fields fixture (:696-860): codes, fullnames,
        # signatures, implicit/explicit this, static spelling, field args
        callmfn=[["add", "test.Foo.add:int(int,int)"],
                 ["foo", "test.Foo.foo:<unresolvedSignature>(1)"],
                 ["foo", "test.Bar.foo:java.lang.String(test.MyObject)"],
                 ["myMethod",
                  "test.MyObject.myMethod:java.lang.String"
                  "(java.lang.String)"],
                 ["staticMethod", "test.Bar.staticMethod:void()"],
                 ["bar", "test.Bar.bar:void()"],
                 ["<init>", "test.MyObject.<init>:void()"],
                 ["<operator>.addition", "<operator>.addition"],
                 ["<operator>.assignment", "<operator>.assignment"],
                 ["<operator>.fieldAccess", "<operator>.fieldAccess"]],
        ast={
            # add: [this, argc, 3] (:758-782); code "this.add(argc, 3)"
            "this.add(argc, 3)": ["this", "argc", "3"],
            # implicit-this foo(obj): [this, this.obj fieldAccess]
            # (:832-850) — twice (bar and baz spell the same)
            ("this.foo(obj)", 0): ["this", "this.obj"],
            ("this.foo(obj)", 1): ["this", "this.obj"],
            ("this.obj", 0): ["this", "obj"],
            ("this.obj", 1): ["this", "obj"],
            # explicit receiver: [myObj, literal] (:818-830)
            'myObj.myMethod("Hello, world!")': [
                "myObj", '"Hello, world!"'],
            # static: bare spelling (:852-857)
            "staticMethod()": [],
            "this.bar()": ["this"],
        },
        nodetype={
            ("this.obj", 0): "test.MyObject",
            ("this.obj", 1): "test.MyObject",
            ("foo(argc)", 0): "ANY",
        },
        cite=f"{JC}:696-860",
    ),
    dict(
        name="java-call-generic-ident", lang="java", wrap=False,
        code="""
class Foo {
    public static class Ops {
        public <T> T ident(T x) {
            return x;
        }
    }
    public Integer method(Integer aaa) {
        Ops ops = new Ops();
        Integer ret = ops.ident(aaa);
        return ret;
    }
}
""",
        callmfn=[["ident",
                  "Foo$Ops.ident:java.lang.Object(java.lang.Object)"]],
        cite=f"{JC}:862-880 (CallTests2)",
    ),
]

CASES += [
    dict(
        name="java-call-code-chained-ctor", lang="java", wrap=False,
        code="""
class Foo {
  private String value;

  public String getValue() {
    return value;
  }

  public static void test() {
    String s = new Foo().getValue();
  }
}
""",
        ast={"new Foo().getValue()": ["new Foo()"]},
        callmfn=[["getValue", "Foo.getValue:java.lang.String()"]],
        cite=f"{JC}:403-421",
    ),
    dict(
        # the line comment inside the chain is dropped from the code
        # spelling (JavaParser pretty-print)
        name="java-call-code-comment-chain", lang="java", wrap=False,
        code="""
class Foo {
 private String value;

 public String getValue() {
   return value;
 }

 public static void test() {
   String s = new Foo()
     // some comment
     .getValue();
 }
}
""",
        ast={"new Foo().getValue()": ["new Foo()"]},
        callmfn=[["getValue", "Foo.getValue:java.lang.String()"]],
        cite=f"{JC}:423-443",
    ),
    dict(
        name="java-call-code-ctor", lang="java", wrap=False,
        code="""
class Foo {

  public static void test() {
    Foo f = new Foo();
  }
}
""",
        ast={"Foo f = new Foo()": ["f", "new Foo()"]},
        nodetype={("new Foo()", 0): "Foo"},
        cite=f"{JC}:445-457",
    ),
    dict(
        name="java-call-code-comment-args", lang="java", wrap=False,
        code="""
import foo.*;
public class Main {
  public static void main(String[] args) {
    Foo foo = Foo.create(
                    "username", // hehe silly comment
                    "password");
    }
}
""",
        ast={'Foo.create("username", "password")': [
            "Foo", '"username"', '"password"']},
        cite=f"{JC}:459-476",
    ),
    dict(
        name="java-call-code-multiline-comment-args", lang="java",
        wrap=False,
        code="""
import foo.*;
public class Main {
  public static void main(String[] args) {
    Foo foo = Foo.create(
                    // another comment
                    "username", /* hehe silly comment */
                    "password");
    }
}
""",
        ast={'Foo.create("username", "password")': [
            "Foo", '"username"', '"password"']},
        cite=f"{JC}:477-495",
    ),
    dict(
        name="java-call-generic-return", lang="java", wrap=False,
        code="""
class Foo {
  void method(java.util.function.Function<String, Integer> supplier) {
     supplier.apply("abc");
  }
}
""",
        # evalType substitutes the declared type args; the fullname keeps
        # the erased signature (:506-513)
        callmfn=[["apply", "java.util.function.Function.apply:"
                           "java.lang.Object(java.lang.Object)"]],
        nodetype={('supplier.apply("abc")', 0): "java.lang.Integer"},
        cite=f"{JC}:497-513",
    ),
    dict(
        name="java-call-generic-bounded", lang="java", wrap=False,
        code="""
class Foo <T extends Number> {
  <S extends T> void foo(S i) {}

  static void method() {
    Foo<Integer> obj = new Foo();
    obj.foo(1);
  }
}
""",
        callmfn=[["foo", "Foo.foo:void(java.lang.Number)"]],
        cite=f"{JC}:515-530",
    ),
    dict(
        name="java-call-generic-array-param", lang="java", wrap=False,
        code="""
class Foo <T> {
  void foo(T[] aaa) {}

  static void method() {
    Foo<Integer> obj = new Foo();
    Integer[] array = new Integer[3];
    obj.foo(array);
  }
}
""",
        callmfn=[["foo", "Foo.foo:void(java.lang.Object[])"]],
        cite=f"{JC}:532-548",
    ),
]

# ------------------------------------------------------------------- #
# LambdaTests.scala transcriptions — target-typed lambda signatures from
# the functional-interface context (call argument / vardecl / assignment /
# return), the 0th `this` parameter for instance captures, void-body
# statement (no return wrap), nested naming.
# ------------------------------------------------------------------- #
JL = ("javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/"
      "LambdaTests.scala")

CASES += [
    dict(
        name="java-lambda-unresolved-param-any", lang="java", wrap=False,
        code="""
public class Test {
  public void method() {
    unresolvedCall().foreach(lambdaParam -> {
       foo(lambdaParam);
    });
  }
}
""",
        nodetype={("lambdaParam", 0): "ANY"},
        cite=f"{JL}:9-21",
    ),
    dict(
        name="java-lambda-nested-names", lang="java", wrap=False,
        code="""
import java.util.ArrayList;
import java.util.List;
import java.util.stream.Collectors;

public class TestClass {
  public Integer method(Integer aaa) {
    List<Integer> list = new ArrayList<>();
    list.add(1);

    List<Integer> mappedList = list.stream().map(integer -> {
      List<Integer> nestedList = new ArrayList<>();
      nestedList.add(1);

      List<Integer> nestedMappedList =
          nestedList.stream().map(nestedInteger -> nestedInteger + aaa).collect(Collectors.toList());
      return nestedMappedList.get(0);
    }).collect(Collectors.toList());
    Integer ret = mappedList.get(0);
    return ret;
  }
}
""",
        methods=[["<lambda>0", "TestClass.<lambda>0"],
                 ["<lambda>1", "TestClass.<lambda>1"],
                 ["method",
                  "TestClass.method:java.lang.Integer(java.lang.Integer)"],
                 ["<init>", "TestClass.<init>:void()"]],
        # the inner lambda captures the enclosing method's parameter
        captures=[["<lambda>1", "aaa"]],
        cite=f"{JL}:23-51",
    ),
    dict(
        name="java-lambda-function-arg", lang="java", wrap=False,
        code="""
import java.util.function.Function;

public class Foo {
  public static String getFromSupplier(String input, Function<String, String> mapper) {
    return mapper.apply(input);
  }

  public void test1(String input, String fallback) {
    getFromSupplier(
      input,
      lambdaInput -> lambdaInput.length() > 5 ? "Long" : fallback
    );
  }
}
""",
        # methodref + lambda method signature-typed from the Function
        # target (:71-94); capture of `fallback` (:141-155)
        methods=[["<lambda>0",
                  "Foo.<lambda>0:java.lang.String(java.lang.String)"],
                 ["getFromSupplier",
                  "Foo.getFromSupplier:java.lang.String(java.lang.String,"
                  "java.util.function.Function)"],
                 ["test1",
                  "Foo.test1:void(java.lang.String,java.lang.String)"],
                 ["<init>", "Foo.<init>:void()"]],
        nodemfn={("<lambda>", 0):
                 "Foo.<lambda>0:java.lang.String(java.lang.String)"},
        params=[["<lambda>0.lambdaInput", "1:java.lang.String:BY_SHARING"]],
        captures=[["<lambda>0", "fallback"]],
        cite=f"{JL}:53-177",
    ),
    dict(
        name="java-lambda-vardecl", lang="java", wrap=False,
        code="""
import java.util.function.Function;

public class Foo {
  public void test(String input, String fallback) {
    Function<String, String> mapper = lambdaInput -> lambdaInput.length() > 5 ? "Long" : fallback;
  }
}
""",
        methods=[["<lambda>0",
                  "Foo.<lambda>0:java.lang.String(java.lang.String)"],
                 ["test",
                  "Foo.test:void(java.lang.String,java.lang.String)"],
                 ["<init>", "Foo.<init>:void()"]],
        params=[["<lambda>0.lambdaInput", "1:java.lang.String:BY_SHARING"]],
        cite=f"{JL}:179-205",
    ),
    dict(
        name="java-lambda-reassigned", lang="java", wrap=False,
        code="""
import java.util.function.Function;

public class Foo {
  public void test(String input, String fallback, Function<String, String> mapper) {
    mapper = lambdaInput -> lambdaInput.length() > 5 ? "Long" : fallback;
  }
}
""",
        methods=[["<lambda>0",
                  "Foo.<lambda>0:java.lang.String(java.lang.String)"],
                 ["test", "Foo.test:void(java.lang.String,java.lang.String,"
                          "java.util.function.Function)"],
                 ["<init>", "Foo.<init>:void()"]],
        params=[["<lambda>0.lambdaInput", "1:java.lang.String:BY_SHARING"]],
        cite=f"{JL}:207-233",
    ),
    dict(
        name="java-lambda-returned", lang="java", wrap=False,
        code="""
import java.util.function.Function;

public class Foo {
  public Function<String, String> test(String input, String fallback) {
    return lambdaInput -> lambdaInput.length() > 5 ? "Long" : fallback;
  }
}
""",
        methods=[["<lambda>0",
                  "Foo.<lambda>0:java.lang.String(java.lang.String)"],
                 ["test", "Foo.test:java.util.function.Function"
                          "(java.lang.String,java.lang.String)"],
                 ["<init>", "Foo.<init>:void()"]],
        params=[["<lambda>0.lambdaInput", "1:java.lang.String:BY_SHARING"]],
        cite=f"{JL}:235-262",
    ),
    dict(
        name="java-lambda-instance-this", lang="java", wrap=False,
        code="""
import java.util.function.Consumer;

public class Foo {
    public String s;

    public static void sink(String s) {}

    public Consumer<String> test() {
        return input -> sink(input + s);
    }
}
""",
        # a lambda touching instance state gets a 0th `this` param typed
        # by the enclosing class (:278-290)
        params=[["<lambda>0.this", "0:Foo:BY_SHARING"],
                ["<lambda>0.input", "1:java.lang.String:BY_SHARING"]],
        cite=f"{JL}:263-290",
    ),
    dict(
        name="java-lambda-static-no-this", lang="java", wrap=False,
        code="""
import java.util.function.Consumer;

public class Foo {
    public static String s;

    public static void sink(String s) {}

    public Consumer<String> test() {
        return input -> sink(input + s);
    }
}
""",
        # static-only context: NO 0th this param (:519-543)
        params=[["<lambda>0.input", "1:java.lang.String:BY_SHARING"],
                ["<lambda>0.this", ""]],
        cite=f"{JL}:519-543",
    ),
    dict(
        name="java-lambda-void-body", lang="java", wrap=False,
        code="""
import java.util.function.Consumer;

public class Foo {
    public static void sink(String s) {};

    public static Consumer<String> test() {
        return input -> sink(input);
    }
}
""",
        # void-interface expression body is a statement, not a return
        # (:599-608); the body call resolves inside the lambda
        methods=[["<lambda>0", "Foo.<lambda>0:void(java.lang.String)"],
                 ["sink", "Foo.sink:void(java.lang.String)"],
                 ["test", "Foo.test:java.util.function.Consumer()"],
                 ["<init>", "Foo.<init>:void()"]],
        ast={("<empty>", 2): ["sink(input)"]},
        callmfn=[["sink", "Foo.sink:void(java.lang.String)"]],
        cite=f"{JL}:586-609",
    ),
    dict(
        name="java-lambda-biconsumer", lang="java", wrap=False,
        code="""
import java.util.function.BiConsumer;
class Foo {
  public static void sink(Float i, String f) {}

  public static BiConsumer<Float, String> foo() {
    return (input1, input2) -> sink(input1, input2);
  }
}
""",
        callmfn=[["sink",
                  "Foo.sink:void(java.lang.Float,java.lang.String)"]],
        params=[["<lambda>0.input1", "1:java.lang.Float:BY_SHARING"],
                ["<lambda>0.input2", "2:java.lang.String:BY_SHARING"]],
        cite=f"{JL}:610-628",
    ),
]

# ------------------------------------------------------------------- #
# TypeInferenceTests.scala — import-driven type inference for locals,
# params, unresolved calls; enclosing-class guess for explicit this.
# ------------------------------------------------------------------- #
CASES += [
    dict(
        name="java-typeinf-imports", lang="java", wrap=False,
        code="""
package pakfoo;

import a.b.c.Bar;
import d.*;
import e.Unknown;

class Foo extends Unknown {

    public static void foo(int x) {}

    public void test1() {
        Bar b;
    }

    public void test3(Bar b) {}

    public void test4(Bar b) {
        int x = b.bar();
    }

    public void test6(Baz z) {}

    public void test7(Bar b, Baz z) {
        b.bar(z, 1);
    }

    public void test8() {
        this.missing();
    }

    public void test9() {
        super.missing();
    }
}
""",
        # local/param types from imports (:441-452); single-wildcard
        # package adoption (:470-475); unresolved call fullnames and
        # assignment-target typing (:454-468, :477-497); explicit-this
        # enclosing-class guess (:498-514); super target (:516-530)
        locals=[["test1.b", "Bar b|a.b.c.Bar"],
                ["test4.x", "int x|int"]],
        params=[["test3.b", "1:a.b.c.Bar:BY_SHARING"],
                ["test6.z", "1:d.Baz:BY_SHARING"],
                ["test7.b", "1:a.b.c.Bar:BY_SHARING"],
                ["test7.z", "2:d.Baz:BY_SHARING"]],
        callmfn=[["bar", "a.b.c.Bar.bar:<unresolvedSignature>(0)"],
                 ["bar", "a.b.c.Bar.bar:<unresolvedSignature>(2)"],
                 ["missing", "pakfoo.Foo.missing:<unresolvedSignature>(0)"],
                 ["missing", "e.Unknown.missing:<unresolvedSignature>(0)"]],
        nodetype={("b.bar()", 0): "int",
                  ("1", 0): "int"},
        inherits=[["Foo", "e.Unknown"]],
        cite=("javasrc2cpg/.../querying/TypeInferenceTests.scala:386-530 "
              "(test9 'super' target is pendingUntilFixed upstream; the "
              "e.Unknown prefix matches its intent)"),
    ),
]

CASES += [
    dict(
        name="java-annot-parameter", lang="java", wrap=False,
        code="""
import some.MarkerAnnotation;
public class SomeClass {

  void function(@MarkerAnnotation int x) {

  }
}
""",
        annot=[["x", "MarkerAnnotation|some.MarkerAnnotation"
                     "|@MarkerAnnotation"]],
        cite=f"{JQ}/AnnotationTests.scala:166-184",
    ),
    dict(
        name="java-annot-field", lang="java", wrap=False,
        code="""
import some.MarkerAnnotation;
public class SomeClass {
  @MarkerAnnotation int x;
}
""",
        annot=[["x", "MarkerAnnotation|some.MarkerAnnotation"
                     "|@MarkerAnnotation"]],
        cite=f"{JQ}/AnnotationTests.scala:186-202",
    ),
    dict(
        name="java-annot-array-init", lang="java", wrap=False,
        code="""
import some.NormalAnnotation;
public class SomeClass {

  @NormalAnnotation(value = {"aaa", "bbb"})
  void function() {

  }
}
""",
        annot=[["function", 'NormalAnnotation|some.NormalAnnotation'
                            '|@NormalAnnotation(value = {"aaa", "bbb"})']],
        annotkids=[['@NormalAnnotation(value = {"aaa", "bbb"})',
                    'value = {"aaa", "bbb"}'],
                   ['value = {"aaa", "bbb"}', "value"],
                   ['value = {"aaa", "bbb"}', '{"aaa", "bbb"}']],
        cite=f"{JQ}/AnnotationTests.scala:233-280",
    ),
    dict(
        name="java-annot-nested", lang="java", wrap=False,
        code="""
import some.NormalAnnotation;
import some.OtherAnnotation;
public class SomeClass {

  @NormalAnnotation(value = @OtherAnnotation)
  void function() {

  }
}
""",
        annot=[["function", "NormalAnnotation|some.NormalAnnotation"
                            "|@NormalAnnotation(value = @OtherAnnotation)"]],
        annotkids=[["@NormalAnnotation(value = @OtherAnnotation)",
                    "value = @OtherAnnotation"],
                   ["value = @OtherAnnotation", "value"],
                   ["value = @OtherAnnotation", "@OtherAnnotation"]],
        cite=f"{JQ}/AnnotationTests.scala:282-310",
    ),
    dict(
        name="java-annot-stacked-wildcard", lang="java", wrap=False,
        code="""
import a.Specific;
import b.*;

@Specific
@Wildcard1
@Wildcard2
class Foo { }
""",
        annot=[["Foo", "Specific|a.Specific|@Specific"],
               ["Foo", "Wildcard1|b.Wildcard1|@Wildcard1"],
               ["Foo", "Wildcard2|b.Wildcard2|@Wildcard2"]],
        cite=f"{JQ}/AnnotationTests.scala:312-340",
    ),
]

CASES += [
    dict(
        name="java-method-generic-return-list", lang="java", wrap=False,
        code="""
import java.util.*;
class Foo {
 List<String> run() {
   return null;
 }
}
""",
        methods=[["run", "Foo.run:java.util.List()"],
                 ["<init>", "Foo.<init>:void()"]],
        cite=f"{JQ}/MethodTests.scala:109-124",
    ),
    dict(
        name="java-method-generic-return-baz", lang="java", wrap=False,
        code="""
import foo.bar.Baz;
class Foo {
 Baz<String> run() {
   return null;
 }
}
""",
        methods=[["run", "Foo.run:foo.bar.Baz()"],
                 ["<init>", "Foo.<init>:void()"]],
        cite=f"{JQ}/MethodTests.scala:126-141",
    ),
    dict(
        name="java-method-generic-identity", lang="java", wrap=False,
        code="""
import foo.bar.Baz;
class Foo {
 <T> Baz<T> run(Baz<T> x) {
   return x;
 }
}
""",
        methods=[["run", "Foo.run:foo.bar.Baz(foo.bar.Baz)"],
                 ["<init>", "Foo.<init>:void()"]],
        cite=f"{JQ}/MethodTests.scala:143-175",
    ),
    dict(
        name="java-method-comment-params", lang="java", wrap=False,
        code="""
class Foo {
 abstract void run(
   /* comment for 1st argument */
   int arg1,
   int arg2, // comment for arg2
   int arg3);
}
""",
        paramcode=[["run.arg1", "int arg1"], ["run.arg2", "int arg2"],
                   ["run.arg3", "int arg3"], ["run.this", "this"]],
        methods=[["run", "Foo.run:void(int,int,int)"],
                 ["<init>", "Foo.<init>:void()"]],
        cite=f"{JQ}/MethodTests.scala:177-195",
    ),
]

# --------------------------------------------------------------------------- #
# ConstructorInvocationTests.scala — explicit constructor invocations and
# constructor overload resolution.  The joint alloc/init BLOCK-lowering
# assertions (:255-418) are not transcribed: this engine keeps the `<init>`
# call inline as the assignment rhs (same fullnames/signatures and identical
# dataflow facts, different AST shape).
# --------------------------------------------------------------------------- #

JQCI = f"{JQ}/ConstructorInvocationTests.scala"

CASES += [
    # :263-276 — constructor init call: methodFullName + signature.
    dict(
        name="java-ctorinv-init-call", lang="java", wrap=False,
        code="""
class Foo {
  Foo(long aaa) {
  }
  static void method() {
    Foo foo = new Foo(1);
  }
}
""",
        callmfn=[["<init>", "Foo.<init>:void(long)"]],
        msig=[["<init>", "void(long)"], ["method", "void()"]],
        cite=f"{JQCI}:263-276",
    ),
    # :278-306 — simple single-argument constructor: method node, this
    # param typed as the class, value param typed int.
    dict(
        name="java-ctorinv-simple-ctor", lang="java", wrap=False,
        code="""
class Foo {
  int x;

  public Foo(int x) {
    this.x = x;
  }
}
""",
        methods=[["<init>", "Foo.<init>:void(int)"]],
        msig=[["<init>", "void(int)"]],
        params=[["<init>.this", "0:Foo:BY_SHARING"],
                ["<init>.x", "1:int:BY_VALUE"]],
        cite=f"{JQCI}:278-306",
    ),
    # :308-325 — an object creation expression as an argument to an
    # unresolved call still carries its literal argument.
    dict(
        name="java-ctorinv-unresolved-arg", lang="java", wrap=False,
        code="""
class Foo {
  public Foo(int x) {}

  void foo() {
    sink(new Foo(42));
  }
}
""",
        ast={("new Foo(42)", 0, "CALL"): ["42"]},
        callmfn=[["<init>", "Foo.<init>:void(int)"]],
        cite=f"{JQCI}:308-325",
    ),
    # :181-253 + :420-476 — the shared Bar fixture: constructor overloads
    # resolve by arity (`void(int)` vs `void(int,int)`), `this(x + y)`
    # lowers to a lone `<init>` call on Bar's 1-arg ctor, `super(x)` to a
    # lone `<init>` call on Foo's ctor with the receiver typed as the
    # TARGET class.
    dict(
        name="java-ctorinv-this-super", lang="java", wrap=False,
        code="""
class Foo {
  int x;

  public Foo(int x) {
    this.x = x;
  }

  public int getValue() {
    return x;
  }
}

class Bar extends Foo {
  public Bar(int x) {
    super(x);
  }

  public Bar(int x, int y) {
    this(x + y);
  }

  public static Bar id(Bar b) {
    return b;
  }

  public static void bar() {
    id(new Bar(42));
  }

  public static void test1() {
    Bar b = new Bar(4, 2);
  }
}
""",
        methods=[["<init>", "Foo.<init>:void(int)"],
                 ["<init>", "Bar.<init>:void(int)"],
                 ["<init>", "Bar.<init>:void(int,int)"]],
        callmfn=[["<init>", "Foo.<init>:void(int)"],
                 ["<init>", "Bar.<init>:void(int)"],
                 ["<init>", "Bar.<init>:void(int,int)"]],
        # the explicit invocations are lone <init> calls whose first
        # argument is `this`; super(x) forwards x, this(x + y) the sum
        ast={("super(x)", 0, "CALL"): ["this", "x"],
             ("this(x + y)", 0, "CALL"): ["this", "x + y"]},
        cite=f"{JQCI}:181-253",
    ),
]

CASES += [
    # NewConstructorInvocationTests :12-51 — qualified inner-class creation
    # with an object-creation receiver: both `<init>` calls resolve.
    dict(
        name="java-ctorinv-qualified-new-expr", lang="java", wrap=False,
        code="""
class Foo {
  class Bar {}

  public static void test() {
    Bar b = new Foo().new Bar();
  }
}
""",
        callmfn=[["<init>", "Foo$Bar.<init>:void()"],
                 ["<init>", "Foo.<init>:void()"]],
        locals=[["test.b", "Bar b|Foo$Bar"]],
        cite=f"{JQCI}:12-51 (NewConstructorInvocationTests)",
    ),
    # :53-77 — variable receiver.
    dict(
        name="java-ctorinv-qualified-new-var", lang="java", wrap=False,
        code="""
class Foo {
  class Bar {}

  public static void test(Foo f) {
    Bar b = f.new Bar();
  }
}
""",
        callmfn=[["<init>", "Foo$Bar.<init>:void()"]],
        locals=[["test.b", "Bar b|Foo$Bar"]],
        cite=f"{JQCI}:53-77 (NewConstructorInvocationTests)",
    ),
    # :79-110 — call receiver: the outer call keeps its own resolved
    # methodFullName, the inner ctor resolves through the call's type.
    dict(
        name="java-ctorinv-qualified-new-call", lang="java", wrap=False,
        code="""
class Foo {
  class Bar {}

  public static Foo foo() {
    return new Foo();
  }

  public static void test() {
    Bar b = foo().new Bar();
  }
}
""",
        callmfn=[["<init>", "Foo$Bar.<init>:void()"],
                 ["<init>", "Foo.<init>:void()"],
                 ["foo", "Foo.foo:Foo()"]],
        locals=[["test.b", "Bar b|Foo$Bar"]],
        cite=f"{JQCI}:79-110 (NewConstructorInvocationTests)",
    ),
]
