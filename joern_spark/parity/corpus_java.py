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
