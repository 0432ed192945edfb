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
