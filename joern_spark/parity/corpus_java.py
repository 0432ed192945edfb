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
