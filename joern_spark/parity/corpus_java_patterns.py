"""Java 16+ pattern-matching parity corpus — transcribed BY HAND from
javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/PatternExprTests.scala
(semantics implemented by AstForPatternExpressionsCreator.scala).

Every `ast`/`nodetype`/`refs`/`locals`/`cscond`/`callmfn` fact below mirrors a
`shouldBe` assertion in the reference test; subject keys are the scorer's
occurrence-indexed display codes (`code@i`). The reference's
`inside(x.argument.l) { case List(...) }` pattern-matches are closed-world per
parent, exactly matching the scorer's per-subject FP counting.
"""

CASES = [
    # ----------------------------------------------------------------- #
    # instanceof expressions: record / type patterns
    # ----------------------------------------------------------------- #
    dict(
        name="java-pat-record-matchall", lang="java", wrap=False,
        code="""
package box;

record Box(String value) {}

class Foo {
  void foo(Object o) {
    if (o instanceof Box(_)) {
    }
  }
}
""",
        # "not create a local for the match-all pattern": foo has no locals
        locals=[["foo.s", ""]],
        # andCall code/args, instanceOf args, true-block child (:46-73)
        ast={
            "(o instanceof Box) && { true; }": [
                "o instanceof Box", "{ true; }"],
            "o instanceof Box": ["o", "Box"],
            "{ true; }": ["true"],
        },
        cscond=[["foo:IF", "(o instanceof Box) && { true; }"]],
        nodetype={
            ("o instanceof Box", 0): "boolean",
            ("o", 0): "java.lang.Object",
            ("Box", 0): "box.Box",
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:20-74",
    ),
    dict(
        name="java-pat-record-binding", lang="java", wrap=False,
        code="""
package box;

record Pair(Integer first, String second) {}

class Foo {
  void foo(Object o) {
    if (o instanceof Pair(_, String s)) {
      sink(s);
    }
  }
}
""",
        locals=[["foo.s", "String s|java.lang.String"]],
        ast={
            "(o instanceof Pair) && { s = ((Pair) o).second(); true; }": [
                "o instanceof Pair",
                "{ s = ((Pair) o).second(); true; }"],
            "o instanceof Pair": ["o", "Pair"],
            "{ s = ((Pair) o).second(); true; }": [
                "s = ((Pair) o).second()", "true"],
            "s = ((Pair) o).second()": ["s", "((Pair) o).second()"],
            "((Pair) o).second()": ["(Pair) o"],
            ("(Pair) o", 0): ["Pair", "o"],
        },
        nodetype={
            ("o instanceof Pair", 0): "boolean",
            ("Pair", 0): "box.Pair",
            ("s = ((Pair) o).second()", 0): "java.lang.String",
            ("s", 0): "java.lang.String",
            ("((Pair) o).second()", 0): "java.lang.String",
            ("(Pair) o", 0): "box.Pair",
        },
        # secondCall.methodFullName (:138)
        callmfn=[["second", "box.Pair.second:java.lang.String()"]],
        refs={
            ("s", 0): ["String s&<empty>@3"],
            ("o", 0): ["Object o&foo@0"],
            ("o", 1): ["Object o&foo@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:76-160",
    ),
    dict(
        # lambda body hoists the pattern local into the lambda's own block
        # (the reference asserts only "no orphan locals")
        name="java-pat-lambda-init", lang="java", wrap=False,
        code="""
import java.util.function.Function;

class Foo {
  Function test() {
    return o -> foo() instanceof String s ? s : null;
  }
}
""",
        locals=[["<lambda>0.s", "String s|java.lang.String"],
                ["<lambda>0.$obj0", "$obj0|java.lang.Object"]],
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:162-176",
    ),
    dict(
        name="java-pat-ctor-expr", lang="java", wrap=False,
        code="""
class Test {
  Object foo() {
    return "abc";
  }

  public Test() {
    boolean b = foo() instanceof String s;
  }
}
""",
        # <init> body children: tmpLocal $obj0, sLocal, bLocal, bAssign
        # (:199-205); body is the 2nd <empty> BLOCK (foo's body is @0)
        ast={
            ("<empty>", 1): ["$obj0", "String s", "boolean b",
                          ("boolean b = (($obj0 = this.foo()) instanceof "
                           "String) && { s = (String) $obj0; true; }")],
            ("(($obj0 = this.foo()) instanceof String) && "
             "{ s = (String) $obj0; true; }"): [
                "($obj0 = this.foo()) instanceof String",
                "{ s = (String) $obj0; true; }"],
            "($obj0 = this.foo()) instanceof String": [
                "$obj0 = this.foo()", "String"],
            "$obj0 = this.foo()": ["$obj0", "this.foo()"],
            "{ s = (String) $obj0; true; }": ["s = (String) $obj0", "true"],
            "s = (String) $obj0": ["s", "(String) $obj0"],
            ("(String) $obj0", 0): ["String", "$obj0"],
        },
        locals=[["<init>.s", "String s|java.lang.String"],
                ["<init>.b", "boolean b|boolean"],
                ["<init>.$obj0", "$obj0|java.lang.Object"]],
        nodetype={
            ("b", 0): "boolean",
            ("$obj0 = this.foo()", 0): "java.lang.Object",
            ("$obj0", 0): "java.lang.Object",
            ("s", 0): "java.lang.String",
            ("true", 0): "boolean",
            ("String", 0): "java.lang.String",
            ("String", 1): "java.lang.String",
        },
        callmfn=[["foo", "Test.foo:java.lang.Object()"]],
        refs={
            ("$obj0", 0): ["$obj0&<empty>@1"],
            ("$obj0", 1): ["$obj0&<empty>@1"],
            ("b", 0): ["boolean b&<empty>@1"],
            ("s", 0): ["String s&<empty>@1"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:178-262",
    ),
    dict(
        # adapted: reference splits Foo into a second file (moreCode);
        # same-file second class keeps Foo.FOO a static fieldAccess lhs
        name="java-pat-field-init", lang="java", wrap=False,
        code="""
class Foo {
  public static Object FOO = "abc";
}

class Test {
    public int x = Foo.FOO instanceof String s ? s.length() : -1;
}
""",
        # <init> body = [sLocal, xAssign] (:287-292); Foo's members parse
        # first: Foo <clinit> body is <empty>@0, Foo <init> @1, Test <init>
        # body @2
        ast={
            ("<empty>", 2): ["String s",
                          "this.x = Foo.FOO instanceof String s ? "
                          "s.length() : -1"],
            ("this.x", 0): ["this", "x"],
            ("(Foo.FOO instanceof String) && "
             "{ s = (String) Foo.FOO; true; }"): [
                "Foo.FOO instanceof String",
                "{ s = (String) Foo.FOO; true; }"],
            "{ s = (String) Foo.FOO; true; }": [
                "s = (String) Foo.FOO", "true"],
            "s = (String) Foo.FOO": ["s", "(String) Foo.FOO"],
            "s.length()": ["s"],
            "Foo.FOO instanceof String s ? s.length() : -1": [
                "(Foo.FOO instanceof String) && "
                "{ s = (String) Foo.FOO; true; }",
                "s.length()", "-1"],
        },
        locals=[["<init>.s", "String s|java.lang.String"]],
        nodetype={
            ("this.x", 0): "int",
            ("this", 0): "Test",
            ("Foo.FOO instanceof String s ? s.length() : -1", 0): "int",
            ("String", 0): "java.lang.String",
            ("s", 0): "java.lang.String",
            ("s", 1): "java.lang.String",
        },
        callmfn=[["length", "java.lang.String.length:int()"],
                 ["<operator>.conditional", "<operator>.conditional"],
                 ["<operator>.instanceOf", "<operator>.instanceOf"]],
        refs={
            ("s", 0): ["String s&<empty>@2"],
            ("s", 1): ["String s&<empty>@2"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:263-364",
    ),
    dict(
        name="java-pat-static-field-init", lang="java", wrap=False,
        code="""
class Foo {
  public Object FOO = "abc";
}

class Test {
    public static int x = Foo.FOO instanceof String s ? s.length() : -1;
}
""",
        # <clinit> body = [sLocal, xAssign] (:389-394)
        locals=[["<clinit>.s", "String s|java.lang.String"]],
        ast={
            ("(Foo.FOO instanceof String) && "
             "{ s = (String) Foo.FOO; true; }"): [
                "Foo.FOO instanceof String",
                "{ s = (String) Foo.FOO; true; }"],
            "{ s = (String) Foo.FOO; true; }": [
                "s = (String) Foo.FOO", "true"],
            "s = (String) Foo.FOO": ["s", "(String) Foo.FOO"],
            "s.length()": ["s"],
        },
        nodetype={
            ("String", 0): "java.lang.String",
            ("s", 0): "java.lang.String",
            ("s", 1): "java.lang.String",
        },
        callmfn=[["length", "java.lang.String.length:int()"],
                 ["<operator>.conditional", "<operator>.conditional"]],
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:366-440",
    ),
    dict(
        name="java-pat-call-lhs", lang="java", wrap=False,
        code="""
class Test {
  static String foo() {
    return "Hello, world!";
  }

  static void sink(String s) { /* Do nothing */ }

  void test(Object o) {
    if (foo() instanceof String s && s.isEmpty()) {
      sink(s);
    }
  }
}
""",
        # tmp local typed by foo's return (:467-473); tmp assignment is the
        # first instanceof argument (:475-493)
        locals=[["test.$obj0", "$obj0|java.lang.String"],
                ["test.s", "String s|java.lang.String"]],
        ast={
            "($obj0 = foo()) instanceof String": [
                "$obj0 = foo()", "String"],
            "$obj0 = foo()": ["$obj0", "foo()"],
            "sink(s)": ["s"],
        },
        nodetype={
            ("$obj0 = foo()", 0): "java.lang.String",
            ("$obj0", 0): "java.lang.String",
            ("foo()", 0): "java.lang.String",
        },
        callmfn=[["foo", "Test.foo:java.lang.String()"]],
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:442-494",
    ),
    # ----------------------------------------------------------------- #
    # patterns in binary expressions (JLS 6.3 flow scopes)
    # ----------------------------------------------------------------- #
    dict(
        name="java-pat-and-rhs", lang="java", wrap=False,
        code="""
class Test {
  void test(Object o) {
    if (o instanceof String s && s.isEmpty()) {
      System.out.println(s);
    }
  }
}
""",
        # body = [sLocal, ifStmt] (:521-525); outer andCall args =
        # [innerAndCall, isEmptyCall] (:532-535)
        locals=[["test.s", "String s|java.lang.String"]],
        ast={
            ("<empty>", 0): ["String s",
                          "if (o instanceof String s && s.isEmpty())"],
            "o instanceof String s && s.isEmpty()": [
                "(o instanceof String) && { s = (String) o; true; }",
                "s.isEmpty()"],
            "(o instanceof String) && { s = (String) o; true; }": [
                "o instanceof String", "{ s = (String) o; true; }"],
            "o instanceof String": ["o", "String"],
            "{ s = (String) o; true; }": ["s = (String) o", "true"],
            "s = (String) o": ["s", "(String) o"],
            ("(String) o", 0): ["String", "o"],
            "s.isEmpty()": ["s"],
        },
        nodetype={
            ("o instanceof String s && s.isEmpty()", 0): "boolean",
            ("o", 0): "java.lang.Object",
            ("o", 1): "java.lang.Object",
            ("String", 0): "java.lang.String",
            ("String", 1): "java.lang.String",
            ("s = (String) o", 0): "java.lang.String",
            ("s", 0): "java.lang.String",
            ("s", 1): "java.lang.String",
            ("s", 2): "java.lang.String",
        },
        callmfn=[["isEmpty", "java.lang.String.isEmpty:boolean()"]],
        refs={
            ("s", 0): ["String s&<empty>@0"],
            ("s", 1): ["String s&<empty>@0"],
            ("s", 2): ["String s&<empty>@0"],
            ("o", 0): ["Object o&test@0"],
            ("o", 1): ["Object o&test@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:497-587",
    ),
    dict(
        name="java-pat-or-rhs", lang="java", wrap=False,
        code="""
class Test {
  void test(Object o) {
    if (!(o instanceof String s) || s.isEmpty()) {
      System.out.println("no input found");
    }
  }
}
""",
        locals=[["test.s", "String s|java.lang.String"]],
        ast={
            ("<empty>", 0): [
                "String s",
                "if (!(o instanceof String s) || s.isEmpty())"],
            "!(o instanceof String s) || s.isEmpty()": [
                "!(o instanceof String s)", "s.isEmpty()"],
            "!(o instanceof String s)": [
                "(o instanceof String) && { s = (String) o; true; }"],
            "(o instanceof String) && { s = (String) o; true; }": [
                "o instanceof String", "{ s = (String) o; true; }"],
            "o instanceof String": ["o", "String"],
            "{ s = (String) o; true; }": ["s = (String) o", "true"],
            "s = (String) o": ["s", "(String) o"],
            ("(String) o", 0): ["String", "o"],
            "s.isEmpty()": ["s"],
        },
        nodetype={
            ("!(o instanceof String s) || s.isEmpty()", 0): "boolean",
            ("s", 0): "java.lang.String",
            ("s", 1): "java.lang.String",
        },
        callmfn=[["isEmpty", "java.lang.String.isEmpty:boolean()"]],
        refs={
            ("s", 0): ["String s&<empty>@0"],
            ("s", 1): ["String s&<empty>@0"],
            ("o", 0): ["Object o&test@0"],
            ("o", 1): ["Object o&test@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:589-678",
    ),
    dict(
        name="java-pat-and-mutated", lang="java", wrap=False,
        code="""
class Test {
  static void test(Object o) {
    if (o instanceof String value && (value = "Foo").isEmpty()) {
      System.out.println(value);
    }
  }
}
""",
        locals=[["test.value", "String value|java.lang.String"]],
        ast={
            "(o instanceof String) && { value = (String) o; true; }": [
                "o instanceof String", "{ value = (String) o; true; }"],
            "o instanceof String": ["o", "String"],
            "{ value = (String) o; true; }": [
                "value = (String) o", "true"],
            "value = (String) o": ["value", "(String) o"],
            ("(String) o", 0): ["String", "o"],
            # isEmpty receiver is the (value = "Foo") assignment (:758-768)
            '(value = "Foo").isEmpty()': ['value = "Foo"'],
            'value = "Foo"': ["value", '"Foo"'],
            "System.out.println(value)": ["System.out", "value"],
        },
        nodetype={
            ("value = (String) o", 0): "java.lang.String",
            ("value", 0): "java.lang.String",
            ("value", 1): "java.lang.String",
            ("value", 2): "java.lang.String",
        },
        callmfn=[["isEmpty", "java.lang.String.isEmpty:boolean()"]],
        refs={
            ("value", 0): ["String value&<empty>@0"],
            ("value", 1): ["String value&<empty>@0"],
            ("value", 2): ["String value&<empty>@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:680-771",
    ),
    dict(
        name="java-pat-or-mutated", lang="java", wrap=False,
        code="""
class Test {
  static void test(Object o) {
    if (!(o instanceof String value) || (value = "Foo").isEmpty()) {
      return;
    }
    System.out.println(value);
  }
}
""",
        # body = [valueLocal, ifStmt, printCall] (:795-800); println(value)
        # refs the pattern local past the early-return if (:873-880)
        locals=[["test.value", "String value|java.lang.String"]],
        ast={
            ("<empty>", 0): [
                "String value",
                'if (!(o instanceof String value) || '
                '(value = "Foo").isEmpty())',
                "System.out.println(value)"],
            "!(o instanceof String value)": [
                "(o instanceof String) && { value = (String) o; true; }"],
            "(o instanceof String) && { value = (String) o; true; }": [
                "o instanceof String", "{ value = (String) o; true; }"],
            "{ value = (String) o; true; }": [
                "value = (String) o", "true"],
            "value = (String) o": ["value", "(String) o"],
            '(value = "Foo").isEmpty()': ['value = "Foo"'],
            "System.out.println(value)": ["System.out", "value"],
        },
        nodetype={
            ("value", 0): "java.lang.String",
            ("value", 1): "java.lang.String",
            ("value", 2): "java.lang.String",
        },
        callmfn=[["isEmpty", "java.lang.String.isEmpty:boolean()"]],
        refs={
            ("value", 0): ["String value&<empty>@0"],
            ("value", 1): ["String value&<empty>@0"],
            ("value", 2): ["String value&<empty>@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:772-882",
    ),
    # ----------------------------------------------------------------- #
    # patterns in ternary expressions
    # ----------------------------------------------------------------- #
    dict(
        name="java-pat-ternary-then", lang="java", wrap=False,
        code="""
class Test {
  void test(Object o) {
    int x = o instanceof String s ? s.length() : -1;
  }
}
""",
        # body = [sLocal, xLocal, xAssign] (:903-910)
        locals=[["test.s", "String s|java.lang.String"],
                ["test.x", "int x|int"]],
        ast={
            ("<empty>", 0): [
                "String s", "int x",
                "int x = o instanceof String s ? s.length() : -1"],
            "o instanceof String s ? s.length() : -1": [
                "(o instanceof String) && { s = (String) o; true; }",
                "s.length()", "-1"],
            "(o instanceof String) && { s = (String) o; true; }": [
                "o instanceof String", "{ s = (String) o; true; }"],
            "o instanceof String": ["o", "String"],
            "{ s = (String) o; true; }": ["s = (String) o", "true"],
            "s = (String) o": ["s", "(String) o"],
            ("(String) o", 0): ["String", "o"],
            "s.length()": ["s"],
        },
        nodetype={
            ("s", 0): "java.lang.String",
            ("s", 1): "java.lang.String",
            ("s = (String) o", 0): "java.lang.String",
        },
        callmfn=[["length", "java.lang.String.length:int()"],
                 ["<operator>.conditional", "<operator>.conditional"],
                 ["<operator>.minus", "<operator>.minus"]],
        refs={
            ("s", 0): ["String s&<empty>@0"],
            ("s", 1): ["String s&<empty>@0"],
            ("o", 0): ["Object o&test@0"],
            ("o", 1): ["Object o&test@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:885-971",
    ),
    dict(
        name="java-pat-ternary-else", lang="java", wrap=False,
        code="""
class Test {
  void test(Object o) {
    int x = !(o instanceof String s) ? -1: s.length();
  }
}
""",
        locals=[["test.s", "String s|java.lang.String"],
                ["test.x", "int x|int"]],
        ast={
            ("<empty>", 0): [
                "String s", "int x",
                "int x = !(o instanceof String s) ? -1: s.length()"],
            "!(o instanceof String s) ? -1: s.length()": [
                "!(o instanceof String s)", "-1", "s.length()"],
            "!(o instanceof String s)": [
                "(o instanceof String) && { s = (String) o; true; }"],
            "(o instanceof String) && { s = (String) o; true; }": [
                "o instanceof String", "{ s = (String) o; true; }"],
            "{ s = (String) o; true; }": ["s = (String) o", "true"],
            "s = (String) o": ["s", "(String) o"],
            "s.length()": ["s"],
        },
        nodetype={
            ("s", 0): "java.lang.String",
            ("s", 1): "java.lang.String",
        },
        callmfn=[["length", "java.lang.String.length:int()"],
                 ["<operator>.conditional", "<operator>.conditional"]],
        refs={
            ("s", 0): ["String s&<empty>@0"],
            ("s", 1): ["String s&<empty>@0"],
        },
        cite="javasrc2cpg/.../querying/PatternExprTests.scala:973-1122",
    ),
]


# --------------------------------------------------------------------- #
# patterns in if/while/do/for statements (PatternExprTests :1124-1599).
# The reference factors the shared assertions into
# testStandardPatternLocalLowering / testStandardTypePatternAssignmentLowering
# (:1054-1122); _std_* below are their transcriptions, merged per case.
# --------------------------------------------------------------------- #

def _std_ast():
    """testStandardTypePatternAssignmentLowering: andCall args, instanceOf
    args, assign-block children, cast args (PatternExprTests:1066-1100)."""
    return {
        "(o instanceof String) && { s = (String) o; true; }": [
            "o instanceof String", "{ s = (String) o; true; }"],
        "o instanceof String": ["o", "String"],
        "{ s = (String) o; true; }": ["s = (String) o", "true"],
        "s = (String) o": ["s", "(String) o"],
        ("(String) o", 0): ["String", "o"],
    }


def _std_nodetype(extra=None):
    d = {
        ("o", 0): "java.lang.Object",
        ("o", 1): "java.lang.Object",
        ("String", 0): "java.lang.String",
        ("String", 1): "java.lang.String",
        ("s = (String) o", 0): "java.lang.String",
        ("s", 0): "java.lang.String",
    }
    d.update(extra or {})
    return d


def _flow_case(name, code, cite, sink_field, sink_local, cs_type,
               cond_code, assign_s=0):
    """One if/while/do/for flow-scope case: the standard lowering plus
    which sink sees the `this.s` field (Integer) vs the pattern local.
    `sink_local` maps sink name -> occurrence index of its `s` identifier
    (FIELD_IDENTIFIERs under `this.s` accesses also spell `s` and consume
    occurrence slots, so indices are given explicitly); `assign_s` is the
    occurrence of the lowering's own `s` (non-zero in do-while, where the
    body parses first)."""
    ast = _std_ast()
    nt = _std_nodetype()
    if assign_s:
        del nt[("s", 0)]
        nt[("s", assign_s)] = "java.lang.String"
    refs = {}
    for sk, occ in sink_local.items():
        ast[f"{sk}(s)"] = ["s"]
        nt[("s", occ)] = "java.lang.String"
        refs[("s", occ)] = ["String s&<empty>@0"]
    for i, sk in enumerate(sink_field):
        ast[f"{sk}(s)"] = ["this.s"]
        nt[("this.s", i)] = "java.lang.Integer"
    case = dict(name=name, lang="java", wrap=False, code=code,
                locals=[["foo.s", "String s|java.lang.String"]],
                ast=ast, nodetype=nt,
                cscond=[[f"foo:{cs_type}", cond_code]],
                cite=cite)
    if refs:
        case["refs"] = refs
    return case


CASES += [
    _flow_case(
        "java-pat-if-then",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    if (o instanceof String s) {
      sink(s);
    }
  }
  static void sink(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1125-1161",
        sink_field=[], sink_local={"sink": 1}, cs_type="IF",
        cond_code="(o instanceof String) && { s = (String) o; true; }"),
    _flow_case(
        "java-pat-if-else",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    if (!(o instanceof String s)) {
    } else {
      sink(s);
    }
  }
  static void sink(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1163-1200",
        sink_field=[], sink_local={"sink": 1}, cs_type="IF",
        cond_code="!(o instanceof String s)"),
    _flow_case(
        "java-pat-if-surrounding",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    if (!(o instanceof String s)) {
      return;
    }
    sink(s);
  }
  static void sink(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1202-1239",
        sink_field=[], sink_local={"sink": 1}, cs_type="IF",
        cond_code="!(o instanceof String s)"),
    _flow_case(
        "java-pat-if-else-surrounding",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    if (!(o instanceof String s)) {
      sink1(s);
      return;
    } else {
      sink2(s);
    }
    sink3(s);
  }
  static void sink1(Object o) {}
  static void sink2(Object o) {}
  static void sink3(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1241-1299",
        sink_field=["sink1"], sink_local={"sink2": 2, "sink3": 3},
        cs_type="IF", cond_code="!(o instanceof String s)"),
    _flow_case(
        "java-pat-while-body",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    while (o instanceof String s) {
      sink1(s);
    }
    sink2(s);
  }
  static void sink1(Object o) {}
  static void sink2(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1302-1348",
        sink_field=["sink2"], sink_local={"sink1": 1}, cs_type="WHILE",
        cond_code="(o instanceof String) && { s = (String) o; true; }"),
    _flow_case(
        "java-pat-while-intro",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    while (!(o instanceof String s)) {
      sink1(s);
    }
    sink2(s);
  }
  static void sink1(Object o) {}
  static void sink2(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1350-1397",
        sink_field=["sink1"], sink_local={"sink2": 2}, cs_type="WHILE",
        cond_code="!(o instanceof String s)"),
    _flow_case(
        "java-pat-do-intro",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    do { sink1(s); } while (!(o instanceof String s));
    sink2(s);
  }
  static void sink1(Object o) {}
  static void sink2(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1400-1446",
        sink_field=["sink1"], sink_local={"sink2": 2}, cs_type="DO",
        cond_code="!(o instanceof String s)", assign_s=1),
    _flow_case(
        "java-pat-for-body",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    for (; o instanceof String s;) {
      sink1(s);
    }
    sink2(s);
  }
  static void sink1(Object o) {}
  static void sink2(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1505-1551",
        sink_field=["sink2"], sink_local={"sink1": 1}, cs_type="FOR",
        cond_code="(o instanceof String) && { s = (String) o; true; }"),
    _flow_case(
        "java-pat-for-intro",
        """
class Foo {
  Integer s;
  void foo(Object o) {
    for (; !(o instanceof String s);) {
      sink1(s);
    }
    sink2(s);
  }
  static void sink1(Object o) {}
  static void sink2(Object o) {}
}
""",
        "javasrc2cpg/.../querying/PatternExprTests.scala:1553-1599",
        sink_field=["sink1"], sink_local={"sink2": 2}, cs_type="FOR",
        cond_code="!(o instanceof String s)"),
]

CASES.append(dict(
    # for-update: s from the condition is in scope in update AND body init
    # lowering (:1472-1500); update refs the pattern local
    name="java-pat-for-update", lang="java", wrap=False,
    code="""
class Foo {
  void foo(Object o) {
    for(int i = 0; o instanceof String s; i += s.length()) {
      System.out.println(i);
    }
  }
}
""",
    locals=[["foo.s", "String s|java.lang.String"],
            ["foo.i", "int i|int"]],
    ast=dict(_std_ast(), **{
        "i += s.length()": ["i", "s.length()"],
        "s.length()": ["s"],
        "System.out.println(i)": ["System.out", "i"],
    }),
    nodetype=_std_nodetype({("s", 1): "java.lang.String"}),
    callmfn=[["length", "java.lang.String.length:int()"],
             ["<operator>.assignmentPlus", "<operator>.assignmentPlus"]],
    cscond=[["foo:FOR",
             "(o instanceof String) && { s = (String) o; true; }"]],
    cite="javasrc2cpg/.../querying/PatternExprTests.scala:1449-1503",
))
