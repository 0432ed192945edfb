"""C / C++ CFG parity corpus — transcribed BY HAND from the reference's
golden CFG tests (c2cpg/src/test/scala/io/joern/c2cpg/passes/cfg/
CfgCreationPassTests.scala, 57 cases; C++ try cases from
CppCfgCreationPassTests). Successor sets are keyed on code strings exactly
like the reference succOf oracle (x2cpg CfgTestFixture.scala:44-57); edge
kinds are not stored in the reference graph (CfgCreator.scala:61-67), so
parity is on successor code sets.

Snippets are bodies wrapped as `RET func() { <body> }` (wrap=True), exactly
like the reference harness (CfgCreationPassTests.scala:13-15).
"""

CITE = "c2cpg/src/test/scala/io/joern/c2cpg/passes/cfg/CfgCreationPassTests.scala"


def _c(name, code, cfg, lang="c", cite=CITE):
    return dict(name=name, lang=lang, wrap=True, code=code, cfg=cfg, cite=cite)


CASES = [
    _c("c-entry-exit", "", {"func": ["RET"], "RET": []}),
    _c("c-decl-assign", "int x = 1;", {
        "func": ["x"], "x": ["1"], "1": ["x = 1"], "x = 1": ["RET"]}),
    _c("c-nested-expression", "x = y + 1;", {
        "func": ["x"], "x": ["y"], "y": ["1"], "1": ["y + 1"],
        "y + 1": ["x = y + 1"], "x = y + 1": ["RET"]}),
    _c("c-return", "return x;", {
        "func": ["x"], "x": ["return x;"], "return x;": ["RET"]}),
    _c("c-consecutive-returns", "return x; return y;", {
        "func": ["x"], "x": ["return x;"], "y": ["return y;"],
        "return x;": ["RET"], "return y;": ["RET"]}),
    _c("c-void-return", "return;", {"func": ["return;"], "return;": ["RET"]}),
    _c("c-call", "foo(a + 1, b);", {
        "func": ["a"], "a": ["1"], "1": ["a + 1"], "a + 1": ["b"],
        "b": ["foo(a + 1, b)"], "foo(a + 1, b)": ["RET"]}),
    _c("c-unary-plus", "+x;", {"func": ["x"], "x": ["+x"], "+x": ["RET"]}),
    _c("c-pre-increment", "++x;", {"func": ["x"], "x": ["++x"], "++x": ["RET"]}),
    _c("c-conditional", "x ? y : z;", {
        "func": ["x"], "x": ["y", "z"], "y": ["x ? y : z"],
        "z": ["x ? y : z"], "x ? y : z": ["RET"]}),
    _c("c-conditional-empty-then", "x ? : z;", {
        "func": ["x"], "x": ["x ? : z", "z"], "z": ["x ? : z"],
        "x ? : z": ["RET"]}),
    _c("c-short-circuit-and", "int z = x && y;", {
        "func": ["z"], "z": ["x"], "x": ["y", "x && y"], "y": ["x && y"],
        "x && y": ["z = x && y"], "z = x && y": ["RET"]}),
    _c("c-short-circuit-or", "x || y;", {
        "func": ["x"], "x": ["y", "x || y"], "y": ["x || y"],
        "x || y": ["RET"]}),
    _c("c-while", "while (x < 1) { y = 2; }", {
        "func": ["x"], "x": ["1"], "1": ["x < 1"],
        "x < 1": ["y", "RET"], "y": ["2"], "2": ["y = 2"], "y = 2": ["x"]}),
    _c("c-while-break", "while (x < 1) { break; y; }", {
        "func": ["x"], "x": ["1"], "1": ["x < 1"],
        "x < 1": ["break;", "RET"], "break;": ["RET"], "y": ["x"]}),
    _c("c-while-continue", "while (x < 1) { continue; y; }", {
        "func": ["x"], "x": ["1"], "1": ["x < 1"],
        "x < 1": ["continue;", "RET"], "continue;": ["x"], "y": ["x"]}),
    _c("c-nested-while", "while (x) { while (y) { z; }}", {
        "func": ["x"], "x": ["0"], ("0", 0): ["x != 0"],
        "x != 0": ["y", "RET"], "y": ["0"], ("0", 1): ["y != 0"],
        "y != 0": ["z", "x"], "z": ["y"]}),
    _c("c-do-while", "do { y = 2; } while (x < 1);", {
        "func": ["y"], "y": ["2"], "2": ["y = 2"], "y = 2": ["x"],
        "x": ["1"], "1": ["x < 1"], "x < 1": ["y", "RET"]}),
    _c("c-do-while-break", "do { break; y; } while (x < 1);", {
        "func": ["break;"], "break;": ["RET"], "y": ["x"],
        "x": ["1"], "1": ["x < 1"], "x < 1": ["break;", "RET"]}),
    _c("c-do-while-continue", "do { continue; y; } while (x < 1);", {
        "func": ["continue;"], "continue;": ["x"], "y": ["x"],
        "x": ["1"], "1": ["x < 1"], "x < 1": ["continue;", "RET"]}),
    _c("c-nested-do-while", "do { do { x; } while (y); } while (z);", {
        "func": ["x"], "x": ["y"], "y": ["0"], ("0", 0): ["y != 0"],
        "y != 0": ["x", "z"], "z": ["0"], ("0", 1): ["z != 0"],
        "z != 0": ["x", "RET"]}),
    _c("c-do-while-empty-body", "do { } while(x > 1);", {
        "func": ["x"], "1": ["x > 1"], "x > 1": ["x", "RET"]}),
    _c("c-for", "for (x = 0; y < 1; z += 2) { a = 3; }", {
        "func": ["x"], "x": ["0"], "0": ["x = 0"], "x = 0": ["y"],
        "y": ["1"], "1": ["y < 1"], "y < 1": ["a", "RET"],
        "a": ["3"], "3": ["a = 3"], "a = 3": ["z"], "z": ["2"],
        "2": ["z += 2"], "z += 2": ["y"]}),
    _c("c-for-break", "for (x = 0; y < 1; z += 2) { break; a = 3; }", {
        "func": ["x"], "x": ["0"], "x = 0": ["y"], "y": ["1"],
        "1": ["y < 1"], "y < 1": ["break;", "RET"], "break;": ["RET"],
        "a": ["3"], "3": ["a = 3"], "a = 3": ["z"], "z": ["2"],
        "2": ["z += 2"], "z += 2": ["y"]}),
    _c("c-for-continue", "for (x = 0; y < 1; z += 2) { continue; a = 3; }", {
        "func": ["x"], "x": ["0"], "0": ["x = 0"], "x = 0": ["y"],
        "y": ["1"], "1": ["y < 1"], "y < 1": ["continue;", "RET"],
        "continue;": ["z"], "a": ["3"], "3": ["a = 3"], "a = 3": ["z"],
        "z": ["2"], "2": ["z += 2"], "z += 2": ["y"]}),
    _c("c-nested-for", "for (x; y; z) { for (a; b; c) { u; } }", {
        "func": ["x"], "x": ["y"], "y": ["0"], ("0", 0): ["y != 0"],
        "y != 0": ["a", "RET"], "z": ["y"], "a": ["b"], "b": ["0"],
        ("0", 1): ["b != 0"], "b != 0": ["u", "z"], "c": ["b"], "u": ["c"]}),
    _c("c-for-empty-condition", "for (;;) { a = 1; }", {
        "func": ["a"], "a": ["1"], "1": ["a = 1"], "a = 1": ["a"]}),
    _c("c-for-empty-condition-break", "for (;;) { break; }", {
        "func": ["break;"], "break;": ["RET"]}),
    _c("c-for-empty-condition-continue", "for (;;) { continue ; }", {
        "func": ["continue ;"], "continue ;": ["continue ;"]}),
    _c("c-for-empty-nested", "for (;;) { for (;;) { x; } }", {
        "func": ["x"], "x": ["x"]}),
    _c("c-for-empty-all", "for (;;) ;", {"func": ["RET"]}),
    _c("c-for-skipped-then-return", "for (;;) {}; return;", {
        "func": ["return;"], "return;": ["RET"]}),
    _c("c-for-call-condition", "for (; x(1);) ;", {
        "func": ["1"], "1": ["x(1)"], "x(1)": ["1", "RET"]}),
    _c("c-goto-single-label", "x; goto l1; y; l1: ;", {
        "func": ["x"], "x": ["goto l1;"], "goto l1;": ["l1: ;"],
        "l1: ;": ["RET"], "y": ["l1: ;"]}),
    _c("c-goto-computed",
       "void *ptr = &&foo;\ngoto *ptr;\notherCall();\nfoo: someCall();", {
           "func": ["ptr"], ("ptr", 0): ["foo"], ("ptr", 1): ["*ptr"],
           "foo": ["&&foo"], "ptr = &&foo": ["goto *;"],
           "goto *;": ["foo: someCall();"],
           "foo: someCall();": ["someCall()"],
           "otherCall()": ["foo: someCall();"],
           "someCall()": ["RET"]}),
    _c("c-goto-multiple-labels", "x; goto l1; l2: y; l1: ;", {
        "func": ["x"], "x": ["goto l1;"], "goto l1;": ["l1: ;"],
        "y": ["l1: ;"], "l1: ;": ["RET"]}),
    _c("c-goto-labels-same-spot", "x; goto l2; y; l1: ;l2: ;", {
        "func": ["x"], "x": ["goto l2;"], "goto l2;": ["l2: ;"],
        "y": ["l1: ;"], "l1: ;": ["l2: ;"], "l2: ;": ["RET"]}),
    _c("c-goto-with-if", "if(foo) goto end; if(bar) { f(x); } end: ;", {
        "func": ["foo"], "goto end;": ["end: ;"]}),
    _c("c-switch-one-case", "switch (x) { case 1: y; }", {
        "func": ["x"], "x": ["case 1:", "RET"], "case 1:": ["1"],
        "1": ["y"], "y": ["RET"]}),
    _c("c-switch-multiple-cases", "switch (x) { case 1: y; case 2: z;}", {
        "func": ["x"], "x": ["case 1:", "case 2:", "RET"],
        "case 1:": ["1"], "1": ["y"], "y": ["case 2:"],
        "case 2:": ["2"], "2": ["z"], "z": ["RET"]}),
    _c("c-switch-cases-same-spot", "switch (x) { case 1: case 2: y; }", {
        "func": ["x"], "x": ["case 1:", "case 2:", "RET"],
        "case 1:": ["1"], "1": ["case 2:"], "case 2:": ["2"],
        "2": ["y"], "y": ["RET"]}),
    _c("c-switch-mixed-cases",
       "switch (x) { case 1: case 2: y; case 3: z;}", {
           "func": ["x"], "x": ["case 1:", "case 2:", "case 3:", "RET"],
           "case 1:": ["1"], "1": ["case 2:"], "case 2:": ["2"], "2": ["y"],
           "y": ["case 3:"], "case 3:": ["3"], "3": ["z"], "z": ["RET"]}),
    _c("c-switch-default", "switch (x) { default: y; }", {
        "func": ["x"], "x": ["default:"], "default:": ["y"], "y": ["RET"]}),
    _c("c-switch-case-and-default",
       "switch (x) { case 1: y; break; default: z;}", {
           "func": ["x"], "x": ["case 1:", "default:"],
           "case 1:": ["1"], "1": ["y"], "y": ["break;"], "break;": ["RET"],
           "default:": ["z"], "z": ["RET"]}),
    _c("c-nested-switch", "switch (x) { case 1: switch(y) { default: z; } }", {
        "func": ["x"], "x": ["case 1:", "RET"], "case 1:": ["1"],
        "1": ["y"], "y": ["default:"], "default:": ["z"], "z": ["RET"]}),
    _c("c-switch-continue-in-while",
       "while (i < 1) {\n  switch (j) {\n    case 0:\n      continue;\n  }\n}", {
           "continue;": ["i"]}),
    _c("c-if", "if (x) { y; }", {
        "func": ["x"], "x": ["0"], "0": ["x != 0"],
        "x != 0": ["y", "RET"], "y": ["RET"]}),
    _c("c-if-else", "if (x) { y; } else { z; }", {
        "func": ["x"], "x": ["0"], "0": ["x != 0"],
        "x != 0": ["y", "z"], "y": ["RET"], "z": ["RET"]}),
    _c("c-nested-if", "if (x) { if (y) { z; } }", {
        "func": ["x"], ("0", 0): ["x != 0"], "x != 0": ["y", "RET"],
        "y": ["0"], ("0", 1): ["y != 0"], "y != 0": ["z", "RET"],
        "z": ["RET"]}),
    _c("c-else-if-chain", "if (a) { b; } else if (c) { d;} else { e; }", {
        "func": ["a"], "a": ["0"], ("0", 0): ["a != 0"],
        "a != 0": ["b", "c"], "b": ["RET"], "c": ["0"],
        ("0", 1): ["c != 0"], "c != 0": ["d", "e"], "d": ["RET"],
        "e": ["RET"]}),
    _c("c-if-empty-then", "if (cond()) {} else { foo(); }", {
        "func": ["cond()"], "cond()": ["RET", "foo()"], "foo()": ["RET"]}),
    _c("c-if-empty-else", "if (cond()) {foo();} else {}", {
        "func": ["cond()"], "cond()": ["RET", "foo()"], "foo()": ["RET"]}),
    _c("c-if-empty-both", "if (cond()) {} else {}", {
        "func": ["cond()"], "cond()": ["RET"]}),
    # C++ try/catch (c2cpg CppCfgCreationPassTests)
    _c("cpp-try-single-catch", "try { a; } catch (int x) { b; }", {
        "func": ["a"], "a": ["b", "RET"], "b": ["RET"]}, lang="cpp",
       cite="c2cpg/src/test/scala/io/joern/c2cpg/passes/cfg/CppCfgCreationPassTests.scala"),
    _c("cpp-try-multiple-catches",
       "try { a; } catch (short x) { b; } catch (int y) { c; } "
       "catch (long z) { d; }", {
           "func": ["a"], "a": ["b", "c", "d", "RET"],
           "b": ["RET"], "c": ["RET"], "d": ["RET"]}, lang="cpp",
       cite="c2cpg/src/test/scala/io/joern/c2cpg/passes/cfg/CppCfgCreationPassTests.scala"),
]

# --------------------------------------------------------------------------- #
# Preprocessor macro cases — transcribed from c2cpg MacroHandlingTests.scala.
# The reference expands the macro (expansion nodes join the graph with normal
# operator lowering) AND creates an INLINED CALL named after the macro whose
# code is the raw invocation, arguments are the parsed macro arguments, and a
# METHOD stub `<filename>:NAME:ANY(n)` (filenames here are the corpus paths).
# --------------------------------------------------------------------------- #

MACRO_CITE = "c2cpg/src/test/scala/io/joern/c2cpg/macros/MacroHandlingTests.scala"

CASES += [
    # MacroHandlingTests1:22-73 — function-like macro: expansion `*y = 10+2`
    # with STATIC dispatch, macro call A_MACRO(*y, 2) with parsed args,
    # METHOD stub with params
    dict(name="c-macro-expand", lang="c", wrap=False, cite=MACRO_CITE + ":22-73",
         code="#define A_MACRO(x,c) (x = 10 + c)\n"
              "int foo() {\n  int *y;\n  A_MACRO(*y, 2);\n  return 10 * y;\n}\n",
         ast={("A_MACRO(*y, 2)", 0): ["*y", "2", "<empty>"],
              ("*y = 10 + 2", 0): ["*y", "10 + 2"],
              ("*y", 0): ["y"],
              ("*y", 1): ["y"],
              ("10 + 2", 0): ["10", "2"]},
         calls=[["foo", "A_MACRO"]],
         methods=[["foo", "foo"],
                  ["A_MACRO", "c-macro-expand.c:A_MACRO:ANY(2)"]]),
    # MacroHandlingTests2:77-110 — nested macro expands textually with NO
    # inner call wrapper; the inner addition is fully lowered
    dict(name="c-macro-nested", lang="c", wrap=False, cite=MACRO_CITE + ":77-110",
         # NOTE: the reference re-renders expansion code via CDT ("y + 1");
         # this engine preserves the #define body text verbatim ("y+1") —
         # a documented spacing divergence, the lowering itself is identical
         code="#define A_MACRO(x) (x = A_SECOND_MACRO(x))\n"
              "#define A_SECOND_MACRO(x) (x + 1)\n"
              "int foo() {\n int y;\n A_MACRO(y);\n return 10 * y;\n}\n",
         ast={("y + 1", 0): ["y", "1"]},
         calls=[["foo", "A_MACRO"]]),
    # MacroHandlingTests3:112-126 — call inside macro body is a real call
    dict(name="c-macro-printf", lang="c", wrap=False, cite=MACRO_CITE + ":112-126",
         code="#define A_MACRO(x) (printf(x))\n"
              "int foo() {\n int y;\n A_MACRO(y);\n return 10 * y;\n}\n",
         ast={("printf(y)", 0): ["y"]},
         calls=[["foo", "A_MACRO"], ["foo", "printf"]]),
    # MacroHandlingTests4:128-183 — multi-line do-while macro + zero-arg
    # macro; INLINED calls carry raw invocation code and fullname ANY(n)
    dict(name="c-macro-dowhile", lang="c", wrap=False, cite=MACRO_CITE + ":128-183",
         code="#define A_MACRO(dst, code, size)\\\n"
              "  do { \\\n"
              "    if( (i_read) >= (size) ) { dst = (code); } \\\n"
              "    else { dst = 0; } \\\n"
              "  } while(0)\n"
              "#define A_MACRO_2() (dst2)\n"
              "int foo() {\n"
              "  char * dst, ptr;\n"
              "  A_MACRO(dst, ptr, 1);\n"
              "  A_MACRO_2();\n"
              "  return 0;\n}\n",
         ast={("A_MACRO(dst, ptr, 1)", 0): ["dst", "ptr", "1", "<empty>"],
              ("A_MACRO_2()", 0): ["<empty>"]},
         calls=[["foo", "A_MACRO"], ["foo", "A_MACRO_2"]],
         methods=[["foo", "foo"],
                  ["A_MACRO", "c-macro-dowhile.c:A_MACRO:ANY(3)"],
                  ["A_MACRO_2", "c-macro-dowhile.c:A_MACRO_2:ANY(0)"]]),
    # MacroHandlingTests5/6:186-220 — constant macro in a return becomes a
    # zero-argument call whose expansion is the literal
    dict(name="c-macro-constant", lang="c", wrap=False, cite=MACRO_CITE + ":186-220",
         code="#define A_MACRO 0x0\nint foo() {\n  return A_MACRO;\n}\n",
         ast={("A_MACRO", 0): ["<empty>"],
              ("return A_MACRO;", 0): ["A_MACRO"]},
         calls=[["foo", "A_MACRO"]]),
    # MacroHandlingTests8:247-260 — macro expands on either side of a binary
    # operator; the operator call keeps the ORIGINAL (unexpanded) code
    dict(name="c-macro-binop", lang="c", wrap=False, cite=MACRO_CITE + ":247-260",
         code="#define FLAG_A 1\n"
              "int func(int x) {\n"
              "  if(x & FLAG_A) {\n    return 0;\n  } else if (FLAG_A & x) {\n"
              "    return 1;\n  }\n}\n",
         ast={("x & FLAG_A", 0): ["x", "FLAG_A"],
              ("FLAG_A & x", 0): ["FLAG_A", "x"]},
         calls=[["func", "FLAG_A"]]),
]

# --------------------------------------------------------------------------- #
# CDG / dominator / post-dominator golden case — the exact goto fixture of
# c2cpg/src/test/scala/io/joern/c2cpg/querying/CfgQueryTests.scala:8-44:
#   * controlledBy(sink).isCall contains "y < 10" and "x < 10"   (:20-25)
#   * controls(y < 10) ∩ call("sink") size == 1                  (:27-29)
#   * dominates(sink) empty                                      (:31-33)
#   * dominatedBy(sink).isCall == {"x < 10", "y < 10"} exactly   (:35-37)
#   * postDominates(printf).size == 12                           (:39-41)
#   * postDominates(method foo).size == 0                        (:43-44)
# The two count relations are EXACT (any extra/missing closure node scores
# FP+FN) — the independent CDG/post-dominance evidence VERDICT r2 asked for.
# --------------------------------------------------------------------------- #

CASES += [
    dict(
        name="c-cfg-goto-dominators", lang="c", wrap=False,
        cite="c2cpg/src/test/scala/io/joern/c2cpg/querying/CfgQueryTests.scala:8-44",
        code="""
 int foo(int x, int y) {
  if (y < 10)
    goto end;
  if (x < 10) {
    sink(x);
  }
  end:
  printf("foo");
 }
""",
        cdg={"sink(x)": ["y < 10", "x < 10"]},
        domby={"sink(x)": ["x < 10", "y < 10"]},
        dom={"sink(x)": []},
        controls_count=[["y < 10", "sink", 1]],
        postdom_count={'printf("foo")': 12, "foo": 0},
    ),
]

# Remaining CfgCreationPassTests try/throw cases (suite tail :636-672) —
# CDT parses these in its default (C) mode; same here.
CASES += [
    _c("c-try-multiple-returns", """
try {
  if (1+1) {
    return foo();
  }
  return bar();
} catch (int x) {}
""", {
        "foo()": ["return foo();"],
        "return foo();": ["RET"],
        "bar()": ["return bar();", "RET"],
    }, cite=CITE + ":636-648"),
    _c("c-throw", "throw foo();\nbar();\n", {
        "func": ["foo()"],
        "foo()": ["throw foo()"],
        "throw foo()": ["RET"],
        "bar()": ["RET"],
    }, cite=CITE + ":650-659"),
    _c("c-throw-if-else", "if (true) throw foo();\nelse bar();\n", {
        "func": ["true"],
        "true": ["foo()", "bar()"],
        "foo()": ["throw foo()"],
        "throw foo()": ["RET"],
        "bar()": ["RET"],
    }, cite=CITE + ":661-672"),
]

CASES += [
    # :225-247 — each macro invocation contributes BOTH the INLINED call
    # node (succ: its own expansion AND the next statement) and the expanded
    # do{...}while(0) body nodes.
    dict(name="c-macro-multiple-calls", lang="cpp", wrap=False, code="""
#define deleteReset(ptr) do { delete ptr; ptr = nullptr; } while(0)
void func(void) {
  int *foo = new int;
  int *bar = new int;
  int *baz = new int;
  deleteReset(foo);
  deleteReset(bar);
  deleteReset(baz);
}
""", cfg={
        "deleteReset(foo)": [("foo"), "bar"],
        ("foo", 2): ["delete foo"],
        "deleteReset(bar)": [("bar"), "baz"],
        ("bar", 2): ["delete bar"],
        "deleteReset(baz)": [("baz"), "RET"],
        ("baz", 2): ["delete baz"],
    }, cite=CITE + ":225-247"),
]

CASES += [
    # c2cpg/src/test/.../querying/AstQueryTests.scala:11-60 — nested call
    # arguments ("x + 10" is argument 1 of bar; "boo(1+2)" of moo) and the
    # callee set of foo.
    dict(name="c-ast-query", lang="c", wrap=False, code="""
 int foo(int y) {
   int x = 10;
   if (x > 10) {
     moo(boo(1+2));
     return bar(x + 10);
   } else {
     if (y > x) {
       printf("reached");
     }
   }
 }
""",
         calls=[["foo", "moo"], ["foo", "boo"], ["foo", "bar"],
                ["foo", "printf"]],
         ast={
             ("moo(boo(1+2))", 0, "CALL"): ["boo(1+2)"],
             ("boo(1+2)", 0, "CALL"): ["1+2"],
             ("bar(x + 10)", 0, "CALL"): ["x + 10"],
         },
         cite="c2cpg/src/test/scala/io/joern/c2cpg/querying/AstQueryTests.scala:11-60"),
]

CASES += [
    # c2cpg/src/test/.../querying/CallGraphQueryTests.scala:10-35 —
    # add called by main; main's named callee set; the nested-call
    # argument shape add((1+2), 3).
    dict(name="c-callgraph-query", lang="c", wrap=False, code="""
int add(int x, int y) {
  return x + y;
}

int main(int argc, char **argv) {
  printf("%d\\n", add((1+2), 3));
}
""",
         calls=[["main", "add"], ["main", "printf"]],
         # the parenthesized argument keeps the INNER code "1+2"
         # (:37-39 "argument '1+2' is passed to parameter 'x'")
         ast={("add((1+2), 3)", 0, "CALL"): ["1+2", "3"]},
         cite="c2cpg/src/test/scala/io/joern/c2cpg/querying/CallGraphQueryTests.scala:10-35"),
]


# --------------------------------------------------------------------------- #
# Round-4 C++ depth: fullname / signature / dedup transcriptions from
# c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/{MethodTests,
# AstCreationPassTests}.scala (verdict r3 next-round item #3).
# --------------------------------------------------------------------------- #

CM = "c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/MethodTests.scala"
CA = "c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/AstCreationPassTests.scala"

CASES += [
    # MethodTests "plain C method": C fullnames carry no signature.
    dict(name="c-fullname-plain", lang="c", wrap=False,
         code="int method(int);\n",
         methods=[["method", "method"]],
         cite=f"{CM}:324-336"),
    # MethodTests "C++ method with long int types": CDT size-specifier
    # normalization long int -> long; CPP free functions get :signature.
    dict(name="cpp-fullname-long", lang="cpp", wrap=False,
         code="""
long methodA(long int a, long int b) { return a *  b; }
long int methodB(long a, long b) { return a *  b; }
""",
         methods=[["methodA", "methodA:long(long,long)"],
                  ["methodB", "methodB:long(long,long)"]],
         cite=f"{CM}:338-358"),
    # MethodTests "long long int types": long long -> longlong.
    dict(name="cpp-fullname-longlong", lang="cpp", wrap=False,
         code="""
long long methodA(long long int a, long long int b) { return a *  b; }
long long int methodB(long long a, long long b) { return a *  b; }
""",
         methods=[["methodA", "methodA:longlong(longlong,longlong)"],
                  ["methodB", "methodB:longlong(longlong,longlong)"]],
         cite=f"{CM}:360-380"),
    # MethodTests "short int types".
    dict(name="cpp-fullname-short", lang="cpp", wrap=False,
         code="""
short methodA(short int a, short int b) { return a *  b; }
short int methodB(short a, short b) { return a *  b; }
""",
         methods=[["methodA", "methodA:short(short,short)"],
                  ["methodB", "methodB:short(short,short)"]],
         cite=f"{CM}:382-402"),
    # MethodTests "plain method CPP": namespace-qualified fullname.
    dict(name="cpp-fullname-namespace", lang="cpp", wrap=False,
         code="""
namespace NNN {
  int method(int);
}
""",
         methods=[["method", "NNN.method:int(int)"]],
         cite=f"{CM}:436-449"),
    # MethodTests "plain extern C method": C linkage strips BOTH the
    # namespace qualifier and the :signature suffix.
    dict(name="cpp-fullname-extern-c", lang="cpp", wrap=False,
         code="""
namespace NNN {
  extern "C" {
    int method(int);
  }
}
""",
         methods=[["method", "method"]],
         cite=f"{CM}:451-464"),
    # MethodTests "class method": namespace + class qualifiers.
    dict(name="cpp-fullname-class-method", lang="cpp", wrap=False,
         code="""
namespace NNN {
  class CCC {
    int method(int);
  };
}
""",
         methods=[["method", "NNN.CCC.method:int(int)"]],
         cite=f"{CM}:466-479"),
    # MethodTests MethodTest6: template args with line breaks strip from the
    # short name (FullNameProvider.stripTemplateTags).
    dict(name="cpp-template-linebreaks", lang="cpp", wrap=False,
         code="""
void foo<A,
         B,
         C>() {};
""",
         methods=[["foo", "foo:void()"]],
         mcount=[["foo:void()", 1]],
         cite=f"{CM}:104-122"),
    # MethodTests "Static modifier": C++ static class methods keep class
    # qual + signature; plain C statics stay bare.
    dict(name="cpp-static-methods", lang="cpp", wrap=False,
         code="""
class A {
  static void staticCPPMethodDecl();
  static void staticCPPMethodDef() {}
};
""",
         methods=[["staticCPPMethodDecl", "A.staticCPPMethodDecl:void()"],
                  ["staticCPPMethodDef", "A.staticCPPMethodDef:void()"]],
         cite=f"{CM}:277-303"),
    dict(name="c-static-methods", lang="c", wrap=False,
         code="""
static void staticCMethodDecl();
static void staticCMethodDef() {}
""",
         methods=[["staticCMethodDecl", "staticCMethodDecl"],
                  ["staticCMethodDef", "staticCMethodDef"]],
         cite=f"{CM}:277-303"),
    # MethodTests MethodTest9: repeated forward declarations dedup to ONE
    # method node per fullname.
    dict(name="cpp-forward-decl-dedup", lang="cpp", wrap=False,
         code="""
int main(char **argv, int argc) {
  return abs(argc);
}

int abs(int j);
int abs(int j);
int abs(int j);
""",
         mcount=[["abs:int(int)", 1], ["main:int(char**,int)", 1]],
         cite=f"{CM}:257-275"),
    # AstCreationPassTests "template function": the definition survives,
    # explicit instantiations create no extra METHOD.
    dict(name="cpp-template-function", lang="cpp", wrap=False,
         code="""
template<typename T>
void f(T s)
{ }

template void f<double>(double);
template void f<>(char);
template void f(int);
""",
         methods=[["f", "f:void(T)"]],
         mcount=[["f:void(T)", 1]],
         cite=f"{CA} (template function: cpg.method.nameExact(f).size == 1)"),
    # AstCreationPassTests "template class": one TYPE_DECL + one method,
    # explicit instantiation lines add nothing.
    dict(name="cpp-template-class", lang="cpp", wrap=False,
         code="""
template<class T>
class Y
{
  void mf() { }
};
template class Y<char*>;
template void Y<double>::mf();
""",
         methods=[["mf", "Y.mf:void()"]],
         mcount=[["Y.mf:void()", 1]],
         cite=f"{CA} (template class: cpg.typeDecl.nameExact(Y).size == 1)"),
    # AstCreationPassTests "constructor initializer": c2cpg names
    # constructors after their class; nested classes carry the outer
    # qualifier (Foo.Bar.Bar:void(float)).
    dict(name="cpp-ctor-nested-class", lang="cpp", wrap=False,
         code="""
class Foo {
public:
  Foo(int i){};
  class Bar {
    public:
      Bar(float j){};
  };
};
""",
         methods=[["Foo", "Foo.Foo:void(int)"],
                  ["Bar", "Foo.Bar.Bar:void(float)"]],
         cite=f"{CA}:1447-1476"),
    # MethodTests "class method in nested class": the out-of-line
    # Outer::Inner::Method definition merges with the in-class declaration.
    dict(name="cpp-nested-out-of-line", lang="cpp", wrap=False,
         code="""
class Outer {
  class Inner {
    void Method();
    int member;
 };
};
void Outer::Inner::Method() {
  member;
}
""",
         methods=[["Method", "Outer.Inner.Method:void()"]],
         mcount=[["Outer.Inner.Method:void()", 1]],
         members=[["Inner.member", "int"]],
         cite=f"{CM}:525-541"),
    # MethodTests "implicit member access": non-static members get an
    # implicit `this` parameter typed Class*.
    dict(name="cpp-implicit-this", lang="cpp", wrap=False,
         code="""
class A {
  int var;
  void meth() {
    this->var = 1;
  }
};
""",
         params=[["meth.this", "0:A*:BY_SHARING"]],
         cite=f"{CM}:481-523"),
    # MethodTests "extern C class operator overloads": distinct fullnames,
    # operator short names strip the keyword, const tags the signature.
    dict(name="cpp-operator-overloads", lang="cpp", wrap=False,
         code="""
extern "C" {
  typedef struct _json_value {
    int type;
    inline const struct _json_value &operator [] (int index) const {
      return *this;
    }
    inline const struct _json_value &operator [] (const char * index) const {
      return *this;
    }
  } json_value;
}
""",
         methods=[["[]", "_json_value.[]:_json_value&(int)<const>"],
                  ["[]", "_json_value.[]:_json_value&(char*)<const>"]],
         mcount=[["_json_value.[]:_json_value&(int)<const>", 1],
                 ["_json_value.[]:_json_value&(char*)<const>", 1]],
         cite=f"{CM}:543-562"),
    # MethodTests "constructor member-initializer list": the init list is
    # consumed, the ctor keeps its class name + signature.
    dict(name="cpp-ctor-init-list", lang="cpp", wrap=False,
         code="""
class P {
  int x;
public:
  P(int a) : x(a) {}
};
""",
         methods=[["P", "P.P:void(int)"]],
         members=[["P.x", "int"]],
         cite=f"{CA}:1447-1476 (ctor fullname scheme)"),
]


CASES += [
    # types/StructTypeTests.scala:9-21 — anonymous typedef struct takes
    # the typedef name.
    dict(
        name="c-struct-typedef-anon", lang="c",
        code="""
typedef struct {
  uint32_t bar;
} Foo;
""",
        members=[("Foo.bar", "uint32_t")],
        cite="c2cpg/.../passes/types/StructTypeTests.scala:9-21",
    ),
    # :23-38 — member codes keep the raw declarator spelling incl. array
    # size expressions. (The reference additionally lowers array sizes
    # into a <clinit> arrayInitializer — not modeled here.)
    dict(
        name="c-struct-array-members", lang="c",
        code="""
#define SIZE 5
struct Foo {
  char a[SIZE];
  char b[SIZE - 1];
  char c[10];
};
""",
        # member TYPES keep the macro-expanded size (AstCreationPassTests
        # "be consistent with array types"); member CODES keep the raw
        # declarator spelling, the only thing this suite asserts
        members=[("Foo.a", "char[5]"), ("Foo.b", "char[5-1]"),
                 ("Foo.c", "char[10]")],
        membercode=[("Foo.a", "a[SIZE]"), ("Foo.b", "b[SIZE - 1]"),
                    ("Foo.c", "c[10]")],
        cite="c2cpg/.../passes/types/StructTypeTests.scala:23-60",
    ),
    # :62-89 — multiple declarators and pointer members: codes are the
    # declarators ("x", "y", "*foo").
    dict(
        name="c-struct-members", lang="c",
        code="""
struct Foo {
    int x, y;
    char *foo;
};
""",
        members=[("Foo.x", "int"), ("Foo.y", "int"), ("Foo.foo", "char*")],
        membercode=[("Foo.x", "x"), ("Foo.y", "y"), ("Foo.foo", "*foo")],
        cite="c2cpg/.../passes/types/StructTypeTests.scala:62-89",
    ),
]


CASES += [
    # types/EnumTypeTests.scala:16-45 — enumerators become MEMBERs; the
    # initializers live in a `<clinit>` returning the enum type.
    dict(
        name="cpp-enum-simple", lang="cpp",
        code="""
enum color
{
    red,
    yellow,
    green = 20,
    blue
};""",
        membercode=[("color.red", "red"), ("color.yellow", "yellow"),
                    ("color.green", "green"), ("color.blue", "blue")],
        mcount=[("color.<clinit>:color()", 1)],
        ast={("green = 20", 0): ["green", "20"]},
        cite="c2cpg/.../passes/types/EnumTypeTests.scala:16-45",
    ),
    # :47-79 — typedef enum: two TYPE_DECLs cross-linked via
    # aliasTypeFullName.
    dict(
        name="cpp-enum-typedef", lang="cpp",
        code="""
typedef enum color
{
    red,
    yellow,
    green = 20,
    blue
} C;""",
        tdalias=[("color", "C"), ("C", "color")],
        membercode=[("color.red", "red"), ("color.yellow", "yellow"),
                    ("color.green", "green"), ("color.blue", "blue")],
        mcount=[("color.<clinit>:color()", 1)],
        cite="c2cpg/.../passes/types/EnumTypeTests.scala:47-79",
    ),
    # :81-106 — enum class with underlying type: members carry it.
    dict(
        name="cpp-enum-class", lang="cpp",
        code="""
enum class altitude: char
{ 
     high='h',
     low='l', // C++11 allows the extra comma
}; """,
        members=[("altitude.high", "char"), ("altitude.low", "char")],
        mcount=[("altitude.<clinit>:altitude()", 1)],
        ast={("high='h'", 0): ["high", "'h'"],
             ("low='l'", 0): ["low", "'l'"]},
        cite="c2cpg/.../passes/types/EnumTypeTests.scala:81-106",
    ),
]


CASES += [
    # types/ClassTypeTests.scala:66-133 (example 2) — typeDecl fields,
    # inheritance, typedef alias, members and methods.
    dict(
        name="cpp-class-fields", lang="cpp",
        code="""
class Foo : Bar {
  char x;
  int y;
  int method() {}
};
typedef int mytype;""",
        inherits=[("Foo", "Bar")],
        tdalias=[("mytype", "int")],
        members=[("Foo.x", "char"), ("Foo.y", "int")],
        mcount=[("Foo.method:int()", 1)],
        cite="c2cpg/.../passes/types/ClassTypeTests.scala:66-133",
    ),
    # :135-165 (example 3) — member calls resolve through the member's
    # class with the receiver-typed fullname; bare member reads lower to
    # `this->member` indirectFieldAccess.
    dict(
        name="cpp-class-member-calls", lang="cpp",
        code="""
class B {
public:
  void foo2() {}
};

class A {
private:
  B b;

public:
  void foo1() {
    b.foo2();
    B x = b;
   }
};

int main() {
  A a;
  a.foo1();
  return 0;
}""",
        callmfn=[("foo2", "B.foo2:void()"),
                 ("foo1", "A.foo1:void()")],
        ast={("this->b", 0): ["this", "b"],
             ("this->b", 1): ["this", "b"]},
        cite="c2cpg/.../passes/types/ClassTypeTests.scala:135-165",
    ),
]


_NSQ = """
namespace Q {
  namespace V {
    class C { int m(); };
    int f();
  }

  int V::f()
  {
    extern void h();
    return 0;
  }

  int V::C::m()
  { return 0 ; }
}
"""

_NSQ17 = """
namespace Q::V {
  class C { int m(); };
  int f();
}

int Q::V::f()
{
  extern void h();
  return 0;
}

int Q::V::C::m()
{ return 0; }
"""

CASES += [
    # types/NamespaceTypeTests.scala:16-64 — nested namespaces: method
    # fullnames carry the dotted namespace path; each namespace gets a
    # NAMESPACE_BLOCK named `{file}:{dotted}`.
    dict(
        name="cpp-namespace-nested", lang="cpp", code=_NSQ,
        mcount=[("Q.V.f:int()", 1), ("Q.V.C.m:int()", 1)],
        nsblock=[("Q", "cpp-namespace-nested.cpp:Q"),
                 ("V", "cpp-namespace-nested.cpp:Q.V")],
        cite="c2cpg/.../passes/types/NamespaceTypeTests.scala:16-64",
    ),
    # :66-112 — C++17 `namespace Q::V` syntax produces the same shape.
    dict(
        name="cpp-namespace-cpp17", lang="cpp", code=_NSQ17,
        mcount=[("Q.V.f:int()", 1), ("Q.V.C.m:int()", 1)],
        nsblock=[("Q", "cpp-namespace-cpp17.cpp:Q"),
                 ("V", "cpp-namespace-cpp17.cpp:Q.V")],
        cite="c2cpg/.../passes/types/NamespaceTypeTests.scala:66-112",
    ),
]


CASES += [
    # types/TemplateTypeTests.scala:12-35 — class templates erase to their
    # bare names; using-aliases point at the template names.
    dict(
        name="cpp-template-classes", lang="cpp",
        code="""
template<class T> class X {};
template<typename A, typename B> class Y;
using A = X<int>;
using B = Y<int, char>;
""",
        tdalias=[("A", "X"), ("B", "Y")],
        cite="c2cpg/.../passes/types/TemplateTypeTests.scala:12-35",
    ),
    # :37-51 — template inheritance erases the type arguments.
    dict(
        name="cpp-template-inherit", lang="cpp",
        code="""
template<typename T> class X;
template<typename A, typename B> class Y : public X<A> {};
""",
        inherits=[("Y", "X")],
        cite="c2cpg/.../passes/types/TemplateTypeTests.scala:37-51",
    ),
    # :64-79 — function templates keep the UNERASED parameter types in the
    # signature ("x:void(T,U)").
    dict(
        name="cpp-template-functions", lang="cpp",
        code="""
template<class T, class U>
void x(T a, U b) {};

template<class T, class U>
void y(T a, U b);
""",
        mcount=[("x:void(T,U)", 1), ("y:void(T,U)", 1)],
        cite="c2cpg/.../passes/types/TemplateTypeTests.scala:64-79",
    ),
]


def _foreach_case(name, code, item_ty, coll_decl_code, cs_code, cite):
    return dict(
        name=name, lang="cpp", code=code,
        locals=[("foo.<iterator>0", "<iterator>0|std.iterator"),
                ("foo.item", f"item|{item_ty}")],
        cs=[("foo:WHILE", cs_code)],
        callmfn=[("iterator", "<unresolvedNamespace>.iterator:std.iterator()"),
                 ("hasNext", "std.iterator.hasNext:bool()"),
                 ("next", "std.iterator.next:ANY()")],
        ast={("<iterator>0 = items.iterator()", 0):
                 ["<iterator>0", "items.iterator()"],
             ("item = <iterator>0.next()", 0):
                 ["item", "<iterator>0.next()"]},
        cite=cite,
    )


CASES += [
    # ast/ForEachLoopTests.scala:12-33 — C++11 range-for over a native
    # array de-sugars to iterator locals + a WHILE control structure.
    _foreach_case(
        "cpp-foreach-array",
        """
class Foo {
  public:
    static void sink(const char* s) {}

    static void foo() {
        const char* items[] = {"a", "b", "c"};
        for (const char* item : items) {
            sink(item);
        }
    }
}""",
        "char*", "char*[]", "for (const char* item:items)",
        "c2cpg/.../passes/ast/ForEachLoopTests.scala:12-33",
    ),
    # :57-77 — range-for over a std::vector& collection.
    _foreach_case(
        "cpp-foreach-vector",
        """
class Foo {
  public:
    static void sink(const std::string& s) {}

    static void foo(const std::vector<std::string>& items) {
      for (const std::string& item : items) {
        sink(item);
      }
    }
}""",
        "std.string&", "std.vector&",
        "for (const std::string& item:items)",
        "c2cpg/.../passes/ast/ForEachLoopTests.scala:57-77",
    ),
]

# ------------------------------------------------------------------- #
# AstCreationPassTests.scala "Method AST layout" — signatures, variadic
# ellipsis params, parameter packs, K&R declarations, param shapes.
# ------------------------------------------------------------------- #
CAP = "c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/AstCreationPassTests.scala"

CASES += [
    dict(
        name="c-astpass-method-signature", lang="c", wrap=False,
        code="""
char *foo() {};
char *hello();
""",
        msig=[["foo", "char*()"], ["hello", "char*()"]],
        cite=f"{CAP}:20-31",
    ),
    dict(
        name="c-astpass-variadic-c", lang="c", wrap=False,
        code="""
int foo(const char *a, ...){ return 0; }
int bar(const char *a...){ return 0; }
""",
        # ellipsis param named <param>2, typed like the preceding param,
        # code `<param>2...`; fullName = bare name in C (:33-67)
        methods=[["foo", "foo"], ["bar", "bar"]],
        msig=[["foo", "int(char*,...)"], ["bar", "int(char*,...)"]],
        paramcode=[["foo.a", "const char *a"],
                   ["foo.<param>2", "<param>2..."],
                   ["bar.a", "const char *a"],
                   ["bar.<param>2", "<param>2..."]],
        params=[["foo.a", "1:char*:BY_VALUE"],
                ["foo.<param>2", "2:char*:BY_VALUE"],
                ["bar.a", "1:char*:BY_VALUE"],
                ["bar.<param>2", "2:char*:BY_VALUE"]],
        cite=f"{CAP}:33-67",
    ),
    dict(
        name="cpp-astpass-variadic", lang="cpp", wrap=False,
        code="""
int foo(const char *a, ...){ return 0; }
int bar(const char *a...){ return 0; }

void main() {
  foo("a", "b", "c");
}
""",
        # C++ fullnames carry the signature; the call site matches (:69-114)
        methods=[["foo", "foo:int(char*,...)"],
                 ["bar", "bar:int(char*,...)"],
                 ["main", "main:void()"]],
        callmfn=[["foo", "foo:int(char*,...)"]],
        paramcode=[["foo.a", "const char *a"],
                   ["foo.<param>2", "<param>2..."]],
        cite=f"{CAP}:69-114",
    ),
    dict(
        name="cpp-astpass-packed-args", lang="cpp", wrap=False,
        code="void foo(int x, int*... args) {};",
        # a NAMED pack keeps its type in the signature, is variadic,
        # code keeps the raw spelling (:138-156)
        msig=[["foo", "void(int,int*)"]],
        paramcode=[["foo.x", "int x"], ["foo.args", "int*... args"]],
        params=[["foo.x", "1:int:BY_VALUE"],
                ["foo.args", "2:int*:BY_VALUE"]],
        cite=f"{CAP}:138-156",
    ),
    dict(
        name="cpp-astpass-varargs", lang="cpp", wrap=False,
        code="void foo(int x, int args...) {};",
        methods=[["foo", "foo:void(int,int,...)"]],
        paramcode=[["foo.x", "int x"], ["foo.args", "int args"],
                   ["foo.<param>3", "<param>3..."]],
        params=[["foo.x", "1:int:BY_VALUE"],
                ["foo.args", "2:int:BY_VALUE"],
                ["foo.<param>3", "3:int:BY_VALUE"]],
        cite=f"{CAP}:157-180",
    ),
    dict(
        name="cpp-astpass-pack-template", lang="cpp", wrap=False,
        code="""
template<typename... Args>
void foo(char* a, Args... args) {}

void main() {
  foo("Hello", "World", "!");
}
""",
        methods=[["foo", "foo:void(char*,Args)"],
                 ["main", "main:void()"]],
        callmfn=[["foo", "foo:void(char*,Args)"]],
        cite=f"{CAP}:181-201",
    ),
    dict(
        name="cpp-astpass-pack-template-rvalue", lang="cpp", wrap=False,
        code="""
template<typename... Args>
void foo(char* a, Args&&... args) {}

void main() {
  foo("Hello", "World", "!");
}
""",
        methods=[["foo", "foo:void(char*,Args&&)"],
                 ["main", "main:void()"]],
        callmfn=[["foo", "foo:void(char*,Args&&)"]],
        cite=f"{CAP}:202-222",
    ),
    dict(
        name="c-astpass-knr", lang="c", wrap=False,
        code="""
int handler(x, y)
 int *x;
 int *y;
 {};
""",
        # K&R: the declaration list supplies types; param CODE keeps the
        # raw declaration incl. ';' (:223-243)
        paramcode=[["handler.x", "int *x;"], ["handler.y", "int *y;"]],
        params=[["handler.x", "1:int*:BY_VALUE"],
                ["handler.y", "2:int*:BY_VALUE"]],
        cite=f"{CAP}:223-243",
    ),
    dict(
        name="c-astpass-empty-method", lang="c", wrap=False,
        code="void method(int x) { }",
        params=[["method.x", "1:int:BY_VALUE"]],
        msig=[["method", "void(int)"]],
        cite=f"{CAP}:244-252",
    ),
    dict(
        name="c-astpass-param-shapes", lang="c", wrap=False,
        code="""
void method1(a_struct_type *a_struct) {}
void method2(struct date *date) {}
void method3(int x[]) {}
void method4(a_struct_type a_struct[]) {}
void method5(a_struct_type *a_struct_arr[]) {}
""",
        # pointer / struct-keyword / array / array-of-pointer parameter
        # typeFullNames and raw codes (:254-339)
        params=[["method1.a_struct", "1:a_struct_type*:BY_VALUE"],
                ["method2.date", "1:date*:BY_VALUE"],
                ["method3.x", "1:int[]:BY_VALUE"],
                ["method4.a_struct", "1:a_struct_type[]:BY_VALUE"],
                ["method5.a_struct_arr", "1:a_struct_type[]*:BY_VALUE"]],
        paramcode=[["method1.a_struct", "a_struct_type *a_struct"],
                   ["method2.date", "struct date *date"],
                   ["method3.x", "int x[]"],
                   ["method4.a_struct", "a_struct_type a_struct[]"],
                   ["method5.a_struct_arr", "a_struct_type *a_struct_arr[]"]],
        cite=f"{CAP}:254-339",
    ),
]

# AstCreationPassTests "Operator AST layout" / expression shapes.
CASES += [
    dict(
        name="c-astpass-decl-assignment", lang="c", wrap=False,
        code="""
void method() {
  int local = 1;
}
""",
        locals=[["method.local", "int local|int"]],
        ast={"local = 1": ["local", "1"],
             ("<empty>", 0): ["int local", "local = 1"]},
        nodetype={("1", 0): "int", ("local", 0): "int"},
        cite=f"{CAP}:340-364",
    ),
    dict(
        name="c-astpass-nested-expression", lang="c", wrap=False,
        code="""
void method() {
  int x;
  int y;
  int z;

  x = y + z;
}
""",
        locals=[["method.x", "int x|int"], ["method.y", "int y|int"],
                ["method.z", "int z|int"]],
        ast={"x = y + z": ["x", "y + z"],
             "y + z": ["y", "z"]},
        cite=f"{CAP}:653-681",
    ),
    dict(
        name="c-astpass-while-if-else", lang="c", wrap=False,
        code="""
void method(int x) {
  while (x < 1) {
    x += 1;
  }
}
void method2(int x) {
  int y;
  if (x > 0) { y = 0; }
}
void method3(int x) {
  int y;
  if (x > 0) { y = 0; } else { y = 1; }
}
""",
        cs=[["method:WHILE", "while (x < 1)"]],
        cscond=[["method:WHILE", "x < 1"],
                ["method2:IF", "x > 0"],
                ["method3:IF", "x > 0"]],
        ast={"x += 1": ["x", "1"],
             ("y = 0", 0): ["y", "0"],
             ("y = 1", 0): ["y", "1"]},
        cite=f"{CAP}:702-763",
    ),
    dict(
        name="c-astpass-conditional", lang="c", wrap=False,
        code="""
 void method() {
   int x = (true ? vlc_dccp_CreateFD : vlc_datagram_CreateFD)(fd);
 }
 void method2() {
   int y = (foo == 1) ? bar : 0;
 }
""",
        # the conditional code strips the wrapping parens (:765-797)
        ast={"true ? vlc_dccp_CreateFD : vlc_datagram_CreateFD": [
                 "true", "vlc_dccp_CreateFD", "vlc_datagram_CreateFD"],
             "(foo == 1) ? bar : 0": ["foo == 1", "bar", "0"]},
        cite=f"{CAP}:765-797",
    ),
    dict(
        name="c-astpass-unary-call-field", lang="c", wrap=False,
        code="""
void method(int x) {
  ++x;
  foo(x);
}
void m2(struct someUndefinedStruct x) {
  x.a;
}
void m3(struct someUndefinedStruct *x) {
  x->a;
  return (x->a)(1, 2);
}
void m4() {
  int a;
  sizeof(a);
  sizeof a ;
}
""",
        # preIncrement / call / fieldAccess / indirectFieldAccess /
        # pointer-call / sizeOf shapes (:885-1092)
        ast={"++x": ["x"],
             "foo(x)": ["x"],
             ("x.a", 0): ["x", "a"],
             ("x->a", 0): ["x", "a"],
             "(x->a)(1, 2)": ["x->a", "1", "2"],
             "sizeof(a)": ["a"],
             "sizeof a": ["a"]},
        callmfn=[["<operator>.preIncrement", "<operator>.preIncrement"],
                 ["<operator>.fieldAccess", "<operator>.fieldAccess"],
                 ["<operator>.indirectFieldAccess",
                  "<operator>.indirectFieldAccess"],
                 ["<operator>.pointerCall", "<operator>.pointerCall"],
                 ["<operator>.sizeOf", "<operator>.sizeOf"],
                 ["foo", "foo"]],
        cite=f"{CAP}:885-1092",
    ),
    dict(
        name="c-astpass-expression-list", lang="c", wrap=False,
        code="""
void method(int x) {
  return (__sync_synchronize(), foo(x));
}
""",
        # the comma expression lowers to a BLOCK of the sub-expressions
        ast={("<empty>", 1): ["__sync_synchronize()", "foo(x)"]},
        cite=f"{CAP}:901-910",
    ),
    dict(
        name="c-astpass-comma-for", lang="c", wrap=False,
        code="""
int something(void);
void a() {
  int b;
  int c;
  for (; b = something(), b > c;) {}
}
""",
        ast={("<empty>", 1): ["b = something()", "b > c"]},
        cite=f"{CAP}:911-929",
    ),
    dict(
        name="c-astpass-pointer-call", lang="c", wrap=False,
        code="""
typedef long unsigned int (*hStrLenFunc)(const char *str);
int main() {
  hStrLenFunc strLenFunc = &strlen;
  return (*strLenFunc)("123");
}
""",
        callmfn=[["<operator>.pointerCall", "<operator>.pointerCall"],
                 ["<operator>.assignment", "<operator>.assignment"],
                 ["<operator>.addressOf", "<operator>.addressOf"],
                 ["<operator>.indirection", "<operator>.indirection"]],
        ast={'(*strLenFunc)("123")': ["*strLenFunc", '"123"']},
        cite=f"{CAP}:1019-1032",
    ),
    dict(
        name="c-astpass-nested-block", lang="c", wrap=False,
        code="""
void method() {
  int x;
  {
    int y;
  }
}
""",
        ast={("<empty>", 0): ["int x", "<empty>"],
             ("<empty>", 1): ["int y"]},
        locals=[["method.x", "int x|int"], ["method.y", "int y|int"]],
        cite=f"{CAP}:683-700",
    ),
]

# AstCreationPassTests "Structural AST layout" — structs, typedefs,
# inheritance, compound literals, static_assert, try/catch.
CASES += [
    dict(
        name="c-astpass-structs", lang="c", wrap=False,
        code="""
struct foo {
  int x;
  int y;
  int z;
};
""",
        members=[["foo.x", "int"], ["foo.y", "int"], ["foo.z", "int"]],
        membercode=[["foo.x", "x"], ["foo.y", "y"], ["foo.z", "z"]],
        cite=f"{CAP}:1117-1142",
    ),
    dict(
        name="c-astpass-typedef-struct-enum", lang="c", wrap=False,
        code="""
typedef struct foo {
} abc;
typedef enum foo3 {
} abc2;
""",
        # the named composite itself carries the alias (:1216-1299)
        tdalias=[["foo", "abc"], ["abc", "foo"],
                 ["foo3", "abc2"], ["abc2", "foo3"]],
        cite=f"{CAP}:1216-1299",
    ),
    dict(
        name="cpp-astpass-inheritance", lang="cpp", wrap=False,
        code="""
class Base {public: int i;};
class Derived : public Base{
public:
 char x;
 int method(){return i;};
};
""",
        inherits=[["Derived", "Base"], ["Base", ""]],
        members=[["Base.i", "int"], ["Derived.x", "char"]],
        cite=f"{CAP}:1317-1333",
    ),
    dict(
        name="cpp-astpass-compound-literal", lang="cpp", wrap=False,
        code="""
void m() {
  int x = (int){ 1 };
}
""",
        ast={"(int){ 1 }": ["int", "{ 1 }"]},
        callmfn=[["<operator>.cast", "<operator>.cast"],
                 ["<operator>.assignment", "<operator>.assignment"]],
        cite=f"{CAP}:1334-1348",
    ),
    dict(
        name="cpp-astpass-static-assert", lang="cpp", wrap=False,
        code="""
void foo(){
 int a = 0;
 static_assert ( a == 0 , "not 0!");
}
""",
        ast={'static_assert ( a == 0 , "not 0!")': [
            "a == 0", '"not 0!"']},
        callmfn=[["<operator>.staticAssert", "<operator>.staticAssert"],
                 ["<operator>.assignment", "<operator>.assignment"]],
        cite=f"{CAP}:1349-1365",
    ),
    dict(
        name="cpp-astpass-try-catch", lang="cpp", wrap=False,
        code="""
void bar();
int foo(){
 try { bar(); } 
 catch(Foo x) { return 0; };
}
""",
        # catch-clause exception declaration becomes a LOCAL (:1366-1387)
        locals=[["foo.x", "Foo x|Foo"]],
        cs=[["foo:TRY", "try"], ["foo:CATCH", "catch"]],
        ast={"return 0;": ["0"]},
        cite=f"{CAP}:1366-1387",
    ),
    dict(
        name="cpp-astpass-try-multi-catch", lang="cpp", wrap=False,
        code="""
int main() {
  try {
    a;
  } catch (short x) {
    b;
  } catch (int y) {
    c;
  } catch (long z) {
    d;
  }
}
""",
        locals=[["main.x", "short x|short"],
                ["main.y", "int y|int"],
                ["main.z", "long z|long"]],
        cite=f"{CAP}:1388-1421",
    ),
    dict(
        name="cpp-astpass-catch-ellipsis", lang="cpp", wrap=False,
        code="""
int main() {
  try {}
  catch (int a) {}
  catch (...) {}
}
""",
        # `catch (...)` has NO local (:1422-1443)
        locals=[["main.a", "int a|int"], ["main....", ""],
                ["main.<param>1", ""]],
        cs=[["main:TRY", "try"], ["main:CATCH", "catch"]],
        cite=f"{CAP}:1422-1443",
    ),
]

# ------------------------------------------------------------------- #
# c2cpg CallTests.scala — call fullnames/signatures across C and C++
# qualification forms.
# ------------------------------------------------------------------- #
CCT = "c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/CallTests.scala"

CASES += [
    dict(
        name="c-calltest-1", lang="c", wrap=False,
        code="""
int add(int x, int y) {
  return x + y;
}
int main(int argc, char **argv) {
  printf("%d\\n", add((1+2), 3));
}
""",
        callmfn=[["add", "add"], ["printf", "printf"],
                 ["<operator>.addition", "<operator>.addition"]],
        ast={"add((1+2), 3)": ["1+2", "3"]},
        calls=[["main", "add"], ["main", "printf"]],
        cite=f"{CCT}:14-69 (CallTest 1)",
    ),
    dict(
        name="cpp-calltest-global-qual", lang="cpp", wrap=False,
        code="""
int square(int num) {
    return num * num;
}
void call_square() {
    ::square(10);
}
""",
        methods=[["square", "square:int(int)"],
                 ["call_square", "call_square:void()"]],
        callmfn=[["square", "square:int(int)"],
                 ["<operator>.multiplication", "<operator>.multiplication"]],
        cite=f"{CCT}:121-134 (CallTest 3)",
    ),
    dict(
        name="cpp-calltest-static-class", lang="cpp", wrap=False,
        code="""
class A {
  public:
    static int square(int num) {
      return num * num;
    }
};

void call_square() {
  A::square(10);
}
""",
        methods=[["square", "A.square:int(int)"],
                 ["call_square", "call_square:void()"]],
        callmfn=[["square", "A.square:int(int)"],
                 ["<operator>.multiplication", "<operator>.multiplication"]],
        cite=f"{CCT}:136-156 (CallTest 4)",
    ),
    dict(
        name="cpp-calltest-member-unqualified", lang="cpp", wrap=False,
        code="""
class A {
  void a() {
    b();
  }
  void b() {}
};
""",
        methods=[["b", "A.b:void()"], ["a", "A.a:void()"]],
        callmfn=[["b", "A.b:void()"]],
        cite=f"{CCT}:158-177 (CallTest 5)",
    ),
    dict(
        name="cpp-calltest-namespaced-member", lang="cpp", wrap=False,
        code="""
namespace NNN {
  class A {
    public:
      void foo(int a){}
  };
}

void outer() {
  NNN::A a;
  a.foo(1);
}
""",
        methods=[["foo", "NNN.A.foo:void(int)"]],
        callmfn=[["foo", "NNN.A.foo:void(int)"]],
        ast={"a.foo(1)": ["a", "1"]},
        cite=f"{CCT}:207-272 ('Successfully typed calls' member forms)",
    ),
    dict(
        name="cpp-calltest-namespaced-free", lang="cpp", wrap=False,
        code="""
namespace NNN {
  void foo(int a){}
}

void outer() {
  NNN::foo(1);
}
""",
        methods=[["foo", "NNN.foo:void(int)"]],
        callmfn=[["foo", "NNN.foo:void(int)"]],
        cite=f"{CCT}:274-299",
    ),
]

# ------------------------------------------------------------------- #
# LambdaExpressionTests.scala — C++ lambdas: fullname scheme
# `{path}:<global>.{enclosing}.<lambda>N:{sig}` (the reference fixture
# file is Test0.cpp; these transcriptions substitute the case-derived
# path, scheme otherwise identical), capture locals, return inference.
# ------------------------------------------------------------------- #
CLE = "c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/LambdaExpressionTests.scala"

CASES += [
    dict(
        name="cpp-lambda-argument", lang="cpp", wrap=False,
        code="""
class Foo {
  public:
    string getFromSupplier(string input, std::function<string(string)>& mapper) {
      return mapper.apply(input);
    }

    void foo(string input, string fallback) {
      getFromSupplier(
        input,
        [fallback] (string lambdaInput) -> string { return lambdaInput.length() > 5 ? "Long" : fallback; }
      );
    }
};
""",
        methods=[["<lambda>0", "cpp-lambda-argument.cpp:<global>.Foo.foo"
                               ".<lambda>0:string(string)"]],
        params=[["<lambda>0.lambdaInput", "1:string:BY_VALUE"]],
        paramcode=[["<lambda>0.lambdaInput", "string lambdaInput"]],
        # captured `fallback` becomes a LOCAL at the body start (:68-89)
        locals=[["<lambda>0.fallback", "fallback|string"]],
        cite=f"{CLE}:15-115 (fullname path substituted for Test0.cpp)",
    ),
    dict(
        name="cpp-lambda-return-annotations", lang="cpp", wrap=False,
        code="""
void foo() {
  auto l1 = [] () -> int { return 1; };
  auto l2 = [] () { return 1; };
  auto l3 = [] () -> unknown { return bar(); };
  auto l4 = [] () mutable -> int { return 1; };
  auto l5 = [] () mutable { return 1; };
}
""",
        methods=[
            ["<lambda>0", "cpp-lambda-return-annotations.cpp:<global>"
                          ".foo.<lambda>0:int()"],
            ["<lambda>1", "cpp-lambda-return-annotations.cpp:<global>"
                          ".foo.<lambda>1:int()"],
            ["<lambda>2", "cpp-lambda-return-annotations.cpp:<global>"
                          ".foo.<lambda>2:unknown()"],
            ["<lambda>3", "cpp-lambda-return-annotations.cpp:<global>"
                          ".foo.<lambda>3:int()"],
            ["<lambda>4", "cpp-lambda-return-annotations.cpp:<global>"
                          ".foo.<lambda>4:int()"],
            ["foo", "foo:void()"]],
        cite=f"{CLE}:117-137 (fullname path substituted)",
    ),
]

# ------------------------------------------------------------------- #
# c2cpg ast/ControlStructureTests.scala — structure identification and
# implicit condition wraps.
# ------------------------------------------------------------------- #
CCS = ("c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/"
       "ControlStructureTests.scala")

CASES += [
    dict(
        name="c-cstest-1", lang="c", wrap=False,
        code="""
void foo(int x, int y) {
 try {
    goto foo;
    foo:
 } catch(exc_t exc) {
 }

 for(int i = 0; i < 10; i++) {
     if (x > y) {
     continue;
    }
    while(y++ < x) {
     printf("foo\\n");
   }
 }

switch(y) {
  case 1:
   printf("bar\\n");
   break;
  default:
};

 int i = 0;
 do {
   i++;
 } while(i < 11);
}
""",
        # every control-structure kind identified with its condition
        # (:46-84); goto/break/continue keep the raw `...;` code
        cs=[["foo:TRY", "try"], ["foo:CATCH", "catch"],
            ["foo:GOTO", "goto foo;"], ["foo:BREAK", "break;"],
            ["foo:CONTINUE", "continue;"], ["foo:IF", "if (x > y)"],
            ["foo:FOR", "for"], ["foo:WHILE", "while (y++ < x)"],
            ["foo:DO", "do"], ["foo:SWITCH", "switch (y)"]],
        cscond=[["foo:IF", "x > y"], ["foo:FOR", "i < 10"],
                ["foo:WHILE", "y++ < x"], ["foo:DO", "i < 11"],
                ["foo:SWITCH", "y"]],
        cite=f"{CCS}:12-84 (ControlStructureTest1)",
    ),
    dict(
        name="c-cstest-multi-init", lang="c", wrap=False,
        code="""
void foo() {
  for (int x=1,y=1; x; --x) { bar(); };
}
""",
        # for children: locals, init block [x=1, y=1], wrapped condition,
        # update, body (:93-121)
        locals=[["foo.x", "int x|int"], ["foo.y", "int y|int"]],
        ast={("<empty>", 1): ["x=1", "y=1"],
             "x=1": ["x", "1"], "y=1": ["y", "1"]},
        cscond=[["foo:FOR", "x != 0"]],
        cite=f"{CCS}:86-121 (ControlStructureTest2)",
    ),
    dict(
        name="c-cstest-nonexpr-conditions", lang="c", wrap=False,
        code="""
void foo1() {
  for (int x=1; x; --x) { bar(); };
}
void foo2() {
  int x = 0;
  do {
    x++;
   } while (x);
}
void foo3() {
  int x = 0;
  while (x) {
    x++;
  };
}
void foo4() {
  int x = 0;
  if (x) {
    bar();
  };
}
""",
        # non-boolean conditions wrap into `x != 0` notEquals calls
        # (:124-202)
        cscond=[["foo1:FOR", "x != 0"], ["foo2:DO", "x != 0"],
                ["foo3:WHILE", "x != 0"], ["foo4:IF", "x != 0"]],
        ast={("x != 0", 0): ["x", "0"],
             ("x != 0", 1): ["x", "0"],
             ("x != 0", 2): ["x", "0"],
             ("x != 0", 3): ["x", "0"]},
        callmfn=[["<operator>.notEquals", "<operator>.notEquals"]],
        cite=f"{CCS}:124-202 (ControlStructureTest3)",
    ),
    dict(
        name="c-cstest-null-comparison", lang="c", wrap=False,
        code="""
struct foo { char member; };
void foo() {
  struct foo *x = malloc(sizeof(struct foo));
  do {
    foo_free(x);
  } while(x);
}
void bar() {
  struct foo *x = malloc(sizeof(struct foo));
  do {
    foo_free(x);
  } while(x == NULL);
}
""",
        # pointer conditions wrap as `x != NULL` (:204-237)
        cscond=[["foo:DO", "x != NULL"], ["bar:DO", "x == NULL"]],
        cite=f"{CCS}:204-237",
    ),
]

# ------------------------------------------------------------------- #
# Cpp17FeaturesTests.scala — nested namespaces, if-init, constexpr if.
# ------------------------------------------------------------------- #
C17 = ("c2cpg/src/test/scala/io/joern/c2cpg/cpp/features17/"
       "Cpp17FeaturesTests.scala")

CASES += [
    dict(
        name="cpp17-nested-namespaces", lang="cpp", wrap=False,
        code="""
namespace A1 {
  namespace B1 {
    namespace C1 {
      int i;
    }
  }
}

namespace A2::B2::C2 {
  int i;
}
""",
        # both the old nesting and the C++17 A2::B2::C2 form produce
        # dotted `{file}:A.B.C` fullnames (:311-335; path substituted)
        nsblock=[["A1", "cpp17-nested-namespaces.cpp:A1"],
                 ["B1", "cpp17-nested-namespaces.cpp:A1.B1"],
                 ["C1", "cpp17-nested-namespaces.cpp:A1.B1.C1"],
                 ["A2", "cpp17-nested-namespaces.cpp:A2"],
                 ["B2", "cpp17-nested-namespaces.cpp:A2.B2"],
                 ["C2", "cpp17-nested-namespaces.cpp:A2.B2.C2"]],
        cite=f"{C17}:311-335 (fullname path substituted for Test0.cpp)",
    ),
    dict(
        name="cpp17-constexpr-if", lang="cpp", wrap=False,
        code="""
template <typename T>
constexpr bool isIntegral() {
  if constexpr (std::is_integral<T>::value) {
    return true;
  } else {
    return false;
  }
}
""",
        cscond=[["isIntegral:IF", "std::is_integral<T>::value"]],
        cite=f"{C17}:562-581",
    ),
    dict(
        name="cpp17-if-init", lang="cpp", wrap=False,
        code="""
void foo() {
  if (std::lock_guard<std::mutex> lk(mx); v.empty()) {
    v.push_back(val);
  }
}
""",
        # the init hoists before the if at statement level (:532-560)
        locals=[["foo.lk", "std::lock_guard<std::mutex> lk|std.lock_guard"]],
        cscond=[["foo:IF", "v.empty()"]],
        cite=f"{C17}:532-560 (init-declaration hoisted; ctor-arg init "
             "not yet modeled)",
    ),
]

CASES += [
    dict(
        name="cpp-methodtest-ref-param", lang="cpp", wrap=False,
        code="void foo(int &data) {};",
        methods=[["foo", "foo:void(int&)"]],
        params=[["foo.data", "1:int&:BY_VALUE"]],
        paramcode=[["foo.data", "int &data"]],
        cite="c2cpg/.../passes/ast/MethodTests.scala:90-102 (MethodTest5)",
    ),
    dict(
        name="cpp-methodtest-template-ws", lang="cpp", wrap=False,
        code="""
void foo<A,
         B,
         C>() {};
""",
        methods=[["foo", "foo:void()"]],
        msig=[["foo", "void()"]],
        cite="c2cpg/.../passes/ast/MethodTests.scala:104-122 (MethodTest6)",
    ),
    dict(
        name="c-methodtest-paren-param", lang="c", wrap=False,
        code="""
int foo(int * (a)) {
  int (x) = a;
  return 2 * *a;
}
""",
        params=[["foo.a", "1:int*:BY_VALUE"]],
        paramcode=[["foo.a", "int * (a)"]],
        locals=[["foo.x", "int x|int"]],
        cite="c2cpg/.../passes/ast/MethodTests.scala:304-319",
    ),
]
