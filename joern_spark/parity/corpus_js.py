"""JavaScript CFG parity corpus — transcribed BY HAND from the reference's
golden CFG tests (jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/
SimpleCfgCreationPassTests.scala). Keys address CFG nodes exactly like the
reference succOf oracle: code string, occurrence index, optional node kind
(e.g. ("this", 0, "IDENTIFIER") ≡ succOf("this", NodeTypes.IDENTIFIER)).

ALL THREE jssrc CFG suites are fully transcribed: the 56
SimpleCfgCreationPassTests cases (incl. tagged templates :93-121,
for-in/of iterator lowering :554-562, function-declaration-as-assignment
:240-250, the class-expression block value :12-24), the 7
JsClassesCfgCreationPassTests cases, and all 21
MixedCfgCreationPassTests cases (destructuring incl. the
nested-default-parameter lowering :178-228).
"""

CITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/"
        "SimpleCfgCreationPassTests.scala")


def _js(name, code, cfg, cite=CITE):
    return dict(name=name, lang="javascript", wrap=False, code=code, cfg=cfg,
                cite=cite)


CASES = [
    _js("js-try", """
try {
 open()
} catch(err) {
 handle()
} finally {
 close()
}
""", {
        ":program": ["open"],
        "open": ["this"],
        ("this", 0, "IDENTIFIER"): ["open()"],
        "open()": ["err", "close"],
        "err": ["handle"],
        "handle()": ["close"],
        "close()": ["RET"]}),
    _js("js-try-multi-exit", """
try {
 if (true) {
   doA()
 } else {
   doB()
 }
} catch(err) {
 handle()
} finally {
 close()
}
""", {
        ":program": ["true"],
        "true": ["doA", "doB"],
        "doA()": ["err", "close"],
        "err": ["handle"],
        "doB()": ["err", "close"],
        "handle()": ["close"],
        "close()": ["RET"]}),
    _js("js-member-assign-chained", "a.b = c.z;", {
        ":program": ["a"], "a": ["b"], "b": ["a.b"], "a.b": ["c"],
        "c": ["z"], "z": ["c.z"], "c.z": ["a.b = c.z"],
        "a.b = c.z": ["RET"]}),
    _js("js-decl-assign", "var x = 1;", {
        ":program": ["x"], "x": ["1"], "1": ["var x = 1"],
        "var x = 1": ["RET"]}),
    _js("js-nested-expression", "x = y + 1;", {
        ":program": ["x"], "x": ["y"], "y": ["1"], "1": ["y + 1"],
        "y + 1": ["x = y + 1"], "x = y + 1": ["RET"]}),
    _js("js-return", "function foo(x) { return x; }", {
        ("foo", 0, "METHOD"): ["x"],
        ("x", 0, "IDENTIFIER"): ["return x"],
        "return x": ["RET"]}),
    _js("js-consecutive-returns", "function foo(x, y) { return x; return y; }", {
        ("foo", 0, "METHOD"): ["x"],
        ("x", 0, "IDENTIFIER"): ["return x"],
        ("y", 0, "IDENTIFIER"): ["return y"],
        "return x": ["RET"],
        "return y": ["RET"]}),
    _js("js-void-return", "function foo() { return; }", {
        ("foo", 0, "METHOD"): ["return"],
        "return": ["RET"]}),
    _js("js-call", "foo(a + 1, b);", {
        ":program": ["foo"], "foo": ["this"],
        ("this", 0, "IDENTIFIER"): ["a"],
        "a": ["1"], "1": ["a + 1"], "a + 1": ["b"],
        "b": ["foo(a + 1, b)"], "foo(a + 1, b)": ["RET"]}),
    _js("js-chained-calls", "x.foo(y).bar(z)", {
        ":program": ["_tmp_0"],
        "_tmp_0": ["x"],
        "x": ["foo"],
        "foo": ["x.foo"],
        "x.foo": ["x"],
        ("x", 1): ["y"],
        "y": ["x.foo(y)"],
        "x.foo(y)": ["(_tmp_0 = x.foo(y))"],
        "(_tmp_0 = x.foo(y))": ["bar"],
        "bar": ["(_tmp_0 = x.foo(y)).bar"],
        "(_tmp_0 = x.foo(y)).bar": ["_tmp_0"],
        ("_tmp_0", 1): ["z"],
        "z": ["x.foo(y).bar(z)"],
        "x.foo(y).bar(z)": ["RET"]}),
    _js("js-post-increment", "x++", {
        ":program": ["x"], "x": ["x++"], "x++": ["RET"]}),
    _js("js-conditional", "x ? y : z;", {
        ":program": ["x"], "x": ["y", "z"], "y": ["x ? y : z"],
        "z": ["x ? y : z"], "x ? y : z": ["RET"]}),
    _js("js-while", "while (x < 1) { y = 2; }", {
        ":program": ["x"], "x": ["1"], "1": ["x < 1"],
        "x < 1": ["y", "RET"], "y": ["2"], "2": ["y = 2"],
        "y = 2": ["x"]}),
    _js("js-while-break", "while (x < 1) { break; y; }", {
        ":program": ["x"], "x": ["1"], "1": ["x < 1"],
        "x < 1": ["break;", "RET"], "break;": ["RET"], "y": ["x"]}),
    _js("js-while-continue", "while (x < 1) { continue; y; }", {
        ":program": ["x"], "x": ["1"], "1": ["x < 1"],
        "x < 1": ["continue;", "RET"], "continue;": ["x"], "y": ["x"]}),
    _js("js-nested-while", "while (x) {while(y) {z;}}", {
        ":program": ["x"], "x": ["y", "RET"], "y": ["z", "x"]}),
    _js("js-nested-while-break", "while (x) { while(y) { break; z;} a;} b;", {
        ":program": ["x"], "x": ["y", "b"], "y": ["break;", "a"],
        "a": ["x"], "b": ["RET"]}),
    _js("js-nested-while-break2",
        "while (x) { while(y) { break; z;} a; break; b; } c;", {
            ":program": ["x"], "x": ["y", "c"], "y": ["break;", "a"],
            ("break;", 0): ["a"], "a": ["break;"], ("break;", 1): ["c"],
            "c": ["RET"]}),
    _js("js-nested-while-cond-break", """
while (x) {
  if (y) {
    break;
  }
  while (z) {
    break;
  }
}
""", {
        ":program": ["x"], "x": ["y", "RET"], "y": ["break;", "z"],
        ("break;", 0): ["RET"], ("break;", 1): ["x"],
        "z": ["break;", "x"]}),
    _js("js-do-while", "do { y = 2; } while (x < 1);", {
        ":program": ["y"], "y": ["2"], "2": ["y = 2"], "y = 2": ["x"],
        "x": ["1"], "1": ["x < 1"], "x < 1": ["y", "RET"]}),
    _js("js-do-while-break", "do { break; y; } while (x < 1);", {
        ":program": ["break;"], "break;": ["RET"], "y": ["x"],
        "x": ["1"], "1": ["x < 1"], "x < 1": ["break;", "RET"]}),
    _js("js-do-while-continue", "do { continue; y; } while (x < 1);", {
        ":program": ["continue;"], "continue;": ["x"], "y": ["x"],
        "x": ["1"], "1": ["x < 1"], "x < 1": ["continue;", "RET"]}),
    _js("js-nested-do-while", "do { do { x; } while (y); } while (z);", {
        ":program": ["x"], "x": ["y"], "y": ["x", "z"],
        "z": ["x", "RET"]}),
    _js("js-nested-while-do-while-break",
        "while (x) { do { while(y) { break; a; } z; } while (x < 1); } c;", {
            ":program": ["x"], "x": ["y", "c"], "y": ["break;", "z"],
            "break;": ["z"], "z": ["x"], ("x", 1): ["1"],
            "1": ["x < 1"], "x < 1": ["y", "x"], "c": ["RET"]}),
    _js("js-while-do-while-break-continue",
        "while(x) { do { break; } while (y) } o;", {
            ":program": ["x"], "x": ["break;", "o"], "break;": ["x"],
            "o": ["RET"]}),
    _js("js-two-nested-while-inner-break",
        "while(y) { while(z) { break; x; } }", {
            ":program": ["y"], "y": ["z", "RET"], "z": ["break;", "y"],
            "break;": ["y"]}),
    _js("js-for", "for (x = 0; y < 1; z += 2) { a = 3; }", {
        ":program": ["x"], "x": ["0"], "0": ["x = 0"], "x = 0": ["y"],
        "y": ["1"], "1": ["y < 1"], "y < 1": ["a", "RET"],
        "a": ["3"], "3": ["a = 3"], "a = 3": ["z"], "z": ["2"],
        "2": ["z += 2"], "z += 2": ["y"]}),
    _js("js-for-break", "for (x = 0; y < 1; z += 2) { break; a = 3; }", {
        ":program": ["x"], "x": ["0"], "x = 0": ["y"], "y": ["1"],
        "1": ["y < 1"], "y < 1": ["break;", "RET"], "break;": ["RET"],
        "a": ["3"], "3": ["a = 3"], "a = 3": ["z"], "z": ["2"],
        "2": ["z += 2"], "z += 2": ["y"]}),
    _js("js-for-continue", "for (x = 0; y < 1; z += 2) { continue; a = 3; }", {
        ":program": ["x"], "x": ["0"], "0": ["x = 0"], "x = 0": ["y"],
        "y": ["1"], "1": ["y < 1"], "y < 1": ["continue;", "RET"],
        "continue;": ["z"], "a": ["3"], "3": ["a = 3"], "a = 3": ["z"],
        "z": ["2"], "2": ["z += 2"], "z += 2": ["y"]}),
    _js("js-nested-for", "for (x; y; z) { for (a; b; c) { u; } }", {
        ":program": ["x"], "x": ["y"], "y": ["a", "RET"], "z": ["y"],
        "a": ["b"], "b": ["u", "z"], "c": ["b"], "u": ["c"]}),
    _js("js-for-empty-condition", "for (;;) { a = 1; }", {
        ":program": ["true"], "true": ["a", "RET"], "a": ["1"],
        "1": ["a = 1"], "a = 1": ["true"]}),
    _js("js-for-empty-condition-break", "for (;;) { break; }", {
        ":program": ["true"], "true": ["break;", "RET"],
        "break;": ["RET"]}),
    _js("js-for-empty-condition-continue", "for (;;) { continue; }", {
        ":program": ["true"], "true": ["continue;", "RET"],
        "continue;": ["true"]}),
    _js("js-for-empty-nested", "for (;;) { for (;;) { x; } }", {
        ":program": ["true"], ("true", 0): ["true", "RET"],
        ("true", 1): ["x", "true"], "x": ["true"]}),
    _js("js-for-empty-block", "for (;;) ;", {
        ":program": ["true"], "true": ["true", "RET"]}),
    _js("js-if", "if (x) { y; }", {
        ":program": ["x"], "x": ["y", "RET"], "y": ["RET"]}),
    _js("js-if-else", "if (x) { y; } else { z; }", {
        ":program": ["x"], "x": ["y", "z"], "y": ["RET"], "z": ["RET"]}),
    _js("js-nested-if", "if (x) { if (y) { z; } }", {
        ":program": ["x"], "x": ["y", "RET"], "y": ["z", "RET"],
        "z": ["RET"]}),
    _js("js-else-if-chain", "if (a) { b; } else if (c) { d;} else { e; }", {
        ":program": ["a"], "a": ["b", "c"], "b": ["RET"],
        "c": ["d", "e"], "d": ["RET"], "e": ["RET"]}),
    _js("js-switch-one-case", "switch (x) { case 1: y;}", {
        ":program": ["x"], "x": ["case 1:", "RET"],
        "case 1:": ["1"], "1": ["y"], "y": ["RET"]}),
    _js("js-switch-multiple-cases", "switch (x) { case 1: y; case 2: z;}", {
        ":program": ["x"], "x": ["case 1:", "case 2:", "RET"],
        "case 1:": ["1"], "1": ["y"], "y": ["case 2:"],
        "case 2:": ["2"], "2": ["z"], "z": ["RET"]}),
    _js("js-switch-cases-same-spot", "switch (x) { case 1: case 2: y; }", {
        ":program": ["x"], "x": ["case 1:", "case 2:", "RET"],
        "case 1:": ["1"], "1": ["case 2:"], "case 2:": ["2"],
        "2": ["y"], "y": ["RET"]}),
    _js("js-switch-default", "switch (x) { default: y; }", {
        ":program": ["x"], "x": ["default:"], "default:": ["y"],
        "y": ["RET"]}),
    _js("js-switch-case-and-default",
        "switch (x) { case 1: y; break; default: z;}", {
            ":program": ["x"], "x": ["case 1:", "default:"],
            "case 1:": ["1"], "1": ["y"], "y": ["break;"],
            "break;": ["RET"], "default:": ["z"], "z": ["RET"]}),
    # `new` alloc-block lowering (SimpleCfgCreationPassTests.scala:707-726;
    # JsClassesCfgCreationPassTests.scala:12-73). Plain-code subjects: the
    # wrapping BLOCK shares its code with the constructor CALL and precedes
    # it in preorder, so `code@0` is the block and the CALL is addressed
    # kind-qualified, mirroring succOf(..., NodeTypes.CALL).
    _js("js-new-var", "var x = new MyClass(arg1, arg2)", {
        ":program": ["x"], "x": ["_tmp_0"],
        ("_tmp_0", 0): [".alloc"],
        ".alloc": ["_tmp_0 = .alloc"],
        "_tmp_0 = .alloc": ["MyClass"],
        "MyClass": ["_tmp_0"],
        ("_tmp_0", 1): ["arg1"],
        "arg1": ["arg2"],
        "arg2": ["new MyClass(arg1, arg2)"],
        ("new MyClass(arg1, arg2)", 0, "CALL"): ["_tmp_0"],
        ("_tmp_0", 2): ["new MyClass(arg1, arg2)"],
        ("new MyClass(arg1, arg2)", 0, "BLOCK"): ["var x = new MyClass(arg1, arg2)"],
        "var x = new MyClass(arg1, arg2)": ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/SimpleCfgCreationPassTests.scala:707-726"),
    _js("js-new-simple", "new MyClass()", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): [".alloc"],
        ".alloc": ["_tmp_0 = .alloc"],
        "_tmp_0 = .alloc": ["MyClass"],
        "MyClass": ["_tmp_0"],
        ("_tmp_0", 1): ["new MyClass()"],
        ("new MyClass()", 0, "CALL"): ["_tmp_0"],
        ("_tmp_0", 2): ["new MyClass()"],
        ("new MyClass()", 0, "BLOCK"): ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/JsClassesCfgCreationPassTests.scala:12-24"),
    _js("js-new-access-path", "new foo.bar.MyClass()", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): [".alloc"],
        ".alloc": ["_tmp_0 = .alloc"],
        "_tmp_0 = .alloc": ["foo"],
        "foo": ["bar"], "bar": ["foo.bar"], "foo.bar": ["MyClass"],
        "MyClass": ["foo.bar.MyClass"],
        "foo.bar.MyClass": ["_tmp_0"],
        ("_tmp_0", 1): ["new foo.bar.MyClass()"],
        ("new foo.bar.MyClass()", 0, "CALL"): ["_tmp_0"],
        ("_tmp_0", 2): ["new foo.bar.MyClass()"],
        ("new foo.bar.MyClass()", 0, "BLOCK"): ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/JsClassesCfgCreationPassTests.scala:44-61"),
    _js("js-throw-new", "function foo() { throw new Foo() }", {
        ("foo", 0, "METHOD"): ["_tmp_0"],
        ("_tmp_0", 0): [".alloc"],
        ".alloc": ["_tmp_0 = .alloc"],
        "_tmp_0 = .alloc": ["Foo"],
        "Foo": ["_tmp_0"],
        ("_tmp_0", 1): ["new Foo()"],
        ("new Foo()", 0, "CALL"): ["_tmp_0"],
        ("_tmp_0", 2): ["throw new Foo()"],
        "throw new Foo()": ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/JsClassesCfgCreationPassTests.scala:63-75"),
    # MixedCfgCreationPassTests.scala:425-452
    _js("js-await", "async function x(foo) { await foo() }", {
        ("x", 0, "METHOD"): ["foo"],
        ("foo", 0, "IDENTIFIER"): ["this"],
        ("this", 0, "IDENTIFIER"): ["foo()"],
        "foo()": ["await foo()"],
        "await foo()": ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/MixedCfgCreationPassTests.scala:425-433"),
    _js("js-instanceof", "x instanceof Foo", {
        ":program": ["x"], "x": ["Foo"], "Foo": ["x instanceof Foo"],
        ("x instanceof Foo", 0, "CALL"): ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/MixedCfgCreationPassTests.scala:436-442"),
    _js("js-delete", "delete foo.x", {
        ":program": ["foo"], "foo": ["x"], "x": ["foo.x"],
        "foo.x": ["delete foo.x"],
        ("delete foo.x", 0, "CALL"): ["RET"]},
        cite="jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/MixedCfgCreationPassTests.scala:444-451"),
]


# Untagged template literals lower to <operator>.formatString with quasis
# double-quoted and interpolations interleaved (SimpleCfgCreationPassTests
# :62-91; lowering in AstForPrimitivesCreator.astForTemplateLiteral:74-96).
FMT = "<operator>.formatString"
CASES += [
    _js("js-template-call", "foo(`Hello ${world}!`)\n", {
        ":program": ["foo"],
        "foo": ["this"],
        ("this", 0, "IDENTIFIER"): ['"Hello "'],
        '"Hello "': ["world"],
        "world": ['"!"'],
        '"!"': [f'{FMT}("Hello ", world, "!")'],
        f'{FMT}("Hello ", world, "!")': ["foo(`Hello ${world}!`)"],
        "foo(`Hello ${world}!`)": ["RET"],
    }, cite=CITE + ":62-76"),
    _js("js-template-bare", "`${x + 1}`\n", {
        ":program": ['""'],
        ('""', 0): ["x"],
        "x": ["1"],
        "1": ["x + 1"],
        "x + 1": ['""'],  # succOf asserts the 2nd "" occurrence; targets are code-keyed here
        ('""', 1): [f'{FMT}("", x + 1, "")'],
        f'{FMT}("", x + 1, "")': ["RET"],
    }, cite=CITE + ":78-91"),
]

# Default parameters lower to body-front `p = p === void 0 ? <dflt> : p`
# assignments (MixedAstCreationPassTests.scala:1252-1347: assignment ->
# identifier + <operator>.conditional(<operator>.equals(p, void 0), dflt, p)).
CASES += [
    dict(name="js-default-params", lang="javascript", wrap=False,
         code="function foo(a = 1, b = 2) {}\n",
         ast={
             "a = a === void 0 ? 1 : a": ["a", "a === void 0 ? 1 : a"],
             "a === void 0 ? 1 : a": ["a === void 0", "1", "a"],
             "a === void 0": ["a", "void 0"],
             "b = b === void 0 ? 2 : b": ["b", "b === void 0 ? 2 : b"],
             "b === void 0 ? 2 : b": ["b === void 0", "2", "b"],
             "b === void 0": ["b", "void 0"],
         },
         cite=CITE.replace("cfg/SimpleCfgCreationPassTests.scala",
                           "ast/MixedAstCreationPassTests.scala") + ":1272-1303"),
]

# Labeled continue (SimpleCfgCreationPassTests.scala:304-352): `continue
# loop1;` jumps to the `loop1:` JUMP_TARGET. Omitted facts from the same
# test, with reasons: succOf(":program") -> "var i, j;" (initializer-less
# var decls produce LOCALs only here, no CFG node) and the two facts whose
# successor is the labeled-statement BLOCK wrapper (this frontend does not
# put label-wrapper BLOCKs in the CFG; loop-exit edges go directly to the
# post-loop node).
CASES += [
    _js("js-labeled-continue", """
var i, j;
loop1: for (i = 0; i < 3; i++) {
   loop2: for (j = 0; j < 3; j++) {
      if (i === 1 && j === 1) {
         continue loop1;
      }
      console.log("");
   }
}
""", {
        "loop1:": ["i"],
        ("i", 0): ["0"],
        ("0", 0): ["i = 0"],
        "i = 0": ["i"],
        ("i", 1): ["3"],
        ("3", 0): ["i < 3"],
        "loop2:": ["j"],
        ("j", 0): ["0"],
        ("0", 1): ["j = 0"],
        "j = 0": ["j"],
        ("j", 1): ["3"],
        ("3", 1): ["j < 3"],
        "j < 3": ["i"],
        ("i", 2): ["i++"],
        "i++": ["i"],
        ("i", 3): ["1"],
        ("1", 0): ["i === 1"],
        "i === 1": ["j", "i === 1 && j === 1"],
        "i === 1 && j === 1": ["continue loop1;", "console"],
        "continue loop1;": ["loop1:"],
        ("console", 0): ["log"],
        ("log", 0): ["console.log"],
    }, cite=CITE + ":304-352"),
]

# Array literals lower to __ecma.Array.factory() (+ _tmp/push block when
# non-empty) — SimpleCfgCreationPassTests.scala:26-60; lowering per
# AstForExpressionsCreator.astForArrayExpression:337-404.
CASES += [
    _js("js-array-empty", "var x = []\n", {
        ":program": ["x"],
        "x": ["__ecma.Array.factory()"],
        "__ecma.Array.factory()": ["var x = []"],
    }, cite=CITE + ":26-31"),
    _js("js-array-values", "var x = [1, 2]\n", {
        ":program": ["x"],
        ("x", 0): ["_tmp_0"],
        ("_tmp_0", 0): ["__ecma.Array.factory()"],
        "__ecma.Array.factory()": ["_tmp_0 = __ecma.Array.factory()"],
        "_tmp_0 = __ecma.Array.factory()": ["_tmp_0"],
        ("_tmp_0", 1): ["push"],
        ("push", 0): ["_tmp_0.push"],
        ("_tmp_0.push", 0): ["_tmp_0"],
        ("_tmp_0", 2): ["1"],
        "1": ["_tmp_0.push(1)"],
        "_tmp_0.push(1)": ["_tmp_0"],
        ("_tmp_0", 3): ["push"],
        ("push", 1): ["_tmp_0.push"],
        ("_tmp_0.push", 1): ["_tmp_0"],
        ("_tmp_0", 4): ["2"],
        "2": ["_tmp_0.push(2)"],
        "_tmp_0.push(2)": ["_tmp_0"],
        ("_tmp_0", 5): ["[1, 2]"],
        "[1, 2]": ["var x = [1, 2]"],
        "var x = [1, 2]": ["RET"],
    }, cite=CITE + ":33-60"),
]

# Object literals lower to a _tmp block of per-property assignments
# (SimpleCfgCreationPassTests.scala:166-192).
CASES += [
    _js("js-object-simple", 'var x = {\n key1: "value",\n key2: 2\n}\n', {
        ":program": ["x"],
        ("x", 0): ["_tmp_0"],
        ("_tmp_0", 0): ["key1"],
        "key1": ["_tmp_0.key1"],
        "_tmp_0.key1": ['"value"'],
        '"value"': ['_tmp_0.key1 = "value"'],
        '_tmp_0.key1 = "value"': ["_tmp_0"],
        ("_tmp_0", 1): ["key2"],
        "key2": ["_tmp_0.key2"],
        "_tmp_0.key2": ["2"],
        "2": ["_tmp_0.key2 = 2"],
        "_tmp_0.key2 = 2": ["_tmp_0"],
        ("_tmp_0", 2): ['{\n key1: "value",\n key2: 2\n}'],
        '{\n key1: "value",\n key2: 2\n}': ['var x = {\n key1: "value",\n key2: 2\n}'],
        'var x = {\n key1: "value",\n key2: 2\n}': ["RET"],
    }, cite=CITE + ":166-192"),
]

# MixedCfgCreationPassTests.scala — spread argument, await/async,
# instanceof, delete, and the four default-parameter CFG shapes.
MCITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/"
         "MixedCfgCreationPassTests.scala")
CASES += [
    _js("js-spread-arg", "foo(...args)\n", {
        ":program": ["foo"],
        "foo": ["this"],
        ("this", 0, "IDENTIFIER"): ["args"],
        "args": ["...args"],
        "...args": ["foo(...args)"],
        "foo(...args)": ["RET"],
    }, cite=MCITE + ":411-419"),
    # (await/instanceof/delete from this suite are transcribed above as
    # js-await / js-instanceof / js-delete)
    _js("js-default-param-cfg", "function foo(a = 1) { }\n", {
        ("foo", 0, "METHOD"): ["a"],
        ("a", 0, "IDENTIFIER"): ["a"],
        ("a", 1): ["void 0"],
        "void 0": ["a === void 0"],
        "a === void 0": ["1", "a"],
        "1": ["a === void 0 ? 1 : a"],
        ("a", 2): ["a === void 0 ? 1 : a"],
        "a === void 0 ? 1 : a": ["a = a === void 0 ? 1 : a"],
        "a = a === void 0 ? 1 : a": ["RET"],
    }, cite=MCITE + ":455-467"),
    _js("js-default-params-cfg2", "function foo(a = 1, b = 2) { }\n", {
        ("foo", 0, "METHOD"): ["a"],
        ("a", 0, "IDENTIFIER"): ["a"],
        ("a", 1): ["void 0"],
        "a === void 0": ["1", "a"],
        "a === void 0 ? 1 : a": ["a = a === void 0 ? 1 : a"],
        "a = a === void 0 ? 1 : a": ["b"],
        ("b", 0, "IDENTIFIER"): ["b"],
        ("b", 1): ["void 0"],
        ("void 0", 1): ["b === void 0"],
        "b === void 0": ["2", "b"],
        "2": ["b === void 0 ? 2 : b"],
        ("b", 2): ["b === void 0 ? 2 : b"],
        "b === void 0 ? 2 : b": ["b = b === void 0 ? 2 : b"],
        "b = b === void 0 ? 2 : b": ["RET"],
    }, cite=MCITE + ":470-491"),
    _js("js-default-param-mixed", "function foo(a, b = 1) { }\n", {
        ("foo", 0, "METHOD"): ["b"],
        ("b", 0): ["b"],
        ("b", 1): ["void 0"],
        "void 0": ["b === void 0"],
        "b === void 0": ["1", "b"],
        "1": ["b === void 0 ? 1 : b"],
        ("b", 2): ["b === void 0 ? 1 : b"],
        "b === void 0 ? 1 : b": ["b = b === void 0 ? 1 : b"],
        "b = b === void 0 ? 1 : b": ["RET"],
    }, cite=MCITE + ":494-506"),
    _js("js-default-params-mixed2", "function foo(x, a = 1, b = 2) { }\n", {
        ("foo", 0, "METHOD"): ["a"],
        ("a", 0): ["a"],
        ("a", 1): ["void 0"],
        "a === void 0": ["1", "a"],
        "a === void 0 ? 1 : a": ["a = a === void 0 ? 1 : a"],
        "a = a === void 0 ? 1 : a": ["b"],
        ("b", 0): ["b"],
        ("b", 1): ["void 0"],
        ("void 0", 1): ["b === void 0"],
        "b === void 0": ["2", "b"],
        "2": ["b === void 0 ? 2 : b"],
        ("b", 2): ["b === void 0 ? 2 : b"],
        "b === void 0 ? 2 : b": ["b = b === void 0 ? 2 : b"],
        "b = b === void 0 ? 2 : b": ["RET"],
    }, cite=MCITE + ":509-530"),
]

# JsClassesCfgCreationPassTests.scala — class methods + class expressions
# (the four new-expression cases from this suite are transcribed above).
KCITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/cfg/"
         "JsClassesCfgCreationPassTests.scala")
CASES += [
    _js("js-class-method-cfg", "class ClassA {\n  foo() {\n    bar()\n  }\n}\n", {
        ("foo", 0, "METHOD"): ["bar"],
        "bar": ["this"],
        ("this", 0, "IDENTIFIER"): ["bar()"],
        "bar()": ["RET"],
    }, cite=KCITE + ":96-108"),
    _js("js-class-expr-assign",
        "var a = class ClassA {\n  foo() {\n    bar()\n  }\n}\n", {
        ":program": ["a"],
        "a": ["class ClassA"],
    }, cite=KCITE + ":110-121"),
    _js("js-class-expr-anon", "var a = class {}\n", {
        ":program": ["a"],
        "a": ["class <anon-class>0"],
        "class <anon-class>0": ["var a = class {}"],
        "var a = class {}": ["RET"],
    }, cite=KCITE + ":123-129"),
]

# MixedCfgCreationPassTests.scala:14-423 — destructuring assignments.
# The nested-default parameter case (:178-228) is NOT transcribed: its
# lowering nests object-literal temps inside default guards, which this
# frontend does not yet thread through parameters.
CASES += [
    _js("js-destr-obj-decl", "var {a, b} = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        ("a", 0): ["_tmp_0"],
        ("_tmp_0", 1): ["a"],
        ("a", 1): ["_tmp_0.a"],
        "_tmp_0.a": ["a = _tmp_0.a"],
        "a = _tmp_0.a": ["b"],
        ("b", 0): ["_tmp_0"],
        ("_tmp_0", 2): ["b"],
        ("b", 1): ["_tmp_0.b"],
        "_tmp_0.b": ["b = _tmp_0.b"],
        "b = _tmp_0.b": ["_tmp_0"],
        ("_tmp_0", 3): ["var {a, b} = x"],
        "var {a, b} = x": ["RET"],
    }, cite=MCITE + ":15-35"),
    _js("js-destr-obj-ternary",
        "const { a, b } = test() ? foo() : bar()\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["test"],
        "test": ["this"],
        ("this", 0, "IDENTIFIER"): ["test()"],
        "test()": ["foo", "bar"],
        "foo": ["this"],
        ("this", 2): ["bar()"],
        "bar()": ["test() ? foo() : bar()"],
        "foo()": ["test() ? foo() : bar()"],
        "test() ? foo() : bar()": ["_tmp_0 = test() ? foo() : bar()"],
        "_tmp_0 = test() ? foo() : bar()": ["a"],
        ("a", 0): ["_tmp_0"],
        ("_tmp_0", 1): ["a"],
        ("a", 1): ["_tmp_0.a"],
        "_tmp_0.a": ["a = _tmp_0.a"],
        "a = _tmp_0.a": ["b"],
        ("b", 0): ["_tmp_0"],
        ("_tmp_0", 2): ["b"],
        ("b", 1): ["_tmp_0.b"],
        "_tmp_0.b": ["b = _tmp_0.b"],
        "b = _tmp_0.b": ["_tmp_0"],
        ("_tmp_0", 3): ["const { a, b } = test() ? foo() : bar()"],
        "const { a, b } = test() ? foo() : bar()": ["RET"],
    }, cite=MCITE + ":37-66"),
    _js("js-destr-obj-rename", "var {a: n, b: m} = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["n"],
        "n": ["_tmp_0"],
        ("_tmp_0", 1): ["a"],
        "a": ["_tmp_0.a"],
        "_tmp_0.a": ["n = _tmp_0.a"],
        "n = _tmp_0.a": ["m"],
        "m": ["_tmp_0"],
        ("_tmp_0", 2): ["b"],
        "b": ["_tmp_0.b"],
        "_tmp_0.b": ["m = _tmp_0.b"],
        "m = _tmp_0.b": ["_tmp_0"],
        ("_tmp_0", 3): ["var {a: n, b: m} = x"],
        "var {a: n, b: m} = x": ["RET"],
    }, cite=MCITE + ":68-88"),
    _js("js-destr-obj-rename-defaults", "var {a: n = 1, b: m = 2} = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["n"],
        "n": ["_tmp_0"],
        ("_tmp_0", 1): ["a"],
        ("a", 0): ["_tmp_0.a"],
        ("_tmp_0.a", 0): ["void 0"],
        ("void 0", 0): ["_tmp_0.a === void 0"],
        "_tmp_0.a === void 0": ["1", "_tmp_0"],
        ("_tmp_0", 2): ["a"],
        ("a", 1): ["_tmp_0.a"],
        ("_tmp_0.a", 1): ["_tmp_0.a === void 0 ? 1 : _tmp_0.a"],
        ("1", 0): ["_tmp_0.a === void 0 ? 1 : _tmp_0.a"],
        "_tmp_0.a === void 0 ? 1 : _tmp_0.a":
            ["n = _tmp_0.a === void 0 ? 1 : _tmp_0.a"],
        "n = _tmp_0.a === void 0 ? 1 : _tmp_0.a": ["m"],
        "m": ["_tmp_0"],
        ("_tmp_0", 3): ["b"],
        ("b", 0): ["_tmp_0.b"],
        ("_tmp_0.b", 0): ["void 0"],
        ("void 0", 1): ["_tmp_0.b === void 0"],
        "_tmp_0.b === void 0": ["2", "_tmp_0"],
        ("_tmp_0", 4): ["b"],
        ("b", 1): ["_tmp_0.b"],
        ("_tmp_0.b", 1): ["_tmp_0.b === void 0 ? 2 : _tmp_0.b"],
        ("2", 0): ["_tmp_0.b === void 0 ? 2 : _tmp_0.b"],
        "_tmp_0.b === void 0 ? 2 : _tmp_0.b":
            ["m = _tmp_0.b === void 0 ? 2 : _tmp_0.b"],
        "m = _tmp_0.b === void 0 ? 2 : _tmp_0.b": ["_tmp_0"],
        ("_tmp_0", 5): ["var {a: n = 1, b: m = 2} = x"],
        "var {a: n = 1, b: m = 2} = x": ["RET"],
    }, cite=MCITE + ":90-139"),
    _js("js-destr-obj-rest", "var {a, ...rest} = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        ("a", 0): ["_tmp_0"],
        ("_tmp_0", 1): ["a"],
        ("a", 1): ["_tmp_0.a"],
        "_tmp_0.a": ["a = _tmp_0.a"],
        "a = _tmp_0.a": ["_tmp_0"],
        ("_tmp_0", 2): ["rest"],
        "rest": ["...rest"],
        "...rest": ["_tmp_0"],
        ("_tmp_0", 3): ["var {a, ...rest} = x"],
        "var {a, ...rest} = x": ["RET"],
    }, cite=MCITE + ":140-159"),
    _js("js-destr-obj-computed", "var {[propName]: n} = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["n"],
        "n": ["_tmp_0"],
        ("_tmp_0", 1): ["propName"],
        "propName": ["_tmp_0.propName"],
        "_tmp_0.propName": ["n = _tmp_0.propName"],
        "n = _tmp_0.propName": ["_tmp_0"],
        ("_tmp_0", 2): ["var {[propName]: n} = x"],
        "var {[propName]: n} = x": ["RET"],
    }, cite=MCITE + ":161-176"),
    _js("js-destr-obj-param", "function userId({id}) {\n  return id\n}\n", {
        ("userId", 0, "METHOD"): ["id"],
        ("id", 0): ["param1_0"],
        "param1_0": ["id"],
        ("id", 1): ["param1_0.id"],
        "param1_0.id": ["id = param1_0.id"],
        "id = param1_0.id": ["id"],
        ("id", 2): ["return id"],
        "return id": ["RET"],
    }, cite=MCITE + ":230-243"),
    _js("js-destr-arr-decl", "var [a, b] = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        "a": ["_tmp_0"],
        ("_tmp_0", 1): ["0"],
        "0": ["_tmp_0[0]"],
        "_tmp_0[0]": ["a = _tmp_0[0]"],
        "a = _tmp_0[0]": ["b"],
        "b": ["_tmp_0"],
        ("_tmp_0", 2): ["1"],
        "1": ["_tmp_0[1]"],
        "_tmp_0[1]": ["b = _tmp_0[1]"],
        "b = _tmp_0[1]": ["_tmp_0"],
        ("_tmp_0", 3): ["var [a, b] = x"],
        "var [a, b] = x": ["RET"],
    }, cite=MCITE + ":245-266"),
    _js("js-destr-arr-bare", "[a, b] = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        "a": ["_tmp_0"],
        ("_tmp_0", 1): ["0"],
        "0": ["_tmp_0[0]"],
        "_tmp_0[0]": ["a = _tmp_0[0]"],
        "a = _tmp_0[0]": ["b"],
        "b": ["_tmp_0"],
        ("_tmp_0", 2): ["1"],
        "1": ["_tmp_0[1]"],
        "_tmp_0[1]": ["b = _tmp_0[1]"],
        "b = _tmp_0[1]": ["_tmp_0"],
        ("_tmp_0", 3): ["[a, b] = x"],
        "[a, b] = x": ["RET"],
    }, cite=MCITE + ":268-289"),
    _js("js-destr-arr-defaults", "var [a = 1, b = 2] = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        "a": ["_tmp_0"],
        ("_tmp_0", 1): ["0"],
        ("0", 0): ["_tmp_0[0]"],
        ("_tmp_0[0]", 0): ["void 0"],
        ("void 0", 0): ["_tmp_0[0] === void 0"],
        "_tmp_0[0] === void 0": ["1", "_tmp_0"],
        ("_tmp_0", 2): ["0"],
        ("0", 1): ["_tmp_0[0]"],
        ("_tmp_0[0]", 1): ["_tmp_0[0] === void 0 ? 1 : _tmp_0[0]"],
        ("1", 0): ["_tmp_0[0] === void 0 ? 1 : _tmp_0[0]"],
        "_tmp_0[0] === void 0 ? 1 : _tmp_0[0]":
            ["a = _tmp_0[0] === void 0 ? 1 : _tmp_0[0]"],
        "a = _tmp_0[0] === void 0 ? 1 : _tmp_0[0]": ["b"],
        "b": ["_tmp_0"],
        ("_tmp_0", 3): ["1"],
        ("1", 1): ["_tmp_0[1]"],
        ("_tmp_0[1]", 0): ["void 0"],
        ("void 0", 1): ["_tmp_0[1] === void 0"],
        "_tmp_0[1] === void 0": ["2", "_tmp_0"],
        ("_tmp_0", 4): ["1"],
        ("1", 2): ["_tmp_0[1]"],
        ("_tmp_0[1]", 1): ["_tmp_0[1] === void 0 ? 2 : _tmp_0[1]"],
        ("2", 0): ["_tmp_0[1] === void 0 ? 2 : _tmp_0[1]"],
        "_tmp_0[1] === void 0 ? 2 : _tmp_0[1]":
            ["b = _tmp_0[1] === void 0 ? 2 : _tmp_0[1]"],
        "b = _tmp_0[1] === void 0 ? 2 : _tmp_0[1]": ["_tmp_0"],
        ("_tmp_0", 5): ["var [a = 1, b = 2] = x"],
        "var [a = 1, b = 2] = x": ["RET"],
    }, cite=MCITE + ":291-346"),
    _js("js-destr-arr-ignores", "var [a, , b] = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        "a": ["_tmp_0"],
        ("_tmp_0", 1): ["0"],
        "0": ["_tmp_0[0]"],
        "_tmp_0[0]": ["a = _tmp_0[0]"],
        "a = _tmp_0[0]": ["b"],
        "b": ["_tmp_0"],
        ("_tmp_0", 2): ["2"],
        "2": ["_tmp_0[2]"],
        "_tmp_0[2]": ["b = _tmp_0[2]"],
        "b = _tmp_0[2]": ["_tmp_0"],
        ("_tmp_0", 3): ["var [a, , b] = x"],
        "var [a, , b] = x": ["RET"],
    }, cite=MCITE + ":348-369"),
    _js("js-destr-arr-rest", "var [a, ...rest] = x\n", {
        ":program": ["_tmp_0"],
        ("_tmp_0", 0): ["x"],
        "x": ["_tmp_0 = x"],
        "_tmp_0 = x": ["a"],
        "a": ["_tmp_0"],
        ("_tmp_0", 1): ["0"],
        "0": ["_tmp_0[0]"],
        "_tmp_0[0]": ["a = _tmp_0[0]"],
        "a = _tmp_0[0]": ["_tmp_0"],
        ("_tmp_0", 2): ["1"],
        "1": ["_tmp_0[1]"],
        "_tmp_0[1]": ["rest"],
        "rest": ["...rest"],
        "...rest": ["_tmp_0"],
        ("_tmp_0", 3): ["var [a, ...rest] = x"],
        "var [a, ...rest] = x": ["RET"],
    }, cite=MCITE + ":371-392"),
    _js("js-destr-arr-param", "function userId([id]) {\n  return id\n}\n", {
        ("userId", 0, "METHOD"): ["id"],
        ("id", 0): ["param1_0"],
        "param1_0": ["id"],
        ("id", 1): ["param1_0.id"],
        "param1_0.id": ["id = param1_0.id"],
        "id = param1_0.id": ["id"],
        ("id", 2): ["return id"],
        "return id": ["RET"],
    }, cite=MCITE + ":394-411"),
]

# SimpleCfgCreationPassTests.scala:552-562 — for-in / for-of lower to the
# Babel iterator protocol (testForInOrOf :729-774); :12-24 block expression
# with a class-expression value.
CASES += [
    _js("js-for-in", "for (var i in arr) { foo(i) }\n", {
        ":program": ["_iterator_0"],
        ("_iterator_0", 0): ["arr"],
        "arr": ["<operator>.iterator(arr)"],
        "<operator>.iterator(arr)": ["_iterator_0 = <operator>.iterator(arr)"],
        "_iterator_0 = <operator>.iterator(arr)": ["_result_0"],
        ("_result_0", 0): ["i"],
        ("i", 0): ["_result_0"],
        ("_result_0", 1): ["_iterator_0"],
        ("_iterator_0", 1): ["next"],
        "next": ["_iterator_0.next"],
        "_iterator_0.next": ["_iterator_0"],
        ("_iterator_0", 2): ["_iterator_0.next()"],
        "_iterator_0.next()": ["(_result_0 = _iterator_0.next())"],
        "(_result_0 = _iterator_0.next())": ["done"],
        "done": ["(_result_0 = _iterator_0.next()).done"],
        "(_result_0 = _iterator_0.next()).done":
            ["!(_result_0 = _iterator_0.next()).done"],
        "!(_result_0 = _iterator_0.next()).done":
            ["i", "for (var i in arr) { foo(i) }"],
        ("for (var i in arr) { foo(i) }", 0, "BLOCK"): ["RET"],
        ("i", 1): ["_result_0"],
        ("_result_0", 2): ["value"],
        "value": ["_result_0.value"],
        "_result_0.value": ["i = _result_0.value"],
        "i = _result_0.value": ["foo"],
        "foo": ["this"],
        # reference ("this",1): its isCfgNode vector counts the :program
        # method's `this` PARAMETER as occurrence 0; parameters are not
        # subjects here, so the call base is our only IDENTIFIER `this`
        ("this", 0, "IDENTIFIER"): ["i"],
        ("i", 2): ["foo(i)"],
        "foo(i)": ["{ foo(i) }"],
        "{ foo(i) }": ["_result_0"],
    }, cite=CITE + ":552-556,729-774"),
    _js("js-for-of", "for (var i of arr) { foo(i) }\n", {
        ":program": ["_iterator_0"],
        ("_iterator_0", 0): ["arr"],
        "arr": ["<operator>.iterator(arr)"],
        "<operator>.iterator(arr)": ["_iterator_0 = <operator>.iterator(arr)"],
        "_iterator_0 = <operator>.iterator(arr)": ["_result_0"],
        ("_result_0", 0): ["i"],
        ("i", 0): ["_result_0"],
        "!(_result_0 = _iterator_0.next()).done":
            ["i", "for (var i of arr) { foo(i) }"],
        ("for (var i of arr) { foo(i) }", 0, "BLOCK"): ["RET"],
        "i = _result_0.value": ["foo"],
        "foo(i)": ["{ foo(i) }"],
        "{ foo(i) }": ["_result_0"],
    }, cite=CITE + ":558-562,729-774"),
    _js("js-block-expression", "let x = (class Foo {}, bar())\n", {
        ":program": ["x"],
        "x": ["class Foo"],
        "class Foo": ["bar"],
        "bar": ["this"],
        ("this", 0, "IDENTIFIER"): ["bar()"],
        "bar()": ["class Foo {}, bar()"],
        "class Foo {}, bar()": ["let x = (class Foo {}, bar())"],
        "let x = (class Foo {}, bar())": ["RET"],
    }, cite=CITE + ":12-24"),
]

CASES += [
    # SimpleCfgCreationPassTests.scala:93-121 — tagged template: dynamic
    # call on the tag with the quasi-array block + interpolations as args.
    _js("js-template-tagged", "String.raw`../${42}\\..`\n", {
        ":program": ["String"],
        ("String", 0): ["raw"],
        "raw": ["String.raw"],
        "String.raw": ["String"],
        ("String", 1): ["_tmp_0"],
        ("_tmp_0", 0): ["__ecma.Array.factory()"],
        "__ecma.Array.factory()": ["_tmp_0 = __ecma.Array.factory()"],
        "_tmp_0 = __ecma.Array.factory()": ["_tmp_0"],
        ("_tmp_0", 1): ["push"],
        ("push", 0): ["_tmp_0.push"],
        ("_tmp_0.push", 0): ["_tmp_0"],
        ("_tmp_0", 2): ['"../"'],
        '"../"': ['_tmp_0.push("../")'],
        '_tmp_0.push("../")': ["_tmp_0"],
        ("_tmp_0", 3): ["push"],
        ("push", 1): ["_tmp_0.push"],
        ("_tmp_0.push", 1): ["_tmp_0"],
        ("_tmp_0", 4): ['"\\.."'],
        '"\\.."': ['_tmp_0.push("\\..")'],
        '_tmp_0.push("\\..")': ["_tmp_0"],
        ("_tmp_0", 5): ["`../${42}\\..`"],
        "`../${42}\\..`": ["42"],
        "42": ["String.raw`../${42}\\..`"],
        "String.raw`../${42}\\..`": ["RET"],
    }, cite=CITE + ":93-121"),
]

CASES += [
    # SimpleCfgCreationPassTests.scala:240-250 — a function DECLARATION also
    # participates in the enclosing CFG via the synthetic
    # `function foo = function foo(x, y) { return; }` assignment.
    _js("js-function-decl-assign", "function foo(x, y) { return; }\n", {
        (":program", 0, "METHOD"): ["foo"],
        ("foo", 0, "IDENTIFIER"): ["foo"],
        ("foo", 0, "METHOD_REF"):
            ["function foo = function foo(x, y) { return; }"],
        "function foo = function foo(x, y) { return; }": ["RET"],
    }, cite=CITE + ":240-250"),
]

# JsClassesAstCreationPassTests.scala — constructor naming and method
# fullnames (reference fixture file is Test0.js; facts here carry this
# corpus's per-case filename, the scheme is identical).
ACITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/ast/"
         "JsClassesAstCreationPassTests.scala")
CASES += [
    dict(name="js-class-fake-ctor", lang="javascript", wrap=False,
         code="class ClassA {\n  foo() {}\n  bar() {}\n}\n",
         methods=[
             ["<init>", "js-class-fake-ctor.js::program:ClassA:<init>"],
             ["foo", "js-class-fake-ctor.js::program:ClassA:foo"],
             ["bar", "js-class-fake-ctor.js::program:ClassA:bar"],
             [":program", "js-class-fake-ctor.js::program"],
         ],
         cite=ACITE + ":83-99 (fake constructor <init> first; method "
              "fullnames <file>::program:ClassA:<name>)"),
    dict(name="js-class-explicit-ctor", lang="javascript", wrap=False,
         code="var x = class ClassA {\n  constructor(p) {}\n  "
              "static staticFoo() {}\n}\n",
         methods=[
             ["<init>", "js-class-explicit-ctor.js::program:ClassA:<init>"],
             ["staticFoo",
              "js-class-explicit-ctor.js::program:ClassA:staticFoo"],
         ],
         cite=ACITE + ":68-81"),
]

CASES += [
    # MixedCfgCreationPassTests.scala:178-228 — nested object destructuring
    # with defaults as a parameter: the pattern default lowers to
    # `_tmp_1 = param1_0 === void 0 ? {} : param1_0` (the `{}` holds
    # _tmp_0) feeding a block-form destructure whose inner `id` default
    # allocates _tmp_2. The reference addresses the pattern-coded node at
    # occurrence 1 because its vector counts the METHOD_PARAMETER_IN
    # (code = the pattern source) first; parameters are not subjects here,
    # so the destructure BLOCK is our occurrence 0.
    _js("js-destr-param-nested-defaults",
        "function userId({id = {}, b} = {}) {\n  return id\n}\n", {
        ("userId", 0, "METHOD"): ["_tmp_1"],
        ("_tmp_1", 0): ["param1_0"],
        ("param1_0", 0): ["void 0"],
        ("void 0", 0): ["param1_0 === void 0"],
        "param1_0 === void 0": ["_tmp_0", "param1_0"],
        ("param1_0", 1): ["param1_0 === void 0 ? {} : param1_0"],
        ("_tmp_0", 0): ["param1_0 === void 0 ? {} : param1_0"],
        "param1_0 === void 0 ? {} : param1_0":
            ["_tmp_1 = param1_0 === void 0 ? {} : param1_0"],
        "_tmp_1 = param1_0 === void 0 ? {} : param1_0": ["id"],
        ("id", 0): ["_tmp_1"],
        ("_tmp_1", 1): ["id"],
        ("id", 1): ["_tmp_1.id"],
        ("_tmp_1.id", 0): ["void 0"],
        ("void 0", 1): ["_tmp_1.id === void 0"],
        "_tmp_1.id === void 0": ["_tmp_2", "_tmp_1"],
        ("_tmp_2", 0): ["_tmp_1.id === void 0 ? {} : _tmp_1.id"],
        ("_tmp_1", 2): ["id"],
        ("id", 2): ["_tmp_1.id"],
        ("_tmp_1.id", 1): ["_tmp_1.id === void 0 ? {} : _tmp_1.id"],
        "_tmp_1.id === void 0 ? {} : _tmp_1.id":
            ["id = _tmp_1.id === void 0 ? {} : _tmp_1.id"],
        "id = _tmp_1.id === void 0 ? {} : _tmp_1.id": ["b"],
        ("b", 0): ["_tmp_1"],
        ("_tmp_1", 3): ["b"],
        ("b", 1): ["_tmp_1.b"],
        "_tmp_1.b": ["b = _tmp_1.b"],
        "b = _tmp_1.b": ["_tmp_1"],
        ("_tmp_1", 4): ["{id = {}, b} = {}"],
        ("{id = {}, b} = {}", 0, "BLOCK"): ["id"],
    }, cite=MCITE + ":178-228"),
]


# --------------------------------------------------------------------------- #
# Round-4 XTypeRecovery transcriptions (verdict r3 next-round item #4) —
# jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/TypeRecoveryPassTests.scala.
# Facts: recovered call methodFullNames keyed by call code; identifier
# type-hint sets keyed `id:<var>` (sorted, comma-joined).
# --------------------------------------------------------------------------- #

TRCITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/"
          "TypeRecoveryPassTests.scala")

CASES += [
    # :42-100 — ES named imports feed `new`-constructed identifiers; member
    # calls resolve through them; assigned results take :<returnValue>.
    dict(name="js-typerec-import-new", lang="javascript", wrap=False, code="""
import { WebClient } from "slack_sdk";
import { SendGridAPIClient } from "sendgrid";

const client = new WebClient("WOLOLO");
const sg = new SendGridAPIClient("SENGRID_KEY_WOLOLO");

function sendSlackMessage(chan, msg) {
    client.chatPostMessage(channel=chan, text=msg);
}

let response = sg.send(message);
""",
         typerec=[
             ["client.chatPostMessage(channel=chan, text=msg)",
              "slack_sdk:WebClient:chatPostMessage"],          # :90-93
             ["sg.send(message)", "sendgrid:SendGridAPIClient:send"],  # :77-80
             ["id:client", "slack_sdk:WebClient"],             # :82-88
             ["id:sg", "sendgrid:SendGridAPIClient"],          # :69-74
             ["id:response",
              "sendgrid:SendGridAPIClient:send:<returnValue>"],  # :95-98
         ],
         cite=TRCITE + ":42-100"),
    # :253-275 — type obtained via assignment from `require`.
    dict(name="js-typerec-require", lang="javascript", wrap=False, code="""
const google = require('googleapis');
const driveObj = google.drive({ version: 'v3', auth });
""",
         typerec=[
             ["google.drive({ version: 'v3', auth })", "googleapis:drive"],
             ["id:google", "googleapis"],
             ["id:driveObj", "googleapis:drive:<returnValue>"],
         ],
         cite=TRCITE + ":253-275 (methodFullName googleapis:drive; "
              "driveObj googleapis:drive:<returnValue>)"),
    # :277-297 — the same through a destructuring `const { google } = ...`.
    dict(name="js-typerec-require-destructured", lang="javascript",
         wrap=False, code="""
const { google } = require('googleapis');
const driveObj = google.drive({ version: 'v3', auth });
""",
         typerec=[
             ["google.drive({ version: 'v3', auth })", "googleapis:drive"],
             ["id:google", "googleapis"],
             ["id:driveObj", "googleapis:drive:<returnValue>"],
         ],
         cite=TRCITE + ":277-297"),
    # :11-40 — literals declared from built-in types: flow-insensitive hint
    # union across shadowed scopes; array literals type __ecma.Array and
    # resolve member calls (z.push -> __ecma.Array:push).
    dict(name="js-typerec-literals", lang="javascript", wrap=False, code="""
let x = 123;

function foo_shadowing() {
   let x = "foo";
}

z = [1, 2, 3];

z.push(4)
""",
         typerec=[
             ["id:x", "__ecma.Number,__ecma.String"],   # :25-29 (both scopes)
             ["id:z", "__ecma.Array"],                  # :31-34
             ["z.push(4)", "__ecma.Array:push"],        # :36-39
         ],
         cite=TRCITE + ":11-40"),
    # ImportsPassTests.scala:14-28 + the classic require chain: member call
    # on a require-bound module, then a second hop through <returnValue>.
    dict(name="js-typerec-require-chain", lang="javascript", wrap=False,
         code="""
const mysql = require('mysql');
var con = mysql.createConnection();
con.query("SELECT 1");
""",
         typerec=[
             ["mysql.createConnection()", "mysql:createConnection"],
             ["con.query(\"SELECT 1\")",
              "mysql:createConnection:<returnValue>:query"],
             ["id:mysql", "mysql"],
             ["id:con", "mysql:createConnection:<returnValue>"],
         ],
         cite=TRCITE + " (require binding + XTypeRecovery.scala:259 "
              "DummyReturnType hop)"),
]


CASES += [
    # ConstClosurePassTests.scala:9-51 — function expressions assigned to
    # object-literal properties take the property name, and the member
    # call sites link to the renamed closures via type recovery
    # (XTypeRecovery object-property entries + TypeHintCallLinker).
    dict(
        name="js-constclosure-objprops", lang="javascript",
        code="""
var myObject = {
  prop1: "a",
  prop2: "b",

  // Function 1
  sayHello: function () {
    console.log("sayHello");
  },

  // Function 2
  sayWorld: function () {
    console.log("sayWorld");
  },

  // Function 3
  sayHelloWorld: function () {
    console.log("sayHelloWorld");
  }
};
myObject.sayHello()
myObject.sayWorld()
myObject.sayHelloWorld()
""",
        methods=[("sayHello",
                  "js-constclosure-objprops.js::program:sayHello"),
                 ("sayWorld",
                  "js-constclosure-objprops.js::program:sayWorld"),
                 ("sayHelloWorld",
                  "js-constclosure-objprops.js::program:sayHelloWorld")],
        typerec=[("myObject.sayHello()",
                  "js-constclosure-objprops.js::program:sayHello"),
                 ("myObject.sayWorld()",
                  "js-constclosure-objprops.js::program:sayWorld"),
                 ("myObject.sayHelloWorld()",
                  "js-constclosure-objprops.js::program:sayHelloWorld")],
        cite="jssrc2cpg/.../passes/ConstClosurePassTests.scala:9-51",
    ),
    # :53-66 — const arrows take the constant's name.
    dict(
        name="js-constclosure-const", lang="javascript",
        code="""
const foo = (x,y) => { return x + y; }
const bar = (x,y) => { return x - y; }
""",
        methods=[("foo", "js-constclosure-const.js::program:foo"),
                 ("bar", "js-constclosure-const.js::program:bar")],
        cite="jssrc2cpg/.../passes/ConstClosurePassTests.scala:53-66",
    ),
    # :68-84 — `exports.foo = (IIFE)` renames the outermost closure in the
    # assigned expression.
    dict(
        name="js-constclosure-exports", lang="javascript",
        code="""
exports.foo = (function() {
\tvar count = 0;
\treturn function() {
\t\tcount++;
\t\treturn count;
\t};
})();

this.foo();
""",
        methods=[("foo", "js-constclosure-exports.js::program:foo")],
        cite="jssrc2cpg/.../passes/ConstClosurePassTests.scala:68-84",
    ),
    # :86-112 — `var` closures rename only when assigned exactly once;
    # call sites follow the (un)renamed fullname either way.
    dict(
        name="js-constclosure-mutable", lang="javascript",
        code="""
var foo = function() {};
foo();

var bar = function() {};
bar();
bar = 2;
""",
        methods=[("foo", "js-constclosure-mutable.js::program:foo"),
                 ("<lambda>1", "js-constclosure-mutable.js::program:<lambda>1")],
        callmfn=[("foo", "js-constclosure-mutable.js::program:foo"),
                 ("bar", "js-constclosure-mutable.js::program:<lambda>1")],
        cite="jssrc2cpg/.../passes/ConstClosurePassTests.scala:86-112",
    ),
]


# SimpleAstCreationPassTests AST-shape cases — with statements (lowered to
# a BLOCK holding object expr + body stmts, astForWithStatement
# AstForStatementsCreator.scala:43-57), TS non-null assertion
# (<operator>.notNullAssert, astForTSNonNullExpression), literal typing
# (__ecma.Number/String/Boolean/Null, AstForPrimitivesCreator.scala:26-60)
# and cooked double-quoted string CODE (astForStringLiteral:35-38).
_AST_CITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/ast/"
             "SimpleAstCreationPassTests.scala")
CASES += [
    dict(name="js-with-block", lang="javascript", wrap=False,
         code="with(foo()) {\n  bar();\n}\n",
         ast={
             # `foo`/`bar` are undeclared: VariableScopeManager synthesizes
             # program-block LOCALs for them (resolve/unresolvedHandler)
             ("<empty>", 0): ["with(foo()) {\n  bar();\n}", "foo", "bar"],
             ("with(foo()) {\n  bar();\n}", 0): ["foo()", "bar()"],
         },
         cite=_AST_CITE + ":23-33"),
    dict(name="js-with-noblock", lang="javascript", wrap=False,
         code="with(foo())\n  bar();\nbaz();\n",
         ast={
             ("<empty>", 0): ["with(foo())\n  bar();", "baz()",
                              "foo", "bar", "baz"],
             ("with(foo())\n  bar();", 0): ["foo()", "bar()"],
         },
         cite=_AST_CITE + ":35-46"),
    dict(name="js-nonnull-assert", lang="javascript", wrap=False,
         code="const foo = bar!\n",
         ast={
             ("const foo = bar!", 0): ["foo", "bar!"],
             ("bar!", 0): ["bar"],
         },
         cite=_AST_CITE + ":54-60"),
    dict(name="js-literal-types", lang="javascript", wrap=False,
         code="let x = 1; let y = 'y'; let z = false; let n = null;\n",
         nodetype={
             ("1", 0): "__ecma.Number",
             ('"y"', 0): "__ecma.String",
             ("false", 0): "__ecma.Boolean",
             ("null", 0): "__ecma.Null",
         },
         cite=_AST_CITE + ":86-93"),
    dict(name="js-literal-longnum", lang="javascript", wrap=False,
         code="console.log(1e20)\n",
         nodetype={("1e20", 0): "__ecma.Number"},
         cite=_AST_CITE + ":48-52"),
    # strippedCode assertions :95-121 — literal CODE is the double-quoted
    # *cooked* value regardless of source quoting/escapes
    dict(name="js-string-inner-text", lang="javascript", wrap=False,
         code='let a = "abc";\n'
              'let b = "\\"abc";\n'
              'let c = "abc\\"";\n'
              "let d = 'abc';\n"
              "let e = '\\'abc';\n"
              "let f = 'abc\\'';\n"
              'let g = "\'abc\'";\n'
              "let h = '\"abc\"';\n"
              "let i = '\\'abc\\'';\n",
         ast={
             ('let a = "abc"', 0): ["a", '"abc"'],
             ('let b = "\\"abc"', 0): ["b", '""abc"'],
             ('let c = "abc\\""', 0): ["c", '"abc""'],
             ("let d = 'abc'", 0): ["d", '"abc"'],
             ("let e = '\\'abc'", 0): ["e", '"\'abc"'],
             ("let f = 'abc\\''", 0): ["f", '"abc\'"'],
             ('let g = "\'abc\'"', 0): ["g", '"\'abc\'"'],
             ("let h = '\"abc\"'", 0): ["h", '""abc""'],
             ("let i = '\\'abc\\''", 0): ["i", '"\'abc\'"'],
         },
         cite=_AST_CITE + ":95-121"),
]

CASES += [
    # :123-135 — one assignment call per declarator, code `let x = 1` etc.
    dict(name="js-multi-declarators", lang="javascript", wrap=False,
         code="let x = 1, y = 2, z = 3;\n",
         ast={
             ("let x = 1", 0): ["x", "1"],
             ("let y = 2", 0): ["y", "2"],
             ("let z = 3", 0): ["z", "3"],
         },
         cite=_AST_CITE + ":126-136"),
    # :138-147 — require(...).bar chains: fieldAccess over the require call
    dict(name="js-require-member", lang="javascript", wrap=False,
         code='var x = require("foo").bar;\n',
         ast={
             ('var x = require("foo").bar', 0): ["x", 'require("foo").bar'],
             ('require("foo").bar', 0): ['require("foo")', "bar"],
             ('require("foo")', 0): ["require", "this", '"foo"'],
         },
         cite=_AST_CITE + ":138-147"),
    # :149-173 — (class Foo {}, bar()) sequence: BLOCK with TYPE_REF
    # `class Foo` + bar(); class lifts to TYPE_DECL with <init> ctor
    dict(name="js-block-expression-ast", lang="javascript", wrap=False,
         code="let x = (class Foo {}, bar())\n",
         ast={
             ("let x = (class Foo {}, bar())", 0):
                 ["x", "class Foo {}, bar()"],
             ("class Foo {}, bar()", 0): ["class Foo", "bar()"],
         },
         methods=[("<init>", "js-block-expression-ast.js::program:Foo:<init>")],
         cite=_AST_CITE + ":149-173"),
    # :175-185 — index access argument order (base idx 1, index idx 2)
    dict(name="js-index-access", lang="javascript", wrap=False,
         code="if(d = decorators[i]) foo();\n",
         ast={
             ("d = decorators[i]", 0): ["d", "decorators[i]"],
             ("decorators[i]", 0): ["decorators", "i"],
         },
         cite=_AST_CITE + ":175-185"),
]

CASES += [
    # :383-410 — TRY control structure: block (order 1), CATCH wrapper
    # (order 2), FINALLY wrapper (order 3)
    dict(name="js-try-ast", lang="javascript", wrap=False,
         code="try {\n open()\n} catch(err) {\n handle()\n}"
              " finally {\n close()\n}\n",
         ast={
             ("try", 0): ["<empty>", "catch", "finally"],
             ("catch", 0): ["err", "<empty>"],
             ("finally", 0): ["<empty>"],
         },
         cs=[(":program:TRY", "try"), (":program:CATCH", "catch"),
             (":program:FINALLY", "finally")],
         cite=_AST_CITE + ":383-410"),
    # :356-381 — every quoting form renders literal CODE as the
    # double-quoted cooked value; assignment CODE keeps the raw source
    dict(name="js-string-literal-forms", lang="javascript", wrap=False,
         code='var keyA = "AAA";\n'
              "var keyB = 'BBB';\n"
              "var keyC = `CCC`;\n"
              'var keyD = `DDD"`;\n'
              'var keyE = "EE EE E";\n',
         ast={
             ('var keyA = "AAA"', 0): ["keyA", '"AAA"'],
             ("var keyB = 'BBB'", 0): ["keyB", '"BBB"'],
             ("var keyC = `CCC`", 0): ["keyC", '"CCC"'],
             ('var keyD = `DDD"`', 0): ["keyD", '"DDD""'],
             ('var keyE = "EE EE E"', 0): ["keyE", '"EE EE E"'],
         },
         cite=_AST_CITE + ":356-381"),
    # :435-466 — object literal with spread: _tmp lowering plus
    # <operator>.spread(_tmp_0, rest)
    dict(name="js-object-spread", lang="javascript", wrap=False,
         code='var x = {\n key1: "value",\n key2: 2,\n ...rest\n}\n',
         ast={
             ("...rest", 0): ["_tmp_0", "rest"],
             ('_tmp_0.key1 = "value"', 0): ["_tmp_0.key1", '"value"'],
             ("_tmp_0.key2 = 2", 0): ["_tmp_0.key2", "2"],
         },
         cite=_AST_CITE + ":435-466"),
]

CASES += [
    # :604-620 — quoted property names strip quotes in the fieldIdentifier
    dict(name="js-object-quoted-keys", lang="javascript", wrap=False,
         code="var x = {\n \"a\": 1,\n 'b': 2\n}\n",
         ast={
             ("_tmp_0.a = 1", 0): ["_tmp_0.a", "1"],
             ("_tmp_0.a", 0): ["_tmp_0", "a"],
             ("_tmp_0.b = 2", 0): ["_tmp_0.b", "2"],
             ("_tmp_0.b", 0): ["_tmp_0", "b"],
         },
         cite=_AST_CITE + ":604-620"),
    # :622-635 — conditional expression is one <operator>.conditional call
    dict(name="js-conditional-expr", lang="javascript", wrap=False,
         code="x ? y : z;\n",
         ast={("x ? y : z", 0): ["x", "y", "z"]},
         cite=_AST_CITE + ":622-635"),
    # :762-772 — nested lambdas chain fullnames <lambda>0:<lambda>1
    dict(name="js-nested-lambdas", lang="javascript", wrap=False,
         code="() => async () => { }\n",
         methods=[("<lambda>0", "js-nested-lambdas.js::program:<lambda>0"),
                  ("<lambda>1",
                   "js-nested-lambdas.js::program:<lambda>0:<lambda>1")],
         cite=_AST_CITE + ":762-772"),
    # :672-689 — array pattern with hole: param named param1_0, code is the
    # pattern source, body gets `param = param1_0.param`
    dict(name="js-lambda-hole-param", lang="javascript", wrap=False,
         code="var x = ([, param]) => param\n",
         ast={("param = param1_0.param", 0): ["param", "param1_0.param"],
              ("param1_0.param", 0): ["param1_0", "param"]},
         params=[("x.param1_0", "1:ANY:BY_SHARING")],
         cite=_AST_CITE + ":672-689"),
    # :691-733 — object/array rest params lower to `rest = param1_0.rest`
    dict(name="js-lambda-rest-param", lang="javascript", wrap=False,
         code="var x = ({x, ...rest}) => x + rest\n",
         ast={("rest = param1_0.rest", 0): ["rest", "param1_0.rest"],
              ("x = param1_0.x", 0): ["x", "param1_0.x"]},
         cite=_AST_CITE + ":691-733"),
    dict(name="js-lambda-rest-param-arr", lang="javascript", wrap=False,
         code="var x = ([x, ...rest]) => x + rest\n",
         ast={("rest = param1_0.rest", 0): ["rest", "param1_0.rest"],
              ("x = param1_0.x", 0): ["x", "param1_0.x"]},
         cite=_AST_CITE + ":713-733"),
]

CASES += [
    # :815-855 — chained calls _tmp receiver lowering:
    # x.foo(y).bar(z) => bar's receiver is (_tmp_0 = x.foo(y)).bar
    dict(name="js-chained-calls-ast", lang="javascript", wrap=False,
         code="x.foo(y).bar(z)\n",
         ast={
             ("x.foo(y).bar(z)", 0):
                 ["(_tmp_0 = x.foo(y)).bar", "_tmp_0", "z"],
             ("(_tmp_0 = x.foo(y)).bar", 0): ["(_tmp_0 = x.foo(y))", "bar"],
             ("(_tmp_0 = x.foo(y))", 0): ["_tmp_0", "x.foo(y)"],
             ("x.foo(y)", 0): ["x.foo", "x", "y"],
             ("x.foo", 0): ["x", "foo"],
         },
         cite=_AST_CITE + ":815-855"),
    # :913-920/:940-955 — while with brackets gets a body BLOCK;
    # without brackets the statement hangs directly off the loop
    dict(name="js-while-block", lang="javascript", wrap=False,
         code="while (x < 0) {}\n",
         ast={("while (x < 0)", 0): ["x < 0", "<empty>"]},
         cite=_AST_CITE + ":913-920"),
    # :957-977 — function-name LOCAL typed with the function fullname and
    # the mirror TYPE_DECL carrying an empty-name/empty-signature BINDING
    dict(name="js-function-binding", lang="javascript", wrap=False,
         code="function method(x) {}\n",
         locals=[(":program.method",
                  "method|js-function-binding.js::program:method")],
         bindings=[("method:", "->js-function-binding.js::program:method")],
         params=[("method.this", "0:ANY:BY_VALUE"),
                 ("method.x", "1:ANY:BY_SHARING"),
                 (":program.this", "0:ANY:BY_VALUE")],
         cite=_AST_CITE + ":957-985"),
    # :987-1003 — rest parameter: code `...args`, typed __ecma.Array
    dict(name="js-rest-param", lang="javascript", wrap=False,
         code="function method(x, ...args) {}\n",
         params=[("method.this", "0:ANY:BY_VALUE"),
                 ("method.x", "1:ANY:BY_SHARING"),
                 ("method.args", "2:__ecma.Array:BY_SHARING"),
                 (":program.this", "0:ANY:BY_VALUE")],
         cite=_AST_CITE + ":987-1003"),
]

CASES += [
    # :759-771 — nested lambda fullnames chain through the enclosing lambda
    dict(name="js-lambdas-of-lambdas", lang="javascript", wrap=False,
         code="() => async () => { }\n",
         methods=[
             [":program", "js-lambdas-of-lambdas.js::program"],
             ["<lambda>0", "js-lambdas-of-lambdas.js::program:<lambda>0"],
             ["<lambda>1",
              "js-lambdas-of-lambdas.js::program:<lambda>0:<lambda>1"],
         ],
         cite=_AST_CITE + ":759-771"),
    # :772-788 — this is a fieldAccess base identifier and a 0th parameter
    dict(name="js-this-expression", lang="javascript", wrap=False,
         code="function foo() { this.bar = 1 }\n",
         ast={("this.bar = 1", 0): ["this.bar", "1"],
              ("this.bar", 0): ["this", "bar"]},
         params=[("foo.this", "0:ANY:BY_VALUE")],
         cite=_AST_CITE + ":772-788"),
    # :789-813 — simple call: receiver identifier plus this(0)/x(1) args
    dict(name="js-call-expression", lang="javascript", wrap=False,
         code="function method(x) {\n  foo(x);\n}\n",
         ast={("foo(x)", 0): ["foo", "this", "x"]},
         cite=_AST_CITE + ":789-813"),
    # :857-881 — x.foo(): fieldAccess receiver, base passed as 0th arg
    dict(name="js-call-on-object", lang="javascript", wrap=False,
         code="function method(x) {\n  x.foo();\n}\n",
         ast={("x.foo()", 0): ["x.foo", "x"],
              ("x.foo", 0): ["x", "foo"]},
         cite=_AST_CITE + ":857-881"),
    # :882-911 — a.b(x): base a as 0th arg, x as 1st
    dict(name="js-call-obj-arg", lang="javascript", wrap=False,
         code="function method(x) {\n  a.b(x);\n}\n",
         ast={("a.b(x)", 0): ["a.b", "a", "x"],
              ("a.b", 0): ["a", "b"]},
         cite=_AST_CITE + ":882-911"),
    # :922-933 — while body WITHOUT brackets hangs directly off the loop
    dict(name="js-while-no-block", lang="javascript", wrap=False,
         code="while (x < 0)\n  x += 1\n",
         ast={("while (x < 0)", 0): ["x < 0", "x += 1"]},
         cite=_AST_CITE + ":922-933"),
    # :1111-1141 — unbraced if-then statement is a direct IF child
    dict(name="js-if-direct", lang="javascript", wrap=False,
         code="function method(x) {\n  var y;\n  if (x > 0)\n    y = 0;\n}\n",
         ast={("if (x > 0)", 0): ["x > 0", "y = 0"],
              ("y = 0", 0): ["y", "0"]},
         locals=[("method.y", "y|ANY")],
         cite=_AST_CITE + ":1111-1141"),
    # :1142-1176 — if-else: both branch BLOCKs direct children (no ELSE
    # control structure in jssrc)
    dict(name="js-if-else-blocks", lang="javascript", wrap=False,
         code="function method(x) {\n  var y;\n  if (x > 0) {\n    y = 0;\n"
              "  } else {\n    y = 1;\n  }\n}\n",
         ast={("if (x > 0)", 0): ["x > 0", "<empty>", "<empty>"],
              ("<empty>", 2): ["y = 0"],
              ("<empty>", 3): ["y = 1"]},
         cite=_AST_CITE + ":1142-1176"),
    # :983-1003 — var decl: LOCAL hoisted as block child, assignment call
    # keeps the `var ... = ...` code
    dict(name="js-decl-assignment", lang="javascript", wrap=False,
         code="function foo(x) { var local = 1; }\n",
         ast={("var local = 1", 0): ["local", "1"]},
         params=[("foo.this", "0:ANY:BY_VALUE"),
                 ("foo.x", "1:ANY:BY_SHARING")],
         cite=_AST_CITE + ":983-1003"),
    # :1005-1027 — decl assignment with identifier RHS
    dict(name="js-decl-assignment-id-rhs", lang="javascript", wrap=False,
         code="function foo(x) { var local = x; }\n",
         ast={("var local = x", 0): ["local", "x"]},
         cite=_AST_CITE + ":1005-1027"),
    # :1028-1061 — multiple locals: hoisted locals + ordered assignments
    dict(name="js-decl-multiple-locals", lang="javascript", wrap=False,
         code="function foo(x,y) { var local1 = x; var local2 = y; }\n",
         ast={("var local1 = x", 0): ["local1", "x"],
              ("var local2 = y", 0): ["local2", "y"]},
         cite=_AST_CITE + ":1028-1061"),
    # :1062-1075 — nested expression x = y + z
    dict(name="js-nested-expression-ast", lang="javascript", wrap=False,
         code="function method() { var x; var y; var z; x = y + z; }\n",
         ast={("x = y + z", 0): ["x", "y + z"],
              ("y + z", 0): ["y", "z"]},
         cite=_AST_CITE + ":1062-1075"),
]

CASES += [
    # :185-198 — empty array literal assigns __ecma.Array.factory() directly
    dict(name="js-array-empty-ast", lang="javascript", wrap=False,
         code="var x = []\n",
         ast={("var x = []", 0): ["x", "__ecma.Array.factory()"]},
         cite=_AST_CITE + ":185-198"),
    # :199-225 — array with values: _tmp block with factory + push per value
    dict(name="js-array-values-ast", lang="javascript", wrap=False,
         code="var x = [1, 2]\n",
         ast={("[1, 2]", 0): ["_tmp_0", "_tmp_0 = __ecma.Array.factory()",
                              "_tmp_0.push(1)", "_tmp_0.push(2)"],
              ("_tmp_0 = __ecma.Array.factory()", 0):
                  ["_tmp_0", "__ecma.Array.factory()"],
              ("_tmp_0.push(1)", 0): ["_tmp_0.push", "_tmp_0", "1"],
              ("_tmp_0.push(2)", 0): ["_tmp_0.push", "_tmp_0", "2"]},
         cite=_AST_CITE + ":199-225"),
    # :258-283 — template literal inside a call argument
    dict(name="js-template-in-call-ast", lang="javascript", wrap=False,
         code="foo(`Hello ${world}!`)\n",
         ast={("foo(`Hello ${world}!`)", 0):
                  ["foo", "this",
                   '<operator>.formatString("Hello ", world, "!")'],
              ('<operator>.formatString("Hello ", world, "!")', 0):
                  ['"Hello "', "world", '"!"']},
         cite=_AST_CITE + ":258-283"),
    # :284-305 — bare template literal statement
    dict(name="js-template-stmt-ast", lang="javascript", wrap=False,
         code="`${x + 1}`\n",
         ast={('<operator>.formatString("", x + 1, "")', 0):
                  ['""', "x + 1", '""'],
              ("x + 1", 0): ["x", "1"]},
         cite=_AST_CITE + ":284-305"),
    # :306-330 — tagged template: raw-parts array block arg1, expression arg2
    dict(name="js-tagged-template-ast", lang="javascript", wrap=False,
         code="x`a ${1+1} b`\n",
         ast={("x`a ${1+1} b`", 0): ["x", "this", "`a ${1+1} b`", "1+1"],
              ("`a ${1+1} b`", 0):
                  ["_tmp_0", "_tmp_0 = __ecma.Array.factory()",
                   '_tmp_0.push("a ")', '_tmp_0.push(" b")']},
         cite=_AST_CITE + ":306-330"),
]

CASES += [
    # :436-465 — object literal: tmp-block with `_tmp_0.key = value`
    # member inits and <operator>.spread(_tmp_0, rest) for `...rest`
    dict(name="js-object-simple-spread", lang="javascript", wrap=False,
         code='var x = {\n key1: "value",\n key2: 2,\n ...rest\n}\n',
         ast={('_tmp_0.key1 = "value"', 0): ["_tmp_0.key1", '"value"'],
              ("_tmp_0.key2 = 2", 0): ["_tmp_0.key2", "2"],
              ("_tmp_0.key1", 0): ["_tmp_0", "key1"],
              ("...rest", 0): ["_tmp_0", "rest"]},
         cite=_AST_CITE + ":436-465"),
    # :467-497 — spread of a call result
    dict(name="js-object-complex-rest", lang="javascript", wrap=False,
         code='var x = {\n key1: "value",\n key2: 2,\n ...x.foo()\n}\n',
         ast={("...x.foo()", 0): ["_tmp_0", "x.foo()"]},
         cite=_AST_CITE + ":467-497"),
    # :498-518 — computed values
    dict(name="js-object-computed-values", lang="javascript", wrap=False,
         code="var x = {\n key1: value(),\n key2: foo.compute()\n}\n",
         ast={("_tmp_0.key1 = value()", 0): ["_tmp_0.key1", "value()"],
              ("_tmp_0.key2 = foo.compute()", 0):
                  ["_tmp_0.key2", "foo.compute()"]},
         cite=_AST_CITE + ":498-518"),
    # :518-539 — object function shorthand inits property with a method
    # ref; bracketed string key becomes an indexAccess init
    dict(name="js-object-function", lang="javascript", wrap=False,
         code='var x = {\n key1: value(),\n ["foo()"]: 1,\n foo() {}\n}\n',
         ast={('_tmp_0["foo()"] = 1', 0): ['_tmp_0["foo()"]', "1"],
              ('_tmp_0["foo()"]', 0): ["_tmp_0", '"foo()"'],
              ("_tmp_0.foo = foo", 0): ["_tmp_0.foo", "foo"]},
         methods=[["foo", "js-object-function.js::program:foo"]],
         cite=_AST_CITE + ":518-539"),
    # :540-556 — computed property name lowers to indexAccess assignment
    dict(name="js-object-computed-key", lang="javascript", wrap=False,
         code="var x = {\n [ 1 + 1 ]: value()\n}\n",
         ast={("_tmp_0[1 + 1] = value()", 0):
                  ["_tmp_0[1 + 1]", "value()"],
              ("_tmp_0[1 + 1]", 0): ["_tmp_0", "1 + 1"]},
         cite=_AST_CITE + ":540-556"),
    # :557-585 — computed object method names become
    # _computed_object_method_<n> methods referenced by the index init
    dict(name="js-object-computed-methods", lang="javascript", wrap=False,
         code=('const obj = {\n  ["someNameComputation()"](node: Node) {\n'
               '    foo(node);\n  },\n  ["someOtherNameComputation()"]'
               '(node: Node) {\n    bar(node);\n  }\n};\n'),
         ast={('_tmp_0["someNameComputation()"] = _computed_object_method_0',
               0): ['_tmp_0["someNameComputation()"]',
                    "_computed_object_method_0"],
              ('_tmp_0["someOtherNameComputation()"] = '
               '_computed_object_method_1', 0):
                  ['_tmp_0["someOtherNameComputation()"]',
                   "_computed_object_method_1"]},
         methods=[
             ["_computed_object_method_0",
              "js-object-computed-methods.js::program:"
              "_computed_object_method_0"],
             ["_computed_object_method_1",
              "js-object-computed-methods.js::program:"
              "_computed_object_method_1"],
         ],
         cite=_AST_CITE + ":557-585"),
]


# --------------------------------------------------------------------------- #
# SimpleAstCreationPassTests.scala:1177-1770 — for-in/for-of lowerings
# (incl. object/array destructuring), labeled statements, the switch
# suite, member-access chains, and misc expression shapes.
# --------------------------------------------------------------------------- #

_ITER_ASSIGN = "_iterator_0 = <operator>.iterator({c})"
_WHILE_CODE = "while (!(_result_0 = _iterator_0.next()).done)"
_NOT_DONE = "!(_result_0 = _iterator_0.next()).done"
_MA_DONE = "(_result_0 = _iterator_0.next()).done"
_RES_ASSIGN = "(_result_0 = _iterator_0.next())"


def _forinof_core(stmt: str, coll: str, names: list[str],
                  body_assigns: list[str], body_block: str) -> dict:
    """Shared facts of checkForInOrOf/...Object/...Array
    (SimpleAstCreationPassTests.scala:1825-2001): loop block locals +
    bare identifiers + iterator assignment + WHILE; while body assigns
    `<name> = _result_0.value[...]` then the user block."""
    ia = _ITER_ASSIGN.format(c=coll)
    ast = {
        (stmt, 0): ["_iterator_0", "_result_0", *names, ia, _WHILE_CODE],
        (ia, 0): ["_iterator_0", f"<operator>.iterator({coll})"],
        (f"<operator>.iterator({coll})", 0): [coll],
        (_WHILE_CODE, 0): [_NOT_DONE, stmt],
        (_NOT_DONE, 0): [_MA_DONE],
        (_MA_DONE, 0): [_RES_ASSIGN, "done"],
        (_RES_ASSIGN, 0): ["_result_0", "_iterator_0.next()"],
        (stmt, 1): [*body_assigns, body_block],
    }
    locals_ = [(":program._iterator_0", "_iterator_0|ANY"),
               (":program._result_0", "_result_0|ANY")] + \
              [(f":program.{n}", f"{n}|ANY") for n in names]
    return dict(ast=ast, locals=locals_)


def _forinof_obj_case(name: str, decl: bool, cite: str) -> dict:
    pat = "var {a, b, c}" if decl else "{a, b, c}"
    stmt = "for(%s of obj) {\n   foo(a, b, c)\n}" % pat
    core = _forinof_core(
        stmt, "obj", ["a", "b", "c"],
        ["a = _result_0.value.a", "b = _result_0.value.b",
         "c = _result_0.value.c"],
        "{\n   foo(a, b, c)\n}")
    core["ast"][("a = _result_0.value.a", 0)] = ["a", "_result_0.value.a"]
    core["ast"][("{\n   foo(a, b, c)\n}", 0)] = ["foo(a, b, c)"]
    return dict(name=name, lang="javascript", wrap=False,
                code=stmt + "\n", cite=_AST_CITE + cite, **core)


def _forinof_arr_case(name: str, decl: bool, cite: str) -> dict:
    pat = "var [a, b, c]" if decl else "[a, b, c]"
    stmt = "for(%s of arr) {\n   foo(a, b, c)\n}" % pat
    core = _forinof_core(
        stmt, "arr", ["a", "b", "c"],
        ["a = _result_0.value[0]", "b = _result_0.value[1]",
         "c = _result_0.value[2]"],
        "{\n   foo(a, b, c)\n}")
    core["ast"][("a = _result_0.value[0]", 0)] = ["a", "_result_0.value[0]"]
    core["ast"][("{\n   foo(a, b, c)\n}", 0)] = ["foo(a, b, c)"]
    return dict(name=name, lang="javascript", wrap=False,
                code=stmt + "\n", cite=_AST_CITE + cite, **core)


def _forinof_plain_case(name: str, kw: str, decl: bool, cite: str) -> dict:
    pat = ("var i" if decl else "i")
    stmt = "for (%s %s arr) {\n   foo(i)\n}" % (pat, kw)
    core = _forinof_core(stmt, "arr", ["i"], ["i = _result_0.value"],
                         "{\n   foo(i)\n}")
    core["ast"][("i = _result_0.value", 0)] = ["i", "_result_0.value"]
    core["ast"][("{\n   foo(i)\n}", 0)] = ["foo(i)"]
    return dict(name=name, lang="javascript", wrap=False,
                code=stmt + "\n", cite=_AST_CITE + cite, **core)


CASES += [
    _forinof_obj_case("js-for-of-obj-destruct", True, ":1177-1187"),
    _forinof_obj_case("js-for-of-obj-destruct-nodecl", False, ":1189-1199"),
    _forinof_arr_case("js-for-of-arr-destruct", True, ":1201-1211"),
    _forinof_arr_case("js-for-of-arr-destruct-nodecl", False, ":1213-1223"),
    _forinof_plain_case("js-for-in-iterlower", "in", True, ":1225-1235"),
    _forinof_plain_case("js-for-in-nodecl", "in", False, ":1237-1247"),
    _forinof_plain_case("js-for-of-iterlower", "of", True, ":1249-1259"),
    _forinof_plain_case("js-for-of-nodecl", "of", False, ":1261-1271"),
    # :1273-1283 — for(;;){}: condition literal `true`, empty body block
    dict(name="js-for-empty-test", lang="javascript", wrap=False,
         code="for(;;){}",
         ast={("for", 0): ["true", "<empty>"]},
         cite=_AST_CITE + ":1273-1283"),
    # :1285-1322 — classic 3-clause for: init/cond/update calls + block
    dict(name="js-for-loop", lang="javascript", wrap=False,
         code="function method(x,y) {\n  for (x = 0; x < 1; x += 1) {\n"
              "    z = 0;\n  }\n}\n",
         ast={("for", 0): ["x = 0", "x < 1", "x += 1", "<empty>"],
              ("x = 0", 0): ["x", "0"],
              ("x < 1", 0): ["x", "1"],
              ("x += 1", 0): ["x", "1"],
              ("<empty>", 2): ["z = 0"]},
         params=[("method.this", "0:ANY:BY_VALUE"),
                 ("method.x", "1:ANY:BY_SHARING"),
                 ("method.y", "2:ANY:BY_SHARING")],
         cite=_AST_CITE + ":1285-1322"),
    # :1326-1347 — labeled loops: JUMP_TARGET nodes `loop1:`/`loop2:`,
    # CONTINUE control structure with code `continue loop1;`
    dict(name="js-labeled-continue-ast", lang="javascript", wrap=False,
         code='var i, j;\nloop1: for (i = 0; i < 3; i++) {\n'
              '   loop2: for (j = 0; j < 3; j++) {\n'
              '      if (i === 1 && j === 1) {\n         continue loop1;\n'
              '      }\n      console.log("i = " + i + ", j = " + j);\n'
              '   }\n}\n',
         ast={("<empty>", 0): ["i", "j", "loop1:", "for", "console"],
              ("<empty>", 1): ["loop2:", "for"]},
         cs=[(":program:FOR", "for"),
             (":program:IF", "if (i === 1 && j === 1)"),
             (":program:CONTINUE", "continue loop1;")],
         cite=_AST_CITE + ":1326-1347"),
]

# switch suite (:1350-1574) — JUMP_TARGET labels + case exprs + case-body
# statements are FLAT children of the one switch BLOCK
CASES += [
    dict(name="js-switch-one-case-ast", lang="javascript", wrap=False,
         code="switch (x) { case 1: y; }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["case 1:", "1", "y"]},
         cs=[(":program:SWITCH", "switch (x)")],
         cite=_AST_CITE + ":1351-1370"),
    dict(name="js-switch-multi-cases", lang="javascript", wrap=False,
         code="switch (x) { case 1: y; case 2: z; }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["case 1:", "1", "y", "case 2:", "2", "z"]},
         cite=_AST_CITE + ":1372-1401"),
    dict(name="js-switch-same-spot", lang="javascript", wrap=False,
         code="switch (x) { case 1: case 2: y; }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["case 1:", "1", "case 2:", "2", "y"]},
         cite=_AST_CITE + ":1403-1430"),
    dict(name="js-switch-multi-same-spot", lang="javascript", wrap=False,
         code="switch (x) { case 1: case 2: y; case 3: z; }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["case 1:", "1", "case 2:", "2", "y",
                               "case 3:", "3", "z"]},
         cite=_AST_CITE + ":1432-1472"),
    dict(name="js-switch-default-ast", lang="javascript", wrap=False,
         code="switch (x) { default: y; }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["default:", "y"]},
         cite=_AST_CITE + ":1474-1494"),
    dict(name="js-switch-case-default", lang="javascript", wrap=False,
         code="switch (x) { case 1: y; break; default: z; }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["case 1:", "1", "y", "break;",
                               "default:", "z"]},
         cs=[(":program:SWITCH", "switch (x)"),
             (":program:BREAK", "break;")],
         cite=_AST_CITE + ":1496-1527"),
    dict(name="js-switch-nested", lang="javascript", wrap=False,
         code="switch (x) { default: switch(y) { default: z; } }",
         ast={("switch (x)", 0): ["x", "<empty>"],
              ("<empty>", 1): ["default:", "switch (y)"],
              ("switch (y)", 0): ["y", "<empty>"],
              ("<empty>", 2): ["default:", "z"]},
         cite=_AST_CITE + ":1529-1559"),
    # :1561-1574 — lambda as switch scrutinee: METHOD_REF code = lambda name
    dict(name="js-switch-lambda", lang="javascript", wrap=False,
         code='switch ((x) => "") { }\n',
         ast={('switch ((x) => "")', 0): ["<lambda>0", "<empty>"]},
         methods=[[":program", "js-switch-lambda.js::program"],
                  ["<lambda>0", "js-switch-lambda.js::program:<lambda>0"]],
         cite=_AST_CITE + ":1561-1574"),
]

CASES += [
    # :1577-1591 — logicalAnd over two literals
    dict(name="js-logical-and", lang="javascript", wrap=False,
         code="function method(x) {\n  true && false;\n}\n",
         ast={("true && false", 0): ["true", "false"]},
         cite=_AST_CITE + ":1577-1591"),
    # :1593-1605 — prefix increment keeps its operand identifier
    dict(name="js-unary-inc", lang="javascript", wrap=False,
         code="function method(x) {\n  ++x;\n}\n",
         ast={("++x", 0): ["x"]},
         cite=_AST_CITE + ":1593-1605"),
    # :1607-1631 — z = x.a: assignment of a fieldAccess
    dict(name="js-member-assign-direct", lang="javascript", wrap=False,
         code="function method(x) {\n  z = x.a;\n}\n",
         ast={("z = x.a", 0): ["z", "x.a"],
              ("x.a", 0): ["x", "a"]},
         cite=_AST_CITE + ":1607-1631"),
    # :1633-1667 — chained member access nests fieldAccess calls
    dict(name="js-member-assign-chained-ast", lang="javascript", wrap=False,
         code="function method(x) {\n  z = x.a.b.c;\n}\n",
         ast={("z = x.a.b.c", 0): ["z", "x.a.b.c"],
              ("x.a.b.c", 0): ["x.a.b", "c"],
              ("x.a.b", 0): ["x.a", "b"],
              ("x.a", 0): ["x", "a"]},
         cite=_AST_CITE + ":1633-1667"),
    # :1669-1712 — chained member call: receiver snapshot through _tmp_0
    dict(name="js-member-assign-chained-call", lang="javascript",
         wrap=False,
         code="function method(x) {\n  z = x.a.b.c();\n}\n",
         ast={("z = x.a.b.c()", 0): ["z", "x.a.b.c()"],
              ("x.a.b.c()", 0): ["(_tmp_0 = x.a.b).c", "_tmp_0"],
              ("(_tmp_0 = x.a.b).c", 0): ["(_tmp_0 = x.a.b)", "c"],
              ("(_tmp_0 = x.a.b)", 0): ["_tmp_0", "x.a.b"],
              ("x.a.b", 0): ["x.a", "b"],
              ("x.a", 0): ["x", "a"]},
         cite=_AST_CITE + ":1669-1712"),
    # :1714-1732 — member access under RETURN
    dict(name="js-member-as-return", lang="javascript", wrap=False,
         code="function method(x) {\n  return x.a;\n}",
         ast={("return x.a", 0): ["x.a"],
              ("x.a", 0): ["x", "a"]},
         cite=_AST_CITE + ":1714-1732"),
    # :1734-1743 — function expression under RETURN: METHOD_REF code = name
    dict(name="js-function-as-return", lang="javascript", wrap=False,
         code="function method(x) {\n  return function foo() {};\n}\n",
         ast={("return function foo() {}", 0): ["foo"]},
         methods=[["method", "js-function-as-return.js::program:method"],
                  ["foo", "js-function-as-return.js::program:method:foo"],
                  [":program", "js-function-as-return.js::program"]],
         cite=_AST_CITE + ":1734-1743"),
    # :1745-1761 — bare member access statement
    dict(name="js-member-useless-stmt", lang="javascript", wrap=False,
         code="function method(x) {\n  x.a;\n}\n",
         ast={("x.a", 0): ["x", "a"]},
         cite=_AST_CITE + ":1745-1761"),
    # :1763-1769 — empty method still has BLOCK + METHOD_RETURN "RET"
    dict(name="js-empty-method", lang="javascript", wrap=False,
         code="function method() {}",
         ast={("method", 0, "METHOD"): ["this", "<empty>", "RET", "method"]},
         cite=_AST_CITE + ":1763-1769"),
]


# --------------------------------------------------------------------------- #
# MixedAstCreationPassTests.scala — "AST variable scoping and linking"
# (:44-196): identifier.refOut positions. The `refs` obj spells
# `<local code>&<parent's plain subject key>` so `<empty>@0` is the method
# block and `<empty>@1` the nested block. "closure binding (single
# variable)" (:242-267) is covered through `captures` + the foo-block
# local placement; the reference's per-level shadow-local chain is
# intentionally collapsed to direct capture edges in this engine.
# --------------------------------------------------------------------------- #
_MIX_CITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/ast/"
             "MixedAstCreationPassTests.scala")

CASES += [
    dict(name="js-scope-local-var", lang="javascript", wrap=False,
         code="var x;\nx = 1;\n",
         refs={("x", 0): ["x&<empty>@0"]},
         cite=_MIX_CITE + ":44-56"),
    dict(name="js-scope-local-let", lang="javascript", wrap=False,
         code="let x;\nx = 1;\n",
         refs={("x", 0): ["x&<empty>@0"]},
         cite=_MIX_CITE + ":58-70"),
    dict(name="js-scope-undeclared", lang="javascript", wrap=False,
         code="x = 1;\n",
         refs={("x", 0): ["x&<empty>@0"]},
         locals=[(":program.x", "x|ANY")],
         cite=_MIX_CITE + ":72-81"),
    dict(name="js-scope-undeclared-2refs", lang="javascript", wrap=False,
         code="x = 1;\nx = 2;\n",
         refs={("x", 0): ["x&<empty>@0"], ("x", 1): ["x&<empty>@0"]},
         locals=[(":program.x", "x|ANY")],
         cite=_MIX_CITE + ":83-100"),
    # undeclared in nested block -> local in METHOD block
    dict(name="js-scope-undeclared-in-block", lang="javascript", wrap=False,
         code="{ x = 1; }\n",
         refs={("x", 0): ["x&<empty>@0"]},
         cite=_MIX_CITE + ":102-112"),
    # `var` in nested block is function-visible; the LOCAL stays nested
    dict(name="js-scope-var-in-block", lang="javascript", wrap=False,
         code="{ var x; }\nx = 1;\n",
         refs={("x", 0): ["x&<empty>@1"]},
         cite=_MIX_CITE + ":114-127"),
    dict(name="js-scope-post-declared-var", lang="javascript", wrap=False,
         code="x = 1;\nvar x;\n",
         refs={("x", 0): ["x&<empty>@0"]},
         cite=_MIX_CITE + ":129-141"),
    dict(name="js-scope-post-var-in-block", lang="javascript", wrap=False,
         code="x = 1;\n{ var x; }\n",
         refs={("x", 0): ["x&<empty>@1"]},
         cite=_MIX_CITE + ":143-156"),
    dict(name="js-scope-nested-let-access", lang="javascript", wrap=False,
         code="let x;\n{ x = 1; }\n",
         refs={("x", 0): ["x&<empty>@0"]},
         cite=_MIX_CITE + ":158-171"),
    dict(name="js-scope-shadowing-let", lang="javascript", wrap=False,
         code="let x;\n{\n  let x;\n  x = 1;\n}\nx = 1;\n",
         refs={("x", 0): ["x&<empty>@1"], ("x", 1): ["x&<empty>@0"]},
         cite=_MIX_CITE + ":173-196"),
    # :242-267 — undeclared assignment in foo synthesizes foo-block local;
    # inner bar's use captures it
    dict(name="js-closure-single-var", lang="javascript", wrap=False,
         code="function foo() {\n  x = 1;\n  function bar() {\n"
              "    x = 2;\n  }\n}\n",
         refs={("x", 0): ["x&<empty>@1"], ("x", 1): ["x&<empty>@1"]},
         captures=[("bar", "x")],
         locals=[("foo.x", "x|ANY"), ("foo.bar", f"bar|js-closure-single-var"
                 ".js::program:foo:bar")],
         cite=_MIX_CITE + ":242-267"),
    # :269-311 — two captured variables
    dict(name="js-closure-two-vars", lang="javascript", wrap=False,
         code="function foo() {\n  x = 1;\n  y = 1;\n  function bar() {\n"
              "    x = 2;\n    y = 2;\n  }\n}\n",
         captures=[("bar", "x"), ("bar", "y")],
         cite=_MIX_CITE + ":269-311"),
]


# --------------------------------------------------------------------------- #
# MixedAstCreationPassTests.scala — destructuring-assignment TREE structure
# (:569-1208; the succ-chains are covered by the js-destr-* CFG cases
# above) plus spread arguments, await, instanceof, delete.
# --------------------------------------------------------------------------- #

def _destr_ast(blk: str, pairs: list[tuple[str, str]], rhs: str = "x"):
    """ast facts of a destruction block: tmp local + `_tmp_0 = <rhs>` +
    per-element `tgt = acc` assignments + tmp value identifier."""
    ast = {(blk, 0): ["_tmp_0", f"_tmp_0 = {rhs}"]
           + [t for p in pairs for t in (p[0], f"{p[0]} = {p[1]}")],
           (f"_tmp_0 = {rhs}", 0): ["_tmp_0", rhs]}
    for tgt, acc in pairs:
        ast[(f"{tgt} = {acc}", 0)] = [tgt, acc]
    return ast


CASES += [
    # :569-604 — declaration form
    dict(name="js-destr-obj-decl-ast", lang="javascript", wrap=False,
         code="var {a, b} = x;",
         ast={**_destr_ast("var {a, b} = x",
                           [("a", "_tmp_0.a"), ("b", "_tmp_0.b")]),
              ("_tmp_0.a", 0): ["_tmp_0", "a"],
              ("_tmp_0.b", 0): ["_tmp_0", "b"]},
         locals=[(":program._tmp_0", "_tmp_0|ANY"),
                 (":program.a", "a|ANY"), (":program.b", "b|ANY"),
                 (":program.x", "x|ANY")],
         cite=_MIX_CITE + ":569-604"),
    # :606-635 — ternary init keeps the full conditional as assign RHS
    dict(name="js-destr-obj-ternary-ast", lang="javascript", wrap=False,
         code="const { a, b } = test() ? foo() : bar();",
         ast=_destr_ast("const { a, b } = test() ? foo() : bar()",
                        [("a", "_tmp_0.a"), ("b", "_tmp_0.b")],
                        rhs="test() ? foo() : bar()"),
         cite=_MIX_CITE + ":606-635"),
    # :637-666 — parenthesized non-declaration form, same lowering
    dict(name="js-destr-obj-nodecl", lang="javascript", wrap=False,
         code="({a, b} = x);",
         ast={**_destr_ast("({a, b} = x)",
                           [("a", "_tmp_0.a"), ("b", "_tmp_0.b")]),
              ("_tmp_0.a", 0): ["_tmp_0", "a"]},
         cite=_MIX_CITE + ":637-666"),
    # :668-719 — defaults become `=== void 0 ?:` conditionals
    dict(name="js-destr-obj-defaults-ast", lang="javascript", wrap=False,
         code="var {a = 1, b = 2} = x;",
         ast={("var {a = 1, b = 2} = x", 0):
                  ["_tmp_0", "_tmp_0 = x",
                   "a", "a = _tmp_0.a === void 0 ? 1 : _tmp_0.a",
                   "b", "b = _tmp_0.b === void 0 ? 2 : _tmp_0.b"],
              ("a = _tmp_0.a === void 0 ? 1 : _tmp_0.a", 0):
                  ["a", "_tmp_0.a === void 0 ? 1 : _tmp_0.a"],
              ("_tmp_0.a === void 0 ? 1 : _tmp_0.a", 0):
                  ["_tmp_0.a === void 0", "1", "_tmp_0.a"],
              ("_tmp_0.a === void 0", 0): ["_tmp_0.a", "void 0"]},
         cite=_MIX_CITE + ":668-719"),
    # :721-750 — key renames read the key, assign the target
    dict(name="js-destr-obj-reassign-ast", lang="javascript", wrap=False,
         code="var {a: n, b: m} = x;",
         ast={**_destr_ast("var {a: n, b: m} = x",
                           [("n", "_tmp_0.a"), ("m", "_tmp_0.b")]),
              ("_tmp_0.a", 0): ["_tmp_0", "a"]},
         cite=_MIX_CITE + ":721-750"),
    # :867-897 — object rest: <operator>.spread(_tmp_0, rest)
    dict(name="js-destr-obj-rest-ast", lang="javascript", wrap=False,
         code="var {a, ...rest} = x;",
         ast={("var {a, ...rest} = x", 0):
                  ["_tmp_0", "_tmp_0 = x", "a", "a = _tmp_0.a",
                   "rest", "...rest"],
              ("...rest", 0): ["_tmp_0", "rest"]},
         cite=_MIX_CITE + ":867-897"),
    # :899-919 — computed property name reads `_tmp_0.<keyExpr>`
    dict(name="js-destr-obj-computed-ast", lang="javascript", wrap=False,
         code="var {[propName]: n} = x;",
         ast={**_destr_ast("var {[propName]: n} = x",
                           [("n", "_tmp_0.propName")]),
              ("_tmp_0.propName", 0): ["_tmp_0", "propName"]},
         cite=_MIX_CITE + ":899-919"),
    # :835-865 — destructuring assignment as a call argument: the
    # destruction BLOCK hangs under the call
    dict(name="js-destr-call-arg", lang="javascript", wrap=False,
         code="foo({a, b} = x);",
         ast={("foo({a, b} = x)", 0): ["foo", "this", "{a, b} = x"],
              **_destr_ast("{a, b} = x",
                           [("a", "_tmp_0.a"), ("b", "_tmp_0.b")])},
         cite=_MIX_CITE + ":835-865"),
    # :973-1003 / :1005-1034 — array declaration + paren-free forms
    dict(name="js-destr-arr-decl-ast", lang="javascript", wrap=False,
         code="var [a, b] = x;",
         ast={**_destr_ast("var [a, b] = x",
                           [("a", "_tmp_0[0]"), ("b", "_tmp_0[1]")]),
              ("_tmp_0[0]", 0): ["_tmp_0", "0"],
              ("_tmp_0[1]", 0): ["_tmp_0", "1"]},
         cite=_MIX_CITE + ":973-1003"),
    dict(name="js-destr-arr-nodecl", lang="javascript", wrap=False,
         code="([a, b] = x);",
         ast=_destr_ast("([a, b] = x)",
                        [("a", "_tmp_0[0]"), ("b", "_tmp_0[1]")]),
         cite=_MIX_CITE + ":1005-1034"),
    # :1036-1088 — array defaults
    dict(name="js-destr-arr-defaults-ast", lang="javascript", wrap=False,
         code="var [a = 1, b = 2] = x;",
         ast={("a = _tmp_0[0] === void 0 ? 1 : _tmp_0[0]", 0):
                  ["a", "_tmp_0[0] === void 0 ? 1 : _tmp_0[0]"],
              ("_tmp_0[0] === void 0 ? 1 : _tmp_0[0]", 0):
                  ["_tmp_0[0] === void 0", "1", "_tmp_0[0]"],
              ("_tmp_0[0] === void 0", 0): ["_tmp_0[0]", "void 0"]},
         cite=_MIX_CITE + ":1036-1088"),
    # :1090-1119 — holes advance the element index
    dict(name="js-destr-arr-ignores-ast", lang="javascript", wrap=False,
         code="var [a, , b] = x;",
         ast=_destr_ast("var [a, , b] = x",
                        [("a", "_tmp_0[0]"), ("b", "_tmp_0[2]")]),
         cite=_MIX_CITE + ":1090-1119"),
    # :1121-1154 — array rest spreads the index access at rest position
    dict(name="js-destr-arr-rest-ast", lang="javascript", wrap=False,
         code="var [a, ...rest] = x;",
         ast={("...rest", 0): ["_tmp_0[1]", "rest"],
              ("_tmp_0[1]", 0): ["_tmp_0", "1"]},
         cite=_MIX_CITE + ":1121-1154"),
    # :1156-1167 — array pattern parameter: `param1_0` + field read by name
    dict(name="js-destr-arr-param-ast", lang="javascript", wrap=False,
         code="function userId([id]) {\n  return id;\n}\n",
         params=[("userId.this", "0:ANY:BY_VALUE"),
                 ("userId.param1_0", "1:ANY:BY_SHARING")],
         ast={("id = param1_0.id", 0): ["id", "param1_0.id"],
              ("param1_0.id", 0): ["param1_0", "id"]},
         locals=[("userId.id", "id|ANY")],
         cite=_MIX_CITE + ":1156-1167"),
    # :955-971 — object pattern parameter lowering
    dict(name="js-destr-obj-param-ast", lang="javascript", wrap=False,
         code="function userId({id}) {\n  return id;\n}\n",
         ast={("id = param1_0.id", 0): ["id", "param1_0.id"],
              ("param1_0.id", 0): ["param1_0", "id"]},
         locals=[("userId.id", "id|ANY")],
         cite=_MIX_CITE + ":955-971"),
    # :823-833 — mixed pattern + plain parameters keep their indices
    dict(name="js-destr-obj-param-mixed", lang="javascript", wrap=False,
         code="function foo({ a }, b) {};",
         params=[("foo.this", "0:ANY:BY_VALUE"),
                 ("foo.param1_0", "1:ANY:BY_SHARING"),
                 ("foo.b", "2:ANY:BY_SHARING")],
         cite=_MIX_CITE + ":823-833"),
    # :1169-1186 — spread call argument
    dict(name="js-spread-arg-ast", lang="javascript", wrap=False,
         code="foo(...args)",
         ast={("foo(...args)", 0): ["foo", "this", "...args"],
              ("...args", 0): ["args"]},
         cite=_MIX_CITE + ":1169-1186"),
    # :1188-1208 — spread of a call result
    dict(name="js-spread-arg-complex", lang="javascript", wrap=False,
         code="foo(...x.bar());",
         ast={("foo(...x.bar())", 0): ["foo", "this", "...x.bar()"],
              ("...x.bar()", 0): ["x.bar()"]},
         cite=_MIX_CITE + ":1188-1208"),
    # :1211-1219 — await lowers to <operator>.await around the call
    dict(name="js-await-async", lang="javascript", wrap=False,
         code="async function x(foo) { await foo() }",
         ast={("await foo()", 0): ["foo()"]},
         cite=_MIX_CITE + ":1211-1219"),
    # :1222-1238 / :1240-1250 — instanceOf and delete operators
    dict(name="js-instanceof-ast", lang="javascript", wrap=False,
         code="x instanceof Foo;",
         ast={("x instanceof Foo", 0): ["x", "Foo"]},
         cite=_MIX_CITE + ":1222-1238"),
    dict(name="js-delete-ast", lang="javascript", wrap=False,
         code="delete foo.x;",
         ast={("delete foo.x", 0): ["foo.x"],
              ("foo.x", 0): ["foo", "x"]},
         cite=_MIX_CITE + ":1240-1250"),
]

CASES += [
    # :29-40 — constructor fullnames use <init> under the class scope;
    # anonymous classes get <anon-class>N
    dict(name="js-ctor-fullname", lang="javascript", wrap=False,
         code="class X { constructor(){} }",
         methods=[[":program", "js-ctor-fullname.js::program"],
                  ["<init>", "js-ctor-fullname.js::program:X:<init>"]],
         cite=_MIX_CITE + ":29-34"),
    dict(name="js-anon-class-ctor-fullname", lang="javascript", wrap=False,
         code="var x = class { constructor(y) {} };",
         methods=[[":program", "js-anon-class-ctor-fullname.js::program"],
                  ["<init>", "js-anon-class-ctor-fullname.js::program:"
                             "<anon-class>0:<init>"]],
         cite=_MIX_CITE + ":35-41"),
    # :524-550 — function-name local typed with the function fullname;
    # `var l = source(3)` keeps declaration code on the assignment
    dict(name="js-fragment-call", lang="javascript", wrap=False,
         code="function source(a) { return a; }\nvar l = source(3);\n",
         ast={("var l = source(3)", 0): ["l", "source(3)"],
              ("source(3)", 0): ["source", "this", "3"],
              ("return a", 0): ["a"]},
         params=[("source.this", "0:ANY:BY_VALUE"),
                 ("source.a", "1:ANY:BY_SHARING")],
         locals=[(":program.source",
                  "source|js-fragment-call.js::program:source"),
                 (":program.l", "l|ANY")],
         cite=_MIX_CITE + ":524-550"),
    # :552-566 — rows[0].solution nests indexAccess under fieldAccess
    dict(name="js-fragment-array-access", lang="javascript", wrap=False,
         code="result = rows[0].solution;",
         ast={("result = rows[0].solution", 0):
                  ["result", "rows[0].solution"],
              ("rows[0].solution", 0): ["rows[0]", "solution"],
              ("rows[0]", 0): ["rows", "0"]},
         cite=_MIX_CITE + ":552-566"),
]

CASES += [
    # :921-953 — whole-pattern default + nested element defaults chain
    # through `param1_0 === void 0 ? {} : param1_0` into `_tmp_1`
    dict(name="js-destr-param-nested-defaults-ast", lang="javascript",
         wrap=False,
         code="function userId({id = {}, b} = {}) {\n  return id;\n}\n",
         params=[("userId.this", "0:ANY:BY_VALUE"),
                 ("userId.param1_0", "1:ANY:BY_SHARING")],
         ast={("{id = {}, b} = {}", 0):
                  ["_tmp_1", "_tmp_1 = param1_0 === void 0 ? {} : param1_0",
                   "id", "id = _tmp_1.id === void 0 ? {} : _tmp_1.id",
                   "b", "b = _tmp_1.b"],
              ("_tmp_1 = param1_0 === void 0 ? {} : param1_0", 0):
                  ["_tmp_1", "param1_0 === void 0 ? {} : param1_0"],
              ("param1_0 === void 0 ? {} : param1_0", 0):
                  ["param1_0 === void 0", "{}", "param1_0"],
              ("id = _tmp_1.id === void 0 ? {} : _tmp_1.id", 0):
                  ["id", "_tmp_1.id === void 0 ? {} : _tmp_1.id"],
              ("b = _tmp_1.b", 0): ["b", "_tmp_1.b"]},
         cite=_MIX_CITE + ":921-953"),
]


# --------------------------------------------------------------------------- #
# jssrc ControlStructureTests.scala — body-edge wiring (TRUE_BODY /
# FALSE_BODY / DO_BODY / FOR_INIT / FOR_UPDATE / FOR_BODY / TRY_BODY /
# CATCH_BODY / FINALLY_BODY) via the `roledge` relation.
# --------------------------------------------------------------------------- #
_CST_CITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/ast/"
             "ControlStructureTests.scala")

CASES += [
    dict(name="js-cst-if-else", lang="javascript", wrap=False,
         code="function method(x) {\n  if (x > 0) {\n    y = 0;\n"
              "  } else {\n    y = 1;\n  }\n}\n",
         roledge={("if (x > 0)", 0):
                  ["CONDITION:x > 0", "TRUE_BODY:<empty>",
                   "FALSE_BODY:<empty>"]},
         cite=_CST_CITE + ":10-27"),
    # else-if hangs the second IF directly off the first's FALSE_BODY
    dict(name="js-cst-if-elseif-else", lang="javascript", wrap=False,
         code="function method(c) {\n  if (c > 10) {\n    c -= 10;\n"
              "  } else if (c < 10) {\n    c += 10;\n  } else {\n"
              "    c = 10;\n  }\n}\n",
         roledge={("if (c > 10)", 0):
                  ["CONDITION:c > 10", "TRUE_BODY:<empty>",
                   "FALSE_BODY:if (c < 10)"],
                  ("if (c < 10)", 0):
                  ["CONDITION:c < 10", "TRUE_BODY:<empty>",
                   "FALSE_BODY:<empty>"]},
         ast={("if (c > 10)", 0): ["c > 10", "<empty>", "if (c < 10)"]},
         cite=_CST_CITE + ":29-53"),
    dict(name="js-cst-if-no-else", lang="javascript", wrap=False,
         code="function method(x) {\n  if (x > 0) {\n    y = 0;\n  }\n}\n",
         roledge={("if (x > 0)", 0):
                  ["CONDITION:x > 0", "TRUE_BODY:<empty>"]},
         cite=_CST_CITE + ":54-68"),
    dict(name="js-cst-do-while", lang="javascript", wrap=False,
         code="function method(c) {\n  do {\n    c += 1;\n"
              "  } while (c < 10);\n}\n",
         roledge={("do", 0): ["CONDITION:c < 10", "DO_BODY:<empty>"]},
         ast={("do", 0): ["c < 10", "<empty>"],
              ("<empty>", 2): ["c += 1"]},
         cite=_CST_CITE + ":70-83"),
    dict(name="js-cst-for-edges", lang="javascript", wrap=False,
         code="function method(c) {\n  for (var i = 0; i < c; i++) {\n"
              "    sink(i);\n  }\n}\n",
         roledge={("for", 0): ["FOR_INIT:var i = 0", "CONDITION:i < c",
                               "FOR_UPDATE:i++", "FOR_BODY:<empty>"]},
         ast={("var i = 0", 0): ["i", "0"],
              ("<empty>", 2): ["sink(i)"]},
         cite=_CST_CITE + ":85-101"),
    # for(;;): no init/update edges; condition synthesized literal `true`
    dict(name="js-cst-for-empty-clauses", lang="javascript", wrap=False,
         code="for(;;){ sink(); }",
         roledge={("for", 0): ["CONDITION:true", "FOR_BODY:<empty>"]},
         ast={("<empty>", 1): ["sink()"]},
         cite=_CST_CITE + ":103-113"),
    dict(name="js-cst-try-catch-finally", lang="javascript", wrap=False,
         code="function method(c) {\n  try {\n    sink(c);\n"
              "  } catch (e) {\n    sinkCatch(e);\n  } finally {\n"
              "    sinkFinally();\n  }\n}\n",
         roledge={("try", 0): ["TRY_BODY:<empty>", "CATCH_BODY:catch",
                               "FINALLY_BODY:finally"]},
         cite=_CST_CITE + ":115-139"),
    dict(name="js-cst-try-finally", lang="javascript", wrap=False,
         code="function method() {\n  try {\n    sink();\n  } finally {\n"
              "    sinkFinally();\n  }\n}\n",
         roledge={("try", 0): ["TRY_BODY:<empty>",
                               "FINALLY_BODY:finally"]},
         cite=_CST_CITE + ":141-157"),
    dict(name="js-cst-while-no-body", lang="javascript", wrap=False,
         code="function method() {\n  while (true);\n  foo();\n}\n",
         roledge={("while (true)", 0):
                  ["CONDITION:true", "TRUE_BODY:<empty>"]},
         cite=_CST_CITE + ":159-170"),
]


# --------------------------------------------------------------------------- #
# JsClassesAstCreationPassTests.scala — class member/ctor/new structure.
# --------------------------------------------------------------------------- #
_JSC_CITE = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/ast/"
             "JsClassesAstCreationPassTests.scala")

CASES += [
    # :36-39 — TYPE_DECL for a named class expression
    dict(name="js-class-typedecl", lang="javascript", wrap=False,
         code="var x = class ClassA {}",
         ast={("var x = class ClassA {}", 0): ["x", "class ClassA"]},
         methods=[[":program", "js-class-typedecl.js::program"],
                  ["<init>", "js-class-typedecl.js::program:ClassA:<init>"]],
         cite=_JSC_CITE + ":36-39"),
    # :41-52 — class statement emits `ClassA = <constructor ref>`
    dict(name="js-class-synthetic-assign", lang="javascript", wrap=False,
         code="class ClassA {}",
         ast={("ClassA = class ClassA", 0): ["ClassA", "constructor() {}"]},
         cite=_JSC_CITE + ":41-52"),
    # :53-66 — `new A()` inside a function captures the class local
    dict(name="js-class-implicit-capture", lang="javascript", wrap=False,
         code="class A {}\nfunction b() {\n  new A();\n}",
         captures=[("b", "A")],
         cite=_JSC_CITE + ":53-66"),
    # :67-81 — static method fullname under the class
    dict(name="js-class-static-method", lang="javascript", wrap=False,
         code="var x = class ClassA {\n  static staticFoo() {}\n}",
         methods=[
             [":program", "js-class-static-method.js::program"],
             ["<init>", "js-class-static-method.js::program:ClassA:<init>"],
             ["staticFoo",
              "js-class-static-method.js::program:ClassA:staticFoo"]],
         cite=_JSC_CITE + ":67-81"),
    # :82-99 — computed method name becomes `Symbol.iterator`
    dict(name="js-class-computed-method", lang="javascript", wrap=False,
         code="class ClassA {\n  foo() {}\n  [Symbol.iterator]() {}\n}",
         methods=[
             [":program", "js-class-computed-method.js::program"],
             ["<init>", "js-class-computed-method.js::program:ClassA:<init>"],
             ["foo", "js-class-computed-method.js::program:ClassA:foo"],
             ["Symbol.iterator", "js-class-computed-method.js::program:"
                                 "ClassA:Symbol.iterator"]],
         cite=_JSC_CITE + ":82-99"),
    # :101-157 — field inits move to ctor / <clinit>; dynamic this.X
    # members register; chained this.f.g does NOT
    dict(name="js-class-member-init", lang="javascript", wrap=False,
         code='class ClassA {\n  a = 1\n  b = "foo"\n  static c = true\n'
              '  static d\n  static {\n    this.d = false\n  }\n'
              '  constructor(param1, param2) {\n    this.e = param1;\n'
              '    this.f = param2;\n    this.f.g = param2;\n  }\n}',
         members=[("ClassA.a", "ANY"), ("ClassA.b", "ANY"),
                  ("ClassA.c", "ANY"), ("ClassA.d", "ANY"),
                  ("ClassA.e", "ANY"), ("ClassA.f", "ANY")],
         membercode=[("ClassA.a", "a = 1"), ("ClassA.b", 'b = "foo"'),
                     ("ClassA.c", "static c = true"),
                     ("ClassA.d", "static d"),
                     ("ClassA.e", "this.e = param1"),
                     ("ClassA.f", "this.f = param2")],
         methods=[
             [":program", "js-class-member-init.js::program"],
             ["<init>", "js-class-member-init.js::program:ClassA:<init>"],
             ["<clinit>",
              "js-class-member-init.js::program:ClassA:<clinit>"]],
         ast={("<empty>", 1): ["a = 1", 'b = "foo"', "this.e = param1",
                               "this.f = param2", "this.f.g = param2"],
              ("<empty>", 2): ["static c = true", "this.d = false"]},
         cite=_JSC_CITE + ":101-157"),
    # :187-222 / :224-271 / :273-312 — new-expression lowering
    dict(name="js-new-simple-ast", lang="javascript", wrap=False,
         code="new MyClass();",
         ast={("new MyClass()", 0, "BLOCK"):
                  ["_tmp_0", "_tmp_0 = .alloc", "new MyClass()"],
              ("_tmp_0 = .alloc", 0): ["_tmp_0", ".alloc"],
              ("new MyClass()", 0, "CALL"): ["MyClass", "_tmp_0"]},
         cite=_JSC_CITE + ":187-222"),
    dict(name="js-new-args", lang="javascript", wrap=False,
         code="new MyClass(arg1, arg2);",
         ast={("new MyClass(arg1, arg2)", 0, "BLOCK"):
                  ["_tmp_0", "_tmp_0 = .alloc", "new MyClass(arg1, arg2)"],
              ("new MyClass(arg1, arg2)", 0, "CALL"):
                  ["MyClass", "_tmp_0", "arg1", "arg2"]},
         cite=_JSC_CITE + ":224-271"),
    dict(name="js-new-access-path-ast", lang="javascript", wrap=False,
         code="new foo.bar.MyClass();",
         ast={("new foo.bar.MyClass()", 0, "BLOCK"):
                  ["_tmp_0", "_tmp_0 = .alloc", "new foo.bar.MyClass()"],
              ("new foo.bar.MyClass()", 0, "CALL"):
                  ["foo.bar.MyClass", "_tmp_0"],
              ("foo.bar.MyClass", 0): ["foo.bar", "MyClass"]},
         cite=_JSC_CITE + ":273-312"),
]

# ------------------------------------------------------------------- #
# TypeRecoveryPassTests.scala — import-seeded recovery, builtins, dummy
# return values, cross-module member resolution (multi-file).
# ------------------------------------------------------------------- #
TRP = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/"
       "TypeRecoveryPassTests.scala")

CASES += [
    dict(
        name="js-typerec-external-type", lang="javascript", wrap=False,
        code="""
import { WebClient } from "slack_sdk";
import { SendGridAPIClient } from "sendgrid";

const client = new WebClient("WOLOLO");
const sg = new SendGridAPIClient("SENGRID_KEY_WOLOLO");

function sendSlackMessage(chan, msg) {
    client.chatPostMessage(channel=chan, text=msg);
}

let response = sg.send(message);
""",
        typerec=[["id:client", "slack_sdk:WebClient"],
                 ["id:sg", "sendgrid:SendGridAPIClient"],
                 ["id:response",
                  "sendgrid:SendGridAPIClient:send:<returnValue>"],
                 ["sg.send(message)", "sendgrid:SendGridAPIClient:send"],
                 ["client.chatPostMessage(channel=chan, text=msg)",
                  "slack_sdk:WebClient:chatPostMessage"]],
        cite=f"{TRP}:42-98",
    ),
    dict(
        name="js-typerec-builtins", lang="javascript", wrap=False,
        code="""
console.log("Hello world");
let x = Math.abs(-1);
""",
        typerec=[["console.log(\"Hello world\")", "__whatwg.console:log"],
                 ["Math.abs(-1)", "__ecma.Math:abs"],
                 ["id:x", "__ecma.Number"]],
        cite=f"{TRP}:100-114",
    ),
    dict(
        name="js-typerec-cross-module", lang="javascript", wrap=False,
        files=[("Foo.ts", """
import { SQLAlchemy } from "flask_sqlalchemy";

export const x = 1;
export const y = "test";
export const db = new SQLAlchemy();
"""), ("Bar.ts", """
import { x, y, db } from './Foo';

let z = x;
z = y;

let d = db;

d.createTable()

db.deleteTable();
""")],
        # the resolved relative import flows the exporter's types across:
        # x/y primitives, db's object type, z multi-hint, d single
        # (:117-205)
        typerec=[["id:x", "__ecma.Number"],
                 ["id:y", "__ecma.String"],
                 ["id:db", "flask_sqlalchemy:SQLAlchemy"],
                 ["id:z", "__ecma.Number,__ecma.String"],
                 ["id:d", "flask_sqlalchemy:SQLAlchemy"],
                 ["d.createTable()",
                  "flask_sqlalchemy:SQLAlchemy:createTable"],
                 ["db.deleteTable()",
                  "flask_sqlalchemy:SQLAlchemy:deleteTable"]],
        cite=f"{TRP}:117-205",
    ),
]

# ------------------------------------------------------------------- #
# TsClassesAstCreationPassTests.scala — TS parameter properties.
# ------------------------------------------------------------------- #
CASES += [
    dict(
        name="js-ts-parameter-properties", lang="javascript", wrap=False,
        code="""
class Params {
  constructor(
    public readonly x: number,
    protected y: number,
    private z: number
  ) {}
}
""",
        # modifier-marked ctor params become typed members with
        # `this.x = x` assignments (:13-37)
        members=[["Params.x", "__ecma.Number"],
                 ["Params.y", "__ecma.Number"],
                 ["Params.z", "__ecma.Number"]],
        params=[["<init>.x", "1:__ecma.Number:BY_SHARING"],
                ["<init>.y", "2:__ecma.Number:BY_SHARING"],
                ["<init>.z", "3:__ecma.Number:BY_SHARING"]],
        ast={("<empty>", 1): ["this.x = x", "this.y = y", "this.z = z"],
             "this.x = x": ["this.x", "x"]},
        cite=("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/ast/"
              "TsClassesAstCreationPassTests.scala:13-37"),
    ),
]

# ------------------------------------------------------------------- #
# TypeRecoveryPassTests phase 3 — annotation hints, method-return
# propagation, function-as-constructor resolution.
# ------------------------------------------------------------------- #
CASES += [
    # :334-352 — TS param/return annotations resolve through the import.
    dict(
        name="js-typerec-param-hints", lang="javascript", wrap=False,
        code="""
import google from 'googleapis';

function foo(a: google.More, b: google.Money): google.Problems {
 a.bar();
 b.baz();
}
""",
        typerec=[["a.bar()", "googleapis:google:More:bar"],
                 ["b.baz()", "googleapis:google:Money:baz"],
                 ["ret:foo", "googleapis:google:Problems"]],
        cite=f"{TRP}:334-352",
    ),
    # :354-411 — recovered values returned in methods: literal returns
    # type the method return AND the cross-module caller's result; a
    # returned recovered call chains :<returnValue>.
    dict(
        name="js-typerec-returns", lang="javascript", wrap=False,
        files=[("foo.js", """
const axios = require("axios");

exports.literalFunction = function() { return 2; };

const axiosInstance = axios.create({
  baseURL: 'https://api.example.com',
  timeout: 5000,
  headers: {  'Content-Type': 'application/json' }
});

exports.get = (url: string, config?: any) => {
  return axiosInstance.get(url, config);
};
"""), ("bar.js", """
const foo = require("./foo");

const x = foo.literalFunction();
const y = foo.get();
""")],
        code="",
        typerec=[["ret:literalFunction", "__ecma.Number"],
                 ["id:x", "__ecma.Number"],
                 ["ret:get", "axios:create:<returnValue>:get:<returnValue>"],
                 ["id:y", "axios:create:<returnValue>:get:<returnValue>"],
                 ["foo.literalFunction()",
                  "js-typerec-returns/foo.js::program:literalFunction"],
                 ["foo.get()", "js-typerec-returns/foo.js::program:get"]],
        cite=f"{TRP}:354-411",
    ),
    # :467-477 — a function value used as a constructor: the
    # <operator>.new call resolves to the function's fullname.
    dict(
        name="js-typerec-func-ctor", lang="javascript", wrap=False,
        code="""
var Print = function(str) {
	console.log(str);
}

new Print("Hello")
""",
        typerec=[["new Print(\"Hello\")",
                  "js-typerec-func-ctor.js::program:Print"],
                 ["console.log(str)", "__whatwg.console:log"]],
        cite=f"{TRP}:467-477",
    ),
]

CASES += [
    # :413-436 — TS three-address temporaries: `this.http.post(...)`
    # routes through `_tmp = this.http`; the member's annotation resolves
    # the call.
    dict(
        name="js-typerec-tmp-member", lang="javascript", wrap=False,
        code="""
import { HttpClient } from '@angular/common/http';

@Injectable({
  providedIn: 'root',
})
export class SharedService {
  private http: HttpClient = new HttpClient();
  saveUserFeedback(payload) {
    return this.http.post('https://google.com', payload);
  }
}
""",
        typerec=[["this.http.post('https://google.com', payload)",
                  "@angular/common/http:HttpClient:post"]],
        cite=f"{TRP}:413-436",
    ),
]


# --------------------------------------------------------------------------- #
# CallLinkerPassTests.scala / RequirePassTests.scala /
# InheritanceFullNamePassTests.scala — the jssrc post-processing chain
# (JavaScriptImportResolverPass -> TypeRecovery -> TypeHintCallLinker);
# call methodFullNames asserted via the typerec relation, inheritance via
# the resolved inherits relation.
# --------------------------------------------------------------------------- #

CLP = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/"
       "CallLinkerPassTests.scala")
RPT = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/"
       "RequirePassTests.scala")
IFP = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/passes/"
       "InheritanceFullNamePassTests.scala")

CASES += [
    # :12-39 — `this.b()` links to the enclosing class's member method;
    # a class-expression member initializer scopes under `<init>`, so the
    # chained `new this.bar().c()` resolves to Foo:<init>:Bar:c.
    dict(
        name="js-calllinker-class", lang="javascript", wrap=False,
        code="""
class Foo {
  a() {
    this.b();
  }

  b() {
    console.log("b");
    new this.bar().c();
  }

  bar = class Bar {
    c() {
      console.log("c");
    }
  }
}""",
        typerec=[["this.b()", "js-calllinker-class.js::program:Foo:b"],
                 ["new this.bar().c()",
                  "js-calllinker-class.js::program:Foo:<init>:Bar:c"],
                 ["new this.bar()",
                  "js-calllinker-class.js::program:Foo:<init>:Bar:<init>"]],
        methods=[["b", "js-calllinker-class.js::program:Foo:b"],
                 ["c", "js-calllinker-class.js::program:Foo:<init>:Bar:c"]],
        cite=f"{CLP}:12-39",
    ),
    # :41-57 — a simple `sayhi()` call links to the file-local function.
    dict(
        name="js-calllinker-simple", lang="javascript", wrap=False,
        code="""
function sayhi() {
  console.log("Hello World!");
}
sayhi();
""",
        typerec=[["sayhi()", "js-calllinker-simple.js::program:sayhi"]],
        methods=[["sayhi", "js-calllinker-simple.js::program:sayhi"]],
        cite=f"{CLP}:41-57",
    ),
    # :59-121 — exported object-literal lambdas link across file
    # boundaries; the resolved require binding's receiver is typed with
    # the exporting module's ::program entity.
    dict(
        name="js-calllinker-exports", lang="javascript", wrap=False,
        files=[("foo.js", """
const bar = require('./bar.js');
const baz = require('./baz.js');

bar.sayhi();
baz.sayhowdy();
"""), ("bar.js", """
module.exports = {
  sayhi: function() {
    console.log("Hello World!");
  },
  saybye: function() {
    console.log("Good-bye!");
  }
}
"""), ("baz.js", """
module.exports = {
  sayhowdy: function() {
    console.log("Howdy World!");
  }
}
""")],
        code="",
        typerec=[["bar.sayhi()",
                  "js-calllinker-exports/bar.js::program:sayhi"],
                 ["baz.sayhowdy()",
                  "js-calllinker-exports/baz.js::program:sayhowdy"],
                 ["id:bar", "js-calllinker-exports/bar.js::program"],
                 ["id:baz", "js-calllinker-exports/baz.js::program"]],
        methods=[["sayhi", "js-calllinker-exports/bar.js::program:sayhi"],
                 ["saybye", "js-calllinker-exports/bar.js::program:saybye"],
                 ["sayhowdy",
                  "js-calllinker-exports/baz.js::program:sayhowdy"]],
        cite=f"{CLP}:59-121",
    ),
    # :123-186 — conservative flow-insensitive linking: a binding
    # reassigned from two modules keeps BOTH type hints (declared type
    # ANY) and its member call stays <unknownFullName>.
    dict(
        name="js-calllinker-conservative", lang="javascript", wrap=False,
        files=[("foo.js", """
var barOrBaz = require('./bar.js');
barOrBaz = require('./baz.js');

barOrBaz.sayhi();
"""), ("bar.js", """
module.exports = {
  sayhi: function() {
    console.log("Hello World, love BAR");
  }
}
"""), ("baz.js", """
module.exports = {
  sayhi: function() {
    console.log("Howdy World, love BAZ");
  }
}
""")],
        code="",
        typerec=[["id:barOrBaz",
                  "js-calllinker-conservative/bar.js::program,"
                  "js-calllinker-conservative/baz.js::program"]],
        methods=[["sayhi", "js-calllinker-conservative/bar.js::program:sayhi"],
                 ["sayhi",
                  "js-calllinker-conservative/baz.js::program:sayhi"]],
        cite=f"{CLP}:123-186",
    ),
    # :12-40 — `module.exports = function(...)` whole-module export: the
    # require binding resolves direct calls to the exported lambda.
    dict(
        name="js-requirepass-require", lang="javascript", wrap=False,
        files=[("sample.js", """
const externalfunc = require('./sampleone');
function testone() {
  var name = "foo";
  console.log(name);
  externalfunc(name);
}

testone();
"""), ("sampleone.js", """
module.exports = function (nameparam) {
  console.log( "external func" + nameparam);
}
""")],
        code="",
        typerec=[["externalfunc(name)",
                  "js-requirepass-require/sampleone.js::program:<lambda>0"],
                 ["id:externalfunc",
                  "js-requirepass-require/sampleone.js::program:<lambda>0"],
                 ["testone()",
                  "js-requirepass-require/sample.js::program:testone"]],
        methods=[["<lambda>0",
                  "js-requirepass-require/sampleone.js::program:<lambda>0"]],
        cite=f"{RPT}:12-40",
    ),
    # :42-72 — ES named imports resolve through `export function` exports.
    dict(
        name="js-requirepass-import", lang="javascript", wrap=False,
        files=[("sample.js", """
import {foo, bar} from './sampleone.mjs';
var x = "literal";
foo(x);
bar(x);
"""), ("sampleone.mjs", """
export function foo(x) {
  console.log(x);
}

export function bar(x) {
  console.log(x);
}
""")],
        code="",
        typerec=[["foo(x)",
                  "js-requirepass-import/sampleone.mjs::program:foo"],
                 ["bar(x)",
                  "js-requirepass-import/sampleone.mjs::program:bar"],
                 ["id:x", "__ecma.String"]],
        methods=[["foo", "js-requirepass-import/sampleone.mjs::program:foo"],
                 ["bar", "js-requirepass-import/sampleone.mjs::program:bar"]],
        cite=f"{RPT}:42-72",
    ),
    # :74-103 — TypeScript relative importing across directories
    # (`../../foo.ts`, `./d2/bar.ts` path normalization).
    dict(
        name="js-requirepass-ts-relative", lang="javascript", wrap=False,
        files=[("foo.ts", """
export function foo() {}
"""), ("d1/d2/bar.ts", """
import { foo } from "../../foo.ts";

foo();
export function bar() {}
"""), ("d1/baz.ts", """
import { bar } from "./d2/bar.ts";

bar();
""")],
        code="",
        typerec=[["foo()",
                  "js-requirepass-ts-relative/foo.ts::program:foo"],
                 ["bar()",
                  "js-requirepass-ts-relative/d1/d2/bar.ts::program:bar"]],
        cite=f"{RPT}:74-103",
    ),
    # :10-63 — a default-exported class resolves the importer's extends
    # clause to the exporting module's TYPE_DECL; identifiers instantiated
    # from either class carry the resolved type fullnames.
    dict(
        name="js-inheritance-fullname", lang="javascript", wrap=False,
        files=[("inheritance.js", """
import Musician from "./domain/music";

class MusicWithLyrics extends Musician {
  constructor(name, song, lyrics) {
    super(name, song);
    this.lyrics = lyrics;
  }
}

const myMusician = new Musician('Rafi', 'song1');
const myMusicWithLyrics = new MusicWithLyrics('Fido', 'song1', 'lyrics');
"""), ("domain/music.js", """
class Musician {
    constructor(name, song) {
        this.username = name;
        this.song = song;
    }
    sing() {
        console.log(`${this.username} says ${this.song}`);
    }
}

export default Musician;
""")],
        code="",
        inherits=[["MusicWithLyrics",
                   "js-inheritance-fullname/domain/music.js::program:"
                   "Musician"]],
        typerec=[["id:myMusician",
                  "js-inheritance-fullname/domain/music.js::program:"
                  "Musician"],
                 ["id:myMusicWithLyrics",
                  "js-inheritance-fullname/inheritance.js::program:"
                  "MusicWithLyrics"]],
        methods=[["<init>",
                  "js-inheritance-fullname/inheritance.js::program:"
                  "MusicWithLyrics:<init>"],
                 ["<init>",
                  "js-inheritance-fullname/domain/music.js::program:"
                  "Musician:<init>"],
                 ["sing",
                  "js-inheritance-fullname/domain/music.js::program:"
                  "Musician:sing"]],
        cite=f"{IFP}:10-63",
    ),
    # :65-85 — inheriting from an unresolvable external module synthesizes
    # the `<module>.js::program:<name>` type stub.
    dict(
        name="js-inheritance-external", lang="javascript", wrap=False,
        code="""
import Musician from "music";

class MusicWithLyrics extends Musician {
  constructor(name, song, lyrics) {
    super(name, song);
    this.lyrics = lyrics;
  }
}
""",
        inherits=[["MusicWithLyrics", "music.js::program:Musician"]],
        cite=f"{IFP}:65-85",
    ),
]
