"""CFG golden tests — succOf expectations transcribed from the reference
(c2cpg/src/test/.../passes/cfg/CfgCreationPassTests.scala, 59 cases; subset
covering every construct). These are the triple-parity fixtures for the CFG
relation: successor sets keyed on code strings, exactly the reference's
oracle (edge types are NOT stored in the reference graph — CfgCreator.run
drops them, CfgCreator.scala:61-67 — so parity is on successor codes).
"""

from tests.succof import check


def test_entry_exit():
    check("", {"func": {"RET"}, "RET": set()})


def test_decl_assign():
    check("int x = 1;", {
        "func": {"x"}, "x": {"1"}, "1": {"x = 1"}, "x = 1": {"RET"},
    })


def test_nested_expression():
    check("x = y + 1;", {
        "func": {"x"}, "x": {"y"}, "y": {"1"}, "1": {"y + 1"},
        "y + 1": {"x = y + 1"}, "x = y + 1": {"RET"},
    })


def test_return():
    check("return x;", {"func": {"x"}, "x": {"return x;"}, "return x;": {"RET"}})


def test_consecutive_returns():
    check("return x; return y;", {
        "func": {"x"}, "x": {"return x;"}, "y": {"return y;"},
        "return x;": {"RET"}, "return y;": {"RET"},
    })


def test_void_return():
    check("return;", {"func": {"return;"}, "return;": {"RET"}})


def test_call():
    check("foo(a + 1, b);", {
        "func": {"a"}, "a": {"1"}, "1": {"a + 1"}, "a + 1": {"b"},
        "b": {"foo(a + 1, b)"}, "foo(a + 1, b)": {"RET"},
    })


def test_unary_plus():
    check("+x;", {"func": {"x"}, "x": {"+x"}, "+x": {"RET"}})


def test_pre_increment():
    check("++x;", {"func": {"x"}, "x": {"++x"}, "++x": {"RET"}})


def test_conditional():
    check("x ? y : z;", {
        "func": {"x"}, "x": {"y", "z"}, "y": {"x ? y : z"},
        "z": {"x ? y : z"}, "x ? y : z": {"RET"},
    })


def test_conditional_empty_then():
    check("x ? : z;", {
        "func": {"x"}, "x": {"x ? : z", "z"}, "z": {"x ? : z"},
        "x ? : z": {"RET"},
    })


def test_short_circuit_and():
    check("int z = x && y;", {
        "func": {"z"}, "z": {"x"}, "x": {"y", "x && y"}, "y": {"x && y"},
        "x && y": {"z = x && y"}, "z = x && y": {"RET"},
    })


def test_short_circuit_or():
    check("x || y;", {
        "func": {"x"}, "x": {"y", "x || y"}, "y": {"x || y"},
        "x || y": {"RET"},
    })


def test_while():
    check("while (x < 1) { y = 2; }", {
        "func": {"x"}, "x": {"1"}, "1": {"x < 1"},
        "x < 1": {"y", "RET"}, "y": {"2"}, "2": {"y = 2"}, "y = 2": {"x"},
    })


def test_while_break():
    check("while (x < 1) { break; y; }", {
        "func": {"x"}, "x": {"1"}, "1": {"x < 1"},
        "x < 1": {"break;", "RET"}, "break;": {"RET"}, "y": {"x"},
    })


def test_while_continue():
    check("while (x < 1) { continue; y; }", {
        "func": {"x"}, "x": {"1"}, "1": {"x < 1"},
        "x < 1": {"continue;", "RET"}, "continue;": {"x"}, "y": {"x"},
    })


def test_nested_while():
    check("while (x) { while (y) { z; }}", {
        "func": {"x"}, "x": {"0"}, ("0", 0): {"x != 0"},
        "x != 0": {"y", "RET"}, "y": {"0"}, ("0", 1): {"y != 0"},
        "y != 0": {"z", "x"}, "z": {"y"},
    })


def test_do_while():
    check("do { y = 2; } while (x < 1);", {
        "func": {"y"}, "y": {"2"}, "2": {"y = 2"}, "y = 2": {"x"},
        "x": {"1"}, "1": {"x < 1"}, "x < 1": {"y", "RET"},
    })


def test_do_while_break():
    check("do { break; y; } while (x < 1);", {
        "func": {"break;"}, "break;": {"RET"}, "y": {"x"},
        "x": {"1"}, "1": {"x < 1"}, "x < 1": {"break;", "RET"},
    })


def test_do_while_continue():
    check("do { continue; y; } while (x < 1);", {
        "func": {"continue;"}, "continue;": {"x"}, "y": {"x"},
        "x": {"1"}, "1": {"x < 1"}, "x < 1": {"continue;", "RET"},
    })


def test_nested_do_while():
    check("do { do { x; } while (y); } while (z);", {
        "func": {"x"}, "x": {"y"}, "y": {"0"}, ("0", 0): {"y != 0"},
        "y != 0": {"x", "z"}, "z": {"0"}, ("0", 1): {"z != 0"},
        "z != 0": {"x", "RET"},
    })


def test_do_while_empty_body():
    check("do { } while(x > 1);", {
        "func": {"x"}, "1": {"x > 1"}, "x > 1": {"x", "RET"},
    })


def test_for():
    check("for (x = 0; y < 1; z += 2) { a = 3; }", {
        "func": {"x"}, "x": {"0"}, "0": {"x = 0"}, "x = 0": {"y"},
        "y": {"1"}, "1": {"y < 1"}, "y < 1": {"a", "RET"},
        "a": {"3"}, "3": {"a = 3"}, "a = 3": {"z"}, "z": {"2"},
        "2": {"z += 2"}, "z += 2": {"y"},
    })


def test_for_break():
    check("for (x = 0; y < 1; z += 2) { break; a = 3; }", {
        "func": {"x"}, "x": {"0"}, "x = 0": {"y"}, "y": {"1"},
        "1": {"y < 1"}, "y < 1": {"break;", "RET"}, "break;": {"RET"},
        "a": {"3"}, "3": {"a = 3"}, "a = 3": {"z"}, "z": {"2"},
        "2": {"z += 2"}, "z += 2": {"y"},
    })


def test_for_continue():
    check("for (x = 0; y < 1; z += 2) { continue; a = 3; }", {
        "func": {"x"}, "x": {"0"}, "0": {"x = 0"}, "x = 0": {"y"},
        "y": {"1"}, "1": {"y < 1"}, "y < 1": {"continue;", "RET"},
        "continue;": {"z"}, "a": {"3"}, "3": {"a = 3"}, "a = 3": {"z"},
        "z": {"2"}, "2": {"z += 2"}, "z += 2": {"y"},
    })


def test_nested_for():
    check("for (x; y; z) { for (a; b; c) { u; } }", {
        "func": {"x"}, "x": {"y"}, "y": {"0"}, ("0", 0): {"y != 0"},
        "y != 0": {"a", "RET"}, "z": {"y"}, "a": {"b"}, "b": {"0"},
        ("0", 1): {"b != 0"}, "b != 0": {"u", "z"}, "c": {"b"}, "u": {"c"},
    })


def test_for_empty_condition():
    check("for (;;) { a = 1; }", {
        "func": {"a"}, "a": {"1"}, "1": {"a = 1"}, "a = 1": {"a"},
    })


def test_for_empty_condition_break():
    check("for (;;) { break; }", {"func": {"break;"}, "break;": {"RET"}})


def test_for_empty_condition_continue():
    check("for (;;) { continue ; }", {
        "func": {"continue ;"}, "continue ;": {"continue ;"},
    })


def test_for_empty_nested():
    check("for (;;) { for (;;) { x; } }", {"func": {"x"}, "x": {"x"}})


def test_for_empty_all():
    check("for (;;) ;", {"func": {"RET"}})


def test_for_skipped_then_return():
    check("for (;;) {}; return;", {
        "func": {"return;"}, "return;": {"RET"},
    })


def test_for_call_condition():
    check("for (; x(1);) ;", {
        "func": {"1"}, "1": {"x(1)"}, "x(1)": {"1", "RET"},
    })


def test_goto_single_label():
    check("x; goto l1; y; l1: ;", {
        "func": {"x"}, "x": {"goto l1;"}, "goto l1;": {"l1: ;"},
        "l1: ;": {"RET"}, "y": {"l1: ;"},
    })


def test_goto_computed():
    check("void *ptr = &&foo;\ngoto *ptr;\notherCall();\nfoo: someCall();", {
        "func": {"ptr"}, ("ptr", 0): {"foo"}, ("ptr", 1): {"*ptr"},
        "foo": {"&&foo"}, "ptr = &&foo": {"goto *;"},
        "goto *;": {"foo: someCall();"},
        "foo: someCall();": {"someCall()"},
        "otherCall()": {"foo: someCall();"},
        "someCall()": {"RET"},
    })


def test_goto_multiple_labels():
    check("x; goto l1; l2: y; l1: ;", {
        "func": {"x"}, "x": {"goto l1;"}, "goto l1;": {"l1: ;"},
        "y": {"l1: ;"}, "l1: ;": {"RET"},
    })


def test_goto_labels_same_spot():
    check("x; goto l2; y; l1: ;l2: ;", {
        "func": {"x"}, "x": {"goto l2;"}, "goto l2;": {"l2: ;"},
        "y": {"l1: ;"}, "l1: ;": {"l2: ;"}, "l2: ;": {"RET"},
    })


def test_goto_with_if():
    check("if(foo) goto end; if(bar) { f(x); } end: ;", {
        "func": {"foo"}, "goto end;": {"end: ;"},
    })


def test_switch_one_case():
    check("switch (x) { case 1: y; }", {
        "func": {"x"}, "x": {"case 1:", "RET"}, "case 1:": {"1"},
        "1": {"y"}, "y": {"RET"},
    })


def test_switch_multiple_cases():
    check("switch (x) { case 1: y; case 2: z;}", {
        "func": {"x"}, "x": {"case 1:", "case 2:", "RET"},
        "case 1:": {"1"}, "1": {"y"}, "y": {"case 2:"},
        "case 2:": {"2"}, "2": {"z"}, "z": {"RET"},
    })


def test_switch_cases_same_spot():
    check("switch (x) { case 1: case 2: y; }", {
        "func": {"x"}, "x": {"case 1:", "case 2:", "RET"},
        "case 1:": {"1"}, "1": {"case 2:"}, "case 2:": {"2"},
        "2": {"y"}, "y": {"RET"},
    })


def test_switch_mixed_cases():
    check("switch (x) { case 1: case 2: y; case 3: z;}", {
        "func": {"x"}, "x": {"case 1:", "case 2:", "case 3:", "RET"},
        "case 1:": {"1"}, "1": {"case 2:"}, "case 2:": {"2"}, "2": {"y"},
        "y": {"case 3:"}, "case 3:": {"3"}, "3": {"z"}, "z": {"RET"},
    })


def test_switch_default():
    check("switch (x) { default: y; }", {
        "func": {"x"}, "x": {"default:"}, "default:": {"y"}, "y": {"RET"},
    })


def test_switch_case_and_default():
    check("switch (x) { case 1: y; break; default: z;}", {
        "func": {"x"}, "x": {"case 1:", "default:"},
        "case 1:": {"1"}, "1": {"y"}, "y": {"break;"}, "break;": {"RET"},
        "default:": {"z"}, "z": {"RET"},
    })


def test_nested_switch():
    check("switch (x) { case 1: switch(y) { default: z; } }", {
        "func": {"x"}, "x": {"case 1:", "RET"}, "case 1:": {"1"},
        "1": {"y"}, "y": {"default:"}, "default:": {"z"}, "z": {"RET"},
    })


def test_switch_continue_in_while():
    check("while (i < 1) {\n  switch (j) {\n    case 0:\n      continue;\n  }\n}", {
        "continue;": {"i"},
    })


def test_if():
    check("if (x) { y; }", {
        "func": {"x"}, "x": {"0"}, "0": {"x != 0"},
        "x != 0": {"y", "RET"}, "y": {"RET"},
    })


def test_if_else():
    check("if (x) { y; } else { z; }", {
        "func": {"x"}, "x": {"0"}, "0": {"x != 0"},
        "x != 0": {"y", "z"}, "y": {"RET"}, "z": {"RET"},
    })


def test_nested_if():
    check("if (x) { if (y) { z; } }", {
        "func": {"x"}, ("0", 0): {"x != 0"}, "x != 0": {"y", "RET"},
        "y": {"0"}, ("0", 1): {"y != 0"}, "y != 0": {"z", "RET"},
        "z": {"RET"},
    })


def test_else_if_chain():
    check("if (a) { b; } else if (c) { d;} else { e; }", {
        "func": {"a"}, "a": {"0"}, ("0", 0): {"a != 0"},
        "a != 0": {"b", "c"}, "b": {"RET"}, "c": {"0"},
        ("0", 1): {"c != 0"}, "c != 0": {"d", "e"}, "d": {"RET"},
        "e": {"RET"},
    })


def test_if_empty_then():
    check("if (cond()) {} else { foo(); }", {
        "func": {"cond()"}, "cond()": {"RET", "foo()"}, "foo()": {"RET"},
    })


def test_if_empty_else():
    check("if (cond()) {foo();} else {}", {
        "func": {"cond()"}, "cond()": {"RET", "foo()"}, "foo()": {"RET"},
    })


def test_if_empty_both():
    check("if (cond()) {} else {}", {"func": {"cond()"}, "cond()": {"RET"}})


# ---- C++ try/catch (CppCfgCreationPassTests) --------------------------------

def test_try_single_catch():
    check("try { a; } catch (int x) { b; }", {
        "func": {"a"}, "a": {"b", "RET"}, "b": {"RET"},
    }, lang="cpp")


def test_try_multiple_catches():
    check("try { a; } catch (short x) { b; } catch (int y) { c; } "
          "catch (long z) { d; }", {
              "func": {"a"}, "a": {"b", "c", "d", "RET"},
              "b": {"RET"}, "c": {"RET"}, "d": {"RET"},
          }, lang="cpp")
