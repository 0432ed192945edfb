"""Java dataflow parity corpus — transcribed BY HAND from the reference's
javasrc2cpg dataflow suites (javasrc2cpg/src/test/scala/io/joern/
javasrc2cpg/querying/dataflow/*.scala, run through JavaDataflowFixture).

The fixture harness (JavaDataflowFixture.scala:21-45) selects
``source = cpg.method(name).literal.code("\\"MALICIOUS\\"")`` and
``sink = cpg.method(name).call.name(".*println.*").argument(1)`` and
asserts ``sink.reachableBy(source).size`` — a reachable-SOURCE-set size,
encoded here as ``reachable=N`` facts (distinct source nodes from which
any sink is reachable).
"""

JDF = ("javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/dataflow")

MAL = '"MALICIOUS"'


def _t(method: str, n: int, name: str | None = None) -> dict:
    return dict(name=name or f"{method}",
                source={"literal": {"code": MAL, "method": method}},
                sink={"call_arg": {"name": "println", "index": 1,
                                   "method": method}},
                reachable=n)


CASES = [
    # IfTests.scala:9-92 — flow (in)sensitivity through if/else shapes:
    # a reassignment on ONE path keeps the flow (tests 1-4); reassignment
    # on ALL paths kills it (test5, reachable = 0).
    dict(
        name="java-flow-if", lang="java", wrap=False,
        code="""
public class Foo {
    public void test1(boolean b) {
        String s = "MALICIOUS";
        if (b) {
            s = "SAFE";
        }
        System.out.println(s);
    }

    public void test2(boolean b) {
        String s = "SAFE";
        if (b) {
            s = "MALICIOUS";
        }
        System.out.println(s);
    }

    public void test3(boolean b) {
        String s;

        if (b) {
            s = "SAFE";
        } else {
            s = "MALICIOUS";
        }

        System.out.println(s);
    }

    public void test4(int input) {
        String s;

        if (input < 10) {
            s = "SAFE";
        } else if (input > 20) {
            s = "MALICIOUS";
        } else {
            s = "ALSO SAFE";
        }

        System.out.println(s);
    }

    public void test5(boolean b) {
        String s = "MALICIOUS";

        if (b) {
            s = "SAFE";
        }
        else {
            s = "ALSO SAFE";
        }

        System.out.println(s);
    }
}
""",
        flows=[_t("test1", 1), _t("test2", 1), _t("test3", 1),
               _t("test4", 1), _t("test5", 0)],
        cite=f"{JDF}/IfTests.scala:9-92",
    ),
    # SwitchTests.scala — source inside a switch arm reaches the sink after
    # it; a sink inside a switch arm is reached by the pre-switch source.
    dict(
        name="java-flow-switch", lang="java", wrap=False,
        code="""
public class Foo {
    public void test1(int input) {
        String s;

        switch (input) {
            case 0:
            case 1:
                s = "SAFE";
                break;
            case 2:
                s = "MALICIOUS";
                break;
            default:
                s = "SAFE";
        }
        System.out.println(s);
    }

    public void test2(int input) {
        String s = "MALICIOUS";

        switch(input) {
            case 0:
                System.out.println(s);
                break;
            default:
                System.out.println("SAFE");
        }
    }
}
""",
        flows=[_t("test1", 1), _t("test2", 1)],
        cite=f"{JDF}/SwitchTests.scala",
    ),
]

CASES += [
    # LoopTests.scala — while/for/do/foreach kill-and-keep shapes, break/
    # continue unreachability (tests 8/9: the sink is CFG-unreachable, so
    # no reaching definition arrives).
    dict(
        name="java-flow-loops", lang="java", wrap=False,
        code="""
public class Foo {
    public void test1(boolean b) {
        String s = "MALICIOUS";
        while (b) {
            s = "SAFE";
            b = !b;
        }
        System.out.println(s);
    }

    public void test2(boolean b) {
        String s = "SAFE";
        while (b) {
            s = "MALICIOUS";
            b = !b;
        }
        System.out.println(s);
    }

    public void test3(int maxLen) {
        for (String s = "SAFE"; s.length() < maxLen; s += "MALICIOUS") {
            System.out.println(s);
        }
    }

    public void test4(int maxLen) {
        for (String s = "MALICIOUS"; s.length() < maxLen; s += "MALICIOUS") {
            s = "SAFE";
            System.out.println(s);
        }
    }

    public void test5(int maxLen) {
        for (String s = "MALICIOUS"; s.length() < maxLen; s += "SAFE") {
            System.out.println(s);
        }
    }

    public void test6(int maxLen) {
        String s = "MALICIOUS";
        do {
            s += "SAFE";
            System.out.println(s);
        } while (s.length() < maxLen);
    }

    public void test7(String[] prefixes) {
        String s = "MALICIOUS";
        for (String prefix : prefixes) {
            String output = prefix + s;
            System.out.println(output);
        }
    }

    public void test8() {
        String s = "MALICIOUS";
        while (true) {
            break;
            System.out.println(s);
        }
    }

    public void test9(String[] prefixes) {
        String s = "MALICIOUS";
        for (String prefix: prefixes) {
            String output = prefix + s;
            continue;
            System.out.println(output);
        }
    }

    public void test10(int count) {
        String s = "";
        for (int i = 0; i < count; i++) {
            if (i == 6) {
                s += "MALICIOUS";
            } else {
                s += "SAFE";
            }
        }
        System.out.println(s);
    }

    public void test11(String[] prefixes) {
        String s = "MALICIOUS";
        for (String prefix: prefixes) {
            String output = prefix + s;
            System.out.println(output);
        }
    }

    public void test12(boolean b) {
        String s = "MALICIOUS";
        do {
            s = "SAFE";
            b = !b;
        } while (b);
        System.out.println(s);
    }
}
""",
        flows=[_t("test1", 1), _t("test2", 1), _t("test3", 1),
               _t("test4", 0), _t("test5", 1), _t("test6", 1),
               _t("test7", 1), _t("test8", 0), _t("test9", 0),
               _t("test10", 1), _t("test11", 1), _t("test12", 0)],
        cite=f"{JDF}/LoopTests.scala",
    ),
    # TryTests.scala tests 1-9 (test10 skipped: its reachableBy size 2
    # counts the same source once per matched sink expression, a
    # duplicate-per-sink semantics this corpus's distinct-source metric
    # deliberately does not reproduce).
    dict(
        name="java-flow-try", lang="java", wrap=False,
        code="""
public class Foo {
    public static void foo() {
        throw new Exception();
    }

    public void test1() {
        String s = "MALICIOUS";

        try {
            System.out.println(s);
        } catch (Exception e) {
            System.out.println("SAFE");
        }
    }

    public void test2() {
        String s = "MALICIOUS";

        try {
            System.out.println("SAFE");
            foo();
        } catch (Exception e) {
            System.out.println(s);
        }
    }

    public void test3() {
        String s = "MALICIOUS";

        try {
            System.out.println("SAFE");
        } catch (Exception e) {
            System.out.println("ALSO_SAFE");
        } finally {
            System.out.println(s);
        }
    }

    public void test4() {
        String s = "MALICIOUS";

        try {
            throw new Exception(s);
        } catch (Exception e) {
            System.out.println(e);
        }
    }

    public void test5() {
        String s = "SAFE";

        try {
            s = "MALICIOUS";
        } catch (Exception e) {
        }

        System.out.println(s);
    }

    public void test6() {
        String s = "SAFE";

        try {
            foo();
        } catch (Exception e) {
            s = "MALICIOUS";
        }

        System.out.println(s);
    }

    public void test7() {
        String s = "SAFE";

        try {
            foo();
        } catch (Exception e) {
        } finally {
            s = "MALICIOUS";
        }

        System.out.println(s);
    }

    public void test8() {
        String s = "MALICIOUS";

        try {
            s = "SAFE";
        } catch (Exception e) {
            s = "ALSO SAFE";
        }

        System.out.println(s);
    }

    public void test9() {
        String s = "MALICIOUS";

        try {
            s = "MALICIOUS";
        } catch (Exception e) {
            s = "MALICIOUS";
        } finally {
            s = "SAFE";
        }

        System.out.println(s);
    }
}
""",
        flows=[_t("test1", 1), _t("test2", 1), _t("test3", 1),
               _t("test4", 0), _t("test5", 1), _t("test6", 1),
               _t("test7", 1), _t("test8", 0), _t("test9", 0)],
        cite=f"{JDF}/TryTests.scala:1-193",
    ),
]

CASES += [
    # OperatorTests.scala — assignment chains, binary ops, conditional
    # expressions, compound assignment keep/kill semantics (the reference
    # fixture's `safe` in test3 is verbatim, an unresolved identifier).
    dict(
        name="java-flow-operators", lang="java", wrap=False,
        code="""
public class Foo {
  public void test1() {
    String s = "MALICIOUS";
    System.out.println(s);
  }

  public void test2() {
    int x = 42;
    int y = x;
    int z = y;
    System.out.println(z);
  }

  public void test3(String suffix) {
    String s = "MALICIOUS";
    String t = s + safe;
    System.out.println(t);
  }

  public void test4(boolean shouldToggle) {
    String bad = "MALICIOUS";
    String s = shouldToggle ? "SAFE" : bad;

    System.out.println(s);
  }

  public void test5() {
    int bad = 42;
    int good = 0;
    int veryGood = 11;

    int maybeBad = good + (veryGood + bad);
    System.out.println(maybeBad);
  }

  public void test6() {
    String s = "MALICIOUS";
    s = "SAFE";
    System.out.println(s);
  }

  public void test7() {
    String s = "SAFE";
    s += "MALICIOUS";
    System.out.println(s);
  }

  public void test8() {
     String s = "MALICIOUS";
     s += "SAFE";
     System.out.println(s);
  }

  public void test9() {
    String s = "SAFE";
    s = "MALICIOUS";
    System.out.println(s);
  }
}
""",
        flows=[
            _t("test1", 1),
            dict(name="test2",
                 source={"literal": {"code": "42", "method": "test2"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test2"}},
                 reachable=1),
            _t("test3", 1), _t("test4", 1),
            dict(name="test5",
                 source={"literal": {"code": "42", "method": "test5"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test5"}},
                 reachable=1),
            _t("test6", 0), _t("test7", 1), _t("test8", 1), _t("test9", 1),
        ],
        cite=f"{JDF}/OperatorTests.scala",
    ),
    # ReturnTests.scala — flows into return statements, incl. through an
    # object instantiation and on into a caller's sink.
    dict(
        name="java-flow-returns", lang="java", wrap=False,
        code="""
public class Foo {
 public int case1() {
   int x = 42;
   return x;
 }

 public Baz case2() {
   int x = 42;
   return new Baz(x);
 }

 public void case2_sink() {
   sink(case2());
 }
}
""",
        flows=[
            dict(name="case1_ret",
                 source={"literal": {"method": "case1"}},
                 sink={"ret": {"method": "case1"}},
                 reachable=1),
            dict(name="case2_ret",
                 source={"literal": {"method": "case2"}},
                 sink={"ret": {"method": "case2"}},
                 count=1),
            dict(name="case2_to_sink",
                 source={"literal": {"method": "case2"}},
                 sink={"call": {"name": "sink"}},
                 count=1),
        ],
        cite=f"{JDF}/ReturnTests.scala",
    ),
]


def _m(src_method: str, sink_method: str, n: int, name: str) -> dict:
    """getMultiFnSourceSink: MALICIOUS literal in src_method, println
    argument subtree in sink_method."""
    return dict(name=name,
                source={"literal": {"code": MAL, "method": src_method}},
                sink={"call_arg": {"name": "println", "index": 1,
                                   "method": sink_method}},
                reachable=n)


CASES += [
    # FunctionCallTests.scala — interprocedural arg->param flows, depth 3,
    # positional precision (tests 9-12), return flows, overwrite kills.
    dict(
        name="java-flow-calls", lang="java", wrap=False,
        code="""
public class Foo {
    public static void printSimpleString(String s) {
        System.out.println(s);
    }

    public static void printStringReassign(String s) {
        String t = s;
        System.out.println(t);
    }

    public static void printStringPrefix(String s) {
        String prefix = "SAFE";
        String output = prefix + s;
        System.out.println(output);
    }

    public static void cat(String s, String t) {
        String output = s + t;
        System.out.println(output);
    }

    public static void first(String s, String t) {
        System.out.println(s);
    }

    public static void second(String s, String t) {
        System.out.println(t);
    }

    public static String getMalicious() {
        return "MALICIOUS";
    }

    public static String join(String s, String t) {
        return s + t;
    }

    public static void depth1(String s) {
        depth2(s);
    }

    public static void depth2(String s) {
        printSimpleString(s);
    }

    public static void overwrite(String s) {
        s = "SAFE";
        System.out.println(s);
    }

    public static String safeReturn(String s) {
        return "SAFE";
    }

    public static void test1() {
        printSimpleString("MALICIOUS");
    }

    public static void test2() {
        String s = "MALICIOUS";
        printSimpleString(s);
    }

    public static void test3(String prefix) {
        String s = "MALICIOUS";
        printSimpleString(prefix + s);
    }

    public static void test4() {
        String s = "MALICIOUS";
        printStringReassign(s);
    }

    public static void test5() {
        String s = "MALICIOUS";
        printStringPrefix(s);
    }

    public static void test6() {
        String s = "MALICIOUS";
        depth1(s);
    }

    public static void test7() {
        cat("SAFE", "MALICIOUS");
    }

    public static void test8() {
        cat("MALICIOUS", "SAFE");
    }

    public static void test9() {
        first("MALICIOUS", "SAFE");
    }

    public static void test10() {
        first("SAFE", "MALICIOUS");
    }

    public static void test11() {
        second("MALICIOUS", "SAFE");
    }

    public static void test12() {
        second("SAFE", "MALICIOUS");
    }

    public static void test13() {
        String s = getMalicious();
        System.out.println(s);
    }

    public static void test14() {
        String bad = "MALICIOUS";
        String s = join(bad, "SAFE");
        System.out.println(s);
    }

    public static void test15() {
        String s = "MALICIOUS";
        overwrite(s);
    }

    public static void test16() {
        String s = "MALICIOUS";
        String t = safeReturn(s);
        System.out.println(t);
    }

    public static void test17(Object o) {
        String s = (String) o;
        System.out.println(s);
    }
}
""",
        flows=[
            _m("test1", "printSimpleString", 1, "fc_test1"),
            _m("test2", "printSimpleString", 1, "fc_test2"),
            _m("test3", "printSimpleString", 1, "fc_test3"),
            _m("test4", "printStringReassign", 1, "fc_test4"),
            _m("test5", "printStringPrefix", 1, "fc_test5"),
            _m("test6", "printSimpleString", 1, "fc_test6"),
            _m("test7", "cat", 1, "fc_test7"),
            _m("test8", "cat", 1, "fc_test8"),
            _m("test9", "first", 1, "fc_test9"),
            _m("test10", "first", 0, "fc_test10"),
            _m("test11", "second", 0, "fc_test11"),
            _m("test12", "second", 1, "fc_test12"),
            _m("getMalicious", "test13", 1, "fc_test13"),
            _m("test14", "test14", 1, "fc_test14"),
            _m("test15", "overwrite", 0, "fc_test15"),
            _m("test16", "test16", 0, "fc_test16"),
            dict(name="fc_test17",
                 source={"param": {"method": "test17", "name": "o"}},
                 sink={"method_return": "test17"},
                 reachable=1),
        ],
        cite=f"{JDF}/FunctionCallTests.scala:92-330",
    ),
]


def _a(method: str, n: int) -> dict:
    """ArrayTests: the sink is the println argument SUBTREE, and the
    reference counts the source once per reached sink expression
    ("This is 2 due to how the sink is constructed")."""
    return dict(name=f"arr_{method}",
                source={"literal": {"code": MAL, "method": method}},
                sink={"call_arg": {"name": "println", "index": 1,
                                   "method": method, "subtree": True}},
                reachable_pairs=n)


CASES += [
    # MethodReturnTests.scala — METHOD_RETURN sinks, no-flow into a
    # parameterless call, external-semantic passthrough (println).
    dict(
        name="java-flow-method-return", lang="java", wrap=False,
        code="""
public class Foo {
 public void foo(int y) {
   int x = 10;
 }

 public void bar() {
   bar(foo(1));
 }

 public void woo() {
   int x = 20;
   System.out.println(1, x);
   sink(x);
 }

}
""",
        flows=[
            dict(name="mr_x_to_exit",
                 source={"identifier": {"name": "x"}},
                 sink={"method_return": "foo"},
                 reachable=1),
            dict(name="mr_x_to_bar_param",
                 source={"identifier": {"name": "x"}},
                 sink={"param": {"method": "bar", "index": 1}},
                 reachable=0),
            dict(name="mr_y_to_bar_param",
                 source={"param": {"name": "y"}},
                 sink={"param": {"method": "bar", "index": 1}},
                 reachable=0),
            dict(name="mr_literal_to_sink",
                 source={"literal": {"code": "20"}},
                 sink={"param": {"method": "sink", "index": 1}},
                 reachable=1),
        ],
        cite=f"{JDF}/MethodReturnTests.scala",
    ),
    # ArrayTests.scala — array-approximate flow: writes to ANY element
    # taint the array; element reads taint from the array (tests annotate
    # the approximations).
    dict(
        name="java-flow-arrays", lang="java", wrap=False,
        code="""
public class Foo {
    public void test1() {
        String[] vals = {"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        System.out.println(vals[2]);
    }

    public void test2() {
        String[] vals = {"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        System.out.println(vals[0]);
    }

    public void test3() {
        String[] vals = new String[]{"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        System.out.println(vals[2]);
    }

    public void test4() {
        String[] vals = new String[2];
        vals[0] = "SAFE";
        vals[1] = "MALICIOUS";
        System.out.println(vals[0]);
    }

    public void test5() {
        String[] vals = new String[2];
        vals[0] = "SAFE";
        vals[1] = "MALICIOUS";
        System.out.println(vals[1]);
    }

    public void test6() {
        String[] vals = {"SAFE", "MALICIOUS"};
        vals[0] = "ALSO SAFE";
        System.out.println(vals[1]);
    }

    public void test7() {
        String[] vals = {"SAFE", "MALICIOUS"};
        vals[1] = "ALSO SAFE";
        System.out.println(vals[1]);
    }

    public void test8() {
        String[] vals = {"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        for (int i = 0; i < vals.length; i++) {
            String val = vals[i];
            System.out.println(val);
        }
    }

    public void test9() {
        String[] vals = {"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        for (String val : vals) {
            System.out.println(val);
        }
    }

    public void test10() {
        String[] vals = {"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        String acc = "";
        for (String val : vals) {
            acc += val;
        }
        System.out.println(acc);
    }

    public void test11() {
        String[] vals = {"SAFE", "STILL SAFE", "ALSO SAFE"};
        vals[1] = "MALICIOUS";
        System.out.println(vals[1]);
    }

    public void test12() {
        String[] vals = {"SAFE", "STILL SAFE", "ALSO SAFE"};
        vals[1] = "MALICIOUS";
        System.out.println(vals[0]);
    }

    public void test13() {
        String[] vals = {"SAFE", "SAFE", "MALICIOUS", "SAFE"};
        String[] alias = vals;
        System.out.println(alias[2]);
    }

    public static String[] source() { return new String[]{"MALICIOUS"}; }
    public static void sink(int x) {}

    public void test14() {
        String[] vals = source();
        sink(vals.length);
    }
   }
""",
        flows=[
            _a("test1", 2), _a("test2", 2), _a("test3", 2), _a("test4", 1),
            _a("test5", 2), _a("test6", 2), _a("test7", 2), _a("test8", 1),
            _a("test9", 1), _a("test10", 1), _a("test11", 2),
            _a("test12", 1), _a("test13", 2),
            dict(name="arr_test14",
                 source={"call": {"name": "source"}},
                 sink={"call_arg": {"name": "sink", "index": 1,
                                    "method": "test14", "subtree": True}},
                 reachable_pairs=0),
        ],
        cite=f"{JDF}/ArrayTests.scala",
    ),
]


def _o(method: str, n: int) -> dict:
    """ObjectTests via getConstSourceSink: MALICIOUS literal source, sink
    = the println argument(1) SUBTREE (JavaDataflowFixture
    `.argument(1).ast.collectAll[Expression]`), reachableBy counted once
    per (source, reached sink expression) pair."""
    return dict(name=f"obj_{method}",
                source={"literal": {"code": MAL, "method": method}},
                sink={"call_arg": {"name": "println", "index": 1,
                                   "method": method, "subtree": True}},
                reachable_pairs=n)


CASES += [
    # NewObjectTests — static field initializer literals as sources: the
    # literal in the synthesized <clinit> expands to the member's first
    # usage (SourcesToStartingPoints), here the println argument itself.
    dict(
        name="java-flow-newobject-simple", lang="java", wrap=False,
        code="""
class Bar {
 static String CONST = "<const>";
 static void run() {
   System.out.println(CONST);
 }
}""",
        flows=[dict(
            name="static_simple",
            source={"literal": {}},
            sink={"call_arg": {"name": "println", "index": 1}},
            want=[[('String Bar.CONST = "<const>"', 3),
                   ("System.out.println(CONST)", 5)]],
        )],
        cite=f"{JDF}/ObjectTests.scala (NewObjectTests, simple name)",
    ),
    dict(
        name="java-flow-newobject-qualified", lang="java", wrap=False,
        code="""
class Bar {
 static String CONST = "<const>";
 static void run() {
   System.out.println(Bar.CONST);
 }
}""",
        flows=[dict(
            name="static_qualified",
            source={"literal": {}},
            sink={"call_arg": {"name": "println", "index": 1}},
            want=[[('String Bar.CONST = "<const>"', 3),
                   ("System.out.println(Bar.CONST)", 5)]],
        )],
        cite=f"{JDF}/ObjectTests.scala (NewObjectTests, qualified name)",
    ),
    # ObjectTests — dataflow through objects: constructor-argument taint of
    # the constructed value, field reads/writes, getters, aliases. Counts
    # (incl. the reference's own acknowledged over-taints in test2/5/7 and
    # the alias-write miss in test10) transcribed verbatim.
    dict(
        name="java-flow-objects", lang="java", wrap=False,
        code="""
class Bar {
    public String s;
    public String t = "SAFE";

    public Bar(String s) {
        this.s = s;
    }

    public void setS(String s) {
        this.s = s;
    }

    public void setT(String t) {
        this.t = t;
    }

    public void printS() {
        System.out.println(s);
    }

    public void printT() {
        System.out.println(t);
    }

    public String getS() {
        return s;
    }

    public String getT() {
        return t;
    }
}

public class Foo {

    public void test1() {
        Bar b = new Bar("MALICIOUS");
        System.out.println(b.s);
    }

    public void test2() {
        Bar b = new Bar("MALICIOUS");
        System.out.println(b.t);
    }

    public void test3() {
        Bar b = new Bar("SAFE");
        b.s = "MALICIOUS";
        System.out.println(b.s);
    }

    public void test4() {
        Bar b = new Bar("MALICIOUS");
        String s = b.getS();
        System.out.println(s);
    }

    public void test5() {
        Bar b = new Bar("MALICIOUS");
        String s = b.getT();
        System.out.println(s);
    }

    public void test6() {
        Bar b = new Bar("MALICIOUS");
        b.printS();
    }

    public void test7() {
        Bar b = new Bar("MALICIOUS");
        b.printT();
    }

    public void test8() {
        Bar b = new Bar("MALICIOUS");
        b.setS("SAFE");
        String s = b.s;
        System.out.println(s);
    }

    public void test9() {
        Bar b1 = new Bar("MALICIOUS");
        Bar b2 = b1;
        String s = b2.s;
        System.out.println(s);
    }

    public void test10() {
        Bar b1 = new Bar("SAFE");
        Bar b2 = b1;
        b2.s = "MALICIOUS";
        System.out.println(b1.s);
    }
}

class Baz {
    public String value;

    public Baz(String s) {
        value = s;
    }

    public String toString() {
        return value;
    }

    public static void sink(Baz b) {
        System.out.println(b.toString());
    }

    public void test11() {
        Baz b = new Baz("MALICIOUS");
        sink(b);
    }

    public void test12() {
        sink(new Baz("MALICIOUS"));
    }
}
""",
        flows=[
            # test1 uses an explicit single-node sink (argument(1) only)
            dict(name="obj_test1",
                 source={"literal": {"method": "test1"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test1"}},
                 reachable=1),
            _o("test2", 2), _o("test3", 2), _o("test4", 1), _o("test5", 1),
            dict(name="obj_test6",
                 source={"literal": {"code": MAL, "method": "test6"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "printS", "subtree": True}},
                 reachable_pairs=2),
            dict(name="obj_test7",
                 source={"literal": {"code": MAL, "method": "test7"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "printT", "subtree": True}},
                 reachable_pairs=2),
            # test8 is pendingUntilFixed in the reference (expected 0,
            # actual over-taint) — not transcribable as a stable count
            _o("test9", 1), _o("test10", 0),
        ],
        # "not create Baz method with ANY type in signature": the static
        # sink(Baz) resolves its parameter type
        methods=[("sink", "Baz.sink:void(Baz)")],
        cite=f"{JDF}/ObjectTests.scala",
    ),
]


CASES += [
    # StaticMemberTests — static member initializer literals expand to the
    # member's first non-written usage (final-static treatment); writes
    # before a read kill the expansion (test6), and same-method literal
    # writes flow directly (test7).
    dict(
        name="java-flow-static-members", lang="java", wrap=False,
        code="""
class Bar {
    public static String bad = "MALICIOUS";
    public static String good = "SAFE";

}

public class Foo {
    public static String good = "MALICIOUS";
    public static String bad = "SAFE";

    public void test1() {
        String s = Bar.bad;
        System.out.println(s);
    }

    public void test2() {
        System.out.println(Bar.bad);
    }

    public void test3() {
        System.out.println(Bar.good);
    }

    public void test4() {
        System.out.println(Foo.good);
    }

    public void test5() {
        System.out.println(Foo.bad);
    }

    public void test6() {
        Bar.bad = "SAFE";
        System.out.println(Bar.bad);
    }

    public void test7() {
        Bar.good = "MALICIOUS";
        System.out.println(Bar.good);
    }
}
""",
        flows=[
            dict(name=f"static_{m}",
                 source={"literal": {"code": MAL}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": m}},
                 reachable=n)
            for m, n in [("test1", 1), ("test2", 1), ("test3", 0),
                         ("test4", 1), ("test5", 0), ("test6", 0),
                         ("test7", 1)]
        ],
        cite=f"{JDF}/StaticMemberTests.scala",
    ),
    # MemberTests + MoreMemberTests — MEMBER nodes as sources expand to
    # their first usage; an instance-member initializer literal (folded
    # into the constructor) reaches the member's read.
    dict(
        name="java-flow-members", lang="java", wrap=False,
        code="""
 class Foo {

   int x = "abc";

   public void foo() {
     sink(x);
   }
 }
""",
        flows=[
            dict(name="member_to_sink",
                 source={"member": {"name": "x"}},
                 sink={"call_arg": {"name": "sink", "index": 1}},
                 reachable=1),
            dict(name="literal_to_sink",
                 source={"literal": {"code": '"abc"'}},
                 sink={"call_arg": {"name": "sink", "index": 1}},
                 reachable=1),
        ],
        cite=f"{JDF}/MemberTests.scala (MemberTests)",
    ),
    dict(
        name="java-flow-members-uninit", lang="java", wrap=False,
        code="""
public class Foo {
  private static final String trackMe;
  public void m() {
     sink(trackMe);
  }
}
""",
        flows=[
            dict(name="uninit_member_to_sink",
                 source={"member": {"name": "trackMe"}},
                 sink={"call_arg": {"name": "sink", "index": 1}},
                 reachable=1),
        ],
        cite=f"{JDF}/MemberTests.scala (MoreMemberTests)",
    ),
]


CASES += [
    # SemanticTests — custom FlowSemantic entries keyed by methodFullName
    # (exact + regex) override default taint: self-only mappings kill the
    # return taint (sanitize/taintNone), empty mappings kill the argument
    # (killParam), and (1,2) taints arg2 from arg1 (taint1to2).
    dict(
        name="java-flow-semantics", lang="java", wrap=False,
        code="""
import ext.Library;

public class Test {
 public void test1() {
   String s = "MALICIOUS";
   String b = taint(s);
   System.out.println(b);
 }

 public void test2() {
   String s = "MALICIOUS";
   String b = taint(s);
   String c = sanitize(b);
   System.out.println(c);
 }

 public void test3() {
   String s = "MALICIOUS";
   String b = Library.foo(s);
   System.out.println(b);
 }

 public void test4() {
   String s = "MALICIOUS";
   StringBuilder sb = new StringBuilder(s);
   Library.killParam(sb);
   String c = sb.toString();
   System.out.println(c);
 }

 public void test5() {
   String s = "MALICIOUS";
   String b = Library.taintNone(s);
   System.out.println(b);
 }

 public void test6() {
   String s = "MALICIOUS";
   StringBuilder sb = new StringBuilder();
   Library.taint1to2(s, sb);
   String b = sb.toString();
   System.out.println(b);
 }

 public String taint(String s) {
     return s + ".taint";
 }

 public String sanitize(String s) {
     if (s.contains("..")) {
         return s.replace("..", "");
     }
     return s;
 }
}""",
        semantics=[
            dict(mfn="Test.sanitize:java.lang.String(java.lang.String)",
                 flows=[(0, 0), (1, 1)]),
            dict(mfn="ext.Library.killParam:<unresolvedSignature>(1)",
                 flows=[]),
            dict(mfn=r"^ext\.Library\.taintNone:.*", regex=True,
                 flows=[(0, 0), (1, 1)]),
            dict(mfn=r"^ext\.Library\.taint1to2:.*", regex=True,
                 flows=[(1, 2)]),
        ],
        flows=[
            dict(name="sem_test1",
                 source={"literal": {"code": MAL, "method": "test1"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test1", "subtree": True}},
                 reachable_pairs=1),
            dict(name="sem_test2",
                 source={"literal": {"code": MAL, "method": "test2"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test2", "subtree": True}},
                 reachable_pairs=0),
            dict(name="sem_test3",
                 source={"literal": {"code": MAL, "method": "test3"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test3", "subtree": True}},
                 reachable_pairs=1),
            dict(name="sem_test4",
                 source={"literal": {"code": MAL, "method": "test4"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test4", "subtree": True}},
                 reachable_pairs=0),
            dict(name="sem_test5",
                 source={"literal": {"code": MAL, "method": "test5"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test5", "subtree": True}},
                 reachable_pairs=0),
            dict(name="sem_test6",
                 source={"literal": {"code": MAL, "method": "test6"}},
                 sink={"call_arg": {"name": "println", "index": 1,
                                    "method": "test6", "subtree": True}},
                 reachable_pairs=1),
        ],
        cite=f"{JDF}/SemanticTests.scala",
    ),
]


CASES += [
    # LambdaTests — lambda bodies as separate methods: flows into a lambda
    # through captured locals (SourcesToStartingPoints capturedReferences)
    # and out of a lambda through its RETURN via the METHOD_REF argument
    # (TaskCreator forMethodRefs). The simple-Consumer test and foreach
    # case 1 are pendingUntilFixed/ignored in the reference — skipped.
    dict(
        name="java-flow-lambda-map", lang="java", wrap=False,
        code="""
import java.util.ArrayList;
import java.util.List;

public class LambdaExample {

    public foo1() {
       String myValue = "abc";
\t\tList<String> userPayload = new ArrayList<>();
\t\tList<String> userNamesList = userPayload.stream.map(item -> {
           sink2(myValue);
           return item + myValue;
       });
\t\tsink1(userNamesList);
       return;
    }
}
""",
        flows=[
            dict(name="lambda_map_item",
                 source={"identifier": {"name": "item"}},
                 sink={"call": {"name": "sink1"}},
                 nonempty=True),
            dict(name="lambda_map_myvalue",
                 source={"identifier": {"name": "myValue", "head": True}},
                 sink={"call": {"name": "sink2"}},
                 nonempty=True),
        ],
        cite=f"{JDF}/LambdaTests.scala (map)",
    ),
    dict(
        name="java-flow-lambda-foreach", lang="java", wrap=False,
        code="""
import java.util.ArrayList;
import java.util.List;

public class LambdaExample {

    public foo() {
       String myValue = "abc";
       List<String> userPayload = new ArrayList<>();
       List<String> userNamesList = new ArrayList<>();
       userPayload.forEach(item -> {
           userNamesList.add(item + myValue);
           sink2(myValue);
       });
       sink1(userNamesList);
       return;
     }
}
""",
        flows=[
            dict(name="lambda_foreach_myvalue",
                 source={"identifier": {"name": "myValue", "head": True}},
                 sink={"call": {"name": "sink2"}},
                 nonempty=True),
        ],
        cite=f"{JDF}/LambdaTests.scala (foreach)",
    ),
]
