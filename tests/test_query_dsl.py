"""Traversal-DSL golden tests over the fixture CPG (reference semantics:
semanticcpg step DSL, e.g. cpg.method.name(X).parameter / .caller /
.reachableBy — SURVEY.md §2B)."""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def cpg():
    from joern_spark.session import get_spark
    from joern_spark.query import Cpg
    import __spark_entry__ as entry

    spark = get_spark(app="dsl_tests")
    out = entry._cpg(spark)  # checkpoint-cached fixture CPG
    return Cpg(out["nodes"], out["edges"])


def names(steps, col="name"):
    return sorted({r[col] for r in steps.df.select(col).collect()})


def test_method_parameter(cpg):
    ps = cpg.method("main").parameter()
    assert ("argc", "argv") == tuple(sorted(names(ps)))


def test_method_starter_regex(cpg):
    ms = cpg.method("print_.*")
    assert names(ms, "full_name") == ["print_number"]


def test_caller(cpg):
    callers = cpg.method("print_number").caller()
    assert names(callers, "full_name") == ["main"]


def test_callee_includes_stub(cpg):
    callees = cpg.method("print_number").call_out()
    assert "printf" in names(callees, "full_name")


def test_call_argument(cpg):
    args = cpg.call("free").argument(1)
    assert names(args, "code") == ["x"]


def test_assignment_target(cpg):
    targets = cpg.assignment().argument(1).is_identifier()
    assert "x" in names(targets)


def test_ast_subtree(cpg):
    sub = cpg.method("print_number").ast().is_call()
    assert "printf" in names(sub)


def test_ast_parent_child_roundtrip(cpg):
    kids = cpg.method("main").ast_children()
    kinds = names(kids, "kind")
    assert "BLOCK" in kinds and "METHOD_RETURN" in kinds


def test_control_structures(cpg):
    kitchen = cpg.method("cfg_kitchen_sink").ast().is_control_structure()
    cs = names(kitchen, "control_structure_type")
    for t in ("IF", "WHILE", "DO", "FOR", "SWITCH", "BREAK", "CONTINUE"):
        assert t in cs, cs


def test_cfg_next(cpg):
    nxt = cpg.literal().code_exact("42").cfg_next()
    assert "print_number(42)" in names(nxt, "code")


def test_in_call(cpg):
    calls = cpg.literal().code_exact("42").in_call()
    assert names(calls) == ["print_number"]


def test_reachable_by(cpg):
    sinks = cpg.call("free").argument(1)
    sources = cpg.literal().code_exact("NULL")
    reached = sinks.reachable_by(sources)
    assert reached.count() >= 1


def test_method_return(cpg):
    rets = cpg.method("bad").method_return()
    assert names(rets, "code") == ["RET"]


def test_field_access_sugar(cpg):
    fa = cpg.field_access()
    assert fa.count() >= 1  # cpp shapes: p->area / this.name etc.


def test_dominates(cpg):
    # the entry METHOD node dominates every CFG node in its method
    dom = cpg.method("print_number").dominates()
    assert "printf(x)" in names(dom, "code")


def test_is_static_is_dynamic(cpg):
    """CallTraversal.scala:12-17 — dispatch filters partition named calls."""
    static = cpg.call().is_static()
    dynamic = cpg.call().is_dynamic()
    from pyspark.sql import functions as F
    assert static.df.filter(F.col("dispatch_type") != "STATIC_DISPATCH").count() == 0
    assert dynamic.df.filter(F.col("dispatch_type") != "DYNAMIC_DISPATCH").count() == 0
    assert static.count() > 0 and dynamic.count() > 0


def test_to_method_return(cpg):
    """CallTraversal.scala:55-58 — call sites to the callee's METHOD_RETURN."""
    mrs = cpg.call("print_number").to_method_return()
    rows = mrs.df.select("kind", "method_id").collect()
    assert rows and all(r["kind"] == "METHOD_RETURN" for r in rows)
    callees = cpg.method("print_number").df.select("id").collect()
    assert {r["method_id"] for r in rows} == {r["id"] for r in callees}


def test_cfg_first_last(cpg):
    """MethodTraversal.scala:131-141 — cfgFirst is the entry's successor,
    cfgLast is methodReturn.cfgIn."""
    first = cpg.method("print_number").cfg_first()
    assert first.count() >= 1
    last = cpg.method("print_number").cfg_last()
    codes = names(last, "code")
    # the node feeding METHOD_RETURN: the trailing return/printf statement
    assert any("printf" in c or c.startswith("return") for c in codes), codes


def test_is_stub(cpg):
    """MethodMethods.scala:61-62 — external stubs have no body CFG; real
    definitions do."""
    stubs = cpg.method().is_stub()
    assert "printf" in names(stubs)
    not_stubs = cpg.method().is_not_stub()
    assert "print_number" in names(not_stubs)
    assert "print_number" not in names(stubs)


def test_number_of_lines(cpg):
    """MethodMethods.scala:30-36 — lineNumberEnd - lineNumber + 1."""
    rows = (cpg.method("print_number").number_of_lines()
            .df.select("number_of_lines").collect())
    assert rows and all(r["number_of_lines"] >= 1 for r in rows)


# --------------------------------------------------------------------------- #
# Binding steps — transcription of semanticcpg/src/test/scala/io/shiftleft/
# semanticcpg/language/bindingextension/BindingTests.scala:27-69 (the MockCpg
# there has one TYPE_DECL binding <init> + one method; io.test.cross.Helpers
# is the same shape: <init> + tripler).
# --------------------------------------------------------------------------- #

def test_binding_method_binding(cpg):
    """typeDecl.methodBinding — BindingTests.scala:28-33."""
    b = cpg.type_decl("Helpers").method_binding()
    assert names(b) == ["<init>", "tripler"]


def test_binding_bound_method(cpg):
    """typeDecl.methodBinding.boundMethod == typeDecl.boundMethod —
    BindingTests.scala:35-40,56-61."""
    via_binding = cpg.type_decl("Helpers").method_binding()._hop("REF", True)
    direct = cpg.type_decl("Helpers").bound_method()
    assert names(via_binding) == ["<init>", "tripler"]
    assert names(direct) == ["<init>", "tripler"]


def test_binding_referencing_binding(cpg):
    """method.referencingBinding — BindingTests.scala:42-47."""
    b = cpg.method("tripler").referencing_binding()
    assert names(b) == ["tripler"]
    assert names(b, "kind") == ["BINDING"]


def test_binding_type_decl_from_method(cpg):
    """method.referencingBinding.bindingTypeDecl and the method.bindingTypeDecl
    sugar — BindingTests.scala:49-54,63-68."""
    tds = cpg.method("tripler").referencing_binding().binding_type_decl()
    assert names(tds) == ["Helpers"]
    sugar = cpg.method("tripler").binding_type_decl()
    assert names(sugar) == ["Helpers"]


def test_binding_override_retarget(cpg):
    """The inherited-arity-2 binding on a subclass keeps the super's method
    as target while the overridden arity-1 one re-targets
    (BindingTable.scala computed-type semantics; cpp fixture geo.Circle)."""
    b = cpg.type_decl("Circle").method_binding()
    rows = sorted((r["signature"], r["method_full_name"])
                  for r in b.df.select("signature", "method_full_name").collect())
    assert rows == [
        ("int(int)", "geo.Circle.area:int(int)"),
        ("int(int,int)", "geo.Shape.area:int(int,int)"),
    ]


def test_usage_slices_match_sequential(cpg):
    """UsageSlicing v0 (UsageSlicing.scala): the distributed slice relation
    equals the sequential mirror row-for-row."""
    from pyspark.sql import functions as F
    from joern_spark.operators.slicing import usage_slices
    from joern_spark.oracle import expected_usage_slices
    got = sorted(
        tuple(r) for r in usage_slices(
            cpg.nodes.filter(F.col("parse_error") == ""), cpg.edges)
        .collect())
    assert got == expected_usage_slices()
    rels = {r[3] for r in got}
    assert {"definedBy", "invokedCall", "argToCall"} <= rels


def test_dataflow_slices_match_sequential(cpg):
    """DataFlowSlicing (DataFlowSlicing.scala:20-59): the distributed
    depth-bounded backward REACHING_DEF closure equals the sequential
    multi-source BFS mirror row-for-row."""
    from pyspark.sql import functions as F
    from joern_spark.operators.slicing import dataflow_slices
    from joern_spark.oracle import expected_dataflow_slices
    got = sorted(
        tuple("" if v is None else v for v in r) for r in dataflow_slices(
            cpg.nodes.filter(F.col("parse_error") == ""), cpg.edges)
        .collect())
    want = expected_dataflow_slices()
    assert got == want
    # the slice reaches beyond the literal seed set (definitions upstream
    # of call arguments) and keeps the RETURN -> "RET" renaming
    assert any(r[1] == "RETURN" and r[2] == "RET" for r in got) or \
        all(r[1] != "RETURN" for r in got)


def test_api_vectors_match_sequential(cpg):
    """JoernVectors BagOfAPISymbolsForMethods: per-method feature-bag
    digests equal the sequential mirror (crc32 dims bit-identical)."""
    from pyspark.sql import functions as F
    from joern_spark.operators.vectors import api_vector_summaries
    from joern_spark.oracle import expected_api_vectors
    got = sorted(
        tuple(r) for r in api_vector_summaries(
            cpg.nodes.filter(F.col("parse_error") == "")).collect())
    assert got == expected_api_vectors()


def test_bag_of_properties_shape(cpg):
    """JoernVectors BagOfPropertiesForNodes: every parsed node yields its
    label feature plus the non-empty NAME/FULL_NAME/CODE features."""
    from pyspark.sql import functions as F
    from joern_spark.operators.vectors import bag_of_properties
    bp = bag_of_properties(cpg.nodes)
    labels = bp.filter(F.col("key") == "label")
    n_nodes = cpg.nodes.filter(F.col("parse_error") == "").count()
    assert labels.count() == n_nodes
    keys = {r["key"] for r in bp.select("key").distinct().collect()}
    assert keys == {"CODE", "FULL_NAME", "NAME", "label"}
