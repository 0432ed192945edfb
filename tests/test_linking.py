"""Entity linking / canonicalization tests (joern_spark.operators.linking)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from joern_spark import model as M


@pytest.fixture(scope="module")
def spark():
    from joern_spark.session import get_spark
    sp = get_spark(master="local[4]", app="test_linking", shuffle_partitions=8)
    yield sp


def test_connected_components_stars(spark):
    from joern_spark.operators.linking import connected_components
    # two components: {1,2,3,9} chained, {20,21}
    pairs = spark.createDataFrame(
        [(2, 1), (3, 2), (9, 3), (21, 20)], "u long, v long")
    cc = {r["node"]: r["root"]
          for r in connected_components(pairs).collect()}
    assert cc[2] == 1 and cc[3] == 1 and cc[9] == 1
    assert cc[21] == 20
    assert 1 not in cc or cc.get(1, 1) == 1


def test_canonical_aliases_match_oracle(spark):
    from joern_spark import oracle as O
    from joern_spark.corpus import fixture_source
    from joern_spark.operators.callgraph import method_dimension
    from joern_spark.operators.linking import canonical_symbol_map
    from joern_spark.plans.pipeline import build_cpg

    out = build_cpg(spark, fixture_source(spark))
    dim = method_dimension(out["nodes"])
    mp = canonical_symbol_map(dim)
    alias_fn = dim.select("m_id", F.col("m_fn").alias("alias"))
    got = {(r["alias"], r["canon_fn"])
           for r in mp.join(alias_fn, "m_id")
           .filter(F.col("alias") != F.col("canon_fn"))
           .select("alias", "canon_fn").distinct().collect()}
    want = set(O.expected_canonical_aliases())
    assert got == want
    # the cross-file Java fixture must actually exercise the stage
    assert any("tripler" in a for a, _ in want), want


def test_canonical_call_edge_rewrite(spark):
    """The CALL edge from UseHelper.run lands on the internal Helpers.tripler
    after canonicalization."""
    from joern_spark.corpus import fixture_source
    from joern_spark.plans.pipeline import build_cpg

    out = build_cpg(spark, fixture_source(spark))
    n, e = out["nodes"], out["edges"]
    caller = n.filter(F.col("full_name").contains("UseHelper.run")).select(
        F.col("id").alias("cid"))
    calls = (n.filter((F.col("kind") == M.CALL) & (F.col("name") == "tripler"))
             .select(F.col("id").alias("src")))
    targets = (e.filter(F.col("label") == M.CALL_EDGE).join(calls, "src")
               .join(n.select(F.col("id").alias("dst"),
                              F.col("full_name").alias("callee"),
                              "is_external"), "dst")
               .select("callee", "is_external").collect())
    assert targets, "tripler call site must be linked"
    assert all(not t["is_external"] for t in targets)
    assert all("Helpers.tripler" in t["callee"] for t in targets)


def test_salted_join_matches_plain_join(spark):
    from joern_spark.functions import salted_join
    big = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload"))
    dim = spark.createDataFrame([(i, f"v{i}") for i in range(7)], "k long, val string")
    got = salted_join(big, dim, "k", n_salts=4).select("payload", "val")
    want = big.join(dim, "k").select("payload", "val")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
