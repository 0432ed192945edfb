"""Quality floors for the approximate data-pipeline operators.

Correctness (Spark == DuckDB oracle) is the driver's job; these tests gate
the *quality* of the approximate paths — an LSH index whose recall
collapses must fail CI, not just report a low number.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def spark():
    from joern_spark.session import get_spark
    yield get_spark(master="local[8]", app="test_datapipe", shuffle_partitions=8)


@pytest.mark.skipif(not os.path.exists(f"{SF_DIR}/embeddings.parquet"),
                    reason="testdata not present")
def test_ann_lsh_recall_floor(spark):
    """The L-table multi-probe LSH index must reach mean recall@3 >= 0.80
    measured against exact brute force on the real sf corpus (the
    near-uniform synthetic vectors are the LSH worst case, so this floor is
    conservative for clustered real embeddings)."""
    from joern_spark.datapipe import knn_lsh_recall
    rows = knn_lsh_recall(spark, SF_DIR).collect()
    assert rows, "no probes scored"
    mean_bp = sum(r.recall_bp for r in rows) / len(rows)
    assert mean_bp >= 8000, (
        f"LSH mean recall@3 {mean_bp/100:.1f}% < 80% floor: "
        f"{[(r.probe_id, r.recall_bp) for r in rows]}")
    # no probe may collapse to zero — distance-1 multi-probe across L
    # independent tables makes a total miss vanishingly unlikely
    assert min(r.recall_bp for r in rows) > 0
