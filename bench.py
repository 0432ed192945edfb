"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "files_per_sec": ...}

Headline: end-to-end CPG triple extraction (parse -> base link -> call graph
-> intraprocedural CFG/DDG) over a JVM-generated synthetic C corpus
(deliberately skewed: mega-repo + hot external symbols, FIXTURES.md §8),
plus the training-data operators at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default all)
  BENCH_FILES          synthetic corpus size (default 4000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from pyspark.sql import functions as F

    from joern_spark.corpus import bench_source
    from joern_spark.plans.pipeline import build_cpg
    from joern_spark.session import get_spark
    from joern_spark.datapipe import DATA_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("BENCH_FILES", "4000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1

    spark = get_spark(app="joern_spark_bench")
    timings: dict[str, float] = {}
    t_all = time.time()

    # ---- headline: CPG construction throughput --------------------------- #
    t0 = time.time()
    src = bench_source(spark, n_files)
    out = build_cpg(spark, src)
    n_edges = out["edges"].count()
    n_nodes = out["nodes"].count()
    build_sec = time.time() - t0
    timings["cpg_build"] = round(build_sec, 3)
    # stage split: the parse→triples extraction stage (per-file, the
    # throughput-critical scalable stage) vs linking + materialization (a
    # fixed-latency DAG tail at small corpus sizes)
    timings.update(out.get("timings", {}))
    files_per_sec = round(n_files / build_sec, 2)

    # a traversal-style query over the built CPG: top callees by in-degree
    t0 = time.time()
    nodes, edges = out["nodes"], out["edges"]
    methods = nodes.filter(F.col("kind") == "METHOD").select(
        F.col("id").alias("dst"), F.col("full_name").alias("callee"))
    (edges.filter(F.col("label") == "CALL").join(methods, "dst")
     .groupBy("callee").count().orderBy(F.desc("count")).limit(20).collect())
    timings["cpg_top_callees"] = round(time.time() - t0, 3)

    # CFG reachability footprint: edges per method, p50/p99-ish aggregate
    t0 = time.time()
    (edges.filter(F.col("label") == "CFG")
     .join(nodes.select(F.col("id").alias("src"),
                        F.col("method_id").alias("mid")), "src")
     .groupBy("mid").count().agg(F.avg("count"), F.max("count")).collect())
    timings["cpg_cfg_stats"] = round(time.time() - t0, 3)

    for df in (nodes, edges):
        try:
            df.unpersist()
        except Exception:
            pass

    # ---- training-data operators at sf_dir ------------------------------- #
    if os.environ.get("BENCH_CPG_ONLY"):
        total = round(time.time() - t_all, 3)
        print(json.dumps({
            "metric": "cpg_build_total", "value": total, "unit": "sec",
            "queries": timings, "sf": sf, "bench_files": n_files,
            "cpg_nodes": n_nodes, "cpg_edges": n_edges,
            "files_per_sec": files_per_sec,
        }))
        return
    # Host CPU drifts ~3x with load (BENCH.md): a single sample per query
    # makes round-over-round deltas pure noise (VERDICT r2). Sample each
    # query SAMPLES times in alternating order (so a slow-host window hits
    # all queries, not one) and report best-of plus the per-query samples.
    samples = int(os.environ.get("BENCH_QUERY_SAMPLES", "3"))
    all_samples: dict[str, list[float]] = {name: [] for name in DATA_QUERIES}
    for _ in range(samples):
        for name, (fn, _sql) in DATA_QUERIES.items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            all_samples[name].append(round(time.time() - t0, 3))
    for name, ts in all_samples.items():
        timings[name] = min(ts)

    total = round(time.time() - t_all, 3)
    print(json.dumps({
        "metric": "cpg_build_and_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_samples": all_samples,
        "sf": sf,
        "bench_files": n_files,
        "cpg_nodes": n_nodes,
        "cpg_edges": n_edges,
        "files_per_sec": files_per_sec,
    }))


if __name__ == "__main__":
    main()
