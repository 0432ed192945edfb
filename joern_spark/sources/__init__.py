"""Source-table readers and graph-table sinks.

Input contract (BASELINE.json input_hint): a table of source-code
repositories with columns ``(repo, path, commit, lang, content)``. At
production scale this is an Iceberg table; this sandbox has no Iceberg
runtime jar, so the implementation reads/writes parquet directory tables
through the SAME ``spark.read.format(...)`` surface — switching to Iceberg
is a format-string + catalog-config change, no pipeline change
(``SPARK_GRAFT_TABLE_FORMAT=iceberg`` env opts in when the runtime has it).

The sink materializes the graph per the north rule: nodes/edges partitioned
(by lang; repo-bucketed ordering within files), plus per-partition lineage
metric rows next to the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from joern_spark import model as M

TABLE_FORMAT = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")

SOURCE_COLS = [f.name for f in M.SOURCE_SCHEMA.fields]


def read_source_table(spark: SparkSession, location: str,
                      langs: list[str] | None = None,
                      repos: list[str] | None = None,
                      partitions: int | None = None) -> DataFrame:
    """Read and validate the source table; lang/repo predicates are plain
    filters so they push down to the scan (partition pruning when the table
    is partitioned on them). The explicit repartition by (repo, lang) is the
    north rule's layout contract for the parse stage: files of one repo+lang
    land together, so per-partition parser state (one grammar per language)
    is reused across an Arrow batch."""
    df = spark.read.format(TABLE_FORMAT).load(location)
    missing = [c for c in SOURCE_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"source table at {location} lacks columns {missing}")
    df = df.select(*SOURCE_COLS)
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    if repos:
        df = df.filter(F.col("repo").isin(repos))
    if partitions:
        df = df.repartition(partitions, "repo", "lang")
    return df


def write_graph_tables(out: dict[str, DataFrame], location: str,
                       mode: str = "overwrite") -> None:
    """Materialize {nodes, edges, canonical} + metrics as partitioned tables.

    Nodes partition on lang (the unit of downstream per-language analysis)
    and sort within files by (repo, full_name) — the parquet stand-in for
    Iceberg's bucketed sort order on method fullname: fullname-keyed lookups
    touch few row groups via min/max stats."""
    from joern_spark.plans.pipeline import partition_metrics

    nodes, edges = out["nodes"], out["edges"]
    (nodes.sortWithinPartitions("repo", "full_name")
     .write.mode(mode).format(TABLE_FORMAT)
     .partitionBy("lang").save(os.path.join(location, "nodes")))
    (edges.write.mode(mode).format(TABLE_FORMAT)
     .partitionBy("label").save(os.path.join(location, "edges")))
    if out.get("canonical") is not None:
        (out["canonical"].write.mode(mode).format(TABLE_FORMAT)
         .save(os.path.join(location, "canonical")))
    # Failed parses are the expected case at scale (parse.py docstring):
    # build_cpg splits them out of `nodes`, so they must (a) be persisted as
    # their own table and (b) feed the lineage metrics — otherwise the
    # documented sha_rollup/n_files equality with source_sha_rollup silently
    # breaks as soon as one file fails to parse, and failed files vanish.
    metrics_input = nodes.filter(F.col("node_idx") >= 0)
    errors = out.get("errors")
    if errors is not None:
        (errors.write.mode(mode).format(TABLE_FORMAT)
         .save(os.path.join(location, "errors")))
        metrics_input = metrics_input.unionByName(
            errors.filter(F.col("node_idx") >= 0))
    (partition_metrics(metrics_input)
     .write.mode(mode).format(TABLE_FORMAT)
     .save(os.path.join(location, "metrics")))


def read_graph_tables(spark: SparkSession, location: str) -> dict[str, DataFrame]:
    out = {
        "nodes": spark.read.format(TABLE_FORMAT).load(os.path.join(location, "nodes")),
        "edges": spark.read.format(TABLE_FORMAT).load(os.path.join(location, "edges")),
        "metrics": spark.read.format(TABLE_FORMAT).load(os.path.join(location, "metrics")),
    }
    for extra in ("canonical", "errors"):
        p = os.path.join(location, extra)
        if os.path.isdir(p):
            out[extra] = spark.read.format(TABLE_FORMAT).load(p)
    return out
