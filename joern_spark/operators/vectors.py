"""Feature-bag embeddings over the CPG — the JoernVectors analogue
(reference: joern-cli/.../JoernVectors.scala:16-131, "Pattern-based
Vulnerability Discovery" ch. 3 feature hashing).

Two generators, re-expressed as aggregations instead of per-object
iterators:

* ``bag_of_api_symbols`` — BagOfAPISymbolsForMethods (JoernVectors.scala:
  42-47): one sparse vector per method; sub-structures are the ``code``
  strings of every AST node under the method; the vector value is the
  sub-structure's multiplicity (``vectorize``, JoernVectors.scala:99-109).
  In DataFrame terms that is exactly ``groupBy(method, code).count()`` —
  a single map-side-combinable aggregation, no Python in the loop.
* ``bag_of_properties`` — BagOfPropertiesForNodes (JoernVectors.scala:
  16-40): per AST node, the (key, value) features name/full_name/code plus
  the node label. The reference also emits the node id as a feature; ids
  here are engine-local hash ids, so the stable (path, node_idx) key
  stands in for it.

Feature -> dimension hashing: the reference uses MurmurHash3.stringHash
(JoernVectors.scala:112). Here the dimension is ``crc32(code)`` — the same
feature-hashing role, chosen because Spark's ``F.crc32`` and Python's
``zlib.crc32`` are bit-identical, so the sequential oracle mirrors the
distributed result exactly.

Scale shape: both jobs are partial-aggregating groupBys keyed by
(method, code) / (path, node_idx) — skew-free keys that co-partition with
the node table; output is proportional to distinct (object, feature)
pairs, never materialized per-pair on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M


def bag_of_api_symbols(nodes: DataFrame) -> DataFrame:
    """-> (path, method_full_name, feature, dim, count): one row per
    (internal method, distinct AST-node code); ``method.ast`` includes the
    method node itself (BagOfAPISymbolsForMethods.enumerateSubStructures).
    Keyed per method *instance* (path + fullname) like the reference's
    per-object iterator — two files each defining ``main`` yield two bags,
    not one merged bag."""
    methods = (nodes.filter((F.col("kind") == M.METHOD)
                            & ~F.col("is_external"))
               .select(F.col("id").alias("method_id"),
                       F.col("path").alias("path"),
                       F.col("full_name").alias("method_full_name")))
    in_method = nodes.select(F.col("method_id"), F.col("code"))
    self_rows = (nodes.filter((F.col("kind") == M.METHOD))
                 .select(F.col("id").alias("method_id"), F.col("code")))
    return (in_method.unionByName(self_rows)
            .join(methods, "method_id")
            .groupBy("path", "method_full_name",
                     F.col("code").alias("feature"))
            .count()
            .withColumn("dim", F.crc32(F.col("feature").cast("binary")))
            .select("path", "method_full_name", "feature", "dim", "count"))


def api_vector_summaries(nodes: DataFrame) -> DataFrame:
    """Bounded per-method digest of the API-symbol vectors — row count is
    the method count, so the full vectorization is checkable end-to-end
    without shipping every (method, feature) pair to a comparator."""
    v = bag_of_api_symbols(nodes)
    return (v.groupBy("path", "method_full_name")
            .agg(F.count("*").alias("n_features"),
                 F.sum("count").alias("total_count"),
                 F.sum(F.col("dim") * F.col("count")).alias("dim_weighted_sum")))


def bag_of_properties(nodes: DataFrame) -> DataFrame:
    """-> (path, node_idx, key, value): the per-node property features of
    BagOfPropertiesForNodes, keys sorted CODE < FULL_NAME < NAME < label
    like the reference's ``sortBy(_.getKey)`` + label suffix."""
    base = nodes.filter(F.col("parse_error") == "").select(
        "path", "node_idx", "name", "full_name", "code",
        F.col("kind").alias("label"))
    feats = F.array(
        F.struct(F.lit("CODE").alias("key"), F.col("code").alias("value")),
        F.struct(F.lit("FULL_NAME").alias("key"),
                 F.col("full_name").alias("value")),
        F.struct(F.lit("NAME").alias("key"), F.col("name").alias("value")),
        F.struct(F.lit("label").alias("key"), F.col("label").alias("value")))
    return (base.select("path", "node_idx", F.explode(feats).alias("f"))
            .select("path", "node_idx", F.col("f.key").alias("key"),
                    F.col("f.value").alias("value"))
            .filter(F.col("value") != ""))
