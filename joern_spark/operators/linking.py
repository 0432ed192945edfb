"""Entity linking & canonicalization of cross-file symbols.

The reference resolves cross-file method symbols by exact-fullname hash-map
lookups inside one JVM (StaticCallLinker.scala:23-28, DynamicCallLinker's
methodMap at DynamicCallLinker.scala:40-51) and leaves unresolvable call
sites pointing at external stubs named with sentinel conventions
(`<unresolvedNamespace>.foo:<unresolvedSignature>(2)`, Defines.scala:11-22).
Distributed, we go one step further (this is the north rule's entity-linking
stage): unresolved stub symbols are *candidate-aliased* to compatible
internal definitions, the alias-pair graph is collapsed with a
large-star/small-star connected-components loop, and the per-component
canonical id (an internal definition when one exists) is applied back to the
CALL edges.

Skew handling:
* Candidate pairs join stubs↔internals on the bare method name. Method names
  are Zipfian (`get`, `main`, `init`…); a global name-equi-join would square
  the hot keys. Names above ``HOT_NAME_FREQ`` are therefore *excluded from
  linking*: at corpus scale a name defined in >100 distinct places carries no
  linkage signal (any pairing would be a guess), and excluding them is what
  keeps the join skew-free. The hot-name set itself is tiny → the cold-name
  filter ships as a broadcast — the distributed analogue of the reference's
  in-memory methodMap.
* Applying the canonical map to the edge relation is an N:1 join against a
  small mapping → broadcast; at dictionary sizes beyond broadcast reach the
  salted-join helper (joern_spark.functions.salted_join) spreads residual
  hot keys.

Connected components: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — each iteration is
two groupBy/join rounds over the pair list, converges in O(log n) rounds,
checkpointed per round to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M

HOT_NAME_FREQ = 100


# --------------------------------------------------------------------------- #
# Connected components — large-star / small-star.
# --------------------------------------------------------------------------- #

def connected_components(pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    """``pairs(u, v)`` undirected long-id edges → ``(node, root)`` with root =
    min id of the node's component. Isolated nodes are absent (callers union
    an identity map when needed)."""
    def _swap(df):
        return df.select(F.col("v").alias("u"), F.col("u").alias("v"))

    def _large_star(df):
        # symmetrize, then hang every larger neighbor of u off the minimum
        # of Γ(u) ∪ {u}
        both = df.union(_swap(df)).distinct()
        mins = (both.groupBy("u").agg(F.min("v").alias("mn"))
                .withColumn("mn", F.least("mn", F.col("u"))))
        return (both.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("mn").alias("v"))
                .distinct())

    def _small_star(df):
        # orient high→low, then hang every low neighbor (and u) off the
        # minimum of the low neighborhood
        d = (df.select(F.greatest("u", "v").alias("u"),
                       F.least("u", "v").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct())
        mins = d.groupBy("u").agg(F.min("v").alias("mn"))
        return (d.join(mins, "u")
                .select(F.col("v").alias("u"), F.col("mn").alias("v"))
                .union(mins.select("u", F.col("mn").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    def _sig(df):
        # order-insensitive set signature in ONE job: (count, xor of row
        # hashes). Both iterates are distinct sets, so equal signatures ⇔
        # equal sets up to a 64-bit hash collision — vs the previous two
        # exceptAll jobs per iteration, this halves driver round-trips in
        # the loop (the CC tail is fixed-latency-dominated at sandbox sizes).
        r = df.agg(F.count("*").alias("c"),
                   F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
        return (r["c"], r["h"])

    e = (pairs.select("u", "v").filter(F.col("u") != F.col("v"))
         .distinct().localCheckpoint(eager=True))
    sig = _sig(e)
    converged = False
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sig = _sig(new_e)
        e = new_e
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # a partially merged component map would silently yield wrong roots
        # downstream (canonicalization would rewrite edges through an
        # inconsistent mapping) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (component diameter exceeds 2^max_iter)")

    # at the fixpoint the edge list is a star: (node, root) with root < node
    return e.groupBy("u").agg(F.min("v").alias("root")).select(
        F.col("u").alias("node"), "root")


# --------------------------------------------------------------------------- #
# Candidate alias pairs over the method dimension.
# --------------------------------------------------------------------------- #

def _stub_arity(col):
    """Arity encoded in `<unresolvedSignature>(n)` fullnames, else null
    (regexp_extract yields '' on no match; ANSI mode forbids ''→int casts)."""
    ex = F.regexp_extract(col, r"<unresolvedSignature>\((\d+)\)", 1)
    return F.when(ex != "", ex.cast("int"))


def candidate_alias_pairs(dim: DataFrame,
                          hot_name_freq: int = HOT_NAME_FREQ) -> DataFrame:
    """(u, v) symbol-id pairs linking unresolved external stubs to compatible
    internal definitions. ``dim`` = the full method dimension
    (m_fn, m_id, m_name, is_external, m_parent, m_sig).

    Rules (all exact-name):
      * stub fullname carries `<unresolvedNamespace>` / `<unresolvedSignature>`
        → pair with any internal method of the same name whose declared arity
        matches the stub's recorded arity (when present);
      * bare-name stubs (C-style, fullname == name) → internal same-name.
    Hot names (freq > hot_name_freq among internals) are excluded from
    global pairing — at corpus scale they are library symbols with a
    broadcast-dictionary fast path, not linkage candidates.
    """
    stubs = (dim.filter(F.col("is_external")
                        & ~F.col("m_name").startswith("<operator>")
                        & (F.col("m_name") != ""))
             .filter(F.col("m_fn").contains(M.UNRESOLVED_NAMESPACE)
                     | F.col("m_fn").contains(M.UNRESOLVED_SIGNATURE)
                     | (F.col("m_fn") == F.col("m_name")))
             .select(F.col("m_id").alias("u"), F.col("m_name").alias("name"),
                     _stub_arity(F.col("m_fn")).alias("stub_arity")))
    internals = (dim.filter(~F.col("is_external") & (F.col("m_name") != ""))
                 .select(F.col("m_id").alias("v"), F.col("m_name").alias("name"),
                         F.col("m_sig").alias("sig")))

    freq = internals.groupBy("name").agg(F.count("*").alias("nfreq"))
    cold = freq.filter(F.col("nfreq") <= hot_name_freq).select("name")
    # cold-name dictionary is ∝ |distinct names| — method-scale, so the join
    # strategy is AQE-decided rather than force-broadcast
    # (static_call_edges precedent in operators/callgraph.py).
    internals = internals.join(cold, "name")

    sig_inner = F.regexp_extract("sig", r"\((.*)\)", 1)
    sig_arity = F.when(sig_inner == "", F.lit(0)).otherwise(
        F.size(F.split(sig_inner, ",")))
    arity_ok = (F.col("stub_arity").isNull()
                | (F.col("stub_arity") == sig_arity)
                | (F.col("sig") == ""))
    return (stubs.join(internals, "name")
            .filter(arity_ok)
            .select("u", "v"))


def canonical_symbol_map(dim: DataFrame,
                         pairs: DataFrame | None = None) -> DataFrame:
    """(m_id → canon_id, canon_fn): per alias component, the canonical symbol
    is the lexicographically-first internal definition (falling back to the
    smallest id). Symbols outside any component map to themselves (identity
    rows are omitted — consumers left-join and coalesce)."""
    pairs = pairs if pairs is not None else candidate_alias_pairs(dim)
    pairs = pairs.persist()
    if pairs.isEmpty():
        # nothing to link (e.g. a corpus with no unresolved stubs) — skip the
        # iterative CC loop entirely, mirroring the reference's early exit
        # when no dynamic call sites exist (DynamicCallLinker.scala:56-59)
        return pairs.sparkSession.createDataFrame(
            [], "m_id long, canon_id long, canon_fn string")
    cc = connected_components(pairs)

    members = cc.union(
        cc.select(F.col("root").alias("node"), F.col("root").alias("root"))
    ).distinct()
    with_meta = members.join(
        dim.select(F.col("m_id").alias("node"), "m_fn", "is_external"), "node")
    canon = (with_meta.groupBy("root")
             .agg(F.min(F.when(~F.col("is_external"),
                               F.struct("m_fn", F.col("node").alias("m_id"))))
                  .alias("internal"),
                  F.min(F.struct("m_fn", F.col("node").alias("m_id"))).alias("any"))
             .select("root",
                     F.coalesce(F.col("internal.m_id"), F.col("any.m_id")).alias("canon_id"),
                     F.coalesce(F.col("internal.m_fn"), F.col("any.m_fn")).alias("canon_fn")))
    # Only external stubs are ever re-pointed. A shared unresolved stub can
    # bridge two same-name internal definitions into one CC component; emitting
    # mapping rows for the internal members would let canonicalize_call_edges
    # rewrite correctly static-linked CALL edges from one internal method onto
    # another. The reference never repoints a resolved internal target
    # (StaticCallLinker.scala:23-28 links only by exact fullname), so the map
    # covers stub ids only.
    return (with_meta.filter(F.col("is_external")).join(canon, "root")
            .filter(F.col("node") != F.col("canon_id"))
            .select(F.col("node").alias("m_id"), "canon_id", "canon_fn"))


def canonicalize_call_edges(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite CALL-edge targets through the canonical map (N:1 join; mapping
    row count is bounded by the stub dimension — still ∝ |methods|, so the
    physical strategy is AQE-decided, not force-broadcast
    (static_call_edges precedent in operators/callgraph.py)."""
    m = mapping.select(F.col("m_id").alias("dst"), "canon_id")
    calls = edges.filter(F.col("label") == M.CALL_EDGE)
    rest = edges.filter(F.col("label") != M.CALL_EDGE)
    rewritten = (calls.join(m, "dst", "left")
                 .select("src",
                         F.coalesce("canon_id", "dst").alias("dst"),
                         "label", "variable"))
    return rest.unionByName(rewritten)
