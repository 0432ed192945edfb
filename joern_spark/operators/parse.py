"""Parse stage: source table → raw CPG node rows (+ fused intraprocedural
edges) via ``mapInPandas``.

Replicates reference pass #1 (AstCreationPass — per-file ForkJoin parts,
c2cpg/.../passes/AstCreationPass.scala:80-120) as the Spark partitioning
axis: each Arrow batch of (repo, path, commit, lang, content) rows is parsed
in-process; per-file failures degrade to a single ``parse_error`` row instead
of failing the task (at 10^12-file scale some files WILL be pathological).

When ``fuse_intraprocedural`` is on (default), the CFG / dominator / CDG /
reaching-def kernels run inside the same stage on the just-built AST — the
per-method passes of the reference (CfgCreationPass, CfgDominatorPass,
CdgPass, ReachingDefPass) collapse into the parse stage with ZERO extra
shuffle, because method locality ⊂ file locality.
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M

RAW_COLS = [f.name for f in M.RAW_NODE_SCHEMA.fields]


def _parse_one(repo: str, path: str, commit: str, lang: str, content: str,
               sha: str, fuse: bool) -> list[dict]:
    from joern_spark.frontends.astnode import flatten_file, parse_error_row

    try:
        if lang in ("c", "cpp", "c++", "h", "hpp"):
            from joern_spark.frontends.clike import parse_c_file
            roots = parse_c_file(repo, path, commit, "cpp" if lang in ("cpp", "c++", "hpp") else "c", content)
        elif lang == "java":
            from joern_spark.frontends.javasrc import parse_java_file
            roots = parse_java_file(repo, path, commit, content)
        elif lang in ("javascript", "js"):
            from joern_spark.frontends.jssrc import parse_js_file
            roots = parse_js_file(repo, path, commit, content)
        else:
            return [parse_error_row(repo, path, commit, lang, content, f"unsupported lang: {lang}")]
        rows = flatten_file(repo, path, commit, lang, content, roots, sha=sha)
        if fuse and rows:
            _fuse_intra_edges(rows)
        return rows
    except RecursionError:
        return [parse_error_row(repo, path, commit, lang, content, "recursion limit")]
    except Exception as e:  # noqa: BLE001 — per-file isolation by design
        return [parse_error_row(repo, path, commit, lang, content, f"{type(e).__name__}: {e}")]


def _fuse_intra_edges(rows: list[dict]) -> None:
    """Run the per-method control-flow kernels and attach edge arrays to the
    METHOD rows (reaching-def is a separate stage for now)."""
    from joern_spark.operators.controlflow import cfg_for_method, dominator_edges

    by_method: dict[int, list[dict]] = {}
    methods = []
    for r in rows:
        if r["kind"] == M.METHOD:
            methods.append(r)
        if r["method_idx"] >= 0:
            by_method.setdefault(r["method_idx"], []).append(r)
    cfg_code, dom_code, pdom_code, cdg_code, rdef_code = (
        M.IE_CODE[M.CFG], M.IE_CODE[M.DOMINATE], M.IE_CODE[M.POST_DOMINATE],
        M.IE_CODE[M.CDG], M.IE_CODE[M.REACHING_DEF])
    for m in methods:
        mrows = by_method.get(m["node_idx"], []) + [m]
        cfg = cfg_for_method(mrows, m)
        srcs = [s for s, _, _ in cfg]
        dsts = [d for _, d, _ in cfg]
        labels = [cfg_code] * len(cfg)
        variables: list = [None] * len(cfg)
        exit_idx = next((r["node_idx"] for r in mrows
                         if r["kind"] == M.METHOD_RETURN and r["parent_idx"] == m["node_idx"]), None)
        if cfg and exit_idx is not None:
            kind_of = {r["node_idx"]: r["kind"] for r in mrows}
            dom, pdom, cdg = dominator_edges(cfg, m["node_idx"], exit_idx,
                                             kind_of=kind_of)
            for pairs, code in ((dom, dom_code), (pdom, pdom_code), (cdg, cdg_code)):
                for s, d in pairs:
                    srcs.append(s); dsts.append(d); labels.append(code); variables.append(None)
        try:
            from joern_spark.operators.dataflow import reaching_def_edges
            for s, d, v in reaching_def_edges(mrows, m, cfg):
                srcs.append(s); dsts.append(d); labels.append(rdef_code); variables.append(v)
        except ImportError:
            pass
        m["ie_src"], m["ie_dst"], m["ie_label"], m["ie_var"] = srcs, dsts, labels, variables


def parse_source(source: DataFrame, fuse_intraprocedural: bool = True) -> DataFrame:
    """source(repo,path,commit,lang,content) → raw node rows.

    The sha256 lineage column is computed JVM-side (F.sha2) and carried
    through the Python workers untouched — the per-row invariant.
    """
    src = source.withColumn("sha256", F.sha2(F.col("content"), 256))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sys.setrecursionlimit(50_000)
        for pdf in batches:
            out: list[dict] = []
            for t in pdf.itertuples(index=False):
                out.extend(_parse_one(t.repo, t.path, t.commit, t.lang,
                                      t.content, t.sha256, fuse_intraprocedural))
            if out:
                yield pd.DataFrame(out, columns=RAW_COLS)

    return src.mapInPandas(run, schema=M.RAW_NODE_SCHEMA)


# --------------------------------------------------------------------------- #
# Id resolution + edge derivation — all JVM-side expressions, no UDFs.
# --------------------------------------------------------------------------- #

def _fid(idx_col: str):
    """Deterministic 64-bit id from (repo,path,commit,idx) — distributed-safe
    replacement for the reference's sequence ids."""
    return F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"), F.col(idx_col))


def with_ids(raw: DataFrame) -> DataFrame:
    """Attach global ids; drop parse-error rows into a side relation callers
    can split off via ``parse_error != ''``."""
    return (
        raw.withColumn("id", _fid("node_idx"))
        .withColumn("parent_id", F.when(F.col("parent_idx") >= 0, _fid("parent_idx")))
        .withColumn("method_id", F.when(F.col("method_idx") >= 0, _fid("method_idx")))
        .withColumn("ref_id", F.when(F.col("ref_idx") >= 0, _fid("ref_idx")))
    )


def ast_edges(nodes: DataFrame) -> DataFrame:
    """All projection-derived edges in ONE scan of the parse output: AST +
    typed shortcut + ARGUMENT + REF + CONTAINS + EVAL_TYPE + SOURCE_FILE +
    PARAMETER_LINK. Each row emits its candidate edges into an array that is
    exploded and null-filtered — a single narrow stage instead of eight
    union branches re-scanning the cache (no join, no shuffle: the parser
    resolved everything file-locally, and EVAL_TYPE/SOURCE_FILE targets are
    pure id-hash functions of row columns).

    Reference equivalents: Ast.withChild/argEdges (Ast.scala:85-121),
    VariableScopeManager REF links (:334-358), ContainsEdgePass.scala:15-48
    (projection via parser-carried method_idx), TypeEvalPass.scala:9-42,
    FileCreationPass.scala:41-55, MethodDecoratorPass.scala:50.
    """
    from joern_spark.operators.base import EVAL_TYPE_KINDS, file_id, type_id

    n = nodes.filter(F.col("parse_error") == "")
    null_s = F.lit(None).cast("string")

    def edge(cond, src, dst, label, variable=None):
        e = F.struct(src.cast("long").alias("src"), dst.cast("long").alias("dst"),
                     (label if not isinstance(label, str) else F.lit(label)).alias("label"),
                     (variable if variable is not None else null_s).alias("variable"))
        return F.when(cond, e)

    role_map = F.create_map(*[F.lit(x) for kv in M.ROLE_EDGE_LABELS.items() for x in kv])
    candidates = F.array(
        # BINDING children attach via BINDS (vtable entry), not AST
        # (BindingTableAdapterImpls.scala: typeDecl -BINDS-> binding)
        edge(F.col("parent_id").isNotNull() & (F.col("kind") != M.BINDING),
             F.col("parent_id"), F.col("id"), M.AST),
        edge(F.col("parent_id").isNotNull() & (F.col("kind") == M.BINDING),
             F.col("parent_id"), F.col("id"), M.BINDS),
        edge((F.col("role") != "") & F.col("parent_id").isNotNull(),
             F.col("parent_id"), F.col("id"), role_map[F.col("role")]),
        # ARGUMENT comes only from CALL/RETURN parents: the parser assigns
        # arg_index only under call-like parents (CallAstBuilder.scala:25-55)
        edge((F.col("arg_index") >= 0) & F.col("parent_id").isNotNull(),
             F.col("parent_id"), F.col("id"), M.ARGUMENT,
             F.col("arg_index").cast("string")),
        edge(F.col("ref_id").isNotNull(), F.col("id"), F.col("ref_id"), M.REF),
        edge(F.col("method_id").isNotNull()
             & (~F.col("kind").isin(M.METHOD, M.METHOD_PARAMETER_IN,
                                    M.METHOD_PARAMETER_OUT, M.METHOD_RETURN,
                                    M.LOCAL, M.MODIFIER, M.TYPE_DECL, M.MEMBER)),
             F.col("method_id"), F.col("id"), M.CONTAINS),
        edge(F.col("kind").isin(EVAL_TYPE_KINDS)
             & (F.col("type_full_name") != "") & F.col("type_full_name").isNotNull(),
             F.col("id"), type_id(F.col("type_full_name")), M.EVAL_TYPE),
        edge(F.col("kind").isin(M.METHOD, M.TYPE_DECL) & (F.col("path") != ""),
             F.col("id"), file_id(), M.SOURCE_FILE),
        edge(F.col("kind") == M.METHOD_PARAMETER_IN,
             F.col("id"), F.xxhash64(F.lit("POUT"), F.col("id")), M.PARAMETER_LINK),
    )
    return (n.select(F.explode(candidates).alias("e"))
            .filter(F.col("e").isNotNull())
            .select("e.src", "e.dst", "e.label", "e.variable"))


def derived_edges(nodes: DataFrame) -> DataFrame:
    """ast_edges ∪ intra_edges in ONE scan of the parse parquet.

    The two relations read overlapping columns (repo/path/commit/kind plus
    the per-row projection fields vs the METHOD rows' fused ie_* arrays); at
    the 100M+-edge materialization the second pass over the node table is
    pure wasted read bandwidth — the single non-scaling resource on a
    single-box stand-in, and the write tail the scaling target is bound by.
    Here the per-row candidate structs and the transformed ie_* zip land in
    one concat'd array behind one generator, so the node parquet is decoded
    exactly once and the whole derivation stays in one codegen stage.
    """
    from joern_spark.operators.base import EVAL_TYPE_KINDS, file_id, type_id

    n = nodes.filter(F.col("parse_error") == "")
    null_s = F.lit(None).cast("string")

    def edge(cond, src, dst, label, variable=None):
        e = F.struct(src.cast("long").alias("src"), dst.cast("long").alias("dst"),
                     (label if not isinstance(label, str) else F.lit(label)).alias("label"),
                     (variable if variable is not None else null_s).alias("variable"))
        return F.when(cond, e)

    role_map = F.create_map(*[F.lit(x) for kv in M.ROLE_EDGE_LABELS.items() for x in kv])
    candidates = F.array(
        # BINDING children attach via BINDS (vtable entry), not AST
        # (BindingTableAdapterImpls.scala: typeDecl -BINDS-> binding)
        edge(F.col("parent_id").isNotNull() & (F.col("kind") != M.BINDING),
             F.col("parent_id"), F.col("id"), M.AST),
        edge(F.col("parent_id").isNotNull() & (F.col("kind") == M.BINDING),
             F.col("parent_id"), F.col("id"), M.BINDS),
        edge((F.col("role") != "") & F.col("parent_id").isNotNull(),
             F.col("parent_id"), F.col("id"), role_map[F.col("role")]),
        edge((F.col("arg_index") >= 0) & F.col("parent_id").isNotNull(),
             F.col("parent_id"), F.col("id"), M.ARGUMENT,
             F.col("arg_index").cast("string")),
        edge(F.col("ref_id").isNotNull(), F.col("id"), F.col("ref_id"), M.REF),
        edge(F.col("method_id").isNotNull()
             & (~F.col("kind").isin(M.METHOD, M.METHOD_PARAMETER_IN,
                                    M.METHOD_PARAMETER_OUT, M.METHOD_RETURN,
                                    M.LOCAL, M.MODIFIER, M.TYPE_DECL, M.MEMBER)),
             F.col("method_id"), F.col("id"), M.CONTAINS),
        edge(F.col("kind").isin(EVAL_TYPE_KINDS)
             & (F.col("type_full_name") != "") & F.col("type_full_name").isNotNull(),
             F.col("id"), type_id(F.col("type_full_name")), M.EVAL_TYPE),
        edge(F.col("kind").isin(M.METHOD, M.TYPE_DECL) & (F.col("path") != ""),
             F.col("id"), file_id(), M.SOURCE_FILE),
        edge(F.col("kind") == M.METHOD_PARAMETER_IN,
             F.col("id"), F.xxhash64(F.lit("POUT"), F.col("id")), M.PARAMETER_LINK),
    )
    label_lut = F.array(*[F.lit(x) for x in M.IE_LABELS])
    ie = F.when(
        (F.col("kind") == M.METHOD) & F.col("ie_src").isNotNull(),
        F.transform(
            F.arrays_zip("ie_src", "ie_dst", "ie_label", "ie_var"),
            lambda x: F.struct(
                F.xxhash64("repo", "path", "commit", x["ie_src"]).alias("src"),
                F.xxhash64("repo", "path", "commit", x["ie_dst"]).alias("dst"),
                F.element_at(label_lut, x["ie_label"] + 1).alias("label"),
                x["ie_var"].alias("variable")))
    ).otherwise(F.array().cast("array<struct<src:bigint,dst:bigint,label:string,variable:string>>"))
    return (n.select(F.explode(F.concat(candidates, ie)).alias("e"))
            .filter(F.col("e").isNotNull())
            .select("e.src", "e.dst", "e.label", "e.variable"))


def intra_edges(nodes: DataFrame) -> DataFrame:
    """Explode the fused per-method parallel edge arrays into global-id edge
    rows; the label dictionary (M.IE_LABELS) is decoded JVM-side."""
    label_lut = F.array(*[F.lit(x) for x in M.IE_LABELS])
    m = nodes.filter((F.col("kind") == M.METHOD) & F.col("ie_src").isNotNull())
    # inline() expands the zipped struct array in one generator step —
    # measurably cheaper than explode-then-field-extract on the 100M+-row
    # edge materialization (no intermediate struct column in codegen)
    e = m.select("repo", "path", "commit",
                 F.inline(F.arrays_zip("ie_src", "ie_dst", "ie_label", "ie_var")))
    return e.select(
        F.xxhash64("repo", "path", "commit", F.col("ie_src")).alias("src"),
        F.xxhash64("repo", "path", "commit", F.col("ie_dst")).alias("dst"),
        F.element_at(label_lut, F.col("ie_label") + 1).alias("label"),
        F.col("ie_var").alias("variable"),
    )
