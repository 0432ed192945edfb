"""Base linking layer — reference passes #2-#12 (SURVEY.md §2A), re-expressed
as DataFrame ops.

Scale design note: node ids are content-derived (xxhash64 over stable keys),
so every edge whose *target identity* is a pure function of a fullname becomes
a PROJECTION instead of a join:

* EVAL_TYPE   → type id  = xxhash64('TYPE', type_full_name)
* INHERITS_FROM / ALIAS_OF → same
* SOURCE_FILE → file id  = xxhash64('FILE', repo, path, commit)
* AST link to the per-file <global> NAMESPACE_BLOCK → computable id

The reference executes all of these as batched hash-map lookups inside one
JVM (LinkingUtil.scala:35-119, batches of 100). Distributed, the projection
form eliminates the shuffle entirely. Joins remain only where *existence*
matters (TYPE→TYPE_DECL REF, anti-join stub creation, call linking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M

NODE_COLS = [f.name for f in M.RAW_NODE_SCHEMA.fields] + M.NODE_ID_COLS


def _mk_nodes(df: DataFrame, **exprs) -> DataFrame:
    """Project df into the canonical wide node schema, defaulting columns."""
    defaults = {
        "repo": F.lit(""), "path": F.lit(""), "commit": F.lit(""), "lang": F.lit(""),
        "sha256": F.lit(""), "node_idx": F.lit(-1).cast("long"),
        "parent_idx": F.lit(-1).cast("long"), "method_idx": F.lit(-1).cast("long"),
        "ref_idx": F.lit(-1).cast("long"), "kind": F.lit(""), "name": F.lit(""),
        "full_name": F.lit(""), "signature": F.lit(""), "code": F.lit(""),
        "order": F.lit(0), "arg_index": F.lit(-1), "role": F.lit(""),
        "dispatch_type": F.lit(""), "type_full_name": F.lit(M.ANY),
        "method_full_name": F.lit(""), "control_structure_type": F.lit(""),
        "jump_label": F.lit(""), "canonical_name": F.lit(""),
        "ast_parent_type": F.lit(""), "ast_parent_full_name": F.lit(""),
        "inherits_from": F.lit(None).cast("array<string>"),
        "alias_type_full_name": F.lit(""), "evaluation_strategy": F.lit(""),
        "param_index": F.lit(-1), "is_variadic": F.lit(False),
        "is_external": F.lit(False), "nargs": F.lit(-1),
        "generic_signature": F.lit(""),
        "line": F.lit(0), "line_end": F.lit(-1), "parse_error": F.lit(""),
        "ie_src": F.lit(None).cast("array<bigint>"),
        "ie_dst": F.lit(None).cast("array<bigint>"),
        "ie_label": F.lit(None).cast("array<int>"),
        "ie_var": F.lit(None).cast("array<string>"),
        "id": F.lit(None).cast("long"), "parent_id": F.lit(None).cast("long"),
        "method_id": F.lit(None).cast("long"), "ref_id": F.lit(None).cast("long"),
    }
    defaults.update(exprs)
    return df.select(*[defaults[c].alias(c) for c in NODE_COLS])


def _edge(src, dst, label, variable=None):
    return [src.alias("src"), dst.alias("dst"), F.lit(label).alias("label"),
            (F.lit(None).cast("string") if variable is None else variable).alias("variable")]


def type_id(col):
    return F.xxhash64(F.lit("TYPE"), col)


def file_id():
    return F.xxhash64(F.lit("FILE"), F.col("repo"), F.col("path"), F.col("commit"))


def nsb_id():
    return F.xxhash64(F.lit("NSB"), F.col("repo"), F.col("path"), F.col("commit"))


# --------------------------------------------------------------------------- #
# Pass 2 — TypeNodePass (x2cpg/.../frontend/TypeNodePass.scala:39-59)
# --------------------------------------------------------------------------- #

def used_type_fullnames(nodes: DataFrame) -> DataFrame:
    """All referenced type fullnames in ONE scan of the node table (the
    reference collects the same set via its TypeNodePass accumulator,
    TypeNodePass.scala:39-59). Four union branches would scan + shuffle the
    big table four times; a per-row candidate array + explode keeps it to one
    scan feeding one distinct."""
    cand = F.concat(
        F.array(
            F.col("type_full_name"),
            F.when(F.col("kind") == M.TYPE_DECL, F.col("full_name")),
            F.when(F.col("alias_type_full_name") != "", F.col("alias_type_full_name")),
        ),
        F.coalesce(F.col("inherits_from"), F.array()),
    )
    from joern_spark.operators.typerecovery import js_inherits_parents
    return (nodes.select(F.explode(cand).alias("fn"))
            # resolved/synthesized JS parent types (XInheritanceFullNamePass
            # createTypeStub) join the universe so INHERITS_FROM edges have
            # TYPE targets
            .unionByName(js_inherits_parents(nodes)
                         .select(F.col("parent_fn").alias("fn")))
            .filter((F.col("fn") != "") & F.col("fn").isNotNull())
            .distinct())


def type_nodes(nodes: DataFrame, fns: DataFrame | None = None) -> DataFrame:
    fns = fns if fns is not None else used_type_fullnames(nodes)
    return _mk_nodes(
        fns,
        id=type_id(F.col("fn")),
        kind=F.lit(M.TYPE),
        name=F.element_at(F.split(F.col("fn"), r"\."), -1),
        full_name=F.col("fn"),
        type_full_name=F.col("fn"),
    )


# Pass 12 — TypeEvalPass (x2cpg/.../base/TypeEvalPass.scala:9-42): projection.
EVAL_TYPE_KINDS = [M.METHOD_PARAMETER_IN, M.METHOD_PARAMETER_OUT, M.METHOD_RETURN,
                   M.MEMBER, M.LITERAL, M.CALL, M.LOCAL, M.IDENTIFIER, M.BLOCK,
                   M.METHOD_REF, M.TYPE_REF, M.UNKNOWN]


def eval_type_edges(nodes: DataFrame) -> DataFrame:
    n = nodes.filter(F.col("kind").isin(EVAL_TYPE_KINDS)
                     & (F.col("type_full_name") != "") & F.col("type_full_name").isNotNull())
    return n.select(*_edge(F.col("id"), type_id(F.col("type_full_name")), M.EVAL_TYPE))


# --------------------------------------------------------------------------- #
# Pass 3 — FileCreationPass (+ SOURCE_FILE edges), pass 0 — per-file
# NAMESPACE_BLOCK (MetaDataPass.scala:28-35)
# --------------------------------------------------------------------------- #

def file_dimension(nodes: DataFrame) -> DataFrame:
    """One row per source file WITHOUT a distinct/shuffle: the preorder root
    row (node_idx == 0) is unique per file by construction."""
    return nodes.filter(F.col("node_idx") == 0).select("repo", "path", "commit", "lang")


def file_nodes(files: DataFrame) -> DataFrame:
    return _mk_nodes(
        files, repo=F.col("repo"), path=F.col("path"), commit=F.col("commit"),
        lang=F.col("lang"), id=file_id(), kind=F.lit(M.FILE),
        name=F.col("path"), full_name=F.col("path"),
    )


def namespace_block_nodes(files: DataFrame) -> DataFrame:
    return _mk_nodes(
        files, repo=F.col("repo"), path=F.col("path"), commit=F.col("commit"),
        lang=F.col("lang"), id=nsb_id(), kind=F.lit(M.NAMESPACE_BLOCK),
        name=F.lit(M.GLOBAL),
        full_name=F.concat_ws(":", F.col("path"), F.lit(M.GLOBAL)),
        parent_id=file_id(),
    )


def source_file_edges(files: DataFrame) -> DataFrame:
    """NSB → FILE only: decl → FILE edges are emitted by the fused
    projection pass (operators.parse.ast_edges)."""
    return files.select(*_edge(nsb_id(), file_id(), M.SOURCE_FILE))


# --------------------------------------------------------------------------- #
# Pass 0 — MetaDataPass (x2cpg/.../frontend/MetaDataPass.scala:15-52). The
# reference emits ONE META_DATA node per CPG; distributed, the natural unit
# is one per (repo, lang) build partition — name carries the language (as in
# the reference), full_name the partition key, code the producing engine.
# --------------------------------------------------------------------------- #

def meta_data_nodes(files: DataFrame) -> DataFrame:
    parts = files.select("repo", "lang").distinct()
    return _mk_nodes(
        parts, repo=F.col("repo"), lang=F.col("lang"),
        id=F.xxhash64(F.lit("META_DATA"), F.col("repo"), F.col("lang")),
        kind=F.lit(M.META_DATA), name=F.upper(F.col("lang")),
        full_name=F.concat_ws(":", F.col("repo"), F.col("lang")),
        code=F.lit("joern_spark"),
    )


# --------------------------------------------------------------------------- #
# Pass 4 — NamespaceCreator (x2cpg/.../base/NamespaceCreator.scala:17-25):
# one NAMESPACE node per distinct NAMESPACE_BLOCK name + NSB → NAMESPACE REF.
# Namespace ids are pure hashes of the name, so the REF edges are a
# projection over the NSB dimension — no join, no shuffle beyond the tiny
# distinct for the nodes themselves.
# --------------------------------------------------------------------------- #

def namespace_id(name_col):
    return F.xxhash64(F.lit("NAMESPACE"), name_col)


def _nsb_dimension(nodes: DataFrame, files: DataFrame) -> DataFrame:
    """(nsb_id, name): the derived per-file global blocks plus any parsed
    NAMESPACE_BLOCK rows."""
    derived = files.select(nsb_id().alias("nsb_id"), F.lit(M.GLOBAL).alias("name"))
    parsed = nodes.filter(F.col("kind") == M.NAMESPACE_BLOCK).select(
        F.col("id").alias("nsb_id"), "name")
    return derived.unionByName(parsed)


def namespace_nodes(nodes: DataFrame, files: DataFrame) -> DataFrame:
    names = _nsb_dimension(nodes, files).select("name").distinct()
    return _mk_nodes(
        names, id=namespace_id(F.col("name")), kind=F.lit(M.NAMESPACE),
        name=F.col("name"), full_name=F.col("name"),
    )


def namespace_ref_edges(nodes: DataFrame, files: DataFrame) -> DataFrame:
    d = _nsb_dimension(nodes, files)
    return d.select(*_edge(F.col("nsb_id"), namespace_id(F.col("name")), M.REF))


# --------------------------------------------------------------------------- #
# CAPTURE edges — METHOD_REF → captured outer LOCAL / PARAMETER
# (x2cpg/.../Ast.scala:104 captureEdges; closures get `<lambda>N` names per
# Defines.scala:35). A capture is an identifier USE inside one method whose
# REF target declaration lives in a DIFFERENT (enclosing) method; the edge
# hangs off the closure's METHOD_REF (the METHOD's AST parent).
# --------------------------------------------------------------------------- #

def capture_edges(nodes: DataFrame) -> DataFrame:
    uses = (nodes.filter((F.col("kind") == M.IDENTIFIER)
                         & F.col("ref_id").isNotNull()
                         & F.col("method_id").isNotNull())
            .select(F.col("method_id").alias("use_mid"), "ref_id"))
    decls = (nodes.filter(F.col("kind").isin(M.LOCAL, M.METHOD_PARAMETER_IN))
             .select(F.col("id").alias("ref_id"),
                     F.col("method_id").alias("decl_mid")))
    captured = (uses.join(decls, "ref_id")
                .filter(F.col("use_mid") != F.col("decl_mid"))
                .select(F.col("use_mid").alias("inner_mid"), "ref_id")
                .distinct())
    # the closure's METHOD_REF is the inner METHOD's AST parent
    mref_ids = nodes.filter(F.col("kind") == M.METHOD_REF).select(
        F.col("id").alias("mref_id"))
    inner = (nodes.filter((F.col("kind") == M.METHOD)
                          & F.col("parent_id").isNotNull())
             .select(F.col("id").alias("inner_mid"),
                     F.col("parent_id").alias("mref_id"))
             .join(mref_ids, "mref_id"))
    return (captured.join(inner, "inner_mid")
            .select(*_edge(F.col("mref_id"), F.col("ref_id"), M.CAPTURE)))


# --------------------------------------------------------------------------- #
# Pass 5 — TypeDeclStubCreator (left-anti join, TypeDeclStubCreator.scala:24-34)
# --------------------------------------------------------------------------- #

def type_decl_stubs(nodes: DataFrame, fns: DataFrame | None = None) -> DataFrame:
    fns = fns if fns is not None else used_type_fullnames(nodes)
    decls = nodes.filter(F.col("kind") == M.TYPE_DECL).select(
        F.col("full_name").alias("fn")).distinct()
    missing = fns.join(decls, "fn", "left_anti")
    return _mk_nodes(
        missing, id=F.xxhash64(F.lit("TYPE_DECL_STUB"), F.col("fn")),
        kind=F.lit(M.TYPE_DECL),
        name=F.element_at(F.split(F.col("fn"), r"\."), -1),
        full_name=F.col("fn"), is_external=F.lit(True),
    )


def type_ref_edges(fns: DataFrame, type_decl_dim: DataFrame) -> DataFrame:
    """REF: TYPE → TYPE_DECL by fullname (TypeRefPass.scala:16-29). TYPE node
    ids are pure functions of the fullname, so this is a join of two SMALL
    dimensions (distinct fullnames × distinct decls) — the big node table is
    never touched."""
    types = fns.select(type_id(F.col("fn")).alias("src"), F.col("fn"))
    return (types.join(type_decl_dim, "fn")
            .select("src", F.col("decl_id").alias("dst"),
                    F.lit(M.REF).alias("label"),
                    F.lit(None).cast("string").alias("variable")))


def type_decl_dimension(nodes: DataFrame, fns: DataFrame) -> DataFrame:
    """(fn, decl_id) for every TYPE_DECL — real decls win over stubs, which
    by construction exist exactly for fns with no real decl."""
    real = (nodes.filter(F.col("kind") == M.TYPE_DECL)
            .select(F.col("full_name").alias("fn"), F.col("id").alias("decl_id"))
            .dropDuplicates(["fn"]))
    stubs = (fns.join(real.select("fn"), "fn", "left_anti")
             .select("fn", F.xxhash64(F.lit("TYPE_DECL_STUB"), F.col("fn")).alias("decl_id")))
    return real.unionByName(stubs)


# --------------------------------------------------------------------------- #
# Pass 6 — MethodStubCreator (MethodStubCreator.scala:26-91): one external
# METHOD stub (+params via explode(sequence), RET) per called-but-undefined
# methodFullName; arg counts reconciled via min/max aggregation.
# --------------------------------------------------------------------------- #

def method_stub_nodes(call_sites: DataFrame, methods_dim: DataFrame) -> DataFrame:
    """``call_sites`` is the small persisted CALL dimension (id, name,
    signature, method_full_name, dispatch_type, nargs) — the parser recorded
    nargs per call, so arg-count reconciliation is a groupBy over call sites
    only (the reference's min/max reconciliation, MethodStubCreator.scala:59-66)."""
    calls = call_sites.filter((F.col("method_full_name") != "")
                              & (F.col("method_full_name") != M.UNKNOWN_FULL_NAME))
    methods = methods_dim.select(F.col("m_fn").alias("method_full_name"))

    # consumed by three row-generators (stubs, params, rets) — materialize
    # once instead of re-running the anti-join + agg per consumer
    unresolved = (calls.join(methods, "method_full_name", "left_anti")
                  .groupBy("method_full_name")
                  .agg(F.first("name").alias("name"),
                       F.first("signature").alias("signature"),
                       F.max(F.greatest("nargs", F.lit(0))).alias("max_args"))
                  .persist())

    stub_id = F.xxhash64(F.lit("METHOD_STUB"), F.col("method_full_name"))
    stubs = _mk_nodes(
        unresolved, id=stub_id, kind=F.lit(M.METHOD), name=F.col("name"),
        full_name=F.col("method_full_name"), signature=F.col("signature"),
        code=F.col("name"), is_external=F.lit(True),
    )
    params_src = unresolved.filter(F.col("max_args") >= 1).select(
        "method_full_name", F.explode(F.sequence(F.lit(1), F.col("max_args"))).alias("pi"))
    params = _mk_nodes(
        params_src,
        id=F.xxhash64(F.lit("METHOD_STUB_P"), F.col("method_full_name"), F.col("pi")),
        kind=F.lit(M.METHOD_PARAMETER_IN),
        name=F.concat(F.lit("p"), F.col("pi")),
        code=F.concat(F.lit("p"), F.col("pi")),
        order=F.col("pi"), param_index=F.col("pi"),
        evaluation_strategy=F.lit(M.BY_VALUE), is_external=F.lit(True),
        parent_id=F.xxhash64(F.lit("METHOD_STUB"), F.col("method_full_name")),
    )
    rets = _mk_nodes(
        unresolved,
        id=F.xxhash64(F.lit("METHOD_STUB_R"), F.col("method_full_name")),
        kind=F.lit(M.METHOD_RETURN), code=F.lit("RET"),
        evaluation_strategy=F.lit(M.BY_VALUE), is_external=F.lit(True),
        parent_id=stub_id,
    )
    return stubs.unionByName(params).unionByName(rets)


# --------------------------------------------------------------------------- #
# Pass 8 — MethodDecoratorPass (MethodDecoratorPass.scala:20-57):
# METHOD_PARAMETER_OUT clone per by-reference PARAM_IN + PARAMETER_LINK.
# --------------------------------------------------------------------------- #

def parameter_out_nodes(nodes: DataFrame) -> DataFrame:
    pins = nodes.filter(F.col("kind") == M.METHOD_PARAMETER_IN)
    return _mk_nodes(
        pins, repo=F.col("repo"), path=F.col("path"), commit=F.col("commit"),
        lang=F.col("lang"), id=F.xxhash64(F.lit("POUT"), F.col("id")),
        kind=F.lit(M.METHOD_PARAMETER_OUT), name=F.col("name"),
        code=F.col("code"), order=F.col("order"), param_index=F.col("param_index"),
        type_full_name=F.col("type_full_name"),
        evaluation_strategy=F.lit(M.BY_SHARING),
        parent_id=F.col("parent_id"), method_id=F.col("method_id"),
    )


def parameter_link_edges(nodes: DataFrame) -> DataFrame:
    pins = nodes.filter(F.col("kind") == M.METHOD_PARAMETER_IN)
    return pins.select(*_edge(F.col("id"), F.xxhash64(F.lit("POUT"), F.col("id")),
                              M.PARAMETER_LINK))


# --------------------------------------------------------------------------- #
# Pass 9 — AstLinkerPass (AstLinkerPass.scala:12-61) + DECLARES extraction.
# --------------------------------------------------------------------------- #

def ast_link_and_declares_edges(nodes: DataFrame, type_decl_dim: DataFrame) -> DataFrame:
    pending = nodes.filter((F.col("ast_parent_full_name") != "")
                           & F.col("kind").isin(M.METHOD, M.TYPE_DECL, M.MEMBER))

    # parent = per-file <global> NAMESPACE_BLOCK: computable id → projection
    to_nsb = (pending.filter(F.col("ast_parent_type") == M.NAMESPACE_BLOCK)
              .select(*_edge(nsb_id(), F.col("id"), M.AST)))

    # parent = TYPE_DECL / METHOD by fullname: join against the decl
    # dimensions (real methods + real/stub type decls — both small)
    method_parents = (nodes.filter(F.col("kind") == M.METHOD)
                      .select(F.col("id").alias("pid"),
                              F.lit(M.METHOD).alias("pkind"),
                              F.col("full_name").alias("pfn"))
                      .dropDuplicates(["pfn"]))
    typedecl_parents = type_decl_dim.select(
        F.col("decl_id").alias("pid"), F.lit(M.TYPE_DECL).alias("pkind"),
        F.col("fn").alias("pfn"))
    decl_parents = method_parents.unionByName(typedecl_parents)
    to_decl = (pending.filter(F.col("ast_parent_type") != M.NAMESPACE_BLOCK)
               .join(decl_parents,
                     (F.col("ast_parent_full_name") == F.col("pfn"))
                     & (F.col("ast_parent_type") == F.col("pkind")))
               )
    ast = to_decl.select(*_edge(F.col("pid"), F.col("id"), M.AST))
    declares = (to_decl.filter(F.col("pkind") == M.TYPE_DECL)
                .select(*_edge(F.col("pid"), F.col("id"), M.DECLARES)))
    return to_nsb.unionByName(ast).unionByName(declares)


# --------------------------------------------------------------------------- #
# Pass 18 — FieldAccessLinkerPass (typerelations/FieldAccessLinkerPass.scala:
# 23-60): REF from `<operator>.fieldAccess` CALLs to the MEMBER they touch,
# keyed by (evalType(base) stripped of pointer decoration, field name).
# --------------------------------------------------------------------------- #

def field_access_ref_edges(nodes: DataFrame) -> DataFrame:
    fa_calls = (nodes.filter((F.col("kind") == M.CALL)
                             & F.col("name").isin(M.OP_FIELD_ACCESS,
                                                  M.OP_INDIRECT_FIELD_ACCESS))
                .select(F.col("id").alias("call_id")))
    base = (nodes.filter((F.col("arg_index") == 1) & F.col("parent_id").isNotNull())
            .select(F.col("parent_id").alias("call_id"),
                    F.regexp_replace("type_full_name", r"[*\s&]+$", "").alias("owner")))
    fld = (nodes.filter((F.col("kind") == M.FIELD_IDENTIFIER)
                        & (F.col("arg_index") == 2))
           .select(F.col("parent_id").alias("call_id"),
                   F.col("canonical_name").alias("fname")))
    # member owner = the enclosing TYPE_DECL (AST parent); frontends leave
    # astParent* empty on MEMBER rows, the tree edge carries the ownership
    owners = nodes.filter(F.col("kind") == M.TYPE_DECL).select(
        F.col("id").alias("parent_id"), F.col("full_name").alias("owner"))
    members = (nodes.filter(F.col("kind") == M.MEMBER)
               .join(owners, "parent_id")
               .select(F.col("id").alias("dst"), "owner",
                       F.col("name").alias("fname")))
    j = (fa_calls.join(base, "call_id").join(fld, "call_id")
         .join(members, ["owner", "fname"]))
    return j.select(*_edge(F.col("call_id"), F.col("dst"), M.REF))


# --------------------------------------------------------------------------- #
# Pass 16/17 — TypeHierarchyPass / AliasLinkerPass: projections.
# --------------------------------------------------------------------------- #

def inherits_edges(nodes: DataFrame) -> DataFrame:
    d = nodes.filter((F.col("kind") == M.TYPE_DECL) & F.col("inherits_from").isNotNull())
    # JavaScript parents resolve through the XInheritanceFullNamePass twin
    # (import/name lookup); other frontends emit resolved names at parse
    from joern_spark.operators.typerecovery import js_inherits_parents
    e = (d.filter(F.col("lang") != "javascript")
         .select(F.col("id").alias("src"),
                 F.explode("inherits_from").alias("parent_fn"))
         .unionByName(js_inherits_parents(nodes)
                      .withColumnRenamed("id", "src")))
    return e.select(*_edge(F.col("src"), type_id(F.col("parent_fn")), M.INHERITS_FROM))


def alias_edges(nodes: DataFrame) -> DataFrame:
    d = nodes.filter((F.col("kind") == M.TYPE_DECL) & (F.col("alias_type_full_name") != ""))
    return d.select(*_edge(F.col("id"), type_id(F.col("alias_type_full_name")), M.ALIAS_OF))


def run_base(nodes: DataFrame, fns: DataFrame, call_sites: DataFrame,
             methods_dim: DataFrame) -> tuple[DataFrame, DataFrame]:
    """All base-layer passes → (extra_nodes, extra_edges).

    ``fns`` / ``call_sites`` / ``methods_dim`` are the small persisted
    dimensions the pipeline extracted from the parse output in single pruned
    scans; every pass here is a projection or a small-dimension join — the
    big node table is touched only by filters Parquet can push down."""
    files = file_dimension(nodes)
    decl_dim = type_decl_dimension(nodes, fns)
    extra_nodes = (
        type_nodes(nodes, fns)
        .unionByName(file_nodes(files))
        .unionByName(namespace_block_nodes(files))
        .unionByName(meta_data_nodes(files))
        .unionByName(namespace_nodes(nodes, files))
        .unionByName(type_decl_stubs(nodes, fns))
        .unionByName(method_stub_nodes(call_sites, methods_dim))
        .unionByName(parameter_out_nodes(nodes))
    ).coalesce(nodes.sparkSession.sparkContext.defaultParallelism).persist()
    # EVAL_TYPE / decl-SOURCE_FILE / PARAMETER_LINK are emitted by the fused
    # projection pass in operators.parse.ast_edges (single scan); the
    # remaining base edges genuinely need joins or the stub dimensions.
    extra_edges = (
        source_file_edges(files)
        .unionByName(namespace_ref_edges(nodes, files))
        .unionByName(type_ref_edges(fns, decl_dim))
        .unionByName(ast_link_and_declares_edges(nodes, decl_dim))
        .unionByName(inherits_edges(nodes))
        .unionByName(alias_edges(nodes))
        .unionByName(field_access_ref_edges(nodes))
        .unionByName(capture_edges(nodes))
    )
    return extra_nodes, extra_edges
