"""XTypeRecovery lite — flow-insensitive type propagation for JavaScript
(x2cpg/.../passes/frontend/XTypeRecovery.scala, default 2 iterations;
DummyReturnType `<returnValue>` marker at XTypeRecovery.scala:259; the
recovered methodFullNames then drive call linking like
XTypeHintCallLinker).

Scope (v1): require() module bindings and one return-value hop —

    const mysql = require('mysql');        // mysql    : "mysql"
    var con = mysql.createConnection();    // rewrite -> mysql.createConnection
                                           // con      : "mysql.createConnection.<returnValue>"
    con.query(x);                          // rewrite -> mysql.createConnection.<returnValue>.query

Implementation is the join-propagate-agg shape the reference's symbol table
implies: each iteration derives a (path, var, type) symbol table from
assignment roots, joins it onto unresolved member-call receivers, and feeds
newly-typed call results back. All joins key on (path, name) — file-local,
so they co-partition with the parse layout and never shuffle corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M

RETURN_VALUE = "<returnValue>"


def _js_children(nodes: DataFrame) -> DataFrame:
    return nodes.filter(F.col("lang") == "javascript").select(
        "id", "parent_id", "arg_index", "kind", "name", "code", "path")


def js_mfn_rewrites(nodes: DataFrame, iterations: int = 2) -> DataFrame:
    """-> (id, rec_mfn): methodFullName rewrites for JS dynamic member calls
    whose receiver's type was recovered."""
    ch = _js_children(nodes)
    calls = nodes.filter((F.col("lang") == "javascript")
                         & (F.col("kind") == M.CALL)).select(
        "id", "name", "method_full_name", "path", "dispatch_type")

    # assignment skeleton: (assign_id, path, lhs_name, rhs_id); assign_idx
    # (the assignment's preorder index) makes duplicate-binding resolution
    # deterministic — the sequential oracle keeps the FIRST binding in
    # document order, so so do we (min_by assign_idx below).
    assigns = nodes.filter((F.col("lang") == "javascript")
                           & (F.col("kind") == M.CALL)
                           & (F.col("name") == M.OP_ASSIGNMENT)).select(
        F.col("id").alias("assign_id"), "path",
        F.col("node_idx").alias("assign_idx"))
    lhs = ch.filter((F.col("arg_index") == 1) & (F.col("kind") == M.IDENTIFIER)) \
            .select(F.col("parent_id").alias("assign_id"),
                    F.col("name").alias("var"))
    rhs = ch.filter(F.col("arg_index") == 2).select(
        F.col("parent_id").alias("assign_id"), F.col("id").alias("rhs_id"),
        F.col("kind").alias("rhs_kind"))
    askel = assigns.join(lhs, "assign_id").join(rhs, "assign_id")

    # seed: var = require('module')
    req = calls.filter(F.col("name") == "require").select(
        F.col("id").alias("rhs_id"))
    req_arg = ch.filter((F.col("arg_index") == 1) & (F.col("kind") == M.LITERAL)) \
                .select(F.col("parent_id").alias("rhs_id"),
                        F.regexp_replace("code", "['\"`]", "").alias("module"))
    st = (askel.join(req, "rhs_id").join(req_arg, "rhs_id")
          .groupBy("path", "var")
          .agg(F.min_by("module", "assign_idx").alias("type")))

    # member-call receivers: call -> base ARGUMENT(0) identifier name
    base_ident = ch.filter((F.col("arg_index") == 0)
                           & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("id"), F.col("name").alias("var"))
    member_calls = (calls.filter((F.col("dispatch_type") == M.DYNAMIC_DISPATCH)
                                 & (F.col("method_full_name") == M.UNKNOWN_FULL_NAME))
                    .join(base_ident, "id")
                    .select("id", "name", "path", "var"))

    rewrites = None
    for _ in range(iterations):
        remaining = member_calls if rewrites is None else \
            member_calls.join(rewrites.select("id"), "id", "left_anti")
        rw = (remaining.join(st, ["path", "var"])
              .select("id",
                      F.concat_ws(".", F.col("type"), F.col("name")).alias("rec_mfn"),
                      "path"))
        rewrites = rw if rewrites is None else rewrites.unionByName(rw)
        # next iteration's symbol table: var = <recovered call>() results;
        # earlier bindings win (anti-join keeps the pass deterministic)
        ret = (askel.join(rw.select(F.col("id").alias("rhs_id"), "rec_mfn"),
                          "rhs_id")
               .groupBy("path", "var")
               .agg(F.concat(F.min_by("rec_mfn", "assign_idx"),
                             F.lit("." + RETURN_VALUE)).alias("type")))
        st = st.unionByName(ret.join(st, ["path", "var"], "left_anti"))
    return rewrites.select("id", "rec_mfn")


def apply_rewrites(call_sites: DataFrame, rewrites: DataFrame) -> DataFrame:
    """call_sites with methodFullName overridden by recovered values — stubs
    and linkers downstream then see the recovered names. Plain equi-join on
    id (both sides hash-partition; AQE broadcasts when the rewrite side is
    small — at corpus scale it is proportional to dynamic call sites, so a
    forced broadcast would be wrong)."""
    return (call_sites.join(rewrites, "id", "left")
            .withColumn("method_full_name",
                        F.coalesce("rec_mfn", "method_full_name"))
            .drop("rec_mfn"))
