"""XTypeRecovery for JavaScript — flow-insensitive type propagation
(x2cpg/.../passes/frontend/XTypeRecovery.scala, default 2 iterations;
DummyReturnType `<returnValue>` marker at XTypeRecovery.scala:259; the
recovered methodFullNames then drive call linking like
XTypeHintCallLinker). Fullnames use the reference's `:` path separator
(TypeRecoveryPassTests.scala: `google.drive(...)` -> "googleapis:drive",
`sg.send(...)` -> "sendgrid:SendGridAPIClient:send", assigned results ->
"...:send:<returnValue>").

Recovered-type seeds (each a small dimension derived from the node table):

* ``v = require('m')``            -> v : "m"
* ES import bindings              -> alias : IMPORT.full_name
  ("m:Alias" for named/default imports, bare "m" for `import * as`;
  the frontend resolves the type into the IMPORT node)
* destructured require            -> `g = _tmp.g` on a bare-module base
  propagates the module ("googleapis:drive" via `const { google } = ...`)
* literals                        -> __ecma.Number / __ecma.String
* array-literal lowering          -> __ecma.Array (the `__ecma.Array.factory()`
  block, so `z.push(4)` resolves to "__ecma.Array:push")
* ``v = new T(...)``              -> v : type(T)

A member call `b.f(...)` is rewritten only when `b` has exactly ONE
recovered type (multi-hint receivers stay unresolved, mirroring the
reference's dynamicTypeHint behavior); its assigned result takes
`mfn:<returnValue>`.

Scale shape: every join keys on (path, var) — file-local, co-partitioned
with the parse layout, no corpus-wide shuffle; the symbol table is a
dimension proportional to assignments-with-recoverable-rhs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M

RETURN_VALUE = "<returnValue>"

# global builtin receivers (jssrc2cpg GlobalBuiltins;
# TypeRecoveryPassTests "recovering paths for built-in calls")
JS_GLOBAL_BUILTINS = {
    "console": "__whatwg.console",
    "Math": "__ecma.Math",
    "JSON": "__ecma.JSON",
    "Number": "__ecma.Number",
    "Promise": "__ecma.Promise",
}


def _js_children(nodes: DataFrame) -> DataFrame:
    return nodes.filter(F.col("lang") == "javascript").select(
        "id", "parent_id", "arg_index", "kind", "name", "code", "path",
        "canonical_name", "method_full_name", "full_name")


def js_symbol_table(nodes: DataFrame, iterations: int = 2) -> DataFrame:
    """-> (path, var, type) multi-hint symbol table (see module doc)."""
    return _recover(nodes, iterations)[1]


def js_mfn_rewrites(nodes: DataFrame, iterations: int = 2) -> DataFrame:
    """-> (id, rec_mfn): methodFullName rewrites for JS dynamic member calls
    whose receiver's type was recovered."""
    return _recover(nodes, iterations)[0]


def _recover(nodes: DataFrame, iterations: int = 2
             ) -> tuple[DataFrame, DataFrame]:
    ch = _js_children(nodes)
    calls = nodes.filter((F.col("lang") == "javascript")
                         & (F.col("kind") == M.CALL)).select(
        "id", "name", "method_full_name", "path", "dispatch_type",
        "method_id", "parent_id")

    # assignment skeleton: (assign_id, path, lhs_name, rhs_id, rhs_kind)
    assigns = nodes.filter((F.col("lang") == "javascript")
                           & (F.col("kind") == M.CALL)
                           & (F.col("name") == M.OP_ASSIGNMENT)).select(
        F.col("id").alias("assign_id"), "path")
    lhs = ch.filter((F.col("arg_index") == 1) & (F.col("kind") == M.IDENTIFIER)) \
            .select(F.col("parent_id").alias("assign_id"),
                    F.col("name").alias("var"))
    rhs = ch.filter(F.col("arg_index") == 2).select(
        F.col("parent_id").alias("assign_id"), F.col("id").alias("rhs_id"),
        F.col("kind").alias("rhs_kind"), F.col("name").alias("rhs_name"),
        F.col("code").alias("rhs_code"))
    askel = assigns.join(lhs, "assign_id").join(rhs, "assign_id")

    # ---- seeds ---------------------------------------------------------- #
    # var = require('module')
    req = calls.filter(F.col("name") == "require").select(
        F.col("id").alias("rhs_id"))
    req_arg = ch.filter((F.col("arg_index") == 1) & (F.col("kind") == M.LITERAL)) \
                .select(F.col("parent_id").alias("rhs_id"),
                        F.regexp_replace("code", "['\"`]", "").alias("type"))
    seed_req = (askel.join(req, "rhs_id").join(req_arg, "rhs_id")
                .select("path", "var", "type"))

    # ES import bindings (IMPORT nodes carry the resolved type in
    # full_name). A RELATIVE import whose target module exists in the
    # corpus is a ResolvedMember: instead of a dummy "module:member" seed,
    # the exporting module's recovered types flow across (rel_links below;
    # TypeRecoveryPassTests "recovering module members across modules").
    imports = (nodes.filter((F.col("lang") == "javascript")
                            & (F.col("kind") == M.IMPORT)
                            & (F.col("canonical_name") != ""))
               .select("path", F.col("canonical_name").alias("var"),
                       F.col("full_name").alias("type"))
               .withColumn("mod", F.split("type", ":").getItem(0)))
    file_stems = (nodes.filter(F.col("lang") == "javascript")
                  .select("path").distinct()
                  .withColumn("stem", F.regexp_replace(
                      "path", r"\.[A-Za-z0-9]+$", ""))
                  .select(F.col("path").alias("src_path"), "stem"))

    def _rel_stem(path_col, mod_col):
        """Normalized, extension-stripped `dirname(path)/mod` — posix
        normpath over the bounded `./`/`../` nesting of import specifiers
        (RequirePassTests `../../foo.ts`, `./d2/bar.ts`)."""
        dirc = F.regexp_extract(path_col, r"^(.*)/[^/]*$", 1)
        x = F.when(dirc == "", mod_col).otherwise(
            F.concat_ws("/", dirc, mod_col))
        for _ in range(6):
            x = F.regexp_replace(x, r"(^|/)\./", "$1")
            x = F.regexp_replace(x, r"(^|/)[^/.][^/]*/\.\./", "$1")
        return F.regexp_replace(x, r"\.[A-Za-z0-9]+$", "")

    # resolved relative imports carry the imported member (named/default
    # imports: the trailing `:alias` of the IMPORT type; requires: NULL)
    rel_imports = (imports.filter(F.col("mod").startswith("."))
                   .withColumn("member", F.when(
                       F.col("type").contains(":"),
                       F.substring_index("type", ":", -1))
                       .otherwise(F.col("var")))
                   .withColumn("stem", _rel_stem(F.col("path"),
                                                 F.col("mod")))
                   .select("path", "var", "member", "stem"))
    # relative `require("./m")` bindings resolve the same way (no IMPORT
    # node is emitted for require) — their exported members alias under
    # the binding var ("Recovered values that are returned in methods")
    req_rel = (askel.join(req, "rhs_id").join(req_arg, "rhs_id")
               .filter(F.col("type").startswith("."))
               .withColumn("stem", _rel_stem(F.col("path"), F.col("type")))
               .withColumn("member", F.lit(None).cast("string"))
               .select("path", "var", "member", "stem"))
    # file_stems is ∝ |files| — never force-broadcast at the 10^12-file
    # target; AQE decides (static_call_edges precedent).
    rel_links = (rel_imports.unionByName(req_rel)
                 .join(file_stems, "stem")
                 .select(F.col("path").alias("imp_path"), "var", "member",
                         "src_path")
                 .localCheckpoint(eager=True))
    resolved_binds = rel_links.select(
        F.col("imp_path").alias("path"), "var",
        F.lit(True).alias("resolved")).distinct()
    seed_imp = (imports.join(resolved_binds, ["path", "var"], "left")
                .filter(F.col("resolved").isNull())
                .select("path", "var", "type"))
    # resolved require bindings drop their raw "./m" seed — the binding
    # adopts the exporter's entity in the iteration loop instead
    seed_req = (seed_req.join(resolved_binds, ["path", "var"], "left")
                .filter(F.col("resolved").isNull())
                .select("path", "var", "type"))

    # literal builtins
    lit_type = F.when(F.col("rhs_code").rlike(r"^['\"`]"), "__ecma.String") \
        .when(F.col("rhs_code").rlike(r"^[0-9][0-9_.xXbBoOeE+-]*$"),
              "__ecma.Number")
    seed_lit = (askel.filter(F.col("rhs_kind") == M.LITERAL)
                .withColumn("type", lit_type)
                .filter(F.col("type").isNotNull())
                .select("path", "var", "type"))

    # lowered array literal: rhs BLOCK containing `__ecma.Array.factory()`
    blk_assign = ch.filter((F.col("kind") == M.CALL)
                           & (F.col("name") == M.OP_ASSIGNMENT)).select(
        F.col("parent_id").alias("rhs_id"), F.col("id").alias("ba_id"))
    factory = ch.filter((F.col("kind") == M.CALL)
                        & (F.col("name") == "__ecma.Array.factory")
                        & (F.col("arg_index") == 2)).select(
        F.col("parent_id").alias("ba_id"))
    seed_arr = (askel.filter(F.col("rhs_kind") == M.BLOCK)
                .join(blk_assign, "rhs_id").join(factory, "ba_id")
                .select("path", "var", F.lit("__ecma.Array").alias("type"))
                .distinct())

    # `v = new T(...)`: rhs BLOCK containing <operator>.new whose receiver
    # (arg_index -1 IDENTIFIER) names the constructed type
    new_calls = ch.filter((F.col("kind") == M.CALL)
                          & (F.col("name") == M.OP + "new")).select(
        F.col("parent_id").alias("rhs_id"), F.col("id").alias("new_id"))
    new_recv = ch.filter((F.col("kind") == M.IDENTIFIER)
                         & (F.col("arg_index") == -1)).select(
        F.col("parent_id").alias("new_id"), F.col("name").alias("tname"))
    new_edges = (askel.filter(F.col("rhs_kind") == M.BLOCK)
                 .join(new_calls, "rhs_id").join(new_recv, "new_id")
                 .select("path", "var", "tname"))

    # object-literal methods: `v = { f: function(){}, ... }` — the lowered
    # block holds `_tmp.f = <methodRef>`; seed `v.f` with the closure's
    # (ConstClosure-renamed) fullname so `v.f()` links to it
    # (ConstClosurePassTests.scala object properties + TypeHintCallLinker)
    fa_lhs = ch.filter((F.col("arg_index") == 1) & (F.col("kind") == M.CALL)
                       & (F.col("name") == M.OP_FIELD_ACCESS)).select(
        F.col("parent_id").alias("ba_id"), F.col("id").alias("fa_id"))
    fld = ch.filter(F.col("kind") == M.FIELD_IDENTIFIER).select(
        F.col("parent_id").alias("fa_id"),
        F.col("canonical_name").alias("fld"))
    mref = ch.filter((F.col("arg_index") == 2)
                     & (F.col("kind") == M.METHOD_REF)
                     & (F.col("method_full_name") != "")).select(
        F.col("parent_id").alias("ba_id"),
        F.col("method_full_name").alias("type"))
    seed_obj = (askel.filter(F.col("rhs_kind") == M.BLOCK)
                .join(blk_assign, "rhs_id")
                .join(fa_lhs, "ba_id").join(fld, "fa_id").join(mref, "ba_id")
                .select("path", F.concat_ws(".", "var", "fld").alias("var"),
                        "type"))

    # identifier aliasing: `let d = db` copies the source's types
    ident_edges = (askel.filter((F.col("rhs_kind") == M.IDENTIFIER)
                                & (F.col("rhs_name") != F.col("var")))
                   .select("path", "var",
                           F.col("rhs_name").alias("src_var")))

    # `v = <methodRef>` binds the closure fullname ("resolve a function
    # full name called as a constructor")
    seed_mref = (askel.filter(F.col("rhs_kind") == M.METHOD_REF)
                 .join(ch.select(F.col("id").alias("rhs_id"),
                                 F.col("method_full_name").alias("type")),
                       "rhs_id")
                 .filter(F.col("type") != "")
                 .select("path", "var", "type"))

    # `exports.f = <methodRef>` — exported members carry the closure
    # fullname; relative importers alias them under their binding
    # ("Recovered values that are returned in methods")
    fa_lhs2 = ch.filter((F.col("arg_index") == 1) & (F.col("kind") == M.CALL)
                        & (F.col("name") == M.OP_FIELD_ACCESS)).select(
        F.col("parent_id").alias("assign_id"), F.col("id").alias("fa2_id"))
    fa2_base = ch.filter((F.col("arg_index") == 1)
                         & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("fa2_id"), F.col("name").alias("bname"))
    fa2_fld = ch.filter(F.col("kind") == M.FIELD_IDENTIFIER).select(
        F.col("parent_id").alias("fa2_id"), F.col("canonical_name").alias("fld"))
    rhs_mref2 = ch.filter((F.col("arg_index") == 2)
                          & (F.col("kind") == M.METHOD_REF)
                          & (F.col("method_full_name") != "")).select(
        F.col("parent_id").alias("assign_id"),
        F.col("method_full_name").alias("type"))
    seed_exports = (assigns.join(fa_lhs2, "assign_id")
                    .join(fa2_base, "fa2_id").join(fa2_fld, "fa2_id")
                    .join(rhs_mref2, "assign_id")
                    .filter(F.col("bname").isin("exports", "module"))
                    .select("path",
                            F.concat(F.lit("exports."), F.col("fld")).alias("var"),
                            "type"))
    # `module.exports = { f: function(){}, ... }` — each property of the
    # lowered object literal registers as an exported member
    # (CallLinkerPassTests "link exported <lambda> functions across file
    # boundaries")
    rhs_blk2 = ch.filter((F.col("arg_index") == 2)
                         & (F.col("kind") == M.BLOCK)).select(
        F.col("parent_id").alias("assign_id"), F.col("id").alias("rhs_id"))
    seed_exports = seed_exports.unionByName(
        assigns.join(fa_lhs2, "assign_id")
        .join(fa2_base, "fa2_id")
        .filter(F.col("bname").isin("exports", "module"))
        .join(rhs_blk2, "assign_id")
        .join(blk_assign, "rhs_id")
        .join(fa_lhs, "ba_id").join(fld, "fa_id").join(mref, "ba_id")
        .select("path",
                F.concat(F.lit("exports."), F.col("fld")).alias("var"),
                "type"))
    # `exports.f = <identifier>` (ES named/default export lowering) —
    # aliases the exported local's recovered types each iteration
    rhs_ident2 = ch.filter((F.col("arg_index") == 2)
                           & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("assign_id"),
        F.col("name").alias("src_var"))
    export_ident_edges = (assigns.join(fa_lhs2, "assign_id")
                          .join(fa2_base, "fa2_id").join(fa2_fld, "fa2_id")
                          .join(rhs_ident2, "assign_id")
                          .filter(F.col("bname").isin("exports", "module"))
                          .select("path",
                                  F.concat(F.lit("exports."),
                                           F.col("fld")).alias("var"),
                                  "src_var"))

    # TS type-annotation hints on parameters / method returns — the raw
    # annotation text resolves its HEAD against the symbol table each
    # iteration ("Type hints for method parameters and returns")
    js = nodes.filter(F.col("lang") == "javascript")
    ann_params = (js.filter((F.col("kind") == M.METHOD_PARAMETER_IN)
                            & (F.col("name") != "this")
                            & ~F.col("type_full_name").isin(
                                M.ANY, "", "__ecma.Array"))
                  .select("path", F.col("name").alias("pvar"),
                          F.col("type_full_name").alias("ann"))
                  .withColumn("head", F.split("ann", r"\.").getItem(0))
                  .withColumn("tail", F.array_join(
                      F.slice(F.split("ann", r"\."), 2, 100), ":")))
    # annotated class members + `v = this.<f>` adoption (TS three-address
    # lowering: `_tmp = this.http; _tmp.post(...)`)
    ann_members = (js.filter((F.col("kind") == M.MEMBER)
                             & ~F.col("type_full_name").isin(M.ANY, ""))
                   .select("path", F.col("name").alias("fld"),
                           F.col("type_full_name").alias("ann"))
                   .withColumn("head", F.split("ann", r"\.").getItem(0))
                   .withColumn("tail", F.array_join(
                       F.slice(F.split("ann", r"\."), 2, 100), ":")))
    methods_js = js.filter(F.col("kind") == M.METHOD).select(
        "path", F.col("id").alias("mid"),
        F.col("full_name").alias("mfn_full"), F.col("name").alias("mname"))
    mret_ann = (js.filter((F.col("kind") == M.METHOD_RETURN)
                          & ~F.col("type_full_name").isin(M.ANY, ""))
                .select(F.col("parent_id").alias("mid"),
                        F.col("type_full_name").alias("ann"))
                .join(methods_js, "mid")
                .withColumn("head", F.split("ann", r"\.").getItem(0))
                .withColumn("tail", F.array_join(
                    F.slice(F.split("ann", r"\."), 2, 100), ":")))
    # return-statement expressions (literal / recovered-call)
    ret_children = (js.select("id", "parent_id", "kind", "code", "method_id")
                    .join(js.filter(F.col("kind") == M.RETURN)
                          .select(F.col("id").alias("parent_id")),
                          "parent_id", "leftsemi"))
    ret_lit = (ret_children.filter(F.col("kind") == M.LITERAL)
               .withColumn("rtype",
                           F.when(F.col("code").rlike(r"^['\"`]"),
                                  "__ecma.String")
                           .when(F.col("code").rlike(
                               r"^[0-9][0-9_.xXbBoOeE+-]*$"),
                               "__ecma.Number"))
               .filter(F.col("rtype").isNotNull())
               .select(F.col("method_id").alias("mid"), "rtype"))
    ret_call_ids = (ret_children.filter(F.col("kind") == M.CALL)
                    .select("id", F.col("method_id").alias("mid")))

    # destructured-require members: `v = <fieldAccess>(b, f)` — propagate a
    # single bare-module base type to v
    fa_assign = (askel.filter((F.col("rhs_kind") == M.CALL)
                              & (F.col("rhs_name") == M.OP_FIELD_ACCESS))
                 .select("path", "var", "rhs_id"))
    fa_base = ch.filter((F.col("arg_index") == 1)
                        & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("rhs_id"), F.col("name").alias("bvar"))
    fa_edges = fa_assign.join(fa_base, "rhs_id").select("path", "var", "bvar")
    fa_fld = ch.filter(F.col("kind") == M.FIELD_IDENTIFIER).select(
        F.col("parent_id").alias("rhs_id"),
        F.col("canonical_name").alias("fld"))
    this_fa_edges = (fa_assign.join(
        fa_base.filter(F.col("bvar") == "this"), "rhs_id")
        .join(fa_fld, "rhs_id").select("path", "var", "fld"))

    # The symbol table is a small dimension (proportional to assignments
    # with a recoverable RHS) but is referenced ~5x per iteration below —
    # without lineage truncation the self-referencing unions grow the
    # Catalyst plan geometrically (measured: >170 M-char plan strings at 2
    # iterations). Eager localCheckpoint per iteration keeps the plan flat,
    # same pattern as the CC loop in plans/pipeline.py.
    # builtin globals, seeded per file (tiny dimension: |files| x |table|)
    paths = (nodes.filter(F.col("lang") == "javascript")
             .select("path").distinct())
    builtins_df = paths.sparkSession.createDataFrame(
        list(JS_GLOBAL_BUILTINS.items()), "var string, type string")
    seed_builtin = paths.crossJoin(F.broadcast(builtins_df)).select(
        "path", "var", "type")

    st = (seed_req.unionByName(seed_imp).unionByName(seed_lit)
          .unionByName(seed_arr).unionByName(seed_obj)
          .unionByName(seed_builtin).unionByName(seed_mref)
          .unionByName(seed_exports)
          .distinct().localCheckpoint(eager=True))

    # member-call receivers: call -> base ARGUMENT(0) identifier name
    base_ident = ch.filter((F.col("arg_index") == 0)
                           & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("id"), F.col("name").alias("var"))
    unresolved_calls = (calls.filter(
        (F.col("dispatch_type") == M.DYNAMIC_DISPATCH)
        & (F.col("method_full_name") == M.UNKNOWN_FULL_NAME)
        & (F.col("name") != "require"))
        .join(base_ident, "id")
        .select("id", "name", "path", "var", "method_id"))
    # simple `f()` calls: the RECEIVER is itself an identifier and the
    # base is the implicit `this` — TypeHintCallLinker on a single-typed
    # callable (CallLinkerPassTests "create call edges correctly",
    # RequirePassTests)
    recv_ident = ch.filter((F.col("arg_index") == -1)
                           & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("id"), F.col("name").alias("rvar"))
    direct_calls = (unresolved_calls.filter(F.col("var") == "this")
                    .join(recv_ident, "id")
                    .select("id", "path", F.col("rvar").alias("var")))
    member_calls = (unresolved_calls
                    .join(direct_calls.select("id"), "id", "left_anti")
                    .select("id", "name", "path", "var", "method_id"))

    # class methods dimension + class-member types assigned in <init>
    # (field initializers lower into the constructor): `bar = class Bar`
    # / `f = <methodRef>` type member `bar` of the enclosing class —
    # typeHintForThisExpression + member flow (CallLinkerPassTests
    # "create call edges correctly for methods from classes")
    cls_methods = (js.filter((F.col("kind") == M.METHOD)
                             & (F.col("ast_parent_type") == M.TYPE_DECL))
                   .select(F.col("id").alias("method_id"),
                           F.col("name").alias("cm_name"),
                           F.col("ast_parent_full_name").alias("cls_fn")))
    init_assigns = (calls.filter(F.col("name") == M.OP_ASSIGNMENT)
                    .join(cls_methods.filter(
                        F.col("cm_name") == M.CONSTRUCTOR), "method_id")
                    .select(F.col("id").alias("assign_id"), "path", "cls_fn"))
    lhs_fld = ch.filter((F.col("arg_index") == 1)
                        & (F.col("kind") == M.IDENTIFIER)).select(
        F.col("parent_id").alias("assign_id"), F.col("name").alias("fld"))
    rhs_tref = ch.filter((F.col("arg_index") == 2)
                         & (F.col("kind") == M.TYPE_REF)).select(
        F.col("parent_id").alias("assign_id"), F.col("id").alias("tref_id"))
    tref_td = ch.filter(F.col("kind") == M.TYPE_DECL).select(
        F.col("parent_id").alias("tref_id"), F.col("full_name").alias("mty"))
    rhs_mref3 = ch.filter((F.col("arg_index") == 2)
                          & (F.col("kind") == M.METHOD_REF)
                          & (F.col("method_full_name") != "")).select(
        F.col("parent_id").alias("assign_id"),
        F.col("method_full_name").alias("mty"))
    mem_ctor = (init_assigns.join(lhs_fld, "assign_id")
                .join(rhs_tref.join(tref_td, "tref_id")
                      .select("assign_id", "mty")
                      .unionByName(rhs_mref3), "assign_id")
                .select("cls_fn", "fld", "mty")
                .localCheckpoint(eager=True))

    method_fns = (js.filter(F.col("kind") == M.METHOD)
                  .select(F.col("full_name").alias("cand")).distinct())

    # `this.b()` resolves against the enclosing class when the member
    # method exists (`this` dynamicTypeHint = the class fullname)
    rw0_this = (unresolved_calls.filter(F.col("var") == "this")
                .join(direct_calls.select("id"), "id", "left_anti")
                .join(cls_methods.select("method_id", "cls_fn"), "method_id")
                .withColumn("cand", F.concat_ws(":", "cls_fn", "name"))
                .join(method_fns, "cand")
                .select("id", F.col("cand").alias("rec_mfn"), "path")
                .withColumn("is_ctor", F.lit(False)))

    # `new this.bar()` — the receiver field access resolves through the
    # class-member table; the constructed value types the assigned tmp so
    # a chained `.c()` composes the member-method fullname
    opnew = calls.filter(F.col("name") == M.OP + "new").select(
        F.col("id").alias("nid"), "path", "method_id",
        F.col("parent_id").alias("blk_id"))
    nfa = ch.filter((F.col("arg_index") == -1) & (F.col("kind") == M.CALL)
                    & (F.col("name") == M.OP_FIELD_ACCESS)).select(
        F.col("parent_id").alias("nid"), F.col("id").alias("nfa_id"))
    nfa_this = ch.filter((F.col("arg_index") == 1)
                         & (F.col("kind") == M.IDENTIFIER)
                         & (F.col("name") == "this")).select(
        F.col("parent_id").alias("nfa_id"))
    nfa_fld = ch.filter(F.col("kind") == M.FIELD_IDENTIFIER).select(
        F.col("parent_id").alias("nfa_id"),
        F.col("canonical_name").alias("fld"))
    nfa_full = (nfa.join(nfa_this, "nfa_id", "leftsemi")
                .join(nfa_fld, "nfa_id").select("nid", "fld"))
    new_this = (opnew.join(nfa_full, "nid")
                .join(cls_methods.select("method_id", "cls_fn"), "method_id")
                .join(mem_ctor, ["cls_fn", "fld"])
                .select("nid", "blk_id", "path", "mty").distinct())
    rw0_new = (new_this
               .withColumn("ctor_cand",
                           F.concat(F.col("mty"), F.lit(f":{M.CONSTRUCTOR}")))
               .join(method_fns.select(F.col("cand").alias("ctor_cand"),
                                       F.lit(True).alias("ctor_ok")),
                     "ctor_cand", "left")
               .select(F.col("nid").alias("id"),
                       F.when(F.col("ctor_ok").isNotNull(),
                              F.col("ctor_cand"))
                       .otherwise(F.col("mty")).alias("rec_mfn"), "path")
               .withColumn("is_ctor", F.lit(True)))
    # the variable assigned from the new-expression block adopts the
    # constructed class type (so chained member calls compose)
    seed_new_this = (new_this.join(
        askel.select(F.col("rhs_id").alias("blk_id"), "var"), "blk_id")
        .select("path", "var", F.col("mty").alias("type")))
    st = st.unionByName(seed_new_this).distinct() \
        .localCheckpoint(eager=True)

    ret_lhs = askel.select("path", "var", "rhs_id")

    rewrites = rw0_this.unionByName(rw0_new).distinct() \
        .localCheckpoint(eager=True)
    for _ in range(iterations):
        # constructed-type propagation: v = new T() takes T's types — the
        # constructed VALUE drops the ctor binding's `:<init>` suffix so
        # instantiated identifiers carry the class fullname
        # (InheritanceFullNamePassTests "identifiers instantiated")
        st = st.unionByName(
            new_edges.join(st.withColumnRenamed("var", "tname"),
                           ["path", "tname"])
            .select("path", "var",
                    F.regexp_replace("type", r":<init>$", "")
                    .alias("type"))).distinct()
        # cross-module resolved imports: the exporter's types flow to the
        # importing file's binding
        st = st.unionByName(
            rel_links.join(st.withColumnRenamed("path", "src_path"),
                           ["src_path", "var"])
            .select(F.col("imp_path").alias("path"), "var", "type")
        ).distinct()
        # identifier aliasing within a file
        st = st.unionByName(
            ident_edges.join(
                st.select(F.col("path").alias("path"),
                          F.col("var").alias("src_var"),
                          "type"), ["path", "src_var"])
            .select("path", "var", "type")).distinct()
        # destructured-require propagation (single bare-module base only)
        bare = (st.groupBy("path", F.col("var").alias("bvar"))
                .agg(F.collect_set("type").alias("tys"))
                .filter(F.size("tys") == 1)
                .select("path", "bvar", F.element_at("tys", 1).alias("type"))
                .filter(~F.col("type").contains(":")
                        & ~F.col("type").startswith("__ecma.")))
        st = st.unionByName(
            fa_edges.join(bare, ["path", "bvar"]).select("path", "var", "type")
        ).distinct()
        # each self-referencing union DOUBLES the plan tree (st_{k+1}
        # references st_k twice); with ~12 rules per iteration the
        # un-truncated tree is 2^12 scans — checkpoint at midpoints to
        # keep it bounded (measured: unbounded tree hangs the build)
        st = st.localCheckpoint(eager=True)
        # single-typed receivers -> methodFullName rewrite
        single = (st.groupBy("path", "var")
                  .agg(F.collect_set("type").alias("tys"))
                  .filter(F.size("tys") == 1)
                  .select("path", "var", F.element_at("tys", 1).alias("type")))
        # annotated params resolve their head through the symbol table
        st = st.unionByName(
            ann_params.join(single.withColumnRenamed("var", "head"),
                            ["path", "head"])
            .select("path", F.col("pvar").alias("var"),
                    F.when(F.col("tail") == "", F.col("type"))
                    .otherwise(F.concat_ws(":", "type", "tail"))
                    .alias("type"))).distinct()
        # annotated members: `v = this.<f>` adopts the resolved member type
        mem_ty = (ann_members.join(single.withColumnRenamed("var", "head"),
                                   ["path", "head"])
                  .select("path", "fld",
                          F.when(F.col("tail") == "", F.col("type"))
                          .otherwise(F.concat_ws(":", "type", "tail"))
                          .alias("type")))
        st = st.unionByName(
            this_fa_edges.join(mem_ty, ["path", "fld"])
            .select("path", "var", "type")).distinct()
        # identifier-rhs exports (`exports.f = localName`) alias the
        # exported local's recovered types
        st = st.unionByName(
            export_ident_edges.join(
                st.select("path", F.col("var").alias("src_var"), "type"),
                ["path", "src_var"])
            .select("path", "var", "type")).distinct()
        exp_entity = (st.filter(F.col("var").startswith("exports."))
                      .select(F.col("path").alias("src_path"),
                              F.col("var").alias("evar"), "type"))
        # exported members flow to relative importers under their binding
        # (`<binding>.<member>` composite vars for member-call resolution)
        st = st.unionByName(
            rel_links.join(exp_entity, "src_path")
            .filter(~F.col("evar").isin("exports.exports",
                                        "exports.default"))
            .select(F.col("imp_path").alias("path"),
                    F.concat(F.col("var"), F.lit("."),
                             F.expr("substring(evar, 9)")).alias("var"),
                    "type")).distinct()
        # resolved bindings adopt their exported entity: named/default
        # export for ES imports; the `module.exports` closure — else the
        # module's `::program` entity — for requires
        # (JavaScriptImportResolverPass; CallLinkerPassTests receiver
        # typeFullName "bar.js::program", RequirePassTests
        # "sampleone.js::program:<lambda>0")
        ad_member = (rel_links.filter(F.col("member").isNotNull())
                     .join(exp_entity, "src_path")
                     .filter((F.col("evar") == F.concat(F.lit("exports."),
                                                        F.col("member")))
                             | (F.col("evar") == "exports.default"))
                     .select(F.col("imp_path").alias("path"), "var", "type"))
        req_binds = rel_links.filter(F.col("member").isNull())
        mod_exp = exp_entity.filter(F.col("evar") == "exports.exports")
        ad_modfn = (req_binds.join(mod_exp, "src_path")
                    .select(F.col("imp_path").alias("path"), "var", "type"))
        ad_prog = (req_binds.join(mod_exp.select("src_path").distinct(),
                                  "src_path", "left_anti")
                   .select(F.col("imp_path").alias("path"), "var",
                           F.concat(F.col("src_path"),
                                    F.lit("::program")).alias("type")))
        st = (st.unionByName(ad_member).unionByName(ad_modfn)
              .unionByName(ad_prog).distinct()
              .localCheckpoint(eager=True))  # midpoint truncation, see above
        remaining = member_calls.join(rewrites.select("id"), "id",
                                      "left_anti")
        # direct `v.f` symbol entries (object-literal methods) win over the
        # composed `type:name` rewrite
        direct_single = (st.filter(F.col("var").contains(".")
                                   & F.col("type").contains(":"))
                         .groupBy("path", F.col("var").alias("dvar"))
                         .agg(F.collect_set("type").alias("tys"))
                         .filter(F.size("tys") == 1)
                         .select("path", "dvar",
                                 F.element_at("tys", 1).alias("rec_mfn")))
        rw_direct = (remaining
                     .withColumn("dvar", F.concat_ws(".", "var", "name"))
                     .join(direct_single, ["path", "dvar"])
                     .select("id", "rec_mfn", "path"))
        remaining = remaining.join(rw_direct.select("id"), "id", "left_anti")
        rw = (remaining.join(single, ["path", "var"])
              .select("id",
                      F.concat_ws(":", F.col("type"), F.col("name")).alias("rec_mfn"),
                      "path"))
        rw = rw.unionByName(rw_direct).withColumn("is_ctor", F.lit(False))
        # simple `f()` calls on a single-typed callable binding
        # (conservative: multi-hint bindings — the flow-insensitive
        # `barOrBaz` case — stay <unknownFullName>)
        single_callable = (st.filter(
            F.col("type").contains("::")
            & ~F.col("type").endswith("::program")
            & F.expr("instr(substring(type, instr(type, '::') + 2), ':')"
                     " > 0"))
            .groupBy("path", "var")
            .agg(F.collect_set("type").alias("tys"))
            .filter(F.size("tys") == 1)
            .select("path", "var", F.element_at("tys", 1).alias("rec_mfn")))
        rw_call = (direct_calls
                   .join(rewrites.select("id"), "id", "left_anti")
                   .join(rw.select("id"), "id", "left_anti")
                   .join(single_callable, ["path", "var"])
                   .select("id", "rec_mfn", "path")
                   .withColumn("is_ctor", F.lit(False)))
        rw = rw.unionByName(rw_call)
        # `new F()` where F is a single-typed known closure -> the ctor
        # call resolves to the function's fullname (no <returnValue>)
        single2 = (st.groupBy("path", "var")
                   .agg(F.collect_set("type").alias("tys"))
                   .filter(F.size("tys") == 1)
                   .select("path", "var",
                           F.element_at("tys", 1).alias("type")))
        op_new = calls.filter(F.col("name") == M.OP + "new").select(
            F.col("id").alias("new_id"), "path")
        rw_new = (op_new.join(new_recv, "new_id")
                  .join(single2.withColumnRenamed("var", "tname"),
                        ["path", "tname"])
                  .filter(F.col("type").contains("::"))
                  .select(F.col("new_id").alias("id"),
                          F.col("type").alias("rec_mfn"), "path")
                  .withColumn("is_ctor", F.lit(True)))
        if rewrites is not None:
            rw_new = rw_new.join(rewrites.select("id"), "id", "left_anti")
        rw = rw.unionByName(rw_new).localCheckpoint(eager=True)
        rewrites = rw if rewrites is None else rewrites.unionByName(rw)
        # method-return types: annotation > returned literal > returned
        # recovered call; the ret: rows surface as typerec facts
        ret_ann_res = (mret_ann.join(single2.withColumnRenamed("var", "head"),
                                     ["path", "head"])
                       .select("mid",
                               F.when(F.col("tail") == "", F.col("type"))
                               .otherwise(F.concat_ws(":", "type", "tail"))
                               .alias("rtype"),
                               F.lit(0).alias("prio")))
        ret_call = (ret_call_ids.join(rewrites.select("id", "rec_mfn"), "id")
                    .select("mid",
                            F.concat(F.col("rec_mfn"),
                                     F.lit(":" + RETURN_VALUE)).alias("rtype"),
                            F.lit(2).alias("prio")))
        ret_map = (ret_ann_res
                   .unionByName(ret_lit.withColumn("prio", F.lit(1)))
                   .unionByName(ret_call)
                   .groupBy("mid")
                   .agg(F.min(F.struct("prio", "rtype")).alias("b"))
                   .select("mid", F.col("b.rtype").alias("rtype"))
                   .join(methods_js, "mid")
                   .localCheckpoint(eager=True))
        ret_by_mfn = ret_map.select(F.col("mfn_full").alias("rec_mfn"),
                                    F.col("rtype").alias("known_rtype"))
        st = st.unionByName(
            ret_map.filter(~F.col("mname").startswith(":"))
            .select("path", F.concat(F.lit("ret:"), "mname").alias("var"),
                    F.col("rtype").alias("type"))).distinct()
        # assigned results: known callee return type > `mfn:<returnValue>`
        ret = (ret_lhs.join(rw.filter(~F.col("is_ctor"))
                            .select(F.col("id").alias("rhs_id"), "rec_mfn"),
                            "rhs_id")
               .join(ret_by_mfn, "rec_mfn", "left")
               .select("path", "var",
                       F.when(F.col("rec_mfn").startswith("__ecma.Math:"),
                              F.lit("__ecma.Number"))
                       .when(F.col("known_rtype").isNotNull(),
                             F.col("known_rtype"))
                       .otherwise(F.concat(F.col("rec_mfn"),
                                           F.lit(":" + RETURN_VALUE)))
                       .alias("type")))
        st = (st.unionByName(ret).distinct()
              .localCheckpoint(eager=True))
    # a later-recovered return type REPLACES the dummy `mfn:<returnValue>`
    # hint rows accumulated in earlier iterations
    repl = ret_by_mfn.select(
        F.concat(F.col("rec_mfn"), F.lit(":" + RETURN_VALUE)).alias("type"),
        "known_rtype").dropDuplicates(["type"])
    st = (st.join(repl, "type", "left")
          .select("path", "var",
                  F.coalesce("known_rtype", "type").alias("type"))
          .distinct().localCheckpoint(eager=True))
    return rewrites.select("id", "rec_mfn"), st


def js_inherits_parents(nodes: DataFrame,
                        project_col: str = "repo") -> DataFrame:
    """(id, parent_fn) for JavaScript TYPE_DECLs with inheritsFrom entries
    — the XInheritanceFullNamePass twin (jssrc flavor: pathSep ':',
    moduleName ':program', fileExt '.js').  A parent name that is in the
    file's scope (same-file type decls + imported entities) and names a
    TYPE_DECL anywhere in the corpus resolves to that fullName; otherwise
    an import whose entity ends with the name synthesizes the external
    stub `<module>.js::program:<name>`; unresolvable parents keep the raw
    name.  All joins are name-keyed small dimensions (∝ |type decls| /
    |imports|) — AQE picks the strategy, nothing is force-broadcast
    (jssrc InheritanceFullNamePassTests; sequential mirror:
    oracle.js_resolve_inherits)."""
    js = nodes.filter(F.col("lang") == "javascript") \
        .withColumn("proj", F.col(project_col))
    td = (js.filter((F.col("kind") == M.TYPE_DECL)
                    & F.col("inherits_from").isNotNull())
          .select("id", "proj", "path", "full_name",
                  F.explode("inherits_from").alias("x"))
          .filter(~F.col("x").isin("ANY", "object", "")))
    imp = js.filter(F.col("kind") == M.IMPORT).select(
        "proj", "path", F.col("full_name").alias("qn"))
    scope = (imp.select("path", F.substring_index("qn", ":", -1).alias("x"))
             .unionByName(js.filter(F.col("kind") == M.TYPE_DECL)
                          .select("path", F.substring_index(
                              "full_name", ":", -1).alias("x")))
             .distinct())
    cands = (js.filter(F.col("kind") == M.TYPE_DECL)
             .select("proj", F.col("name").alias("x"),
                     F.col("full_name").alias("cand_fn")).distinct())
    resolved = (td.join(scope, ["path", "x"], "leftsemi")
                .join(cands, ["proj", "x"])
                .filter(F.col("cand_fn") != F.col("full_name"))
                .select("id", F.col("cand_fn").alias("parent_fn"))
                .distinct())
    unres = td.join(resolved.select("id").distinct(), "id", "left_anti")
    mod = F.substring_index("qn", ":", 1)
    norm = F.regexp_replace(mod, r"(^|/)\./", "$1")
    for _ in range(4):
        norm = F.regexp_replace(norm, r"(^|/)[^/.][^/]*/\.\./", "$1")
    synth = (unres.join(imp.drop("proj"), "path")
             .filter(F.col("qn").endswith(F.concat(F.lit(":"), F.col("x"))))
             .withColumn("mod_norm", norm)
             .withColumn("ext", F.when(F.substring_index(
                 "mod_norm", "/", -1).contains("."), "").otherwise(".js"))
             .select("id", F.concat("mod_norm", "ext",
                                    F.lit("::program:"),
                                    F.col("x")).alias("parent_fn"))
             .distinct())
    leftover = (unres.join(synth.select("id").distinct(), "id", "left_anti")
                .select("id", F.col("x").alias("parent_fn")))
    return resolved.unionByName(synth).unionByName(leftover)


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
