"""Per-method reaching-definitions + DDG emission (reference pass #23).

Semantics re-derived from the reference dataflowengineoss:

* flow graph with parameters spliced between METHOD and first body node —
  ReachingDefProblem.scala:37-150 (ReachingDefFlowGraph)
* gen/kill — ReachingDefTransferFunction.initGen/initKill
  (ReachingDefProblem.scala:160-290): gen(param)={param}; gen(call)=
  {call} ∪ {identifier/call arguments}; kills = other defs of the same
  variable (same identifier name, same call code, params of same name, and
  field accesses over a re-assigned base)
* lone-identifier optimization — OptimizedReachingDefTransferFunction
  (ReachingDefProblem.scala:297-342)
* bail-out above 4000 definitions — ReachingDefPass.scala:36-52
* DDG edge emission — DdgGenerator.scala:30-251 with the UsageAnalyzer
  variable-matching rules (same file, :255-367): sameVariable / isContainer /
  isPart by name/code string equality

Worklist solve over Python int-sets (the reference uses BitSet over
per-method def numbering — same idea; methods are small, batching across
methods comes from the Arrow partition).
"""

from __future__ import annotations

from joern_spark import model as M

MAX_DEFS = 4000  # reference OssDataFlow.scala:15 default maxNumberOfDefinitions

# gen-skip: MemberAccess.isFieldAccess (semanticcpg/.../utils/MemberAccess.scala:25-38)
# — "filter out field accesses to ensure they propagate taint unharmed";
# covers ALL member/index/deref accesses plus sizeOf, not just fieldAccess.
FIELD_ACCESS_NAMES = {
    M.OP_FIELD_ACCESS, M.OP_INDIRECT_FIELD_ACCESS,
    M.OP_INDEX_ACCESS, M.OP_INDIRECT_INDEX_ACCESS,
    M.OP_COMPUTED_MEMBER_ACCESS, M.OP_INDIRECTION, M.OP_SIZEOF,
    M.OP + "memberAccess", M.OP + "indirectMemberAccess",
    M.OP + "indirectComputedMemberAccess", M.OP + "getElementPtr",
}
# kill-skip: MemberAccess.isGenericMemberAccessName (:10-23) — same family
# minus sizeOf, plus addressOf and pointerShift.
GENERIC_MEMBER_ACCESS_NAMES = (FIELD_ACCESS_NAMES - {M.OP_SIZEOF}) | {
    M.OP_ADDRESS_OF, M.OP + "pointerShift"}
CONTAINER_NAMES = {M.OP_FIELD_ACCESS, M.OP_INDIRECT_FIELD_ACCESS,
                   M.OP_INDEX_ACCESS, M.OP_INDIRECT_INDEX_ACCESS}
INDIRECTION_NAMES = {M.OP_ADDRESS_OF, M.OP_INDIRECTION}
NOT_DDG_KINDS = {M.METHOD, M.CONTROL_STRUCTURE, M.FIELD_IDENTIFIER,
                 M.JUMP_TARGET, M.METHOD_RETURN}


def reaching_def_edges(rows: list[dict], method_row: dict,
                       cfg_edges: list[tuple[int, int, str]]) -> list[tuple[int, int, str]]:
    by_idx = {r["node_idx"]: r for r in rows}
    m_idx = method_row["node_idx"]
    by_idx[m_idx] = method_row

    kids: dict[int, list[dict]] = {}
    for r in rows:
        kids.setdefault(r["parent_idx"], []).append(r)
    for v in kids.values():
        v.sort(key=lambda r: r["order"])

    params = sorted((r for r in kids.get(m_idx, []) if r["kind"] == M.METHOD_PARAMETER_IN),
                    key=lambda r: r["param_index"])
    exit_idx = next((r["node_idx"] for r in kids.get(m_idx, [])
                     if r["kind"] == M.METHOD_RETURN), None)
    if exit_idx is None:
        return []

    # ---- flow graph: entry -> params -> body, body per CFG ----------------
    succ: dict[int, list[int]] = {}
    for s, d, _ in cfg_edges:
        succ.setdefault(s, []).append(d)
    body_first = succ.get(m_idx, [])
    if params:
        chain = [m_idx] + [p["node_idx"] for p in params]
        for a, b in zip(chain, chain[1:]):
            succ[a] = [b]
        succ[params[-1]["node_idx"]] = body_first
    nodes = set(succ) | {d for v in succ.values() for d in v} | {m_idx, exit_idx}
    preds: dict[int, list[int]] = {}
    for s, ds in succ.items():
        for d in ds:
            preds.setdefault(d, []).append(s)

    # ---- definitions: gen / kill ------------------------------------------
    def node_str(i: int) -> str | None:
        r = by_idx.get(i)
        if r is None:
            return None
        if r["kind"] == M.IDENTIFIER:
            return r["name"]
        if r["kind"] in (M.METHOD_PARAMETER_IN, M.METHOD_PARAMETER_OUT):
            return r["name"]
        return r["code"]

    def args_of(i: int) -> list[dict]:
        return [c for c in kids.get(i, []) if c["arg_index"] >= 0]

    calls = [r for r in rows if r["kind"] == M.CALL and r["node_idx"] in nodes]
    idents = [r for r in rows if r["kind"] == M.IDENTIFIER and r["node_idx"] in nodes]
    returns = [r for r in rows if r["kind"] == M.RETURN and r["node_idx"] in nodes]

    # subtree spans (preorder ⇒ contiguous): max idx within subtree
    max_idx: dict[int, int] = {}

    def span(i: int) -> int:
        if i in max_idx:
            return max_idx[i]
        mx = i
        for c in kids.get(i, []):
            mx = max(mx, span(c["node_idx"]))
        max_idx[i] = mx
        return mx

    gen: dict[int, set[int]] = {}
    for p in params:
        gen[p["node_idx"]] = {p["node_idx"]}
    for c in calls:
        if c["name"] in FIELD_ACCESS_NAMES:
            continue
        defs = {c["node_idx"]}
        for a in args_of(c["node_idx"]):
            if a["kind"] in (M.CALL, M.IDENTIFIER):
                defs.add(a["node_idx"])
        gen[c["node_idx"]] = defs

    n_defs = sum(len(v) for v in gen.values())
    if n_defs > MAX_DEFS:  # reference bail-out, ReachingDefPass.scala:36-52
        return []

    # lone-identifier optimization
    param_local_names = {p["name"] for p in params} | {
        r["name"] for r in rows if r["kind"] == M.LOCAL}
    ret_ident_names = set()
    for ret in returns:
        lo, hi = ret["node_idx"], span(ret["node_idx"])
        for i in range(lo, hi + 1):
            r = by_idx.get(i)
            if r is not None and r["kind"] == M.IDENTIFIER:
                ret_ident_names.add(r["name"])
    arg_occurrences: dict[str, list[tuple[int, int]]] = {}
    for c in calls:
        for a in args_of(c["node_idx"]):
            if a["kind"] == M.IDENTIFIER and a["name"] not in param_local_names \
                    and a["name"] not in ret_ident_names:
                arg_occurrences.setdefault(a["name"], []).append(
                    (c["node_idx"], a["node_idx"]))
    lone: set[int] = set()
    for name, occ in arg_occurrences.items():
        if len(occ) == 1:
            call_i, arg_i = occ[0]
            if call_i in gen:
                gen[call_i].discard(arg_i)
                lone.add(arg_i)

    # kill sets
    ident_by_name: dict[str, list[int]] = {}
    for r in idents:
        ident_by_name.setdefault(r["name"], []).append(r["node_idx"])
    for p in params:
        ident_by_name.setdefault(p["name"], []).append(p["node_idx"])
    call_by_code: dict[str, list[int]] = {}
    for c in calls:
        call_by_code.setdefault(c["code"], []).append(c["node_idx"])
    field_access_calls = [c for c in calls if c["name"] == M.OP_FIELD_ACCESS]

    def defs_of_same_var(d: int) -> set[int]:
        r = by_idx[d]
        out: set[int] = set()
        if r["kind"] == M.METHOD_PARAMETER_IN or r["kind"] == M.IDENTIFIER:
            out |= {x for x in ident_by_name.get(r["name"], []) if x != d}
            if r["kind"] == M.IDENTIFIER:
                for fc in field_access_calls:
                    lo, hi = fc["node_idx"], span(fc["node_idx"])
                    if any(by_idx.get(i, {}).get("kind") == M.IDENTIFIER
                           and by_idx[i]["name"] == r["name"]
                           for i in range(lo, hi + 1)):
                        out.add(fc["node_idx"])
        elif r["kind"] == M.CALL:
            out |= {x for x in call_by_code.get(r["code"], []) if x != d}
        return out & nodes

    kill: dict[int, set[int]] = {}
    for c in calls:
        if c["name"] in GENERIC_MEMBER_ACCESS_NAMES:
            continue
        ks: set[int] = set()
        for d in gen.get(c["node_idx"], ()):
            ks |= defs_of_same_var(d)
        kill[c["node_idx"]] = ks

    # ---- worklist solve ----------------------------------------------------
    in_sets: dict[int, set[int]] = {n: set() for n in nodes}
    out_sets: dict[int, set[int]] = {n: set(gen.get(n, ())) for n in nodes}
    work = list(nodes)
    while work:
        n = work.pop()
        new_in: set[int] = set()
        for p in preds.get(n, []):
            new_in |= out_sets[p]
        new_out = gen.get(n, set()) | (new_in - kill.get(n, set()))
        in_sets[n] = new_in
        if new_out != out_sets[n]:
            out_sets[n] = new_out
            for s in succ.get(n, []):
                work.append(s)

    # ---- DDG emission (DdgGenerator rules) ----------------------------------
    edges: list[tuple[int, int, str]] = []
    seen: set[tuple[int, int, str]] = set()

    def label_of(i: int) -> str:
        r = by_idx[i]
        if r["kind"] == M.METHOD_PARAMETER_IN:
            return r["name"]
        return r["code"]

    def add(src: int, dst: int, var: str = "") -> None:
        if src == dst:
            return
        sk, dk = by_idx.get(src, {}).get("kind"), by_idx.get(dst, {}).get("kind")
        if sk == M.UNKNOWN or dk == M.UNKNOWN:
            return
        e = (src, dst, var)
        if e not in seen:
            seen.add(e)
            edges.append(e)

    # Access-path elements mirror semanticcpg's AccessElement vocabulary
    # (accesspath/AccessElement.scala): ("*",)=IndirectionAccess,
    # ("&",)=AddressOf, ("c",s)=ConstantAccess, ("ps",k)=PointerShift(k),
    # ("vps",)=VariablePointerShift, ("var",)=VariableAccess.
    def _norm_path(path: list[tuple]) -> tuple:
        """Elements.destructiveNormalized (AccessPath.scala:319-345):
        drop PointerShift(0), merge adjacent shifts, cancel &* / *&."""
        out: list[tuple] = []
        for e in path:
            if e == ("ps", 0):
                continue
            if out:
                last = out[-1]
                if last[0] == "ps" and e[0] == "ps":
                    k = last[1] + e[1]
                    out.pop()
                    if k:
                        out.append(("ps", k))
                    continue
                if last[0] == "vps" and e[0] in ("ps", "vps"):
                    continue
                if last[0] == "ps" and e[0] == "vps":
                    out[-1] = ("vps",)
                    continue
                if (last, e) in ((("&",), ("*",)), (("*",), ("&",))):
                    out.pop()
                    continue
            out.append(e)
        return tuple(out)

    def _int_token(arg: dict) -> tuple:
        """extractAccessIntToken (AccessPathHandling.scala:123-135)."""
        try:
            return ("ps", int(arg["code"], 0))
        except (ValueError, TypeError):
            return ("vps",)

    def tracked_base_path(i: int):
        """(base name, normalized access-path tuple) for a chain of
        member/index/deref operators over an identifier/parameter base, or
        None — toTrackedBaseAndAccessPathSimple (AccessPathUsage.scala:13-47
        + AccessPathHandling.memberAccessToPath:34-84). Normalization makes
        `p[0]` ≡ `*p` (PointerShift(0) drops) and `a->f` ≡ `(*a).f`."""
        path: list[tuple] = []
        r = by_idx.get(i)
        while r is not None and r["kind"] == M.CALL:
            a = args_of(r["node_idx"])
            nm = r["name"]
            if nm == M.OP_FIELD_ACCESS and len(a) >= 2:
                path[0:0] = [("c", a[1]["name"] or a[1]["code"])]
            elif nm == M.OP_INDIRECT_FIELD_ACCESS and len(a) >= 2:
                path[0:0] = [("*",), ("c", a[1]["name"] or a[1]["code"])]
            elif nm == M.OP_INDIRECTION and a:
                path[0:0] = [("*",)]
            elif nm == M.OP_ADDRESS_OF and a:
                path[0:0] = [("&",)]
            elif nm == M.OP_INDEX_ACCESS and len(a) >= 2:
                tok = (("c", a[1]["code"]) if a[1]["kind"] == M.LITERAL
                       else ("var",))
                path[0:0] = [tok]
            elif nm == M.OP_INDIRECT_INDEX_ACCESS and len(a) >= 2:
                # memberAccessToPath: IndirectionAccess :: intToken :: tail
                # (reversed) ⇒ shift first, then deref
                path[0:0] = [_int_token(a[1]), ("*",)]
            else:
                return None
            r = by_idx.get(a[0]["node_idx"]) if a else None
        if r is not None and r["kind"] in (M.IDENTIFIER, M.METHOD_PARAMETER_IN):
            return (r["name"], _norm_path(path))
        return None

    def is_using(use_i: int, in_i: int) -> bool:
        use_s = node_str(use_i)
        r = by_idx[in_i]
        # sameVariable
        if r["kind"] == M.METHOD_PARAMETER_IN and use_s == r["name"]:
            return True
        if r["kind"] == M.IDENTIFIER and use_s == r["name"]:
            return True
        if r["kind"] == M.CALL:
            if r["name"] in INDIRECTION_NAMES:
                a = next(iter(args_of(in_i)), None)
                if a is not None and use_s == a["code"]:
                    return True
            elif use_s == r["code"]:
                return True
            # isContainer: use is the base of a container inElement
            if r["name"] in CONTAINER_NAMES:
                a = next(iter(args_of(in_i)), None)
                if a is not None and use_s == node_str(a["node_idx"]):
                    return True
        # isPart: use is a container over inElement's variable
        u = by_idx[use_i]
        if u["kind"] == M.CALL and u["name"] in CONTAINER_NAMES and \
                r["kind"] in (M.METHOD_PARAMETER_IN, M.IDENTIFIER):
            a = next(iter(args_of(use_i)), None)
            if a is not None and node_str(a["node_idx"]) == r["name"]:
                return True
        # isAlias: both are access chains over the same base with an
        # EXACT-matching access path (UsageAnalyzer.isAlias,
        # DdgGenerator.scala:319-331) — `arg->f` aliases `(*arg).f`
        if u["kind"] == M.CALL and r["kind"] == M.CALL:
            up, rp = tracked_base_path(use_i), tracked_base_path(in_i)
            if up is not None and up == rp and not any(
                    e[0] in ("var", "vps") for e in up[1]):
                # variable elements overtaint ⇒ VARIABLE_EXACT, not EXACT
                # (AccessPath.matchAndDiff:136-181)
                return True
        return False

    def uses(i: int) -> list[int]:
        r = by_idx[i]
        if r["kind"] == M.RETURN:
            cs = kids.get(i, [])
        elif r["kind"] == M.CALL:
            cs = args_of(i)
        else:
            return []
        return [c["node_idx"] for c in cs if c["kind"] != M.FIELD_IDENTIFIER]

    def used_incoming(i: int) -> dict[int, list[int]]:
        return {u: [d for d in in_sets.get(i, ()) if is_using(u, d)] for u in uses(i)}

    # entry edges
    for n in nodes:
        r = by_idx.get(n)
        if r is None or r["kind"] in NOT_DDG_KINDS:
            continue
        uid = used_incoming(n)
        if not any(v for v in uid.values()):
            add(m_idx, n)

    for n in sorted(nodes):
        r = by_idx.get(n)
        if r is None:
            continue
        if r["kind"] == M.CALL:
            uid = used_incoming(n)
            for use, ins in uid.items():
                for d in ins:
                    add(d, use, label_of(d))
            for use in uses(n):
                for g in gen.get(n, ()):
                    if g != use and by_idx[use]["kind"] not in NOT_DDG_KINDS:
                        add(use, g, label_of(use))
        elif r["kind"] == M.RETURN:
            uid = used_incoming(n)
            for use, ins in uid.items():
                add(use, n, by_idx[use]["code"])
                for d in ins:
                    if d != use:
                        add(d, use, label_of(d))
                if not ins:
                    add(m_idx, n)
            add(n, exit_idx, "<RET>")

    # block arguments (lowered object/new expressions, DdgGenerator
    # addEdgeForBlock): the block's last expression feeds the block node,
    # which feeds the enclosing call/return — `foo({tmp = {}; tmp.p = x;
    # tmp})` propagates x into foo (jssrc DataflowTests object notation)
    def add_edge_for_block(block_i: int, towards_i: int) -> None:
        cs = kids.get(block_i, [])
        if not cs:
            return
        last = cs[-1]
        if last["kind"] == M.IDENTIFIER:
            ins = [d for d in in_sets.get(last["node_idx"], ())
                   if is_using(last["node_idx"], d)
                   and by_idx[d]["kind"] in (M.IDENTIFIER, M.CALL)]
            for d in ins:
                add(d, block_i, label_of(d))
            if ins:
                add(block_i, towards_i)
        elif last["kind"] == M.CALL:
            add(last["node_idx"], block_i, label_of(last["node_idx"]))
            add(block_i, towards_i)

    for n in sorted(nodes):
        r = by_idx.get(n)
        if r is None:
            continue
        if r["kind"] == M.CALL:
            for a in args_of(n):
                if a["kind"] == M.BLOCK:
                    add_edge_for_block(a["node_idx"], n)
        elif r["kind"] == M.RETURN:
            for c in kids.get(n, []):
                if c["kind"] == M.BLOCK:
                    add_edge_for_block(c["node_idx"], n)

    # exit node in-defs
    for d in in_sets.get(exit_idx, ()):
        add(d, exit_idx, label_of(d))
    for d in lone:
        add(d, exit_idx, label_of(d))

    return edges
