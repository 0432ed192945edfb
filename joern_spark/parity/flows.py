"""Pure-Python flow-path enumeration + the reference's path serialization,
for the ``flows`` parity relation.

The reference's c2cpg dataflow suite (c2cpg/src/test/scala/io/joern/c2cpg/
dataflow/DataFlowTests.scala, via DataFlowCodeToCpgSuite) asserts
``sink.reachableByFlows(source).map(flowToResultPairs)`` as exact sets of
``(code, line)`` pair lists. This module re-derives, over the raw parsed
rows of one fixture:

* the backwards flow search of the reference engine (Engine.scala:96-140 —
  REACHING_DEF steps, param->argument expansion at resolved call sites per
  TaskCreator.scala:44-79, call-site->callee-RETURN expansion), and
* ``Path.resultPairs()`` (dataflowengineoss/.../language/Path.scala:10-20):
  METHOD_PARAMETER_IN renders as ``name(param codes)``; every other element
  renders as ``point.statement.repr`` with the element's own line, where
  ``statement`` is AstNodeMethods.statement (AstNodeMethods.scala:113-143:
  Identifier/MethodRef/TypeRef/Literal and generic-member-access calls hop
  to their parent expression once, BLOCK takes its last expression, calls /
  returns / methodReturns are themselves) and ``repr`` is
  AstNodeMethods.repr (:94-100: METHOD -> name, else code); consecutive
  duplicate pairs collapse (Path.scala:19).

The *expected* pair lists live in the corpus modules, transcribed by hand
from the reference suite — this extractor is only the "got" side.
"""

from __future__ import annotations

from collections import defaultdict, deque

from joern_spark import model as M

# MemberAccess.isGenericMemberAccessName (semanticcpg/.../utils/MemberAccess.scala:10-23)
GENERIC_MEMBER_ACCESS = {
    "<operator>.memberAccess", "<operator>.indirectComputedMemberAccess",
    "<operator>.indirectMemberAccess", "<operator>.computedMemberAccess",
    "<operator>.indirection", "<operator>.addressOf",
    "<operator>.fieldAccess", "<operator>.indirectFieldAccess",
    "<operator>.indexAccess", "<operator>.indirectIndexAccess",
    "<operator>.pointerShift", "<operator>.getElementPtr",
}

# node kinds that are Expressions in the reference schema (can be a
# parentExpression target)
EXPRESSION_KINDS = {
    M.CALL, M.IDENTIFIER, M.LITERAL, M.METHOD_REF, M.TYPE_REF, M.RETURN,
    M.BLOCK, M.CONTROL_STRUCTURE, M.UNKNOWN, M.FIELD_IDENTIFIER,
}

MAX_STEPS = 32
MAX_CALL_DEPTH = 2


class _Case:
    """Indexed view over one fixture's raw rows."""

    def __init__(self, rows: list[dict]):
        self.rows = rows
        self.by_idx = {r["node_idx"]: r for r in rows}
        self.kids: dict[int, list[dict]] = defaultdict(list)
        for r in rows:
            self.kids[r["parent_idx"]].append(r)
        for v in self.kids.values():
            v.sort(key=lambda r: r["order"])
        self.methods = [r for r in rows if r["kind"] == M.METHOD]
        self.methods_by_name: dict[str, list[dict]] = defaultdict(list)
        for m in self.methods:
            self.methods_by_name[m["name"]].append(m)

    def params_of(self, m_idx: int) -> list[dict]:
        return sorted((r for r in self.kids[m_idx]
                       if r["kind"] == M.METHOD_PARAMETER_IN),
                      key=lambda r: r["param_index"])

    def method_return_of(self, m_idx: int) -> dict | None:
        return next((r for r in self.kids[m_idx]
                     if r["kind"] == M.METHOD_RETURN), None)


def _rd_edges(case: _Case) -> list[tuple[int, int, str]]:
    from joern_spark.operators.controlflow import cfg_for_method
    from joern_spark.operators.dataflow import reaching_def_edges
    edges: list[tuple[int, int, str]] = []
    for m in case.methods:
        mrows = [r for r in case.rows
                 if r["method_idx"] == m["node_idx"] or r["node_idx"] == m["node_idx"]]
        cfg = cfg_for_method(mrows, m)
        edges += reaching_def_edges(mrows, m, cfg)
    return edges


# --------------------------------------------------------------------------- #
# resultPairs serialization
# --------------------------------------------------------------------------- #

def _parent_expression(case: _Case, i: int) -> int:
    p = case.by_idx.get(case.by_idx[i]["parent_idx"])
    if p is not None and p["kind"] in EXPRESSION_KINDS:
        return p["node_idx"]
    return i


def _statement(case: _Case, i: int) -> int:
    r = case.by_idx[i]
    k = r["kind"]
    if k in (M.IDENTIFIER, M.METHOD_REF, M.TYPE_REF, M.LITERAL):
        return _parent_expression(case, i)
    if k == M.METHOD_PARAMETER_IN:
        return r["method_idx"]
    if k == M.METHOD_PARAMETER_OUT:
        mr = case.method_return_of(r["method_idx"])
        return mr["node_idx"] if mr else i
    if k == M.CALL and r["name"] in GENERIC_MEMBER_ACCESS:
        return _parent_expression(case, i)
    if k == M.BLOCK:
        exprs = [c for c in case.kids[i]
                 if c["kind"] in EXPRESSION_KINDS and c["kind"] != M.METHOD]
        if exprs:
            return _statement(case, exprs[-1]["node_idx"])
        return i
    return i


def _repr(case: _Case, i: int) -> str:
    r = case.by_idx[i]
    if r["kind"] == M.METHOD:
        return r["name"]
    if r["kind"] == M.MEMBER:
        return r["name"]
    return r["code"]


def result_pairs(case: _Case, path: list[int]) -> tuple[tuple[str, int], ...]:
    pairs: list[tuple[str, int]] = []
    for i in path:
        r = case.by_idx[i]
        if r["kind"] == M.METHOD_PARAMETER_IN:
            m = case.by_idx[r["method_idx"]]
            ps = case.params_of(m["node_idx"])
            code = f"{m['name']}({', '.join(p['code'] for p in ps)})"
            pairs.append((code, r["line"]))
        else:
            pairs.append((_repr(case, _statement(case, i)), r["line"]))
    out: list[tuple[str, int]] = []
    for p in pairs:
        if not out or out[-1] != p:
            out.append(p)
    return tuple(out)


def serialize(pairs: tuple[tuple[str, int], ...] | list) -> str:
    return " | ".join(f"{code}:{line}" for code, line in pairs)


# --------------------------------------------------------------------------- #
# node selectors (mirror of the query specs the reference tests use)
# --------------------------------------------------------------------------- #

def select_nodes(case: _Case, spec: dict) -> list[int]:
    if "param" in spec:
        s = spec["param"]
        out = []
        for m in case.methods_by_name.get(s["method"], []):
            for p in case.params_of(m["node_idx"]):
                if "name" not in s or p["name"] == s["name"]:
                    out.append(p["node_idx"])
        return out
    if "method_return" in spec:
        return [case.method_return_of(m["node_idx"])["node_idx"]
                for m in case.methods_by_name.get(spec["method_return"], [])
                if case.method_return_of(m["node_idx"]) is not None]
    if "identifier" in spec:
        s = spec["identifier"] or {}
        return [r["node_idx"] for r in case.rows if r["kind"] == M.IDENTIFIER
                and ("name" not in s or r["name"] == s["name"])]
    if "literal" in spec:
        s = spec["literal"] or {}
        return [r["node_idx"] for r in case.rows if r["kind"] == M.LITERAL
                and ("code" not in s or r["code"] == s["code"])]
    if "call" in spec:
        s = spec["call"]
        return [r["node_idx"] for r in case.rows if r["kind"] == M.CALL
                and r["name"] == s["name"]]
    if "call_arg" in spec:
        s = spec["call_arg"]
        out = []
        for r in case.rows:
            if r["kind"] == M.CALL and r["name"] == s["name"]:
                for c in case.kids[r["node_idx"]]:
                    if "index" not in s or c["arg_index"] == s["index"]:
                        if c["arg_index"] >= 1:
                            out.append(c["node_idx"])
        return out
    raise ValueError(f"unknown node spec {spec!r}")


# --------------------------------------------------------------------------- #
# backwards flow search
# --------------------------------------------------------------------------- #

def enumerate_paths(case: _Case, source_spec: dict, sink_spec: dict,
                    max_steps: int = MAX_STEPS,
                    max_call_depth: int = MAX_CALL_DEPTH) -> list[list[int]]:
    """All simple REACHING_DEF(+interprocedural) paths source->sink, as
    node_idx lists. Same step semantics as Steps.reachable_by_flows
    (query/__init__.py) — backwards frontier with cycle pruning and a
    call-depth cap."""
    back: dict[int, list[tuple[int, bool]]] = defaultdict(list)
    for s, d, _v in _rd_edges(case):
        back[d].append((s, False))

    # param -> matching argument at each call site resolved by name
    for m in case.methods:
        sites = [r for r in case.rows
                 if r["kind"] == M.CALL and r["name"] == m["name"]]
        for p in case.params_of(m["node_idx"]):
            for site in sites:
                for a in case.kids[site["node_idx"]]:
                    if a["arg_index"] == p["param_index"]:
                        back[p["node_idx"]].append((a["node_idx"], True))
        # call site -> RETURN statements of the callee
        rets = [r for r in case.rows if r["kind"] == M.RETURN
                and r["method_idx"] == m["node_idx"]]
        for site in sites:
            for ret in rets:
                back[site["node_idx"]].append((ret["node_idx"], True))

    sources = set(select_nodes(case, source_spec))
    sinks = select_nodes(case, sink_spec)

    results: list[list[int]] = []
    seen_paths: set[tuple[int, ...]] = set()
    frontier: list[tuple[int, tuple[int, ...], int]] = [
        (s, (s,), 0) for s in sinks]
    for _ in range(max_steps):
        nxt: list[tuple[int, tuple[int, ...], int]] = []
        for cur, path, cdepth in frontier:
            if cur in sources and path not in seen_paths:
                seen_paths.add(path)
                results.append(list(path))
            for prev, inter in back.get(cur, ()):
                if prev in path:
                    continue
                nd = cdepth + (1 if inter else 0)
                if nd > max_call_depth:
                    continue
                nxt.append((prev, (prev,) + path, nd))
        if not nxt:
            break
        # dedup identical frontier entries
        frontier = list({(c, p): (c, p, d) for c, p, d in nxt}.values())
    for cur, path, _ in frontier:  # final hit check after last step
        if cur in sources and path not in seen_paths:
            seen_paths.add(path)
            results.append(list(path))
    return results


def case_flow_facts(rows: list[dict], flow_specs: list[dict]) -> list[tuple[str, str]]:
    """-> (subj, obj) facts for one case: subj = flow name; obj = serialized
    path (exact-set assertions) or 'count=N' (size-only assertions)."""
    case = _Case(rows)
    out: list[tuple[str, str]] = []
    for f in flow_specs:
        paths = enumerate_paths(case, f["source"], f["sink"],
                                max_call_depth=f.get("max_call_depth",
                                                     MAX_CALL_DEPTH))
        serialized = sorted({serialize(result_pairs(case, p)) for p in paths})
        if f.get("assert") == "count":
            out.append((f["name"], f"count={len(serialized)}"))
        else:
            for s in serialized:
                out.append((f["name"], s))
            if not serialized:
                out.append((f["name"], ""))  # empty-set marker
    return out
