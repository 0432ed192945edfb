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

import re as _re
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
MAX_CALL_DEPTH = 4  # EngineConfig default (Engine.scala:321)

# Default flow semantics (DefaultSemantics.scala:24-117): call name ->
# list of (src, dst) argument-index mappings; -1 is the return value.
# A name mapped to PASSTHROUGH propagates every argument to itself and
# to the return value (PassThroughMapping).
PASSTHROUGH = "PASSTHROUGH"
_ASSIGN_OP = [(2, 1), (1, 1), (2, -1)]
SEMANTICS: dict[str, object] = {
    "<operator>.addition": [(1, -1), (2, -1)],
    "<operator>.addressOf": [(1, -1)],
    "<operator>.assignment": [(2, 1), (2, -1)],
    "<operator>.assignmentAnd": _ASSIGN_OP,
    "<operator>.assignmentArithmeticShiftRight": _ASSIGN_OP,
    "<operator>.assignmentDivision": _ASSIGN_OP,
    "<operator>.assignmentExponentiation": _ASSIGN_OP,
    "<operator>.assignmentLogicalShiftRight": _ASSIGN_OP,
    "<operator>.assignmentMinus": _ASSIGN_OP,
    "<operator>.assignmentModulo": _ASSIGN_OP,
    "<operator>.assignmentMultiplication": _ASSIGN_OP,
    "<operator>.assignmentOr": _ASSIGN_OP,
    "<operator>.assignmentPlus": _ASSIGN_OP,
    "<operator>.assignmentShiftLeft": _ASSIGN_OP,
    "<operator>.assignmentXor": _ASSIGN_OP,
    "<operator>.cast": [(1, -1), (2, -1)],
    "<operator>.computedMemberAccess": [(1, -1)],
    "<operator>.conditional": [(2, -1), (3, -1)],
    "<operator>.elvis": [(1, -1), (2, -1)],
    "<operator>.notNullAssert": [(1, -1)],
    "<operator>.fieldAccess": [(1, -1)],
    "<operator>.getElementPtr": [(1, -1)],
    "<operator>.modulo": PASSTHROUGH,
    "<operator>.arrayInitializer": PASSTHROUGH,
    "<operator>.indexAccess": [(1, -1)],
    "<operator>.indirectComputedMemberAccess": [(1, -1)],
    "<operator>.indirectFieldAccess": [(1, -1)],
    "<operator>.indirectIndexAccess": [(1, -1), (2, 1)],
    "<operator>.indirectMemberAccess": [(1, -1)],
    "<operator>.indirection": [(1, -1)],
    "<operator>.memberAccess": [(1, -1)],
    "<operator>.pointerShift": [(1, -1)],
    "<operator>.postDecrement": [(1, 1), (1, -1)],
    "<operator>.postIncrement": [(1, 1), (1, -1)],
    "<operator>.preDecrement": [(1, 1), (1, -1)],
    "<operator>.preIncrement": [(1, 1), (1, -1)],
    "<operator>.sizeOf": [],
    # common external C calls (DefaultSemantics.cFlows)
    "abs": [(1, 1), (1, -1)],
    "abort": [],
    "asctime": [(1, 1), (1, -1)],
    "asctime_r": [(1, 1), (1, -1)],
    "atof": [(1, 1), (1, -1)],
    "atoi": [(1, 1), (1, -1)],
    "atol": [(1, 1), (1, -1)],
    "calloc": [(1, -1), (2, -1)],
    "ceil": [(1, 1), (1, 1)],
    "clock": [],
    "ctime": [(1, -1)],
    "ctime64": [(1, -1)],
    "ctime_r": [(1, -1)],
    "ctime64_r": [(1, -1)],
    "difftime": [(1, -1), (2, -1)],
    "difftime64": [(1, -1), (2, -1)],
    "div": PASSTHROUGH,
    "exit": [(1, 1)],
    "exp": [(1, -1)],
    "fabs": [(1, -1)],
    "fclose": [(1, 1), (1, -1)],
    "fdopen": [(1, -1), (2, -1)],
    "feof": [(1, 1), (1, -1)],
    "ferror": [(1, 1), (1, -1)],
    "fflush": [(1, 1), (1, -1)],
    "fgetc": [(1, 1), (1, -1)],
    "fwrite": [(1, 1), (1, -1), (2, -1), (3, -1), (4, -1)],
    "free": [(1, 1)],
    "getc": [(1, 1)],
    "scanf": [(2, 2)],
    "strcmp": [(1, 1), (1, -1), (2, 2), (2, -1)],
    "strlen": [(1, 1), (1, -1)],
    "strncpy": [(1, 1), (2, 2), (3, 3), (1, -1), (2, -1)],
    "strncat": [(1, 1), (2, 2), (3, 3), (1, -1), (2, -1)],
}


class _Case:
    """Indexed view over one fixture's raw rows.

    Calls to names with no METHOD in the fixture get a synthesized stub
    method with parameters ``p1..pN`` at line -1 — the analogue of the
    reference's MethodStubCreator (x2cpg/.../passes/base/MethodStubCreator
    .scala), whose stub params show up in golden flows as e.g.
    ``("sink(p1)", -1)`` (DataFlowTests.scala "DataFlowTest37")."""

    def __init__(self, rows: list[dict], semantics: list | None = None):
        # [(methodFullName pattern, is_regex, [(src_arg, dst_arg), ...])]
        self.extra_semantics = [
            (sp["mfn"], bool(sp.get("regex")),
             [tuple(x) for x in sp.get("flows", [])])
            for sp in (semantics or [])]
        rows = list(rows) + _stub_rows(rows)
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

    def has_body(self, m_idx: int) -> bool:
        """Has a CFG: a definition with a body block (possibly empty) — the
        condition for the paramIn->paramOut unwind and callee-RETURN
        expansion to exist at all."""
        return any(r["kind"] == M.BLOCK for r in self.kids[m_idx])

    def is_stub(self, m_idx: int) -> bool:
        """The reference's `.isStub`: a method whose block has no children
        (MethodTraversal.isStub). `function foo(x) {}` is a stub, so
        isOutputArgOfInternalMethod does NOT block arg-to-arg taint at its
        call sites (jssrc DataflowTests "function call argument" counts 6)."""
        return not any(r["kind"] == M.BLOCK and self.kids[r["node_idx"]]
                       for r in self.kids[m_idx])

    def in_call(self, i: int) -> dict | None:
        """The call this node is an argument of (Expression.inCall).
        Receivers (argumentIndex 0) ARE arguments in the reference schema —
        excluding them lets taint bridge through `this` args unchecked by
        the call's semantics (jssrc DataflowTests free-to-RET)."""
        p = self.by_idx.get(self.by_idx[i]["parent_idx"])
        if p is not None and p["kind"] == M.CALL and self.by_idx[i]["arg_index"] >= 0:
            return p
        return None


# --------------------------------------------------------------------------- #
# EdgeValidator (EdgeValidator.scala) + argument flow semantics
# --------------------------------------------------------------------------- #

def _sem_for_call(case: "_Case", call_row: dict):
    """Semantics for the called method; None = unknown (s.isEmpty).
    Case-level custom semantics (JavaDataflowFixture `withSemantics`,
    SemanticTests.scala:14-23) match the call's methodFullName exactly or
    by regex and take precedence over the name-keyed defaults."""
    for pat, is_regex, flows in case.extra_semantics:
        mfn = call_row.get("method_full_name") or ""
        if (_re.fullmatch(pat, mfn) if is_regex else pat == mfn):
            return flows
    return SEMANTICS.get(call_row["name"])


def _is_used(case: _Case, i: int) -> bool:
    """ExpressionMethods.isUsed: evaluation of the enclosing call reads
    this argument."""
    c = case.in_call(i)
    if c is None:
        return True
    s = _sem_for_call(case, c)
    if s is None:
        return True
    if s == PASSTHROUGH:
        return case.by_idx[i]["arg_index"] != 0
    idx = case.by_idx[i]["arg_index"]
    return any(src == idx for src, _dst in s)


def _is_defined(case: _Case, i: int) -> bool:
    """ExpressionMethods.isDefined: the enclosing call writes this arg."""
    c = case.in_call(i)
    if c is None:
        return True
    s = _sem_for_call(case, c)
    if s is None:
        return True
    if s == PASSTHROUGH:
        return case.by_idx[i]["arg_index"] != 0
    idx = case.by_idx[i]["arg_index"]
    return any(dst == idx for _src, dst in s)


def _has_defined_flow_to(case: _Case, src_i: int, dst_i: int) -> bool:
    c = case.in_call(src_i)
    s = _sem_for_call(case, c) if c is not None else None
    if s is None:
        return True
    si, di = case.by_idx[src_i]["arg_index"], case.by_idx[dst_i]["arg_index"]
    if s == PASSTHROUGH:
        return si == di
    return any(src == si and dst == di for src, dst in s)


def _is_call_retval(case: _Case, i: int) -> bool:
    """A CALL with semantics that do NOT taint its return value."""
    r = case.by_idx.get(i)
    if r is None or r["kind"] != M.CALL:
        return False
    s = _sem_for_call(case, r)
    if s is None or s == PASSTHROUGH:
        return False
    return not any(dst == -1 for _src, dst in s)


def _callees(case: _Case, call_row: dict) -> list[dict]:
    """Candidate callee METHOD rows for a call. Name-keyed like the engine's
    NoResolve mode, EXCEPT constructors: `new Baz(x)` must not resolve to a
    same-file `Foo.<init>` — the reference matches by methodFullName, so
    <init> candidates are filtered to the constructed type's fullname
    prefix (javasrc ReturnTests case2: external Baz stays external)."""
    ms = case.methods_by_name.get(call_row["name"], [])
    if call_row["name"] == M.CONSTRUCTOR and ms:
        mfn = call_row.get("method_full_name") or ""
        want_ty = mfn.split(":", 1)[0]  # "Baz.<init>"
        ms = [m for m in ms if m["full_name"].split(":", 1)[0] == want_ty]
    return ms


def _is_output_arg_of_internal_method(case: _Case, i: int) -> bool:
    """Engine.isOutputArgOfInternalMethod: internal AND not-a-stub
    (`methodsForCall(call).internal.isNotStub.nonEmpty`) and no
    semantics."""
    c = case.in_call(i)
    if c is None or _sem_for_call(case, c) is not None:
        return False
    return any(case.has_body(m["node_idx"]) and not case.is_stub(m["node_idx"])
               for m in _callees(case, c))


def _internal_methods_for_call(case: _Case, call_row: dict) -> bool:
    """True iff non-external methods exist for the call (synthesized stubs
    are external, parsed methods — including prototypes — are internal)."""
    return any(not m.get("is_external", False)
               for m in _callees(case, call_row))


def _element_visible(case: _Case, parent: int, child: int) -> bool:
    """The `visible` flag of the parent PathElement created for an RD step
    (Engine.elemForEdge, Engine.scala:218-232). Invisible elements stay on
    the path (and count for longest-path dedup) but are dropped from the
    displayed flow (ExtendedCfgNode.reachableByFlows:51-55)."""
    p, c = case.by_idx.get(parent), case.by_idx[child]
    if p is None or p["kind"] not in EXPRESSION_KINDS \
            or c["kind"] not in EXPRESSION_KINDS:
        return True
    pc, cc = case.in_call(parent), case.in_call(child)
    same = (pc is None and cc is None) or (
        pc is not None and cc is not None
        and pc["node_idx"] == cc["node_idx"])
    if same:
        if pc is None:
            return True  # no enclosing call: no semantics, no methods
        sem_exists = _sem_for_call(case, pc) is not None
        return (sem_exists and _is_defined(case, parent)) \
            or not _internal_methods_for_call(case, pc)
    return _is_defined(case, parent)


def _is_valid_edge(case: _Case, child: int, parent: int) -> bool:
    """EdgeValidator.isValidEdge(childNode=edge dst, parentNode=edge src)."""
    child_expr = case.by_idx[child]["kind"] in EXPRESSION_KINDS
    parent_row = case.by_idx.get(parent)
    parent_expr = parent_row is not None and parent_row["kind"] in EXPRESSION_KINDS
    if child_expr:
        if _is_call_retval(case, parent):
            return False
        # isValidEdgeToExpression
        if parent_expr:
            same = case.in_call(parent) is case.in_call(child) or (
                case.in_call(parent) is not None and case.in_call(child) is not None
                and case.in_call(parent)["node_idx"] == case.in_call(child)["node_idx"])
            if same and _is_output_arg_of_internal_method(case, parent):
                return False
            if not ((same and _is_used(case, parent) and _is_defined(case, child))
                    or (not same and _is_used(case, child))):
                return False
        elif not _is_used(case, child):
            return False
        # arg must not taint its own call's retval when semantics say no
        if case.by_idx[child]["kind"] == M.CALL and _is_call_retval(case, child) \
                and case.by_idx.get(parent, {}).get("parent_idx") == child:
            return False
        if parent_expr and case.in_call(parent) is not None \
                and case.in_call(child) is not None \
                and case.in_call(parent)["node_idx"] == case.in_call(child)["node_idx"] \
                and _is_defined(case, child) and _is_used(case, parent):
            return _has_defined_flow_to(case, parent, child)
        return True
    return not _is_call_retval(case, parent)


def _stub_rows(rows: list[dict]) -> list[dict]:
    defined = {r["name"] for r in rows if r["kind"] == M.METHOD}
    arity: dict[str, int] = {}
    for r in rows:
        if r["kind"] == M.CALL and not r["name"].startswith("<operator>") \
                and r["name"] not in defined:
            n_args = sum(1 for c in rows if c["parent_idx"] == r["node_idx"]
                         and c["arg_index"] >= 1)
            arity[r["name"]] = max(arity.get(r["name"], 0), n_args)
    nxt = max((r["node_idx"] for r in rows), default=-1) + 1
    out: list[dict] = []

    def mk(kind, **kw):
        nonlocal nxt
        d = dict(node_idx=nxt, parent_idx=-1, kind=kind, code="", name="",
                 line=-1, order=0, method_idx=-1, arg_index=-1,
                 param_index=-1, full_name="", is_external=True)
        d.update(kw)
        nxt += 1
        return d

    for name in sorted(arity):
        m = mk(M.METHOD, code=name, name=name, full_name=name)
        out.append(m)
        for i in range(1, arity[name] + 1):
            out.append(mk(M.METHOD_PARAMETER_IN, code=f"p{i}", name=f"p{i}",
                          parent_idx=m["node_idx"], method_idx=m["node_idx"],
                          param_index=i, order=i))
        out.append(mk(M.METHOD_RETURN, code="RET", parent_idx=m["node_idx"],
                      method_idx=m["node_idx"], order=arity[name] + 1))
    return out


def _rd_edges(case: _Case) -> list[tuple[int, int, str]]:
    from joern_spark.operators.controlflow import cfg_for_method
    from joern_spark.operators.dataflow import reaching_def_edges
    edges: list[tuple[int, int, str]] = []
    for m in case.methods:
        mrows = [r for r in case.rows
                 if r["method_idx"] == m["node_idx"] or r["node_idx"] == m["node_idx"]]
        cfg = cfg_for_method(mrows, m)
        edges += reaching_def_edges(mrows, m, cfg)
    edges += _capture_edges(case)
    return edges


def _capture_edges(case: _Case) -> list[tuple[int, int, str]]:
    """DdgGenerator.addEdgesToCapturedIdentifiersAndParameters: for every
    identifier, REACHING_DEF edges to the FIRST same-named identifier in
    each method capturing its declaration (identifierToFirstUsages /
    firstIdentifierFromCapturedScopes — plain head, no written-usage
    filter); for every captured parameter, edges to EVERY identifier in
    the capturing method (the over-approximation is filtered by the
    EdgeValidator at query time)."""
    decl_capturing: dict[int, set[int]] = defaultdict(set)
    idents_by_method: dict[int, list[dict]] = defaultdict(list)
    for r in case.rows:
        if r["kind"] != M.IDENTIFIER:
            continue
        idents_by_method[r["method_idx"]].append(r)
        d_idx = r.get("ref_idx", -1)
        if d_idx is None or d_idx < 0:
            continue
        d = case.by_idx.get(d_idx)
        if d is not None and r["method_idx"] != d["method_idx"] \
                and r["method_idx"] >= 0:
            decl_capturing[d_idx].add(r["method_idx"])
    for v in idents_by_method.values():
        v.sort(key=lambda r: (r["line"], r["node_idx"]))
    out: list[tuple[int, int, str]] = []
    for r in case.rows:
        if r["kind"] == M.IDENTIFIER:
            d_idx = r.get("ref_idx", -1)
            for midx in sorted(decl_capturing.get(d_idx, ())):
                if midx == r["method_idx"]:
                    continue
                first = next((i for i in idents_by_method[midx]
                              if i["name"] == r["name"]), None)
                if first is not None and first["node_idx"] != r["node_idx"]:
                    out.append((r["node_idx"], first["node_idx"], r["name"]))
        elif r["kind"] == M.METHOD_PARAMETER_IN:
            for midx in sorted(decl_capturing.get(r["node_idx"], ())):
                for i in idents_by_method[midx]:
                    out.append((r["node_idx"], i["node_idx"], r["name"]))
    return out


# --------------------------------------------------------------------------- #
# resultPairs serialization
# --------------------------------------------------------------------------- #

def _parent_expression(case: _Case, i: int) -> int:
    """ExpressionMethods._parentExpression: walk up, skipping THROUGH
    generic-member-access call parents (tail-recursive in the reference)."""
    p = case.by_idx.get(case.by_idx[i]["parent_idx"])
    while p is not None and p["kind"] == M.CALL \
            and p["name"] in GENERIC_MEMBER_ACCESS:
        p2 = case.by_idx.get(p["parent_idx"])
        if p2 is None:
            break
        p = p2
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
        s = spec["param"] or {}
        if "method" in s:
            ms = case.methods_by_name.get(s["method"], [])
        else:
            ms = case.methods  # cpg.method.parameter
        out = []
        for m in ms:
            for p in case.params_of(m["node_idx"]):
                if "name" in s and p["name"] != s["name"]:
                    continue
                if "index" in s and p["param_index"] != s["index"]:
                    continue
                out.append(p["node_idx"])
        return out
    if "method_return" in spec:
        return [case.method_return_of(m["node_idx"])["node_idx"]
                for m in case.methods_by_name.get(spec["method_return"], [])
                if case.method_return_of(m["node_idx"]) is not None]
    if "ret" in spec:  # cpg.ret / cpg.method(X).ast.isReturn
        s = spec["ret"] or {}
        out = []
        for r in case.rows:
            if r["kind"] != M.RETURN:
                continue
            if "method" in s:
                m = case.by_idx.get(r["method_idx"])
                if m is None or m["name"] != s["method"]:
                    continue
            out.append(r["node_idx"])
        return out
    def _in_method(r, s):
        # optional `method` scoping (JavaDataflowFixture's
        # sourceMethod.literal / sinkMethod.call selectors)
        if "method" not in s:
            return True
        m = case.by_idx.get(r["method_idx"])
        return m is not None and m["name"] == s["method"]

    if "member" in spec:  # cpg.member.name(X) — MEMBER-node sources
        s = spec["member"] or {}
        return [r["node_idx"] for r in case.rows if r["kind"] == M.MEMBER
                and ("name" not in s or r["name"] == s["name"])]
    if "identifier" in spec:
        s = spec["identifier"] or {}
        out = [r["node_idx"] for r in case.rows if r["kind"] == M.IDENTIFIER
               and ("name" not in s or r["name"] == s["name"])
               and ("line" not in s or r["line"] == s["line"])
               and _in_method(r, s)]
        if s.get("head"):  # cpg.identifier(X).head — first in document order
            out = out[:1]
        return out
    if "literal" in spec:
        s = spec["literal"] or {}
        return [r["node_idx"] for r in case.rows if r["kind"] == M.LITERAL
                and ("code" not in s or r["code"] == s["code"])
                and ("line" not in s or r["line"] == s["line"])
                and _in_method(r, s)]
    if "field_access" in spec:
        # cpg.fieldAccess.where(_.fieldIdentifier.canonicalName(X))
        s = spec["field_access"] or {}
        out = []
        for r in case.rows:
            if r["kind"] != M.CALL or r["name"] not in _FIELD_ACCESS_NAMES:
                continue
            fi = next((c for c in case.kids[r["node_idx"]]
                       if c["kind"] == M.FIELD_IDENTIFIER), None)
            if "field" in s and (fi is None
                                 or fi["canonical_name"] != s["field"]):
                continue
            out.append(r["node_idx"])
        return out
    if "call" in spec:
        s = spec["call"]
        return [r["node_idx"] for r in case.rows if r["kind"] == M.CALL
                and ("name" not in s or r["name"] == s["name"])
                and ("code" not in s or r["code"] == s["code"])
                and ("code_re" not in s
                     or _re.fullmatch(s["code_re"], r["code"]))
                and _in_method(r, s)]
    if "call_arg" in spec:
        s = spec["call_arg"]
        out = []
        for r in case.rows:
            if r["kind"] != M.CALL:
                continue
            if "name" in s and r["name"] != s["name"]:
                continue
            if "code" in s and r["code"] != s["code"]:
                continue
            if "code_re" in s and not _re.fullmatch(s["code_re"], r["code"]):
                continue
            if not _in_method(r, s):
                continue
            for c in case.kids[r["node_idx"]]:
                # `.argument` with no index includes the receiver (index 0,
                # jssrc DataflowTests "sink.size shouldBe 3 // incl. this");
                # explicit `.argument(i)` selects that index only
                if c["arg_index"] < (1 if "index" in s else 0):
                    continue
                if "index" in s and c["arg_index"] != s["index"]:
                    continue
                if "arg_code" in s and c["code"] != s["arg_code"]:
                    continue
                out.append(c["node_idx"])
                if s.get("subtree"):
                    # .argument(i).ast.collectAll[Expression] — the whole
                    # argument subtree (JavaDataflowFixture sink)
                    stack = list(case.kids[c["node_idx"]])
                    while stack:
                        n = stack.pop()
                        if n["kind"] in EXPRESSION_KINDS:
                            out.append(n["node_idx"])
                        stack.extend(case.kids[n["node_idx"]])
        return out
    if "assign_target_of_call" in spec:
        # cpg.call(X).inAssignment.target — argument(1) of the enclosing
        # assignment whose RHS subtree contains a call named X
        s = spec["assign_target_of_call"]
        out = []
        for r in case.rows:
            if r["kind"] == M.CALL and r["name"] == M.OP_ASSIGNMENT:
                kids = case.kids[r["node_idx"]]
                tgt = next((c for c in kids if c["arg_index"] == 1), None)
                rhs = next((c for c in kids if c["arg_index"] == 2), None)
                if tgt is None or rhs is None:
                    continue
                stack = [rhs]
                hit = False
                while stack:
                    n = stack.pop()
                    if n["kind"] == M.CALL and n["name"] == s["name"]:
                        hit = True
                        break
                    stack.extend(case.kids[n["node_idx"]])
                if hit:
                    out.append(tgt["node_idx"])
        return out
    raise ValueError(f"unknown node spec {spec!r}")


# --------------------------------------------------------------------------- #
# backwards flow search
# --------------------------------------------------------------------------- #

_FIELD_ACCESS_NAMES = {"<operator>.fieldAccess", "<operator>.indirectFieldAccess"}


def _not_lhs_of_assignment(case: _Case, i: int) -> bool:
    """BaseSourceToStartingPoints.notLeftHandOfAssignment: the node is not
    argument(1) of an assignment-family call."""
    r = case.by_idx[i]
    if r["arg_index"] != 1:
        return True
    p = case.by_idx.get(r["parent_idx"])
    return not (p is not None and p["kind"] == M.CALL
                and p["name"].startswith("<operator>.assignment"))


def _literal_member_usages(case: _Case, lit: dict) -> list[int]:
    """SourcesToStartingPoints literal arm (SourcesToStartingPoints.scala:
    literalToInitializedMembers + usages + usageInOtherClasses): a literal
    that initializes a member — i.e. sits under an assignment inside
    `<clinit>` / `<init>` whose target is a fieldAccess — expands to the
    first non-written usage of that member per method: same-class methods
    match `this`/typed-identifier bases; the all-methods pass additionally
    matches TYPE_REF bases (static access, NewObjectTests.scala)."""
    m = case.by_idx.get(lit["method_idx"])
    if m is None or m["name"] not in (M.STATIC_INIT, M.CONSTRUCTOR,
                                      "__init__"):
        return []
    # enclosing assignment(s): walk the parent chain (inAstMinusLeaf)
    targets: list[dict] = []
    cur = lit
    while True:
        p = case.by_idx.get(cur["parent_idx"])
        if p is None or p["kind"] == M.METHOD:
            break
        if p["kind"] == M.CALL and p["name"].startswith(
                "<operator>.assignment"):
            tgt = next((c for c in case.kids[p["node_idx"]]
                        if c["arg_index"] == 1), None)
            if tgt is not None and tgt["kind"] == M.CALL \
                    and tgt["name"] in _FIELD_ACCESS_NAMES:
                targets.append(tgt)
        cur = p
    if not targets:
        return []
    td_full = m["ast_parent_full_name"]

    def _subtree_rows(root_idx: int, kind: str) -> list[dict]:
        found, stack = [], list(case.kids[root_idx])
        while stack:
            n = stack.pop()
            if n["kind"] == kind:
                found.append(n)
            stack.extend(case.kids[n["node_idx"]])
        return sorted(found, key=lambda r: r["node_idx"])

    out: list[int] = []
    field_names = {fi["canonical_name"]
                   for t in targets
                   for fi in _subtree_rows(t["node_idx"], M.FIELD_IDENTIFIER)}
    if not field_names:
        return []
    td_simple = td_full.split(".")[-1]
    for meth in case.methods:
        same_class = meth.get("ast_parent_full_name") == td_full
        if same_class and meth["name"] in (M.STATIC_INIT, M.CONSTRUCTOR,
                                           "__init__"):
            continue
        fas = [r for r in _subtree_rows(meth["node_idx"], M.CALL)
               if r["name"] in _FIELD_ACCESS_NAMES]
        fas.sort(key=lambda r: (r["line"], r["node_idx"]))
        for name in field_names:
            # same-class pass (firstUsagesOf fieldIdentifier arm):
            # identifier base named this/self or typed as the class
            if same_class:
                for fa in fas:
                    a1 = next((c for c in case.kids[fa["node_idx"]]
                               if c["arg_index"] == 1), None)
                    a2 = next((c for c in case.kids[fa["node_idx"]]
                               if c["arg_index"] == 2), None)
                    if a1 is None or a2 is None \
                            or a2["kind"] != M.FIELD_IDENTIFIER \
                            or a2["canonical_name"] != name:
                        continue
                    if not (a1["kind"] == M.IDENTIFIER
                            and (a1["name"] in ("this", "self")
                                 or a1["type_full_name"] == td_full)):
                        continue
                    if not _not_lhs_of_assignment(case, fa["node_idx"]):
                        break  # takeWhile stops at the first written usage
                    out.append(fa["node_idx"])
            # all-methods pass (usageInOtherClasses): identifier OR
            # TYPE_REF base typed as the class; first hit only
            for fa in fas:
                a1 = next((c for c in case.kids[fa["node_idx"]]
                           if c["arg_index"] == 1), None)
                a2 = next((c for c in case.kids[fa["node_idx"]]
                           if c["arg_index"] == 2), None)
                if a1 is None or a2 is None \
                        or a2["kind"] != M.FIELD_IDENTIFIER \
                        or a2["canonical_name"] != name:
                    continue
                if a1["kind"] not in (M.IDENTIFIER, M.TYPE_REF) \
                        or a1["type_full_name"] != td_full:
                    continue
                if not _not_lhs_of_assignment(case, fa["node_idx"]):
                    break
                out.append(fa["node_idx"])
                break  # headOption
    return out


def _first_usage_for_name(case: _Case, meth: dict, name: str) -> int | None:
    """BaseSourceToStartingPoints.firstUsagesForName: the FIRST non-written
    usage of `name` in `meth` — identifier reads by name plus fieldAccess
    reads whose base code is `this`/`self`/the method's class simple name;
    both streams takeWhile not-LHS, combined sorted, headOption."""
    td_simple = (meth.get("ast_parent_full_name") or "").split(".")[-1]
    sub: list[dict] = []
    stack = list(case.kids[meth["node_idx"]])
    while stack:
        n = stack.pop()
        sub.append(n)
        stack.extend(case.kids[n["node_idx"]])
    sub.sort(key=lambda r: (r["line"], r["node_idx"]))
    cands: list[dict] = []
    for r in sub:  # identifier usages, takeWhile not-LHS
        if r["kind"] == M.IDENTIFIER and r["name"] == name:
            if not _not_lhs_of_assignment(case, r["node_idx"]):
                break
            cands.append(r)
    for r in sub:  # fieldAccess usages with this/self/class-name base
        if r["kind"] != M.CALL or r["name"] not in _FIELD_ACCESS_NAMES:
            continue
        a1 = next((c for c in case.kids[r["node_idx"]]
                   if c["arg_index"] == 1), None)
        a2 = next((c for c in case.kids[r["node_idx"]]
                   if c["arg_index"] == 2), None)
        if a1 is None or a2 is None \
                or a2["kind"] != M.FIELD_IDENTIFIER \
                or a2["canonical_name"] != name:
            continue
        if a1["code"] not in ("this", "self", td_simple):
            continue
        if not _not_lhs_of_assignment(case, r["node_idx"]):
            break
        cands.append(r)
    if not cands:
        return None
    return min(cands, key=lambda r: (r["line"], r["node_idx"]))["node_idx"]


def _member_usages(case: _Case, member: dict) -> list[int]:
    """SourcesToStartingPoints Member arm: `cpg.member` sources expand to
    the first non-written usage per non-constructor method of the member's
    class (BaseSourceToStartingPoints.usages + firstUsagesForName)."""
    td_full = member["ast_parent_full_name"]
    out: list[int] = []
    for meth in case.methods:
        if meth.get("ast_parent_full_name") != td_full:
            continue
        if meth["name"] in (M.STATIC_INIT, M.CONSTRUCTOR, "__init__"):
            continue
        u = _first_usage_for_name(case, meth, member["name"])
        if u is not None:
            out.append(u)
    return out


def _captured_usages(case: _Case, ident: dict) -> list[int]:
    """SourcesToStartingPoints Identifier arm, capturedReferences:
    `x.refsTo.capturedByMethodRef.referencedMethod.flatMap(
    firstUsagesForName(x.name, _))` — an identifier source whose declaration
    is captured by a closure expands to the first usage of the name in each
    capturing method (javasrc LambdaTests `myValue` into the lambda body).
    Capture is derived as: another method contains an identifier REF-ing
    the same declaration (the `captures` relation)."""
    d_idx = ident.get("ref_idx", -1)
    if d_idx is None or d_idx < 0:
        return []
    d = case.by_idx.get(d_idx)
    if d is None:
        return []
    capturing = {r["method_idx"] for r in case.rows
                 if r["kind"] == M.IDENTIFIER and r.get("ref_idx") == d_idx
                 and r["method_idx"] != d["method_idx"]
                 and r["method_idx"] >= 0}
    out: list[int] = []
    for midx in sorted(capturing):
        meth = case.by_idx.get(midx)
        if meth is None:
            continue
        u = _first_usage_for_name(case, meth, ident["name"])
        if u is not None:
            out.append(u)
    return out


def _starting_points(case: _Case, sources: list[int]) -> dict[int, int]:
    """SourcesToStartingPoints (SourcesToStartingPoints.scala:193-221):
    -> {starting node -> original source node}. A METHOD_RETURN source is
    replaced by the call sites of its method (the displayed path then gets
    the METHOD_RETURN prepended); a LITERAL initializing a member expands
    to that member's first usage per method; a MEMBER source is replaced
    by its first usage per method of its class; other CfgNodes start at
    themselves."""
    out: dict[int, int] = {}
    for s in sources:
        r = case.by_idx[s]
        if r["kind"] == M.METHOD_RETURN:
            m = case.by_idx.get(r["method_idx"])
            mname = m["name"] if m is not None else None
            for site in case.rows:
                if site["kind"] == M.CALL and site["name"] == mname:
                    out.setdefault(site["node_idx"], s)
        elif r["kind"] == M.MEMBER:
            for u in _member_usages(case, r):
                out.setdefault(u, s)
        else:
            out[s] = s
            if r["kind"] == M.LITERAL:
                for u in _literal_member_usages(case, r):
                    out.setdefault(u, s)
            elif r["kind"] == M.IDENTIFIER:
                for u in _captured_usages(case, r):
                    out.setdefault(u, s)
    return out


def enumerate_paths(case: _Case, source_spec: dict, sink_spec: dict,
                    max_steps: int = MAX_STEPS,
                    max_call_depth: int = MAX_CALL_DEPTH) -> list[list[int]]:
    """Backward task search re-deriving the reference engine
    (Engine.scala/TaskCreator.scala): REACHING_DEF steps filtered by
    EdgeValidator; at parameters, expansion to matching call-site arguments
    (realizable only — a call-site stack records entered callees); at call
    sites of internal non-stub methods, expansion into the callee's RETURN
    statements with the METHOD_RETURN spliced into the displayed path; at
    calls to external/stub methods, continuation from the call's arguments.
    Returns node_idx paths source->sink."""
    rd_back: dict[int, list[tuple[int, bool]]] = defaultdict(list)
    for s, d, _v in _rd_edges(case):
        if _is_valid_edge(case, d, s):
            rd_back[d].append((s, _element_visible(case, s, d)))

    # arg_index 0 is the receiver — it unwinds to an instance method's
    # `this` parameter (param_index 0), e.g. ObjectTests test6/test7
    # b.printS() tainting `this` inside printS
    args_by_method: dict[str, list[tuple[dict, dict]]] = defaultdict(list)
    for site in case.rows:
        if site["kind"] == M.CALL:
            for a in case.kids[site["node_idx"]]:
                if a["arg_index"] >= 0:
                    args_by_method[site["name"]].append((site, a))

    sources = set(select_nodes(case, source_spec))
    starts = _starting_points(case, sources)
    sinks = select_nodes(case, sink_spec)

    # One result per (source, sink) pair: Engine.deduplicateFinal
    # (Engine.scala:155-178) groups by (path.head, path.last) and keeps the
    # LONGEST path, tie-broken by smallest element-id string (≈ document
    # order). That's why DataFlowTest2's golden goes through `return x;`
    # rather than the direct param->RET reaching-def edge.
    # path = tuple of (node_idx, visible) pairs, source-first
    best: dict[tuple[int, int], tuple] = {}
    frontier: list[tuple] = [(s, ((s, True),), 0, ()) for s in sinks]

    def nodes_of(path):
        return tuple(n for n, _v in path)

    for _ in range(max_steps + 1):
        if not frontier:
            break
        for cur, path, _d, _st in frontier:
            if cur in starts:
                key = (cur, path[-1][0])
                old = best.get(key)
                if old is None or len(path) > len(old) or \
                        (len(path) == len(old) and nodes_of(path) < nodes_of(old)):
                    best[key] = path
        nxt: list[tuple] = []
        for cur, path, cdepth, stack in frontier:
            r = case.by_idx[cur]
            pnodes = nodes_of(path)
            steps: list[tuple] = []
            # TaskSolver cases 3/4 (TaskSolver.scala:168-183): at a call to
            # an internal method without semantics — or at an argument of
            # one — intra-procedural traversal STOPS (the flow must go
            # through the callee), unless we just came out of that callee
            # (via its METHOD_RETURN or a parameter).
            def _int_no_sem(call_row):
                return _sem_for_call(case, call_row) is None and any(
                    not m.get("is_external", False)
                    for m in _callees(case, call_row))

            def _came_from_callee(call_row):
                if len(path) < 2:
                    return False
                p1 = case.by_idx[path[1][0]]
                if p1["kind"] not in (M.METHOD_RETURN, M.METHOD_PARAMETER_IN):
                    return False
                return any(m["node_idx"] == p1["method_idx"]
                           for m in _callees(case, call_row))

            # Constructor calls behave like the reference's lowered form
            # (receiver arg + this-paramOut unwind): the constructed value
            # is tainted by every constructor argument, and traversal is
            # never forced through the (RETURN-less) <init> body — javasrc
            # ObjectTests "find a path through the constructor and field".
            is_ctor = r["kind"] == M.CALL and r["name"] == M.CONSTRUCTOR
            blocked = False
            if r["kind"] == M.CALL and not r["name"].startswith("<operator>") \
                    and not is_ctor \
                    and _int_no_sem(r) and not _came_from_callee(r):
                blocked = True  # case 3
            enc = case.in_call(cur)
            if not blocked and len(path) > 1 and enc is not None \
                    and enc["name"] != M.CONSTRUCTOR \
                    and not enc["name"].startswith("<operator>") \
                    and _int_no_sem(enc) and not _came_from_callee(enc):
                # case 4: output-arg partial. When the callee has a body,
                # TaskCreator resumes from its METHOD_PARAMETER_OUT; the
                # unconditional paramIn->paramOut edge ("modifications of
                # the input parameter only affect a copy",
                # DdgGenerator.addEdgesToMethodParameterOut) then unwinds
                # back to this same argument — net effect: the backward
                # traversal continues from `cur` (DataFlowTests64's by-value
                # double free). Body-less callees have no CFG, so their
                # paramOut has no incoming edges and the partial dies.
                blocked = not any(
                    case.has_body(m["node_idx"])
                    for m in _callees(case, enc))
            if not blocked:
                for prev, vis in rd_back.get(cur, ()):
                    steps.append((prev, ((prev, vis),) + path, cdepth, stack))
            if r["kind"] == M.METHOD_PARAMETER_IN:
                if stack:  # must return to the call site we entered from
                    site_idx, rest = stack[-1], stack[:-1]
                    for a in case.kids[site_idx]:
                        if a["arg_index"] == r["param_index"]:
                            steps.append((a["node_idx"],
                                          ((a["node_idx"], True),) + path,
                                          cdepth - 1, rest))
                else:
                    m = case.by_idx.get(r["method_idx"])
                    for _site, a in args_by_method.get(
                            m["name"] if m else None, ()):
                        if a["arg_index"] == r["param_index"]:
                            steps.append((a["node_idx"],
                                          ((a["node_idx"], True),) + path,
                                          cdepth + 1, stack))
                    # paramToMethodRefCallReceivers (TaskCreator.scala:89-97):
                    # a parameter of a method passed as a METHOD_REF expands
                    # to argument(0) of the calls taking that ref — `foo` in
                    # foo.bar((x,y) => ...) taints the closure's params
                    if m is not None:
                        for mr in case.rows:
                            if mr["kind"] != M.METHOD_REF or \
                                    mr.get("method_full_name") != m["full_name"]:
                                continue
                            site = case.in_call(mr["node_idx"])
                            if site is None:
                                continue
                            for a in case.kids[site["node_idx"]]:
                                if a["arg_index"] == 0:
                                    steps.append((a["node_idx"],
                                                  ((a["node_idx"], True),) + path,
                                                  cdepth + 1, stack))
            if is_ctor:
                for a in case.kids[cur]:  # ctor args taint the new object
                    if a["arg_index"] >= 1:
                        steps.append((a["node_idx"],
                                      ((a["node_idx"], True),) + path,
                                      cdepth, stack))
            if r["kind"] == M.METHOD_REF:
                # TaskCreator forMethodRefs (TaskCreator.scala:156-171): a
                # method ref expands into the referenced method's RETURN
                # statements with its METHOD_RETURN spliced into the path
                # (lambda passed to map/forEach, javasrc LambdaTests)
                for m in case.methods:
                    if m["full_name"] != r.get("method_full_name"):
                        continue
                    mr = case.method_return_of(m["node_idx"])
                    if mr is None:
                        continue
                    mrp = ((mr["node_idx"], True),) + path \
                        if mr["node_idx"] not in pnodes else path
                    for ret in case.rows:
                        if ret["kind"] == M.RETURN and \
                                ret["method_idx"] == m["node_idx"]:
                            steps.append((ret["node_idx"],
                                          ((ret["node_idx"], True),) + mrp,
                                          cdepth + 1, stack))
            if r["kind"] == M.CALL and not r["name"].startswith("<operator>") \
                    and not is_ctor:
                for m in _callees(case, r):
                    if case.has_body(m["node_idx"]):
                        mr = case.method_return_of(m["node_idx"])
                        if mr is None or cur in stack:
                            continue
                        mrp = ((mr["node_idx"], True),) + path \
                            if mr["node_idx"] not in pnodes else path
                        for ret in case.rows:
                            if ret["kind"] == M.RETURN and \
                                    ret["method_idx"] == m["node_idx"]:
                                steps.append((ret["node_idx"],
                                              ((ret["node_idx"], True),) + mrp,
                                              cdepth + 1, stack + (cur,)))
                    else:  # external/stub: taint flows from the arguments
                        for a in case.kids[cur]:
                            if a["arg_index"] >= 1:
                                steps.append((a["node_idx"],
                                              ((a["node_idx"], True),) + path,
                                              cdepth, stack))
            for prev, npath, nd, nstack in steps:
                if prev in pnodes or nd > max_call_depth:
                    continue
                nxt.append((prev, npath, nd, nstack))
        # dedup identical frontier entries
        frontier = list({(c, tuple(p), st): (c, p, d, st)
                         for c, p, d, st in nxt}.values())

    # Assemble displayed paths: prepend the original source where the
    # starting point replaced it (reachableByInternal), drop invisible
    # elements unless they are starting points (reachableByFlows:54), and
    # collapse consecutive duplicate nodes.
    out: list[list[int]] = []
    for (start_node, _sink), path in best.items():
        src = starts[start_node]
        full = path if src == start_node else ((src, True),) + path
        shown = [n for n, v in full if v or n in starts]
        coll = [n for i, n in enumerate(shown)
                if i == 0 or shown[i - 1] != n]
        out.append(coll)
    return out


def case_flow_facts(rows: list[dict], flow_specs: list[dict],
                    semantics: list | None = None) -> list[tuple[str, str]]:
    """-> (subj, obj) facts for one case: subj = flow name; obj = serialized
    path (exact-set assertions) or 'count=N' (size-only assertions)."""
    case = _Case(rows, semantics)
    out: list[tuple[str, str]] = []
    for f in flow_specs:
        paths = enumerate_paths(case, f["source"], f["sink"],
                                max_call_depth=f.get("max_call_depth",
                                                     MAX_CALL_DEPTH))
        if "min_elements" in f:  # path.elements.sizeIs > N-1 filters
            paths = [p for p in paths if len(p) >= f["min_elements"]]
        serialized = sorted({serialize(result_pairs(case, p)) for p in paths})
        if "reachable" in f:
            # sink.reachableBy(source).size — distinct SOURCE nodes reached
            # (JavaDataflowFixture.getConstSourceSink assertions)
            out.append((f["name"],
                        f"reachable={len({p[0] for p in paths})}"))
        elif "reachable_pairs" in f:
            # reachableBy over a multi-node sink set counts the source once
            # per sink it reaches (javasrc ArrayTests "This is 2 due to how
            # the sink is constructed")
            out.append((f["name"],
                        f"pairs={len({(p[0], p[-1]) for p in paths})}"))
        elif "count" in f:  # size-only assertion in the reference test
            out.append((f["name"], f"count={len(serialized)}"))
        elif "result_count" in f:
            # `.size` over the deduplicated result set — counts one per
            # (source, sink) result, not per distinct serialization
            out.append((f["name"], f"results={len(paths)}"))
        elif "nonempty" in f:  # `.isEmpty shouldBe false` assertions
            out.append((f["name"],
                        f"nonempty={str(bool(paths)).lower()}"))
        else:
            for s in serialized:
                out.append((f["name"], s))
            if not serialized:
                out.append((f["name"], ""))  # empty-set marker
    return out
