"""Pure-Python succOf oracle over the frontend + CFG kernel (no Spark).

Mirrors the reference CfgTestFixture (x2cpg/.../CfgTestFixture.scala:45-57):
``succOf(code)`` returns the set of successor code strings of the index-th
CFG node whose code (or METHOD name) equals ``code``.
"""

from __future__ import annotations

from joern_spark import model as M
from joern_spark.frontends.astnode import flatten_file
from joern_spark.frontends.clike import parse_c_file
from joern_spark.operators.controlflow import cfg_for_method, MethodAst


def build_cfg(content: str, lang: str = "c", wrap: bool = True):
    """Wrap body like the reference harness: `RET func() { <body> }`."""
    src = f"RET func() {{ {content} }}" if wrap else content
    roots = parse_c_file("t", "t.c", "f" * 40, lang, src)
    rows = flatten_file("t", "t.c", "f" * 40, lang, src, roots)
    methods = [r for r in rows if r["kind"] == M.METHOD]
    edges = []
    for m in methods:
        mrows = [r for r in rows if r["method_idx"] == m["node_idx"] or r["node_idx"] == m["node_idx"]]
        edges += cfg_for_method(mrows, m)
    return rows, edges


class SuccOracle:
    def __init__(self, content: str, lang: str = "c", wrap: bool = True):
        self.rows, self.edges = build_cfg(content, lang, wrap)
        self.by_idx = {r["node_idx"]: r for r in self.rows}
        self.out: dict[int, list[int]] = {}
        for s, d, _ in self.edges:
            self.out.setdefault(s, []).append(d)
        # CFG-node ordering: preorder (node_idx) ≈ reference AST traversal order
        self.cfg_nodes = [r for r in sorted(self.rows, key=lambda r: r["node_idx"])
                          if self._in_cfg(r)]

    def _in_cfg(self, r) -> bool:
        return r["kind"] not in (M.LOCAL, M.MODIFIER, M.TYPE_DECL, M.MEMBER,
                                 M.JUMP_LABEL, M.METHOD_PARAMETER_IN,
                                 M.METHOD_PARAMETER_OUT, M.NAMESPACE_BLOCK,
                                 M.FILE, M.META_DATA, M.TYPE, M.NAMESPACE)

    def _match(self, r, code: str) -> bool:
        if r["kind"] == M.METHOD:
            return r["name"] == code
        return (r["code"] or "").strip() == code

    def node(self, code: str, index: int = 0):
        hits = [r for r in self.cfg_nodes if self._match(r, code)]
        if index >= len(hits):
            raise AssertionError(f"no node with code {code!r} index {index}; "
                                 f"codes={[r['code'] for r in self.cfg_nodes]}")
        return hits[index]

    def succ(self, code: str, index: int = 0) -> set[str]:
        n = self.node(code, index)
        out = set()
        for d in self.out.get(n["node_idx"], []):
            r = self.by_idx[d]
            out.add(r["code"] if r["kind"] != M.METHOD else r["name"])
        return out


def check(content: str, expectations: dict, lang: str = "c", wrap: bool = True):
    """expectations: {code or (code, index): set-of-successor-codes}"""
    o = SuccOracle(content, lang, wrap)
    errs = []
    for key, want in expectations.items():
        code, idx = key if isinstance(key, tuple) else (key, 0)
        try:
            got = o.succ(code, idx)
        except AssertionError as e:
            errs.append(str(e))
            continue
        if got != set(want):
            errs.append(f"succOf({code!r},{idx}) = {sorted(got)}, want {sorted(want)}")
    if errs:
        raise AssertionError(f"body={content!r}:\n  " + "\n  ".join(errs))
    return o
