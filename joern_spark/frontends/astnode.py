"""In-memory AST node used by the pure-Python frontends.

Frontends build a tree of ``N`` objects per file; ``flatten_file`` assigns
preorder ``node_idx`` values and emits one raw-row dict per node
(schema: joern_spark.model.RAW_NODE_SCHEMA). All cross-node references stay
file-local indices — global 64-bit ids are derived later JVM-side with
xxhash64, which keeps the parser output deterministic and shuffle-free.

Mirrors the reference's ``Ast`` value (x2cpg/.../Ast.scala:85-121): a root
plus child sub-trees plus typed shortcut edges; here the typed edges are the
``role`` attribute on the child instead of separate edge buffers.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional

from joern_spark import model as M


class N:
    __slots__ = (
        "kind", "name", "full_name", "signature", "code", "arg_index", "role",
        "dispatch_type", "type_full_name", "method_full_name",
        "control_structure_type", "jump_label", "canonical_name",
        "ast_parent_type", "ast_parent_full_name", "inherits_from",
        "alias_type_full_name", "evaluation_strategy", "param_index",
        "is_variadic", "is_external", "line", "line_end", "children",
        "ref_target", "idx", "has_body", "generic_signature",
    )

    def __init__(self, kind: str, code: str = "", name: str = "", line: int = 0, **kw):
        # hot path (one call per AST node): plain default assignments +
        # a setattr loop over the (typically 0-3) explicit kwargs beat 18
        # unconditional kw.get lookups by ~40%
        self.kind = kind
        self.code = code
        self.name = name
        self.line = line
        self.line_end = -1
        self.full_name = ""
        self.signature = ""
        self.arg_index = -1
        self.role = ""
        self.dispatch_type = ""
        self.type_full_name = M.ANY
        self.method_full_name = ""
        self.control_structure_type = ""
        self.jump_label = ""
        self.canonical_name = ""
        self.ast_parent_type = ""
        self.ast_parent_full_name = ""
        self.inherits_from = None
        self.alias_type_full_name = ""
        self.evaluation_strategy = ""
        self.param_index = -1
        self.is_variadic = False
        self.is_external = False
        self.has_body = False
        self.generic_signature = ""
        self.children: list[N] = []
        self.ref_target: Optional[N] = None  # parse-time REF (ident -> LOCAL/PARAM)
        self.idx = -1
        if kw:
            for k, v in kw.items():
                setattr(self, k, v)

    def add(self, *children: Optional["N"]) -> "N":
        for c in children:
            if c is not None:
                self.children.append(c)
        return self

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"N({self.kind},{self.code!r},children={len(self.children)})"


def sha256_hex(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8", "replace")).hexdigest()


def flatten_file(
    repo: str, path: str, commit: str, lang: str, content: str, roots: Iterable[N],
    sha: str | None = None,
) -> list[dict]:
    """Preorder-flatten a file's AST roots into raw-row dicts."""
    sha = sha if sha is not None else sha256_hex(content)
    rows: list[dict] = []
    counter = [0]

    def assign(node: N):
        node.idx = counter[0]
        counter[0] += 1
        for c in node.children:
            assign(c)

    for r in roots:
        assign(r)

    def emit(node: N, parent_idx: int, method_idx: int, order: int):
        m_idx = node.idx if node.kind == M.METHOD else method_idx
        nargs = -1
        if node.kind == M.CALL:
            nargs = max((c.arg_index for c in node.children if c.arg_index >= 1),
                        default=0)
        rows.append(
            M.raw_node(
                nargs=nargs,
                repo=repo, path=path, commit=commit, lang=lang, sha256=sha,
                node_idx=node.idx, parent_idx=parent_idx,
                method_idx=method_idx if node.kind != M.METHOD else method_idx,
                ref_idx=node.ref_target.idx if node.ref_target is not None else -1,
                kind=node.kind, name=node.name, full_name=node.full_name,
                signature=node.signature, code=node.code, order=order,
                arg_index=node.arg_index, role=node.role,
                dispatch_type=node.dispatch_type,
                type_full_name=node.type_full_name,
                method_full_name=node.method_full_name,
                control_structure_type=node.control_structure_type,
                jump_label=node.jump_label, canonical_name=node.canonical_name,
                ast_parent_type=node.ast_parent_type,
                ast_parent_full_name=node.ast_parent_full_name,
                inherits_from=node.inherits_from,
                alias_type_full_name=node.alias_type_full_name,
                evaluation_strategy=node.evaluation_strategy,
                param_index=node.param_index, is_variadic=node.is_variadic,
                is_external=node.is_external, line=node.line,
                line_end=node.line_end,
                generic_signature=node.generic_signature,
            )
        )
        for i, c in enumerate(node.children, start=1):
            emit(c, node.idx, m_idx, i)

    for r in roots:
        emit(r, -1, -1, 1)
    return rows


def parse_error_row(repo: str, path: str, commit: str, lang: str, content: str, err: str) -> dict:
    return M.raw_node(
        repo=repo, path=path, commit=commit, lang=lang,
        sha256=sha256_hex(content), node_idx=0, kind=M.UNKNOWN,
        code="", parse_error=err[:500],
    )
