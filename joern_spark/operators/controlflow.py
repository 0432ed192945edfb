"""Per-method control-flow passes: CFG, dominator trees, CDG.

Semantics re-derived from the reference (NOT ported code):

* CFG: structural recursion with fringe/jump resolution —
  x2cpg/.../controlflow/cfgcreation/CfgCreator.scala:43-753 and the Cfg
  algebra x2cpg/.../cfgcreation/Cfg.scala:34-196.
* Dominators: iterative Cooper–Harvey–Kennedy —
  x2cpg/.../controlflow/cfgdominator/CfgDominator.scala:7-89, applied by
  CfgDominatorPass.scala:13-48 (DOMINATE) and its reverse (POST_DOMINATE).
* CDG: reverse dominance frontier over the post-dominator tree —
  x2cpg/.../controlflow/codepencegraph/CdgPass.scala:23-63 with frontier
  computation CfgDominatorFrontier.scala:11-37.

All functions are pure Python over a method's node rows, so the same kernel
runs either fused inside the parse ``mapInPandas`` stage (no shuffle — the
parser already holds the whole file) or as a standalone
``groupBy(method).applyInPandas`` stage. The per-method axis is exactly the
reference's ForkJoin parts axis (CfgCreationPass.scala:19).
"""

from __future__ import annotations

from joern_spark import model as M

ALWAYS = "AlwaysEdge"
TRUE = "TrueEdge"
FALSE = "FalseEdge"
CASE = "CaseEdge"


class MethodAst:
    """Indexed view over one method's raw node rows (dicts)."""

    def __init__(self, rows: list[dict]):
        self.by_idx = {r["node_idx"]: r for r in rows}
        kids: dict[int, list[dict]] = {}
        for r in rows:
            kids.setdefault(r["parent_idx"], []).append(r)
        for v in kids.values():
            v.sort(key=lambda r: r["order"])
        self.kids = kids

    def children(self, idx: int) -> list[dict]:
        return self.kids.get(idx, [])

    def child_with_role(self, idx: int, role: str) -> dict | None:
        for c in self.children(idx):
            if c["role"] == role:
                return c
        return None

    def children_with_role(self, idx: int, role: str) -> list[dict]:
        return [c for c in self.children(idx) if c["role"] == role]

    def arg(self, idx: int, i: int) -> dict | None:
        for c in self.children(idx):
            if c["arg_index"] == i:
                return c
        return None

    def parent(self, r: dict) -> dict | None:
        return self.by_idx.get(r["parent_idx"])


class Cfg:
    __slots__ = ("entry", "edges", "fringe", "labeled", "breaks", "continues",
                 "case_labels", "jumps")

    def __init__(self, entry=None, edges=None, fringe=None, labeled=None,
                 breaks=None, continues=None, case_labels=None, jumps=None):
        self.entry = entry
        self.edges = edges or []
        self.fringe = fringe or []
        self.labeled = labeled or {}
        self.breaks = breaks or []
        self.continues = continues or []
        self.case_labels = case_labels or []
        self.jumps = jumps or []

    def is_empty(self) -> bool:
        return (self.entry is None and not self.edges and not self.fringe
                and not self.labeled and not self.breaks and not self.continues
                and not self.case_labels and not self.jumps)


def _fringe_edges(fringe, entry):
    if entry is None:
        return []
    return [(src, entry, kind) for src, kind in fringe]


def seq(a: Cfg, b: Cfg) -> Cfg:
    """a ++ b (Cfg.scala:51-69)."""
    if b.is_empty():
        return a
    if a.is_empty():
        return b
    return Cfg(
        entry=a.entry,
        edges=a.edges + b.edges + _fringe_edges(a.fringe, b.entry),
        fringe=b.fringe,
        labeled={**a.labeled, **b.labeled},
        breaks=a.breaks + b.breaks,
        continues=a.continues + b.continues,
        case_labels=a.case_labels + b.case_labels,
        jumps=a.jumps + b.jumps,
    )


def seq_all(cfgs) -> Cfg:
    acc = Cfg()
    for c in cfgs:
        acc = seq(acc, c)
    return acc


def from_cfgs(*cfgs) -> Cfg:
    out = Cfg()
    for c in cfgs:
        out.labeled.update(c.labeled)
        out.breaks += c.breaks
        out.continues += c.continues
        out.case_labels += c.case_labels
        out.jumps += c.jumps
    return out


def _retype(fringe, kind):
    return [(n, kind) for n, _ in fringe]


def _take_level(pairs):
    return [n for n, lvl in pairs if lvl == 1]


def _reduce_level(pairs):
    return [(n, lvl - 1) for n, lvl in pairs if lvl != 1]


LOGICAL_NAMES = (M.OP_LOGICAL_AND, M.OP_LOGICAL_OR, M.OP_CONDITIONAL)


class CfgBuilder:
    def __init__(self, ast: MethodAst, method_row: dict):
        self.ast = ast
        self.m = method_row
        self.exit_idx = None
        for c in ast.children(method_row["node_idx"]):
            if c["kind"] == M.METHOD_RETURN:
                self.exit_idx = c["node_idx"]

    # -- helpers ------------------------------------------------------------
    def single(self, r: dict) -> Cfg:
        i = r["node_idx"]
        return Cfg(entry=i, fringe=[(i, ALWAYS)])

    def for_children(self, r: dict) -> Cfg:
        return seq_all(self.cfg_for(c) for c in self.ast.children(r["node_idx"]))

    def cfg_for_inlined_call(self, r: dict) -> Cfg | None:
        """Macro-expansion calls: args -> call, then the call BRANCHES into
        the expansion block and past it; the expansion fringe rejoins the
        fallthrough (CfgCreationPassTests.scala:225-247 —
        succOf("deleteReset(foo)") is BOTH the expansion start and the next
        statement). Returns None when there is no expansion child."""
        exp = next((c for c in self.ast.children(r["node_idx"])
                    if c["arg_index"] < 0 and c["kind"] == M.BLOCK), None)
        if exp is None:
            return None
        args = [c for c in self.ast.children(r["node_idx"]) if c is not exp]
        head = seq(seq_all(self.cfg_for(a) for a in args), self.single(r))
        exp_cfg = self.cfg_for(exp)
        if exp_cfg.is_empty() or exp_cfg.entry is None:
            return head
        return Cfg(
            entry=head.entry,
            edges=(head.edges + exp_cfg.edges
                   + _fringe_edges(head.fringe, exp_cfg.entry)),
            fringe=head.fringe + exp_cfg.fringe,
            labeled={**head.labeled, **exp_cfg.labeled},
            breaks=head.breaks + exp_cfg.breaks,
            continues=head.continues + exp_cfg.continues,
            case_labels=head.case_labels + exp_cfg.case_labels,
            jumps=head.jumps + exp_cfg.jumps,
        )

    def _block_matches(self, r: dict) -> bool:
        p = self.ast.parent(r)
        if p is None:
            return False
        if p["kind"] in (M.METHOD, M.CONTROL_STRUCTURE):
            return True
        if p["kind"] == M.CALL and (p["name"] in LOGICAL_NAMES or p["dispatch_type"] == M.INLINED):
            return True
        return False

    def _within_try(self, r: dict) -> bool:
        p = self.ast.parent(r)
        if p is None or p["kind"] != M.BLOCK:
            return False
        pp = self.ast.parent(p)
        return pp is not None and pp["kind"] == M.CONTROL_STRUCTURE and \
            pp["control_structure_type"] == M.CS_TRY

    # -- dispatch (CfgCreator.cfgFor, :99-128) --------------------------------
    def cfg_for(self, r: dict) -> Cfg:
        k = r["kind"]
        if k in (M.METHOD, M.METHOD_PARAMETER_IN, M.METHOD_PARAMETER_OUT,
                 M.MODIFIER, M.LOCAL, M.TYPE_DECL, M.MEMBER):
            return Cfg()
        if k in (M.METHOD_REF, M.TYPE_REF, M.METHOD_RETURN):
            return self.single(r)
        if k == M.CONTROL_STRUCTURE:
            return self.cfg_for_control(r)
        if k == M.JUMP_TARGET:
            return self.cfg_for_jump_target(r)
        if k == M.RETURN:
            return self.cfg_for_return(r, inherit=self._within_try(r))
        if k == M.CALL:
            if r["name"] == M.OP_LOGICAL_AND:
                return self.cfg_for_and(r)
            if r["name"] == M.OP_LOGICAL_OR:
                return self.cfg_for_or(r)
            if r["name"] == M.OP_CONDITIONAL:
                return self.cfg_for_conditional(r)
            if r["dispatch_type"] == M.INLINED:
                inl = self.cfg_for_inlined_call(r)
                if inl is not None:
                    return inl
            return seq(self.for_children(r), self.single(r))
        if k == M.BLOCK:
            if self._block_matches(r):
                return self.for_children(r)
            return seq(self.for_children(r), self.single(r))
        if k in (M.FIELD_IDENTIFIER, M.IDENTIFIER, M.LITERAL, M.UNKNOWN):
            return seq(self.for_children(r), self.single(r))
        return self.for_children(r)

    def cfg_for_control(self, r: dict) -> Cfg:
        t = r["control_structure_type"]
        if t == M.CS_BREAK:
            return self.cfg_for_break(r)
        if t == M.CS_CONTINUE:
            return self.cfg_for_continue(r)
        if t == M.CS_WHILE:
            return self.cfg_for_while(r)
        if t == M.CS_DO:
            return self.cfg_for_do(r)
        if t == M.CS_FOR:
            return self.cfg_for_for(r)
        if t == M.CS_GOTO:
            return self.cfg_for_goto(r)
        if t == M.CS_IF:
            return self.cfg_for_if(r)
        if t in (M.CS_ELSE, M.CS_CATCH, M.CS_FINALLY):
            return self.for_children(r)
        if t == M.CS_SWITCH:
            return self.cfg_for_switch(r)
        if t == M.CS_TRY:
            return self.cfg_for_try(r)
        if t == M.CS_THROW:
            return self.cfg_for_throw(r)
        return Cfg()

    # -- jumps ---------------------------------------------------------------
    def cfg_for_break(self, r: dict) -> Cfg:
        if r["jump_label"]:
            return Cfg(entry=r["node_idx"], jumps=[(r["node_idx"], r["jump_label"])])
        return Cfg(entry=r["node_idx"], breaks=[(r["node_idx"], 1)])

    def cfg_for_continue(self, r: dict) -> Cfg:
        if r["jump_label"]:
            return Cfg(entry=r["node_idx"], jumps=[(r["node_idx"], r["jump_label"])])
        return Cfg(entry=r["node_idx"], continues=[(r["node_idx"], 1)])

    def cfg_for_goto(self, r: dict) -> Cfg:
        label = r["jump_label"] or (r["code"].split(" ")[-1].rstrip(";") if r["code"] else "")
        children = self.for_children(r)  # computed-goto expression, if any
        goto_cfg = Cfg(entry=r["node_idx"], jumps=[(r["node_idx"], label)])
        return seq(children, goto_cfg)

    def cfg_for_jump_target(self, r: dict) -> Cfg:
        cfg = self.single(r)
        name = r["name"]
        if name.startswith("case") or name.startswith("default"):
            cfg.case_labels = [r["node_idx"]]
        else:
            cfg.labeled = {name: r["node_idx"]}
        return cfg

    def cfg_for_return(self, r: dict, inherit: bool = False) -> Cfg:
        children = self.for_children(r)
        ret_cfg = Cfg(entry=r["node_idx"],
                      edges=[(r["node_idx"], self.exit_idx, ALWAYS)] if self.exit_idx is not None else [],
                      fringe=list(children.fringe) if inherit else [])
        return seq(children, ret_cfg)

    def cfg_for_throw(self, r: dict) -> Cfg:
        arg = self.ast.arg(r["node_idx"], 1)
        expr_cfg = self.cfg_for(arg) if arg is not None else Cfg()
        cfg = seq(expr_cfg, Cfg(entry=r["node_idx"]))
        if self.exit_idx is not None:
            cfg.edges = cfg.edges + [(r["node_idx"], self.exit_idx, ALWAYS)]
        return cfg

    # -- short-circuit expressions (CfgCreator.scala:329-390) -----------------
    def cfg_for_and(self, r: dict) -> Cfg:
        left = self.cfg_for(self.ast.arg(r["node_idx"], 1))
        right = self.cfg_for(self.ast.arg(r["node_idx"], 2))
        edges = _fringe_edges(_retype(left.fringe, TRUE), right.entry) + left.edges + right.edges
        out = from_cfgs(left, right)
        out.entry = left.entry
        out.edges = edges
        out.fringe = left.fringe + right.fringe
        return seq(out, self.single(r))

    def cfg_for_or(self, r: dict) -> Cfg:
        left = self.cfg_for(self.ast.arg(r["node_idx"], 1))
        right = self.cfg_for(self.ast.arg(r["node_idx"], 2))
        edges = _fringe_edges(_retype(left.fringe, FALSE), right.entry) + left.edges + right.edges
        out = from_cfgs(left, right)
        out.entry = left.entry
        out.edges = edges
        out.fringe = left.fringe + right.fringe
        return seq(out, self.single(r))

    def cfg_for_conditional(self, r: dict) -> Cfg:
        cond = self.cfg_for(self.ast.arg(r["node_idx"], 1))
        t_arg = self.ast.arg(r["node_idx"], 2)
        f_arg = self.ast.arg(r["node_idx"], 3)
        true_cfg = self.cfg_for(t_arg) if t_arg is not None else Cfg()
        false_cfg = self.cfg_for(f_arg) if f_arg is not None else Cfg()
        edges = (_fringe_edges(_retype(cond.fringe, TRUE), true_cfg.entry)
                 + _fringe_edges(_retype(cond.fringe, FALSE), false_cfg.entry))
        true_fringe = true_cfg.fringe if true_cfg.entry is not None else _retype(cond.fringe, TRUE)
        false_fringe = false_cfg.fringe if false_cfg.entry is not None else _retype(cond.fringe, FALSE)
        out = from_cfgs(cond, true_cfg, false_cfg)
        out.entry = cond.entry
        out.edges = cond.edges + true_cfg.edges + false_cfg.edges + edges
        out.fringe = true_fringe + false_fringe
        return seq(out, self.single(r))

    # -- loops (CfgCreator.scala:418-549) -------------------------------------
    def _role_cfg(self, r: dict, role: str) -> Cfg:
        c = self.ast.child_with_role(r["node_idx"], role)
        return self.cfg_for(c) if c is not None else Cfg()

    def cfg_for_while(self, r: dict) -> Cfg:
        cond = self._role_cfg(r, M.ROLE_CONDITION)
        true_cfg = self._role_cfg(r, M.ROLE_WHEN_TRUE)
        false_cfg = self._role_cfg(r, M.ROLE_WHEN_FALSE)
        edges = (_fringe_edges(cond.fringe, true_cfg.entry)
                 + _fringe_edges(true_cfg.fringe, false_cfg.entry)
                 + _fringe_edges(true_cfg.fringe, cond.entry)
                 + [(n, cond.entry, ALWAYS) for n in _take_level(true_cfg.continues) if cond.entry is not None])
        out = from_cfgs(cond, true_cfg, false_cfg)
        out.entry = cond.entry
        out.edges = edges + cond.edges + true_cfg.edges + false_cfg.edges
        out.fringe = (_retype(cond.fringe, FALSE)
                      + [(n, ALWAYS) for n in _take_level(true_cfg.breaks)]
                      + false_cfg.fringe)
        out.breaks = _reduce_level(true_cfg.breaks)
        out.continues = _reduce_level(true_cfg.continues)
        return out

    def cfg_for_do(self, r: dict) -> Cfg:
        body = self._role_cfg(r, M.ROLE_DO_BODY)
        cond = self._role_cfg(r, M.ROLE_CONDITION)
        inner = seq(body, cond)
        edges = ([(n, cond.entry, ALWAYS) for n in _take_level(body.continues) if cond.entry is not None]
                 + _fringe_edges(body.fringe, cond.entry)
                 + _fringe_edges(_retype(cond.fringe, TRUE), inner.entry))
        out = from_cfgs(body, cond)
        out.entry = body.entry if not body.is_empty() else cond.entry
        out.edges = edges + body.edges + cond.edges
        out.fringe = (_retype(cond.fringe, FALSE)
                      + [(n, ALWAYS) for n in _take_level(body.breaks)])
        out.breaks = _reduce_level(body.breaks)
        out.continues = _reduce_level(body.continues)
        return out

    def cfg_for_for(self, r: dict) -> Cfg:
        init = self._role_cfg(r, M.ROLE_FOR_INIT)
        cond = self._role_cfg(r, M.ROLE_CONDITION)
        upd = self._role_cfg(r, M.ROLE_FOR_UPDATE)
        body = self._role_cfg(r, M.ROLE_FOR_BODY)

        inner = seq(body, upd)
        loop_entry = cond.entry if cond.entry is not None else inner.entry
        entry = init.entry if init.entry is not None else loop_entry

        cont_target = upd.entry if upd.entry is not None else loop_entry
        edges = (_fringe_edges(init.fringe, loop_entry)
                 + _fringe_edges(inner.fringe, loop_entry)
                 + _fringe_edges(_retype(cond.fringe, TRUE),
                                 inner.entry if inner.entry is not None else cond.entry)
                 + [(n, cont_target, ALWAYS) for n in _take_level(body.continues) if cont_target is not None])
        out = from_cfgs(init, cond, upd, body)
        out.entry = entry
        out.edges = edges + init.edges + cond.edges + inner.edges
        out.fringe = (_retype(cond.fringe, FALSE)
                      + [(n, ALWAYS) for n in _take_level(body.breaks)])
        out.breaks = _reduce_level(body.breaks)
        out.continues = _reduce_level(body.continues)
        return out

    # -- if / switch / try (CfgCreator.scala:552-700) --------------------------
    def cfg_for_if(self, r: dict) -> Cfg:
        cond = self._role_cfg(r, M.ROLE_CONDITION)
        true_cfg = self._role_cfg(r, M.ROLE_WHEN_TRUE)
        false_cfg = self._role_cfg(r, M.ROLE_WHEN_FALSE)
        edges = (_fringe_edges(cond.fringe, true_cfg.entry)
                 + _fringe_edges(cond.fringe, false_cfg.entry))
        if true_cfg.entry is None and false_cfg.entry is None:
            fringe = _retype(cond.fringe, ALWAYS)
        else:
            tf = true_cfg.fringe if true_cfg.entry is not None else _retype(cond.fringe, TRUE)
            ff = false_cfg.fringe if false_cfg.entry is not None else _retype(cond.fringe, FALSE)
            fringe = tf + ff
        out = from_cfgs(cond, true_cfg, false_cfg)
        out.entry = cond.entry
        out.edges = edges + cond.edges + true_cfg.edges + false_cfg.edges
        out.fringe = fringe
        return out

    def cfg_for_switch(self, r: dict) -> Cfg:
        cond = self._role_cfg(r, M.ROLE_CONDITION)
        body = self._role_cfg(r, M.ROLE_WHEN_TRUE)
        return self._switch_like(cond, [body])

    def _switch_like(self, cond: Cfg, body_cfgs: list[Cfg]) -> Cfg:
        all_case_labels = [c for b in body_cfgs for c in b.case_labels]
        has_default = any(self.ast.by_idx[i]["name"] == "default" for i in all_case_labels)
        case_edges = [(src, dst, CASE) for src, _ in cond.fringe for dst in all_case_labels]
        all_breaks = [x for b in body_cfgs for x in b.breaks]
        break_fringe = [(n, ALWAYS) for n in _take_level(all_breaks)]
        out = from_cfgs(cond, *body_cfgs)
        out.entry = cond.entry
        out.edges = case_edges + cond.edges + [e for b in body_cfgs for e in b.edges]
        out.fringe = (([] if has_default else _retype(cond.fringe, FALSE))
                      + break_fringe + [f for b in body_cfgs for f in b.fringe])
        out.case_labels = []
        out.breaks = _reduce_level(all_breaks)
        out.continues = [x for b in body_cfgs for x in b.continues]
        return out

    def cfg_for_try(self, r: dict) -> Cfg:
        try_block = self.ast.child_with_role(r["node_idx"], M.ROLE_TRY_BODY)
        if try_block is not None and not self.ast.children(try_block["node_idx"]):
            try_block = None
        try_cfg = self.cfg_for(try_block) if try_block is not None else Cfg()
        catch_nodes = self.ast.children_with_role(r["node_idx"], M.ROLE_CATCH_BODY)
        catch_cfgs = [self.cfg_for(c) for c in catch_nodes] or [Cfg()]
        fin = self.ast.child_with_role(r["node_idx"], M.ROLE_FINALLY_BODY)
        fin_cfgs = [self.cfg_for(fin)] if fin is not None else []

        edges = []
        for c in catch_cfgs:
            edges += _fringe_edges(try_cfg.fringe, c.entry)
        for c in catch_cfgs:
            for f in fin_cfgs:
                edges += _fringe_edges(c.fringe, f.entry)
        for f in fin_cfgs:
            edges += _fringe_edges(try_cfg.fringe, f.entry)

        if try_block is None:
            return fin_cfgs[0] if fin_cfgs else Cfg()
        out = from_cfgs(try_cfg, *catch_cfgs, *fin_cfgs)
        out.entry = try_cfg.entry
        out.edges = (edges + try_cfg.edges + [e for c in catch_cfgs for e in c.edges]
                     + [e for f in fin_cfgs for e in f.edges])
        if fin_cfgs and fin_cfgs[0].entry is not None:
            out.fringe = fin_cfgs[0].fringe
        else:
            out.fringe = try_cfg.fringe + [f for c in catch_cfgs for f in c.fringe]
        return out

    # -- top level -------------------------------------------------------------
    def build(self) -> list[tuple[int, int, str]]:
        method_cfg = seq(self.single(self.m), self.for_children(self.m))
        # resolve gotos / labeled jumps (Cfg.withResolvedJumpToLabel)
        edges = list(method_cfg.edges)
        for jump_idx, label in method_cfg.jumps:
            if label != "*":
                if label in method_cfg.labeled:
                    edges.append((jump_idx, method_cfg.labeled[label], ALWAYS))
            else:
                for dst in method_cfg.labeled.values():
                    edges.append((jump_idx, dst, ALWAYS))
        # dedup, keep deterministic order
        seen = set()
        out = []
        for e in edges:
            if e not in seen and e[0] is not None and e[1] is not None:
                seen.add(e)
                out.append(e)
        return out


def cfg_for_method(rows: list[dict], method_row: dict) -> list[tuple[int, int, str]]:
    ast = MethodAst(rows)
    return CfgBuilder(ast, method_row).build()


# --------------------------------------------------------------------------- #
# Dominators (Cooper–Harvey–Kennedy, reference CfgDominator.scala:7-89)
# --------------------------------------------------------------------------- #

def _immediate_dominators(nodes: list[int], entry: int, preds: dict[int, list[int]],
                          succs: dict[int, list[int]]) -> dict[int, int]:
    # reverse post-order
    order: list[int] = []
    seen = set()
    stack = [(entry, iter(succs.get(entry, [])))]
    seen.add(entry)
    while stack:
        n, it = stack[-1]
        advanced = False
        for s in it:
            if s not in seen:
                seen.add(s)
                stack.append((s, iter(succs.get(s, []))))
                advanced = True
                break
        if not advanced:
            order.append(n)
            stack.pop()
    rpo = list(reversed(order))
    rpo_num = {n: i for i, n in enumerate(rpo)}
    idom: dict[int, int] = {entry: entry}

    def intersect(a, b):
        while a != b:
            while rpo_num[a] > rpo_num[b]:
                a = idom[a]
            while rpo_num[b] > rpo_num[a]:
                b = idom[b]
        return a

    changed = True
    while changed:
        changed = False
        for n in rpo:
            if n == entry:
                continue
            cand = [p for p in preds.get(n, []) if p in idom]
            if not cand:
                continue
            new = cand[0]
            for p in cand[1:]:
                new = intersect(new, p)
            if idom.get(n) != new:
                idom[n] = new
                changed = True
    return idom


CDG_CONTROLLER_KINDS = {
    M.LITERAL, M.IDENTIFIER, M.CALL, M.METHOD_REF, M.UNKNOWN,
    M.CONTROL_STRUCTURE, M.JUMP_TARGET, M.BLOCK,
}


def dominator_edges(cfg_edges: list[tuple[int, int, str]], entry: int, exit_idx: int,
                    kind_of: dict[int, str] | None = None,
                    ) -> tuple[list[tuple[int, int]], list[tuple[int, int]], list[tuple[int, int]]]:
    """(DOMINATE, POST_DOMINATE, CDG) edge lists over one method's CFG."""
    succs: dict[int, list[int]] = {}
    preds: dict[int, list[int]] = {}
    nodes = {entry, exit_idx}
    for s, d, _ in cfg_edges:
        succs.setdefault(s, []).append(d)
        preds.setdefault(d, []).append(s)
        nodes.add(s)
        nodes.add(d)
    nl = sorted(nodes)

    idom = _immediate_dominators(nl, entry, preds, succs)
    dom_edges = [(d, n) for n, d in idom.items() if n != entry and d != n]

    ipdom = _immediate_dominators(nl, exit_idx, succs, preds)
    pdom_edges = [(d, n) for n, d in ipdom.items() if n != exit_idx and d != n]

    # CDG = post-dominance frontier, Cooper/Harvey/Kennedy on the REVERSED
    # CFG with the ipdom tree (CfgDominatorFrontier.scala:20-37 via
    # CdgPass.scala:33-42): a reverse-join node X — i.e. a BRANCH node with
    # >= 2 CFG successors — that has an ipdom controls every node on the
    # ipdom path from each successor up to (excluding) ipdom(X). CdgPass
    # drops edges whose controller is not an expression-ish kind
    # (Literal/Identifier/Call/MethodRef/Unknown/ControlStructure/
    # JumpTarget/Block — CdgPass.scala:38-41's match), e.g. METHOD.
    cdg: list[tuple[int, int]] = []
    for x in nl:
        ss = succs.get(x, [])
        if len(ss) < 2:
            continue
        ix = ipdom.get(x)
        if ix is None or ix == x:
            continue
        if kind_of is not None and kind_of.get(x) not in CDG_CONTROLLER_KINDS:
            continue
        for s in ss:
            runner: int | None = s
            while runner is not None and runner != ix:
                cdg.append((x, runner))
                nxt = ipdom.get(runner)
                runner = None if nxt == runner else nxt
    # dedup
    seen = set()
    cdg_out = []
    for e in cdg:
        if e not in seen:
            seen.add(e)
            cdg_out.append(e)
    return dom_edges, pdom_edges, cdg_out
