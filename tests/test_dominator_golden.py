"""Golden abstract-graph dominator/frontier tests transcribed BY HAND from
the reference's x2cpg pass unit suites — exact-set, FP-counted evidence for
the Cooper/Harvey/Kennedy code path that CdgPass/CfgDominatorPass rely on
(the component round-2's verdict flagged as thin on multi-exit/irreducible
shapes):

* CfgDominatorPassTests.scala ("Have correct DOMINATE/POST_DOMINATE edges
  after CfgDominatorPass run.", x2cpg/src/test/scala/io/joern/x2cpg/passes/
  CfgDominatorPassTests.scala:16-97) — immediate dominator + post-dominator
  tree edges over a 7-node branch/merge graph.
* CfgDominatorFrontierTests.scala ("Cfg dominance frontier test" :29-77 —
  a graph with a loop (v4->v2) and a self-frontier node; "Cfg domiance
  frontier with dead code test" :79-108 — an entry-unreachable predecessor,
  exercising the missing-idom walk cutoff).

The frontier cases run ``dominator_edges`` on the REVERSED edge list with
``exit=v0``: the CDG output computes {(x, n) : x in postDF(n)} over its
input orientation, so on the reversed graph it is exactly the forward
dominance frontier the reference asserts (the reference's CdgPass applies
the same CfgDominatorFrontier class in reverse orientation,
CdgPass.scala:23-42).
"""

from joern_spark.operators.controlflow import dominator_edges

V0, V1, V2, V3, V4, V5, V6 = range(7)


def test_dominator_pass_golden_trees():
    # CfgDominatorPassTests.scala:39-49 edge list (v4->v2 NOT present here)
    cfg = [(V0, V1, "A"), (V1, V2, "A"), (V2, V3, "A"), (V2, V5, "A"),
           (V3, V4, "A"), (V4, V5, "A"), (V5, V6, "A")]
    dom, pdom, _cdg = dominator_edges(cfg, entry=V0, exit_idx=V6)

    # :55-72 — immediate DOMINATE out-edges per node, exact sets
    want_dom = {V0: {V1}, V1: {V2}, V2: {V3, V5}, V3: {V4}, V4: set(),
                V5: {V6}, V6: set()}
    got_dom = {v: set() for v in range(7)}
    for s, d in dom:
        got_dom[s].add(d)
    assert got_dom == want_dom

    # :74-97 — immediate POST_DOMINATE out-edges per node, exact sets
    want_pdom = {V6: {V5}, V5: {V2, V4}, V4: {V3}, V3: set(), V2: {V1},
                 V1: {V0}, V0: set()}
    got_pdom = {v: set() for v in range(7)}
    for s, d in pdom:
        got_pdom[s].add(d)
    assert got_pdom == want_pdom


def _forward_frontier(cfg_edges, entry):
    """Forward dominance frontier via the CDG kernel on the reversed graph:
    returns {n: DF(n)} for every n with a non-empty frontier."""
    rev = [(d, s, lab) for s, d, lab in cfg_edges]
    _dom, _pdom, cdg = dominator_edges(rev, entry=-1, exit_idx=entry)
    df: dict[int, set[int]] = {}
    for x, n in cdg:
        df.setdefault(n, set()).add(x)
    return df


def test_dominance_frontier_golden_loop_graph():
    # CfgDominatorFrontierTests.scala:42-58 (includes the back edge v4->v2)
    cfg = [(V0, V1, "A"), (V1, V2, "A"), (V2, V3, "A"), (V2, V5, "A"),
           (V3, V4, "A"), (V4, V2, "A"), (V4, V5, "A"), (V5, V6, "A")]
    df = _forward_frontier(cfg, entry=V0)
    # :69-76 — DF(v2)={v2} (self-frontier via the loop), DF(v3)=DF(v4)=
    # {v2,v5}; v0/v1/v5/v6 have NO frontier (shouldBe None) — exact.
    assert df == {V2: {V2}, V3: {V2, V5}, V4: {V2, V5}}


def test_dominance_frontier_golden_dead_code():
    # CfgDominatorFrontierTests.scala:86-93 — v1 is not reachable from the
    # entry v0; the runner walk must stop at the missing idom instead of
    # looping or crashing, and v1's frontier is still {v2}.
    cfg = [(V0, V2, "A"), (V1, V2, "A")]
    df = _forward_frontier(cfg, entry=V0)
    # :103-106 — DF(v1)={v2}; v0 and v2 have none — exact.
    assert df == {V1: {V2}}
