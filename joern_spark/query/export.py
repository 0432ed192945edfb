"""Export surface: per-method dot graphs and JSON — the analogue of the
reference's `.dotAst` / `.dotCfg` / `.dotDdg` / `.dotCdg` steps and
`.toJson` (x2cpg/.../layers/DumpAst.scala:118-140, dataflowengineoss
DumpDdg/DumpCdg, Steps.scala:21-79).

These are driver-side renderers over ONE method's rows — the collect is
bounded by method size, exactly like the reference (which renders from an
in-memory traversal). The filtering join runs distributed; only the final
per-method subgraph is collected.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from joern_spark import model as M

_EDGE_FOR = {"ast": M.AST, "cfg": M.CFG, "ddg": M.REACHING_DEF, "cdg": M.CDG}


def _method_subgraph(nodes: DataFrame, edges: DataFrame,
                     method_full_name: str, label: str):
    m = (nodes.filter((F.col("kind") == M.METHOD)
                      & (F.col("full_name") == method_full_name))
         .select("id").limit(1).collect())
    if not m:
        raise KeyError(f"no METHOD with fullname {method_full_name!r}")
    mid = m[0]["id"]
    scope = nodes.filter((F.col("method_id") == mid) | (F.col("id") == mid)) \
                 .select("id", "kind", "name", "code", "line")
    rows = {r["id"]: r for r in scope.collect()}
    ids = list(rows)
    e = (edges.filter(F.col("label") == label)
         .filter(F.col("src").isin(ids) & F.col("dst").isin(ids))
         .select("src", "dst", "variable").collect())
    return mid, rows, e


def _disp(r) -> str:
    if r["kind"] == M.METHOD:
        return r["name"]
    if r["kind"] == M.METHOD_RETURN:
        return "RET"
    return (r["code"] or r["kind"]).replace('"', '\\"')


def dot(nodes: DataFrame, edges: DataFrame, method_full_name: str,
        kind: str = "ast") -> str:
    """Graphviz digraph of one method's {ast, cfg, ddg, cdg} subgraph —
    node labels follow the reference dump format `(<KIND>, <code>)`."""
    label = _EDGE_FOR[kind]
    mid, rows, e = _method_subgraph(nodes, edges, method_full_name, label)
    out = [f'digraph "{method_full_name}" {{']
    used = {s for s, d, _ in ((x["src"], x["dst"], x["variable"]) for x in e)}
    used |= {x["dst"] for x in e}
    if kind == "ast":
        used = set(rows)
    for i in sorted(used):
        r = rows.get(i)
        if r is None:
            continue
        out.append(f'  "{i}" [label = "({r["kind"]}, {_disp(r)})" ]')
    for x in sorted(e, key=lambda x: (x["src"], x["dst"])):
        attr = f' [ label = "{x["variable"]}" ]' if x["variable"] else ""
        out.append(f'  "{x["src"]}" -> "{x["dst"]}"{attr}')
    out.append("}")
    return "\n".join(out)


def dot_ast(nodes, edges, method_full_name):
    return dot(nodes, edges, method_full_name, "ast")


def dot_cfg(nodes, edges, method_full_name):
    return dot(nodes, edges, method_full_name, "cfg")


def dot_ddg(nodes, edges, method_full_name):
    return dot(nodes, edges, method_full_name, "ddg")


def dot_cdg(nodes, edges, method_full_name):
    return dot(nodes, edges, method_full_name, "cdg")


def to_json(df: DataFrame, limit: int | None = None) -> str:
    """`.toJson` terminal: the relation as a JSON array of row objects
    (Steps.scala:21-79). Column order is schema order; values are
    JSON-native."""
    rows = (df.limit(limit) if limit else df).toJSON().collect()
    return "[" + ",".join(rows) + "]"


def method_json(nodes: DataFrame, edges: DataFrame,
                method_full_name: str) -> str:
    """One method's full subgraph (nodes + typed edges) as JSON."""
    mid, rows, _ = _method_subgraph(nodes, edges, method_full_name, M.AST)
    ids = list(rows)
    e = (edges.filter(F.col("src").isin(ids) & F.col("dst").isin(ids))
         .select("src", "dst", "label", "variable").collect())
    return json.dumps({
        "method": method_full_name,
        "nodes": [{"id": r["id"], "kind": r["kind"], "name": r["name"],
                   "code": r["code"], "line": r["line"]}
                  for r in sorted(rows.values(), key=lambda r: r["id"])],
        "edges": [{"src": x["src"], "dst": x["dst"], "label": x["label"],
                   **({"variable": x["variable"]} if x["variable"] else {})}
                  for x in sorted(e, key=lambda x: (x["label"], x["src"], x["dst"]))],
    }, sort_keys=True)
