"""Java enhanced-for lowering, per the reference's javasrc2cpg de-sugaring
(ControlStructureTests.scala:169-640): array collections become an
idx-based FOR ($idxN local, `$idxN = 0` init, `$idxN < <arr>.length`
condition via sizeOf, `$idxN++` update, body-front `item = <arr>[$idxN]`);
non-array collections become `$iterLocalN = <coll>.iterator()` + a WHILE
over `$iterLocalN.hasNext()` with body-front `item = $iterLocalN.next()`;
non-identifier array expressions are copied into `$iterLocalN` first."""

from joern_spark import model as M
from joern_spark.frontends.astnode import flatten_file
from joern_spark.frontends.javasrc import parse_java_file


def _rows(src):
    return flatten_file("d", "T.java", "f" * 40, "java", src,
                        parse_java_file("d", "T.java", "f" * 40, src))


def _codes(rows, kind):
    return [r["code"] for r in rows if r["kind"] == kind]


def test_array_identifier_foreach_lowering():
    rows = _rows("""
class Foo {
  void baz(String[] args) {
    for (String a : args) { sink(a); }
  }
}""")
    calls = {(r["name"], r["code"]) for r in rows if r["kind"] == M.CALL}
    assert (M.OP_ASSIGNMENT, "$idx0 = 0") in calls
    assert (M.BINARY_OPERATOR_MAP["<"], "$idx0 < args.length") in calls
    assert (M.OP_SIZEOF, "args.length") in calls
    assert (M.POSTFIX_OPERATOR_MAP["++"], "$idx0++") in calls
    assert (M.OP_INDEX_ACCESS, "args[$idx0]") in calls
    assert (M.OP_ASSIGNMENT, "a = args[$idx0]") in calls
    # identifier collection: no $iterLocal copy (ControlStructureTests:110-168)
    assert "$iterLocal0" not in _codes(rows, M.LOCAL)


def test_array_expression_foreach_copies_to_iterlocal():
    rows = _rows("""
class Foo {
  void foo() {
    for (String item : new String[] {"a", "b"}) { sink(item); }
  }
}""")
    calls = {(r["name"], r["code"]) for r in rows if r["kind"] == M.CALL}
    assert (M.OP_ASSIGNMENT, '$iterLocal0 = new String[] { "a", "b" }') in calls
    assert (M.BINARY_OPERATOR_MAP["<"], "$idx0 < $iterLocal0.length") in calls
    assert (M.OP_ASSIGNMENT, "item = $iterLocal0[$idx0]") in calls
    assert "$iterLocal0" in _codes(rows, M.LOCAL)


def test_iterable_foreach_lowering():
    rows = _rows("""
class Foo {
  void bar(java.util.List items) {
    for (String item : items) { sink(item); }
  }
}""")
    calls = {(r["name"], r["code"], r["method_full_name"])
             for r in rows if r["kind"] == M.CALL}
    assert ("iterator", "items.iterator()",
            "java.util.List.iterator:java.util.Iterator()") in calls
    assert ("hasNext", "$iterLocal0.hasNext()",
            "java.util.Iterator.hasNext:boolean()") in calls
    assert ("next", "$iterLocal0.next()",
            "java.util.Iterator.next:java.lang.Object()") in calls
    # the WHILE drives the loop; item local is body-front
    whiles = [r for r in rows if r["kind"] == M.CONTROL_STRUCTURE
              and r["control_structure_type"] == M.CS_WHILE]
    assert len(whiles) == 1
