"""Dump extractor facts for a scratch parity case — transcription aid.

Usage: python tools/dumpcase.py <file.py-with-CASE-dict> [relations...]
The file must define CASE (a parity case dict). Prints python_case_facts
grouped by relation so the golden expectations can be checked against
the reference suite text while transcribing.
"""
import importlib.util
import sys
from collections import defaultdict

from joern_spark.parity import python_case_facts, want_facts, score_case


def main():
    spec = importlib.util.spec_from_file_location("scratch", sys.argv[1])
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    case = mod.CASE
    rels = set(sys.argv[2:])
    got = python_case_facts(case)
    by = defaultdict(list)
    for rel, s, o in got:
        by[rel].append((s, o))
    for rel in sorted(by):
        if rels and rel not in rels:
            continue
        print(f"== {rel} ==")
        for s, o in sorted(by[rel]):
            print(f"  {s!r} -> {o!r}")
    rows = score_case(case)
    bad = [(rel, fp, fn) for _l, _n, rel, _tp, fp, fn in rows if fp or fn]
    print("SCORE:", "OK" if not bad else bad)
    if bad:
        want = set(want_facts(case))
        print("-- missing (want not got):")
        for f in sorted(want - got):
            print("  ", f)
        print("-- extra (got not want, same rels):")
        wrels = {r for r, _, _ in want}
        for f in sorted(got - want):
            if f[0] in wrels:
                print("  ", f)


if __name__ == "__main__":
    main()
