"""Score a single parity case and print the want/got diff — transcription
iteration helper: `python tools/parity_debug.py <case-name> [--facts]`."""
import sys

from joern_spark.parity import (corpus, python_case_facts, score_case,
                                want_facts)


def main():
    name = sys.argv[1]
    show_all = "--facts" in sys.argv
    case = next(c for c in corpus() if c["name"] == name)
    want = {(r, s, o) for r, s, o in want_facts(case) if o != ""}
    subjects = {(r, s) for r, s, _ in want_facts(case)}
    got_all = python_case_facts(case)
    got = {(r, s, o) for r, s, o in got_all if (r, s) in subjects}
    print("SCORE:", score_case(case))
    for t in sorted(want - got):
        print("MISSING:", t)
    for t in sorted(got - want):
        print("EXTRA:  ", t)
    if show_all:
        for t in sorted(got_all):
            print("FACT:", t)


if __name__ == "__main__":
    main()
