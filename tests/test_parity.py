"""Triple-parity gate vs the reference's transcribed golden expectations.

BASELINE.json north rule: precision AND recall >= 0.95 on the reference's
C/C++/Java/JS fixture expectations. The corpus (joern_spark/parity/corpus_*)
is hand-transcribed from the reference test suites — independent of this
repo's frontends — so this is a real parity measurement, not
self-validation.
"""

from __future__ import annotations

import pytest

from joern_spark.parity import corpus, score_corpus

TARGET = 0.95


def test_parity_meets_north_rule_target():
    _rows, summary = score_corpus()
    assert summary, "empty parity summary"
    failures = []
    for lang, rel, tp, fp, fn, p, r in summary:
        if p < TARGET or r < TARGET:
            failures.append((lang, rel, tp, fp, fn, p, r))
    assert not failures, f"parity below {TARGET}: {failures}"


def test_parity_corpus_breadth():
    cases = corpus()
    langs = {c["lang"] for c in cases}
    assert langs == {"c", "cpp", "java", "javascript"}
    assert len(cases) >= 90, len(cases)
    # every case cites its reference source
    assert all(c.get("cite") for c in cases)
    # names must be unique: the Spark extractor keys facts by the
    # name-derived file path, so a duplicate merges two parses into one
    # case and silently corrupts occurrence-indexed subjects
    from collections import Counter
    dups = [k for k, v in Counter(c["name"] for c in cases).items() if v > 1]
    assert not dups, f"duplicate case names: {dups}"


@pytest.mark.parametrize("case", corpus(), ids=lambda c: c["name"])
def test_parity_case_exact(case):
    """Each transcribed case individually: no false positives or negatives
    (stronger than the aggregate 0.95 gate; any regression names the case)."""
    from joern_spark.parity import score_case
    rows = score_case(case)
    bad = [(rel, fp, fn) for _l, _n, rel, _tp, fp, fn in rows if fp or fn]
    assert not bad, bad
