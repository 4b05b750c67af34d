"""BM25 ranked retrieval (operators/textstats.bm25_topk) contract pins.

The driver oracle (`bm25_topk`) hash-gates the full scorer on real data;
these pin the formula against a hand-computed corpus plus the edges:
k-truncation, doc_id tie-break, empty/untokenizable docs outside the
collection, and no-match terms contributing nothing.
"""

import math

import pytest

from pygridmap_spark.operators import textstats as TS


def _bm25(n, df, tf, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_ranking(spark):
    docs = _docs(
        spark,
        [
            "apple banana apple",
            "banana cherry",
            "cherry cherry cherry durian",
        ],
    )
    out = TS.bm25_topk(docs, ["apple", "cherry"], k=3).collect()
    got = {r["doc_id"]: r for r in out}
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 3, 2]
    assert got[1]["score"] == pytest.approx(_bm25(3, 1, 2, 3, 3.0))
    assert got[3]["score"] == pytest.approx(_bm25(3, 2, 3, 4, 3.0))
    assert got[2]["score"] == pytest.approx(_bm25(3, 2, 1, 2, 3.0))
    assert got[1]["n_terms"] == 1 and got[3]["n_terms"] == 1


def test_k_truncates_and_ties_break_by_doc_id(spark):
    docs = _docs(spark, ["zeta same", "zeta same", "zeta same", "other words"])
    out = TS.bm25_topk(docs, ["zeta"], k=2).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 1),
        (2, 2),
    ]


def test_untokenizable_docs_outside_collection(spark):
    # "...!!!" normalizes to nothing: N must be 2, not 3 (changes idf)
    docs = _docs(spark, ["apple pie", "apple tart crumble", "...!!!"])
    out = {r["doc_id"]: r for r in TS.bm25_topk(docs, ["apple"], k=5).collect()}
    assert set(out) == {1, 2}
    assert out[1]["score"] == pytest.approx(_bm25(2, 2, 1, 2, 2.5))
    assert out[2]["score"] == pytest.approx(_bm25(2, 2, 1, 3, 2.5))


def test_absent_terms_score_nothing(spark):
    docs = _docs(spark, ["apple pie", "banana split"])
    assert TS.bm25_topk(docs, ["zzz_not_there"], k=5).count() == 0
    out = TS.bm25_topk(docs, ["apple", "zzz_not_there"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]
