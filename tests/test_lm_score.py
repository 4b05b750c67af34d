"""Unigram-LM cross-entropy scoring (operators/textstats.lm_xent_score,
the CCNet-style quality filter). Pinned against a python twin of the
exact fixed-point arithmetic (floor(ln*1e9+0.5) per distinct term,
integer accumulation, one pinned division), plus the semantics edges:
self-trained vs external reference, unseen-token floor, gibberish
scoring above fluent text, tokenless-doc exclusion, alpha contract.
"""

import math

import pytest

from pygridmap_spark.operators import textstats as TS

SCHEMA = "doc_id long, text string"


def _norm_tokens(s):
    import re

    t = re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()
    return [x for x in t.split() if x]


def _twin(doc_rows, ref_rows=None, alpha=1.0):
    """Python twin of the operator's exact arithmetic."""
    ref_rows = doc_rows if ref_rows is None else ref_rows
    counts = {}
    for _i, s in ref_rows:
        seen = {}
        for t in _norm_tokens(s):
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            counts[t] = counts.get(t, 0) + c
    N, V = sum(counts.values()), len(counts)
    denom = N + alpha * V

    def lp_fp(c):
        return math.floor(math.log((c + alpha) / denom) * 1e9 + 0.5)

    unseen = math.floor(math.log(alpha / denom) * 1e9 + 0.5)
    out = {}
    for i, s in doc_rows:
        toks = _norm_tokens(s)
        if not toks:
            continue
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        s_fp = sum(c * (lp_fp(counts[t]) if t in counts else unseen) for t, c in tf.items())
        out[i] = (len(toks), (0.0 - s_fp / 1e9) / len(toks))
    return out


def _run(spark, doc_rows, ref_rows=None, alpha=1.0):
    docs = spark.createDataFrame(doc_rows, SCHEMA)
    ref = spark.createDataFrame(ref_rows, SCHEMA) if ref_rows is not None else None
    return {
        r["doc_id"]: (r["n_tokens"], r["xent"])
        for r in TS.lm_xent_score(docs, ref=ref, alpha=alpha).collect()
    }


def test_matches_python_twin_self_trained(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "zyx qwv zzz zyx"),
        (4, "the the the the"),
    ]
    got, exp = _run(spark, rows), _twin(rows)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-12)


def test_gibberish_scores_above_fluent(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((99, "xqzv wklf zzqp mrtn xqzv"))
    got = _run(spark, rows)
    fluent = got[0][1]
    assert got[99][1] > fluent + 1.0


def test_external_reference_and_unseen_floor(spark):
    ref = [(100, "alpha beta gamma alpha beta alpha")]
    docs = [(1, "alpha alpha"), (2, "delta delta")]  # delta unseen
    got, exp = _run(spark, docs, ref), _twin(docs, ref)
    for k in exp:
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-12)
    assert got[2][1] > got[1][1]


def test_tokenless_docs_excluded(spark):
    rows = [(1, "real text here"), (2, "!!! ... ---"), (3, None)]
    got = _run(spark, rows)
    assert set(got) == {1}


def test_alpha_contract(spark):
    docs = spark.createDataFrame([(1, "a b")], SCHEMA)
    with pytest.raises(ValueError, match="alpha"):
        TS.lm_xent_score(docs, alpha=0.0)


def test_uniform_corpus_xent_is_log_v(spark):
    # every token distinct, each doc one token: with alpha -> the smoothed
    # uniform model; xent = -ln((1+a)/(N+aV)) with N=V=4, a=1 -> ln(4)
    rows = [(i, w) for i, w in enumerate(["aa", "bb", "cc", "dd"])]
    got = _run(spark, rows)
    expect = -math.log(2.0 / 8.0)
    for _i, (n, x) in got.items():
        assert n == 1
        assert x == pytest.approx(expect, abs=1e-9)
