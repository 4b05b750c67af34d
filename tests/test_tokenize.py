"""BPE merge steps (operators/tokenize.bpe_merge_steps): pinned against
the canonical Sennrich reference algorithm implemented directly in
python (get_stats counts every adjacent position weighted by word
frequency; the merge is greedy left-to-right), plus the determinism
tie-break, early stop, and the single-char/empty edge. The driver
oracle (`bpe_merges`) restates whole rounds in DuckDB.
"""

import pytest

from pygridmap_spark.operators import tokenize as TK


def _py_bpe(words, k):
    """Sennrich reference: words = {word: freq}."""
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(k):
        stats = {}
        for w, freq in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + freq
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return vocab, merges


WORDS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2,
    "banana": 4, "bandana": 1, "a": 7,
}


def _frame(spark, words=WORDS):
    return spark.createDataFrame(list(words.items()), "word string, freq long")


def test_matches_sennrich_reference(spark):
    out, merges = TK.bpe_merge_steps(_frame(spark), 6)
    vocab, ref_merges = _py_bpe(WORDS, 6)
    assert merges == ref_merges
    got = {r["word"]: list(r["symbols"]) for r in out.collect()}
    assert got == vocab


def test_greedy_overlap_aaa(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right -> [aa, aa]; 'aaa' -> [aa, a]
    words = {"aaaa": 3, "aaa": 2}
    out, merges = TK.bpe_merge_steps(_frame(spark, words), 1)
    assert merges[0][:2] == ("a", "a")
    got = {r["word"]: list(r["symbols"]) for r in out.collect()}
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_early_stop_and_single_chars(spark):
    words = {"a": 5, "b": 3}
    out, merges = TK.bpe_merge_steps(_frame(spark, words), 4)
    assert merges == []
    got = {r["word"]: list(r["symbols"]) for r in out.collect()}
    assert got == {"a": ["a"], "b": ["b"]}


def test_tie_breaks_lexicographic(spark):
    # 'xy' and 'ab' both freq 5 -> pairs (x,y) and (a,b) tie; (a,b) wins
    words = {"xy": 5, "ab": 5}
    _out, merges = TK.bpe_merge_steps(_frame(spark, words), 1)
    assert merges[0][:2] == ("a", "b")


def test_k_contract(spark):
    with pytest.raises(ValueError, match="k must be"):
        TK.bpe_merge_steps(_frame(spark), -1)
    out, merges = TK.bpe_merge_steps(_frame(spark), 0)
    assert merges == [] and out.count() == len(WORDS)


def test_reserved_frame_byte_rejected(spark):
    words = {"ok": 2, "bad\x01word": 1}
    with pytest.raises(ValueError, match="reserved"):
        TK.bpe_merge_steps(_frame(spark, words), 1)


def test_oracle_generator_early_stop_preserves_words():
    # single-char vocabulary: round 0 already has no pairs; the generated
    # 3-round oracle must restate the operator's early stop (rows kept,
    # symbols unchanged) instead of cross-joining everything to zero
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'a b c a'), (2, 'b c')) t(doc_id, text)"
    )
    rows = con.execute(E.oracle_sql()["bpe_merges"]).fetchall()
    got = {w: s for (w, _f, s) in rows}
    assert got == {"a": "a", "b": "b", "c": "c"}
