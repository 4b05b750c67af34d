"""BPE tokenizer-training prep: byte-pair-encoding merge steps over a
distributed word-frequency table (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public).

The distributed shape: BPE trains on the WORD-FREQUENCY table, not the
corpus — one corpus-sized aggregation (operators/textstats.
term_frequencies) reduces a 100-TB corpus to a vocabulary-bounded frame,
and every merge step is then one pair-count aggregation over that frame
plus one literal rewrite. Each step costs one Spark job; the operator
runs ``k`` steps distributed with the connected-components loop
discipline (localCheckpoint per round so the plan cannot snowball).
Honest guidance for REAL vocabularies (30k+ merges): run this operator
while the word table is cluster-sized, and once the frame fits one
machine (it is vocabulary-bounded, so it always eventually does) collect
it and finish with a single-node priority-queue trainer — 30k merges as
30k Spark jobs is scheduler abuse, and the docstring says so rather than
hiding it.

Symbol encoding is the cross-engine contract: a word's symbol sequence
is the string ``\\x01s1\\x01\\x01s2\\x01...`` (every symbol framed by
``\\x01``). Pair counts weight every adjacent symbol position by the
word's frequency (the canonical get_stats — overlapping positions all
count); the merge rewrite is ONE literal string replace, whose
left-to-right non-overlapping scan IS greedy BPE merge order in both
Spark and DuckDB (the driver oracle restates whole rounds). ``\\x01`` is
a reserved byte in words (unrepresentable in normalized text; the
sampling-sentinel convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x01"


def _symbols(enc_col: str):
    return F.split(F.expr(f"trim(BOTH '{SEP}' FROM {enc_col})"), SEP + SEP)


def pair_counts(words: DataFrame, enc_col: str = "__enc__", freq_col: str = "freq") -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over an encoded
    word table: ``(left, right, cnt)``. One explode + one partial-
    aggregated hash agg keyed by the pair — bounded by distinct pairs,
    which is bounded by vocab size squared but in practice ~linear in
    vocab (Zipf)."""
    s = _symbols(enc_col)
    pair = F.explode(
        F.arrays_zip(
            F.slice(s, 1, F.size(s) - 1).alias("l"),
            F.slice(s, 2, F.size(s) - 1).alias("r"),
        )
    )
    return (
        words.filter(F.size(s) >= 2)
        .select(F.col(freq_col).alias("__f__"), pair.alias("__p__"))
        .groupBy(
            F.col("__p__.l").alias("left"), F.col("__p__.r").alias("right")
        )
        .agg(F.sum("__f__").alias("cnt"))
    )


def bpe_merge_steps(
    words: DataFrame,
    k: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Run ``k`` BPE merge steps over a ``(word, freq)`` table. Returns
    ``(words_after, merges)``: the word table with a ``symbols``
    array<string> column reflecting the merges, and the learned merge
    list ``[(left, right, weighted_count), ...]`` in order. Stops early
    when no pair remains (every word fully merged). Ties on the count
    break (left, right) lexicographic — deterministic and
    oracle-checkable. Each step: one pair-count agg (the only exchange),
    one driver-side argmax row, one literal-replace projection,
    localCheckpoint."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    # the reserved frame byte must not appear IN words — an interior
    # \x01 would create phantom symbol boundaries and silently corrupt
    # every pair count; fail loudly (one cheap limit-1 probe, next to
    # the k argmax jobs this operator already runs)
    if words.filter(F.col(word_col).contains(SEP)).limit(1).count() > 0:
        raise ValueError(
            "word table contains the reserved \\x01 symbol-frame byte; "
            "normalize/filter words upstream (functions/text.normalized "
            "never emits it)"
        )
    enc = F.regexp_replace(F.col(word_col), "(.)", f"{SEP}$1{SEP}")
    cur = words.select(
        F.col(word_col), F.col(freq_col), enc.alias("__enc__")
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(k)):
        best = (
            pair_counts(cur, "__enc__", freq_col)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((left, right, cnt))
        pat = f"{SEP}{left}{SEP}{SEP}{right}{SEP}"
        rep = f"{SEP}{left}{right}{SEP}"
        cur = cur.withColumn(
            "__enc__", F.replace(F.col("__enc__"), F.lit(pat), F.lit(rep))
        ).localCheckpoint(eager=True)
    out = cur.select(
        word_col, freq_col, _symbols("__enc__").alias("symbols")
    )
    return out, merges
