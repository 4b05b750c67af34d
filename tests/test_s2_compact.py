"""S2 cell-set compaction (functions/s2.compact_cells / uncompact_cells) —
the H3 compactCells / S2 CellUnion.Normalize analog.

The driver oracle (`s2_compact_cells`) hash-gates the algorithm on real
data; these pin the semantics: aligned full blocks fuse to one ancestor,
3-of-4 sibling sets stay put, min_level floors the coarsening, whole-face
fusion, and the uncompact round-trip on seeded random sets.
"""

import random

from pygridmap_spark.functions import s2 as S2


def _cells(spark, ids):
    return spark.createDataFrame([(int(c),) for c in ids], "compact long")


def _out(df):
    return {(r["level"], r["compact"]) for r in df.collect()}


def test_aligned_block_fuses(spark):
    # face 2, level 4: pos 0..63 is the full level-1 subtree under pos>>6 == 0
    ids = [(2 << 8) + p for p in range(64)]
    got = _out(S2.compact_cells(_cells(spark, ids), level=4))
    assert got == {(1, (2 << 2) + 0)}


def test_three_siblings_stay(spark):
    ids = [(1 << 4) + p for p in (0, 1, 2)]  # level 2, missing sibling 3
    got = _out(S2.compact_cells(_cells(spark, ids), level=2))
    assert got == {(2, i) for i in ids}


def test_mixed_fusion_and_leftovers(spark):
    # full quad 4..7 (fuses to level-1 pos 1) + lone cells 0 and 9
    ids = [(3 << 4) + p for p in (0, 4, 5, 6, 7, 9)]
    got = _out(S2.compact_cells(_cells(spark, ids), level=2))
    assert got == {
        (2, (3 << 4) + 0),
        (1, (3 << 2) + 1),
        (2, (3 << 4) + 9),
    }


def test_min_level_floors_coarsening(spark):
    # whole face 5 at level 2 (16 cells) fuses to the face at level 0 ...
    ids = [(5 << 4) + p for p in range(16)]
    assert _out(S2.compact_cells(_cells(spark, ids), level=2)) == {(0, 5)}
    # ... unless min_level=1 floors it at the four level-1 quads
    got = _out(S2.compact_cells(_cells(spark, ids), level=2, min_level=1))
    assert got == {(1, (5 << 2) + q) for q in range(4)}


def test_duplicate_inputs_are_deduped(spark):
    ids = [(0 << 4) + p for p in (0, 1, 2, 3)] * 3
    got = _out(S2.compact_cells(_cells(spark, ids), level=2))
    assert got == {(1, 0)}


def test_uncompact_mixed_levels(spark):
    df = spark.createDataFrame(
        [(1, (2 << 2) + 1), (3, (2 << 6) + 5)], "level int, compact long"
    )
    got = {r["compact"] for r in S2.uncompact_cells(df, level=3).collect()}
    expect = {((2 << 2) + 1) * 16 + k for k in range(16)} | {(2 << 6) + 5}
    assert got == expect


def test_roundtrip_random_sets(spark):
    rnd = random.Random(42)
    level = 5
    for _ in range(3):
        ids = {
            (f << (2 * level)) + rnd.randrange(4 ** level)
            for f in (0, 4)
            for _ in range(rnd.randrange(1, 300))
        }
        # plant one guaranteed-full quad so fusion actually happens
        base = (4 << (2 * level)) + (rnd.randrange(4 ** (level - 1)) << 2)
        ids |= {base + k for k in range(4)}
        compacted = S2.compact_cells(_cells(spark, ids), level=level)
        assert compacted.count() < len(ids) + 1
        back = {
            r["compact"]
            for r in S2.uncompact_cells(compacted, level=level).collect()
        }
        assert back == ids
