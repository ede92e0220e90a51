from pygr_spark.operators.sweep import coverage_segments, sweep_coverage_mask


def test_coverage_segments(spark):
    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 5, 15), ("s", 20, 30)], ["id", "start", "stop"]
    )
    out = coverage_segments(df, ["id"])
    got = sorted(
        (r.seg_start, r.seg_stop, r.coverage) for r in out.collect()
    )
    assert got == [(0, 5, 1), (5, 10, 2), (10, 15, 1), (15, 20, 0), (20, 30, 1)]


def test_stop_before_start_tie(spark):
    # [0,10) and [10,20): at pos 10 the stop fires before the start,
    # so coverage never reaches 2 (reference tie rule cnestedlist.pyx:951-955)
    df = spark.createDataFrame([("s", 0, 10), ("s", 10, 20)], ["id", "start", "stop"])
    out = coverage_segments(df, ["id"])
    assert out.agg({"coverage": "max"}).collect()[0][0] == 1


def test_sweep_mask(spark):
    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 5, 15), ("s", 8, 30), ("s", 25, 40)],
        ["id", "start", "stop"],
    )
    out = sweep_coverage_mask(df, ["id"], min_aligned=2)
    got = sorted((r.start, r.stop) for r in out.collect())
    # coverage>=2 on [5,15) and [25,30)
    assert got == [(5, 15), (25, 30)]


def test_indel_cut_hand_example(spark):
    """groupBySequences(sourceOnly=True, indelCut=True) semantics
    (reference cnestedlist.pyx:999-1008), hand-traced.

    seq a: [0,10) and [12,30)  (indel between 10 and 12 — the second
           interval's bounds 12 and 30 are isIndel-flagged)
    seq b: [0,30)
    minAligned=2 → coverage>=2 on [0,10) and [12,30).
    Without indelCut those are two runs anyway (gap 10-12); with a
    third seq c: [8,14) bridging the gap, coverage>=2 becomes
    [0,14)∪[12,30) = [0,30)... traced: cov2 on [0,10) (a,b),
    [8,10) is 3, [10,12) (b,c) = 2, [12,14) 3, [14,30) 2 → one
    contiguous >=2 run [0,30). indelCut splits it at 12 (start of
    a's second interval): [0,12) and [12,30)."""
    rows = [
        ("s", "a", 0, 10),
        ("s", "a", 12, 30),
        ("s", "b", 0, 30),
        ("s", "c", 8, 14),
    ]
    df = spark.createDataFrame(rows, ["id", "seq", "start", "stop"])
    # without indelCut: one merged run
    plain = sweep_coverage_mask(df, ["id"], min_aligned=2)
    assert sorted((r.start, r.stop) for r in plain.collect()) == [(0, 30)]
    out = sweep_coverage_mask(df, ["id"], min_aligned=2, indel_cut=True)
    got = sorted((r.start, r.stop) for r in out.collect())
    assert got == [(0, 12), (12, 30)]


def _brute_indelcut(rows, min_aligned):
    """Independent per-position oracle: integer-position coverage by
    distinct seqs, runs of kept positions, split at bounds of every
    non-first per-seq interval strictly inside a run."""
    from collections import defaultdict

    by_id = defaultdict(list)
    for i, s, a, b in rows:
        by_id[i].append((s, a, b))
    result = []
    for i, ivals in by_id.items():
        lo = min(a for _, a, _ in ivals)
        hi = max(b for _, _, b in ivals)
        cov = defaultdict(set)
        for s, a, b in ivals:
            for p in range(a, b):
                cov[p].add(s)
        kept = [p for p in range(lo, hi) if len(cov[p]) >= min_aligned]
        cuts = set()
        by_seq = defaultdict(list)
        for s, a, b in ivals:
            by_seq[s].append((a, b))
        for s, l in by_seq.items():
            for a, b in sorted(l)[1:]:
                cuts.update((a, b))
        runs = []
        for p in kept:
            if runs and runs[-1][1] == p and p not in cuts:
                runs[-1][1] = p + 1
            else:
                runs.append([p, p + 1])
        result += [(i, a, b) for a, b in runs]
    return sorted(result)


def test_indel_cut_brute_force(spark):
    """Randomized cross-check vs the per-position brute force, on
    per-seq pre-merged intervals (the groupByIntervals contract)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(6):
        for s in "abcd":
            pos = 0
            for _ in range(rng.randint(1, 4)):
                pos += rng.randint(1, 5)
                a = pos
                pos += rng.randint(1, 8)
                rows.append((f"k{i}", s, a, pos))
                pos += 1  # gap >=1: keeps per-seq intervals disjoint
    df = spark.createDataFrame(rows, ["id", "seq", "start", "stop"])
    out = sweep_coverage_mask(df, ["id"], min_aligned=2, indel_cut=True)
    got = sorted((r.id, r.start, r.stop) for r in out.collect())
    assert got == _brute_indelcut(rows, 2)
