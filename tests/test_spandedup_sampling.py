"""Golden + property tests for span-level substring dedup
(operators/spandedup.py) and exact stratified sampling
(operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from pygr_spark.operators.sampling import stratified_sample
from pygr_spark.operators.spandedup import dup_spans, remove_dup_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDupSpans:
    def test_golden_shared_window(self, spark):
        # docs 1 and 2 share the 10-char run "ABCDEFGHIJ" embedded at
        # different offsets; doc 3 is unique.
        df = _docs(
            spark,
            [
                (1, "xxABCDEFGHIJyyy"),
                (2, "zABCDEFGHIJw"),
                (3, "nothing-shared-here!"),
            ],
        )
        out = dup_spans(df, length=10).orderBy("doc_id").collect()
        got = [(r.doc_id, r.span_start, r.span_end) for r in out]
        assert got == [(1, 2, 12), (2, 1, 11)]

    def test_overlapping_windows_merge(self, spark):
        # an 11-char shared run produces two overlapping 10-windows
        # per doc -> ONE merged span of 11 chars, n_grams=2
        df = _docs(spark, [(1, "aABCDEFGHIJK"), (2, "ABCDEFGHIJKz")])
        out = dup_spans(df, length=10).orderBy("doc_id").collect()
        assert [(r.doc_id, r.span_start, r.span_end, r.n_grams) for r in out] == [
            (1, 1, 12, 2),
            (2, 0, 11, 2),
        ]

    def test_within_doc_repeat_counts(self, spark):
        # the duplicate occurs twice INSIDE one doc: still >= 2 occurrences
        df = _docs(spark, [(1, "ABCDEFGHIJ--ABCDEFGHIJ"), (2, "unrelated-text")])
        out = dup_spans(df, length=10).collect()
        assert {(r.doc_id, r.span_start, r.span_end) for r in out} == {
            (1, 0, 10),
            (1, 12, 22),
        }

    def test_short_docs_skipped(self, spark):
        df = _docs(spark, [(1, "short"), (2, "short")])
        assert dup_spans(df, length=10).count() == 0

    def test_content_sampling_is_consistent(self, spark):
        # content-defined sampling: a sampled-in window is sampled in
        # EVERY doc containing it, so whatever is detected in one copy
        # of a shared run is detected in the other copy too
        df = _docs(
            spark,
            [(1, "..ABCDEFGHIJKLMNOP.."), (2, "ABCDEFGHIJKLMNOP....")],
        )
        out = dup_spans(df, length=4, sample_mod=3)
        docs_hit = {r.doc_id for r in out.select("doc_id").distinct().collect()}
        assert docs_hit in (set(), {1, 2})  # never one-sided

    def test_sampled_spans_subset_of_exact(self, spark):
        df = _docs(
            spark,
            [(1, "..ABCDEFGHIJKLMNOP.."), (2, "ABCDEFGHIJKLMNOP....")],
        )
        exact = dup_spans(df, length=4, sample_mod=1).collect()
        samp = dup_spans(df, length=4, sample_mod=2).collect()
        # every sampled span lies inside some exact span
        for s in samp:
            assert any(
                e.doc_id == s.doc_id
                and e.span_start <= s.span_start
                and s.span_end <= e.span_end
                for e in exact
            )

    def test_by_hash_same_result(self, spark):
        df = _docs(
            spark,
            [(1, "xxABCDEFGHIJyyy"), (2, "zABCDEFGHIJw"), (3, "qqqqqqqqqqqqqq")],
        )
        a = sorted(dup_spans(df, length=10, by_hash=False).collect())
        b = sorted(dup_spans(df, length=10, by_hash=True).collect())
        assert a == b

    def test_bad_params(self, spark):
        df = _docs(spark, [(1, "abc")])
        with pytest.raises(ValueError):
            dup_spans(df, min_count=1)


class TestRemoveDupSpans:
    def test_cut_and_passthrough(self, spark):
        df = _docs(spark, [(1, "xxABCDEFGHIJyyy"), (2, "zABCDEFGHIJw"), (3, "keep-me")])
        spans = dup_spans(df, length=10)
        out = {
            r.doc_id: r.clean_text
            for r in remove_dup_spans(df, spans).collect()
        }
        assert out == {1: "xxyyy", 2: "zw", 3: "keep-me"}

    def test_cut_at_edges(self, spark):
        # span at position 0 and span touching the end
        spans = spark.createDataFrame(
            [(1, 0, 3, 1), (1, 8, 10, 1)],
            "doc_id long, span_start long, span_end long, n_grams long",
        )
        df = _docs(spark, [(1, "0123456789")])
        out = remove_dup_spans(df, spans).collect()[0]
        assert out.clean_text == "34567"

    def test_whole_doc_removed(self, spark):
        spans = spark.createDataFrame(
            [(1, 0, 4, 1)],
            "doc_id long, span_start long, span_end long, n_grams long",
        )
        df = _docs(spark, [(1, "abcd")])
        assert remove_dup_spans(df, spans).collect()[0].clean_text == ""


class TestStratifiedSample:
    def _corpus(self, spark, n=300):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("lang"),
        )

    def test_exact_n_per_stratum(self, spark):
        df = self._corpus(spark)
        out = stratified_sample(df, ["lang"], 7, "doc_id")
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"0": 7, "1": 7, "2": 7}

    def test_prefilter_matches_naive(self, spark):
        df = self._corpus(spark)
        fast = stratified_sample(df, ["lang"], 9, "doc_id", prefilter=True)
        naive = stratified_sample(df, ["lang"], 9, "doc_id", prefilter=False)
        assert sorted(fast.collect()) == sorted(naive.collect())

    def test_small_stratum_takes_all(self, spark):
        # a stratum smaller than n returns all its rows
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
        )
        out = stratified_sample(df, ["lang"], 5, "doc_id")
        assert out.count() == 3

    def test_fallback_on_tight_safety(self, spark):
        # safety=1.0 makes the prefilter cut close to the bone; the
        # per-stratum fallback must still deliver the exact rows
        df = self._corpus(spark, n=90)
        fast = stratified_sample(df, ["lang"], 25, "doc_id", safety=1.0)
        naive = stratified_sample(df, ["lang"], 25, "doc_id", prefilter=False)
        assert sorted(fast.collect()) == sorted(naive.collect())

    def test_deterministic_across_runs(self, spark):
        df = self._corpus(spark)
        a = sorted(stratified_sample(df, ["lang"], 5, "doc_id").collect())
        b = sorted(stratified_sample(df, ["lang"], 5, "doc_id").collect())
        assert a == b


class TestSpanProperties:
    def test_partition_property(self, spark):
        # spans + clean text partition each doc: lengths add up and
        # clean_text is the original with exactly the spans excised
        import random

        rng = random.Random(7)
        rows = [
            (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 60))))
            for i in range(12)
        ]
        df = _docs(spark, rows)
        spans = dup_spans(df, length=8)
        cleaned = {r.doc_id: r.clean_text for r in remove_dup_spans(df, spans).collect()}
        span_by_doc = {}
        for r in spans.collect():
            span_by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        for doc_id, text in rows:
            got = cleaned[doc_id]
            sp = sorted(span_by_doc.get(doc_id, []))
            for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
                assert e1 < s2  # disjoint and ordered
            removed = sum(e - s for s, e in sp)
            assert len(got) == len(text) - removed
            keep, cur = [], 0
            for s, e in sp:
                keep.append(text[cur:s])
                cur = e
            keep.append(text[cur:])
            assert got == "".join(keep)

    def test_every_span_is_genuinely_duplicated(self, spark):
        import random

        rng = random.Random(13)
        rows = [
            (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 50))))
            for i in range(10)
        ]
        df = _docs(spark, rows)
        texts = dict(rows)
        L = 6
        def occurrences(gram):
            return sum(
                txt[q : q + L] == gram
                for txt in texts.values()
                for q in range(max(0, len(txt) - L + 1))
            )

        for r in dup_spans(df, length=L).collect():
            # a merged span is the UNION of duplicated windows: every
            # char position must be covered by at least one window
            # whose gram occurs >= 2 times corpus-wide (interior
            # windows of the union need not themselves be duplicated)
            t = texts[r.doc_id]
            dup_starts = [
                q
                for q in range(r.span_start, r.span_end - L + 1)
                if occurrences(t[q : q + L]) >= 2
            ]
            assert dup_starts, (r.doc_id, r.span_start, r.span_end)
            covered = set()
            for q in dup_starts:
                covered.update(range(q, q + L))
            assert set(range(r.span_start, r.span_end)) <= covered


class TestSamplingProperty:
    def test_counts_equal_min_n_size(self, spark):
        import random
        from collections import Counter

        rng = random.Random(3)
        rows = [(i, rng.choice(["x", "y", "z", "w"])) for i in range(137)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        sizes = Counter(lang for _, lang in rows)
        out = stratified_sample(df, ["lang"], 11, "doc_id")
        got = Counter(r.lang for r in out.collect())
        assert got == Counter({k: min(11, v) for k, v in sizes.items()})
