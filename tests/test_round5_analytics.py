"""Semantic properties of the round-5 analytics batch: BWT
invertibility, de Bruijn edge conservation, PWM argmax optimality,
Gini bounds, lag-correlation moment identities."""

from pyspark.sql import functions as F

from pygr_spark.queries import (
    _t,
    q_bwt_transform,
    q_debruijn_degrees,
    q_lag_correlation,
    q_pwm_scan,
    q_spend_gini,
)


def _inverse_bwt_rows(bwt: str) -> list[str]:
    """O(n^2) textbook inverse (sort, prepend, repeat): returns the
    sorted rotation table; the original string is one of the rows."""
    rows = [""] * len(bwt)
    for _ in range(len(bwt)):
        rows = sorted(b + r for b, r in zip(bwt, rows))
    return rows


def test_bwt_is_invertible_up_to_rotation(spark, sf_dir):
    out = {r.doc_id: r.bwt for r in q_bwt_transform(spark, sf_dir).collect()}
    seqs = {
        r.doc_id: r.seq
        for r in _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(F.lower("text"), "[^acgt]", "").alias("seq"),
        )
        .filter(F.length("seq").between(2, 512))
        .collect()
    }
    assert set(out) == set(seqs)
    checked = 0
    for doc_id, bwt in sorted(out.items())[:5]:
        seq = seqs[doc_id]
        assert len(bwt) == len(seq)
        assert sorted(bwt) == sorted(seq)  # BWT is a permutation
        assert seq in _inverse_bwt_rows(bwt)
        checked += 1
    assert checked > 0


def test_debruijn_edges_conserve(spark, sf_dir):
    df = q_debruijn_degrees(spark, sf_dir).toPandas()
    # every edge leaves one node and enters one: totals match, and
    # imbalances cancel globally
    assert df.out_n.sum() == df.in_n.sum()
    assert df.imbalance.sum() == 0
    assert (df.node.str.len() == 3).all()
    assert len(df) <= 64


def test_pwm_best_beats_fixed_position(spark, sf_dir):
    """The reported best score must be >= the score at position 1
    (any fixed site is a lower bound on the argmax)."""
    from pygr_spark.queries import _PWM

    best = {r.doc_id: r.best_score for r in q_pwm_scan(spark, sf_dir).collect()}
    seqs = {
        r.doc_id: r.seq
        for r in _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(F.lower("text"), "[^acgt]", "").alias("seq"),
        )
        .filter(F.length("seq") >= 6)
        .collect()
    }
    for doc_id, seq in seqs.items():
        s1 = sum(_PWM[p][seq[p]] for p in range(6))
        assert best[doc_id] >= s1


def test_gini_bounds_and_den(spark, sf_dir):
    df = q_spend_gini(spark, sf_dir).toPandas()
    assert (df.gini_num >= 0).all()          # sorted ascending => nonneg
    assert (df.gini_num <= df.gini_den).all()  # G <= 1
    assert (df.gini_den == df.n_cust * df.sum_cents).all()


def test_lag_correlation_moments(spark, sf_dir):
    """Cauchy-Schwarz: num^2 <= den_x * den_y (|corr| <= 1), and the
    zero-lag row exists with the largest sample count window."""
    df = q_lag_correlation(spark, sf_dir).toPandas()
    assert set(df.lag) == set(range(-3, 4))
    assert ((df.num.astype("float64") ** 2)
            <= (df.den_x.astype("float64") * df.den_y.astype("float64")) * (1 + 1e-12)).all()
