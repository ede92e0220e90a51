from pygr_spark.operators.textstats import (
    fingerprint,
    language_scores,
    quality_score,
    token_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox, and the lazy dog."),
            (2, "der hund und die katze ist nicht da"),
            (3, "xyzzy plugh"),
            (4, "   "),
        ],
        ["doc_id", "text"],
    )


def test_token_stats(spark):
    out = {r.doc_id: r for r in token_stats(_docs(spark)).collect()}
    assert 4 not in out  # whitespace-only filtered
    r = out[1]
    assert r.n_tokens == 8
    assert r.n_types == 7  # 'the' twice (lowercased)
    assert r.mean_token_len == r.sum_token_len / r.n_tokens


def test_quality_score(spark):
    r = {x.doc_id: x for x in quality_score(_docs(spark)).collect()}[1]
    assert r.n_punct == 2  # comma + period
    assert r.longest_token >= 5


def test_language_scores(spark):
    out = {r.doc_id: r for r in language_scores(_docs(spark)).collect()}
    assert out[1].lang_guess == "en"
    assert out[2].lang_guess == "de"
    assert out[3].lang_guess == "und"


def test_fingerprint_deterministic(spark):
    a = {r.doc_id: r.fingerprint for r in fingerprint(_docs(spark)).collect()}
    b = {r.doc_id: r.fingerprint for r in fingerprint(_docs(spark)).collect()}
    assert a == b
    assert a[1] != a[2]
    assert all(0 <= v < 1_000_000_007 for v in a.values())
