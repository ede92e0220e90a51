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


def test_tfidf_top_terms(spark):
    from pygr_spark.operators.textstats import TFIDF_SCALE, tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared"),
            (3, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2 and shared df=3
    assert rows[(1, 1)].term == "apple"
    assert rows[(1, 1)].score == 2 * ((3 * TFIDF_SCALE) // 1)
    # doc 3: cherry tf=3 df=2 ranks above shared tf=1 df=3
    assert rows[(3, 1)].term == "cherry"
    assert rows[(3, 2)].term == "shared"
    # exactly k rows per doc
    assert sorted(k for k in rows) == [(d, r) for d in (1, 2, 3) for r in (1, 2)]


def test_keyword_search_topk(spark):
    from pygr_spark.operators.textstats import TFIDF_SCALE, keyword_search_topk

    docs = spark.createDataFrame(
        [
            (1, "spark engine spark"),
            (2, "spark rows"),
            (3, "engine of rows"),
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "spark"), (1, "engine"), (2, "rows")],
        "query_id long, term string",
    )
    out = {(r.query_id, r.rank): r for r in keyword_search_topk(docs, queries, k=2).collect()}
    # q1: doc1 has spark tf=2 (df=2) + engine tf=1 (df=2): score = 2*2e6 + 1*2e6
    idf2 = (4 * TFIDF_SCALE) // 2
    assert out[(1, 1)].doc_id == 1 and out[(1, 1)].score == 3 * idf2
    assert out[(1, 2)].doc_id == 2  # spark only, ties broken by doc_id? score 1*idf2
    # q2: docs 2 and 3 tie on rows (tf=1) -> doc_id ascending
    assert out[(2, 1)].doc_id == 2 and out[(2, 2)].doc_id == 3
    # doc 4 never appears
    assert all(r.doc_id != 4 for r in out.values())


def test_fingerprint_deterministic(spark):
    a = {r.doc_id: r.fingerprint for r in fingerprint(_docs(spark)).collect()}
    b = {r.doc_id: r.fingerprint for r in fingerprint(_docs(spark)).collect()}
    assert a == b
    assert a[1] != a[2]
    assert all(0 <= v < 1_000_000_007 for v in a.values())
