"""Text analysis functions: tokenization, lang-id, quality, fingerprints."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.text import (
    fingerprint_bow,
    lang_id,
    quality_score,
    rolling_hash,
    token_count_bpe,
    token_count_ws,
    tokenize,
    word_shingles,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, "a b c", token_count_ws(F.col("text"))) == 3
    # BPE-ish: alpha runs + single digits + punct
    assert _one(spark, "ab 12 c!", token_count_bpe(F.col("text"))) == 5  # ab,1,2,c,!


def test_lang_id_markers_and_tiebreak(spark):
    assert _one(spark, "the cat and the dog", lang_id(F.col("text"))) == "en"
    assert _one(spark, "el perro y la casa de los gatos", lang_id(F.col("text"))) == "es"
    assert _one(spark, "der hund und die katze", lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh foo", lang_id(F.col("text"))) == "und"
    # tie: 'the' (en) vs 'le' (fr) 1-1 → first list wins
    assert _one(spark, "the le", lang_id(F.col("text"))) == "en"


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the a of and to in is it for on", 30),
         (2, "zz", 2)],
        "doc_id long, text string, n_chars long",
    )
    rows = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", quality_score(F.col("text"), F.col("n_chars")).alias("s")).collect()}
    assert 0.0 <= rows[2] < rows[1] <= 1.0


def test_fingerprint_bow_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", fingerprint_bow(F.col("text")))
    b = _one(spark, "gamma alpha beta", fingerprint_bow(F.col("text")))
    c = _one(spark, "alpha beta delta", fingerprint_bow(F.col("text")))
    assert a == b and a != c


def test_rolling_hash_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", rolling_hash(F.col("text")))
    b = _one(spark, "gamma alpha beta", rolling_hash(F.col("text")))
    c = _one(spark, "alpha beta gamma", rolling_hash(F.col("text")))
    assert a == c and a != b
    from kafka_streams_demo_spark.functions.text import ROLLING_HASH_MOD
    assert 0 <= a < ROLLING_HASH_MOD


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles(tokenize(F.col("text")), 3))
    assert got == ["a_b_c", "b_c_d"]
    assert _one(spark, "a b", word_shingles(tokenize(F.col("text")), 3)) == []


def test_winnow_fingerprints_guarantee_and_bounds(spark):
    """Winnowing invariants: two docs sharing a k+w-1 = 7-token run share
    ≥1 fingerprint; fingerprints ⊆ k-gram hashes; docs under k+w-1
    tokens yield none; disjoint docs share none."""
    from kafka_streams_demo_spark.functions.text import winnow_fingerprints

    shared = "one two three four five six seven"
    fp = lambda text: set(  # noqa: E731
        _one(spark, text, winnow_fingerprints(tokenize(F.col("text"))))
    )
    a = fp(f"prefix words here {shared} tail a")
    b = fp(f"other start {shared} different ending words")
    assert a & b, "7-token shared run must share a fingerprint"
    assert fp("short doc only") == set()
    c = fp("totally disjoint vocabulary nothing matches at all here now")
    assert not (a & c)


def test_char_entropy_golden_values(spark):
    """Known distributions: uniform 2 symbols → 1 bit, uniform 4 → 2 bits,
    single symbol → 0, empty → 0 (guard)."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa"), (4, "")],
        "doc_id long, text string",
    )
    arr = docs.select(
        "doc_id", F.array_sort(F.split(F.col("text"), "")).alias("_cs")
    ).select(
        "doc_id", "_cs",
        # split("") yields [""] — count only real characters
        F.size(F.filter("_cs", lambda c: c != F.lit(""))).alias("_n"),
    )
    got = {r["doc_id"]: r["e"] for r in arr.select(
        "doc_id", char_entropy(F.filter("_cs", lambda c: c != F.lit("")), F.col("_n")).alias("e")
    ).collect()}
    assert got[1] == 1.0
    assert got[2] == 2.0
    assert got[3] == 0.0
    assert got[4] == 0.0
