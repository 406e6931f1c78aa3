"""Bloom filter: no false negatives, bounded false positives, and the
contamination_check prefilter actually shrinks the verification join."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.bloom import bloom_build, bloom_might_contain
from kafka_streams_demo_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(spark):
    vals = spark.range(5000).selectExpr("concat('v', id) AS s")
    bitmap = bloom_build(vals, "s")
    kept = vals.filter(bloom_might_contain(bitmap, F.col("s"))).count()
    assert kept == 5000


def test_bloom_false_positive_rate_bounded(spark):
    member = spark.range(5000).selectExpr("concat('v', id) AS s")
    bitmap = bloom_build(member, "s")
    disjoint = spark.range(20000).selectExpr("concat('x', id) AS s")
    fp = disjoint.filter(bloom_might_contain(bitmap, F.col("s"))).count()
    # 2^20 bits / 5k items / 5 hashes → theoretical fpp ≈ 1e-8; allow slack
    assert fp / 20000 < 0.01


def test_bloom_build_is_idempotent_over_duplicates(spark):
    """bit_or makes duplicate inserts free: bitmap over a duplicated input
    equals the bitmap over its distinct set (no distinct shuffle needed
    on the build path)."""
    vals = spark.range(1000).selectExpr("concat('v', id % 100) AS s")
    assert bloom_build(vals, "s") == bloom_build(vals.distinct(), "s")


def test_contamination_prefilter_shrinks_train_side(spark):
    """The eval-side bloom must shrink the train shingle stream entering
    the distinct+verification join (the 100 TB bottleneck): train-only
    shingles are dropped map-side."""
    from kafka_streams_demo_spark.functions.dedup import doc_shingle_sets

    docs = load_table(spark, "documents", SF)
    sh = doc_shingle_sets(docs, n=3).select("doc_id", F.explode("shset").alias("s"))
    ev = sh.filter(F.col("doc_id") % 2 == 1)
    tr_raw = sh.filter(F.col("doc_id") % 2 == 0).select("s")
    bitmap = bloom_build(ev.select("s"), "s")
    pre = tr_raw.filter(bloom_might_contain(bitmap, F.col("s"))).count()
    raw = tr_raw.count()
    assert pre < raw * 0.8, f"prefilter kept {pre}/{raw} train shingles"
    # and everything the exact join needs survives: prefiltered ∩ eval set
    # equals raw ∩ eval set
    tr_pre = tr_raw.filter(bloom_might_contain(bitmap, F.col("s"))).distinct()
    exact_pre = ev.join(tr_pre, "s").count()
    exact_raw = ev.join(tr_raw.distinct(), "s").count()
    assert exact_pre == exact_raw
