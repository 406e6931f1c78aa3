"""The minimum end-to-end slice (SURVEY §7): clicks-per-region.

stream(userClicks) ⋈ table(userRegions latest-per-key) → re-key by region →
sum(clicks). Golden: americas=101, europe=109, asia=124
(StreamToTableJoinTestData.scala:55-59) — alice's 53 clicks must land in
europe (latest region wins over the earlier 'asia' record).
"""

from pyspark.sql import functions as F

from kafka_streams_demo_spark import KStream, KTable
from kafka_streams_demo_spark.sources import fixtures


def test_clicks_per_region_golden(spark):
    clicks = KStream(fixtures.user_clicks(spark))
    regions = KTable.from_stream(KStream(fixtures.user_regions(spark)))

    # join: value = (clicks, region); re-key by region; sum clicks
    enriched = clicks.join(regions, lambda c, r: F.struct(c.alias("clicks"), r.alias("region")))
    per_region = (
        enriched.group_by(lambda k, v: v["region"])
        .aggregate(lambda v: F.sum(v["clicks"]))
    )

    got = {r["key"]: r["value"] for r in per_region.to_df().collect()}
    assert got == fixtures.EXPECTED_CLICKS_PER_REGION


def test_ktable_latest_per_key_update(spark):
    regions = KTable.from_stream(KStream(fixtures.user_regions(spark)))
    got = {r["key"]: r["value"] for r in regions.to_df().collect()}
    assert got["alice"] == "europe"  # asia→europe update resolved
    assert len(got) == 6


def test_word_count_golden(spark):
    lines = KStream(fixtures.text_lines(spark))
    counts = (
        lines.flat_map_values(lambda v: F.split(F.lower(v), r"\W+"))
        .group_by(lambda k, v: v)
        .count()
    )
    got = {r["key"]: r["value"] for r in counts.to_df().collect()}
    assert got == fixtures.EXPECTED_WORD_COUNTS
