"""Round-3 wave 22 (session closer): the hour-of-day demand profile
and cross-source duplicate flow — capacity planning and scraper-
overlap attribution.

Determinism contract unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import text as TX
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ev_hourly_profile — hour-of-day demand shape
# ---------------------------------------------------------------------------


def ev_hourly_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day demand profile per event type with each type's
    peak hour flagged — the capacity-planning heatmap
    (`ts_weekday_index` is the weekly-grain sibling). Peak selection
    is a deterministic (count desc, hour asc) rank at the 24×|types|
    grain; share = count / type total, integers until the one
    division."""
    ev = load_table(spark, sf, "events").select(
        "event_type", F.hour("ts").alias("hr")
    )
    g = ev.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("n"))
    tot = g.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    wpeak = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hr"))
    return (
        g.withColumn("rk", F.row_number().over(wpeak))
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("hr").cast("int").alias("hr"),
            "n",
            F.round(F.col("n") / F.col("n_type").cast("double"), 6).alias("share"),
            (F.col("rk") == 1).cast("int").alias("is_peak"),
        )
        .orderBy("event_type", "hr")
    )


_EV_HOURLY_SQL = """
WITH g AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type FROM g GROUP BY 1),
rk AS (
  SELECT g.*, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, hr ASC) AS rk
  FROM g
)
SELECT rk.event_type, rk.hr, CAST(rk.n AS BIGINT) AS n,
       ROUND(CAST(rk.n AS DOUBLE) / tot.n_type, 6) AS share,
       CAST(rk.rk = 1 AS INTEGER) AS is_peak
FROM rk JOIN tot USING (event_type)
"""


# ---------------------------------------------------------------------------
# dd_cross_source_dups — scraper-overlap attribution
# ---------------------------------------------------------------------------


def dd_cross_source_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source duplicate flow: for every source pair, how many
    canonical fingerprints appear in BOTH — the attribution table
    that says which sources copy from each other (scraper overlap,
    mirror sites), where `tx_datacard` only counts duplicate pressure
    within a source and `dd_exact_dup_groups` doesn't say WHERE dups
    come from.

    Per-fingerprint fan-out is the distinct-source list, bounded by
    the source-domain size squared (a catalog constant); the pair
    enumeration joins the fingerprint-grain relation to itself on the
    fingerprint key — an equi join, never a cartesian. The
    source-pair SKELETON (sources × sources, catalog-bounded) keeps
    zero-overlap pairs in the output — 'no leakage between A and B'
    is a finding, not a missing row."""
    fp = (
        load_table(spark, sf, "documents")
        .select("source", TX.fingerprint("text").alias("fp"))
        .distinct()
    )
    shared = (
        fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    srcs = fp.select("source").distinct()
    skeleton = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("source_b"))),
            F.col("source_a") < F.col("source_b"),
        )
    )
    return (
        skeleton.join(shared, ["source_a", "source_b"], "left")
        .withColumn("shared_fps", F.coalesce("shared_fps", F.lit(0)))
        .orderBy(F.desc("shared_fps"), "source_a", "source_b")
    )


_DD_XSRC_SQL = r"""
WITH fp AS (
  SELECT DISTINCT source,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared_fps
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
),
srcs AS (SELECT DISTINCT source FROM fp)
SELECT x.source AS source_a, y.source AS source_b,
       COALESCE(s.shared_fps, 0) AS shared_fps
FROM srcs x JOIN srcs y ON x.source < y.source
LEFT JOIN shared s ON s.source_a = x.source AND s.source_b = y.source
"""


QUERIES = {
    "ev_hourly_profile": ev_hourly_profile,
    "dd_cross_source_dups": dd_cross_source_dups,
}

ORACLES = {
    "ev_hourly_profile": _EV_HOURLY_SQL,
    "dd_cross_source_dups": _DD_XSRC_SQL,
}
