"""Round-4 wave 41: banded near-dup detection on binary payloads,
top converting event paths, and Kendall's tau-b rank correlation.

Determinism contract: band signatures are md5 slices over hex-rendered
payload quarters (pure string ops, identical in both engines); path
counts are exact integers under per-user windows with a total
(sec, event_id) tiebreak; tau-b is one fixed double over exact int64
concordance counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import multimodal
from movie_data_etl_pipeline_spark.plans import _hints
from movie_data_etl_pipeline_spark.sources import load_table

_MM_BANDS = 4
_MM_MIN_SHARED = 2
_PATH_TOP = 20


_MM_WIN_HEX = 128  # 64-byte windows rendered as 128 hex chars


def mm_band_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Banded near-duplicate detection over the multimodal asset
    store's raw BYTES (the perceptual-hash stage CAS dedup can't do,
    run before any codec decode): each payload is hex-rendered and its
    first four FIXED-OFFSET 64-byte windows are md5-banded (absolute
    anchors, so append/suffix edits — the dominant near-dup mode in
    the corpus — preserve every window before the edit point); assets
    sharing ≥2 band hashes are candidate near-dups. Candidates come
    from banded equality joins — the MinHash-LSH shape, never
    all-pairs — and the result is the bounded pair profile (pairs +
    id checksums per shared-band count). Reference: the CAS twin is
    `mm_content_dedup`; this is its similarity sibling on undecodable
    payloads."""
    assets = multimodal.synthesize_assets(load_table(spark, sf, "documents"))
    hx = assets.select(
        F.col("asset_id"),
        F.hex(F.col("payload")).alias("hx"),
    ).withColumn("hlen", F.length("hx"))
    hx = hx.filter(F.col("hlen") >= _MM_MIN_SHARED * _MM_WIN_HEX)
    bands = (
        hx.select(
            "asset_id",
            F.explode(
                F.array(
                    *[
                        F.when(
                            F.col("hlen") >= (i + 1) * _MM_WIN_HEX,
                            F.struct(
                                F.lit(i).cast("bigint").alias("band"),
                                F.md5(
                                    F.substring(
                                        "hx", 1 + i * _MM_WIN_HEX, _MM_WIN_HEX
                                    ).cast("binary")
                                ).alias("sig"),
                            ),
                        )
                        for i in range(_MM_BANDS)
                    ]
                )
            ).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .select("asset_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig"))
    )
    a = bands.select(F.col("asset_id").alias("ida"), "band", "sig")
    b = bands.select(F.col("asset_id").alias("idb"), "band", "sig")
    pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
        .filter(F.col("shared") >= _MM_MIN_SHARED)
    )
    return (
        pairs.groupBy("shared")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("ida") + F.col("idb")).cast("bigint").alias("checksum"),
        )
        .orderBy("shared")
    )


_MM_BAND_SQL = f"""
WITH hx AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         length(hex(encode(text))) AS hlen
  FROM documents
  WHERE length(hex(encode(text))) >= {_MM_MIN_SHARED * _MM_WIN_HEX}
),
bands AS (
  SELECT asset_id, i AS band,
         md5(substring(hx, 1 + i * {_MM_WIN_HEX}, {_MM_WIN_HEX})) AS sig
  FROM hx CROSS JOIN (SELECT unnest(range({_MM_BANDS})) AS i)
  WHERE hlen >= (i + 1) * {_MM_WIN_HEX}
),
pairs AS (
  SELECT a.asset_id AS ida, b.asset_id AS idb, COUNT(*)::BIGINT AS shared
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.sig = b.sig
             AND a.asset_id < b.asset_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MM_MIN_SHARED}
)
SELECT shared, COUNT(*)::BIGINT AS n_pairs,
       CAST(SUM(ida + idb) AS BIGINT) AS checksum
FROM pairs
GROUP BY shared
ORDER BY shared
"""


def ev_trigram_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top consecutive 3-step event-type paths: per-user event stream
    ordered by (epoch second, event_id) — a TOTAL order, so lead() is
    deterministic under same-second bursts — emits each sliding
    triple; paths rank by occurrence count with distinct-user reach,
    top-20 via distributed TakeOrderedAndProject. The n-gram
    generalization of `ev_transitions`' Markov pairs."""
    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    tri = (
        ev.withColumn("t1", F.lead("event_type", 1).over(w))
        .withColumn("t2", F.lead("event_type", 2).over(w))
        .filter(F.col("t2").isNotNull())
        .select(
            "user_id",
            F.concat_ws(">", "event_type", "t1", "t2").alias("path"),
        )
    )
    counted = tri.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )
    return counted.orderBy(F.desc("n_occurrences"), F.asc("path")).limit(_PATH_TOP)


_EV_PATHS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
  FROM events
),
tri AS (
  SELECT user_id,
         event_type || '>' ||
         lead(event_type, 1) OVER w || '>' ||
         lead(event_type, 2) OVER w AS path,
         lead(event_type, 2) OVER w AS t2
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
)
SELECT path, COUNT(*)::BIGINT AS n_occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM tri
WHERE t2 IS NOT NULL
GROUP BY path
ORDER BY n_occurrences DESC, path
LIMIT {_PATH_TOP}
"""


def ag_kendall_tau(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall's tau-b between daily order volume and daily revenue
    (day-grain series from one lineitem scan): concordant, discordant,
    and tied pair counts accumulated as exact int64 over the bounded
    day×day pair enumeration (the `ag_theil_sen` shape — metadata
    grain, not fact grain), then tau-b = (C−D)/√((n0−Tx)(n0−Ty)) as
    ONE fixed double expression. The rank-correlation robustness twin
    of `ag_corr_matrix`'s Pearson."""
    li = load_table(spark, sf, "lineitem")
    days = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x"),
        F.sum(SC.cents("l_extendedprice")).cast("bigint").alias("y"),
    )
    a = days.select(F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = days.select(F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    # calendar-grain bound: one row per l_shipdate (~2.5k days) at ANY
    # fact scale — pin the broadcast the r8 flip-off removed (VERDICT-r8 #5).
    pairs = a.join(_hints.bounded_broadcast(b), F.col("da") < F.col("db"))
    sx = F.signum((F.col("xb") - F.col("xa")).cast("double")).cast("bigint")
    sy = F.signum((F.col("yb") - F.col("ya")).cast("double")).cast("bigint")
    counts = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum((sx * sy == 1).cast("bigint")).cast("bigint").alias("c"),
        F.sum((sx * sy == -1).cast("bigint")).cast("bigint").alias("d"),
        F.sum((sx == 0).cast("bigint")).cast("bigint").alias("tx"),
        F.sum((sy == 0).cast("bigint")).cast("bigint").alias("ty"),
    )
    return counts.select(
        "n0",
        "c",
        "d",
        "tx",
        "ty",
        (
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(
                ((F.col("n0") - F.col("tx")) * (F.col("n0") - F.col("ty"))).cast(
                    "double"
                )
            )
        ).alias("tau_b"),
    )


_AG_KENDALL_SQL = """
WITH days AS (
  SELECT l_shipdate AS d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
pairs AS (
  SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
  FROM days a JOIN days b ON a.d < b.d
),
counts AS (
  SELECT COUNT(*)::BIGINT AS n0,
         CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pairs
)
SELECT n0, c, d, tx, ty,
       CAST(c - d AS DOUBLE)
         / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)) AS tau_b
FROM counts
"""


QUERIES = {
    "mm_band_near_dup": mm_band_near_dup,
    "ev_trigram_paths": ev_trigram_paths,
    "ag_kendall_tau": ag_kendall_tau,
}

ORACLES = {
    "mm_band_near_dup": _MM_BAND_SQL,
    "ev_trigram_paths": _EV_PATHS_SQL,
    "ag_kendall_tau": _AG_KENDALL_SQL,
}
