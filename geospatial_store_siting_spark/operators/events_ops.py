"""Event-stream operators over the ``events`` table.

Batch-mode implementations of the streaming-shaped computations (tumbling
windows, sessionization, funnel ordering); the same logic runs as a real
Structured Streaming job in streaming/stream_jobs.py (memory-sink smoke
tested) — batch and streaming share window semantics, so the oracle checks
the batch twin.

Portability notes: tumbling buckets are epoch-floor arithmetic (not
engine-specific date_trunc variants); timestamps are compared as epoch
seconds; session gaps via lag() + conditional cumsum (W-functions exist in
both engines with identical semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exprs import dround

WINDOW_SEC = 300  # 5-minute tumbling
SESSION_GAP_SEC = 1800  # 30-minute inactivity gap


def tumbling_counts(spark: SparkSession) -> DataFrame:
    """5-minute tumbling window counts/sums per event_type (the batch twin
    of the streaming groupBy(window(ts, '5 minutes')))."""
    ev = spark.table("events")
    bucket = (F.unix_timestamp("ts") / WINDOW_SEC).cast("long") * WINDOW_SEC
    return (
        ev.groupBy(bucket.alias("window_start_epoch"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def tumbling_counts_oracle_sql() -> str:
    return f"""
SELECT CAST(FLOOR(EPOCH(ts) / {WINDOW_SEC}) AS BIGINT) * {WINDOW_SEC} AS window_start_epoch,
       event_type,
       COUNT(*) AS n_events,
       (FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2"""


def sessionize(spark: SparkSession) -> DataFrame:
    """Sessionization: per-user sessions split on >30-min gaps (lag + gap
    flag + running sum — the classic W-function plan), aggregated to one
    row per session."""
    ev = spark.table("events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ets"), "event_type", "value"
    )
    # event_id tiebreaker: ties in ets would make lag() nondeterministic
    # at larger SF (running_totals already orders the same way).
    w = Window.partitionBy("user_id").orderBy("ets", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("ets") - F.lag("ets").over(w)) > SESSION_GAP_SEC, 1
        ).otherwise(0),
    ).withColumn(
        "sess_idx", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy("user_id", "sess_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ets") - F.min("ets")).alias("duration_sec"),
            dround(F.sum("value"), 4).alias("session_value"),
        )
    )


def sessionize_oracle_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ets, event_type, value FROM events
),
flagged AS (
  SELECT user_id, event_id, ets, value,
         CASE WHEN ets - LAG(ets) OVER (PARTITION BY user_id ORDER BY ets, event_id) > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
),
sess AS (
  SELECT user_id, ets, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ets, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
  FROM flagged
)
SELECT user_id, sess_idx,
       COUNT(*) AS n_events,
       MAX(ets) - MIN(ets) AS duration_sec,
       (FLOOR((SUM(value)) * 10000.0 + 0.5) / 10000.0) AS session_value
FROM sess
GROUP BY user_id, sess_idx"""


def event_type_funnel(spark: SparkSession) -> DataFrame:
    """Per-user first-occurrence ordering of event types (funnel step
    detection): earliest signup→purchase conversion lag."""
    ev = spark.table("events").select("user_id", "event_type", F.unix_timestamp("ts").alias("ets"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ets"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ets"))).alias("first_purchase"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return firsts.select(
        "user_id",
        "n_events",
        (F.col("first_purchase") - F.col("first_signup")).alias("signup_to_purchase_sec"),
        (
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
        ).alias("converted"),
    )


def event_type_funnel_oracle_sql() -> str:
    return """
SELECT user_id, n_events,
       first_purchase - first_signup AS signup_to_purchase_sec,
       (first_signup IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase > first_signup) AS converted
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) END) AS first_purchase,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
) __f"""


def json_props_extract(spark: SparkSession) -> DataFrame:
    """JSON-in-string extraction (the reference's shap_top5 pattern,
    `notebooks/13_score_candidates.py:133` / `app/main.py:204`):
    get_json_object → typed column → aggregate."""
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def json_props_extract_oracle_sql() -> str:
    return """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type"""


def running_totals(spark: SparkSession) -> DataFrame:
    """Per-user running event totals — an explicit rowsBetween frame
    (unbounded-preceding cumulative sum ordered by event time)."""
    ev = spark.table("events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ets"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        dround(F.sum("value").over(w), 4).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


def running_totals_oracle_sql() -> str:
    return """
SELECT user_id, event_id,
       (FLOOR((SUM(value) OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0)
           AS running_value,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
FROM events"""


def asof_last_view(
    spark: SparkSession, left_type: str = "purchase", right_type: str = "view"
) -> DataFrame:
    """AS-OF join: each LEFT event (purchase) picks the SAME USER's most
    recent RIGHT event (view) STRICTLY before it — the time-series point
    lookup Spark has no built-in operator for.

    Plan: one shuffle.  Both streams union into a single user_id-hash
    partitioning, sorted by (event time, kind, id) within the partition; a
    rows-frame ``last(ignorenulls)`` over the strictly-preceding rows
    carries the latest right-side ref forward.  No range join (O(n·m)
    candidate blowup), no per-key collect — the classic distributed
    merge-asof, and the sort reuses the shuffle's partitioning.  Strict
    semantics: at an equal timestamp the left row orders FIRST (kind 0 <
    kind 1), so a same-instant right event is NOT matched — this matches
    the oracle's ``l.ets > r.ets`` ASOF predicate exactly.

    The DuckDB oracle is an INDEPENDENT recomputation via its native
    ``ASOF LEFT JOIN`` (merge-join implementation), not a transliteration
    of this window plan.
    """
    ev = spark.table("events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ets"),
        "event_type",
        "value",
    )
    both = ev.filter(F.col("event_type").isin([left_type, right_type]))
    both = both.withColumn(
        "__kind",
        F.when(F.col("event_type") == right_type, F.lit(1)).otherwise(F.lit(0)),
    )
    ref = F.when(
        F.col("event_type") == right_type,
        F.struct(
            F.col("event_id").alias("vid"),
            F.col("ets").alias("vets"),
            F.col("value").alias("vval"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "__kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = both.withColumn("__last", F.last(ref, ignorenulls=True).over(w))
    return matched.filter(F.col("event_type") == left_type).select(
        F.col("event_id").alias(f"{left_type}_event_id"),
        "user_id",
        F.col("ets").alias(f"{left_type}_epoch_us"),
        F.col("value").alias(f"{left_type}_value"),
        F.col("__last.vid").alias(f"{right_type}_event_id"),
        F.col("__last.vval").alias(f"{right_type}_value"),
        (F.col("ets") - F.col("__last.vets")).alias("micros_since"),
    )


def asof_last_view_oracle_sql(
    left_type: str = "purchase", right_type: str = "view"
) -> str:
    """Deterministic merge-asof twin.  DuckDB's native ASOF JOIN picks an
    ARBITRARY right row when two share the maximal earlier ets, while the
    Spark window plan deterministically picks the max event_id — so the
    oracle uses an explicit ROW_NUMBER formulation (max ets, then max
    event_id) that agrees with the engine even on duplicate-(user, ts)
    right-side events."""
    return f"""
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ets, value
           FROM events WHERE event_type = '{left_type}'),
     r AS (SELECT event_id, user_id, epoch_us(ts) AS ets, value
           FROM events WHERE event_type = '{right_type}'),
m AS (
  SELECT l.event_id AS lid, r.event_id AS rid, r.value AS rval, r.ets AS rets,
         ROW_NUMBER() OVER (PARTITION BY l.event_id
                            ORDER BY r.ets DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id AND l.ets > r.ets
)
SELECT l.event_id AS {left_type}_event_id,
       l.user_id,
       l.ets AS {left_type}_epoch_us,
       l.value AS {left_type}_value,
       m.rid AS {right_type}_event_id,
       m.rval AS {right_type}_value,
       l.ets - m.rets AS micros_since
FROM l LEFT JOIN m ON l.event_id = m.lid AND m.rn = 1"""


# Deterministic maintenance-window dimension for the interval join: 256
# windows of 90 min every 4 h from 2024-01-01 — both engines derive the
# same table from a range() generator (no external data).
INTERVAL_T0 = 1704067200  # epoch of 2024-01-01 00:00:00 UTC
INTERVAL_EVERY_SEC = 14400
INTERVAL_LEN_SEC = 5400
INTERVAL_N = 256
INTERVAL_BUCKET_SEC = 3600


def interval_join(spark: SparkSession) -> DataFrame:
    """Interval (range) join: events ↔ overlapping time windows, via
    BUCKETED equi-join — the scale pattern for range predicates.

    A naive ``ev JOIN w ON ets >= start AND ets < end`` has no equi key,
    so Spark plans BroadcastNestedLoopJoin — O(|events|·|windows|)
    comparisons and a mandatory broadcast.  Instead both sides are mapped
    to coarse time buckets (windows explode into the few buckets they
    cover via ``sequence``; an event lands in exactly one bucket), the
    bucket becomes a hash-join key, and the true containment predicate
    refines the candidates.  Work is O(|events| + matches); the bucket
    width trades candidate slop against window-side duplication.  Because
    an event has exactly ONE bucket, a (event, window) pair can match at
    most once — no post-join dedup.
    """
    ev = spark.table("events").select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("ets"),
    )
    wins = (
        spark.range(INTERVAL_N)
        .select(
            F.col("id").alias("window_id"),
            (F.lit(INTERVAL_T0) + F.col("id") * INTERVAL_EVERY_SEC).alias("start_epoch"),
            (
                F.lit(INTERVAL_T0)
                + F.col("id") * INTERVAL_EVERY_SEC
                + F.lit(INTERVAL_LEN_SEC)
            ).alias("end_epoch"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("start_epoch") / INTERVAL_BUCKET_SEC),
                    F.floor((F.col("end_epoch") - 1) / INTERVAL_BUCKET_SEC),
                )
            ),
        )
    )
    evb = ev.withColumn("bucket", F.floor(F.col("ets") / INTERVAL_BUCKET_SEC))
    return (
        evb.join(F.broadcast(wins), "bucket")
        .filter((F.col("ets") >= F.col("start_epoch")) & (F.col("ets") < F.col("end_epoch")))
        .select(
            "event_id",
            "event_type",
            "ets",
            "window_id",
            "start_epoch",
            (F.col("ets") - F.col("start_epoch")).alias("offset_sec"),
        )
    )


def interval_join_oracle_sql() -> str:
    """Independent recomputation: DuckDB runs the PLAIN inequality join
    (its optimizer handles the range predicate natively) — same result
    set, different physical strategy."""
    return f"""
WITH wins AS (
  SELECT i AS window_id,
         {INTERVAL_T0} + i * {INTERVAL_EVERY_SEC} AS start_epoch,
         {INTERVAL_T0} + i * {INTERVAL_EVERY_SEC} + {INTERVAL_LEN_SEC} AS end_epoch
  FROM range({INTERVAL_N}) t(i)
),
ev AS (SELECT event_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ets FROM events)
SELECT ev.event_id, ev.event_type, ev.ets, w.window_id, w.start_epoch,
       ev.ets - w.start_epoch AS offset_sec
FROM ev JOIN wins w ON ev.ets >= w.start_epoch AND ev.ets < w.end_epoch"""
