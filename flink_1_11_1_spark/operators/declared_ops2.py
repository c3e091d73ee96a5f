"""Second batch of oracle/rows-only declared entries: lookup join,
salted aggregation, multimodal decode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..extensions import multimodal as mm
from ..extensions import registry
from . import joins, skew


def lookup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join (StreamExecLookupJoin batch contract): enrich
    customers against the nation dimension, always broadcast."""
    cust = catalog.load_table(spark, sf_dir, "customer")
    nation = catalog.load_table(spark, sf_dir, "nation")
    out = joins.lookup_join(
        cust, nation, F.col("c_nationkey") == F.col("n_nationkey")
    )
    return out.select("c_custkey", "c_name", "n_name").orderBy("c_custkey").limit(500)


LOOKUP_ORACLE = """
SELECT c_custkey, c_name, n_name
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
ORDER BY c_custkey LIMIT 500
"""


def salted_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregate; result identical to the plain
    GROUP BY (count/min/max are order-independent — exactly comparable)."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    out = skew.salted_agg(
        orders,
        ["o_orderpriority"],
        {
            "n": ("count", "*"),
            "mn": ("min", "o_totalprice"),
            "mx": ("max", "o_totalprice"),
        },
        num_salts=16,
    )
    return out.orderBy("o_orderpriority")


SALTED_ORACLE = """
SELECT o_orderpriority, count(*) n, min(o_totalprice) mn, max(o_totalprice) mx
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted hot-key equi-join (``skew.salted_join``): probe rows
    scatter over 8 salts, the build side replicates across every salt,
    so any single key's shuffle splits num_salts ways.  Row-identical to
    the plain join by construction; declared output aggregates to the
    market-segment grain with the floor-cents idiom so both engines
    compare on integers."""
    orders = catalog.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("cents"),
    )
    cust = catalog.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    out = skew.salted_join(orders, cust, ["ck"], num_salts=8)
    return (
        out.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
        .orderBy("c_mktsegment")
    )


SALTED_JOIN_ORACLE = """
SELECT c_mktsegment,
       cast(count(*) as bigint) n,
       cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint) cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


SESSION_SALT_GAP_MS = 30 * 60 * 1000  # 30 minutes


def salted_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-safe pre-bucketed session aggregation (round 12 —
    ``skew.salted_session_agg``, the hot-session-key lever): per-user
    30-minute sessions computed per (user, day-bucket) with a bounded
    boundary-islands stitch; identical sessions to the native
    session_window plan.  All-integer declared outputs: epoch-ms bounds
    and floor-cents sums (the cross-engine exactness idiom)."""
    ev = catalog.load_table(spark, sf_dir, "events").select(
        "user_id", "ts",
        F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
    )
    out = skew.salted_session_agg(
        ev, "ts", "30 minutes", ["user_id"],
        {"n_events": ("count", "*"), "cents": ("sum", "cents"),
         "mx_cents": ("max", "cents")},
        bucket="1 day",
    )
    return out.select(
        "user_id",
        F.unix_millis("session_start").alias("start_ms"),
        F.unix_millis("session_end").alias("end_ms"),
        "n_events", "cents", "mx_cents",
    ).orderBy("user_id", "start_ms")


# Spark's session merge is INCLUSIVE at exact-gap abutment (ts ==
# prev_ts + gap continues the session), so the islands break is the
# strict ``> gap``; session_end = last event + gap.
SESSION_SALT_ORACLE = f"""
WITH events_ms AS (
  SELECT * REPLACE (cast(date_trunc('milliseconds', ts) as timestamp) AS ts) FROM events
), t AS (
  SELECT user_id, epoch_ms(ts) tms,
         cast(floor(value * 100) as bigint) cents
  FROM events_ms
), g AS (
  SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                   OR tms - lag(tms) OVER w > {SESSION_SALT_GAP_MS}
                 THEN 1 ELSE 0 END ns
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tms)
), s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tms
                          ROWS UNBOUNDED PRECEDING) sid
  FROM g
)
SELECT user_id, min(tms) start_ms, max(tms) + {SESSION_SALT_GAP_MS} end_ms,
       cast(count(*) as bigint) n_events,
       cast(sum(cents) as bigint) cents, max(cents) mx_cents
FROM s GROUP BY user_id, sid ORDER BY user_id, start_ms
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: synthesize media, decode via the
    real mapInPandas stage, emit per-item stats.  The fake codec is a
    pure function of (doc_id, text bytes), so the oracle below replays
    it relationally: width/height from the header formula, mean
    intensity as the zero-padded byte sum of the w*h payload window.
    The mean is cast float64→float32 by the Arrow schema before
    rounding — both sides round the float32-quantized double so values
    are bit-comparable."""
    docs = catalog.load_table(spark, sf_dir, "documents").where("doc_id < 100")
    decoded = mm.decode_media(mm.attach_fake_media(docs))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(F.col("mean_intensity").cast("double"), 4).alias("mi"),
    ).orderBy("doc_id")


# hex-nibble byte extraction: DuckDB reads the payload BLOB two hex
# chars per byte; the fake codec pads short payloads with zero bytes
# (sum unchanged, divisor stays w*h).
MULTIMODAL_ORACLE = """
WITH d AS (
  SELECT doc_id, (doc_id % 8 + 4)::INT w, (doc_id % 5 + 4)::INT h,
         encode(text) payload
  FROM documents WHERE doc_id < 100),
c AS (
  SELECT doc_id, w, h, w * h AS n,
         substring(hex(payload), 1, 2 * w * h) hx,
         least(w * h, octet_length(payload)) m
  FROM d),
s AS (
  SELECT doc_id, w, h, n,
         list_sum(list_transform(range(m), i ->
           (strpos('0123456789ABCDEF', hx[2 * i + 1]) - 1) * 16 +
           (strpos('0123456789ABCDEF', hx[2 * i + 2]) - 1))) total
  FROM c)
SELECT doc_id, w AS width, h AS height,
       round(cast(cast(total AS DOUBLE) / n AS REAL)::DOUBLE, 4) mi
FROM s ORDER BY doc_id
"""


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize + frame-sample stages end-to-end (round 13 —
    the two mapInPandas stages x_multimodal_decode does not exercise):
    synthesize media, nearest-neighbor resize to 6x3, sample 2 frames
    (rows 0 and 1 of the resized image), then sum each frame's 6
    payload bytes JVM-side from the hex rendering.  All-integer
    declared outputs — bit-exact cross-engine, no float rounding.

    The fake codec is a pure function of (doc_id, text bytes): resized
    pixel (y, x) = payload byte at (y*h//3)*w + x*w//6 (zero-padded),
    so the oracle replays the whole pipeline relationally."""
    docs = catalog.load_table(spark, sf_dir, "documents").where("doc_id < 100")
    media = mm.attach_fake_media(docs)
    frames = mm.frame_sample(mm.resize_media(media, 6, 3), n_frames=2)
    # frame blob = 4-byte magic + 5-byte header + 6 payload bytes
    fsum = F.expr(
        "aggregate(sequence(9, 14), 0L, (acc, p) -> "
        "acc + cast(conv(substring(hex(frame), 2*p+1, 2), 16, 10) as long))"
    )
    return (
        frames.select("doc_id", "frame_no", fsum.alias("fsum"))
        .orderBy("doc_id", "frame_no")
    )


# frame fn of the 6x3 resize = original row fn*h//3 (frame_sample picks
# rows arange(2)*3//2 = [0, 1] of the resized stack); x-th byte =
# payload[(fn*h//3)*w + x*w//6], zero when past the payload end.
MULTIMODAL_FRAMES_ORACLE = """
WITH d AS (
  SELECT doc_id, (doc_id % 8 + 4)::INT w, (doc_id % 5 + 4)::INT h,
         hex(encode(text)) hx, octet_length(encode(text)) m
  FROM documents WHERE doc_id < 100),
f AS (
  SELECT doc_id, w, h, hx, m, unnest(range(2)) AS fn FROM d),
s AS (
  SELECT doc_id, fn,
         list_sum(list_transform(range(6), x ->
           CASE WHEN ((fn * h) // 3) * w + (x * w) // 6 < m
                THEN (strpos('0123456789ABCDEF',
                        hx[2 * (((fn * h) // 3) * w + (x * w) // 6) + 1]) - 1) * 16
                   + (strpos('0123456789ABCDEF',
                        hx[2 * (((fn * h) // 3) * w + (x * w) // 6) + 2]) - 1)
                ELSE 0 END)) fsum
  FROM f)
SELECT doc_id, cast(fn as int) frame_no, cast(fsum as bigint) fsum
FROM s ORDER BY doc_id, frame_no
"""


def register_all() -> None:
    registry.register("x_lookup_join", lookup_customers, LOOKUP_ORACLE)
    registry.register("x_salted_agg", salted_order_stats, SALTED_ORACLE)
    registry.register("x_salted_join", salted_join_segments, SALTED_JOIN_ORACLE)
    registry.register("x_session_salted", salted_sessions, SESSION_SALT_ORACLE)
    registry.register("x_multimodal_decode", multimodal_features, MULTIMODAL_ORACLE)
    registry.register("x_multimodal_frames", multimodal_frames, MULTIMODAL_FRAMES_ORACLE)
