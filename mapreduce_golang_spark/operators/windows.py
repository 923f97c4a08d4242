"""Event-time / window analytics over the `events` table (extension
surface, SURVEY.md §2.4 — the reference is strictly batch with no
window functions or date/time operators, SURVEY.md §2.3).

Scale design:
- Tumbling windows are a plain group-by on (truncated ts, type) —
  partial agg + exchange on the group key; no per-row state.
- Sessionization and rolling stats use Window.partitionBy(user_id):
  ONE exchange on user_id, then per-partition sorting — the standard
  scalable shape. Skewed users (bots) are the risk at 100 TB; AQE
  skew handling plus an optional pre-filter of pathological users is
  the mitigation.
- JSON extraction uses get_json_object (JVM-side, codegen'd) — never
  a Python UDF.
- Timestamps are emitted as formatted strings so the DuckDB
  differential hash is byte-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window: counts + value sum per (hour, type)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), _TS_FMT).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. lag + cumulative-sum over
    a per-user window; session_id is (user_id, session_seq).

    Returns one row per session: user_id, session_seq, session_start,
    n_events, duration_secs.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # integer microseconds, not float seconds: gap comparisons and
    # durations stay bit-exact and identical to the DuckDB oracle.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(by_user)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sessions = events.withColumn("session_seq", F.sum(new_session).over(by_user))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
            F.count("*").alias("n_events"),
            F.round((F.max(us) - F.min(us)) / F.lit(1_000_000.0), 6).alias("duration_secs"),
        )
        .select("user_id", F.col("session_seq").cast("long").alias("session_seq"), "session_start", "n_events", "duration_secs")
    )


def top_users_per_event_type(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-type top-k users by total value: agg then windowed
    row_number ≤ k. Exchange on event_type only after the per-
    (type,user) aggregate has collapsed the input."""
    per_user = events.groupBy("event_type", "user_id").agg(F.round(F.sum("value"), 6).alias("total_value"))
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("event_type", "user_id", "total_value", F.col("rnk").cast("long").alias("rnk"))
    )


def rolling_user_value(events: DataFrame, n_preceding: int = 3) -> DataFrame:
    """Per-user rolling average of `value` over the current + previous
    ``n_preceding`` events (ROWS frame — deterministic given the
    per-user (ts, event_id) order)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("rolling_avg_value"),
    )


def trailing_hour_value(events: DataFrame, window_seconds: int = 3600) -> DataFrame:
    """Per-user trailing event-time window sum: for every event, the
    sum and count of that user's values in the preceding
    ``window_seconds`` (inclusive RANGE frame over epoch seconds) —
    the time-based sibling of ``rolling_user_value``'s ROWS frame.

    Exactly one exchange on user_id; the RANGE frame is evaluated in
    one per-partition ordered pass. Epoch seconds (not an interval
    literal) keep the frame arithmetic integer-exact and identical to
    the DuckDB oracle's numeric RANGE frame. Seconds are derived as
    floor(micros/1e6) — explicit floor semantics, matching the oracle's
    floor(epoch(ts)) even for pre-1970 fractional timestamps, where
    unix_timestamp()'s truncate-toward-zero would differ.
    """
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-window_seconds, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        sec.alias("epoch_s"),
        F.round(F.sum("value").over(w), 6).alias("trailing_sum"),
        F.count("*").over(w).cast("long").alias("trailing_n"),
    )


def props_key_stats(events: DataFrame) -> DataFrame:
    """JSON prop extraction: props is a JSON string ('{"k": N}');
    per event_type stats of k. get_json_object stays in codegen."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def events_near_errors_range_join(events: DataFrame, window_minutes: int = 5) -> DataFrame:
    """Range join, bucketized: for each error event, how many events
    the same user produced in the preceding ``window_minutes``.

    Spark has no native range join; the scalable composition is:
    bucket both sides by time window, equi-join on (user, bucket) for
    the bucket and its successor, then filter the exact range — the
    join never degenerates to a nested loop, and the bucket key
    partitions evenly. (The DuckDB oracle uses the naive inequality
    join directly — same semantics, quadratic engine-side.)
    """
    win_us = window_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts"))
    errors = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user"),
        us.alias("e_us"),
    )
    others = events.select(
        F.col("user_id").alias("o_user"), us.alias("o_us"), F.col("event_id").alias("o_id")
    )
    # an event in [e_us - win, e_us) lies in the error's bucket or the
    # immediately preceding one
    e = errors.withColumn("bucket", F.expr(f"e_us DIV {win_us}"))
    e = e.withColumn("probe", F.explode(F.array(F.col("bucket"), F.col("bucket") - 1)))
    o = others.withColumn("obucket", F.expr(f"o_us DIV {win_us}"))
    joined = e.join(
        o,
        (F.col("e_user") == F.col("o_user"))
        & (F.col("probe") == F.col("obucket"))
        & (F.col("o_us") >= F.col("e_us") - win_us)
        & (F.col("o_us") < F.col("e_us")),
    )
    counts = joined.groupBy("error_event_id").agg(F.count("*").alias("n_preceding"))
    return (
        errors.join(counts, "error_event_id", "left")
        .select(
            "error_event_id",
            F.col("e_user").alias("user_id"),
            F.coalesce("n_preceding", F.lit(0)).cast("long").alias("n_preceding"),
        )
    )


def multi_granularity_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same measure
    maintained at 1h / 6h / 1d granularities, distinguished by a
    `grain` column (one scan, three group-bys unioned — each is a
    partial-agg + tiny exchange; at scale these feed materialized
    views keyed by grain)."""
    def grain(trunc_expr, label):
        return (
            events.groupBy(
                F.date_format(trunc_expr, _TS_FMT).alias("bucket_start"), "event_type"
            )
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
            .withColumn("grain", F.lit(label))
        )

    hour = grain(F.date_trunc("hour", F.col("ts")), "1h")
    six = grain(
        F.timestamp_seconds((F.unix_micros(F.date_trunc("hour", F.col("ts"))) / 1_000_000).cast("long")
                            - ((F.hour("ts") % 6).cast("long") * 3600)),
        "6h",
    )
    day = grain(F.date_trunc("day", F.col("ts")), "1d")
    return hour.unionByName(six).unionByName(day).select(
        "grain", "bucket_start", "event_type", "n_events", "sum_value"
    )


def event_type_share_cube(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, hour-of-day) with counts — grouping-set
    coverage (absent in the reference, free in Spark). NULL group
    cells are replaced so the oracle hash is stable."""
    return (
        events.select("event_type", F.hour("ts").cast("long").alias("hod"))
        .cube("event_type", "hod")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("hod", F.lit(-1)).alias("hod"),
            "n",
        )
    )


def event_gap_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-event-gap profile: count of gaps, mean gap and
    max gap in seconds between consecutive events (lag over a per-user
    event-time window) — the cadence metric behind bot/burst detection
    and sessionization tuning.

    One exchange on user_id, one per-partition ordered pass. Gaps are
    computed in exact integer MICROseconds and divided once at the
    end (sum is a BIGINT, so the mean is one float division on both
    engines — no float fold-order drift). Ordering ties on ts are
    broken by event_id so lag() is deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = (us - F.lag(us).over(w)).alias("gap_us")
    gaps = events.select("user_id", gap_us).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.round(F.sum("gap_us") / F.count("*") / F.lit(1_000_000.0), 6).alias("avg_gap_s"),
        F.round(F.max("gap_us") / F.lit(1_000_000.0), 6).alias("max_gap_s"),
    )


def props_variant_stats(events: DataFrame) -> DataFrame:
    """Semi-structured VariantType path (Spark 4): `props` is parsed
    ONCE into a binary variant and fields come out via `variant_get` —
    the open-schema ingestion surface, complementing
    ``props_key_stats``'s per-path `get_json_object`. At 100 TB the
    difference matters: a variant column is decoded at ingest and each
    downstream extraction is a cheap typed binary probe, while
    get_json_object re-parses the JSON string per path per row.

    Per event_type: rows with a k field, distinct k values, sum.
    """
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
            F.sum("k").alias("sum_k"),
        )
    )


def hopping_window_counts(
    events: DataFrame, width_minutes: int = 10, slide_minutes: int = 5
) -> DataFrame:
    """Hopping (sliding) event-time windows in batch: `F.window(ts,
    width, slide)` assigns each event to width/slide overlapping
    windows (here 2), then a plain group-by per (window, event_type).

    The batch twin of the streaming hopping aggregation: Spark expands
    the window assignment as a generator expression (narrow — no
    Python, no extra scan) and the aggregate is one exchange on the
    (window_start, event_type) key with map-side partials. Output size
    is bounded by (time range / slide) × types, independent of input
    rows, so the result stays tiny at 100 TB.

    Returns (window_start string, event_type, n_events, sum_value).
    """
    w = F.window("ts", f"{width_minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def gap_fill_locf(events: DataFrame) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward:
    build each user's dense daily grid (first..last active day via
    `sequence()` — a narrow generator, no driver loop), left-join the
    observed per-day peak value, and carry the last non-null forward
    with `last(value, ignorenulls=True)` over an ordered window.

    The standard resample topology: the raw event table collapses to
    per-(user, day) rows in the FIRST aggregate, so every exchange
    after that (span agg, grid join, LOCF window sort) carries
    users × days rows, independent of event volume. Summarized per
    user so the result is one row per user:
    (user_id, n_days, n_observed, n_filled, sum_locf).
    """
    daily = events.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.max("value").alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    locf = F.last("day_value", ignorenulls=True).over(
        Window.partitionBy("user_id").orderBy("day")
    )
    filled = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", "day_value", locf.alias("locf_value")
    )
    return filled.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_days"),
        F.count("day_value").cast("long").alias("n_observed"),
        (F.count("*") - F.count("day_value")).cast("long").alias("n_filled"),
        F.round(F.sum("locf_value"), 4).alias("sum_locf"),
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream: for each (prev_type, next_type) adjacency in a user's
    ts-ordered event sequence, the count and the row-normalized
    transition probability — the behavioral-model fingerprint used
    for funnel QA and bot detection (a near-deterministic row is a
    scripted client).

    One exchange on user_id for the lag window, then a hash agg on
    the (prev, next) pair whose output is bounded by n_types²; the
    probability denominator rides a second window over the tiny agg
    result, not the event stream. Ordering ties break on event_id.

    Returns (prev_type, next_type, n, prob).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    )


#: truncated-EWMA parameters — shared with the DuckDB oracle. The
#: horizon bound keeps the weight expression a FIXED sum of lag terms:
#: an unbounded EWMA needs pow(1-α, n-i) with n unbounded, which
#: overflows double for long user streams when rewritten as a
#: prefix-sum; eight terms already carry ≥ 94% of the mass at α=0.3.
EWMA_ALPHA = 0.3
EWMA_HORIZON = 8


def ewma_user_value(events: DataFrame) -> DataFrame:
    """Exponentially weighted moving average of `value` per user,
    truncated at EWMA_HORIZON trailing events and renormalized over
    the weights actually present (so early rows average over the
    shorter available history instead of decaying toward zero) — the
    smoothed per-user activity signal for anomaly baselines.

    Implemented as a fixed linear combination of lag(value, j) terms
    over ONE user-keyed sort — no self-join, no UDF, no recursive
    state; DuckDB evaluates the identical expression for the oracle.

    Returns (user_id, event_id, value, ewma).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** j for j in range(EWMA_HORIZON)]
    num = None
    den = None
    for j, wt in enumerate(weights):
        v = F.lag("value", j).over(w)
        term = F.when(v.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = (num + F.coalesce(v, F.lit(0.0)) * wt) if num is not None else F.coalesce(v, F.lit(0.0)) * wt
        den = (den + term) if den is not None else term
    return events.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    )


#: trailing z-score parameters — shared with the DuckDB oracle.
ZSCORE_WINDOW = 20
ZSCORE_MIN_N = 5
ZSCORE_THRESHOLD = 2.0


def value_zscore_anomalies(events: DataFrame) -> DataFrame:
    """Trailing-window anomaly flags: each event's `value` scored
    against the mean/stddev of the user's previous ZSCORE_WINDOW
    events (strictly preceding — the score never sees its own value);
    rows with |z| > threshold and ≥ ZSCORE_MIN_N history are the
    anomalies a streaming monitor would page on, computed here as the
    batch backfill.

    One exchange on user_id; mean, stddev_samp and count all ride the
    same ROWS frame on the same sort, so Spark computes the three
    aggregates in a single window pass.

    Returns (user_id, event_id, value, zscore) for anomalous rows.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_WINDOW, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    n = F.count("value").over(w)
    z = (F.col("value") - mu) / sd
    return (
        events.select(
            "user_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.when((n >= ZSCORE_MIN_N) & (sd > 0), F.round(z, 6)).alias("zscore"),
        )
        .where(F.abs("zscore") > ZSCORE_THRESHOLD)
    )


def user_path_trigrams(events: DataFrame, k: int = 25) -> DataFrame:
    """Top-k 3-step event-type paths across all user streams — the
    sequence-mining companion to markov_transitions (the matrix says
    where single steps go; the trigram table says which whole JOURNEYS
    dominate, the input to funnel design and bot-pattern review).

    One exchange on user_id drives both lag terms in a single Window
    node; the path aggregation is a hash agg bounded by n_types³ and
    the top-k a TakeOrderedAndProject with a deterministic path
    tie-break. Returns (path, n), '>'-joined types, n desc.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p2 = F.lag("event_type", 2).over(w)
    p1 = F.lag("event_type", 1).over(w)
    return (
        events.select(
            F.concat_ws(">", p2, p1, F.col("event_type")).alias("path"),
            p2.alias("_p2"),
        )
        .where(F.col("_p2").isNotNull())
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(k)
    )


def time_weighted_user_value(events: DataFrame) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    is weighted by how long it remained the user's latest observation
    (microseconds until the next event; the final event carries no
    duration and drops out) — the correct average for irregularly
    sampled series, where the event-count mean over-weights bursts.

    One exchange on user_id drives the single lead() pass; the
    weighted sum is an ordinary partial-aggregable hash agg. Weights
    stay integer microseconds end-to-end (matching the DuckDB
    oracle's epoch_us arithmetic bit-for-bit); only the final ratio
    is floating. Users whose events all share one timestamp have zero
    total weight and are excluded (den = 0).

    Returns (user_id, twap, n_intervals, span_secs).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    dt = F.lead(us).over(w) - us
    per = (
        events.select("user_id", "value", dt.alias("dt_us"))
        .where(F.col("dt_us").isNotNull())
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.sum(F.col("value") * F.col("dt_us")).alias("_num"),
            F.sum("dt_us").alias("_den"),
            F.count("*").cast("long").alias("n_intervals"),
        )
        .where(F.col("_den") > 0)
        .select(
            "user_id",
            F.round(F.col("_num") / F.col("_den"), 6).alias("twap"),
            "n_intervals",
            F.round(F.col("_den") / F.lit(1_000_000.0), 6).alias("span_secs"),
        )
    )


#: robust-anomaly parameters — shared with the DuckDB oracle.
#: 1.4826 is the Gaussian consistency constant (MAD → σ estimate);
#: 3.5 is the conventional Iglewicz–Hoare modified-z cutoff.
MAD_CONSISTENCY = 1.4826
MAD_THRESHOLD = 3.5


def value_mad_anomalies(events: DataFrame) -> DataFrame:
    """Robust per-type anomaly flags: |value − median| scored against
    the median absolute deviation (modified z-score) — the outlier
    detector that, unlike value_zscore_anomalies' mean/stddev, is not
    itself dragged by the outliers it hunts (50% breakdown point vs 0).

    Two grouped exact medians (percentile(…, 0.5)) over the same
    event_type key, each joined back via broadcast — event_type is a
    fixed enumeration, not an SF-scaling dimension, so the broadcasts
    hold at 100 TB and the events table is never shuffled. Exact
    median is a sort-based agg per group; at extreme group sizes the
    approx_percentile sibling is the drop-in (documented, not
    default, because the oracle needs exact semantics).

    Returns (event_id, event_type, value, robust_z) for anomalies.
    """
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("_med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "_absdev", F.abs(F.col("value") - F.col("_med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(_absdev, 0.5)").alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("_mad") > 0)
        .withColumn("robust_z", F.col("_absdev") / (F.lit(MAD_CONSISTENCY) * F.col("_mad")))
        .where(F.col("robust_z") > MAD_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round("robust_z", 6).alias("robust_z"),
        )
    )


#: incident-overlap parameters — shared with the DuckDB oracle.
INCIDENT_MIN_ERRORS = 5
SESSION_GAP_MINUTES = 30


def session_incident_overlap(events: DataFrame) -> DataFrame:
    """Interval-overlap join: which user sessions overlapped a
    platform incident (an hour with ≥ INCIDENT_MIN_ERRORS error
    events) — the ops-side attribution query joining two DERIVED
    interval sets, neither of which exists as a table.

    Scale shape: because incidents are hour-aligned half-open windows
    [h, h+1h), interval overlap is EXACTLY hour-bucket membership —
    each session explodes to the calendar hours it spans
    (sequence(), bounded by session length, which the 30-min gap rule
    caps) and equi-joins the incident hours. The incident side is
    bounded by the corpus' calendar span (~9k rows/year at ANY SF),
    so it broadcasts and the sessions are never shuffled for the
    join. General un-aligned intervals add a residual range filter
    after the same bucket join (events_near_errors_range_join shows
    that form). The DuckDB oracle uses the naive inequality join —
    same semantics, quadratic engine-side.

    Returns (user_id, session_seq, session_start, n_incident_hours)
    for sessions touching ≥ 1 incident hour.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(by_user)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        events.withColumn("session_seq", F.sum(new_session).over(by_user))
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    incidents = (
        events.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n_err"))
        .where(F.col("n_err") >= INCIDENT_MIN_ERRORS)
        .select("hour")
    )
    exploded = sessions.select(
        "user_id",
        "session_seq",
        "s_start",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    return (
        exploded.join(F.broadcast(incidents), "hour")
        .groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("s_start"), _TS_FMT).alias("session_start"),
            F.count("*").cast("long").alias("n_incident_hours"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "session_start",
            "n_incident_hours",
        )
    )


def user_first_last_events(events: DataFrame) -> DataFrame:
    """Each user's event-history endpoints in one row: the first,
    second, and last event type in (ts, event_id) order plus the
    total count — the bounded-frame window-function family
    (first_value / nth_value / last_value over an unbounded frame)
    exercised on the canonical "how did this user start and where are
    they now" lifecycle question.

    Determinism: event_id breaks ts ties, so every engine orders the
    history identically; nth_value(2) is NULL for single-event users.

    Scale shape: one exchange on user_id; all four window expressions
    share the same (partition, order, frame) spec so Spark evaluates
    them in a single Window operator, and the row_number dedup rides
    the same sort. Returns (user_id, first_event, second_event,
    last_event, n_events).
    """
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            F.first("event_type").over(frame).alias("first_event"),
            F.nth_value("event_type", 2).over(frame).alias("second_event"),
            F.last("event_type").over(frame).alias("last_event"),
            F.count("*").over(frame).cast("long").alias("n_events"),
            F.row_number().over(ordered).alias("_rk"),
        )
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def markov_prediction_accuracy(events: DataFrame) -> DataFrame:
    """Top-1 accuracy of the first-order Markov next-event predictor:
    for each current event type, predict the most probable next type
    (ties → lexicographically smallest) and report how often the
    prediction is right — the baseline any sequence model must beat,
    and the QA number that says whether markov_transitions' matrix
    carries signal at all (accuracy ≈ row max).

    Scale shape: the transition derivation is markov_transitions' lag
    window + bounded pair agg; this adds ONE agg over the ≤ n_types²
    pair table (min_by argmax, no window). Returns (prev_type,
    n_transitions, predicted_next, accuracy), accuracy rounded to 6.
    """
    pairs = markov_transitions(events).select("prev_type", "next_type", "n")
    return pairs.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("n_transitions"),
        F.min_by("next_type", F.struct((-F.col("n")).alias("nn"), "next_type")).alias(
            "predicted_next"
        ),
        F.round(F.max("n") / F.sum("n"), 6).alias("accuracy"),
    )


def session_duration_histogram(events: DataFrame, bin_minutes: int = 10) -> DataFrame:
    """Distribution of session lengths: sessionize's output bucketed
    into fixed ``bin_minutes`` bins with per-bin session count and
    average events — the tuning table for the session gap parameter
    and the engagement histogram product analytics reads.

    Scale shape: rides sessionize's one user-keyed window; the
    histogram is a deterministic floor-bin hash agg over the (already
    small) session table — the scalable histogram shape, no sort.
    Returns (bin, bin_lo_minutes, n_sessions, avg_events), floats
    rounded to 6.
    """
    sess = sessionize(events)
    bin_ = F.floor(F.col("duration_secs") / (bin_minutes * 60)).cast("long")
    return (
        sess.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.round(F.avg("n_events"), 6).alias("avg_events"),
        )
        .select(
            "bin",
            (F.col("bin") * bin_minutes).cast("long").alias("bin_lo_minutes"),
            "n_sessions",
            "avg_events",
        )
    )


def hourly_value_ohlc(events: DataFrame) -> DataFrame:
    """OHLC bars per (event_type, hour): open/high/low/close of
    ``value`` plus event count and total — the candlestick rollup every
    time-series store ships (reference analogue: the per-window reduce
    of mrapps, SURVEY §2.4 event-time analytics family).

    Open/close use ``min_by``/``max_by`` with the (ts, event_id)
    struct as the ordering key — event_id uniqueness makes the
    selection total-ordered and deterministic, and both are ALGEBRAIC
    aggregates (map-side partials carry one candidate row each), so
    the whole operator is ONE hash aggregate over the scan: no window
    sort, no second exchange. total_value sums decimal(18,6) so the
    result is bit-identical under any partial-aggregation order.
    """
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "hour")
        .agg(
            F.round(F.min_by("value", key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", key), 6).alias("close"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


def rolling_median_value(events: DataFrame, frame: int = 10) -> DataFrame:
    """Per-user rolling EXACT median of value over the trailing
    ``frame``+1 events — the robust smoother (median filter) that the
    EWMA/z-score family can't provide: one wild outlier shifts a mean
    window for ``frame`` rows but leaves the median untouched.

    One exchange on user_id for the ordered window; the ROWS frame is
    bounded, so per-row work is O(frame · log frame) regardless of
    stream length — no global sort, no second shuffle. Spark forbids
    ordered-set aggregates over a framed window, so the frame is
    collected (≤ frame+1 doubles) and the median interpolated
    IN-ARRAY — same even-count midpoint rule as DuckDB's windowed
    median. (ts, event_id) ordering is total, making the frame
    contents deterministic. Returns (user_id, event_id, value,
    roll_median).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-frame, 0)
    )
    med = (
        "CASE WHEN size(fr) % 2 = 1 "
        "THEN element_at(array_sort(fr), CAST(size(fr) DIV 2 + 1 AS INT)) "
        "ELSE (element_at(array_sort(fr), CAST(size(fr) DIV 2 AS INT)) "
        "      + element_at(array_sort(fr), CAST(size(fr) DIV 2 + 1 AS INT))) / 2.0 END"
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.collect_list("value").over(w).alias("fr"),
        )
        .select(
            "user_id",
            "event_id",
            "value",
            F.round(F.expr(med), 6).alias("roll_median"),
        )
    )


DEBOUNCE_SECONDS = 60


def debounced_event_stats(
    events: DataFrame, gap_seconds: int = DEBOUNCE_SECONDS
) -> DataFrame:
    """Throttle-style debounce report: an event is KEPT when the
    previous event of the same (user, type) is more than
    ``gap_seconds`` older (gap measured from the previous RAW event —
    the one-window approximation; chain-from-last-kept debounce is the
    stateful streaming variant). The dedup every click-ingest runs to
    strip double-fires before counting.

    One exchange on (user_id, event_type) for the lag window, then a
    hash agg per type. Returns (event_type, n_events, n_kept,
    drop_frac).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    kept = (gap.isNull() | (gap > gap_seconds)).cast("long")
    return (
        events.select("event_type", kept.alias("kept"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
        .select(
            "event_type",
            "n_events",
            "n_kept",
            F.round(1.0 - F.col("n_kept") / F.col("n_events"), 6).alias("drop_frac"),
        )
    )


def event_rate_spikes(events: DataFrame, z_thresh: float = 3.0) -> DataFrame:
    """Poisson-style rate-spike detector: per event type, hourly counts
    whose z-score against the TRAILING 24 observed hours (mean/stddev,
    current hour excluded) reaches ``z_thresh`` — the volume-anomaly
    complement of the per-event value z-score operator (a bot burst
    moves counts, not values). Hours with zero events are absent from
    the series (observed-hours convention, stated here on purpose).

    One hash agg to the (type, hour) series — tiny vs the event scan —
    then one bounded-frame window per type; no second full exchange.
    Flags on the ROUNDED z so the boundary set is engine-stable.
    Returns (event_type, hour, n_events, z_score).
    """
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    z = F.round((F.col("n_events") - mu) / sd, 6)
    return (
        hourly.select("event_type", "hour", "n_events", sd.alias("sd"), z.alias("z_score"))
        .where(F.col("sd") > 0)
        .where(F.col("z_score") >= z_thresh)
        .select("event_type", "hour", "n_events", "z_score")
    )


def km_gap_survival(events: DataFrame) -> DataFrame:
    """Kaplan–Meier survival curve of per-user inter-event gaps WITH
    right-censoring: each event's time-to-next-event is a "death" at
    its observed gap, except a user's last event, which is CENSORED at
    the stream horizon (max ts) — dropping those rows (the naive ECDF)
    biases the curve toward short gaps; KM is the estimator that uses
    them correctly. Gaps bucket to whole minutes.

    One exchange on user_id for the lead window, one 1-row broadcast
    for the horizon, then a minute-bucket hash agg; the survival
    product runs as exp(Σ ln(1 − d/n)) over the ORDERED bucket series
    — a window over rows proportional to distinct gap minutes, never
    events. Returns (gap_min, n_at_risk, n_deaths, n_censored,
    survival).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    horizon = F.broadcast(events.agg(F.max(F.col("ts").cast("double")).alias("h")))
    gaps = (
        events.select(
            "user_id",
            F.col("ts").cast("double").alias("tsd"),
            F.lead(F.col("ts").cast("double")).over(w).alias("nxt"),
        )
        .crossJoin(horizon)
        .select(
            F.floor(
                (F.coalesce(F.col("nxt"), F.col("h")) - F.col("tsd")) / 60.0
            ).cast("long").alias("gap_min"),
            F.col("nxt").isNull().cast("long").alias("censored"),
        )
    )
    buckets = gaps.groupBy("gap_min").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("n_deaths"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    wt = Window.orderBy("gap_min")
    prior = Window.orderBy("gap_min").rowsBetween(Window.unboundedPreceding, -1)
    total = Window.partitionBy()
    at_risk = (
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(total)
        - F.coalesce(F.sum(F.col("n_deaths") + F.col("n_censored")).over(prior), F.lit(0))
    )
    return (
        buckets.withColumn("n_at_risk", at_risk.cast("long"))
        .withColumn(
            "survival",
            # the final bucket can kill everyone at risk (d == n):
            # ln(0) is an error in DuckDB and -inf in Spark — a -1e9
            # sentinel underflows exp() to an exact 0.0 in BOTH
            F.round(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("n_deaths") == F.col("n_at_risk"), F.lit(-1e9)
                        ).otherwise(
                            F.log(1.0 - F.col("n_deaths") / F.col("n_at_risk"))
                        )
                    ).over(wt)
                ),
                6,
            ),
        )
        .select("gap_min", "n_at_risk", "n_deaths", "n_censored", "survival")
    )


def hourly_acf(events: DataFrame, lags: tuple[int, ...] = (1, 2, 3, 6, 12, 24)) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at the
    given lags — the periodicity diagnostic run before picking a
    seasonal window for forecasting or anomaly baselines (a strong
    lag-24 says "daily cycle"; lag-1 says "bursty").

    Convention: the Pearson-on-lagged-pairs estimator (corr of the
    series against itself shifted by k), computed over a DENSE hour
    spine — silent hours count as 0, not as missing rows, because a
    gap IS signal for a rate series.

    Scale shape: one hash agg to the tiny hour series, the spine from
    a 1-row min/max agg exploded via sequence() (no join), lags fanned
    out with a per-row explode of a constant array, and the shift is
    an EQUI-join on the integer hour index — bounded by hours × lags.
    Returns (lag_hours, n_pairs, acf).
    """
    hours = events.select(F.date_trunc("hour", "ts").alias("hour"))
    spine = (
        hours.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hour")
        )
    )
    counts = hours.groupBy("hour").agg(F.count("*").cast("long").alias("n"))
    series = (
        spine.join(counts, "hour", "left")
        .select(
            F.floor(F.col("hour").cast("double") / 3600).cast("long").alias("h"),
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("n"),
        )
    )
    lag_col = F.explode(F.array(*[F.lit(int(k)) for k in lags])).alias("lag_hours")
    cur = series.select(F.col("h"), F.col("n").alias("n_t"), lag_col)
    past = series.select(
        F.col("h").alias("h_past"), F.col("n").alias("n_lag")
    )
    # (h - lag) keeps every join-key term on the probe side, so
    # Catalyst extracts a hash-joinable equi-key (h_past + lag would
    # mix sides and degrade to a nested loop)
    return (
        cur.join(past, (cur["h"] - F.col("lag_hours")) == F.col("h_past"))
        .groupBy("lag_hours")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (F.round(F.corr("n_t", "n_lag"), 6) + F.lit(0.0)).alias("acf"),
        )
    )


def type_crosscorr_leadlag(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "error",
    max_lag: int = 6,
) -> DataFrame:
    """Lead-lag cross-correlation between two event types' hourly
    series: corr(a[t], b[t+lag]) for lag in [-max_lag, +max_lag] — a
    positive-lag peak means a LEADS b (clicks now, errors later), the
    directional version of the lag-0 matrix in
    ``type_hourly_correlation``. Zero-filled on the dense hour spine
    for the same reason as ``hourly_acf``.

    Same bounded shape: tiny zero-filled series per type, a constant
    lag fan-out, one equi-join per (hour, lag), one corr per lag.
    Returns (lag_hours, n_pairs, xcorr) ordered by lag at the caller.
    """
    hours = events.where(F.col("event_type").isin(type_a, type_b)).select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    spine = (
        events.select(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hour")
        )
    )
    counts = hours.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("n")
    )

    def _series(t: str, out: str) -> DataFrame:
        return (
            spine.join(counts.where(F.col("event_type") == t), "hour", "left")
            .select(
                F.floor(F.col("hour").cast("double") / 3600).cast("long").alias("h"),
                F.coalesce(F.col("n"), F.lit(0)).cast("double").alias(out),
            )
        )

    lag_vals = list(range(-max_lag, max_lag + 1))
    a = _series(type_a, "na").select(
        "h",
        "na",
        F.explode(F.array(*[F.lit(int(k)) for k in lag_vals])).alias("lag_hours"),
    )
    b = _series(type_b, "nb").select(F.col("h").alias("hb"), "nb")
    return (
        a.join(b, (F.col("h") + F.col("lag_hours")) == F.col("hb"))
        .groupBy("lag_hours")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (F.round(F.corr("na", "nb"), 6) + F.lit(0.0)).alias("xcorr"),
        )
    )


def user_active_day_streaks(events: DataFrame) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as a
    histogram (streak_days → n_users) — the engagement-stickiness cut
    every retention dashboard carries, and the canonical
    gaps-and-islands window pattern (day_index minus row_number is
    constant within a run of consecutive days).

    Scale shape: distinct (user, day) first (one hash agg, the stream
    shrinks to ≤ users × days), ONE exchange on user_id for the
    row_number, then two more hash aggs — never a self-join.
    Returns (streak_days, n_users).
    """
    days = events.select(
        "user_id",
        F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_num")
    islands = days.select(
        "user_id",
        (F.col("day_num") - F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("streak_days"))
    return best.groupBy("streak_days").agg(
        F.count("*").cast("long").alias("n_users")
    )


def max_concurrent_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Peak concurrent sessions per day via the sweep-line (+1 at
    session start, −1 at session end, running sum) — the capacity
    figure a serving team sizes connection pools against, and an
    interval-stabbing aggregate no plain group-by expresses.

    Conventions: sessions use the same ``gap_minutes`` inactivity rule
    as ``sessionize``; at an equal timestamp an END is processed
    before a START (half-open intervals — back-to-back sessions never
    double-count); ties beyond that break on (user_id, session_no) so
    the running sum is deterministic in both engines.

    Scale shape: the sweep stream is exactly 2 rows per session —
    orders of magnitude smaller than events — so the single global
    ordered window is a deliberate, documented narrow-data choice (at
    extreme scale: partition the sweep by day and carry in the open-
    session count per day boundary). Returns (day, max_concurrent).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.when(
                (F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w))
                > gap_minutes * 60,
                1,
            )
            .otherwise(0)
        ).alias("new_sess"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sess_no"),
    )
    sessions = numbered.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("t_start"), F.max("ts").alias("t_end")
    )
    starts = sessions.select(
        F.col("t_start").alias("t"), F.lit(1).alias("delta"), "user_id", "sess_no"
    )
    ends = sessions.select(
        F.col("t_end").alias("t"), F.lit(-1).alias("delta"), "user_id", "sess_no"
    )
    sweep = starts.unionByName(ends)
    ws = Window.orderBy("t", "delta", "user_id", "sess_no").rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = sweep.select(
        "t", "delta", F.sum("delta").over(ws).alias("cur")
    )
    return (
        running.where(F.col("delta") == 1)
        .groupBy(F.date_format(F.date_trunc("day", "t"), "yyyy-MM-dd").alias("day"))
        .agg(F.max("cur").cast("long").alias("max_concurrent"))
    )


def user_journey_signatures(
    events: DataFrame, prefix_len: int = 8, k: int = 20
) -> DataFrame:
    """Top-k user journey signatures: each user's first ``prefix_len``
    event types in time order, joined into one path string, counted
    across users — the ordered-string-aggregation surface (SQL
    LISTAGG ... WITHIN GROUP) the funnel team uses to find dominant
    onboarding paths before committing to a funnel definition.

    Order inside the aggregate is made deterministic WITHOUT a window:
    collect_list into (ts, event_id, type) structs, array_sort (struct
    comparison = lexicographic on ts then event_id), slice to the
    prefix, transform+array_join — all narrow expressions after ONE
    exchange on user_id. Top-k is orderBy+limit (TakeOrderedAndProject;
    ties at the boundary break on the signature text).
    Returns (signature, n_users).
    """
    per_user = events.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    1,
                    prefix_len,
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("signature")
    )
    return (
        per_user.groupBy("signature")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("signature"))
        .limit(k)
    )


def _dense_hourly_counts(events: DataFrame) -> DataFrame:
    """(event_type, hour, hod, cnt) over the DENSE hour grid — every
    hour from the corpus min to max hour appears for every observed
    event type, zero-filled. Seasonal/changepoint operators need the
    dense series: lag(24) over a sparse series silently compares
    different hours-of-day.

    Scale shape: the spine is built from a 1-row min/max aggregate
    (sequence + explode — no join against data), and the spine x type
    grid is a broadcast nested-loop BY DESIGN, bounded by time-span x
    |event types| (30 days -> 720 x 5 rows; a DECADE of hours is
    ~88k): it grows with the calendar, never with corpus size. The
    only data-sized pass is the single hourly hash agg.
    """
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").cast("long").alias("cnt"))
    return (
        spine.crossJoin(types)
        .join(counts, ["hour", "event_type"], "left")
        .select(
            "event_type",
            "hour",
            F.hour("hour").alias("hod"),
            F.coalesce("cnt", F.lit(0)).cast("double").alias("cnt"),
        )
    )


def cusum_hourly_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM level-shift detector on the dense hourly count series per
    event_type: standardize each hour against the series mean/std,
    accumulate, and report the peak |CUSUM| and the hour it occurs —
    the classic "when did the rate change?" statistic (the peak of the
    CUSUM curve is the maximum-likelihood single changepoint under a
    mean-shift model). Returns (event_type, n_hours, peak_hour,
    peak_cusum).

    Scale shape: one data-sized hash agg (hourly counts), then every
    window runs over the calendar-bounded dense series. The peak pick
    ranks on the 6dp-ROUNDED |CUSUM| with the hour as tiebreak, so the
    argmax is engine-deterministic even when two hours are fp-close.
    """
    dense = _dense_hourly_counts(events)
    wt = Window.partitionBy("event_type")
    z = F.when(
        F.stddev_pop("cnt").over(wt) > 0,
        (F.col("cnt") - F.avg("cnt").over(wt)) / F.stddev_pop("cnt").over(wt),
    ).otherwise(F.lit(0.0))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = dense.select(
        "event_type", "hour", F.sum(z).over(wc).alias("s")
    ).select(
        "event_type",
        "hour",
        (F.round("s", 6) + F.lit(0.0)).alias("s6"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s6")).desc(), F.col("hour").asc()
    )
    return (
        cusum.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_hours", F.count("*").over(Window.partitionBy("event_type")))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_hours").cast("long").alias("n_hours"),
            F.date_format("hour", _TS_FMT).alias("peak_hour"),
            F.col("s6").alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


def hourly_seasonality_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonal profile per event_type over the dense
    hourly series: mean count at each of the 24 hours-of-day and the
    seasonal index (hour-of-day mean / overall hourly mean) — the
    multiplicative decomposition a capacity planner reads ("3am runs
    at 0.2x, noon at 1.8x"). Returns 24 rows per type: (event_type,
    hod, n_hours, mean_cnt, seasonal_index).

    Scale shape: the per-(type, hod) aggregate runs over the calendar-
    bounded dense grid; the overall mean is a window total over the
    24-row profile — no second pass over data.
    """
    dense = _dense_hourly_counts(events)
    prof = dense.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("cnt").alias("sum_cnt"),
    )
    wt = Window.partitionBy("event_type")
    mean_cnt = F.col("sum_cnt") / F.col("n_hours")
    overall = F.sum("sum_cnt").over(wt) / F.sum("n_hours").over(wt)
    return (
        prof.select(
            "event_type",
            "hod",
            "n_hours",
            F.round(mean_cnt, 6).alias("mean_cnt"),
            F.round(
                F.when(overall > 0, mean_cnt / overall).otherwise(F.lit(0.0)), 6
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "hod")
    )


def seasonal_adjusted_anomalies(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Hours whose count is anomalous AFTER seasonal adjustment: z-score
    each dense hourly count against the mean/std of ITS OWN hour-of-day
    within its event_type, keep |z| >= threshold. The raw z-score pass
    (``value_mad_anomalies`` cousin) flags every busy noon; this one
    flags the noon that is busy FOR A NOON. Returns (event_type, hour,
    hod, cnt, z).

    Scale shape: same dense-grid economics as the profile; the
    per-(type, hod) moments come from one window over the grid, and
    the threshold filter is applied before any ordering.
    """
    dense = _dense_hourly_counts(events)
    wg = Window.partitionBy("event_type", "hod")
    z = F.when(
        F.stddev_pop("cnt").over(wg) > 0,
        (F.col("cnt") - F.avg("cnt").over(wg)) / F.stddev_pop("cnt").over(wg),
    )
    return (
        dense.withColumn("z", F.round(z, 6) + F.lit(0.0))
        # threshold compares the 6dp-ROUNDED z: the two engines
        # compute z independently, and a raw-z cut lets a boundary row
        # flip membership on an ulp — the rounded cut can only diverge
        # if the engines round differently at 1e-6, which the shared
        # rounding discipline already rules out everywhere else
        .where(F.abs(F.col("z")) >= threshold)
        .select(
            "event_type",
            F.date_format("hour", _TS_FMT).alias("hour"),
            "hod",
            F.col("cnt").cast("long").alias("cnt"),
            "z",
        )
        .orderBy("event_type", "hour")
    )


def seasonal_naive_backtest(events: DataFrame) -> DataFrame:
    """One-step forecast backtest on the dense hourly count series per
    event_type: naive (last hour) vs seasonal-naive (same hour
    yesterday, lag 24), MAE + RMSE over the common evaluation window
    and the skill score 1 - MAE_seasonal/MAE_naive — the standard
    "does seasonality beat persistence?" check run before shipping any
    fancier forecaster. Returns (event_type, n_eval, mae_naive,
    rmse_naive, mae_seasonal, rmse_seasonal, skill).

    Scale shape: two lags over the calendar-bounded dense series, one
    tiny agg; evaluation is restricted to hours where BOTH forecasts
    exist so the comparison is paired.
    """
    dense = _dense_hourly_counts(events)
    w = Window.partitionBy("event_type").orderBy("hour")
    scored = dense.select(
        "event_type",
        "cnt",
        F.lag("cnt", 1).over(w).alias("f_naive"),
        F.lag("cnt", 24).over(w).alias("f_seasonal"),
    ).where(F.col("f_seasonal").isNotNull())
    e_n = F.col("cnt") - F.col("f_naive")
    e_s = F.col("cnt") - F.col("f_seasonal")
    agg = scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.avg(F.abs(e_n)).alias("mae_n"),
        F.sqrt(F.avg(e_n * e_n)).alias("rmse_n"),
        F.avg(F.abs(e_s)).alias("mae_s"),
        F.sqrt(F.avg(e_s * e_s)).alias("rmse_s"),
    )
    return agg.select(
        "event_type",
        "n_eval",
        F.round("mae_n", 6).alias("mae_naive"),
        F.round("rmse_n", 6).alias("rmse_naive"),
        F.round("mae_s", 6).alias("mae_seasonal"),
        F.round("rmse_s", 6).alias("rmse_seasonal"),
        (
            F.round(
                F.when(
                    F.col("mae_n") > 0, 1.0 - F.col("mae_s") / F.col("mae_n")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("skill"),
    ).orderBy("event_type")


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-type inter-arrival-gap profile: gap count, mean / median /
    max gap in seconds, and the coefficient of variation — the
    Poisson-ness screen (CV ≈ 1 memoryless, CV ≫ 1 bursty, CV ≪ 1
    metronomic) that sits under rate-limit sizing and anomaly-alert
    tuning.

    Exactness: gaps are integer MICROSECONDS (unix_micros ↔ DuckDB's
    epoch_us — never the second-truncating unix_timestamp), so every
    Σ and Σ² in the variance closed form is exact decimal/integer
    arithmetic on any engine and partial-agg order; only the final
    double divisions round, identically. Ties on ts are broken by
    event_id so lag() is deterministic.

    Scale shape: one exchange on event_type for the lag window (types
    are a bounded dimension — the per-type series is the documented
    narrow-data partition; payload is 2 longs/row), then a single hash
    agg. percentile() is Spark's exact interpolated form == DuckDB's
    quantile_cont. Returns (event_type, n_gaps, mean_gap_s, p50_gap_s,
    max_gap_s, cv_gap).
    """
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = (
        events.select(
            "event_type", F.unix_micros("ts").alias("us"), "event_id"
        )
        .select(
            "event_type",
            (F.col("us") - F.lag("us").over(w)).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    s = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum(F.col("g").cast("decimal(28,0)")).alias("sg"),
        # multiply in DECIMAL: a multi-hour gap squared (~1.3e19 us^2)
        # overflows int64 BEFORE a post-hoc cast could save it
        F.sum(
            F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)")
        ).alias("sgg"),
        F.max("g").alias("max_us"),
        F.expr("percentile(g, 0.5)").alias("p50_us"),
    )
    n = F.col("n_gaps").cast("double")
    sg = F.col("sg").cast("double")
    sgg = F.col("sgg").cast("double")
    mean_us = sg / n
    # population std over exact sums; CV is scale-free so the 1e6
    # microsecond unit cancels
    var_us = (n * sgg - sg * sg) / (n * n)
    return s.where(F.col("n_gaps") > 0).select(
        "event_type",
        "n_gaps",
        F.round(mean_us / 1e6, 6).alias("mean_gap_s"),
        F.round(F.col("p50_us") / 1e6, 6).alias("p50_gap_s"),
        F.round(F.col("max_us") / 1e6, 6).alias("max_gap_s"),
        (
            F.round(
                F.when(sg > 0, F.sqrt(F.greatest(var_us, F.lit(0.0))) / mean_us), 6
            )
            + F.lit(0.0)
        ).alias("cv_gap"),
    )


def hourly_fano_burstiness(events: DataFrame) -> DataFrame:
    """Fano factor (index of dispersion, var/mean) of the DENSE hourly
    count series per event_type: 1 for a Poisson process, > 1 bursty
    /clustered, < 1 under-dispersed/regular — the one-number
    burstiness readout that complements the CUSUM changepoint and the
    seasonality profile over the same grid.

    Exactness: hourly counts are small integers, so Σc and Σc² are
    exact in doubles (far below 2^53) and the closed form
    (n·Σc² − (Σc)²)/(n·Σc) divides identically on any engine.

    Scale shape: identical to the other dense-grid operators — one
    data-sized hash agg, then everything is calendar-bounded.
    Returns (event_type, n_hours, mean_cnt, fano).
    """
    dense = _dense_hourly_counts(events)
    s = dense.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("cnt").alias("sc"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("scc"),
    )
    n = F.col("n_hours").cast("double")
    return s.where(F.col("sc") > 0).select(
        "event_type",
        "n_hours",
        F.round(F.col("sc") / n, 6).alias("mean_cnt"),
        F.round(
            (n * F.col("scc") - F.col("sc") * F.col("sc")) / (n * F.col("sc")), 6
        ).alias("fano"),
    )


def theil_u_event_transitions(events: DataFrame) -> DataFrame:
    """Theil's uncertainty coefficient U(next|prev) over the per-user
    event-type transition stream — "how predictable is the next
    action given the current one?", the single-number summary of the
    markov_transitions matrix (U=0: next type independent of
    current; U=1: fully determined — the scripted-client smell).

    Scale shape: one exchange on user_id for the lag window (shared
    shape with markov_transitions), then ONE hash agg to the
    n_types²-bounded pair table; H(next), H(next|prev) and U fold
    that tiny table through broadcast joins. Output is a single row.

    Returns (n_transitions, h_next, h_cond, theil_u) — entropies in
    nats; U is 0.0 when H(next) is degenerate.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = (
        events.select(
            F.lag("event_type").over(w).alias("prev_t"),
            F.col("event_type").alias("next_t"),
        )
        .where(F.col("prev_t").isNotNull())
        .groupBy("prev_t", "next_t")
        .agg(F.count("*").cast("double").alias("nij"))
    )
    prev_m = pair.groupBy("prev_t").agg(F.sum("nij").alias("ni"))
    next_m = pair.groupBy("next_t").agg(F.sum("nij").alias("nj"))
    tot = pair.agg(F.sum("nij").alias("n"))
    folded = (
        pair.join(F.broadcast(prev_m), "prev_t")
        .join(F.broadcast(next_m), "next_t")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.first("n").alias("n_d"),
            F.sum(
                (F.col("nij") / F.col("n")) * F.log(F.col("n") / F.col("nj"))
            ).alias("h_next_raw"),
            F.sum(
                (F.col("nij") / F.col("n")) * F.log(F.col("ni") / F.col("nij"))
            ).alias("h_cond_raw"),
        )
    )
    return folded.select(
        F.col("n_d").cast("long").alias("n_transitions"),
        (F.round("h_next_raw", 6) + F.lit(0.0)).alias("h_next"),
        (F.round("h_cond_raw", 6) + F.lit(0.0)).alias("h_cond"),
        (
            F.round(
                F.when(
                    F.col("h_next_raw") > 1e-12,
                    (F.col("h_next_raw") - F.col("h_cond_raw")) / F.col("h_next_raw"),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("theil_u"),
    )


def nelson_aalen_hazard(events: DataFrame) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate over the same censored
    per-user gap stream as km_gap_survival: H(t) = Σ_{gap≤t} d/n, the
    estimator of choice when the survival curve's tail is thin (it
    sums hazards instead of multiplying survivals, so it degrades
    gracefully at small n_at_risk), plus the −ln(KM) cross-check
    column — NA ≤ −ln(KM) always, equality in the continuous limit
    (asserted in tests).

    Scale shape: identical to km_gap_survival — one user-keyed lead
    window, a 1-row horizon broadcast, a minute-bucket hash agg, and
    windows over rows proportional to distinct gap minutes. Returns
    (gap_min, n_at_risk, n_deaths, na_cum_hazard, km_neg_log_surv);
    the −ln(KM) column is NULL at a bucket that kills everyone at
    risk (ln 0).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    horizon = F.broadcast(events.agg(F.max(F.col("ts").cast("double")).alias("h")))
    gaps = (
        events.select(
            "user_id",
            F.col("ts").cast("double").alias("tsd"),
            F.lead(F.col("ts").cast("double")).over(w).alias("nxt"),
        )
        .crossJoin(horizon)
        .select(
            F.floor(
                (F.coalesce(F.col("nxt"), F.col("h")) - F.col("tsd")) / 60.0
            ).cast("long").alias("gap_min"),
            F.col("nxt").isNull().cast("long").alias("censored"),
        )
    )
    buckets = gaps.groupBy("gap_min").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("n_deaths"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    wt = Window.orderBy("gap_min")
    prior = Window.orderBy("gap_min").rowsBetween(Window.unboundedPreceding, -1)
    total = Window.partitionBy()
    at_risk = (
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(total)
        - F.coalesce(
            F.sum(F.col("n_deaths") + F.col("n_censored")).over(prior), F.lit(0)
        )
    )
    hazarded = buckets.withColumn("n_at_risk", at_risk.cast("long")).select(
        "gap_min",
        "n_at_risk",
        "n_deaths",
        F.round(
            F.sum(F.col("n_deaths") / F.col("n_at_risk")).over(wt), 6
        ).alias("na_cum_hazard"),
        # d == n is only reachable at the LAST bucket (n_at_risk at a
        # bucket always covers its own d+c, so it hits zero nowhere);
        # NULL the −ln(KM) there explicitly — a window sum would just
        # skip the NULL term and silently repeat the prior cumsum
        F.when(F.col("n_deaths") == F.col("n_at_risk"), None)
        .otherwise(
            F.round(
                -F.sum(
                    # inner guard too: the ln(0) term still EVALUATES
                    # inside the window sum on the d==n row (DuckDB
                    # errors on ln(0)); NULL is skipped by sum, and the
                    # outer when nulls that row's output anyway
                    F.when(
                        F.col("n_deaths") == F.col("n_at_risk"), None
                    ).otherwise(
                        F.log(1.0 - F.col("n_deaths") / F.col("n_at_risk"))
                    )
                ).over(wt),
                6,
            )
        )
        .alias("km_neg_log_surv"),
    )
    return hazarded.orderBy("gap_min")


def changepoint_segmented_trend(events: DataFrame) -> DataFrame:
    """Piecewise-linear trend around the CUSUM changepoint: take each
    event type's maximum-likelihood single break (the peak-|CUSUM|
    hour, exactly as cusum_hourly_changepoint picks it), then fit
    separate OLS lines to the hourly counts BEFORE and AFTER the break
    and report both slopes plus the fitted level shift at the
    boundary — the "rate changed at 3am Tuesday: from +2/h drift to
    −9/h collapse with a −140 step" readout, composed entirely from
    operators this engine already trusts.

    Scale shape: one data-sized hourly hash agg; everything after
    (dense grid, CUSUM windows, breakpoint broadcast, two-segment
    moment fold) is calendar-bounded. The OLS moments are sums of
    INTEGER-valued terms (hour index × count), exact in doubles and
    therefore order-independent — no decimal staging needed.

    Returns (event_type, n_hours, break_hour, t_break, slope_pre,
    slope_post, level_shift); a degenerate segment (fewer than 2
    points) yields NULL slope/shift.
    """
    dense = _dense_hourly_counts(events)
    wt = Window.partitionBy("event_type")
    z = F.when(
        F.stddev_pop("cnt").over(wt) > 0,
        (F.col("cnt") - F.avg("cnt").over(wt)) / F.stddev_pop("cnt").over(wt),
    ).otherwise(F.lit(0.0))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wh = Window.partitionBy("event_type").orderBy("hour")
    # checkpointed: three plan consumers (breakpoint pick, segment
    # fold, final join) would each re-run the events scan + hourly agg
    # otherwise; cur is calendar-bounded (types × hours), so the cut
    # is cheap and the big-data pass happens exactly once
    cur = dense.select(
        "event_type",
        "hour",
        F.col("cnt").cast("double").alias("c"),
        F.row_number().over(wh).cast("double").alias("t"),
        (F.round(F.sum(z).over(wc), 6) + F.lit(0.0)).alias("s6"),
    ).localCheckpoint()
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s6")).desc(), F.col("hour").asc()
    )
    brk = (
        cur.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            F.col("event_type").alias("b_type"),
            F.col("t").alias("tb"),
            F.date_format("hour", _TS_FMT).alias("break_hour"),
        )
    )
    seg = cur.join(
        F.broadcast(brk), F.col("event_type") == F.col("b_type")
    ).withColumn("pre", (F.col("t") <= F.col("tb")).cast("int"))
    m = seg.groupBy("event_type", "pre").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("t").alias("st"),
        F.sum("c").alias("sc"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("c")).alias("stc"),
    )
    sxx = F.col("stt") - F.col("st") * F.col("st") / F.col("n")
    slope = F.when(
        sxx > 1e-9,
        (F.col("stc") - F.col("st") * F.col("sc") / F.col("n")) / sxx,
    )
    intercept = (F.col("sc") - slope * F.col("st")) / F.col("n")
    fitted = m.select(
        "event_type",
        "pre",
        "n",
        slope.alias("b"),
        intercept.alias("a"),
    )
    piv = fitted.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_hours"),
        F.max(F.when(F.col("pre") == 1, F.col("b"))).alias("b_pre"),
        F.max(F.when(F.col("pre") == 1, F.col("a"))).alias("a_pre"),
        F.max(F.when(F.col("pre") == 0, F.col("b"))).alias("b_post"),
        F.max(F.when(F.col("pre") == 0, F.col("a"))).alias("a_post"),
    )
    return (
        piv.join(
            F.broadcast(brk), F.col("event_type") == F.col("b_type")
        )
        .select(
            "event_type",
            "n_hours",
            "break_hour",
            F.col("tb").cast("long").alias("t_break"),
            (F.round("b_pre", 6) + F.lit(0.0)).alias("slope_pre"),
            (F.round("b_post", 6) + F.lit(0.0)).alias("slope_post"),
            # discontinuity measured at the SAME point (the segment
            # boundary t_b + ½): both fits evaluated there, so a
            # continuous trend reads shift 0 instead of its own step
            (
                F.round(
                    (F.col("a_post") + F.col("b_post") * (F.col("tb") + 0.5))
                    - (F.col("a_pre") + F.col("b_pre") * (F.col("tb") + 0.5)),
                    6,
                )
                + F.lit(0.0)
            ).alias("level_shift"),
        )
        .orderBy("event_type")
    )
