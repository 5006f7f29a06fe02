package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series join operators Spark has no native primitive for — each
  * implemented as the composition that SCALES, not the naive inequality
  * join (which Catalyst can only execute as a broadcast-nested-loop):
  *
  *  - as-of join (q51): most recent prior event of another stream, via a
  *    union + ordered window carry — ONE shuffle on the key, no join
  *    explosion, state bounded by the carry column. This is the classic
  *    scalable as-of shape (same trick kdb/Flink use internally).
  *  - interval range join (q52): containment join rewritten as a
  *    time-bucketed equi-join + exact filter — the inequality predicate
  *    only runs inside (key, bucket) pairs, so the plan is a hash join at
  *    any scale instead of O(n·m) nested loops.
  */
object TimeJoins {

  def defs: Seq[QueryDef] = Seq(q51, q52, q91, q100, q105, q107, q108, q109, q114,
    q122, q124, q162, q163, q165, q184, q185, q186, q190, q200, q203, q205,
    q206, q207, q209, q210, q214, q217, q232, q238, q251, q253)

  /** As-of join: for every 'click' event, the most recent 'view' event by
    * the same user at-or-before it (order = (ts, event_id), so ties are
    * deterministic). Spark shape: tag both streams, one window pass
    * carrying the last non-null view id — the 100 TB plan is shuffle on
    * user_id + per-partition sort, nothing quadratic.
    */
  val q51: QueryDef = QueryDef.checked(
    "q51_asof_join",
    """WITH t AS (
      |  SELECT event_id, user_id, ts, event_type FROM events
      |  WHERE event_type IN ('click', 'view')),
      |w AS (
      |  SELECT *, last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_view_id
      |  FROM t)
      |SELECT event_id AS click_id, user_id, prev_view_id
      |FROM w WHERE event_type = 'click' ORDER BY click_id""".stripMargin) { (s, d) =>
    val t = Tables.events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("prev_view_id",
        last(when(col("event_type") === "view", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("prev_view_id"))
      .orderBy(col("click_id"))
  }

  /** Interval range join: events ↔ per-user activity intervals
    * (purchase-anchored ±30 minutes), matching every event inside an
    * interval of the SAME user. Naive form is an inequality join →
    * BroadcastNestedLoop at scale. Scale form here: both sides mapped to
    * 30-minute epoch buckets (an interval spans ≤ 3 buckets → explode),
    * equi-join on (user_id, bucket), exact containment filter, distinct.
    * Identical result, hash-join plan. The oracle is the naive SQL.
    */
  val q52: QueryDef = QueryDef.checked(
    "q52_interval_range_join",
    """SELECT i.anchor_id, e.event_id
      |FROM (SELECT event_id AS anchor_id, user_id,
      |             ts - INTERVAL 30 MINUTE AS lo, ts + INTERVAL 30 MINUTE AS hi
      |      FROM events WHERE event_type = 'purchase') i
      |JOIN events e ON e.user_id = i.user_id
      |  AND e.ts >= i.lo AND e.ts <= i.hi AND e.event_id <> i.anchor_id
      |ORDER BY anchor_id, event_id""".stripMargin) { (s, d) =>
    val bucketSec = 1800L // bucket = the interval half-width → ≤3 buckets/interval
    // Buckets come from second-TRUNCATED epochs (cheap longs); the exact
    // containment below compares full-precision timestamps. Truncation
    // keeps bucket coverage a superset of the exact range:
    // e.ts ≥ p.ts−1800 ⇒ floor(e) ≥ floor(p)−1800, and symmetrically for
    // the upper bound — so no exact match can land outside the probed
    // buckets, and the exact filter never disagrees with the oracle.
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), unix_timestamp(col("ts")).as("sec"))
    val intervals = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id").as("iuser"),
        (col("ts") - expr("INTERVAL 30 MINUTE")).as("lo_ts"),
        (col("ts") + expr("INTERVAL 30 MINUTE")).as("hi_ts"),
        (col("sec") - 1800L).as("lo"), (col("sec") + 1800L).as("hi"))
      .withColumn("bucket",
        explode(sequence(floor(col("lo") / bucketSec), floor(col("hi") / bucketSec))))
    val sides = ev.select(col("event_id"), col("user_id"), col("ts").as("ets"),
      floor(col("sec") / bucketSec).as("bucket"))
    intervals.join(sides,
        intervals("iuser") === sides("user_id") &&
          intervals("bucket") === sides("bucket"))
      .filter(col("ets") >= col("lo_ts") && col("ets") <= col("hi_ts") &&
        col("event_id") =!= col("anchor_id"))
      // no dedup needed: the event side has exactly ONE bucket and the
      // interval side explodes DISTINCT bucket values, so each
      // (interval, event) pair joins at most once
      .select(col("anchor_id"), col("event_id"))
      .orderBy(col("anchor_id"), col("event_id"))
  }

  /** Ordered-sequence conversion funnel (view → click → purchase): for
    * each user, the first view, the first click at-or-after that view,
    * and the first purchase at-or-after that click. The classic
    * product-analytics funnel, built the scale-correct way: ONE shuffle
    * on user_id, one per-user sort, and three stacked running-min
    * window projections (each stage's "reached" marker gates the next
    * stage's candidate timestamps) — no self-joins, no per-stage passes
    * over the event log. Rows per user, nulls where the funnel was
    * never completed.
    */
  def conversionFunnel(events: DataFrame,
      stages: (String, String, String) = ("view", "click", "purchase")): DataFrame = {
    val (s1, s2, s3) = stages
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .withColumn("v_seen",
        min(when(col("event_type") === s1, col("ts"))).over(w))
      .withColumn("c_ok",
        when(col("event_type") === s2 && col("v_seen").isNotNull, col("ts")))
      .withColumn("c_seen", min(col("c_ok")).over(w))
      .withColumn("p_ok",
        when(col("event_type") === s3 && col("c_seen").isNotNull, col("ts")))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === s1, col("ts"))).as("t_view"),
        min(col("c_ok")).as("t_click"),
        min(col("p_ok")).as("t_purchase"))
  }

  /** Batch gap sessionization: split each user's event stream into
    * sessions wherever the gap to the previous event exceeds
    * `gapSeconds`, then aggregate per session. The batch complement of
    * `StreamingOps.sessionizeWithTimers` (and of builtin
    * `session_window`) — one shuffle on user_id, one per-user sort,
    * two window projections (lag → running sum of session-start
    * flags), then the per-session aggregate reuses the same
    * partitioning. Nothing quadratic, state bounded per user. Gap
    * arithmetic runs on the raw nanosecond epochs (`ts_ns`), not
    * second-truncated timestamps, so boundary events land identically
    * in both engines.
    */
  def gapSessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("ts_ns"), col("event_id"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ns").isNull ||
          col("ts_ns") - col("prev_ns") > gapSeconds * 1000000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("sum_value"))
  }

  /** q100: 1-hour-gap sessions over the events table — session bounds,
    * event count, and exact-decimal value sum per session, hash-checked
    * against the same lag/running-sum construction in DuckDB.
    */
  val q100: QueryDef = QueryDef.checked(
    "q100_gap_sessions",
    """WITH t AS (
      |  SELECT user_id, ts, event_id, epoch_ns(ts) AS tns,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN lag(tns) OVER w IS NULL
      |      OR tns - lag(tns) OVER w > 3600000000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM m)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  MIN(ts) AS session_start,
      |  MAX(ts) AS session_end, COUNT(*) AS n_events,
      |  CAST(SUM(v) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin) { (s, d) =>
    gapSessions(Tables.events(s, d), gapSeconds = 3600L)
      .orderBy(col("user_id"), col("session_no"))
  }

  /** Time-series anomaly flags via EXACT integer algebra: per
    * (series, hour) counts, flagged when the hour deviates from its
    * series mean by more than 3 population standard deviations. The
    * z-score rule |c − μ| > 3σ is squared into pure BIGINT arithmetic —
    * (D·c − S)² > 9·(D·Q − S²) with D = #hours, S = Σc, Q = Σc² — so
    * there is no float mean/stddev to drift between engines. Shape:
    * two keyed aggs (hour roll-up, then per-series moments) and a
    * broadcast of the tiny per-series stats frame back onto the hourly
    * rows. At 100 TB the hourly frame is ~series×hours rows — the
    * heavy input never leaves the first map-side-combined agg.
    */
  def hourlyAnomalies(events: DataFrame,
      seriesCol: String = "event_type"): DataFrame = {
    val hourly = events
      .groupBy(col(seriesCol), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      // feeds the moments agg AND the final join — persist so the event
      // scan runs once (Verify/Bench clear the cache between queries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = hourly.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("q"))
    hourly.join(broadcast(stats), seriesCol)
      .select(col(seriesCol), col("hour"), col("n"),
        ((col("d") * col("n") - col("s")) * (col("d") * col("n") - col("s")))
          .as("dev2"),
        (lit(9L) * (col("d") * col("q") - col("s") * col("s"))).as("bound"))
      .withColumn("is_anomaly", col("dev2") > col("bound"))
  }

  /** q105: 3σ hourly anomaly flags per event type over the events
    * table, hash-checked — including the exact squared-deviation and
    * bound columns — against the same integer algebra in DuckDB.
    */
  val q105: QueryDef = QueryDef.checked(
    "q105_hourly_anomalies",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, COUNT(*) AS d, CAST(SUM(n) AS BIGINT) AS s,
      |    CAST(SUM(n * n) AS BIGINT) AS q
      |  FROM hourly GROUP BY 1)
      |SELECT h.event_type, h.hour, h.n,
      |  (d * n - s) * (d * n - s) AS dev2,
      |  9 * (d * q - s * s) AS bound,
      |  (d * n - s) * (d * n - s) > 9 * (d * q - s * s) AS is_anomaly
      |FROM hourly h JOIN stats USING (event_type)
      |ORDER BY event_type, hour""".stripMargin) { (s, d) =>
    hourlyAnomalies(Tables.events(s, d))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Trailing time-window metrics: at every event, the count and
    * exact-decimal value sum of the same user's events in the
    * preceding `windowSeconds` (inclusive). A RANGE frame over the raw
    * nanosecond epoch — the trailing-24h/rate-limit/velocity shape —
    * one shuffle on user_id, one per-user sort, state bounded by the
    * window span. Count and sum are tie-order-independent, so the
    * result is deterministic even when events share a timestamp.
    */
  def trailingWindow(events: DataFrame, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
      .rangeBetween(-windowSeconds * 1000000000L, 0L)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("ts_ns"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .withColumn("n_trail", count(lit(1)).over(w))
      .withColumn("sum_trail", sum(col("v")).over(w).cast("double"))
      .drop("v", "ts_ns")
  }

  /** q107: trailing-24h activity per user at every event, hash-checked
    * against the same RANGE frame over nanosecond epochs in DuckDB.
    */
  val q107: QueryDef = QueryDef.checked(
    "q107_trailing_window",
    """SELECT event_id, user_id, ts,
      |  COUNT(*) OVER w AS n_trail,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trail
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |  RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    trailingWindow(Tables.events(s, d), windowSeconds = 86400L)
      .orderBy(col("event_id"))
  }

  /** Retention cohort matrix: users cohorted by first-active day,
    * counted on each later day-offset they return. The canonical
    * product-analytics retention triangle. Shape: one distinct over
    * (user, day) — map-side combined — then a per-user window min
    * (reuses the same user partitioning), a row-local offset, and a
    * small final agg. No join against a separate first-seen frame, so
    * the event log is shuffled once.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id"))
    activity
      .withColumn("cohort", min(col("day")).over(w))
      .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** q108: the retention triangle of the events table (rows = cohort
    * first-day, columns = day offset), hash-checked against the same
    * window-min construction in DuckDB.
    */
  val q108: QueryDef = QueryDef.checked(
    "q108_retention_cohorts",
    """WITH activity AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |tagged AS (
      |  SELECT user_id, day,
      |    min(day) OVER (PARTITION BY user_id) AS cohort
      |  FROM activity)
      |SELECT cohort, date_diff('day', cohort, day) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM tagged GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin) { (s, d) =>
    retentionCohorts(Tables.events(s, d))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** A/B experiment readout: users split 50/50 by the salted-md5
    * assignment ([[Sampling.hashSplit]] — the same deterministic
    * bucketing a real experimentation system uses), outcome = did the
    * user ever fire `goalType`. The 2×2 contingency table and the
    * chi-square statistic come out in EXACT integer arithmetic —
    * χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) with the ratio snapped to a
    * micro grid — so the readout hash-matches across engines (the
    * float χ² itself never crosses an engine boundary). Shape: ONE
    * keyed aggregate over the event log (map-side combined) computes
    * user-distinctness and ever-converted together — the naive
    * distinct-users ⟕ distinct-converters form costs two full
    * exchanges of the log plus a join for the identical 2×2 table (at
    * 100 TB that is two extra shuffles of the widest table in the
    * system; on the bench it was 6 AQE jobs vs 4, a 2× fixed-latency
    * level shift — round-13 fix, tools/Q109Profile) — then the
    * hash-split and one global conditional agg → a single row.
    */
  def abTestReadout(events: DataFrame, goalType: String,
      goalMinValue: Double, salt: String = "exp1"): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(
      max(when(col("event_type") === goalType &&
        col("value") >= goalMinValue, 1L).otherwise(0L)).as("conv"))
    val table = Sampling.hashSplit(perUser, "user_id",
        Seq("A" -> 0.5, "B" -> 0.5), salt = salt)
      .agg(
        sum(when(col("split") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("split") === "A", col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("split") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("split") === "B", col("conv")).otherwise(0L)).as("conv_b"))
    val den = col("n_a") * col("n_b") *
      (col("conv_a") + col("conv_b")) *
      (col("n_a") + col("n_b") - col("conv_a") - col("conv_b"))
    table.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      // degenerate tables (all / none converted, an empty arm) have no
      // defined χ² — null, not a divide-by-zero (ANSI) or ±inf
      when(den === 0L, lit(null).cast("long"))
        .otherwise(round(lit(1000000.0) *
          ((col("n_a") + col("n_b")) *
            pow(col("conv_a") * (col("n_b") - col("conv_b")) -
                col("conv_b") * (col("n_a") - col("conv_a")), 2)) / den)
          .cast("long")).as("chi2_micro"))
  }

  /** q109: purchase-conversion A/B readout over the events table,
    * hash-checked against the same md5 assignment and integer
    * chi-square algebra in DuckDB.
    */
  val q109: QueryDef = QueryDef.checked(
    "q109_ab_chi_square",
    """WITH users AS (
      |  SELECT DISTINCT user_id FROM events),
      |assigned AS (
      |  SELECT user_id,
      |    CASE WHEN ('0x' || substring(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      |      / 4294967296.0 < 0.5 THEN 'A' ELSE 'B' END AS split
      |  FROM users),
      |conv AS (
      |  SELECT DISTINCT user_id, 1 AS conv FROM events
      |  WHERE event_type = 'purchase' AND value >= 144.0),
      |t AS (
      |  SELECT CAST(SUM(CASE WHEN split = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN split = 'A' THEN COALESCE(conv, 0) ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(SUM(CASE WHEN split = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN split = 'B' THEN COALESCE(conv, 0) ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM assigned LEFT JOIN conv USING (user_id))
      |SELECT n_a, conv_a, n_b, conv_b,
      |  CASE WHEN n_a * n_b * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b) = 0
      |    THEN NULL
      |    ELSE CAST(ROUND(1000000.0 *
      |      ((n_a + n_b) * pow(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a), 2)) /
      |      (n_a * n_b * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b)))
      |      AS BIGINT) END AS chi2_micro
      |FROM t""".stripMargin) { (s, d) =>
    abTestReadout(Tables.events(s, d), goalType = "purchase", goalMinValue = 144.0)
  }

  /** Feature-store export: one row per user with the standard
    * behavioral features — total events, per-type counts rendered as a
    * canonical sorted `type:count` CSV (a deterministic, engine-neutral
    * serialization of the map column a feature store would ingest),
    * last-seen timestamp, active-day count, and exact-decimal value
    * sum. Two keyed aggs (the (user, type) roll-up feeds the map; the
    * event-level agg keeps last_ts/days exact) joined on the SAME user
    * key — at 100 TB both sides arrive hash-partitioned on user_id, so
    * the join is a co-partitioned zip, not a third full shuffle of the
    * event log.
    */
  def userFeatures(events: DataFrame): DataFrame = {
    val byType = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"),
        concat_ws(",", sort_array(collect_list(
          concat(col("event_type"), lit(":"), col("n"))))).as("type_counts"))
    val level = events.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"),
        count_distinct(date_trunc("day", col("ts"))).as("n_days"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
    byType.join(level, "user_id")
  }

  /** q114: behavioral feature rows for every user in the events table,
    * hash-checked — including the canonical feature CSV — against
    * DuckDB's ordered string_agg build of the same features.
    */
  val q114: QueryDef = QueryDef.checked(
    "q114_user_features",
    """WITH bt AS (
      |  SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
      |    string_agg(event_type || ':' || n, ',' ORDER BY event_type || ':' || n)
      |      AS type_counts
      |  FROM bt GROUP BY 1),
      |lv AS (
      |  SELECT user_id, MAX(ts) AS last_ts,
      |    COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1)
      |SELECT user_id, n_events, type_counts, last_ts, n_days, sum_value
      |FROM m JOIN lv USING (user_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    userFeatures(Tables.events(s, d))
      .select(col("user_id"), col("n_events"), col("type_counts"),
        col("last_ts"), col("n_days"), col("sum_value"))
      .orderBy(col("user_id"))
  }

  /** Per-series trend detection via exact least-squares algebra: the
    * regression slope of daily counts over the day index, kept as an
    * exact integer numerator/denominator — slope = (D·Σxy − Σx·Σy) /
    * (D·Σx² − (Σx)²) — plus the ratio snapped to a micro grid. The
    * monitoring complement of q105 (is this series GROWING, not just
    * spiking). All moments are BIGINT sums over day-index × count
    * pairs; the only float is the final snapped ratio. Two keyed aggs,
    * map-side combined; output rows = #series.
    */
  def dailyTrends(events: DataFrame,
      seriesCol: String = "event_type"): DataFrame = {
    val daily = events
      .groupBy(col(seriesCol), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val indexed = daily.withColumn("x",
      datediff(col("day"), min(col("day")).over(
        Window.partitionBy(col(seriesCol)))).cast("long"))
    indexed.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("d"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(seriesCol),
        (col("d") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("d") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope_micro",
        when(col("slope_den") === 0L, lit(null).cast("long"))
          .otherwise(round(lit(1000000.0) * col("slope_num") / col("slope_den"))
            .cast("long")))
  }

  /** q122: events-per-day trend per event type, hash-checked —
    * including the exact numerator/denominator — against the same
    * algebra in DuckDB.
    */
  val q122: QueryDef = QueryDef.checked(
    "q122_daily_trends",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, y,
      |    date_diff('day', min(day) OVER (PARTITION BY event_type), day) AS x
      |  FROM daily),
      |m AS (
      |  SELECT event_type, COUNT(*) AS d, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM idx GROUP BY 1)
      |SELECT event_type,
      |  d * sxy - sx * sy AS slope_num,
      |  d * sxx - sx * sx AS slope_den,
      |  CASE WHEN d * sxx - sx * sx = 0 THEN NULL
      |    ELSE CAST(ROUND(1000000.0 * (d * sxy - sx * sy) / (d * sxx - sx * sx))
      |      AS BIGINT) END AS slope_micro
      |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
    dailyTrends(Tables.events(s, d)).orderBy(col("event_type"))
  }

  /** Event-transition matrix (first-order Markov statistics): counts of
    * consecutive (current → next) event-type pairs per user stream,
    * with the conditional probability snapped to a ppm grid from exact
    * integer counts. The behavioral-modeling pass (what follows what);
    * one user shuffle for the lag window, then a tiny keyed agg.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      // feeds the totals agg AND the final join — persist so the lag
      // window over the event log runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(totals, "event_type")
      .withColumn("p_ppm",
        round(lit(1000000.0) * col("n") / col("n_from")).cast("long"))
  }

  /** q124: the 5×5 event-type transition matrix of the events table,
    * hash-checked — counts and ppm-snapped conditional probabilities —
    * against the same lead-window construction in DuckDB.
    */
  val q124: QueryDef = QueryDef.checked(
    "q124_transition_matrix",
    """WITH t AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type, next_type, COUNT(*) AS n
      |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_from
      |  FROM pairs GROUP BY 1)
      |SELECT p.event_type, p.next_type, p.n, t.n_from,
      |  CAST(ROUND(1000000.0 * p.n / t.n_from) AS BIGINT) AS p_ppm
      |FROM pairs p JOIN tot t USING (event_type)
      |ORDER BY event_type, next_type""".stripMargin) { (s, d) =>
    transitionMatrix(Tables.events(s, d))
      .select(col("event_type"), col("next_type"), col("n"), col("n_from"),
        col("p_ppm"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** q91: the view→click→purchase funnel over the events table,
    * hash-checked (timestamps and nulls) against the same stacked
    * windows in DuckDB.
    */
  val q91: QueryDef = QueryDef.checked(
    "q91_conversion_funnel",
    """WITH s1 AS (SELECT user_id, ts, event_type, event_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS v_seen
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s2 AS (SELECT *, CASE WHEN event_type = 'click' AND v_seen IS NOT NULL
      |    THEN ts END AS c_ok FROM s1),
      |s3 AS (SELECT *, min(c_ok) OVER w AS c_seen
      |  FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND c_seen IS NOT NULL
      |    THEN ts END AS p_ok FROM s3)
      |SELECT user_id,
      |  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |  min(c_ok) AS t_click,
      |  min(p_ok) AS t_purchase
      |FROM s4 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    conversionFunnel(Tables.events(s, d)).orderBy(col("user_id"))
  }

  /** Sequential path mining over event journeys: each (user, day) is a
    * JOURNEY — the ordered event-type sequence of that user's day —
    * and journeys are counted by full path string. The sequence-level
    * complement to q124's first-order transition matrix: a transition
    * matrix cannot distinguish view>click>view from view>click +
    * click>view split across days; path counting can (behavior-flow /
    * funnel-discovery analytics, and the corpus statistic behind
    * next-event-prediction training mixes). Deterministic: in-day
    * order is (ts_ns, event_id); day = ts_ns div 86400e9 (integer
    * grid, no timezone negotiation).
    *
    * Shape: one (user, day)-keyed agg assembling each path via the
    * q83/q154 sort-struct reassembly idiom, then one path-keyed count
    * — both map-side combined; path cardinality is bounded by journey
    * count, fanout by events/user/day. No windows, no joins.
    */
  def dailyJourneys(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
        col("ts_ns"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"), col("day"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts_ns"), col("event_id"),
          col("event_type")))),
        s => s.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_journeys"))

  /** Position-based multi-touch attribution — the marketing-analytics
    * classic (and the credit-assignment shape behind reward attribution
    * in interaction logs): each conversion distributes credit over the
    * touchpoints that preceded it within a lookback window — 40 % to
    * the first touch, 40 % to the last, 20 % split over the middles
    * (U-shaped attribution). Credit is integer BASIS POINTS with floor
    * division (n = 1 → 10000; n = 2 → 5000/5000; n ≥ 3 → 4000 / 4000 /
    * 2000 div (n−2) each — the sub-bp remainder of the middle split is
    * deliberately unassigned, keeping every value exact in any engine).
    *
    * Shape: one user-keyed equi-join with a time-range predicate
    * (touches × conversions co-partitioned by user — never a nested
    * loop), then one (conversion)-keyed window for position ranks.
    */
  def positionAttribution(events: DataFrame, touchType: String = "click",
      convType: String = "purchase", lookbackDays: Long = 7L): DataFrame = {
    val touches = events.filter(col("event_type") === touchType)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts_ns").as("touch_ns"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts_ns").as("conv_ns"))
    val win = lookbackDays * 86400000000000L
    val w = Window.partitionBy(col("conv_id"))
    val wo = w.orderBy(col("touch_ns"), col("touch_id"))
    convs.join(touches, Seq("user_id"))
      .filter(col("touch_ns") <= col("conv_ns") &&
        col("touch_ns") > col("conv_ns") - win)
      .withColumn("pos", row_number().over(wo).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("credit_bp",
        when(col("n") === 1, lit(10000L))
          .when(col("n") === 2, lit(5000L))
          .when(col("pos") === 1 || col("pos") === col("n"), lit(4000L))
          .otherwise(expr("CAST(2000 div (n - 2) AS LONG)")))
      .select(col("conv_id"), col("touch_id"), col("pos"), col("n"),
        col("credit_bp"))
  }

  /** q163: U-shaped attribution of purchases to same-user clicks in a
    * 7-day lookback — every (conversion, touch) credit row hash-checked
    * against the identical integer arithmetic in DuckDB.
    */
  val q163: QueryDef = QueryDef.checked(
    "q163_attribution",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns, event_type
      |  FROM events),
      |pairs AS (
      |  SELECT c.event_id AS conv_id, k.event_id AS touch_id,
      |    k.tns AS touch_ns
      |  FROM t c JOIN t k ON c.user_id = k.user_id
      |  WHERE c.event_type = 'purchase' AND k.event_type = 'click'
      |    AND k.tns <= c.tns AND k.tns > c.tns - 604800000000000),
      |ranked AS (
      |  SELECT conv_id, touch_id,
      |    ROW_NUMBER() OVER (PARTITION BY conv_id
      |      ORDER BY touch_ns, touch_id) AS pos,
      |    COUNT(*) OVER (PARTITION BY conv_id) AS n
      |  FROM pairs)
      |SELECT conv_id, touch_id, pos, n,
      |  CASE WHEN n = 1 THEN 10000
      |       WHEN n = 2 THEN 5000
      |       WHEN pos = 1 OR pos = n THEN 4000
      |       ELSE 2000 // (n - 2) END AS credit_bp
      |FROM ranked ORDER BY conv_id, touch_id""".stripMargin) { (s, d) =>
    positionAttribution(Tables.events(s, d))
      .select(col("conv_id"), col("touch_id"), col("pos"), col("n"),
        col("credit_bp"))
      .orderBy(col("conv_id"), col("touch_id"))
  }

  /** Trailing distinct actives — the DAU/WAU/MAU family computed
    * EXACTLY: for every calendar day, the count of distinct users seen
    * in the trailing `windowDays` days. Sliding DISTINCT does not
    * decompose into window aggregates (distinct is not subtractable),
    * so the standard exact shape is: dedup to (day, user) once, then a
    * bounded day-range self-expansion — each (day, user) row fans out
    * to the ≤ `windowDays` report days it contributes to (a generate/
    * explode, not a join), then one distinct-count per report day.
    * Fanout is the window length, a constant; at 100 TB the frame that
    * fans out is the (day, user) dedup — #actives·days rows, already
    * orders of magnitude below the event log. (The approximate
    * alternative is q96's mergeable HLL sketches; this is the exact
    * baseline that certifies them.)
    */
  def trailingActives(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val du = events
      .select(expr("ts_ns div 86400000000000").as("day"), col("user_id"))
      .distinct()
    val allDays = events
      .select(expr("ts_ns div 86400000000000").as("rday")).distinct()
    du.select(col("day"), col("user_id"),
        explode(sequence(col("day"),
          col("day") + (windowDays - 1))).as("rday"))
      .join(allDays, Seq("rday")) // only days that exist in the data
      .groupBy(col("rday").as("day"))
      .agg(countDistinct(col("user_id")).as("actives"))
  }

  /** q165: exact trailing-7-day distinct actives per day, hash-checked
    * against DuckDB counting distinct users over the same day range.
    */
  val q165: QueryDef = QueryDef.checked(
    "q165_trailing_actives",
    """WITH du AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day AS rday FROM du)
      |SELECT d.rday AS day, COUNT(DISTINCT u.user_id) AS actives
      |FROM days d JOIN du u
      |  ON u.day BETWEEN d.rday - 6 AND d.rday
      |GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    trailingActives(Tables.events(s, d), windowDays = 7)
      .orderBy(col("day"))
  }

  /** q162: journey-path counts over the events table, hash-checked —
    * every distinct path string and its count — against DuckDB's
    * ordered string_agg replay.
    */
  val q162: QueryDef = QueryDef.checked(
    "q162_daily_journeys",
    """WITH t AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |    epoch_ns(ts) AS tns, event_id, event_type
      |  FROM events),
      |p AS (
      |  SELECT user_id, day,
      |    string_agg(event_type, '>' ORDER BY tns, event_id) AS path
      |  FROM t GROUP BY 1, 2)
      |SELECT path, COUNT(*) AS n_journeys
      |FROM p GROUP BY 1 ORDER BY path""".stripMargin) { (s, d) =>
    dailyJourneys(Tables.events(s, d)).orderBy(col("path"))
  }

  // ---------------------------------------------------------------------
  // Per-series smoothing / drift detection (integer-grid, exact)
  // ---------------------------------------------------------------------

  /** The events `value` column as exact integer cents: the DECIMAL(18,2)
    * cast (the repo-wide idiom for this double column — see q100/q107)
    * scaled to BIGINT. Exact and engine-agnostic: both Spark and DuckDB
    * round the double to 2 decimal digits the same way on this data, and
    * `* 100` of a 2-digit decimal is integral by construction.
    */
  private def centsSeries(events: DataFrame): DataFrame =
    events.select(
      col("user_id"), col("event_id"), col("ts_ns").as("tns"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))

  /** EWMA with dyadic weights over a bounded history — the streaming-
    * feature shape ("smoothed metric per entity") kept EXACT: weight
    * 2^(7-i) for lag i, i = 0..7, missing history contributing 0. A true
    * infinite-history EWMA is a recurrence (not expressible as a window
    * aggregate, and float besides); the 8-term dyadic truncation is the
    * standard bounded-state approximation — error < 2^-8 of the weight
    * mass — and every term is an integer, so the oracle hash is stable.
    *
    * Spark shape: ONE shuffle on user_id, one per-partition sort, then 8
    * constant lag reads per row inside a single window — no join, no
    * state beyond the 8-row frame. At 100 TB this is the minimal plan
    * for any per-entity trailing feature.
    */
  def ewmaDyadic(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tns"), col("event_id"))
    val terms = (0 to 7).map { i =>
      coalesce(lag(col("v"), i).over(w), lit(0L)) * lit(1L << (7 - i))
    }.reduce(_ + _)
    centsSeries(events).withColumn("ewma_scaled", terms)
      .select(col("user_id"), col("event_id"), col("ewma_scaled"))
  }

  /** q184: dyadic-weight EWMA of event value per user, every row
    * hash-checked against the identical 8-term lag sum in DuckDB.
    */
  val q184: QueryDef = QueryDef.checked(
    "q184_ewma",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events)
      |SELECT user_id, event_id,
      |  COALESCE(lag(v, 0) OVER w, 0) * 128 + COALESCE(lag(v, 1) OVER w, 0) * 64
      |  + COALESCE(lag(v, 2) OVER w, 0) * 32 + COALESCE(lag(v, 3) OVER w, 0) * 16
      |  + COALESCE(lag(v, 4) OVER w, 0) * 8 + COALESCE(lag(v, 5) OVER w, 0) * 4
      |  + COALESCE(lag(v, 6) OVER w, 0) * 2 + COALESCE(lag(v, 7) OVER w, 0)
      |  AS ewma_scaled
      |FROM t
      |WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    ewmaDyadic(Tables.events(s, d)).orderBy(col("user_id"), col("event_id"))
  }

  /** Lag-k sign-autocorrelation per series: do consecutive deltas k steps
    * apart move the same way? The exact-integer stand-in for the float
    * autocorrelation coefficient: per user, count the (sign(Δ_t),
    * sign(Δ_{t-k})) pairs where both are non-zero, and how many agree.
    * n_agree/n_pairs ≈ (1+ρ)/2 for an AR-ish series; keeping the two
    * counts separate (instead of dividing) keeps the output integer.
    *
    * Same minimal plan as q184: shuffle on user_id, one sorted window
    * pass (two lags), one hash aggregation.
    */
  def signAutocorrelation(events: DataFrame, k: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tns"), col("event_id"))
    val d = centsSeries(events)
      .withColumn("dlt", col("v") - lag(col("v"), 1).over(w))
      .withColumn("sgn",
        when(col("dlt") > 0, 1L).when(col("dlt") < 0, -1L).otherwise(
          when(col("dlt").isNull, lit(null).cast("long")).otherwise(0L)))
      .withColumn("psgn", lag(col("sgn"), k).over(w))
    d.filter(col("sgn").isNotNull && col("psgn").isNotNull &&
        col("sgn") =!= 0 && col("psgn") =!= 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sgn") === col("psgn"), 1L).otherwise(0L)).as("n_agree"))
  }

  /** q185: lag-2 sign-autocorrelation counts per user, hash-checked
    * against the identical window/filter/aggregate in DuckDB.
    */
  val q185: QueryDef = QueryDef.checked(
    "q185_sign_autocorrelation",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |dl AS (
      |  SELECT user_id, event_id, tns,
      |    v - lag(v, 1) OVER w AS dlt
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
      |sg AS (
      |  SELECT user_id, event_id, tns,
      |    CASE WHEN dlt > 0 THEN 1 WHEN dlt < 0 THEN -1
      |         WHEN dlt IS NULL THEN NULL ELSE 0 END AS sgn
      |  FROM dl),
      |pr AS (
      |  SELECT user_id, sgn, lag(sgn, 2) OVER w AS psgn
      |  FROM sg WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
      |SELECT user_id, COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN sgn = psgn THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
      |FROM pr
      |WHERE sgn IS NOT NULL AND psgn IS NOT NULL AND sgn <> 0 AND psgn <> 0
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    signAutocorrelation(Tables.events(s, d), k = 2).orderBy(col("user_id"))
  }

  /** One-sided CUSUM drift flags per series — change-point detection as
    * a pure window dataflow. The textbook recurrence
    * S_t = max(0, S_{t-1} + (v_t - ref - slack)) is not a window
    * aggregate, but it has the classic prefix identity
    *   S_t = C_t - min(0, min_{i<=t} C_i),  C_t = Σ_{i<=t}(v_i - ref - slack)
    * ... which IS: a running sum plus a running min. ref is the per-user
    * integer mean (sum div count — exact), slack and the alarm threshold
    * are integer cents, so every intermediate is a BIGINT and the oracle
    * hash is exact. Rows whose statistic exceeds the threshold are the
    * drift alarms.
    *
    * Scale: shuffle on user_id once; two window passes over the same
    * sort order (Catalyst collapses them into one Window node chain on a
    * single Exchange); no join, no driver state.
    */
  def cusumFlags(events: DataFrame, slackCents: Long = 50L,
      thresholdCents: Long = 500L): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("tns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    centsSeries(events)
      .withColumn("ref", expr("sum(v) OVER (PARTITION BY user_id) div count(v) OVER (PARTITION BY user_id)"))
      .withColumn("dev", col("v") - col("ref") - lit(slackCents))
      .withColumn("cum", sum(col("dev")).over(wRun))
      .withColumn("cmin", least(lit(0L), min(col("cum")).over(wRun)))
      .withColumn("cusum", col("cum") - col("cmin"))
      .filter(col("cusum") > thresholdCents)
      .select(col("user_id"), col("event_id"), col("cusum"))
  }

  /** q186: CUSUM drift alarms per user (slack 50¢, threshold 500¢),
    * hash-checked against the identical prefix-identity SQL in DuckDB.
    */
  val q186: QueryDef = QueryDef.checked(
    "q186_cusum_drift",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, tns, v,
      |    SUM(v) OVER (PARTITION BY user_id) // COUNT(v) OVER (PARTITION BY user_id) AS ref
      |  FROM t),
      |c AS (
      |  SELECT user_id, event_id, tns,
      |    SUM(v - ref - 50) OVER (PARTITION BY user_id ORDER BY tns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM r),
      |m AS (
      |  SELECT user_id, event_id,
      |    cum,
      |    LEAST(0, MIN(cum) OVER (PARTITION BY user_id ORDER BY tns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cmin
      |  FROM c)
      |SELECT user_id, event_id, CAST(cum - cmin AS BIGINT) AS cusum
      |FROM m WHERE cum - cmin > 500
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    cusumFlags(Tables.events(s, d)).orderBy(col("user_id"), col("event_id"))
  }

  /** Peak interval concurrency via the classic sweep-line, as a pure
    * window dataflow: every event opens a 1-hour activity interval
    * [ts, ts+1h); each interval contributes a +1 at its start and a −1
    * at its end; the running sum of deltas in time order IS the live
    * concurrency. Half-open semantics = ends sort before starts at the
    * same instant (delta ascending). Peaks are then a max per
    * (event_type, day).
    *
    * Scale: the sweep is PARTITIONED by series (event_type) — each
    * series sorts independently after one shuffle, so no global
    * single-partition sort exists in the plan. Running-max ties are
    * order-invariant (reordering equal (t, delta) rows permutes
    * identical partial-sum multisets), so the per-day max is
    * deterministic without a full tiebreak.
    */
  def peakConcurrency(events: DataFrame,
      durationNs: Long = 3600L * 1000000000L): DataFrame = {
    val starts = events.select(col("event_type"), col("ts_ns").as("t"),
      lit(1L).as("delta"))
    val ends = events.select(col("event_type"),
      (col("ts_ns") + durationNs).as("t"), lit(-1L).as("delta"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionAll(ends)
      .withColumn("live", sum(col("delta")).over(w))
      .withColumn("day", expr("t div 86400000000000"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("live")).as("peak_concurrent"))
  }

  /** q209: RFM segmentation — the classic customer scoring (Recency =
    * days since last order, Frequency = order count, Monetary = spend
    * cents), each dimension quartiled and composed into a 3-digit
    * segment (111 = most recent / most frequent / biggest spenders).
    * Quartiles come from broadcast percentile_disc cutoffs + a
    * row-local bucket compare — NOT a global ntile window: ntile needs
    * a single-partition global sort, the cutoff form is one bounded
    * aggregate + a map-side projection, the q106 equi-depth discipline.
    * Cutoff values are actual data integers, so bucket membership is
    * exact in both engines.
    */
  val q209: QueryDef = QueryDef.checked(
    "q209_rfm_segments",
    """WITH o AS (
      |  SELECT o_custkey AS ck, epoch_ns(o_orderdate) // 86400000000000 AS d,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |mx AS (SELECT MAX(d) AS dmax FROM o),
      |rfm AS (
      |  SELECT ck, (SELECT dmax FROM mx) - MAX(d) AS r_days,
      |    COUNT(*) AS f_cnt, CAST(SUM(cents) AS BIGINT) AS m_cents
      |  FROM o GROUP BY ck),
      |cut AS (
      |  SELECT
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY r_days) AS r1,
      |    percentile_disc(0.50) WITHIN GROUP (ORDER BY r_days) AS r2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY r_days) AS r3,
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY f_cnt) AS f1,
      |    percentile_disc(0.50) WITHIN GROUP (ORDER BY f_cnt) AS f2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY f_cnt) AS f3,
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY m_cents) AS m1,
      |    percentile_disc(0.50) WITHIN GROUP (ORDER BY m_cents) AS m2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY m_cents) AS m3
      |  FROM rfm)
      |SELECT ck AS custkey, r_days, f_cnt, m_cents,
      |  CAST(1 + CAST(r_days > r1 AS INT) + CAST(r_days > r2 AS INT)
      |    + CAST(r_days > r3 AS INT) AS BIGINT) AS r_q,
      |  CAST(1 + CAST(f_cnt > f1 AS INT) + CAST(f_cnt > f2 AS INT)
      |    + CAST(f_cnt > f3 AS INT) AS BIGINT) AS f_q,
      |  CAST(1 + CAST(m_cents > m1 AS INT) + CAST(m_cents > m2 AS INT)
      |    + CAST(m_cents > m3 AS INT) AS BIGINT) AS m_q
      |FROM rfm, cut ORDER BY custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("d"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val mx = o.agg(max(col("d")).as("dmax"))
    val rfm = o.crossJoin(broadcast(mx)).groupBy(col("ck"))
      .agg((first(col("dmax")) - max(col("d"))).as("r_days"),
        count(lit(1)).as("f_cnt"), sum(col("cents")).as("m_cents"))
    val cut = rfm.agg(
      expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY r_days) AS BIGINT)").as("r1"),
      expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY r_days) AS BIGINT)").as("r2"),
      expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY r_days) AS BIGINT)").as("r3"),
      expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY f_cnt) AS BIGINT)").as("f1"),
      expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY f_cnt) AS BIGINT)").as("f2"),
      expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY f_cnt) AS BIGINT)").as("f3"),
      expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY m_cents) AS BIGINT)").as("m1"),
      expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY m_cents) AS BIGINT)").as("m2"),
      expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY m_cents) AS BIGINT)").as("m3"))
    rfm.crossJoin(broadcast(cut))
      .select(col("ck").as("custkey"), col("r_days"), col("f_cnt"),
        col("m_cents"),
        expr("CAST(1 + CAST(r_days > r1 AS INT) + CAST(r_days > r2 AS INT) + CAST(r_days > r3 AS INT) AS BIGINT)").as("r_q"),
        expr("CAST(1 + CAST(f_cnt > f1 AS INT) + CAST(f_cnt > f2 AS INT) + CAST(f_cnt > f3 AS INT) AS BIGINT)").as("f_q"),
        expr("CAST(1 + CAST(m_cents > m1 AS INT) + CAST(m_cents > m2 AS INT) + CAST(m_cents > m3 AS INT) AS BIGINT)").as("m_q"))
      .orderBy(col("custkey"))
  }

  /** q210: time-to-convert histogram — for every purchase with a prior
    * view by the same user, the view→purchase delay bucketed into
    * 30-minute bins: the latency-distribution readout behind funnel
    * SLAs and attribution-window choices. The delay comes from the q51
    * as-of carry (one keyed window, no join); the histogram is one
    * map-side-combined count over div-bucketed integers.
    */
  val q210: QueryDef = QueryDef.checked(
    "q210_time_to_convert",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns, event_type
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |w AS (
      |  SELECT event_id, event_type, tns,
      |    last_value(CASE WHEN event_type = 'view' THEN tns END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tns, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_tns
      |  FROM t)
      |SELECT (tns - view_tns) // 60000000000 // 30 AS bucket_30m,
      |  COUNT(*) AS n
      |FROM w
      |WHERE event_type = 'purchase' AND view_tns IS NOT NULL
      |GROUP BY 1 ORDER BY bucket_30m""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_ns").as("tns"),
        col("event_type"))
      .withColumn("view_tns",
        last(when(col("event_type") === "view", col("tns")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("view_tns").isNotNull)
      .select(expr("(tns - view_tns) div 60000000000 div 30").as("bucket_30m"))
      .groupBy(col("bucket_30m")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket_30m"))
  }

  /** q206: market-basket co-occurrence with LIFT — the association-
    * rule screen (recommendations, bundle design): for every part pair
    * bought together in ≥ minCount orders, the observed co-purchase
    * count and lift vs independence, on the integer ppm grid
    * (lift_ppm = co·N·10⁶ div (n_a·n_b)). Pair generation is a
    * self-join WITHIN the order key (a < b) — fanout is items-per-
    * basket squared, bounded by basket size, never corpus-quadratic;
    * the three count frames are map-side-combined aggs. At 100 TB the
    * only watch item is a mega-basket (one order with 10⁵ items) —
    * cap basket size upstream, the standard practice.
    */
  def basketLift(lineitem: DataFrame, minCount: Long = 2L): DataFrame = {
    val items = lineitem.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pk")).distinct()
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pcnt = items.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("co_cnt"))
      .filter(col("co_cnt") >= minCount)
    pairs
      .join(pcnt.select(col("pk").as("part_a"), col("cnt").as("cnt_a")), "part_a")
      .join(pcnt.select(col("pk").as("part_b"), col("cnt").as("cnt_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("co_cnt"),
        expr("co_cnt * n_orders * 1000000 div (cnt_a * cnt_b)").as("lift_ppm"))
  }

  /** q206: co-purchased part pairs (≥2 shared orders) with integer
    * lift, hash-checked against the identical SQL in DuckDB.
    */
  val q206: QueryDef = QueryDef.checked(
    "q206_basket_lift",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
      |pc AS (SELECT pk, COUNT(*) AS cnt FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS co_cnt
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT p.part_a, p.part_b, p.co_cnt,
      |  p.co_cnt * (SELECT n_orders FROM n) * 1000000
      |    // (ca.cnt * cb.cnt) AS lift_ppm
      |FROM pairs p JOIN pc ca ON ca.pk = p.part_a
      |JOIN pc cb ON cb.pk = p.part_b
      |ORDER BY part_a, part_b""".stripMargin) { (s, d) =>
    basketLift(Tables.lineitem(s, d)).orderBy(col("part_a"), col("part_b"))
  }

  /** q207: sequential 3-gram mining — the top recurring micro-patterns
    * in user event streams (the n-gram complement to q124's first-order
    * transitions and q162's whole-day paths): consecutive event-type
    * triples per user in (ts, event_id) order, counted corpus-wide,
    * top 20 by (count desc, gram). One keyed window (two leads — no
    * join, no explosion), one map-side-combined count, TakeOrdered for
    * the top-k. The 100 TB shape of every "common flows" dashboard.
    */
  val q207: QueryDef = QueryDef.checked(
    "q207_sequence_3grams",
    """WITH t AS (
      |  SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id
      |  FROM events),
      |g AS (
      |  SELECT event_type || '>' || lead(event_type, 1) OVER w
      |    || '>' || lead(event_type, 2) OVER w AS gram
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
      |SELECT gram, COUNT(*) AS n FROM g WHERE gram IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, gram LIMIT 20""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tns"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts_ns").as("tns"),
        col("event_id"))
      .withColumn("gram", concat_ws(">", col("event_type"),
        lead(col("event_type"), 1).over(w), lead(col("event_type"), 2).over(w)))
      // concat_ws skips nulls instead of nulling out — filter to FULL
      // trigrams by shape so the semantics match the SQL || (null ⇒ null)
      .filter(size(split(col("gram"), ">")) === 3)
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(20)
  }

  /** q205: time-spine densification — the gap-fill every BI/forecast
    * layer needs before window math is trustworthy (a missing day must
    * be a ZERO row, not an absent one, or trailing averages and lag
    * features silently skip it): the full (series × calendar-day)
    * spine from the observed global span, left-joined to the real
    * per-day counts, absent cells back-filled with 0. The spine is a
    * 2-row min/max aggregate exploded by `sequence` (constant driver
    * state) cross-joined to the distinct series set — both broadcast-
    * sized; the fact table shuffles once for its daily counts and
    * never again.
    */
  def densifyDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val span = events.agg(
      expr("min(ts_ns div 86400000000000)").as("d0"),
      expr("max(ts_ns div 86400000000000)").as("d1"))
    val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .crossJoin(events.select(col("event_type")).distinct())
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** q205: zero-filled daily series per event type over the observed
    * span, hash-checked against DuckDB's generate_series spine.
    */
  val q205: QueryDef = QueryDef.checked(
    "q205_time_spine",
    """WITH d AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT MIN(epoch_ns(ts) // 86400000000000) AS d0,
      |    MAX(epoch_ns(ts) // 86400000000000) AS d1
      |  FROM events),
      |spine AS (
      |  SELECT t.event_type, g.day
      |  FROM (SELECT DISTINCT event_type FROM events) t,
      |    (SELECT unnest(generate_series(d0, d1)) AS day FROM span) g)
      |SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
      |FROM spine s LEFT JOIN d USING (event_type, day)
      |ORDER BY event_type, day""".stripMargin) { (s, d) =>
    densifyDaily(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))
  }

  /** q203: as-of join DIRECTIONS — q51 is the backward ("most recent
    * prior") as-of; this completes the pandas merge_asof surface with
    * forward ("next at-or-after") and nearest (closer of the two,
    * backward winning ties — deterministic). Same scalable shape as
    * q51: tag both streams, ONE user-keyed shuffle, one sorted window
    * pass with two frames (trailing carry + leading carry) — never a
    * join, never quadratic. The nearest pick is a row-local CASE over
    * the two carried (ts, id) pairs.
    */
  def asofDirections(events: DataFrame): DataFrame = {
    val t = events.filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_type"))
    val wBack = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val isView = col("event_type") === "view"
    t.withColumn("prev_view_id",
        last(when(isView, col("event_id")), ignoreNulls = true).over(wBack))
      .withColumn("prev_view_us",
        last(when(isView, col("ts_us")), ignoreNulls = true).over(wBack))
      .withColumn("next_view_id",
        first(when(isView, col("event_id")), ignoreNulls = true).over(wFwd))
      .withColumn("next_view_us",
        first(when(isView, col("ts_us")), ignoreNulls = true).over(wFwd))
      .filter(col("event_type") === "click")
      .withColumn("nearest_view_id",
        when(col("prev_view_id").isNull, col("next_view_id"))
          .when(col("next_view_id").isNull, col("prev_view_id"))
          .when(col("ts_us") - col("prev_view_us") <=
            col("next_view_us") - col("ts_us"), col("prev_view_id"))
          .otherwise(col("next_view_id")))
      .select(col("event_id").as("click_id"), col("user_id"),
        col("prev_view_id"), col("next_view_id"), col("nearest_view_id"))
  }

  /** q203: backward/forward/nearest as-of picks for every click, every
    * row hash-checked against the identical two-frame window SQL.
    */
  val q203: QueryDef = QueryDef.checked(
    "q203_asof_directions",
    """WITH t AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
      |  FROM events WHERE event_type IN ('click', 'view')),
      |w AS (
      |  SELECT event_id, user_id, ts_us, event_type,
      |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
      |      OVER wb AS prev_view_id,
      |    last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
      |      OVER wb AS prev_view_us,
      |    first_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
      |      OVER wf AS next_view_id,
      |    first_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
      |      OVER wf AS next_view_us
      |  FROM t
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id AS click_id, user_id, prev_view_id, next_view_id,
      |  CASE WHEN prev_view_id IS NULL THEN next_view_id
      |       WHEN next_view_id IS NULL THEN prev_view_id
      |       WHEN ts_us - prev_view_us <= next_view_us - ts_us
      |         THEN prev_view_id
      |       ELSE next_view_id END AS nearest_view_id
      |FROM w WHERE event_type = 'click' ORDER BY click_id""".stripMargin) { (s, d) =>
    asofDirections(Tables.events(s, d)).orderBy(col("click_id"))
  }

  /** q200: supervised training-example construction from an event
    * stream — the feature/label window export that feeds a forecasting
    * model: per user, each emitted example carries the 3 trailing
    * values (lag features, oldest-first), the current value, and the
    * NEXT value as the label; rows without full history or a future
    * label are dropped (no padding — a padded example teaches the
    * model the pad). Integer cents end to end. Same minimal plan as
    * q184: one shuffle on the entity key, one sorted window pass doing
    * all 4 reads — at 100 TB this is the canonical "windowed dataset
    * export" job, and it composes with q104's hash split for
    * train/val assignment.
    */
  def lagFeatureExamples(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tns"), col("event_id"))
    centsSeries(events)
      .withColumn("f3", lag(col("v"), 3).over(w))
      .withColumn("f2", lag(col("v"), 2).over(w))
      .withColumn("f1", lag(col("v"), 1).over(w))
      .withColumn("label", lead(col("v"), 1).over(w))
      .filter(col("f3").isNotNull && col("label").isNotNull)
      .select(col("user_id"), col("event_id"),
        col("f3"), col("f2"), col("f1"), col("v").as("f0"), col("label"))
  }

  /** q200: lag-feature/label examples per user, every row hash-checked
    * against the identical window construction in DuckDB.
    */
  val q200: QueryDef = QueryDef.checked(
    "q200_lag_feature_examples",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |x AS (
      |  SELECT user_id, event_id,
      |    lag(v, 3) OVER w AS f3, lag(v, 2) OVER w AS f2,
      |    lag(v, 1) OVER w AS f1, v AS f0, lead(v, 1) OVER w AS label
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
      |SELECT user_id, event_id, f3, f2, f1, f0, label
      |FROM x WHERE f3 IS NOT NULL AND label IS NOT NULL
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    lagFeatureExamples(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q190: peak concurrent 1-hour activity intervals per (event_type,
    * day), hash-checked against the identical sweep in DuckDB.
    */
  val q190: QueryDef = QueryDef.checked(
    "q190_peak_concurrency",
    """WITH iv AS (
      |  SELECT event_type, epoch_ns(ts) AS t, 1 AS delta FROM events
      |  UNION ALL
      |  SELECT event_type, epoch_ns(ts) + 3600000000000 AS t, -1 AS delta
      |  FROM events),
      |sw AS (
      |  SELECT event_type, t, delta,
      |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
      |  FROM iv)
      |SELECT event_type, t // 86400000000000 AS day,
      |  CAST(MAX(live) AS BIGINT) AS peak_concurrent
      |FROM sw GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin) { (s, d) =>
    peakConcurrency(Tables.events(s, d))
      .orderBy(col("event_type"), col("day"))
  }

  /** q214: interval merge (gaps-and-islands) — every event opens a
    * 30-minute activity interval; overlapping/touching intervals per
    * user coalesce into maximal islands, the canonical "effective
    * sessions with fixed reach" shape behind on-call coverage, ad
    * exposure windows, and machine-uptime stitching. The merge is the
    * classic two-window form: flag rows whose start exceeds the running
    * MAX of all PRIOR ends (frame ends at 1 PRECEDING — the current row
    * must not see itself), then a running SUM of flags numbers the
    * islands. Both windows share one (user_id) shuffle + one
    * per-partition sort; per-user output is a bounded summary row.
    * Everything stays in integer nanoseconds — exact in both engines.
    */
  val q214: QueryDef = QueryDef.checked(
    "q214_interval_islands",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS st,
      |    epoch_ns(ts) + 1800000000000 AS en
      |  FROM events),
      |w AS (
      |  SELECT user_id, event_id, st, en,
      |    COALESCE(CAST(st > MAX(en) OVER (
      |      PARTITION BY user_id ORDER BY st, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS INT), 1)
      |      AS new_island
      |  FROM t),
      |n AS (
      |  SELECT user_id, st, en,
      |    SUM(new_island) OVER (
      |      PARTITION BY user_id ORDER BY st, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM w),
      |g AS (
      |  SELECT user_id, island, MIN(st) AS ist, MAX(en) AS ien,
      |    COUNT(*) AS n_ev
      |  FROM n GROUP BY user_id, island)
      |SELECT user_id, COUNT(*) AS n_islands,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(SUM(ien - ist) AS BIGINT) // 60000000000 AS covered_min,
      |  CAST(MAX(ien - ist) AS BIGINT) // 60000000000 AS longest_min
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val byStart = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns").as("st"),
        (col("ts_ns") + lit(1800000000000L)).as("en"))
      .withColumn("new_island",
        coalesce((col("st") > max(col("en")).over(byStart)).cast("int"), lit(1)))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"),
        count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("n_ev")).as("n_events"),
        expr("CAST(SUM(ien - ist) AS BIGINT) div 60000000000").as("covered_min"),
        expr("CAST(MAX(ien - ist) AS BIGINT) div 60000000000").as("longest_min"))
      .orderBy(col("user_id"))
  }

  /** q217: seasonal-naive forecast backtest — the forecasting
    * baseline every anomaly/capacity system must beat: predict each
    * day's per-type event count with the count 7 calendar days earlier
    * and score WAPE over the whole span. Built on q205's dense spine
    * (a calendar LAG over a gappy series silently reaches 7 ROWS back,
    * not 7 DAYS — densify first, then lag is exact), so the whole
    * query is the spine + one series-keyed window + one agg; error
    * sums stay in integers and WAPE is reported in exact ppm.
    */
  val q217: QueryDef = QueryDef.checked(
    "q217_seasonal_backtest",
    """WITH d AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT MIN(epoch_ns(ts) // 86400000000000) AS d0,
      |    MAX(epoch_ns(ts) // 86400000000000) AS d1
      |  FROM events),
      |spine AS (
      |  SELECT t.event_type, g.day
      |  FROM (SELECT DISTINCT event_type FROM events) t,
      |    (SELECT unnest(generate_series(d0, d1)) AS day FROM span) g),
      |dense AS (
      |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
      |  FROM spine s LEFT JOIN d USING (event_type, day)),
      |f AS (
      |  SELECT event_type, n,
      |    LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
      |  FROM dense)
      |SELECT event_type, COUNT(*) AS n_days,
      |  CAST(SUM(ABS(n - fc)) AS BIGINT) AS sum_abs_err,
      |  CAST(SUM(n) AS BIGINT) AS sum_actual,
      |  (1000000 * CAST(SUM(ABS(n - fc)) AS BIGINT))
      |    // GREATEST(CAST(SUM(n) AS BIGINT), 1) AS wape_ppm
      |FROM f WHERE fc IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    densifyDaily(Tables.events(s, d))
      .withColumn("fc", lag(col("n"), 7).over(w))
      .filter(col("fc").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("fc"))).as("sum_abs_err"),
        sum(col("n")).as("sum_actual"))
      .withColumn("wape_ppm",
        expr("(1000000L * sum_abs_err) div greatest(sum_actual, 1L)"))
      .orderBy(col("event_type"))
  }

  /** q232: new-vs-returning daily actives — the growth-accounting split
    * q165's trailing actives doesn't give: per day, how many active
    * users are seen for the FIRST time ever vs returning. First-seen
    * day is a per-user min over the user's distinct active days,
    * computed as a window over the deduplicated (user, day) frame — no
    * self-join with a firsts table. Three keyed shuffles, each on a
    * smaller frame than the last: the data-sized (user, day) distinct,
    * the user-keyed window over ≤365 rows/user/year, and the tiny
    * per-day agg. CAST SUM AS BIGINT on both sides (the DuckDB
    * HUGEINT→float64 render trap).
    */
  val q232: QueryDef = QueryDef.checked(
    "q232_new_vs_returning",
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
      |  FROM events),
      |f AS (
      |  SELECT user_id, day,
      |    MIN(day) OVER (PARTITION BY user_id) AS fday
      |  FROM ud)
      |SELECT day, COUNT(*) AS n_active,
      |  CAST(SUM(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(COUNT(*) - SUM(CASE WHEN day = fday THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_returning
      |FROM f GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
    val ud = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000 div 86400000000").as("day"))
      .distinct()
    val f = ud.withColumn("fday",
      min(col("day")).over(Window.partitionBy(col("user_id"))))
    f.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("fday"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .orderBy(col("day"))
  }

  /** q238: growth-accounting identity — q232's returning users split by
    * the DAU accounting every product-metrics stack reports
    * (new + retained + resurrected = active): per active (user, day),
    * the user's PREVIOUS active day classifies the row — none → new,
    * gap ≤ 7 days → retained, gap ≥ 8 → resurrected (came back after a
    * churn-length absence). One lag over the same user-keyed window
    * q232 already sorts, so the accounting costs one more column, not
    * another shuffle. The identity n_active = new+retained+resurrected
    * is structural (the CASE is total) — the oracle hashing all four
    * columns certifies it per day.
    */
  val q238: QueryDef = QueryDef.checked(
    "q238_growth_accounting",
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
      |  FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
      |  FROM ud)
      |SELECT day, COUNT(*) AS n_active,
      |  CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(SUM(CASE WHEN day - prev_day BETWEEN 1 AND 7 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_retained,
      |  CAST(SUM(CASE WHEN day - prev_day >= 8 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_resurrected
      |FROM g GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
    val ud = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000 div 86400000000").as("day"))
      .distinct()
    val g = ud.withColumn("prev_day",
      lag(col("day"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("day"))))
    g.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when((col("day") - col("prev_day")).between(1, 7), 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("day") - col("prev_day") >= 8, 1L).otherwise(0L))
          .as("n_resurrected"))
      .orderBy(col("day"))
  }

  /** q251: CUPED variance-reduced experiment readout — the adjustment
    * every mature experimentation platform applies before calling a
    * winner (Deng et al., WSDM'13): each user's PRE-period activity X
    * predicts their POST-period metric Y, so Ŷ = Y − θ(X − X̄) with
    * θ = cov(X,Y)/var(X) removes the predictable between-user variance
    * and the variant delta is judged on the adjusted means. Engine
    * discipline: per-user (x, y) cents from ONE conditional-sum pass
    * (pre/post split at min_day + 15), θ's numerator/denominator and
    * the variant sums all accumulate as exact integers (DECIMAL(38,0)
    * / HUGEINT — the q196 overflow rule), and only the final readout
    * divides, as the SAME exact integers cast to DOUBLE through the
    * SAME expression text in both engines (the q196/q109 ROUND
    * contract). Variant = user_id % 2 — deterministic in both engines.
    */
  val q251: QueryDef = QueryDef.checked(
    "q251_cuped_readout",
    """WITH bounds AS (
      |  SELECT MIN(epoch_ns(ts) // 1000 // 86400000000) + 15 AS cut
      |  FROM events),
      |ux AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |    CAST(SUM(CASE WHEN epoch_ns(ts) // 1000 // 86400000000 < cut
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN epoch_ns(ts) // 1000 // 86400000000 >= cut
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS y
      |  FROM events, bounds GROUP BY 1, 2),
      |g AS (
      |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM ux),
      |v AS (
      |  SELECT variant, COUNT(*) AS nv, SUM(x) AS sxv, SUM(y) AS syv
      |  FROM ux GROUP BY variant)
      |SELECT variant, CAST(nv AS BIGINT) AS n_users,
      |  CAST(ROUND(1000000.0 * CAST(syv AS DOUBLE) / nv) AS BIGINT)
      |    AS raw_mean_micros,
      |  CAST(ROUND(1000000.0 * (CAST(syv AS DOUBLE) / nv
      |    - COALESCE(CAST(n*sxy - sx*sy AS DOUBLE)
      |        / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE), 0.0)
      |      * (CAST(sxv AS DOUBLE) / nv - CAST(sx AS DOUBLE) / n)))
      |    AS BIGINT) AS adj_mean_micros
      |FROM v, g ORDER BY variant""".stripMargin) { (s, d) =>
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cut = Tables.events(s, d)
      .agg(min(expr("ts_ns div 1000 div 86400000000"))).head().getLong(0) + 15L
    val ux = Tables.events(s, d)
      .select(col("user_id"),
        expr("ts_ns div 1000 div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(sum(when(col("day") < cut, col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day") >= cut, col("cents")).otherwise(0L)).as("y"))
    val g = ux.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec38)).as("sx"), sum(col("y").cast(dec38)).as("sy"),
      // widen BEFORE the product (q231's rule): x·y / x·x wrap in
      // 64-bit once a user's pre-period cents pass ~3e9
      sum(col("x").cast(dec38) * col("y")).as("sxy"),
      sum(col("x").cast(dec38) * col("x")).as("sxx"))
    val v = ux.groupBy(col("variant"))
      .agg(count(lit(1)).as("nv"), sum(col("x").cast(dec38)).as("sxv"),
        sum(col("y").cast(dec38)).as("syv"))
    v.crossJoin(broadcast(g))
      .select(col("variant"), col("nv").cast("long").as("n_users"),
        expr("""CAST(ROUND(1000000.0 * CAST(syv AS DOUBLE) / nv) AS BIGINT)""")
          .as("raw_mean_micros"),
        // θ's denominator is n·var(X): zero on degenerate data (all
        // users identical pre-period X). Spark's x/0 yields NULL while
        // DuckDB yields ±inf — NULLIF makes the division NULL in BOTH
        // engines, and COALESCE falls back to θ = 0 (no adjustment),
        // the statistically correct degenerate readout. Same expression
        // text on both sides (the q196 ROUND contract).
        expr("""CAST(ROUND(1000000.0 * (CAST(syv AS DOUBLE) / nv
                - COALESCE(CAST(n*sxy - sx*sy AS DOUBLE)
                    / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE), 0.0)
                  * (CAST(sxv AS DOUBLE) / nv - CAST(sx AS DOUBLE) / n)))
                AS BIGINT)""").as("adj_mean_micros"))
      .orderBy(col("variant"))
  }

  /** Weighted-interval gap sessionization: rows are (user, start_us,
    * end_us, n) intervals; islands split when a row starts more than
    * `gapUs` after the running max of PRIOR ends (the q214 idiom), and
    * each island keeps its earliest start and total weight. Point
    * events are the (start == end, n = 1) special case, which is how
    * the history build uses it; the incremental merge feeds whole
    * prior sessions as single weighted rows.
    */
  private def weightedGapSessions(rows: DataFrame,
      gapUs: Long): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("start_us"), col("end_us"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    rows
      .withColumn("pmax", max(col("end_us")).over(prior))
      .withColumn("flag",
        when(col("pmax").isNull ||
          col("start_us") - col("pmax") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("flag")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("start_us")).as("start_us"), max(col("end_us")).as("end_us"),
        sum(col("n")).as("n"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"))
  }

  /** Per-JVM memo of q253's persisted session history (the q78/q125
    * build-once accounting — the history table IS the asset an
    * incremental pipeline maintains; passes measure the merge path).
    */
  private val sessIncMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q253: INCREMENTAL sessionization — maintaining q100's gap sessions
    * without recomputing history, the daily-ingest shape every
    * sessionized warehouse runs: history sessions (events before the
    * cut, persisted once) + today's events merge by the prefix-stable
    * property of gap sessionization — only the LAST session per user
    * can change (every earlier session is followed by a > gap silence
    * that later events, all ≥ cut, can only widen). The merge feeds
    * each user's last history session as ONE weighted interval row
    * (its end carries the gap anchor, its n the event count) plus the
    * fresh points into the same island pass, then unions the untouched
    * history. At 100 TB: touched state = last-session-per-user
    * (bounded by users) + today's events; history is append-only.
    * The oracle is the FULL recompute over all events — incremental
    * must be indistinguishable.
    */
  val q253: QueryDef = QueryDef.checked(
    "q253_incremental_sessions",
    """WITH t AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 3600000000 THEN 1 ELSE 0 END
      |    AS new_sess
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT user_id, MIN(ts_us) AS sess_start_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, sess_start_us""".stripMargin) { (s, d) =>
    val gapUs = 3600000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
    val cutUs = ev.agg(min(expr("ts_us div 86400000000")))
      .head().getLong(0) * 86400000000L + 20L * 86400000000L
    val path = sessIncMemo.computeIfAbsent(s"$d#$cutUs",
      k => Exact.memoBuild(s"sessinc#$k") {
      val tmp = java.nio.file.Files
        .createTempDirectory(Exact.fmtRoot, "sessinc_").toAbsolutePath.toString
      weightedGapSessions(
        ev.filter(col("ts_us") < cutUs)
          .select(col("user_id"), col("ts_us").as("start_us"),
            col("ts_us").as("end_us"), lit(1L).as("n")),
        gapUs).write.mode("overwrite").parquet(tmp)
      tmp
    })
    val hist = s.read.parquet(path)
    val wU = Window.partitionBy(col("user_id"))
    val last = hist
      .withColumn("mx", max(col("start_us")).over(wU))
      .filter(col("start_us") === col("mx")).drop("mx")
    val untouched = hist.join(
      last.select(col("user_id"), col("start_us")),
      Seq("user_id", "start_us"), "left_anti")
    val fresh = ev.filter(col("ts_us") >= cutUs)
      .select(col("user_id"), col("ts_us").as("start_us"),
        col("ts_us").as("end_us"), lit(1L).as("n"))
    weightedGapSessions(last.unionByName(fresh), gapUs)
      .unionByName(untouched)
      .select(col("user_id"), col("start_us").as("sess_start_us"),
        col("n").as("n_events"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }
}
