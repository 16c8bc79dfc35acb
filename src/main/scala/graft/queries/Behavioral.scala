package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral sequence analytics over the events table — the ClickHouse
  * product-analytics family the reference's users run server-side
  * (windowFunnel / sequenceCount; the loader ships events, ClickHouse
  * answers these). Both operators are deliberately formulated as pure
  * window-function pipelines so the whole computation is ONE shuffle on
  * `user_id` with every subsequent pass reusing the same exchange —
  * no self-join, no per-pair event explosion, no collected arrays.
  *
  * Determinism contract (the driver hash-compares against DuckDB):
  * all times are exact epoch-millis BIGINTs, every tie is broken by
  * `event_id`, and both engines run the identical greedy definitions
  * spelled out on each operator.
  */
object Behavioral {

  /** Funnel step window: each later step must land within this many ms
    * of the step-1 anchor (24 h — the classic product-analytics span). */
  val FunnelWindowMs: Long = 86400000L

  /** The 3-step funnel over the fixture's event vocabulary. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  // ------------------------------------------------------------------
  // windowFunnel: deepest funnel level per user, earliest-anchor greedy.
  //
  // Semantics (deterministic; both engines run it verbatim):
  //   t1 = earliest 'view' of the user (the anchor),
  //   t2 = earliest 'click'    with t1 < ts <= t1 + W,
  //   t3 = earliest 'purchase' with t2 < ts <= t1 + W,
  //   level = 3 if t3 else 2 if t2 else 1   (every user in the table
  //   with no 'view' would be level 0; strict ts increase between steps
  //   mirrors ClickHouse windowFunnel's strict_increase mode).
  // This is the earliest-anchor variant: the chain is rooted at the
  // user's FIRST step-1 event rather than scanning every anchor.
  // ClickHouse's default re-anchors on later step-1 events, which can
  // find deeper chains; earliest-anchor is the deterministic contract
  // we can hash-check cross-engine, and the divergence is confined to
  // users whose first view's 24 h window misses a conversion a later
  // view would catch.
  //
  // Plan shape: three Window passes over the SAME partitioning
  // (user_id, no ordering — whole-partition min frames), so Catalyst
  // plans one exchange and chains the three WindowExecs; the per-user
  // rollup then groups on the partition key and reuses that exchange
  // too. At 100 TB the query moves each user's events once and nothing
  // else — there is no join anywhere. t1/t2/t3 are per-user constants,
  // so the rollup's min() is just "take the value".
  def windowFunnel(s: SparkSession, dir: String): DataFrame =
    windowFunnelOf(Relational.events(s, dir))

  /** The per-user (t1, t2, t3) chain — the funnel's intermediate frame,
    * exposed so the streaming op's parity spec can compare against the
    * exact batch semantics. */
  def windowFunnelPerUser(ev: DataFrame): DataFrame = {
    val Seq(s1, s2, s3) = FunnelSteps
    val w = Window.partitionBy(col("user_id"))
    ev
      .withColumn("t1",
        min(when(col("event_type") === s1, col("_ms"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === s2 &&
          col("_ms") > col("t1") &&
          col("_ms") <= col("t1") + FunnelWindowMs, col("_ms"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === s3 &&
          col("_ms") > col("t2") &&
          col("_ms") <= col("t1") + FunnelWindowMs, col("_ms"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"))
  }

  /** Funnel over any frame with (user_id, event_type, event_id, _ms). */
  def windowFunnelOf(ev: DataFrame): DataFrame =
    windowFunnelPerUser(ev)
      .select(
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L).as("level"),
        (col("t3") - col("t1")).as("_delay"))
      .groupBy(col("level"))
      .agg(
        count(lit(1)).as("n_users"),
        // integer mean ms from anchor to conversion; the CASE keeps the
        // ANSI DIV away from empty groups (levels 1/2 have no delays)
        expr("CASE WHEN count(_delay) > 0 THEN " +
          "CAST(sum(_delay) AS BIGINT) DIV count(_delay) END")
          .as("avg_ms_to_convert"))
      .orderBy(col("level"))

  private def windowFunnelSql: String = {
    val Seq(s1, s2, s3) = FunnelSteps
    val W = FunnelWindowMs
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
       |p1 AS (
       |  SELECT *, min(CASE WHEN event_type = '$s1' THEN ms END)
       |    OVER (PARTITION BY user_id) AS t1 FROM e),
       |p2 AS (
       |  SELECT *, min(CASE WHEN event_type = '$s2'
       |                     AND ms > t1 AND ms <= t1 + $W THEN ms END)
       |    OVER (PARTITION BY user_id) AS t2 FROM p1),
       |p3 AS (
       |  SELECT *, min(CASE WHEN event_type = '$s3'
       |                     AND ms > t2 AND ms <= t1 + $W THEN ms END)
       |    OVER (PARTITION BY user_id) AS t3 FROM p2),
       |u AS (
       |  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
       |  FROM p3 GROUP BY user_id),
       |lv AS (
       |  SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
       |              WHEN t2 IS NOT NULL THEN 2
       |              WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level,
       |         t3 - t1 AS delay
       |  FROM u)
       |SELECT level, count(*) AS n_users,
       |  CASE WHEN count(delay) > 0
       |       THEN CAST(sum(delay) AS BIGINT) // count(delay) END
       |    AS avg_ms_to_convert
       |FROM lv GROUP BY level ORDER BY level""".stripMargin
  }

  // ------------------------------------------------------------------
  // sequenceCount: greedy NON-OVERLAPPING (open → close) match count
  // per user — ClickHouse sequenceCount's counting discipline (each
  // event participates in at most one match) for the 2-step pattern
  // view → purchase.
  //
  // The greedy scan ("on open: push; on close: pop-if-open") is
  // sequential, but it has a closed form over prefix sums:
  //     matched(u) = totClose − max(0, max over prefixes (cumClose − cumOpen))
  // Proof sketch: the running surplus cumClose − cumOpen counts closes
  // that arrived with no open to consume; its running max is exactly
  // the number of closes the greedy scan leaves unmatched (the surplus
  // only grows when an unmatched close arrives and never shrinks below
  // a past peak — once a close is orphaned no later open can reach
  // back to it). Verified against a direct scan simulation in
  // BehavioralSpec. That closed form turns the sequential automaton
  // into one running-sum window + one per-user aggregate: a single
  // shuffle on user_id, scan-shaped at any corpus size.
  def sequenceCount(s: SparkSession, dir: String): DataFrame =
    sequenceCountOf(Relational.events(s, dir), "view", "purchase")

  /** Greedy non-overlapping (open→close) matches per user over any
    * frame with (user_id, event_type, event_id, _ms). */
  def sequenceCountOf(ev: DataFrame, open: String, close: String): DataFrame = {
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type").isin(open, close))
      .withColumn("_diff",
        sum(when(col("event_type") === close, 1L).otherwise(-1L)).over(wRun))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === open, 1L).otherwise(0L)).as("n_open"),
        sum(when(col("event_type") === close, 1L).otherwise(0L)).as("n_close"),
        (sum(when(col("event_type") === close, 1L).otherwise(0L)) -
          greatest(lit(0L), max(col("_diff")))).as("n_matched"))
      .orderBy(col("user_id"))
  }

  private def sequenceCountSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
       |  FROM events WHERE event_type IN ('view', 'purchase')),
       |r AS (
       |  SELECT user_id, event_type,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
       |      OVER (PARTITION BY user_id ORDER BY ms, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS diff
       |  FROM e)
       |SELECT user_id,
       |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
       |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |       - GREATEST(0, MAX(diff)) AS BIGINT) AS n_matched
       |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // Markov transition matrix: for every ordered pair of consecutive
  // events WITHIN a user's stream (ts order, event_id tiebreak), the
  // transition count and its milli-probability among all transitions
  // leaving the same source type — the page-flow / next-action model
  // product analytics builds on top of the funnel family.
  //
  // Plan shape: ONE shuffle on user_id (the lag window), then an
  // aggregation whose key space is |event_types|² — 25 rows here, and
  // bounded by the vocabulary (not the corpus) at any scale, so the
  // per-source totals window and the final sort run on a frame that
  // fits in a single task no matter how many events feed it. The
  // probability is exact integer milli-units (1000·n DIV n_from), so
  // the cross-engine hash compare never touches a float.
  def transitions(s: SparkSession, dir: String): DataFrame =
    transitionsOf(Relational.events(s, dir))

  /** Transition matrix over any frame with (user_id, event_type,
    * event_id, _ms). */
  def transitionsOf(ev: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("_ms"), col("event_id"))
    val wFrom = Window.partitionBy(col("from_event"))
    ev.select(col("user_id"), col("event_type"), col("event_id"), col("_ms"))
      .withColumn("from_event", lag(col("event_type"), 1).over(wSeq))
      .filter(col("from_event").isNotNull)
      .groupBy(col("from_event"), col("event_type").as("to_event"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(wFrom))
      .withColumn("p_milli", expr("1000 * n DIV n_from"))
      .orderBy(col("from_event"), col("to_event"))
  }

  private def transitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
      |seq AS (
      |  SELECT user_id, event_type AS to_event,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id)
      |      AS from_event
      |  FROM e),
      |t AS (
      |  SELECT from_event, to_event, count(*) AS n
      |  FROM seq WHERE from_event IS NOT NULL GROUP BY 1, 2)
      |SELECT from_event, to_event, CAST(n AS BIGINT) AS n,
      |  CAST(SUM(n) OVER (PARTITION BY from_event) AS BIGINT) AS n_from,
      |  CAST(1000 * n // SUM(n) OVER (PARTITION BY from_event) AS BIGINT)
      |    AS p_milli
      |FROM t ORDER BY from_event, to_event""".stripMargin

  // ------------------------------------------------------------------
  // retention: ClickHouse's retention(cond1, …, condN) aggregate — per
  // user, flag r1 = cond1 fired, and r_i (i>1) = cond1 AND cond_i
  // (note: NOT sequential — each later condition pairs with the FIRST,
  // which is exactly ClickHouse's documented semantics), rolled up to
  // cohort counts. Conditions here: signed up; viewed within 7 days of
  // first signup; purchased within 30 days of first signup — the
  // product-retention readout the events table exists for.
  //
  // Plan shape: like the funnel, whole-partition min/max windows over
  // ONE user_id exchange, then a global 1-row rollup. Exact epoch-ms
  // integer comparisons throughout.
  val RetentionViewMs: Long = 7L * 86400000L
  val RetentionBuyMs: Long = 30L * 86400000L

  def retention(s: SparkSession, dir: String): DataFrame =
    retentionOf(Relational.events(s, dir))

  def retentionOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    ev
      .withColumn("t0",
        min(when(col("event_type") === "signup", col("_ms"))).over(w))
      .withColumn("r1", max(when(col("event_type") === "signup", 1L)
        .otherwise(0L)).over(w))
      .withColumn("r2", max(when(col("event_type") === "view" &&
        col("_ms") >= col("t0") &&
        col("_ms") <= col("t0") + RetentionViewMs, 1L).otherwise(0L)).over(w))
      .withColumn("r3", max(when(col("event_type") === "purchase" &&
        col("_ms") >= col("t0") &&
        col("_ms") <= col("t0") + RetentionBuyMs, 1L).otherwise(0L)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("r1")).as("u1"), max(col("r2")).as("u2"), max(col("r3")).as("u3"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("u1")).as("signed_up"),
        sum(col("u1") * col("u2")).as("retained_view_7d"),
        sum(col("u1") * col("u3")).as("retained_buy_30d"))
  }

  private def retentionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
       |p AS (
       |  SELECT user_id,
       |    min(CASE WHEN event_type = 'signup' THEN ms END)
       |      OVER (PARTITION BY user_id) AS t0,
       |    event_type, ms
       |  FROM e),
       |u AS (
       |  SELECT user_id,
       |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS u1,
       |    max(CASE WHEN event_type = 'view' AND ms >= t0
       |             AND ms <= t0 + $RetentionViewMs THEN 1 ELSE 0 END) AS u2,
       |    max(CASE WHEN event_type = 'purchase' AND ms >= t0
       |             AND ms <= t0 + $RetentionBuyMs THEN 1 ELSE 0 END) AS u3
       |  FROM p GROUP BY user_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(sum(u1) AS BIGINT) AS signed_up,
       |  CAST(sum(u1 * u2) AS BIGINT) AS retained_view_7d,
       |  CAST(sum(u1 * u3) AS BIGINT) AS retained_buy_30d
       |FROM u""".stripMargin

  // ------------------------------------------------------------------
  // SCD Type-2 dimension build: compress each user's event-type stream
  // into VERSIONED validity intervals — the slowly-changing-dimension
  // shape every warehouse keeps for point-in-time joins (version n is
  // valid over [valid_from, valid_to), the last version is open/current;
  // the as-of join q22 is the read side of exactly this artifact).
  //
  // Plan shape: ONE user_id exchange total. Run boundaries come from a
  // lag window, and instead of a (user, version) groupBy (which would
  // re-shuffle on a different key) the run aggregates are recovered
  // from the boundary rows alone: a run's length is the row-number gap
  // to the next boundary, its valid_to the next boundary's timestamp —
  // all windows partition by user_id, so the filter in between
  // preserves the single exchange. At 100 TB this is the difference
  // between one shuffle of the event log and three.
  def scd2(s: SparkSession, dir: String): DataFrame =
    scd2Of(Relational.events(s, dir))

  def scd2Of(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    val runs = ev.select(col("user_id"), col("event_id"), col("event_type"), col("_ms"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
    val wf = Window.partitionBy(col("user_id")).orderBy(col("_rn"))
    runs
      .withColumn("version", row_number().over(wf).cast("long"))
      .withColumn("valid_to_ms", lead(col("_ms"), 1).over(wf))
      .withColumn("n_events",
        (coalesce(lead(col("_rn"), 1).over(wf), col("_n") + 1) - col("_rn")).cast("long"))
      .select(col("user_id"), col("version"), col("event_type").as("attr"),
        col("_ms").as("valid_from_ms"), col("valid_to_ms"), col("n_events"),
        col("valid_to_ms").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private def scd2Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
      |r AS (
      |  SELECT user_id, event_type, ms,
      |    row_number() OVER w AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n,
      |    lag(event_type) OVER w AS prev
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |f AS (SELECT * FROM r WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, CAST(row_number() OVER wf AS BIGINT) AS version,
      |  event_type AS attr, ms AS valid_from_ms,
      |  lead(ms) OVER wf AS valid_to_ms,
      |  CAST(coalesce(lead(rn) OVER wf, n + 1) - rn AS BIGINT) AS n_events,
      |  lead(ms) OVER wf IS NULL AS is_current
      |FROM f WINDOW wf AS (PARTITION BY user_id ORDER BY rn)
      |ORDER BY user_id, version""".stripMargin

  // ------------------------------------------------------------------
  // Multi-touch attribution: every purchase distributes 1000
  // milli-credits linearly across the SAME user's view/click touches
  // inside the 24 h window before it — the marketing-analytics
  // allocation a product warehouse runs next to the funnel. Exact
  // integer split: each touch gets 1000 DIV n and the remainder goes
  // to the most recent touch (the deterministic "last touch closes"
  // convention), so every attributed conversion's credits sum to
  // exactly 1000 cross-engine. Purchases with no in-window touch are
  // unattributed and carry no row (reported implicitly by the funnel).
  //
  // Shape: the purchase↔touch pairing is a user_id equi-join with a
  // time-range predicate (the q45 interval-join discipline: per-user
  // event counts bound the pair fan-out; at 100 TB you'd add coarse
  // time-bucket keys the same way q45 does), then per-purchase count/
  // rank windows and a (user, touch_type) rollup.
  val AttributionWindowMs: Long = FunnelWindowMs

  def attribution(s: SparkSession, dir: String): DataFrame =
    attributionOf(Relational.events(s, dir))

  def attributionOf(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("_ms").as("p_ms"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("touch_type"), col("_ms").as("t_ms"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ms") <= col("p_ms") &&
        col("t_ms") > col("p_ms") - AttributionWindowMs)
    val wc = Window.partitionBy(col("p_id"))
    val wr = Window.partitionBy(col("p_id"))
      .orderBy(col("t_ms").desc, col("t_id").desc)
    joined
      .withColumn("_n", count(lit(1)).over(wc))
      .withColumn("_rk", row_number().over(wr))
      .withColumn("credit_milli",
        expr("1000 DIV _n") + when(col("_rk") === 1, expr("1000 % _n")).otherwise(0L))
      .groupBy(col("user_id"), col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("p_id")).as("n_conversions"),
        sum(col("credit_milli")).as("credit_milli_total"))
      .orderBy(col("user_id"), col("touch_type"))
  }

  private def attributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
       |p AS (SELECT user_id, event_id AS p_id, ms AS p_ms FROM e
       |      WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, event_id AS t_id, event_type AS touch_type, ms AS t_ms
       |      FROM e WHERE event_type IN ('view', 'click')),
       |j AS (
       |  SELECT p.user_id, p_id, touch_type, t_id, t_ms,
       |    count(*) OVER (PARTITION BY p_id) AS n,
       |    row_number() OVER (PARTITION BY p_id ORDER BY t_ms DESC, t_id DESC) AS rk
       |  FROM p JOIN t ON t.user_id = p.user_id
       |    AND t_ms <= p_ms AND t_ms > p_ms - $AttributionWindowMs)
       |SELECT user_id, touch_type,
       |  count(*) AS n_touches,
       |  CAST(count(DISTINCT p_id) AS BIGINT) AS n_conversions,
       |  CAST(sum(1000 // n + CASE WHEN rk = 1 THEN 1000 % n ELSE 0 END) AS BIGINT)
       |    AS credit_milli_total
       |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Hampel filter: rolling robust outlier detection on each user's
  // event-value series — the time-series cleaning pass (sensor spikes,
  // bot bursts, fat-finger purchases) that mean/stddev fences miss
  // because the spike drags its own baseline. Per event, the ±3-row
  // frame's median and MAD are computed INSIDE one window pass (the
  // 7-element frame is collected per row and sorted as an array — no
  // second shuffle, no self-join), and the event is flagged by the
  // integer modified-z fence 6745·|x−med| > 35000·MAD (the same
  // Iglewicz-Hoaglin rule as [[graft.ops.RobustStats]], degenerating
  // to dev > 0 when MAD = 0). Values are cent-quantized with the
  // proven round(value·100) convention, so the oracle replays the
  // frame, medians and fence cell-exactly.
  //
  // Plan shape: ONE exchange on user_id (high-cardinality key), one
  // WindowExec with a constant 7-row frame — per-row state is 7 longs
  // however long the series, so the operator scales as a linear scan
  // of each user's timeline at any corpus size.
  val HampelHalf = 3

  def hampel(s: SparkSession, dir: String): DataFrame =
    hampelOf(Relational.events(s, dir)
      .select(col("user_id"), col("event_id"), col("_ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")))

  /** The filter over any (user_id, event_id, _ms, cents) frame —
    * exposed so the spec can plant a hand-computed spike series. */
  def hampelOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
      .rowsBetween(-HampelHalf, HampelHalf)
    ev.withColumn("arr", collect_list(col("cents")).over(w))
      .withColumn("med", expr(
        "element_at(array_sort(arr), CAST((size(arr) + 1) DIV 2 AS INT))"))
      .withColumn("dev", abs(col("cents") - col("med")))
      .withColumn("mad", expr(
        "element_at(array_sort(transform(arr, v -> abs(v - med))), " +
          "CAST((size(arr) + 1) DIV 2 AS INT))"))
      .filter(col("dev") * 6745L > col("mad") * 35000L)
      .select(col("user_id"), col("event_id"), col("cents"), col("med"),
        col("mad"), col("dev"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val hampelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |a AS (
      |  SELECT user_id, event_id, cents,
      |    list(cents) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr
      |  FROM e),
      |m AS (
      |  SELECT user_id, event_id, cents, arr,
      |    list_sort(arr)[(len(arr) + 1) // 2] AS med
      |  FROM a),
      |d AS (
      |  SELECT user_id, event_id, cents, med,
      |    abs(cents - med) AS dev,
      |    list_sort(list_transform(arr, v -> abs(v - med)))[(len(arr) + 1) // 2] AS mad
      |  FROM m)
      |SELECT user_id, event_id, cents, CAST(med AS BIGINT) AS med,
      |  CAST(mad AS BIGINT) AS mad, CAST(dev AS BIGINT) AS dev
      |FROM d WHERE dev * 6745 > mad * 35000
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------
  // A/B experiment readout: deterministic hash-coin assignment (the
  // same affine-coin idiom as the sampling family — assignment is a
  // pure function of user_id, reproducible everywhere, no stored
  // randomization table) followed by the two standard test statistics:
  // a two-proportion z on conversion and a Welch z on per-user spend.
  // The corpus work is ONE user-level rollup (user_id-keyed agg) and
  // one conditional aggregation to the 1-row arm summary — at 100 TB
  // the readout moves each user's events once, like the funnel. The
  // statistics are IEEE-double expressions over exact integer sums
  // (users, conversions, cent totals, dollar sums of squares), with the
  // same parenthesization in both engines, so division and sqrt are
  // correctly-rounded on identical inputs and the doubles hash-match.
  //
  // Overflow discipline (the botCadence convention, applied here): the
  // SQUARED spend term is quantized to whole dollars per user BEFORE
  // squaring — lifetime cents squared crosses int64 at ~6e7 users at
  // fixture-like spend, where Spark's non-ANSI long wraps silently
  // while DuckDB widens to HUGEINT: the engines would diverge exactly
  // at scale. In dollars the bound is N·D² < 2^63 — at a $30k lifetime
  // cap that is ~1e10 users, comfortably past a 100 TB event corpus.
  // Linear cent sums stay in cents (Σcents < 2^63 ⇔ corpus spend
  // < $9.2e16 — safe), so the mean columns lose no precision; only the
  // variance term runs on the dollar-quantized metric, and the Welch z
  // is (correctly) the z of that dollar metric on BOTH engines.
  val AbHashA = 1103515245L
  val AbHashB = 12345L
  val AbMod = 1000003L

  def abTest(s: SparkSession, dir: String): DataFrame =
    abTestOf(Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        // "converted" must not be degenerate: every fixture user has every
        // event type, so "any purchase" is 100% in both arms (z denominator
        // exactly 0). Mean purchases/user is ~13 at every sf, so the >= 14
        // threshold splits the population at any scale.
        when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 14L, 1L)
          .otherwise(0L).as("converted"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents")))

  /** The readout over any (user_id, converted, cents) per-user frame —
    * exposed so the overflow-regression spec can push per-user spends
    * past the point where the pre-round-11 cents² sums wrapped int64. */
  private[graft] def abTestOf(perUser0: DataFrame): DataFrame = {
    val perUser = perUser0
      .withColumn("usd", expr("CAST(round(cents / 100.0) AS BIGINT)"))
      .withColumn("arm",
        expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
    def armAgg(a: Int, c: Column) = sum(when(col("arm") === a, c).otherwise(0L))
    perUser.agg(
        armAgg(0, lit(1L)).as("n_a"), armAgg(1, lit(1L)).as("n_b"),
        armAgg(0, col("converted")).as("conv_a"), armAgg(1, col("converted")).as("conv_b"),
        armAgg(0, col("cents")).as("s_a"), armAgg(1, col("cents")).as("s_b"),
        armAgg(0, col("usd")).as("sd_a"), armAgg(1, col("usd")).as("sd_b"),
        armAgg(0, col("usd") * col("usd")).as("ss_a"),
        armAgg(1, col("usd") * col("usd")).as("ss_b"))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        expr("CAST(conv_a AS DOUBLE) / n_a").as("rate_a"),
        expr("CAST(conv_b AS DOUBLE) / n_b").as("rate_b"),
        expr("""(CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                     * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                     * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))""").as("z_conversion"),
        expr("CAST(s_a AS DOUBLE) / n_a").as("mean_cents_a"),
        expr("CAST(s_b AS DOUBLE) / n_b").as("mean_cents_b"),
        expr("""(CAST(sd_a AS DOUBLE) / n_a - CAST(sd_b AS DOUBLE) / n_b)
                / sqrt(((CAST(ss_a AS DOUBLE) - CAST(sd_a AS DOUBLE) * sd_a / n_a) / (n_a - 1)) / n_a
                     + ((CAST(ss_b AS DOUBLE) - CAST(sd_b AS DOUBLE) * sd_b / n_b) / (n_b - 1)) / n_b)""")
          .as("z_mean_spend"))
  }

  val abTestSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
       |         THEN 1 ELSE 0 END AS converted,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1),
       |pud AS (
       |  SELECT *, CAST(round(cents / 100.0) AS BIGINT) AS usd FROM pu),
       |armed AS (
       |  SELECT *, (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm FROM pud),
       |agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN usd ELSE 0 END) AS BIGINT) AS sd_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN usd ELSE 0 END) AS BIGINT) AS sd_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN usd * usd ELSE 0 END) AS BIGINT) AS ss_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN usd * usd ELSE 0 END) AS BIGINT) AS ss_b
       |  FROM armed)
       |SELECT n_a, n_b, conv_a, conv_b,
       |  CAST(conv_a AS DOUBLE) / n_a AS rate_a,
       |  CAST(conv_b AS DOUBLE) / n_b AS rate_b,
       |  (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
       |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
       |         * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
       |         * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) AS z_conversion,
       |  CAST(s_a AS DOUBLE) / n_a AS mean_cents_a,
       |  CAST(s_b AS DOUBLE) / n_b AS mean_cents_b,
       |  (CAST(sd_a AS DOUBLE) / n_a - CAST(sd_b AS DOUBLE) / n_b)
       |    / sqrt(((CAST(ss_a AS DOUBLE) - CAST(sd_a AS DOUBLE) * sd_a / n_a) / (n_a - 1)) / n_a
       |         + ((CAST(ss_b AS DOUBLE) - CAST(sd_b AS DOUBLE) * sd_b / n_b) / (n_b - 1)) / n_b)
       |    AS z_mean_spend
       |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // CUPED variance reduction (Deng et al. 2013, the industry-standard
  // pre-experiment covariate adjustment): adjusted metric
  // y' = y − θ(x − x̄) with θ the pooled OLS slope of post-period spend
  // on PRE-period spend. θ and every variance term derive from the six
  // exact integer sums (n, Σx, Σy, Σx², Σy², Σxy — one user rollup +
  // one conditional aggregation, same 100 TB shape as the A/B readout;
  // x and y are DOLLAR-quantized per user before the second-moment
  // sums, the same int64-overflow discipline as abTest/botCadence);
  // the doubles are computed with identical parenthesization in both
  // engines, and products that could overflow int64 (n·Σxy at corpus
  // user counts) are cast to DOUBLE before multiplying on BOTH sides.
  // Fixture honesty: this fixture's per-event values are i.i.d. and
  // user activity is near-uniform, so the pre-period covariate is weak
  // (ρ ≈ 0.07, measured) and the pooled in-sample reduction is small —
  // but it is mathematically ≥ 0 for the OLS θ, which the spec pins;
  // the operator's value is the exact, oracle-replayable machinery.
  def abCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
      .select(col("user_id"), col("_ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    // deterministic period boundary: midpoint of the observed span
    // (1-row agg, broadcast back)
    val mid = ev.agg(expr("(min(_ms) + max(_ms)) DIV 2").as("mid"))
    val perUser = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("_ms") < col("mid"), col("cents")).otherwise(0L)).as("xc"),
        sum(when(col("_ms") >= col("mid"), col("cents")).otherwise(0L)).as("yc"))
      // Dollar-quantize the per-user covariate/metric BEFORE the
      // second-moment sums (the abTest/botCadence overflow convention):
      // Σx², Σy², Σxy must stay inside int64 at corpus user counts,
      // which cents-squared does not (~6e7 users) and dollars-squared
      // does (~1e10 at a $30k per-user lifetime).
      .select(col("user_id"),
        expr("CAST(round(xc / 100.0) AS BIGINT)").as("x"),
        expr("CAST(round(yc / 100.0) AS BIGINT)").as("y"))
      .withColumn("arm",
        expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
    def armAgg(a: Int, c: Column) = sum(when(col("arm") === a, c).otherwise(0L))
    val sums = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"),
      armAgg(0, lit(1L)).as("n_a"), armAgg(1, lit(1L)).as("n_b"),
      armAgg(0, col("x")).as("sx_a"), armAgg(1, col("x")).as("sx_b"),
      armAgg(0, col("y")).as("sy_a"), armAgg(1, col("y")).as("sy_b"),
      armAgg(0, col("x") * col("x")).as("sxx_a"), armAgg(1, col("x") * col("x")).as("sxx_b"),
      armAgg(0, col("y") * col("y")).as("syy_a"), armAgg(1, col("y") * col("y")).as("syy_b"),
      armAgg(0, col("x") * col("y")).as("sxy_a"), armAgg(1, col("x") * col("y")).as("sxy_b"))
    // shared double algebra: the SAME expression strings run through
    // Spark's expr() here and verbatim inside the DuckDB oracle below —
    // one definition of every double operation on both engines
    sums.select(col("n_a"), col("n_b"),
      expr(Cuped.theta).as("theta"),
      expr(Cuped.zRaw).as("z_raw"),
      expr(Cuped.zCuped).as("z_cuped"),
      expr(Cuped.varRawPooled).as("var_raw_pooled"),
      expr(Cuped.varAdjPooled).as("var_adj_pooled"))
  }

  /** The CUPED statistic algebra over the 18 exact sums, as engine-
    * neutral SQL expression strings. */
  private object Cuped {
    private def varOf(syy: String, sy: String, n: String): String =
      s"(CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * $sy / $n) / ($n - 1)"
    private def covOf(sxy: String, sx: String, sy: String, n: String): String =
      s"(CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * $sy / $n) / ($n - 1)"
    val theta: String = "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
      "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
    private def meanAdj(sy: String, sx: String, n: String): String =
      s"(CAST($sy AS DOUBLE) / $n - $theta * (CAST($sx AS DOUBLE) / $n - CAST(sx AS DOUBLE) / n))"
    private def varAdj(p: String): String =
      s"(${varOf(s"syy$p", s"sy$p", s"n$p")} - 2 * $theta * ${covOf(s"sxy$p", s"sx$p", s"sy$p", s"n$p")} " +
        s"+ $theta * $theta * ${varOf(s"sxx$p", s"sx$p", s"n$p")})"
    val zRaw: String = s"((CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b) / " +
      s"sqrt(${varOf("syy_a", "sy_a", "n_a")} / n_a + ${varOf("syy_b", "sy_b", "n_b")} / n_b))"
    val zCuped: String = s"((${meanAdj("sy_a", "sx_a", "n_a")} - ${meanAdj("sy_b", "sx_b", "n_b")}) / " +
      s"sqrt(${varAdj("_a")} / n_a + ${varAdj("_b")} / n_b))"
    val varRawPooled: String = varOf("syy", "sy", "n")
    val varAdjPooled: String = varAdj("")
  }

  val abCupedSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts) AS ms,
       |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       |b AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM ev),
       |puc AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN ms < mid THEN cents ELSE 0 END) AS BIGINT) AS xc,
       |    CAST(sum(CASE WHEN ms >= mid THEN cents ELSE 0 END) AS BIGINT) AS yc
       |  FROM ev, b GROUP BY 1),
       |pu AS (
       |  SELECT user_id,
       |    CAST(round(xc / 100.0) AS BIGINT) AS x,
       |    CAST(round(yc / 100.0) AS BIGINT) AS y
       |  FROM puc),
       |armed AS (
       |  SELECT *, (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm FROM pu),
       |sums AS (
       |  SELECT
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS BIGINT) AS sxx_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS BIGINT) AS sxx_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN y * y ELSE 0 END) AS BIGINT) AS syy_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN y * y ELSE 0 END) AS BIGINT) AS syy_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN x * y ELSE 0 END) AS BIGINT) AS sxy_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN x * y ELSE 0 END) AS BIGINT) AS sxy_b
       |  FROM armed)
       |SELECT n_a, n_b,
       |  ${Cuped.theta} AS theta,
       |  ${Cuped.zRaw} AS z_raw,
       |  ${Cuped.zCuped} AS z_cuped,
       |  ${Cuped.varRawPooled} AS var_raw_pooled,
       |  ${Cuped.varAdjPooled} AS var_adj_pooled
       |FROM sums""".stripMargin

  // ------------------------------------------------------------------
  // Bot-cadence detection: users whose inter-event gaps are NEAR
  // CONSTANT (coefficient of variation below 10%) are schedulers, not
  // people — the standard behavioral-data hygiene pass before events
  // feed training or analytics. Entirely integer: gaps are quantized
  // to 10-second units (bounding every product under int64 at corpus
  // event counts — DuckDB sums to HUGEINT, Spark must stay in long),
  // and the CV fence is the square form
  //   cv² ≤ 0.01  ⟺  1000·(n·Σg² − (Σg)²) DIV (Σg)² ≤ 10,
  // nonnegative by Cauchy-Schwarz so DIV/// agree. Three synthetic
  // bot users with an exact 10-minute cadence are planted (the same
  // ground-truth-injection idiom as the linkage probes: the fixture's
  // organic users have uniform-random gaps, cv² ≈ 1/3, so real bots
  // would never appear) — the readout is the 20 most-regular users,
  // where the plants MUST rank first with cv² = 0. One user_id window
  // + one user-keyed aggregate: scan-shaped at any corpus size.
  def botCadence(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
      .select(col("user_id"), col("event_id"), col("_ms"))
    val bots = s.range(120).select(
      (lit(900001L) + col("id") % 3).as("user_id"),
      (lit(10000000L) + col("id")).as("event_id"),
      (lit(1700000000000L) + expr("id DIV 3") * 600000L).as("_ms"))
    ev.unionByName(bots)
      .withColumn("g", expr("(_ms - lag(_ms) OVER " +
        "(PARTITION BY user_id ORDER BY _ms, event_id)) DIV 10000"))
      .filter(col("g").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("s"),
        sum(col("g") * col("g")).as("ss"))
      .filter(col("n") >= 5 && col("s") > 0)
      .select(col("user_id"), col("n").as("n_gaps"),
        expr("s DIV n").as("mean_gap_ds"),
        expr("1000 * (n * ss - s * s) DIV (s * s)").as("cv2_milli"))
      .withColumn("is_bot", (col("cv2_milli") <= 10L).cast("long"))
      .orderBy(col("cv2_milli"), col("user_id"))
      .limit(20)
  }

  val botCadenceSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      |bots AS (
      |  SELECT 900001 + (i % 3) AS user_id, 10000000 + i AS event_id,
      |    1700000000000 + (i // 3) * 600000 AS ms
      |  FROM (SELECT UNNEST(range(0, 120)) AS i)),
      |a AS (SELECT * FROM ev UNION ALL SELECT * FROM bots),
      |g AS (
      |  SELECT user_id,
      |    (ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)) // 10000 AS g
      |  FROM a),
      |st AS (
      |  SELECT user_id, count(g) AS n, sum(g) AS s, sum(g * g) AS ss
      |  FROM g WHERE g IS NOT NULL GROUP BY 1),
      |f AS (SELECT * FROM st WHERE n >= 5 AND s > 0)
      |SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
      |  CAST(s // n AS BIGINT) AS mean_gap_ds,
      |  CAST(1000 * (n * ss - s * s) // (s * s) AS BIGINT) AS cv2_milli,
      |  CAST(CASE WHEN 1000 * (n * ss - s * s) // (s * s) <= 10
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_bot
      |FROM f ORDER BY cv2_milli, user_id LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // Point-in-time join — the feature-store leakage guard: each fact row
  // (purchase) joins the dimension VERSION that was valid AT its
  // timestamp, never a later one (training a model on the user's
  // current segment instead of the as-of segment is the classic
  // label-leakage bug). The dimension is the SCD2 version table built
  // over the user's CONTEXT stream (every non-purchase event — reusing
  // [[scd2Of]] verbatim, so dimension semantics have one definition);
  // facts match on user_id + [valid_from, valid_to) containment, and
  // purchases before a user's first context version surface as
  // 'unknown' rather than silently dropping (the enrichment contract).
  //
  // Plan shape: both sides key on user_id — ONE exchange each, the
  // interval predicate evaluates within each user's (small) version
  // list, and the rollup reuses the fact-side key. No corpus-scale
  // range join exists: at 100 TB the join is user-keyed equi + bounded
  // per-user interval scan, exactly like the SCD2 build itself.
  def pointInTimeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val dim = scd2Of(ev.filter(col("event_type") =!= "purchase"))
      .select(col("user_id").as("d_user"), col("version"), col("attr"),
        col("valid_from_ms"), col("valid_to_ms"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("_ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    facts
      .join(dim,
        col("user_id") === col("d_user") &&
          col("valid_from_ms") <= col("_ms") &&
          (col("valid_to_ms").isNull || col("_ms") < col("valid_to_ms")),
        "left")
      .groupBy(coalesce(col("attr"), lit("unknown")).as("as_of_attr"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("cents"))
      .orderBy(col("as_of_attr"))
  }

  val pointInTimeJoinSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |ctx AS (SELECT * FROM e WHERE event_type <> 'purchase'),
      |r AS (
      |  SELECT user_id, event_type, ms,
      |    row_number() OVER w AS rn,
      |    lag(event_type) OVER w AS prev
      |  FROM ctx WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |f AS (SELECT * FROM r WHERE prev IS NULL OR prev <> event_type),
      |dim AS (
      |  SELECT user_id AS d_user, event_type AS attr, ms AS valid_from_ms,
      |    lead(ms) OVER (PARTITION BY user_id ORDER BY rn) AS valid_to_ms
      |  FROM f),
      |facts AS (SELECT user_id, event_id, ms, cents FROM e
      |          WHERE event_type = 'purchase')
      |SELECT coalesce(attr, 'unknown') AS as_of_attr,
      |  CAST(count(*) AS BIGINT) AS n_purchases,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM facts LEFT JOIN dim
      |  ON user_id = d_user AND valid_from_ms <= ms
      |  AND (valid_to_ms IS NULL OR ms < valid_to_ms)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Sample-ratio mismatch (SRM) guard — the experimentation-platform
  // tripwire that catches broken randomization before anyone reads a
  // lift number: per active day (and overall, via rollup), the daily
  // active users per arm and the 1-df chi-square for the 50/50 design,
  //   χ² = (n_a − n_b)² / (n_a + n_b),
  // kept in exact integer micro-units (χ²·10⁶ DIV n) against the
  // 3.841·10⁶ fence (95th percentile of χ²₁). The unit is the USER
  // (daily-active distinct), not the event — event-weighted SRM would
  // fire on benign per-user activity skew. Integer bound: the scaled
  // numerator is 10⁶·(n_a−n_b)²; under real randomization the diff is
  // √n-scale, so int64 holds past 10⁹ users — only an adversarially
  // broken split (diff ~ n) could overflow, and THAT fires the fence
  // at far smaller diffs first. One distinct + one rollup: scan-shaped.
  /** Difference-in-differences (the quasi-experimental workhorse —
    * Card & Krueger 1994 canonically): pre/post × treat/control panel
    * means of per-user spend, with the interaction estimate
    * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre). Arms are the
    * family's deterministic hash coin; the period split is the
    * fixture's time MIDPOINT ((min+max) DIV 2 — positive epoch ms, so
    * Spark DIV == DuckDB //). Panel means use the arm's full distinct
    * user count as the denominator (users silent in a period
    * contribute zero — the balanced-panel convention), so everything
    * reduces to four exact BIGINT spend sums and two exact user
    * counts; the single double division is ONE shared expression
    * string ([[DidSql]]) spliced into both engines. At 100 TB: one
    * conditional aggregation over the event stream + one distinct-user
    * count — no per-user frame ever materializes. */
  private val DidSql: String =
    """CAST((s_t_post - s_t_pre) * n_c - (s_c_post - s_c_pre) * n_t AS DOUBLE)
      |/ (CAST(n_t AS DOUBLE) * n_c)""".stripMargin

  def abDid(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
      .select(col("user_id"), col("_ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val midDf = ev.agg(expr("(min(_ms) + max(_ms)) DIV 2").as("mid"))
    val armed = ev.crossJoin(broadcast(midDf)) // 1-row broadcast
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
      .withColumn("post", (col("_ms") >= col("mid")).cast("long"))
    def cell(a: Int, p: Int) =
      sum(when(col("arm") === a && col("post") === p, col("cents"))
        .otherwise(0L))
    val sums = armed.agg(
      cell(1, 0).as("s_t_pre"), cell(1, 1).as("s_t_post"),
      cell(0, 0).as("s_c_pre"), cell(0, 1).as("s_c_post"))
    val users = ev.select(col("user_id")).distinct()
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
    sums.crossJoin(broadcast(users)) // two 1-row frames
      .select(col("n_t"), col("n_c"),
        col("s_t_pre"), col("s_t_post"), col("s_c_pre"), col("s_c_post"),
        expr("(s_t_post - s_t_pre) * n_c - (s_c_post - s_c_pre) * n_t")
          .as("did_num"),
        expr(DidSql).as("did_cents"))
  }

  val abDidSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts) AS ms,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |mid AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM ev),
       |armed AS (
       |  SELECT user_id, cents,
       |    (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm,
       |    CASE WHEN ms >= mid THEN 1 ELSE 0 END AS post
       |  FROM ev, mid),
       |sums AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_t_pre,
       |    CAST(sum(CASE WHEN arm = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_t_post,
       |    CAST(sum(CASE WHEN arm = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_c_pre,
       |    CAST(sum(CASE WHEN arm = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_c_post
       |  FROM armed),
       |u AS (
       |  SELECT
       |    CAST(sum(CASE WHEN (user_id * $AbHashA + $AbHashB) % $AbMod % 2 = 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |    CAST(sum(CASE WHEN (user_id * $AbHashA + $AbHashB) % $AbMod % 2 = 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_c
       |  FROM (SELECT DISTINCT user_id FROM ev))
       |SELECT n_t, n_c, s_t_pre, s_t_post, s_c_pre, s_c_post,
       |  CAST((s_t_post - s_t_pre) * n_c - (s_c_post - s_c_pre) * n_t
       |    AS BIGINT) AS did_num,
       |  $DidSql AS did_cents
       |FROM sums CROSS JOIN u""".stripMargin

  def abSrm(s: SparkSession, dir: String): DataFrame = {
    val du = Relational.events(s, dir)
      .select(expr("_ms DIV 86400000").as("day"), col("user_id"))
      .distinct()
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
    du.rollup(col("day"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(coalesce(col("day"), lit(-1L)).as("day"), col("n_a"), col("n_b"),
        expr("1000000 * (n_a - n_b) * (n_a - n_b) DIV (n_a + n_b)").as("chi2_micro"))
      .withColumn("srm_flag", (col("chi2_micro") > 3841000L).cast("long"))
      .orderBy(col("day"))
  }

  val abSrmSql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
       |armed AS (
       |  SELECT day, (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm FROM du),
       |g AS (
       |  SELECT coalesce(day, -1) AS day,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM armed GROUP BY ROLLUP (day))
       |SELECT day, n_a, n_b,
       |  CAST(1000000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b) AS BIGINT)
       |    AS chi2_micro,
       |  CAST(CASE WHEN 1000000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b) > 3841000
       |       THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
       |FROM g ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // Poisson bootstrap CI over per-user spend — the standard way to get
  // a nonparametric confidence interval at data sizes where classical
  // resampling (draw n users with replacement, R times) is impossible:
  // Binomial(n, 1/n) → Poisson(1) as n → ∞, so each user contributes an
  // INDEPENDENT Poisson(1) multiplicity per replicate and the corpus is
  // touched in one pass (Chamandy et al., "Estimating Uncertainty for
  // Massive Data Streams", Google 2012). Shape at 100 TB: one user-level
  // rollup of the event corpus (the expensive, user_id-keyed exchange,
  // paid once behind a lineage truncation), then the BOUNDED per-user
  // frame fans out ×R replicate rows — map-side partial aggregation
  // collapses them to R groups before the (tiny, R-row) shuffle. No
  // resample materializes; nothing corpus-scale moves R times.
  //
  // Determinism contract: the Poisson(1) draw is inverse-CDF over a
  // deterministic hash h(user, r) ∈ [0, 1e9) against FIXED integer
  // thresholds (cumulative Poisson(1) mass scaled by 1e9, truncated at
  // k=7 where the residual mass is < 1e-7). The hash is the QUADRATIC
  // kmvMix shape, not a plain affine coin: an affine h(u, r) changes by
  // a constant shift per replicate, so the weight VECTORS of different
  // replicates would be nearly identical (only the users within the
  // shift of a threshold change weight) and the resampling distribution
  // would collapse; squaring v = h1 + r·c breaks the affine structure
  // so each replicate draws an effectively independent weight vector. Both engines compute identical integer weights,
  // identical exact integer replicate sums, and the SAME double division
  // per replicate; the CI is read from ORDER STATISTICS of the sorted
  // replicate means (never a float accumulation across replicates), so
  // aggregation order cannot perturb it. Overflow: h1's product needs
  // user_id < 2^63/1103515245 ≈ 8.3e9 (same bound as the arm coin);
  // replicate sums are Σ w·cents ≤ 7·Σ cents — safe wherever the plain
  // corpus spend sum is.
  val BootReps = 40
  val BootMod = 1000000000L
  // ceil(1e9 · CDF_Poisson(1)(k)) for k = 0..6; k=7 catches the tail.
  val BootCdf: Seq[Long] = Seq(367879441L, 735758882L, 919698603L,
    981011843L, 996340153L, 999405815L, 999916759L)

  private def bootWeightCase(h: String): String =
    BootCdf.zipWithIndex
      .map { case (t, k) => s"WHEN ($h) < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", s" ELSE ${BootCdf.size}L END")

  private def bootWeightCaseSql(h: String): String =
    BootCdf.zipWithIndex
      .map { case (t, k) => s"WHEN ($h) < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${BootCdf.size} END")

  def bootstrapCi(s: SparkSession, dir: String): DataFrame =
    bootstrapCiOf(Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents")))

  /** The readout over any (user_id, cents) per-user frame — exposed so
    * the spec can replay a hand-computed fixture. */
  private[graft] def bootstrapCiOf(perUser0: DataFrame): DataFrame = {
    import graft.ops.Lineage
    // Two consumers (overall mean + replicate fan-out): truncate so the
    // corpus-scale rollup above is not recomputed per branch.
    val perUser = Lineage.truncate(perUser0)
    val reps = perUser
      .select(col("user_id"), col("cents"),
        explode(sequence(lit(0), lit(BootReps - 1))).as("r"))
      .withColumn("h1",
        expr(s"(user_id * $AbHashA + $AbHashB) % $BootMod"))
      .withColumn("v",
        expr(s"(h1 + CAST(r AS BIGINT) * 747796405L) % $BootMod"))
      .withColumn("h",
        expr(s"((v * v) % $BootMod * 69069L + v * 362437L + 1013904223L) % $BootMod"))
      .withColumn("w", expr(bootWeightCase("h")))
    val boot = reps.groupBy(col("r"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("cents")).as("s"))
      .select(expr("CAST(s AS DOUBLE) / n_eff").as("mean_r"))
    // 95% percentile CI by order statistics: with R = 40 sorted means,
    // lo = 2nd smallest (ceil(0.025·R) + 1 = the first value ABOVE the
    // bottom 2.5% mass), hi = 39th (mirror). Fixed indices, not float
    // percentile interpolation, so both engines read identical cells.
    val ci = boot.agg(sort_array(collect_list(col("mean_r"))).as("ms"),
        count(lit(1)).as("n_reps"))
      .select(col("n_reps"),
        element_at(col("ms"), 2).as("ci_lo"),
        element_at(col("ms"), BootReps - 1).as("ci_hi"))
    val overall = perUser.agg(count(lit(1)).as("n_users"),
        sum(col("cents")).as("s"))
      .select(col("n_users"),
        expr("CAST(s AS DOUBLE) / n_users").as("mean_cents"))
    overall.crossJoin(ci) // 1×1 rows — broadcast-literal join, not a product
  }

  val bootstrapCiSql: String = {
    val h1 = s"(user_id * $AbHashA + $AbHashB) % $BootMod"
    val h = s"((v * v) % $BootMod * 69069 + v * 362437 + 1013904223) % $BootMod"
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1),
       |reps AS (SELECT CAST(range AS BIGINT) AS r FROM range($BootReps)),
       |hashed AS (
       |  SELECT user_id, cents, r, ($h1 + r * 747796405) % $BootMod AS v
       |  FROM pu CROSS JOIN reps),
       |weighted AS (
       |  SELECT cents, r, ${bootWeightCaseSql(h)} AS w FROM hashed),
       |b AS (
       |  SELECT r, CAST(sum(w) AS BIGINT) AS n_eff,
       |    CAST(sum(w * cents) AS BIGINT) AS s
       |  FROM weighted GROUP BY 1),
       |m AS (SELECT CAST(s AS DOUBLE) / n_eff AS mean_r FROM b),
       |ci AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_reps,
       |    list_sort(list(mean_r))[2] AS ci_lo,
       |    list_sort(list(mean_r))[${BootReps - 1}] AS ci_hi
       |  FROM m),
       |o AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(cents) AS DOUBLE) / count(*) AS mean_cents
       |  FROM pu)
       |SELECT n_users, mean_cents, n_reps, ci_lo, ci_hi
       |FROM o CROSS JOIN ci""".stripMargin
  }

  // ------------------------------------------------------------------
  // Group-sequential A/B monitoring with an O'Brien-Fleming boundary —
  // the peeking-safe readout: an experimenter who looks every day and
  // stops at |z| > 1.96 inflates false positives several-fold; the OBF
  // boundary C/√t (t = information fraction) spends almost no alpha
  // early and converges to ~1.96-level strictness at the horizon
  // (O'Brien & Fleming 1979; C = 2.24 targets overall α ≈ 0.05 for
  // daily looks at this horizon — the constant is a design choice
  // documented here, not fitted to data).
  //
  // Metric: cumulative purchase share of events per arm — information
  // accrues at EVERY look (a user-enrollment metric degenerates on this
  // fixture: every user's first touch lands in the first two days, so
  // the look grid collapses to 2 rows). The event-level z treats events
  // as exchangeable — the standard monitoring simplification; the
  // user-level readouts (events_ab_test / _cuped) remain the decision
  // statistics, this query is the peeking guard that says WHEN a look
  // is even allowed to claim significance. Shape at 100 TB: ONE
  // (day, arm) rollup of the corpus (scan-shaped, map-side combined),
  // then a cumulative window over DAY rows (the horizon, ≤ a few
  // thousand) via the boundedGlobal marker. The z and boundary are
  // doubles over exact cumulative integers with engine-shared
  // expression strings; early days with an empty arm or degenerate
  // pooled rate emit NULL z (the CASE guard, not a crash — Spark ANSI
  // would raise on the 0 divide).
  private val ObfZSql: String =
    """CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
      |       AND conv_a + conv_b < n_a + n_b THEN
      |  (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      |  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |       * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |       * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
      |ELSE NULL END""".stripMargin
  private val ObfBoundSql: String =
    "CAST(2.24 AS DOUBLE) / sqrt(CAST(n_a + n_b AS DOUBLE) / n_k)"

  def sequentialObf(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Windows
    val ev = Relational.events(s, dir)
      .select(expr("_ms DIV 86400000").as("d0"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"),
        expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2").as("arm"))
    val byDay = ev.groupBy(col("d0"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("u_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("u_b"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("v_a"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("v_b"))
    val w = Windows.boundedGlobal(col("d0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byDay
      .select(col("d0").as("day"),
        sum(col("u_a")).over(w).as("n_a"), sum(col("u_b")).over(w).as("n_b"),
        sum(col("v_a")).over(w).as("conv_a"), sum(col("v_b")).over(w).as("conv_b"))
    val tot = cum.agg(max(col("n_a") + col("n_b")).as("n_k"))
    cum.crossJoin(broadcast(tot)) // 1-row horizon total
      .select(col("day"), col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        expr(ObfZSql).as("z"), expr(ObfBoundSql).as("obf_bound"))
      .withColumn("crossed",
        when(col("z").isNotNull && abs(col("z")) > col("obf_bound"), 1L)
          .otherwise(0L))
      .orderBy(col("day"))
  }

  val sequentialObfSql: String =
    s"""WITH ev AS (
       |  SELECT epoch_ms(ts) // 86400000 AS d0,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
       |    (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm
       |  FROM events),
       |byday AS (
       |  SELECT d0,
       |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS u_a,
       |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS u_b,
       |    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS v_a,
       |    sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS v_b
       |  FROM ev GROUP BY 1),
       |cum AS (
       |  SELECT d0 AS day,
       |    CAST(sum(u_a) OVER (ORDER BY d0) AS BIGINT) AS n_a,
       |    CAST(sum(u_b) OVER (ORDER BY d0) AS BIGINT) AS n_b,
       |    CAST(sum(v_a) OVER (ORDER BY d0) AS BIGINT) AS conv_a,
       |    CAST(sum(v_b) OVER (ORDER BY d0) AS BIGINT) AS conv_b
       |  FROM byday),
       |tot AS (SELECT max(n_a + n_b) AS n_k FROM cum),
       |zc AS (
       |  SELECT day, n_a, n_b, conv_a, conv_b,
       |    $ObfZSql AS z,
       |    $ObfBoundSql AS obf_bound
       |  FROM cum, tot)
       |SELECT day, n_a, n_b, conv_a, conv_b, z, obf_bound,
       |  CAST(CASE WHEN z IS NOT NULL AND abs(z) > obf_bound
       |       THEN 1 ELSE 0 END AS BIGINT) AS crossed
       |FROM zc ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // Seasonal traffic-anomaly fence — the ops-monitoring twin of the
  // curation MAD screen: hourly event volumes are strongly periodic by
  // hour-of-week, so a raw global fence either misses rush-hour drops
  // or false-alarms every night; the robust baseline must be SEASONAL
  // (median/MAD per (day-of-week, hour) cell, the "same hour last
  // weeks" reference every traffic dashboard uses). dow is the epoch
  // day mod 7 — a fixed weekday labeling, same on both engines.
  //
  // Scale shape: the corpus collapses to one (day, hour) count row per
  // active hour (map-side combined), and the exact median/MAD run on
  // VALUE HISTOGRAMS per 168-cell key — windows over histogram rows,
  // never event rows (the quantileExact recipe). The fence is the
  // integer modified-z rule; hours with no events are absent on both
  // engines (presence grid — gap-filling is q37's business).
  def seasonalHours(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Lineage
    // both the (day, hour) rollup and the deviation frame feed TWO
    // consumers (median build + join-back): truncate so the corpus
    // rollup and the broadcast join never recompute per branch
    val hourly = Lineage.truncate(Relational.events(s, dir)
      .select(expr("_ms DIV 86400000").as("day"),
        expr("(_ms % 86400000) DIV 3600000").as("hour"))
      .groupBy(col("day"), col("hour")).agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("day % 7")))
    def cellMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val wc = Window.partitionBy(col("dow"), col("hour")).orderBy(col(v))
      val wa = Window.partitionBy(col("dow"), col("hour"))
      df.groupBy(col("dow"), col("hour"), col(v)).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wc))
        .withColumn("t", sum(col("c")).over(wa))
        .filter(col("cum") >= expr("(t + 1) DIV 2"))
        .groupBy(col("dow"), col("hour")).agg(min(col(v)).as(out))
    }
    val med = cellMedian(hourly, "n", "med")
    val dev = Lineage.truncate(hourly.join(broadcast(med), Seq("dow", "hour"))
      .withColumn("dv", abs(col("n") - col("med"))))
    val mad = cellMedian(dev, "dv", "mad")
    dev.join(broadcast(mad), Seq("dow", "hour"))
      .withColumn("anom", (col("dv") * 6745L > col("mad") * 35000L).cast("long"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_obs"),
        max(col("med")).as("med_n"), // constant within cell
        max(col("mad")).as("mad_n"),
        sum(col("anom")).as("n_anom"),
        sum(col("n")).as("total_events"))
      .orderBy(col("dow"), col("hour"))
  }

  val seasonalHoursSql: String =
    """WITH hourly AS (
      |  SELECT epoch_ms(ts) // 86400000 AS day,
      |    (epoch_ms(ts) % 86400000) // 3600000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |keyed AS (SELECT day % 7 AS dow, hour, day, n FROM hourly),
      |h1 AS (SELECT dow, hour, n, count(*) AS c FROM keyed GROUP BY 1, 2, 3),
      |c1 AS (
      |  SELECT dow, hour, n,
      |    sum(c) OVER (PARTITION BY dow, hour ORDER BY n) AS cum,
      |    sum(c) OVER (PARTITION BY dow, hour) AS t
      |  FROM h1),
      |med AS (SELECT dow, hour, min(n) AS med FROM c1
      |        WHERE cum >= (t + 1) // 2 GROUP BY 1, 2),
      |dev AS (
      |  SELECT k.dow, k.hour, k.n, m.med, abs(k.n - m.med) AS dv
      |  FROM keyed k JOIN med m USING (dow, hour)),
      |h2 AS (SELECT dow, hour, dv, count(*) AS c FROM dev GROUP BY 1, 2, 3),
      |c2 AS (
      |  SELECT dow, hour, dv,
      |    sum(c) OVER (PARTITION BY dow, hour ORDER BY dv) AS cum,
      |    sum(c) OVER (PARTITION BY dow, hour) AS t
      |  FROM h2),
      |mad AS (SELECT dow, hour, min(dv) AS mad FROM c2
      |        WHERE cum >= (t + 1) // 2 GROUP BY 1, 2)
      |SELECT dev.dow, dev.hour,
      |  CAST(count(*) AS BIGINT) AS n_obs,
      |  CAST(max(dev.med) AS BIGINT) AS med_n,
      |  CAST(max(mad.mad) AS BIGINT) AS mad_n,
      |  CAST(sum(CASE WHEN dev.dv * 6745 > mad.mad * 35000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_anom,
      |  CAST(sum(dev.n) AS BIGINT) AS total_events
      |FROM dev JOIN mad USING (dow, hour)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Theil-Sen robust trend over daily revenue (Theil 1950, Sen 1968):
  // the median of all pairwise day-slopes — up to ~29% of days can be
  // corrupted (outages, backfills, bot storms) without moving the
  // estimate, where OLS follows a single bad day. EXACT arithmetic
  // throughout: slopes are quantized to milli-cents/day with the
  // sign-split floor division (Spark DIV truncates toward zero, DuckDB
  // // floors — they agree only on nonnegative operands, so we divide
  // magnitudes and negate: the sample_temperature recipe), and the
  // median runs on the slope HISTOGRAM via the cumulative window.
  //
  // Scale shape: ONE corpus scan collapses to the day grid; the pair
  // build is day-grid², which is BOUNDED by the monitoring horizon
  // (a year of days = 66k pairs — nothing), via a broadcast of the
  // grid against itself. n_up/n_down give the Kendall-style
  // concordance counts for a direction readout. Overflow: 1000·Δcents
  // needs |daily revenue| < 9.2e15 cents — far past any fixture.
  def theilSen(s: SparkSession, dir: String): DataFrame =
    theilSenOfDaily(Relational.events(s, dir)
      .groupBy(expr("_ms DIV 86400000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents")))

  /** The estimator over any (day, cents) frame — exposed so the spec
    * can plant series with known slopes and adversarial outlier days. */
  private[graft] def theilSenOfDaily(daily0: DataFrame): DataFrame = {
    import graft.ops.{Lineage, Windows}
    // three consumers (both self-join sides + the day count): truncate
    // so the corpus rollup runs once
    val daily = Lineage.truncate(daily0)
    val pairs = Lineage.truncate(
      daily.select(col("day").as("d1"), col("cents").as("c1"))
        .join(broadcast(daily.select(col("day").as("d2"), col("cents").as("c2"))),
          col("d1") < col("d2"))
        .select((col("c2") - col("c1")).as("dc"), (col("d2") - col("d1")).as("dd")))
    val slopes = pairs.select(expr(
      "CASE WHEN dc >= 0 THEN (1000 * dc) DIV dd ELSE -((1000 * (-dc)) DIV dd) END")
      .as("sl"))
    val wc = Windows.boundedGlobal(col("sl"))
    val med = slopes.groupBy(col("sl")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(0))))
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .agg(min(col("sl")).as("med_slope_milli"))
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    val summ = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("dc") > 0, 1L).otherwise(0L)).as("n_up"),
      sum(when(col("dc") < 0, 1L).otherwise(0L)).as("n_down"))
    nDays.crossJoin(summ).crossJoin(med) // three 1-row frames
      .select(col("n_days"), col("n_pairs"), col("med_slope_milli"),
        col("n_up"), col("n_down"))
  }

  val theilSenSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT epoch_ms(ts) // 86400000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |pairs AS MATERIALIZED (
      |  SELECT d2.cents - d1.cents AS dc, d2.day - d1.day AS dd
      |  FROM daily d1 JOIN daily d2 ON d1.day < d2.day),
      |slopes AS (
      |  SELECT CASE WHEN dc >= 0 THEN (1000 * dc) // dd
      |         ELSE -((1000 * (-dc)) // dd) END AS sl
      |  FROM pairs),
      |hist AS (SELECT sl, count(*) AS c FROM slopes GROUP BY 1),
      |cum AS (
      |  SELECT sl, sum(c) OVER (ORDER BY sl) AS cum, sum(c) OVER () AS n
      |  FROM hist),
      |med AS (SELECT CAST(min(sl) AS BIGINT) AS med_slope_milli
      |        FROM cum WHERE cum >= (n + 1) // 2),
      |summ AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN dc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
      |    CAST(sum(CASE WHEN dc < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
      |  FROM pairs),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
      |SELECT n_days, n_pairs, med_slope_milli, n_up, n_down
      |FROM nd CROSS JOIN summ CROSS JOIN med""".stripMargin

  // ------------------------------------------------------------------
  // CUSUM change-point detection over daily event volumes (Page 1954):
  // S_t = max(0, S_{t-1} + (n_t − ref)) accumulates sustained drift
  // above the robust reference level and fires when it crosses a
  // MAD-scaled fence — the classic sequential detector for "traffic
  // stepped up and stayed up", complementing the point-outlier fences
  // (Hampel, seasonal) that miss slow level shifts.
  //
  // The recursion is NOT folded row-by-row: it solves in closed form to
  // S_t = P_t − min(0, min_{j≤t} P_j) with P_t the prefix sum of
  // (n_t − ref) — two cumulative windows over the bounded day grid, so
  // both engines compute it with plain window functions and EXACT
  // integers (no struct-fold, whose accumulator typing differs
  // cross-engine). ref = lower median, fence = 5·MAD, both from the
  // value histogram; argmax ties resolve to the EARLIEST day (struct
  // max on (s, −day) / min-day-where-max — same total order).
  def cusum(s: SparkSession, dir: String): DataFrame =
    cusumOfDaily(Relational.events(s, dir)
      .groupBy(expr("_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The detector over any (day, n) frame — exposed so the spec can
    * plant level shifts and verify the prefix-min identity against the
    * direct recursion. */
  private[graft] def cusumOfDaily(daily0: DataFrame): DataFrame = {
    import graft.ops.{Lineage, Windows}
    val daily = Lineage.truncate(daily0)
    def histMed(df: DataFrame, v: String, out: String): DataFrame = {
      val wc = Windows.boundedGlobal(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.groupBy(col(v)).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wc))
        .withColumn("t", sum(col("c")).over(Window.partitionBy(lit(0))))
        .filter(col("cum") >= expr("(t + 1) DIV 2"))
        .agg(min(col(v)).as(out))
    }
    val ref = histMed(daily, "n", "ref")
    val dev = daily.crossJoin(broadcast(ref))
      .select(abs(col("n") - col("ref")).as("dv"))
    val mad = histMed(dev, "dv", "mad")
    val wd = Windows.boundedGlobal(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sArr = daily.crossJoin(broadcast(ref))
      .withColumn("pt", sum(col("n") - col("ref")).over(wd))
      .withColumn("pmin", min(col("pt")).over(wd))
      .withColumn("s", expr("pt - least(CAST(0 AS BIGINT), pmin)"))
    val top = sArr.agg(count(lit(1)).as("n_days"),
        max(struct(col("s"), (-col("day")).as("negd"), col("day"))).as("m"))
      .select(col("n_days"), col("m.s").as("cusum_max"),
        col("m.day").as("day_at_max"))
    top.crossJoin(broadcast(ref)).crossJoin(broadcast(mad))
      .select(col("n_days"), col("ref"), col("mad"), col("cusum_max"),
        col("day_at_max"),
        (col("cusum_max") > col("mad") * 5L).cast("long").as("changepoint_flag"))
  }

  val cusumSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT epoch_ms(ts) // 86400000 AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |h1 AS (SELECT n, count(*) AS c FROM daily GROUP BY 1),
      |c1 AS (SELECT n, sum(c) OVER (ORDER BY n) AS cum, sum(c) OVER () AS t FROM h1),
      |refv AS (SELECT CAST(min(n) AS BIGINT) AS ref FROM c1 WHERE cum >= (t + 1) // 2),
      |dv AS (SELECT abs(n - ref) AS dv FROM daily, refv),
      |h2 AS (SELECT dv, count(*) AS c FROM dv GROUP BY 1),
      |c2 AS (SELECT dv, sum(c) OVER (ORDER BY dv) AS cum, sum(c) OVER () AS t FROM h2),
      |madv AS (SELECT CAST(min(dv) AS BIGINT) AS mad FROM c2 WHERE cum >= (t + 1) // 2),
      |p AS (
      |  SELECT day, sum(n - ref) OVER (ORDER BY day) AS pt FROM daily, refv),
      |ps AS (SELECT day, pt, min(pt) OVER (ORDER BY day) AS pmin FROM p),
      |sarr AS MATERIALIZED (SELECT day, pt - least(0, pmin) AS s FROM ps),
      |top AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
      |               CAST(max(s) AS BIGINT) AS cusum_max FROM sarr),
      |amax AS (
      |  SELECT CAST(min(day) AS BIGINT) AS day_at_max
      |  FROM sarr, top WHERE s = cusum_max)
      |SELECT n_days, ref, mad, cusum_max, day_at_max,
      |  CAST(CASE WHEN cusum_max > mad * 5 THEN 1 ELSE 0 END AS BIGINT)
      |    AS changepoint_flag
      |FROM top, amax, refv, madv""".stripMargin

  // ------------------------------------------------------------------
  // Power analysis / sample sizing — the DESIGN side of the experiment
  // family (abTest/CUPED/SRM/OBF are all readouts; this answers "how
  // long must the experiment run"): from the observed baseline
  // conversion rate, (a) the minimum detectable effect at the CURRENT
  // arm sizes and (b) the required per-arm n for a 5% relative lift,
  // both at the standard α = 0.05 two-sided / 80% power operating
  // point (z_{α/2} + z_β = 1.96 + 0.8416 — literals, a design choice).
  // Inputs are the same exact integer rollup as abTest (threshold
  // conversion, hash-coin arms); outputs are fixed-parenthesization
  // doubles plus one ceiling'd BIGINT. ONE user-keyed exchange.
  def powerAnalysis(s: SparkSession, dir: String): DataFrame = {
    val perUser = Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 14L, 1L)
        .otherwise(0L).as("converted"))
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(col("converted")).as("conv"))
      .select(col("n_users"), col("n_a"), col("n_b"), col("conv"),
        expr(PowerPhatSql).as("p_hat"),
        expr(PowerMdeSql).as("mde_abs"),
        expr(PowerNReqSql).as("n_req_per_arm_5pct"))
  }

  // shared expression strings (the CUPED convention): identical double
  // parenthesization on both engines. Degenerate-rate guard: conv = 0
  // makes mde/n_req a 0/0 whose CAST differs cross-engine (Spark
  // non-ANSI saturates, DuckDB errors) and conv = n_users zeroes the
  // variance the same way — emit NULL outside 0 < conv < n_users (the
  // OBF z-guard convention).
  private[graft] val PowerPhatSql = "CAST(conv AS DOUBLE) / n_users"
  private[graft] val PowerMdeSql =
    """CASE WHEN conv > 0 AND conv < n_users THEN
      |(CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
      |* sqrt(CAST(2 AS DOUBLE) * (CAST(conv AS DOUBLE) / n_users)
      |       * (1 - CAST(conv AS DOUBLE) / n_users)
      |       / (CAST(least(n_a, n_b) AS DOUBLE))) END""".stripMargin
  private[graft] val PowerNReqSql =
    """CASE WHEN conv > 0 AND conv < n_users THEN CAST(ceiling(
      |  (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
      |  * (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
      |  * CAST(2 AS DOUBLE) * (CAST(conv AS DOUBLE) / n_users)
      |  * (1 - CAST(conv AS DOUBLE) / n_users)
      |  / ((CAST(0.05 AS DOUBLE) * (CAST(conv AS DOUBLE) / n_users))
      |     * (CAST(0.05 AS DOUBLE) * (CAST(conv AS DOUBLE) / n_users)))) AS BIGINT) END""".stripMargin

  val powerAnalysisSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
       |         THEN 1 ELSE 0 END AS converted,
       |    (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(converted) AS BIGINT) AS conv
       |  FROM pu)
       |SELECT n_users, n_a, n_b, conv,
       |  $PowerPhatSql AS p_hat,
       |  $PowerMdeSql AS mde_abs,
       |  $PowerNReqSql AS n_req_per_arm_5pct
       |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // Top session paths — the Sankey/user-flow readout: the most common
  // ordered event-type sequences per (user, day) session, truncated to
  // the first PathSteps steps (the standard paths-report cap; full
  // paths are unbounded strings). Complements transitions (1-step
  // Markov) with whole-journey counts. Shape: ONE (user, day) exchange
  // whose collected sequence is bounded by daily activity, then a
  // path-string rollup + TakeOrdered — no joins. Determinism: the
  // in-session order is (ms, event_id) — event_id unique — via the
  // struct-sort trick on the Spark side and aggregate ORDER BY in
  // DuckDB.
  val PathSteps = 8

  def topPaths(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
      .select(col("user_id"), expr("_ms DIV 86400000").as("day"),
        col("_ms"), col("event_id"), col("event_type"))
    ev.groupBy(col("user_id"), col("day"))
      .agg(sort_array(collect_list(
        struct(col("_ms"), col("event_id"), col("event_type")))).as("seq"))
      .select(expr(
        s"array_join(transform(slice(seq, 1, $PathSteps), x -> x.event_type), '>')")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(20)
  }

  val topPathsSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
       |    epoch_ms(ts) AS ms, event_id, event_type
       |  FROM events),
       |p AS (
       |  SELECT array_to_string(
       |    list(event_type ORDER BY ms, event_id)[:$PathSteps], '>') AS path
       |  FROM ev GROUP BY user_id, day)
       |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
       |FROM p GROUP BY 1
       |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_top_paths" -> (topPaths _),
    "events_power_analysis" -> (powerAnalysis _),
    "events_cusum" -> (cusum _),
    "events_theil_sen" -> (theilSen _),
    "events_seasonal_hours" -> (seasonalHours _),
    "events_sequential_obf" -> (sequentialObf _),
    "events_bootstrap_ci" -> (bootstrapCi _),
    "events_ab_srm" -> (abSrm _),
    "events_ab_did" -> (abDid _),
    "events_point_in_time_join" -> (pointInTimeJoin _),
    "events_bot_cadence" -> (botCadence _),
    "events_ab_cuped" -> (abCuped _),
    "events_ab_test" -> (abTest _),
    "events_hampel" -> (hampel _),
    "events_attribution" -> (attribution _),
    "events_scd2" -> (scd2 _),
    "events_window_funnel" -> (windowFunnel _),
    "events_sequence_count" -> (sequenceCount _),
    "events_transitions" -> (transitions _),
    "events_retention" -> (retention _)
  )

  val oracle: Map[String, String] = Map(
    "events_top_paths" -> topPathsSql,
    "events_power_analysis" -> powerAnalysisSql,
    "events_cusum" -> cusumSql,
    "events_theil_sen" -> theilSenSql,
    "events_seasonal_hours" -> seasonalHoursSql,
    "events_sequential_obf" -> sequentialObfSql,
    "events_bootstrap_ci" -> bootstrapCiSql,
    "events_ab_srm" -> abSrmSql,
    "events_ab_did" -> abDidSql,
    "events_point_in_time_join" -> pointInTimeJoinSql,
    "events_bot_cadence" -> botCadenceSql,
    "events_ab_cuped" -> abCupedSql,
    "events_ab_test" -> abTestSql,
    "events_hampel" -> hampelSql,
    "events_attribution" -> attributionSql,
    "events_scd2" -> scd2Sql,
    "events_window_funnel" -> windowFunnelSql,
    "events_sequence_count" -> sequenceCountSql,
    "events_transitions" -> transitionsSql,
    "events_retention" -> retentionSql
  )
}
