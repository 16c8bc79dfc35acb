package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / nonparametric-statistics extensions over the events
  * table — the second behavioral family: interval algebra
  * (gaps-and-islands), rank statistics (Mann-Whitney U, Spearman ρ),
  * and an exact-integer EWMA anomaly fence. Like [[Behavioral]], every
  * operator is ONE user- or day-keyed exchange with all later passes
  * window functions over it, and every cross-engine-graded number is
  * either an exact BIGINT or a DOUBLE produced by an identical
  * parenthesization on both engines (the hash-match contract).
  *
  * Rank-statistic determinism: ties take AVERAGE ranks, which are
  * half-integers — both operators therefore work in DOUBLED ranks
  * (2·rank), which are exact BIGINTs: for a tie group occupying ranks
  * [a, b], 2·avg = a + b = 2·(count below) + (group size) + 1, computed
  * from the value histogram's cumulative window. No engine sees a
  * fractional rank.
  */
object TimeSeries {

  /** Each event covers [ts, ts + ActiveWindowMs) of "user active" time
    * (the product-analytics activity-coverage convention). */
  val ActiveWindowMs: Long = 300000L

  // ------------------------------------------------------------------
  // Gaps-and-islands: merge each user's overlapping activity intervals.
  //
  // The classic interval-merge: an interval starts a new island iff its
  // start exceeds the running max of all previous ends (ROWS cummax) —
  // island id is then the running count of starts, and per-island
  // extents collapse with one groupBy that REUSES the user_id exchange
  // the window already made. One shuffle total; no self-join, no
  // interval explosion. Ties (identical ms) are harmless: equal rows
  // yield the same cummax regardless of their relative order, and the
  // trailing event_id key makes the order fully deterministic anyway.
  //
  // 100 TB shape: everything is partitioned by user_id; island counts
  // per user are bounded by the user's event count. Exact integers
  // throughout (epoch millis).
  def intervalsMerged(s: SparkSession, dir: String): DataFrame =
    intervalsMergedOf(Relational.events(s, dir))

  /** Interval merge over any frame with (user_id, event_id, _ms) —
    * exposed so the spec can plant touching/overlapping/disjoint spans. */
  private[graft] def intervalsMergedOf(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val iv = ev.select(col("user_id"), col("event_id"),
      col("_ms").as("s"), (col("_ms") + lit(ActiveWindowMs)).as("e"))
    iv.withColumn("prev_max_e",
        max(col("e")).over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      // strict >: a span starting exactly at the previous max end merges
      // (half-open [s, e) intervals — touching spans form one island)
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("is_"), max(col("e")).as("ie"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ie") - col("is_")).as("covered_ms"),
        max(col("ie") - col("is_")).as("max_island_ms"))
      .orderBy(col("user_id"))
  }

  val intervalsMergedSql: String =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS s,
       |    epoch_ms(ts) + $ActiveWindowMs AS e
       |  FROM events),
       |flag AS (
       |  SELECT user_id, s, e,
       |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
       |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |              IS NULL
       |           OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
       |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |         THEN 1 ELSE 0 END AS new_island,
       |    event_id
       |  FROM iv),
       |isl AS (
       |  SELECT user_id, s, e,
       |    sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
       |                          ROWS UNBOUNDED PRECEDING) AS island
       |  FROM flag),
       |ext AS (
       |  SELECT user_id, island, min(s) AS is_, max(e) AS ie
       |  FROM isl GROUP BY 1, 2)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       |  CAST(sum(ie - is_) AS BIGINT) AS covered_ms,
       |  CAST(max(ie - is_) AS BIGINT) AS max_island_ms
       |FROM ext GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // Mann-Whitney U over per-user spend, arm split as events_ab_test —
  // the NONPARAMETRIC two-sample test the t-test family
  // (events_ab_test / CUPED / bootstrap) can't replace when spend is
  // heavy-tailed: U depends only on ranks, so one whale user can't move
  // it. Normal approximation with the standard tie correction
  // σ² = n1·n2/12 · ((n+1) − Σ(t³−t)/(n(n−1))).
  //
  // Shape: one user_id exchange builds per-user cents; the rank
  // histogram groups by DISTINCT cents value (bounded by user count);
  // doubled ranks join back broadcast-style; one global agg emits the
  // scalar row. Overflow: doubled rank ≤ 2n, rank sum ≤ 2n² — exact to
  // n < 2.1e9 users; tie_sum needs max tie-group < 2.1e6 (both far past
  // any per-user-spend fixture; documented, not silently saturating).
  def mannWhitney(s: SparkSession, dir: String): DataFrame =
    mannWhitneyOf(Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents")))

  /** The test over any (user_id, cents) per-user frame. */
  private[graft] def mannWhitneyOf(perUser0: DataFrame): DataFrame = {
    import graft.queries.Behavioral.{AbHashA, AbHashB, AbMod}
    import graft.ops.{Lineage, Windows}
    val perUser = Lineage.truncate(perUser0
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2")))
    // value histogram → doubled average rank per distinct cents value:
    // 2·avg_rank = 2·(count of strictly smaller) + (tie size) + 1
    val hist = perUser.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
    val ranked = hist.withColumn("below",
        coalesce(sum(col("cnt")).over(
          Windows.boundedGlobal(col("cents"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("d", lit(2L) * col("below") + col("cnt") + lit(1L))
    val ties = ranked.agg(
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_sum"))
    val sums = perUser.join(ranked.select(col("cents"), col("d")), Seq("cents"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("d")).otherwise(0L)).as("r_a_doubled"))
    sums.crossJoin(ties) // two 1-row frames
      .withColumn("u_a_doubled",
        col("r_a_doubled") - col("n_a") * (col("n_a") + lit(1L)))
      .withColumn("u_b_doubled",
        lit(2L) * col("n_a") * col("n_b") - col("u_a_doubled"))
      .withColumn("z", expr(zExpr))
      .select(col("n_a"), col("n_b"), col("r_a_doubled"),
        col("u_a_doubled"), col("u_b_doubled"), col("tie_sum"), col("z"))
  }

  /** z-statistic double algebra — ONE string spliced into both engines
    * so the parenthesization (and hence the IEEE result) is identical.
    * Degenerate guard (the AutocorrRExpr convention): an empty arm, a
    * single user, or ALL values tied (one tie group zeroes the
    * tie-corrected variance (n+1) − Σ(t³−t)/(n(n−1))) would make the
    * denominator sqrt(0) and z a 0/0 NaN — emit NULL instead,
    * identically on both engines. The n_a + n_b > 1 conjunct also keeps
    * the n = 1 case out BEFORE the tie term's own n(n−1) division can
    * go 0/0 = NaN (NaN > 0 is TRUE under both engines' total ordering,
    * so the variance conjunct alone would not catch it). */
  private val zExpr: String =
    """CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 1
      |       AND (CAST(n_a + n_b AS DOUBLE) + 1)
      |           - CAST(tie_sum AS DOUBLE)
      |             / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)) > 0
      |THEN (CAST(u_a_doubled AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2)
      | / sqrt(CAST(n_a AS DOUBLE) * n_b / 12
      |        * ((CAST(n_a + n_b AS DOUBLE) + 1)
      |           - CAST(tie_sum AS DOUBLE)
      |             / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))))
      |ELSE NULL END""".stripMargin

  val mannWhitneySql: String = {
    import graft.queries.Behavioral.{AbHashA, AbHashB, AbMod}
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       |    (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm
       |  FROM events GROUP BY 1),
       |hist AS (SELECT cents, count(*) AS cnt FROM pu GROUP BY 1),
       |ranked AS (
       |  SELECT cents, cnt,
       |    2 * coalesce(sum(cnt) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + cnt + 1 AS d
       |  FROM hist),
       |ties AS (SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
       |         FROM ranked),
       |sums AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN d ELSE 0 END) AS BIGINT) AS r_a_doubled
       |  FROM pu JOIN ranked USING (cents)),
       |u AS (
       |  SELECT n_a, n_b, r_a_doubled, tie_sum,
       |    CAST(r_a_doubled - n_a * (n_a + 1) AS BIGINT) AS u_a_doubled
       |  FROM sums CROSS JOIN ties)
       |SELECT n_a, n_b, r_a_doubled, u_a_doubled,
       |  CAST(2 * n_a * n_b - u_a_doubled AS BIGINT) AS u_b_doubled, tie_sum,
       |  ${zExpr.replace("\n", " ")} AS z
       |FROM u""".stripMargin
  }

  // ------------------------------------------------------------------
  // Spearman rank correlation between per-user activity (event count)
  // and per-user spend (cents) — "do heavier users spend more, in a
  // way no outlier can fake?" Pearson over doubled average ranks; the
  // five sufficient sums are exact BIGINTs (doubled rank ≤ 2n ⇒
  // Σd² ≤ 4n³, exact to n ≤ 1.3e6 users per partition of the grade;
  // past that the SUMS would need DECIMAL — documented bound), and ρ
  // itself is a DOUBLE from one shared expression string.
  //
  // Shape: one user_id exchange → two bounded value histograms (rank
  // maps) → two joins back on the value → one global agg. At 100 TB
  // the histograms are small (distinct per-user totals), the joins
  // broadcast.
  def spearman(s: SparkSession, dir: String): DataFrame =
    spearmanOf(Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y")))

  /** ρ over any (user_id, x, y) frame with integer metrics. */
  private[graft] def spearmanOf(perUser0: DataFrame): DataFrame = {
    import graft.ops.{Lineage, Windows}
    val perUser = Lineage.truncate(perUser0)
    def rankMap(c: String): DataFrame =
      perUser.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("below", coalesce(sum(col("cnt")).over(
          Windows.boundedGlobal(col(c))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(c), (lit(2L) * col("below") + col("cnt") + lit(1L))
          .as(s"d$c"))
    perUser
      .join(rankMap("x"), Seq("x"))
      .join(rankMap("y"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .withColumn("rho", expr(rhoExpr))
      .select(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
        col("sxy"), col("rho"))
  }

  /** ρ double algebra shared verbatim by both engines. The n·Σ products
    * can pass 2^63, so every product is forced DOUBLE before
    * multiplying (the HUGEINT-vs-overflow trap in SKILL.md). */
  private val rhoExpr: String =
    """(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      | / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))""".stripMargin

  val spearmanSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |rx AS (
       |  SELECT x, 2 * coalesce(sum(cnt) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + cnt + 1 AS dx
       |  FROM (SELECT x, count(*) AS cnt FROM pu GROUP BY 1)),
       |ry AS (
       |  SELECT y, 2 * coalesce(sum(cnt) OVER (ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + cnt + 1 AS dy
       |  FROM (SELECT y, count(*) AS cnt FROM pu GROUP BY 1)),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
       |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
       |    CAST(sum(dy * dy) AS BIGINT) AS syy,
       |    CAST(sum(dx * dy) AS BIGINT) AS sxy
       |  FROM pu JOIN rx USING (x) JOIN ry USING (y))
       |SELECT n, sx, sy, sxx, syy, sxy,
       |  ${rhoExpr.replace("\n", " ")} AS rho
       |FROM sums""".stripMargin

  // ------------------------------------------------------------------
  // EWMA anomaly fence over daily event volume — EXACT INTEGER form.
  //
  // α = 1/2 EWMA of the PRIOR 16 days, truncated: the tail weight past
  // 16 days is < 2^-16 of the total, and truncation is what makes the
  // recursion a plain bounded self-join instead of a row-by-row fold
  // (whose accumulator typing differs cross-engine — the CUSUM lesson).
  // ewma_num_t = Σ_{k=1..16} 2^(16−k) · n_{t−k};  EWMA = num / (2^16 − 1)
  // up to truncation. The spike test n·2^16 > 3·ewma_num ("today exceeds
  // ~1.5× the smoothed level") is a pure BIGINT comparison — no doubles
  // anywhere. Missing days contribute 0 by construction of the range
  // join (no calendar table needed); days with NO history emit num = 0
  // and never flag.
  //
  // Shape: the day grid is bounded by the horizon (a year ≈ 365 rows),
  // so the range self-join broadcasts — same shape as events_theil_sen.
  // Overflow: 2^15 · (daily count) · 16 terms < 2^63 ⇔ daily count
  // < 1.7e13 — documented.
  def ewmaFence(s: SparkSession, dir: String): DataFrame =
    ewmaFenceOf(Relational.events(s, dir)
      .groupBy(expr("_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The fence over any (day, n) frame — exposed for planted spikes. */
  private[graft] def ewmaFenceOf(daily0: DataFrame): DataFrame = {
    import graft.ops.Lineage
    val daily = Lineage.truncate(daily0) // both join sides read it
    val hist = daily.select(col("day").as("day2"), col("n").as("n2"))
    daily.join(broadcast(hist),
        col("day2") >= col("day") - lit(16L) && col("day2") <= col("day") - lit(1L),
        "left")
      .groupBy(col("day"), col("n"))
      .agg(coalesce(sum(
        expr("CAST(power(2, 16 - (day - day2)) AS BIGINT)") * col("n2")),
        lit(0L)).as("ewma_num"))
      .withColumn("is_spike",
        when(col("ewma_num") > 0 && col("n") * lit(65536L) > lit(3L) * col("ewma_num"), 1)
          .otherwise(0))
      .select(col("day"), col("n"), col("ewma_num"), col("is_spike"))
      .orderBy(col("day"))
  }

  val ewmaFenceSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT epoch_ms(ts) // 86400000 AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |j AS (
      |  SELECT d1.day, d1.n,
      |    CAST(coalesce(sum(
      |      CAST(power(2, 16 - (d1.day - d2.day)) AS BIGINT) * d2.n), 0)
      |      AS BIGINT) AS ewma_num
      |  FROM daily d1 LEFT JOIN daily d2
      |    ON d2.day >= d1.day - 16 AND d2.day <= d1.day - 1
      |  GROUP BY 1, 2)
      |SELECT day, n, ewma_num,
      |  CAST(CASE WHEN ewma_num > 0 AND n * 65536 > 3 * ewma_num
      |       THEN 1 ELSE 0 END AS INTEGER) AS is_spike
      |FROM j ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // Forecast evaluation: MASE of the truncated-EWMA forecast against
  // the seasonal-naive baseline (Hyndman & Koehler 2006 — THE
  // scale-free forecast metric; < 1000 milli means the smoother beats
  // "same day last week"). Everything stays exact integers by scaling
  // both error sums to the EWMA numerator's 2^16 − 1 denominator:
  //   forecast(d) = ewma_num(d) / (2^16 − 1)   (prior-16-day, α = 1/2,
  //   missing days contribute zero — the events_ewma_fence definition),
  //   err_ewma   = Σ |n(d)·65535 − ewma_num(d)|,
  //   err_snaive = Σ |n(d) − n(d−7)|·65535,
  // summed over exactly the days where BOTH the EWMA has history and
  // d−7 exists (the comparable scoring set — same join both engines).
  // mase_milli = 1000·err_ewma DIV err_snaive. Same bounded day-grid
  // broadcast self-join shape as the fence; one extra lag-7 join.
  def forecastMase(s: SparkSession, dir: String): DataFrame =
    forecastMaseOf(Relational.events(s, dir)
      .groupBy(expr("_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The eval over any (day, n) frame — exposed for planted series. */
  private[graft] def forecastMaseOf(daily0: DataFrame): DataFrame = {
    import graft.ops.Lineage
    val daily = Lineage.truncate(daily0) // three consumers
    val hist = daily.select(col("day").as("day2"), col("n").as("n2"))
    val fc = daily.join(broadcast(hist),
        col("day2") >= col("day") - lit(16L) && col("day2") <= col("day") - lit(1L),
        "left")
      .groupBy(col("day"), col("n"))
      .agg(coalesce(sum(
        expr("CAST(power(2, 16 - (day - day2)) AS BIGINT)") * col("n2")),
        lit(0L)).as("ewma_num"))
    val lag7 = daily.select((col("day") + lit(7L)).as("day"), col("n").as("n7"))
    fc.join(broadcast(lag7), Seq("day"))
      .filter(col("ewma_num") > 0)
      .agg(count(lit(1)).as("n_days_scored"),
        sum(abs(col("n") * lit(65535L) - col("ewma_num"))).as("err_ewma"),
        sum(abs(col("n") - col("n7")) * lit(65535L)).as("err_snaive"))
      .select(col("n_days_scored"), col("err_ewma"), col("err_snaive"),
        expr("""CASE WHEN err_snaive > 0
                THEN 1000 * err_ewma DIV err_snaive
                ELSE NULL END""").as("mase_milli"))
  }

  val forecastMaseSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT epoch_ms(ts) // 86400000 AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |fc AS (
      |  SELECT d1.day, d1.n,
      |    CAST(coalesce(sum(
      |      CAST(power(2, 16 - (d1.day - d2.day)) AS BIGINT) * d2.n), 0)
      |      AS BIGINT) AS ewma_num
      |  FROM daily d1 LEFT JOIN daily d2
      |    ON d2.day >= d1.day - 16 AND d2.day <= d1.day - 1
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT fc.n, fc.ewma_num, l.n AS n7
      |  FROM fc JOIN daily l ON l.day = fc.day - 7
      |  WHERE fc.ewma_num > 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
      |  CAST(sum(abs(n * 65535 - ewma_num)) AS BIGINT) AS err_ewma,
      |  CAST(sum(abs(n - n7) * 65535) AS BIGINT) AS err_snaive,
      |  CAST(CASE WHEN sum(abs(n - n7) * 65535) > 0
      |       THEN 1000 * sum(abs(n * 65535 - ewma_num)) // sum(abs(n - n7) * 65535)
      |       ELSE NULL END AS BIGINT) AS mase_milli
      |FROM scored""".stripMargin

  // ------------------------------------------------------------------
  // Benford's-law first-digit screen over transaction amounts (Benford
  // 1938; Nigrini's fraud-audit staple): natural multi-scale amounts
  // follow P(d) = log10(1 + 1/d); fabricated or capped values don't.
  // The first significant digit of the integer cents comes from the
  // STRING head — exact and engine-identical, where a log10/power
  // derivation risks IEEE boundary flips at exact powers of ten. The
  // expected milli-probabilities are Scala-computed literals inlined
  // into BOTH engines, and the chi-square-style statistic stays in
  // exact integers: per digit, (1000·n_d − n·e_d)² DIV (n·e_d), summed.
  // Overflow bound: (1000·n)² < 2^63 ⇔ n < 3e6 rows per grade (cents
  // rows; documented — past it, quantize n_d/n to ppm first).
  //
  // Shape: one scan → a 9-row digit histogram → a 1-row statistic. The
  // digit histogram is the only exchange beyond the output.
  val BenfordExpMilli: Seq[(Int, Long)] = (1 to 9).map { d =>
    d -> math.round(1000.0 * math.log10(1.0 + 1.0 / d))
  }

  def benford(s: SparkSession, dir: String): DataFrame =
    benfordOf(Relational.events(s, dir)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0))

  /** The screen over any (cents > 0) frame — exposed for planted
    * uniform (non-Benford) and log-uniform (Benford) amounts. */
  private[graft] def benfordOf(amounts: DataFrame): DataFrame = {
    val expCase = BenfordExpMilli
      .map { case (d, e) => s"WHEN $d THEN ${e}L" }
      .mkString("CASE digit ", " ", " END")
    val hist = amounts
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
      .withColumn("e_milli", expr(expCase))
    import graft.ops.Lineage
    val h = Lineage.truncate(hist) // both the total and the terms read it
    val tot = h.agg(sum(col("n_d")).as("n"))
    h.crossJoin(broadcast(tot)) // 9 rows × 1 row
      .withColumn("dev", expr("1000 * n_d - n * e_milli"))
      .agg(sum(col("n_d")).as("n_amounts"),
        count(lit(1)).as("n_digits"),
        sum(expr("dev * dev DIV (n * e_milli)")).as("chi2_scaled"),
        max(expr("abs(dev) DIV n")).as("max_dev_milli"))
      .select(col("n_amounts"), col("n_digits"), col("chi2_scaled"),
        col("max_dev_milli"))
  }

  val benfordSql: String = {
    val expCase = BenfordExpMilli
      .map { case (d, e) => s"WHEN $d THEN $e" }
      .mkString("CASE digit ", " ", " END")
    s"""WITH amounts AS (
       |  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
       |  WHERE CAST(round(value * 100) AS BIGINT) > 0),
       |hist AS (
       |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    CAST(count(*) AS BIGINT) AS n_d
       |  FROM amounts GROUP BY 1),
       |h AS (SELECT digit, n_d, $expCase AS e_milli FROM hist),
       |tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM h),
       |terms AS (
       |  SELECT n_d, 1000 * n_d - n * e_milli AS dev, n * e_milli AS den
       |  FROM h CROSS JOIN tot)
       |SELECT CAST(sum(n_d) AS BIGINT) AS n_amounts,
       |  CAST(count(*) AS BIGINT) AS n_digits,
       |  CAST(sum(dev * dev // den) AS BIGINT) AS chi2_scaled,
       |  CAST(max(abs(dev) // (SELECT n FROM tot)) AS BIGINT) AS max_dev_milli
       |FROM terms""".stripMargin
  }

  // ------------------------------------------------------------------
  // Lag-k autocorrelation of daily volume (k = 1 and 7 — persistence
  // and weekly seasonality, the two numbers a capacity planner reads
  // first). Pearson r over (n_t, n_{t−k}) pairs where both days exist;
  // the five sufficient sums are exact BIGINTs over the bounded day
  // grid (documented bound: daily count < ~5e8 keeps Σn² inside int64
  // at a monthly horizon; past that, quantize to kilo-events first),
  // and r is ONE shared expression string (products forced DOUBLE —
  // the same discipline as events_spearman's ρ).
  //
  // Shape: the day grid is horizon-bounded, so both lag joins
  // broadcast; one union + one k-row aggregate.
  val AutocorrLags: Seq[Int] = Seq(1, 7)

  def autocorr(s: SparkSession, dir: String): DataFrame =
    autocorrOf(Relational.events(s, dir)
      .groupBy(expr("_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The correlogram over any (day, n) frame — exposed for planted
    * periodic series. */
  private[graft] def autocorrOf(daily0: DataFrame): DataFrame = {
    import graft.ops.Lineage
    val daily = Lineage.truncate(daily0) // 2·|lags| consumers
    def lagged(k: Int): DataFrame = daily.join(
        broadcast(daily.select((col("day") + lit(k.toLong)).as("day"),
          col("n").as("nk"))), Seq("day"))
      .select(lit(k.toLong).as("lag"), col("n"), col("nk"))
    AutocorrLags.map(lagged).reduce(_ unionByName _)
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n")).as("sx"), sum(col("nk")).as("sy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("nk") * col("nk")).as("syy"),
        sum(col("n") * col("nk")).as("sxy"))
      .withColumn("r", expr(AutocorrRExpr))
      .select(col("lag"), col("n_pairs"), col("sx"), col("sy"),
        col("sxx"), col("syy"), col("sxy"), col("r"))
      .orderBy(col("lag"))
  }

  /** Pearson r shared verbatim by both engines; NULL when a side is
    * constant (zero variance ⇒ 0/0, the degenerate-metric guard). */
  private val AutocorrRExpr: String =
    """CASE WHEN CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |      AND CAST(n_pairs AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      | THEN (CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / (sqrt(CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * sqrt(CAST(n_pairs AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
      | ELSE NULL END""".stripMargin

  val autocorrSql: String = {
    val lagSelects = AutocorrLags.map { k =>
      s"""SELECT $k AS lag, a.n AS n, b.n AS nk
         |FROM daily a JOIN daily b ON b.day = a.day - $k""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH daily AS MATERIALIZED (
       |  SELECT epoch_ms(ts) // 86400000 AS day, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |pairs AS ($lagSelects),
       |sums AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(n) AS BIGINT) AS sx, CAST(sum(nk) AS BIGINT) AS sy,
       |    CAST(sum(n * n) AS BIGINT) AS sxx,
       |    CAST(sum(nk * nk) AS BIGINT) AS syy,
       |    CAST(sum(n * nk) AS BIGINT) AS sxy
       |  FROM pairs GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs, sx, sy, sxx, syy, sxy,
       |  ${AutocorrRExpr.replace("\n", " ")} AS r
       |FROM sums ORDER BY lag""".stripMargin
  }

  // ------------------------------------------------------------------
  // Two-sample Kolmogorov-Smirnov distance between the A/B arms'
  // per-user spend distributions — the distribution-SHAPE companion to
  // Mann-Whitney's location test (U can miss a variance change that D
  // catches). Same coin, same per-user cents frame, same exact-integer
  // discipline: the ECDF gap at a value v is |F_a(v) − F_b(v)| =
  // |c_a·n_b − c_b·n_a| / (n_a·n_b), so the sup is the MAX of an exact
  // BIGINT numerator over the value histogram — no doubles until the
  // final statistic. Exact while n_a·n_b < 2^63 (n ≲ 6×10⁹ users —
  // never the binding constraint; the histogram cumulative is the same
  // bounded-global window the rank tests use, rows = distinct spend
  // values, not users).
  def ksTest(s: SparkSession, dir: String): DataFrame =
    ksTestOf(Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents")))

  /** The test over any (user_id, cents) per-user frame. */
  private[graft] def ksTestOf(perUser0: DataFrame): DataFrame = {
    import graft.queries.Behavioral.{AbHashA, AbHashB, AbMod}
    import graft.ops.Windows
    val perUser = perUser0
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
    val hist = perUser.groupBy(col("cents")).agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    val wCum = Windows.boundedGlobal(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Windows.boundedGlobal(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("fa", sum(col("ca")).over(wCum))
      .withColumn("fb", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .agg(
        max(col("na")).as("n_a"),
        max(col("nb")).as("n_b"),
        max(abs(col("fa") * col("nb") - col("fb") * col("na"))).as("d_scaled"))
      .withColumn("d", expr(ksDExpr))
      .withColumn("lambda", expr(ksLambdaExpr))
  }

  /** KS statistic double algebra — one string per column, spliced into
    * both engines (the zExpr convention); NULL on an empty arm. */
  private val ksDExpr: String =
    """CASE WHEN n_a > 0 AND n_b > 0
      |THEN CAST(d_scaled AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)
      |ELSE NULL END""".stripMargin

  /** Asymptotic λ = D·sqrt(n_a·n_b/(n_a+n_b)) — the value fed to the
    * Kolmogorov distribution for a p-value. */
  private val ksLambdaExpr: String =
    """CASE WHEN n_a > 0 AND n_b > 0
      |THEN (CAST(d_scaled AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b))
      |     * sqrt(CAST(n_a AS DOUBLE) * n_b / (CAST(n_a AS DOUBLE) + n_b))
      |ELSE NULL END""".stripMargin

  val ksTestSql: String = {
    import graft.queries.Behavioral.{AbHashA, AbHashB, AbMod}
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       |    (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm
       |  FROM events GROUP BY 1),
       |hist AS (
       |  SELECT cents,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM pu GROUP BY 1),
       |cum AS (
       |  SELECT cents,
       |    sum(ca) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
       |    sum(cb) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb,
       |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
       |  FROM hist),
       |agg AS (
       |  SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       |    CAST(max(abs(fa * nb - fb * na)) AS BIGINT) AS d_scaled
       |  FROM cum)
       |SELECT n_a, n_b, d_scaled,
       |  ${ksDExpr.replace("\n", " ")} AS d,
       |  ${ksLambdaExpr.replace("\n", " ")} AS lambda
       |FROM agg""".stripMargin
  }

  // ------------------------------------------------------------------
  // Quantile treatment effect — the A/B family's distribution-location
  // readout: exact per-arm LOWER quantiles (median, p90) of per-user
  // spend from the same value histogram the rank tests use, plus the
  // differences. Means hide what quantiles show (a heavy tail can move
  // a mean without touching the median), and the lower-quantile
  // convention keeps every emitted number an exact BIGINT cents value —
  // no interpolation, no doubles, no cross-engine rounding surface.
  // Lower quantile at q per arm of n values = the value whose running
  // count first reaches ceil(q·n) = (q_num·n + q_den − 1) DIV q_den.
  // Cost: the histogram is distinct-value-sized; the cumulative runs on
  // the same bounded-global window as Mann-Whitney/KS.
  def quantileEffect(s: SparkSession, dir: String): DataFrame =
    quantileEffectOf(Relational.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents")))

  private[graft] def quantileEffectOf(perUser0: DataFrame): DataFrame = {
    import graft.queries.Behavioral.{AbHashA, AbHashB, AbMod}
    import graft.ops.Windows
    val perUser = perUser0
      .withColumn("arm", expr(s"(user_id * $AbHashA + $AbHashB) % $AbMod % 2"))
    val hist = perUser.groupBy(col("arm"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("arm"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("f", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def q(num: Int, den: Int, name: String) =
      min(when(col("f") >= expr(s"($num * n + ${den - 1}) DIV $den"), col("cents")))
        .as(name)
    val perArm = cum.groupBy(col("arm"))
      .agg(max(col("n")).as("n_users"),
        q(1, 2, "median_cents"), q(9, 10, "p90_cents"))
    val wide = perArm.groupBy()
      .agg(
        sum(when(col("arm") === 0, col("n_users"))).as("n_a"),
        sum(when(col("arm") === 1, col("n_users"))).as("n_b"),
        sum(when(col("arm") === 0, col("median_cents"))).as("median_a"),
        sum(when(col("arm") === 1, col("median_cents"))).as("median_b"),
        sum(when(col("arm") === 0, col("p90_cents"))).as("p90_a"),
        sum(when(col("arm") === 1, col("p90_cents"))).as("p90_b"))
    wide
      .withColumn("median_diff", col("median_b") - col("median_a"))
      .withColumn("p90_diff", col("p90_b") - col("p90_a"))
  }

  val quantileEffectSql: String = {
    import graft.queries.Behavioral.{AbHashA, AbHashB, AbMod}
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       |    (user_id * $AbHashA + $AbHashB) % $AbMod % 2 AS arm
       |  FROM events GROUP BY 1),
       |hist AS (SELECT arm, cents, count(*) AS cnt FROM pu GROUP BY 1, 2),
       |cum AS (
       |  SELECT arm, cents,
       |    sum(cnt) OVER (PARTITION BY arm ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f,
       |    sum(cnt) OVER (PARTITION BY arm) AS n
       |  FROM hist),
       |pa AS (
       |  SELECT arm, CAST(max(n) AS BIGINT) AS n_users,
       |    min(CASE WHEN f >= (1 * n + 1) // 2 THEN cents END) AS median_cents,
       |    min(CASE WHEN f >= (9 * n + 9) // 10 THEN cents END) AS p90_cents
       |  FROM cum GROUP BY 1),
       |wide AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 0 THEN n_users END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN n_users END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN median_cents END) AS BIGINT) AS median_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN median_cents END) AS BIGINT) AS median_b,
       |    CAST(sum(CASE WHEN arm = 0 THEN p90_cents END) AS BIGINT) AS p90_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN p90_cents END) AS BIGINT) AS p90_b
       |  FROM pa)
       |SELECT n_a, n_b, median_a, median_b, p90_a, p90_b,
       |  CAST(median_b - median_a AS BIGINT) AS median_diff,
       |  CAST(p90_b - p90_a AS BIGINT) AS p90_diff
       |FROM wide""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_qte" -> (quantileEffect _),
    "events_autocorr" -> (autocorr _),
    "events_benford" -> (benford _),
    "events_forecast_mase" -> (forecastMase _),
    "events_intervals_merged" -> (intervalsMerged _),
    "events_ks_test" -> (ksTest _),
    "events_mann_whitney" -> (mannWhitney _),
    "events_spearman" -> (spearman _),
    "events_ewma_fence" -> (ewmaFence _)
  )

  val oracle: Map[String, String] = Map(
    "events_qte" -> quantileEffectSql,
    "events_autocorr" -> autocorrSql,
    "events_benford" -> benfordSql,
    "events_forecast_mase" -> forecastMaseSql,
    "events_intervals_merged" -> intervalsMergedSql,
    "events_ks_test" -> ksTestSql,
    "events_mann_whitney" -> mannWhitneySql,
    "events_spearman" -> spearmanSql,
    "events_ewma_fence" -> ewmaFenceSql
  )
}
