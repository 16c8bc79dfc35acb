package graft

import org.apache.spark.sql.functions._
import graft.queries.{Behavioral, Relational, TimeSeries}

/** Time-series / rank-statistics family: interval merge, Mann-Whitney U,
  * Spearman ρ, exact-integer EWMA fence. Planted fixtures exercise the
  * hand-computable corners; brute-force Scala recomputations pin the
  * rank statistics against an independent implementation. */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private val W = TimeSeries.ActiveWindowMs // 300000

  test("intervals_merged: overlap merges, touching merges, gap splits") {
    val ev = Seq(
      // user 1: [0,300k) + [100k,400k) overlap; [400k,700k) touches the
      // merged end exactly (half-open -> same island); 1e6 starts fresh
      (1L, 1L, 0L), (1L, 2L, 100000L), (1L, 3L, 400000L), (1L, 4L, 1000000L),
      // user 2: single event
      (2L, 5L, 50L)
    ).toDF("user_id", "event_id", "_ms")
    val got = TimeSeries.intervalsMergedOf(ev)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 700000L + W, 700000L),
      (2L, 1L, W, W)))
  }

  test("intervals_merged: duplicate timestamps are one island, order-stable") {
    val ev = Seq((7L, 1L, 500L), (7L, 2L, 500L), (7L, 3L, 500L))
      .toDF("user_id", "event_id", "_ms")
    val got = TimeSeries.intervalsMergedOf(ev)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 1L, W, W)))
  }

  test("intervals_merged: fixture invariants — coverage bounded by span and by event count") {
    val ev = graft.queries.Relational.events(spark, sf)
    val out = TimeSeries.intervalsMerged(spark, sf)
    val bad = out
      .join(ev.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_ev"),
        (max(col("_ms")) - min(col("_ms")) + lit(W)).as("span")), Seq("user_id"))
      .filter(col("covered_ms") > col("span") ||          // can't exceed hull
        col("covered_ms") > col("n_ev") * lit(W) ||       // nor sum of spans
        col("covered_ms") < lit(W) ||                     // at least one span
        col("max_island_ms") > col("covered_ms") ||
        col("n_islands") > col("n_ev"))
    assert(bad.count() == 0)
  }

  /** Doubled average ranks computed independently in Scala. */
  private def doubledRanks(values: Seq[Long]): Map[Long, Long] = {
    val sorted = values.sorted
    values.distinct.map { v =>
      val below = sorted.count(_ < v).toLong
      val cnt = sorted.count(_ == v).toLong
      v -> (2 * below + cnt + 1)
    }.toMap
  }

  test("mann_whitney: matches a brute-force Scala recomputation with ties") {
    val perUser = Seq(
      (1L, 100L), (2L, 200L), (3L, 100L), (4L, 300L), (5L, 200L),
      (6L, 400L), (7L, 100L), (8L, 500L), (9L, 250L), (10L, 200L)
    )
    val got = TimeSeries.mannWhitneyOf(perUser.toDF("user_id", "cents"))
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    val (nA, nB, rA, uA, uB, tieSum, z) = got
    // independent recomputation
    def arm(u: Long): Long =
      ((u * Behavioral.AbHashA + Behavioral.AbHashB) % Behavioral.AbMod) % 2
    val ranks = doubledRanks(perUser.map(_._2))
    val a = perUser.filter(p => arm(p._1) == 0)
    val b = perUser.filter(p => arm(p._1) == 1)
    val wantRa = a.map(p => ranks(p._2)).sum
    val wantTie = perUser.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    assert((nA, nB) == (a.size.toLong, b.size.toLong))
    assert(rA == wantRa)
    assert(tieSum == wantTie)
    assert(uA == wantRa - nA * (nA + 1))
    assert(uA + uB == 2 * nA * nB)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("mann_whitney: rank-sum identity holds on the fixture") {
    val got = TimeSeries.mannWhitney(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    val (nA, nB, _, uA, uB, _, z) = got
    val n = nA + nB
    assert(n > 0 && nA > 0 && nB > 0)
    assert(uA + uB == 2 * nA * nB)
    assert(uA >= 0 && uA <= 2 * nA * nB)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("spearman: perfectly monotone -> rho ±1 (to sqrt·sqrt rounding); brute force with ties") {
    // sqrt(a)·sqrt(b) ≠ sqrt(a·b) in IEEE, so ±1 lands within 1 ulp-ish;
    // cross-engine determinism is unaffected (identical parenthesization)
    val inc = Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L), (4L, 4L, 40L))
    val gotInc = TimeSeries.spearmanOf(inc.toDF("user_id", "x", "y"))
      .select(col("rho")).as[Double].collect().head
    assert(math.abs(gotInc - 1.0) < 1e-12)
    val dec = Seq((1L, 1L, 40L), (2L, 2L, 30L), (3L, 3L, 20L), (4L, 4L, 10L))
    val gotDec = TimeSeries.spearmanOf(dec.toDF("user_id", "x", "y"))
      .select(col("rho")).as[Double].collect().head
    assert(math.abs(gotDec + 1.0) < 1e-12)
    // ties: brute-force the five sums from doubled ranks
    val tied = Seq((1L, 5L, 10L), (2L, 5L, 20L), (3L, 7L, 20L), (4L, 9L, 5L))
    val got = TimeSeries.spearmanOf(tied.toDF("user_id", "x", "y"))
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    val rx = doubledRanks(tied.map(_._2))
    val ry = doubledRanks(tied.map(_._3))
    val ds = tied.map(t => (rx(t._2), ry(t._3)))
    assert(got._1 == tied.size.toLong)
    assert(got._2 == ds.map(_._1).sum)
    assert(got._3 == ds.map(_._2).sum)
    assert(got._4 == ds.map(d => d._1 * d._1).sum)
    assert(got._5 == ds.map(d => d._2 * d._2).sum)
    assert(got._6 == ds.map(d => d._1 * d._2).sum)
  }

  test("spearman: fixture rho is a valid correlation") {
    val rho = TimeSeries.spearman(spark, sf)
      .select(col("rho")).as[Double].collect().head
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("ewma_fence: hand-computed weights, gap days contribute zero, no-history never flags") {
    val daily = Seq(
      (100L, 10L), (101L, 10L), (103L, 10L), // note the gap at 102
      (104L, 100L)                           // spike day
    ).toDF("day", "n")
    val got = TimeSeries.ewmaFenceOf(daily)
      .as[(Long, Long, Long, Int)].collect().toSeq
    // day 100: no history -> num 0, NOT flagged even though n*2^16 > 0
    assert(got.head == ((100L, 10L, 0L, 0)))
    // day 101: k=1 -> 2^15 * 10
    assert(got(1) == ((101L, 10L, 32768L * 10, 0)))
    // day 103: k=3 from 100 (2^13), k=2 from 101 (2^14); 102 missing -> 0
    assert(got(2)._3 == 8192L * 10 + 16384L * 10)
    // day 104: n=100 vs smoothed ~10 -> flagged
    val d104 = got(3)
    assert(d104._3 == 4096L * 10 + 8192L * 10 + 32768L * 10) // k=4,3,1
    assert(d104._4 == 1 && d104._2 * 65536L > 3L * d104._3)
  }

  test("forecast_mase: constant series has zero error AND a NULL metric (0/0 guard)") {
    val daily = (100L to 130L).map(d => (d, 10L)).toDF("day", "n")
    val got = TimeSeries.forecastMaseOf(daily).collect().head
    // err_ewma: day d scored iff d-7 exists (d >= 107); the truncated
    // EWMA under-fills until day 116 (full 16-day history), so partial
    // windows make |n·65535 − num| > 0 for d in 107..115 — recompute
    // the whole thing independently:
    val ns = (100L to 130L).map(d => d -> 10L).toMap
    val scored = (100L to 130L).filter(d => ns.contains(d - 7))
      .map { d =>
        val num = (1 to 16).map(k => ns.getOrElse(d - k, 0L) * (1L << (16 - k))).sum
        (d, num)
      }.filter(_._2 > 0)
    val errE = scored.map { case (d, num) => math.abs(ns(d) * 65535L - num) }.sum
    val errS = scored.map { case (d, _) => math.abs(ns(d) - ns(d - 7)) * 65535L }.sum
    assert(got.getLong(0) == scored.size.toLong)
    assert(got.getLong(1) == errE)
    assert(got.getLong(2) == errS && errS == 0L)
    assert(got.isNullAt(3), "0/0 must emit NULL, not divide")
  }

  test("forecast_mase: fixture metric matches an independent Scala recomputation") {
    val daily = graft.queries.Relational.events(spark, sf)
      .groupBy(expr("_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n"))
    val ns = daily.as[(Long, Long)].collect().toMap
    val scored = ns.keys.toSeq.sorted.filter(d => ns.contains(d - 7))
      .map { d =>
        val num = (1 to 16).map(k => ns.getOrElse(d - k.toLong, 0L) * (1L << (16 - k))).sum
        (d, num)
      }.filter(_._2 > 0)
    val errE = scored.map { case (d, num) => math.abs(ns(d) * 65535L - num) }.sum
    val errS = scored.map { case (d, _) => math.abs(ns(d) - ns(d - 7)) * 65535L }.sum
    val got = TimeSeries.forecastMase(spark, sf).collect().head
    assert(got.getLong(0) == scored.size.toLong)
    assert(got.getLong(1) == errE && got.getLong(2) == errS)
    if (errS > 0) assert(got.getLong(3) == 1000L * errE / errS)
  }

  test("autocorr: planted period-7 series — lag-7 r near 1, lag-1 near the off-phase value") {
    // period-7 pattern: one spike day per week over flat baseline
    val daily = (0L until 70L).map(d => (d, if (d % 7 == 0) 100L else 10L))
      .toDF("day", "n")
    val got = TimeSeries.autocorrOf(daily)
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(got.map(_._1) == Seq(1L, 7L))
    val r1 = got(0)._8.get; val r7 = got(1)._8.get
    assert(r7 > 0.99, s"lag-7 must capture the weekly period, got $r7")
    assert(r1 < 0, s"lag-1 of a spiky series is negative, got $r1")
    // sums replayed independently for lag 7
    val ns = (0L until 70L).map(d => d -> (if (d % 7 == 0) 100L else 10L)).toMap
    val ps = (7L until 70L).map(d => (ns(d), ns(d - 7)))
    assert(got(1)._2 == ps.size.toLong)
    assert(got(1)._3 == ps.map(_._1).sum && got(1)._4 == ps.map(_._2).sum)
    assert(got(1)._7 == ps.map(p => p._1 * p._2).sum)
  }

  test("autocorr: constant series emits NULL r (zero-variance guard)") {
    val daily = (0L until 30L).map(d => (d, 5L)).toDF("day", "n")
    val got = TimeSeries.autocorrOf(daily).collect()
    assert(got.length == 2 && got.forall(_.isNullAt(7)))
  }

  test("benford: log-uniform amounts score far below uniform amounts; digits exact") {
    // log-uniform over 4 decades -> near-Benford; uniform 10000..99999 ->
    // every first digit equally likely (max deviation from Benford)
    val logu = (0 until 4096).map { i =>
      math.round(math.pow(10.0, 2.0 + 4.0 * i / 4096.0))
    }.map(v => Tuple1(v)).toDF("cents")
    val unif = (0 until 4096).map(i => Tuple1(10000L + i * 21L)).toDF("cents")
    val sLog = TimeSeries.benfordOf(logu).collect().head
    val sUni = TimeSeries.benfordOf(unif).collect().head
    assert(sLog.getLong(0) == 4096L && sUni.getLong(0) == 4096L)
    assert(sLog.getLong(1) == 9L) // all nine digits observed
    assert(sLog.getLong(2) < sUni.getLong(2),
      s"log-uniform chi2 ${sLog.getLong(2)} must beat uniform ${sUni.getLong(2)}")
    // uniform 1xxxx..9xxxx: hand-check the digit histogram drives the stat
    val expect1 = TimeSeries.BenfordExpMilli.head._2 // P(d=1) ~ 301 milli
    assert(expect1 == 301L)
  }

  test("benford: fixture statistic matches an independent Scala recomputation") {
    val cents = Relational.events(spark, sf)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .filter(col("c") > 0).as[Long].collect()
    val hist = cents.groupBy(c => c.toString.head.asDigit)
      .map { case (d, xs) => d -> xs.length.toLong }
    val n = hist.values.sum
    val exp = TimeSeries.BenfordExpMilli.toMap
    val chi2 = hist.map { case (d, nd) =>
      val dev = 1000L * nd - n * exp(d); dev * dev / (n * exp(d))
    }.sum
    val maxDev = hist.map { case (d, nd) =>
      math.abs(1000L * nd - n * exp(d)) / n
    }.max
    val got = TimeSeries.benford(spark, sf).collect().head
    assert(got.getLong(0) == n && got.getLong(1) == hist.size.toLong)
    assert(got.getLong(2) == chi2 && got.getLong(3) == maxDev)
  }

  test("ewma_fence: fixture — flags are exactly the integer rule, days ordered") {
    val out = TimeSeries.ewmaFence(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._1) == out.map(_._1).sorted)
    out.foreach { case (_, n, num, f) =>
      val want = if (num > 0 && n * 65536L > 3L * num) 1 else 0
      assert(f == want)
    }
  }

  test("qte: lower quantiles match a brute-force sorted-pick per arm") {
    def arm(u: Long): Long =
      ((u * Behavioral.AbHashA + Behavioral.AbHashB) % Behavioral.AbMod) % 2
    val perUser = (1L to 40L).map(u => (u, (u * 37 % 11) * 100 + u))
    val got = TimeSeries.quantileEffectOf(perUser.toDF("user_id", "cents"))
      .collect().head
    def lowerQ(xs: Seq[Long], num: Int, den: Int): Long = {
      val s = xs.sorted
      s(((num * s.size + den - 1) / den - 1).toInt)
    }
    val a = perUser.filter(p => arm(p._1) == 0).map(_._2)
    val b = perUser.filter(p => arm(p._1) == 1).map(_._2)
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
    assert(got.getLong(2) == lowerQ(a, 1, 2) && got.getLong(3) == lowerQ(b, 1, 2))
    assert(got.getLong(4) == lowerQ(a, 9, 10) && got.getLong(5) == lowerQ(b, 9, 10))
    assert(got.getLong(6) == lowerQ(b, 1, 2) - lowerQ(a, 1, 2))
    assert(got.getLong(7) == lowerQ(b, 9, 10) - lowerQ(a, 9, 10))
  }

  test("ks_test: matches a brute-force ECDF sup recomputation") {
    val perUser = Seq(
      (1L, 100L), (2L, 200L), (3L, 100L), (4L, 300L), (5L, 200L),
      (6L, 400L), (7L, 100L), (8L, 500L), (9L, 250L), (10L, 200L)
    )
    val got = TimeSeries.ksTestOf(perUser.toDF("user_id", "cents"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    val (nA, nB, dScaled, d, lambda) = got
    def arm(u: Long): Long =
      ((u * Behavioral.AbHashA + Behavioral.AbHashB) % Behavioral.AbMod) % 2
    val a = perUser.filter(p => arm(p._1) == 0).map(_._2)
    val b = perUser.filter(p => arm(p._1) == 1).map(_._2)
    // brute-force sup over every observed value of the scaled ECDF gap
    val want = perUser.map(_._2).distinct.map { v =>
      math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)
    }.max
    assert((nA, nB) == (a.size.toLong, b.size.toLong))
    assert(dScaled == want)
    assert(math.abs(d - want.toDouble / (a.size.toLong * b.size)) < 1e-12)
    assert(lambda > 0 && !lambda.isNaN)
  }

  test("ks_test: identical arms give D = 0; disjoint arms give D = 1") {
    // users chosen so the AbHash coin splits them 0/1 alternately is NOT
    // guaranteed — instead pick ids per arm by probing the coin
    def arm(u: Long): Long =
      ((u * Behavioral.AbHashA + Behavioral.AbHashB) % Behavioral.AbMod) % 2
    val ids = (1L to 200L)
    val armA = ids.filter(arm(_) == 0).take(5)
    val armB = ids.filter(arm(_) == 1).take(5)
    // identical distributions: same multiset of cents on both arms
    val same = (armA.zip(Seq(1L, 2L, 2L, 3L, 9L)) ++
      armB.zip(Seq(1L, 2L, 2L, 3L, 9L)))
    val gotSame = TimeSeries.ksTestOf(same.toDF("user_id", "cents"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(gotSame._3 == 0L && gotSame._4 == 0.0)
    // disjoint supports: arm A all below arm B -> D = 1 at the boundary
    val disj = (armA.map(u => (u, 1L)) ++ armB.map(u => (u, 100L)))
    val gotDisj = TimeSeries.ksTestOf(disj.toDF("user_id", "cents"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(gotDisj._4 == 1.0, s"disjoint supports must reach D=1, got ${gotDisj._4}")
  }

  test("ks_test: fixture D is a valid statistic and arms are nonempty") {
    val got = TimeSeries.ksTest(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().head
    val (nA, nB, dScaled, d, lambda) = got
    assert(nA > 0 && nB > 0)
    assert(dScaled >= 0 && dScaled <= nA * nB)
    assert(d >= 0.0 && d <= 1.0)
    assert(lambda >= 0.0 && !lambda.isNaN)
  }
}
