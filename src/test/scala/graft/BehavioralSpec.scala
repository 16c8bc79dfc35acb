package graft

import org.apache.spark.sql.functions._
import graft.queries.Behavioral

/** Behavioral sequence analytics: windowFunnel and sequenceCount. */
class BehavioralSpec extends SparkSuite {
  import spark.implicits._

  private val W = Behavioral.FunnelWindowMs

  private def ev(rows: (Long, String, Long, Long)*) =
    rows.toDF("user_id", "event_type", "event_id", "_ms")

  test("scd2: hand-computed versions — runs compress, intervals chain, last is open") {
    val events = ev(
      // user 1: A A B A -> three versions (A×2, B×1, A×1)
      (1L, "A", 1L, 10L), (1L, "A", 2L, 20L), (1L, "B", 3L, 30L), (1L, "A", 4L, 40L),
      // user 2: single event -> one open version
      (2L, "C", 5L, 100L))
    val got = Behavioral.scd2Of(events)
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "A", 10L, Some(30L), 2L, false),
      (1L, 2L, "B", 30L, Some(40L), 1L, false),
      (1L, 3L, "A", 40L, None, 1L, true),
      (2L, 1L, "C", 100L, None, 1L, true)))
  }

  test("scd2: fixture invariants — versions tile the log, intervals chain, one open per user") {
    val out = Behavioral.scd2(spark, sf).cache()
    val ev = graft.queries.Relational.events(spark, sf)
    // per-user event counts are exactly tiled by the versions
    val tiles = out.groupBy(col("user_id")).agg(sum(col("n_events")).as("n"))
      .join(ev.groupBy(col("user_id")).agg(count(lit(1)).as("want")), Seq("user_id"))
    assert(tiles.filter(col("n") =!= col("want")).count() == 0)
    // exactly one open (current) version per user
    val opens = out.filter(col("is_current")).groupBy(col("user_id")).count()
    assert(opens.filter(col("count") =!= 1L).count() == 0)
    assert(opens.count() == ev.select(col("user_id")).distinct().count())
    // intervals chain: valid_to equals the NEXT version's valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val chained = out.withColumn("_next_from", lead(col("valid_from_ms"), 1).over(w))
    assert(chained.filter(coalesce(col("valid_to_ms"), lit(-1L)) =!=
      coalesce(col("_next_from"), lit(-1L))).count() == 0)
    // adjacent versions always change the attribute
    val adj = out.withColumn("_next_attr", lead(col("attr"), 1).over(w))
    assert(adj.filter(col("_next_attr").isNotNull &&
      col("_next_attr") === col("attr")).count() == 0)
    out.unpersist()
  }

  test("attribution: hand-computed linear split, remainder to last touch, window bound") {
    val W = Behavioral.AttributionWindowMs
    val events = ev(
      // user 1: 3 touches -> 333 each, remainder +1 to the most recent (click)
      (1L, "view", 1L, 0L), (1L, "view", 2L, 50L), (1L, "click", 3L, 100L),
      (1L, "purchase", 4L, 200L),
      // user 2: the only touch is outside the window -> unattributed
      (2L, "view", 5L, 0L), (2L, "purchase", 6L, W + 1000L),
      // user 3: purchase with no touches at all -> no rows
      (3L, "purchase", 7L, 0L),
      // user 4: one view feeding TWO purchases -> credited 1000 by each
      (4L, "view", 8L, 0L), (4L, "purchase", 9L, 100L), (4L, "purchase", 10L, 150L))
    val got = Behavioral.attributionOf(events)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      (1L, "click") -> ((1L, 1L, 334L)),
      (1L, "view") -> ((2L, 1L, 666L)),
      (4L, "view") -> ((2L, 2L, 2000L))))
  }

  test("attribution: fixture credits tile exactly 1000 per attributed conversion") {
    val out = Behavioral.attribution(spark, sf).cache()
    val evf = graft.queries.Relational.events(spark, sf)
    val purchases = evf.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("_ms").as("p_ms"))
    val touches = evf.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("_ms").as("t_ms"))
    val attributed = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ms") <= col("p_ms") &&
        col("t_ms") > col("p_ms") - Behavioral.AttributionWindowMs)
      .select(col("p_id")).distinct().count()
    val totalCredit = out.agg(sum(col("credit_milli_total"))).collect()(0).getLong(0)
    assert(totalCredit == 1000L * attributed,
      s"credits ($totalCredit) must tile 1000 x $attributed conversions")
    assert(out.filter(col("n_touches") < col("n_conversions")).count() == 0)
    out.unpersist()
  }

  test("windowFunnel: hand-computed levels, window and order boundaries") {
    val events = ev(
      // user 1: clean 3-step chain inside the window -> level 3, delay 200
      (1L, "view", 1L, 0L), (1L, "click", 2L, 100L), (1L, "purchase", 3L, 200L),
      // user 2: click lands outside the 24 h anchor window -> level 1
      (2L, "view", 4L, 0L), (2L, "click", 5L, W + 1000L),
      // user 3: purchase exists but BEFORE the click -> strict-increase
      // chain stops at level 2
      (3L, "view", 6L, 100L), (3L, "purchase", 7L, 150L), (3L, "click", 8L, 200L),
      // user 4: no view at all -> level 0
      (4L, "click", 9L, 0L), (4L, "purchase", 10L, 50L),
      // user 5: purchase exactly AT t1 + W (inclusive bound) -> level 3
      (5L, "view", 11L, 0L), (5L, "click", 12L, 50L), (5L, "purchase", 13L, W))
    val got = Behavioral.windowFunnelOf(events)
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (0L, 1L, None),
      (1L, 1L, None),
      (2L, 1L, None),
      (3L, 2L, Some((200L + W) / 2))))
  }

  test("windowFunnel: earliest-anchor contract — a later view cannot re-anchor") {
    // The first view's window misses the purchase; a later view would
    // catch it. Earliest-anchor greedy stays at the level the first
    // anchor reaches (here 2: the click IS inside the first window).
    val events = ev(
      (1L, "view", 1L, 0L), (1L, "click", 2L, 10L),
      (1L, "view", 3L, W + 100L), (1L, "purchase", 4L, W + 200L))
    val got = Behavioral.windowFunnelOf(events)
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((2L, 1L, None)))
  }

  test("sequenceCount: closed form equals the direct greedy scan on random streams") {
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "purchase", "click")
    val rows = for {
      uid <- 0L until 40L
      eid <- 0L until (5 + rnd.nextInt(30)).toLong
    } yield (uid, types(rnd.nextInt(3)), uid * 1000 + eid, rnd.nextInt(100000).toLong)
    val got = Behavioral.sequenceCountOf(ev(rows: _*), "view", "purchase")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // direct automaton: on view push, on purchase pop-if-open
    val want = rows.groupBy(_._1).map { case (uid, es) =>
      var open = 0; var matched = 0
      es.filter(e => e._2 == "view" || e._2 == "purchase")
        .sortBy(e => (e._4, e._3))
        .foreach { e =>
          if (e._2 == "view") open += 1
          else if (open > 0) { matched += 1; open -= 1 }
        }
      uid -> matched.toLong
    }
    assert(got == want.filter { case (uid, _) =>
      rows.exists(r => r._1 == uid && (r._2 == "view" || r._2 == "purchase")) })
  }

  test("sequenceCount: registered query invariants hold on the fixture") {
    val df = Behavioral.sequenceCount(spark, sf)
    val rows = df.as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.sortBy(_._1) == rows, "ordered by user_id")
    rows.foreach { case (uid, nOpen, nClose, nMatched) =>
      assert(nMatched >= 0L && nMatched <= math.min(nOpen, nClose),
        s"user $uid: matched $nMatched outside [0, min($nOpen, $nClose)]")
    }
  }

  test("transitions: hand-computed matrix, order and tie discipline") {
    val events = ev(
      // user 1 stream (ms order): view -> click -> view -> purchase
      (1L, "view", 1L, 0L), (1L, "click", 2L, 10L),
      (1L, "view", 3L, 20L), (1L, "purchase", 4L, 30L),
      // user 2: ms tie broken by event_id: click(5) then view(6)
      (2L, "click", 5L, 100L), (2L, "view", 6L, 100L),
      // user 3: single event -> contributes no transition
      (3L, "purchase", 7L, 0L))
    val got = Behavioral.transitionsOf(events)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // user 1 contributes view→click, click→view, view→purchase;
    // user 2 contributes click→view (the event_id tiebreak at ms=100);
    // user 3 contributes nothing
    assert(got == Seq(
      ("click", "view", 2L, 2L, 1000L),
      ("view", "click", 1L, 2L, 500L),
      ("view", "purchase", 1L, 2L, 500L)))
  }

  test("transitions: fixture matrix tiles the event stream exactly") {
    val rows = Behavioral.transitions(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(r => (r._1, r._2)) == rows.map(r => (r._1, r._2)).sorted)
    // sum of n over the matrix = n_events - n_users_with_events (each
    // user's stream of k events yields k-1 transitions)
    val ev = graft.queries.Relational.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers)
    // n_from tiles per source; p_milli is the exact integer quotient
    rows.groupBy(_._1).foreach { case (from, g) =>
      assert(g.map(_._3).sum == g.head._4, s"n_from tiling broken at $from")
    }
    rows.foreach { case (_, _, n, nFrom, p) =>
      assert(p == 1000 * n / nFrom)
    }
  }

  test("retention: hand-computed cohorts, first-signup anchoring, CH pairing semantics") {
    val D = 86400000L
    val events = ev(
      // user 1: signup, view day 2, purchase day 10 -> all three flags
      (1L, "signup", 1L, 0L), (1L, "view", 2L, 2 * D), (1L, "purchase", 3L, 10 * D),
      // user 2: signup, view day 8 (outside 7d), purchase day 40 (outside 30d)
      (2L, "signup", 4L, 0L), (2L, "view", 5L, 8 * D), (2L, "purchase", 6L, 40 * D),
      // user 3: view+purchase but never signed up -> only counted in n_users
      (3L, "view", 7L, 0L), (3L, "purchase", 8L, D),
      // user 4: TWO signups; the view is within 7d of the FIRST -> retained
      (4L, "signup", 9L, 0L), (4L, "signup", 10L, 20 * D), (4L, "view", 11L, 6 * D),
      // user 5: view BEFORE the signup -> not retained (ms >= t0 required)
      (5L, "view", 12L, 0L), (5L, "signup", 13L, D))
    val got = Behavioral.retentionOf(events)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 4L, 2L, 1L)))
  }

  test("retention: fixture cohorts are monotone and bounded") {
    val Seq((n, s1, r7, r30)) = Behavioral.retention(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(n > 0 && s1 <= n && r7 <= s1 && r30 <= s1,
      s"retention counts not nested: $n, $s1, $r7, $r30")
    assert(s1 > 0, "fixture has signups")
  }

  test("windowFunnel: registered query is a valid level histogram on the fixture") {
    val rows = Behavioral.windowFunnel(spark, sf)
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1) == rows.map(_._1).sorted, "ordered by level")
    assert(rows.map(_._1).distinct == rows.map(_._1), "one row per level")
    rows.foreach { case (level, nUsers, delay) =>
      assert(level >= 0L && level <= 3L && nUsers > 0L)
      assert(delay.isEmpty == (level != 3L),
        s"avg delay must exist exactly at level 3 (level $level)")
      delay.foreach(d => assert(d > 0L && d <= W))
    }
  }

  test("ab test: deterministic balanced arms, finite null-effect statistics") {
    val r = graft.queries.Behavioral.abTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nA, nB) = (row.getLong(0), row.getLong(1))
    assert(nA > 0 && nB > 0, "both arms populated")
    // the affine coin splits ~50/50 at any population
    assert(math.abs(nA - nB) * 5 <= nA + nB, s"arms unbalanced: $nA vs $nB")
    // conversion must not be degenerate (the fence the fixture forced:
    // every user has purchases, so the threshold form keeps rates inside
    // (0, 1) and the z denominators away from 0)
    val (rateA, rateB) = (row.getDouble(4), row.getDouble(5))
    assert(rateA > 0 && rateA < 1 && rateB > 0 && rateB < 1)
    Seq(6, 9).foreach { i =>
      val z = row.getDouble(i)
      assert(!z.isNaN && !z.isInfinite, s"statistic $i not finite: $z")
    }
    // A/A contract: assignment is a pure function — rerun is identical
    assert(graft.queries.Behavioral.abTest(spark, sf).collect().head == row)
  }

  test("cuped: pooled adjusted variance never exceeds raw, statistics finite, deterministic") {
    val r = graft.queries.Behavioral.abCuped(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (varRaw, varAdj) = (row.getDouble(5), row.getDouble(6))
    // the OLS theta minimizes in-sample pooled variance, so the adjusted
    // pooled variance is mathematically <= raw (the fixture's covariate
    // is weak — rho ~ 0.07 measured — so the margin is small but the
    // inequality is exact)
    assert(varAdj <= varRaw && varAdj > 0,
      s"pooled CUPED variance $varAdj must be in (0, $varRaw]")
    Seq(2, 3, 4).foreach { i =>
      val v = row.getDouble(i)
      assert(!v.isNaN && !v.isInfinite, s"statistic $i not finite")
    }
    assert(graft.queries.Behavioral.abCuped(spark, sf).collect().head == row)
  }

  test("srm: healthy hash split never fires, a broken split always does, totals tile the days") {
    val rows = graft.queries.Behavioral.abSrm(spark, sf).collect()
    assert(rows.nonEmpty)
    val (total, daily) = rows.partition(_.getLong(0) == -1L)
    assert(total.length == 1 && daily.nonEmpty)
    // the affine coin is a real randomization: the 95% fence must hold
    // on the overall row (daily rows can exceed it ~1 day in 20 by
    // construction of the test, so only the total is pinned)
    assert(total.head.getLong(4) == 0L,
      s"healthy split flagged SRM: ${total.head}")
    // chi2 arithmetic: recompute from the emitted counts
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == 1000000L * (na - nb) * (na - nb) / (na + nb))
    }
    // a deliberately broken split (90/10) must fire at this population:
    // chi2 = (0.8n)^2/n = 0.64n, over 3.841 for n >= 7
    val n = total.head.getLong(1) + total.head.getLong(2)
    val broken = 1000000L * (n * 8 / 10 - n * 2 / 10) * (n * 8 / 10 - n * 2 / 10) / n
    assert(n >= 7 && broken > 3841000L, "the fence must catch a 90/10 break")
  }

  test("point-in-time join: attribution equals a brute-force as-of scan — no future version ever leaks") {
    val evf = graft.queries.Relational.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("_ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // brute force: per user, context events sorted by (ms, id) open runs;
    // a purchase's as-of attr is the LAST context run starting at/before
    // its ms (strictly before the next run) — never a later version
    val ctxRuns = evf.filter(_._3 != "purchase").groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val runs = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, e) =>
        if (acc.nonEmpty && acc.last._1 == e._3) acc else acc :+ (e._3, e._4)
      }
      u -> runs
    }
    val expect = evf.filter(_._3 == "purchase").groupBy { p =>
      ctxRuns.getOrElse(p._1, Vector.empty)
        .takeWhile(_._2 <= p._4).lastOption.map(_._1).getOrElse("unknown")
    }.map { case (attr, ps) =>
      attr -> (ps.size.toLong, ps.map(_._1).distinct.size.toLong, ps.map(_._5).sum)
    }
    val got = graft.queries.Behavioral.pointInTimeJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"PIT attribution mismatch:\n got=$got\n exp=$expect")
  }

  test("bot cadence: planted constant-cadence users rank first at cv2=0, organic users are never flagged") {
    // The plants live at user_ids 900001-900003; the partition below and
    // the query's ground-truth injection are only sound while the
    // fixture's organic id space stays strictly below them. A fixture
    // change that reaches 900001 must fail HERE, loudly, not silently
    // merge plants with organic events (oracle would stay green since
    // both engines plant identically — this assert is the only guard).
    val maxOrganic = graft.queries.Relational.events(spark, sf)
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("user_id"))).head.getLong(0)
    assert(maxOrganic < 900001L,
      s"fixture organic user_id space ($maxOrganic) collides with planted bot ids >= 900001")
    val rows = graft.queries.Behavioral.botCadence(spark, sf).collect()
    assert(rows.nonEmpty)
    val (bots, organic) = rows.partition(_.getLong(0) >= 900001L)
    assert(bots.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sorted.toSeq ==
      Seq((900001L, 0L, 1L), (900002L, 0L, 1L), (900003L, 0L, 1L)),
      "all three plants must surface at cv2 = 0, flagged")
    // uniform-random organic gaps sit near cv2 ~ 1/3+; far above the fence
    organic.foreach { r =>
      assert(r.getLong(4) == 0L && r.getLong(3) > 100L,
        s"organic user ${r.getLong(0)} must not be bot-flagged: $r")
    }
    // the readout is sorted most-regular first
    val cvs = rows.map(_.getLong(3))
    assert(cvs.zip(cvs.tail).forall { case (a, b) => a <= b })
  }

  test("hampel: a planted spike is flagged, its neighbors / constant / ramp series are not") {
    // user 1: flat line with one spike; user 2: constant; user 3: ramp
    val rows = (0 until 9).map(i =>
        (1L, i.toLong, (i * 10).toLong, if (i == 4) 5000L else 100L)) ++
      (0 until 9).map(i => (2L, (100 + i).toLong, (i * 10).toLong, 250L)) ++
      (0 until 9).map(i => (3L, (200 + i).toLong, (i * 10).toLong, (100 * (i + 1)).toLong))
    val got = Behavioral.hampelOf(
        rows.toDF("user_id", "event_id", "_ms", "cents"))
      .collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 4L)),
      s"exactly the spike must be flagged, got ${got.mkString(",")}")
    // the spike row's frame: med = flat value, MAD = 0 -> dev > 0 fires
    val r = got.head
    assert(r.getLong(2) == 5000L && r.getLong(3) == 100L &&
      r.getLong(4) == 0L && r.getLong(5) == 4900L)
  }

  test("poisson bootstrap: replicate weights and order-statistic CI match a plain-Scala replay") {
    val users = (1L to 200L).map(u => (u, u * 7L % 400L + 100L))
    val out = Behavioral.bootstrapCiOf(users.toDF("user_id", "cents")).collect()
    assert(out.length == 1)
    val row = out.head
    // replay the identical inverse-CDF Poisson(1) draw in plain Scala
    def w(u: Long, r: Long): Long = {
      val h1 = (u * Behavioral.AbHashA + Behavioral.AbHashB) % Behavioral.BootMod
      val v = (h1 + r * 747796405L) % Behavioral.BootMod
      val h = ((v * v) % Behavioral.BootMod * 69069L + v * 362437L + 1013904223L) %
        Behavioral.BootMod
      val i = Behavioral.BootCdf.indexWhere(h < _)
      if (i < 0) Behavioral.BootCdf.size.toLong else i.toLong
    }
    val means = (0 until Behavioral.BootReps).map { r =>
      val (s, n) = users.foldLeft((0L, 0L)) { case ((s, n), (u, c)) =>
        val wt = w(u, r.toLong); (s + wt * c, n + wt)
      }
      s.toDouble / n
    }.sorted
    val mean = users.map(_._2).sum.toDouble / users.length
    assert(row.getLong(0) == users.length.toLong) // n_users
    assert(row.getDouble(1) == mean)
    assert(row.getLong(2) == Behavioral.BootReps.toLong)
    assert(row.getDouble(3) == means(1)) // ci_lo: 2nd smallest
    assert(row.getDouble(4) == means(Behavioral.BootReps - 2)) // ci_hi: 39th
    // the resampling distribution brackets the point estimate on this
    // fixed fixture (weights average 1 per replicate)
    assert(row.getDouble(3) <= mean && mean <= row.getDouble(4))
    assert(row.getDouble(3) < row.getDouble(4))
  }

  test("sequential OBF: boundary decays to ~C at horizon, crossings respect it, cumulatives are monotone") {
    val r = Behavioral.sequentialObf(spark, sf).collect()
    assert(r.length >= 10, s"need a real look grid, got ${r.length} days")
    // cumulative counts are monotone nondecreasing in day
    Seq(1, 2, 3, 4).foreach { i =>
      val xs = r.map(_.getLong(i))
      assert(xs.zip(xs.tail).forall { case (a, b) => a <= b }, s"col $i not monotone")
    }
    // the boundary is strictly decreasing in information and ends at C
    // (the final look has information fraction exactly 1)
    val bounds = r.map(_.getDouble(6))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a >= b })
    assert(math.abs(bounds.last - 2.24) < 1e-12)
    // early boundaries are strictly harder than the fixed-horizon 1.96
    assert(bounds.head > 1.96)
    // crossed is exactly the |z| > bound predicate wherever z exists
    r.foreach { row =>
      val crossed = row.getLong(7)
      if (row.isNullAt(5)) assert(crossed == 0L)
      else assert(crossed == (if (math.abs(row.getDouble(5)) > row.getDouble(6)) 1L else 0L))
    }
    // A/A contract on the hash coin: the full readout is reproducible
    assert(Behavioral.sequentialObf(spark, sf).collect().toSeq == r.toSeq)
  }

  test("seasonal hours: cell medians match brute force, fence is the exact modified-z rule") {
    val hourly = graft.queries.Relational.events(spark, sf)
      .select(expr("_ms DIV 86400000").as("day"),
        expr("(_ms % 86400000) DIV 3600000").as("hour"))
      .groupBy(col("day"), col("hour")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0) % 7, r.getLong(1)), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = { val s = xs.sorted; s((s.length + 1) / 2 - 1) }
    val expect = hourly.groupBy(_._1).map { case (k, g) =>
      val vals = g.map(_._2).toSeq
      val med = lowerMedian(vals)
      val devs = vals.map(v => (v - med).abs)
      val mad = lowerMedian(devs)
      k -> (vals.length.toLong, med, mad,
        devs.count(dv => dv * 6745L > mad * 35000L).toLong, vals.sum)
    }
    val got = Behavioral.seasonalHours(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 168)
    got.foreach { r =>
      val e = expect((r.getLong(0), r.getLong(1)))
      val g = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(g == e, s"cell (${r.getLong(0)}, ${r.getLong(1)}): got $g expected $e")
    }
    assert(got.length == expect.size)
  }

  test("theil-sen: exact slope on a clean ramp, unmoved by a planted outlier day, OLS is not") {
    // clean ramp: cents = 500 + 250·day → every pairwise slope is
    // exactly 250000 milli-cents/day
    val ramp = (0L to 20L).map(d => (d, 500L + 250L * d))
    val clean = Behavioral.theilSenOfDaily(ramp.toDF("day", "cents")).collect().head
    assert(clean.getLong(0) == 21L && clean.getLong(1) == 210L)
    assert(clean.getLong(2) == 250000L)
    assert(clean.getLong(3) == 210L && clean.getLong(4) == 0L) // all pairs up
    // plant one catastrophic day (backfill spike 1000× the trend): the
    // median pairwise slope must not move, while the OLS slope explodes
    val dirty = ramp.map { case (d, c) => if (d == 10L) (d, c + 5000000L) else (d, c) }
    val got = Behavioral.theilSenOfDaily(dirty.toDF("day", "cents")).collect().head
    assert(got.getLong(2) == 250000L,
      s"median slope must resist a single outlier day, got ${got.getLong(2)}")
    // brute-force replay of the exact sign-split floor arithmetic
    def slope(d1: Long, c1: Long, d2: Long, c2: Long): Long = {
      val dc = c2 - c1; val dd = d2 - d1
      if (dc >= 0) 1000 * dc / dd else -(1000 * -dc / dd)
    }
    val slopes = (for {
      (d1, c1) <- dirty; (d2, c2) <- dirty if d1 < d2
    } yield slope(d1, c1, d2, c2)).sorted
    assert(got.getLong(2) == slopes((slopes.length + 1) / 2 - 1))
    assert(got.getLong(3) == dirty.combinations(2).count { case Seq((d1, c1), (d2, c2)) =>
      if (d1 < d2) c2 > c1 else c1 > c2 })
  }

  test("cusum: prefix-min identity equals the direct recursion, level shift fires, flat series does not") {
    // direct recursion reference
    def direct(ns: Seq[(Long, Long)], ref: Long): (Long, Long) = {
      var s = 0L; var smax = 0L; var dmax = -1L
      ns.sortBy(_._1).foreach { case (d, n) =>
        s = math.max(0L, s + (n - ref))
        if (s > smax) { smax = s; dmax = d }
      }
      (smax, dmax)
    }
    // level shift: 20 flat days at 100, then 10 days at 200
    val shifted = (0L until 20L).map(d => (d, 100L)) ++ (20L until 30L).map(d => (d, 200L))
    val got = Behavioral.cusumOfDaily(shifted.toDF("day", "n")).collect().head
    assert(got.getLong(0) == 30L)
    assert(got.getLong(1) == 100L && got.getLong(2) == 0L) // ref = median, MAD = 0
    val (smax, dmax) = direct(shifted, 100L)
    assert(got.getLong(3) == smax && got.getLong(4) == dmax)
    assert(smax == 1000L && dmax == 29L)
    assert(got.getLong(5) == 1L, "a sustained level shift must fire the fence")
    // flat series: S stays 0, nothing fires
    val flat = (0L until 30L).map(d => (d, 100L))
    val fg = Behavioral.cusumOfDaily(flat.toDF("day", "n")).collect().head
    assert(fg.getLong(3) == 0L && fg.getLong(5) == 0L)
    // a single point spike moves S for one day only — max equals the
    // spike excess, and the identity still matches the recursion
    val spike = flat.map { case (d, n) => if (d == 15L) (d, 400L) else (d, n) }
    val sg = Behavioral.cusumOfDaily(spike.toDF("day", "n")).collect().head
    val (s2, d2) = direct(spike, 100L)
    assert(sg.getLong(3) == s2 && sg.getLong(4) == d2 && s2 == 300L && d2 == 15L)
  }

  test("power analysis: formula replay, ceiling consistency at the requested MDE") {
    val r = Behavioral.powerAnalysis(spark, sf).collect().head
    val (n, nA, nB, conv) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == nA + nB && conv > 0 && conv < n)
    val p = conv.toDouble / n
    assert(r.getDouble(4) == p)
    val z = 1.96 + 0.8416
    assert(r.getDouble(5) == z * math.sqrt(2.0 * p * (1 - p) / math.min(nA, nB).toDouble))
    val nReq = r.getLong(6)
    assert(nReq == math.ceil(z * z * 2.0 * p * (1 - p) / ((0.05 * p) * (0.05 * p))).toLong)
    // consistency: at n_req per arm the detectable effect is <= the
    // requested 5% relative lift; at n_req - 1 it is not
    def mdeAt(nn: Long) = z * math.sqrt(2.0 * p * (1 - p) / nn.toDouble)
    assert(mdeAt(nReq) <= 0.05 * p + 1e-12)
    assert(mdeAt(nReq - 1) > 0.05 * p)
    assert(Behavioral.powerAnalysis(spark, sf).collect().head == r)
  }

  test("top paths: exact brute-force replay of the session-path rollup") {
    val got = Behavioral.topPaths(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    val ev = graft.queries.Relational.events(spark, sf)
      .select(col("user_id"), col("_ms"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(e => (e._1, e._2 / 86400000L)).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).take(Behavioral.PathSteps).map(_._4).mkString(">")
    }
    val expect = paths.groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == expect)
    // counts are descending and the truncation cap holds
    val cs = got.map(_.getLong(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    assert(got.forall(_.getString(0).split(">").length <= Behavioral.PathSteps))
  }

  test("poisson bootstrap: registered query is deterministic and well-formed on the fixture") {
    val a = Behavioral.bootstrapCi(spark, sf).collect()
    assert(a.length == 1)
    val r = a.head
    assert(r.getLong(0) > 0 && r.getLong(2) == Behavioral.BootReps.toLong)
    assert(r.getDouble(3) <= r.getDouble(4))
    // the CI is tight around the mean at fixture scale, not degenerate
    assert(r.getDouble(3) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(4))
    assert(Behavioral.bootstrapCi(spark, sf).collect().head == r)
  }
}
