package graft

import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, Sampling}
import graft.queries.TimeSeries

/** Regression pins for the round-12 ADVICE/verdict findings (fixed
  * round 13): the co-occurrence projection's GroupCap contract (the one
  * skew scale-killer on the r12 board), neymanAllocation's singleton-
  * stratum NaN, and mannWhitney's zero-variance 0/0. */
class AdviceR13Spec extends SparkSuite {

  // --- GroupCap: the bipartite→unipartite projection contract --------

  test("cappedMembership keeps a group AT the cap and drops one past it") {
    import spark.implicits._
    val atCap = (1L to GraphOps.CoGraph.GroupCap).map(p => (10L, p))
    val pastCap = (1L to GraphOps.CoGraph.GroupCap + 1).map(p => (20L, p))
    val m = spark.createDataset(atCap ++ pastCap).toDF("o", "p")
    val kept = GraphOps.cappedMembership(m)
    assert(kept.filter(col("o") === 10L).count() == GraphOps.CoGraph.GroupCap)
    assert(kept.filter(col("o") === 20L).count() == 0L,
      "a group one past GroupCap must be dropped entirely")
  }

  test("planted hot group: trianglesOf completes and equals the capped graph") {
    import spark.implicits._
    // normal orders: three 4-part cliques sharing no parts → known
    // triangle structure (each clique contributes C(4,3) = 4 triangles,
    // every member sits in C(3,2) = 3 of them)
    val normal = for {
      g <- 0L until 3L
      p <- 0L until 4L
    } yield (g, g * 100L + p)
    // hot group: 400 members (> GroupCap = 256), deliberately OVERLAPPING
    // the normal parts (members 0..11 are the clique parts) so that NOT
    // dropping it would change every clique node's count
    val hot = (0L until 400L).map(p => (999L, p / 4 * 100 + p % 4 + (p / 12) * 1000))
    val mNormal = spark.createDataset(normal).toDF("o", "p")
    val mAll = spark.createDataset(normal ++ hot).toDF("o", "p")
    val expected = GraphOps.trianglesOf(mNormal).collect().toSeq
    val got = GraphOps.trianglesOf(mAll).collect().toSeq
    assert(got == expected,
      "hot group must be dropped by the GroupCap contract before the pair expansion")
    assert(expected.nonEmpty && expected.head.getLong(1) == 3L)
  }

  test("planted hot group: linkPredictionOf ignores the mega-order") {
    import spark.implicits._
    // two star-ish orders sharing a spine so candidates exist, plus a
    // hot order over fresh part ids
    val normal = for {
      o <- 0L until 8L
      p <- 0L until 8L
      if (o + p) % 3 != 0
    } yield (o, p)
    val hot = (0L until 300L).map(p => (555L, 10000L + p))
    val mNormal = spark.createDataset(normal).toDF("o", "p")
    val mAll = spark.createDataset(normal ++ hot).toDF("o", "p")
    assert(GraphOps.linkPredictionOf(mAll).collect().toSeq ==
      GraphOps.linkPredictionOf(mNormal).collect().toSeq)
  }

  // --- neymanAllocation: singleton stratum --------------------------

  test("neyman allocation: a singleton stratum gets weight 0, not NaN") {
    import spark.implicits._
    val d = spark.createDataset(Seq(
      ("solo", 42L), // n_h = 1: variance term would be 0.0/0.0
      ("bulk", 10L), ("bulk", 30L), ("bulk", 50L), ("bulk", 70L)
    )).toDF("source", "n_chars")
    val rows = Sampling.neymanAllocationOf(d).collect()
    val solo = rows.find(_.getString(0) == "solo").get
    assert(solo.getAs[Long]("w_milli") == 0L)
    assert(solo.getAs[Long]("alloc_neyman") == 0L)
    val bulk = rows.find(_.getString(0) == "bulk").get
    assert(bulk.getAs[Long]("alloc_neyman") == Sampling.NeymanBudget,
      "the only stratum with variance takes the whole Neyman budget")
  }

  test("neyman allocation: ALL-singleton strata emit NULL (w_tot = 0 guard)") {
    import spark.implicits._
    val d = spark.createDataset(Seq(("a", 1L), ("b", 2L)))
      .toDF("source", "n_chars")
    val rows = Sampling.neymanAllocationOf(d).collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("alloc_neyman"))))
  }

  // --- mannWhitney: zero-variance arms -------------------------------

  test("mann-whitney z is NULL when every observation ties") {
    import spark.implicits._
    val d = spark.createDataset((1L to 40L).map(u => (u, 500L)))
      .toDF("user_id", "cents")
    val r = TimeSeries.mannWhitneyOf(d).collect().head
    assert(r.isNullAt(r.fieldIndex("z")),
      s"all-tied sample must yield NULL z, got ${r.get(r.fieldIndex("z"))}")
  }

  test("mann-whitney z is NULL for a single user and finite when healthy") {
    import spark.implicits._
    val one = spark.createDataset(Seq((2L, 100L))).toDF("user_id", "cents")
    val r1 = TimeSeries.mannWhitneyOf(one).collect().head
    assert(r1.isNullAt(r1.fieldIndex("z")))
    val healthy = spark.createDataset((1L to 60L).map(u => (u, u * 7L)))
      .toDF("user_id", "cents")
    val r2 = TimeSeries.mannWhitneyOf(healthy).collect().head
    assert(!r2.isNullAt(r2.fieldIndex("z")) &&
      !r2.getAs[Double]("z").isNaN)
  }
}
