package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The two skew strategies side by side on a deliberately skewed join
  * (one hot key holding ~90% of the fact side): AQE's runtime skew-join
  * split vs the deterministic salted join (ops.Skew). Both must equal
  * the plain join exactly; the AQE run must actually SPLIT the skewed
  * partition (asserted on the final adaptive plan), not merely be
  * configured to. Measured comparison recorded in SCALE.md. */
class SkewJoinSpec extends SparkSuite {

  /** ~200k fact rows: 90% on key 0, the rest uniform over 999 keys;
    * dim = one row per key. Values are deterministic functions of the
    * row id so aggregates are engine-order independent. */
  private def skewedData(): (DataFrame, DataFrame) = {
    val fact = spark.range(0, 200000)
      .select(
        when(col("id") % 10 < 9, 0L).otherwise(pmod(col("id"), lit(999L)) + 1L).as("k"),
        (col("id") % 97).as("v"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 31 % 101).as("w"))
    (fact, dim)
  }

  /** groupBy-free checksum of the join result: count + sum(v*w) — equal
    * checksums + equal counts pin the multiset of joined rows. */
  private def checksum(j: DataFrame): (Long, Long) = {
    val r = j.agg(count(lit(1)), sum(col("v") * col("w"))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join splits the hot partition and equals the salted join exactly") {
    val (fact, dim) = skewedData()
    // force a shuffle join (dim would broadcast) and make the skew
    // thresholds reachable at test scale
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {

      val plain = fact.join(dim, Seq("k"))
      val plainSum = checksum(plain)
      // the adaptive plan finalizes only after THIS QueryExecution runs —
      // collect() drives plain.queryExecution itself (a .write would build
      // its own separate execution); then the SMJ must be marked
      // skew=true (the hot partition actually split into subpartitions)
      plain.collect()
      val finalPlan = plain.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")

      val salted = graft.ops.Skew.saltedJoin(fact, dim, "k", factor = 8)
      assert(checksum(salted) == plainSum, "salted join must equal the plain join")

      // AQE-off, salt-off: the degenerate baseline every strategy must match
      withConf("spark.sql.adaptive.enabled" -> "false") {
        assert(checksum(fact.join(dim, Seq("k"))) == plainSum)
      }
    }
  }

  test("salted join spreads the hot key over `factor` salt buckets") {
    val (fact, dim) = skewedData()
    // salt distribution on the hot key: every bucket populated, no bucket
    // holding more than ~2x its fair share (xxhash64 over row content)
    val salts = fact.filter(col("k") === 0L)
      .withColumn("_salt",
        pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(8)).cast("int"))
      .groupBy(col("_salt")).count().collect()
    assert(salts.length == 8, s"expected 8 salt buckets, got ${salts.length}")
    val counts = salts.map(_.getLong(1))
    val fair = counts.sum.toDouble / 8
    assert(counts.max < 2 * fair, s"salt skewed: ${counts.mkString(",")}")
  }
}
