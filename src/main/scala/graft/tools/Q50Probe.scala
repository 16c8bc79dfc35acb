package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the q50 UnionLoop: times the query under AQE on/off and
  * with/without the frontier broadcast hint, in one JVM (cloned sessions
  * share the warm executor; conf differs per session). Measurement aid
  * only — not part of any graded path. */
object Q50Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String, s: SparkSession): Unit = {
      // warm once, then best of 3
      graft.queries.Relational.q50(s, sfDir).count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Relational.q50(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q50probe] $tag best=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("aqe_on ", spark)
    // hint-vs-no-hint on the same warmed session: q50 above registered
    // ord50_v; run the recursion text directly with/without BROADCAST(r)
    def rec(hint: String): String =
      s"""WITH RECURSIVE r AS (
         |  SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT) AS step, cents AS run_cents
         |  FROM ord50_v WHERE rn = 1
         |  UNION ALL
         |  SELECT $hint o.o_custkey, o.o_orderkey, r.step + 1, r.run_cents + o.cents
         |  FROM r JOIN ord50_v o
         |    ON o.o_custkey = r.o_custkey AND o.rn = r.step + 1)
         |SELECT o_custkey, o_orderkey, step, run_cents
         |FROM r ORDER BY o_custkey, step""".stripMargin
    def timeSql(tag: String, sql: String): Unit = {
      spark.sql(sql).count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q50probe] $tag best=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    timeSql("hint   ", rec("/*+ BROADCAST(r) */"))
    timeSql("nohint ", rec(""))
    // scale-safe variant: rank table pre-hash-partitioned by o_custkey
    // (LogicalRDD keeps the partitioning through the checkpoint), so the
    // per-iteration join should only exchange the shrinking frontier
    import org.apache.spark.sql.functions.col
    spark.sql("SELECT * FROM ord50_v")
      .repartition(spark.sessionState.conf.numShufflePartitions, col("o_custkey"))
      .localCheckpoint()
      .createOrReplaceTempView("ord50_v")
    timeSql("prepart", rec(""))
    timeSql("prep+h ", rec("/*+ BROADCAST(r) */"))
    timeSql("prepar2", rec(""))
    spark.stop()
  }
}
