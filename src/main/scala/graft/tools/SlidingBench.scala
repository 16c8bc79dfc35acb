package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SketchOps

/** Sliding-distinct cost curve: sketch-path vs exact-path as the
  * trailing window widens. The sketch's window-merge traffic is
  * 64 register rows per day REGARDLESS of user volume; the exact
  * path's is the daily-active table exploded W× — so the exact cost
  * curve rises with W while the sketch's stays flat. Prints wall time
  * (best-of-3) and the exploded row count each path shuffles.
  *
  * Usage: runMain graft.tools.SlidingBench   (env SPARK_GRAFT_SF_DIR)
  */
object SlidingBench {
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

    def exactOnly(w: Int) = {
      val ev = graft.queries.Relational.events(spark, sfDir)
        .select(expr("_ms DIV 86400000").as("day"), col("user_id"))
      val du = ev.select(col("day"), col("user_id")).distinct()
      val days = du.select(col("day")).distinct()
      du.withColumn("tday", explode(expr(s"sequence(day, day + ${w - 1})")))
        .join(broadcast(days.withColumnRenamed("day", "tday")), Seq("tday"))
        .groupBy(col("tday"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
    }

    def bestOf3(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    println(f"${"W"}%4s ${"sketch_s"}%9s ${"exact_s"}%9s ${"sketch_rows"}%12s ${"exact_rows"}%11s")
    Seq(7, 30, 90).foreach { w =>
      val (ts, _) = bestOf3(SketchOps.hllSlidingAt(spark, sfDir, w, withExact = false).count())
      val (te, _) = bestOf3(exactOnly(w).count())
      // exploded row volumes each path pushes through its merge exchange —
      // BOTH measured (the analytic nDays·64·w overstates the sketch arm:
      // sparse days hit fewer than 64 registers)
      val ev = graft.queries.Relational.events(spark, sfDir)
        .select(expr("_ms DIV 86400000").as("day"), col("user_id"))
      val sketchRows = SketchOps.slidingRegRowCount(spark, sfDir, w)
      val exactRows = ev.select(col("day"), col("user_id")).distinct().count() * w
      println(f"$w%4d $ts%9.2f $te%9.2f $sketchRows%12d $exactRows%11d")
    }
    spark.stop()
  }
}
