package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Sub-second-tail probe (r16, VERDICT r15 item 6): the ~150 queries
  * under ~1 s sum to ~100 s of the sweep and every profile says their
  * cost is driver/planning floor, not executor work. One identified
  * GLOBAL suspect is whole-stage-codegen recompilation thrash:
  * `spark.sql.codegen.cache.maxEntries` (STATIC conf) defaults to 100
  * entries while a full sweep cycles ~264 queries × several codegen
  * stages each — a cyclic access pattern over an LRU cache smaller than
  * the cycle recompiles EVERY stage EVERY pass.
  *
  * Because the conf is static (fixed at SparkContext build), the A/B
  * runs as separate forked JVMs of THIS main, alternating arms to share
  * host weather. The probe reports per-query best-of-N plus the JVM's
  * own codegen-compilation counters (CodegenMetrics), which directly
  * count the recompiles the cache size causes.
  *
  * Usage: runMain graft.tools.TailProbe <maxEntries> <reps> <name> [...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val maxEntries = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.codegen.cache.maxEntries", maxEntries)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        graft.ops.Windows.KeepConstPartitionKeysRule)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def compiles(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000)
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // warmup pass over the probe set (the bench does this over the full
    // registry; the probe set stands in for it)
    for (n <- names) {
      spark.catalog.clearCache()
      try { SparkEntry.queries(n)(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    val (c0, _) = compiles()
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { SparkEntry.queries(n)(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
      samples(n) = ((System.nanoTime() - t0) / 1e9) :: samples(n)
    }
    val (c1, _) = compiles()
    val mins = names.map(n => n -> samples(n).min)
    mins.foreach { case (n, v) => println(f"[tailprobe] $n%-28s best=$v%6.3f") }
    println(f"[tailprobe] maxEntries=$maxEntries total_best=${mins.map(_._2).sum}%.3f " +
      s"codegen_compiles_timed_region=${c1 - c0}")
    println(TimeQuery.JsonTag +
      s"""{"name":"_tailprobe_total_$maxEntries","best":${f"${mins.map(_._2).sum}%.3f"}}""")
    spark.stop()
  }
}
