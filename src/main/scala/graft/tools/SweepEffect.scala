package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Isolates the in-sweep penalty hypothesis: a heavy query timed LATE in
  * a long one-JVM sweep (the driver-bench shape) vs its fresh-JVM
  * baseline. Every `Lineage.truncate`/`localCheckpoint` in earlier
  * queries leaves blocks in the block manager — `catalog.clearCache()`
  * does NOT drop them — so storage fills, execution memory shrinks and
  * late shuffle-heavy queries spill where their fresh-JVM baseline run
  * did not.
  *
  * Usage: runMain graft.tools.SweepEffect <unpersist:true|false> <target> <prefix...>
  * Runs each prefix query once (untimed), prints block-manager RDD count,
  * then times the target 3 reps.
  */
object SweepEffect {
  def main(args: Array[String]): Unit = {
    val unpersist = args(0).toBoolean
    val target = args(1)
    val prefix = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        graft.ops.Windows.KeepConstPartitionKeysRule)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn0 = SparkEntry.queries(target)
    val fresh = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn0(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[sweep] $target fresh-JVM best=${fresh.min}%.2fs all=[${fresh.map(t => f"$t%.2f").mkString(", ")}]")
    prefix.foreach { name =>
      spark.catalog.clearCache()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[sweep] $name failed: ${e.getMessage}") }
      if (unpersist)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val persisted = spark.sparkContext.getPersistentRDDs.size
    val status = spark.sparkContext.statusTracker.getExecutorInfos
      .map(e => s"${e.usedOnHeapStorageMemory()}/${e.totalOnHeapStorageMemory()}").mkString(",")
    println(s"[sweep] after ${prefix.size} prefix queries: persistedRDDs=$persisted storage=$status unpersist=$unpersist")
    jvmDiag()
    val fn = SparkEntry.queries(target)
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[sweep] $target after-sweep best=${times.min}%.2fs all=[${times.map(t => f"$t%.2f").mkString(", ")}]")
    jvmDiag()
    spark.stop()
  }

  /** JVM-level suspects for in-sweep degradation: code-cache pools (JIT
    * off when full), metaspace, GC time, compilation time. */
  private def jvmDiag(): Unit = {
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
      .foreach { p =>
        val u = p.getUsage
        println(f"[jvm] pool ${p.getName}%-28s used=${u.getUsed / 1048576}%5dMB max=${if (u.getMax < 0) -1 else u.getMax / 1048576}%5dMB")
      }
    val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(g => s"${g.getName}:${g.getCollectionCount}/${g.getCollectionTime}ms").mkString(" ")
    val ct = ManagementFactory.getCompilationMXBean
    println(s"[jvm] gc $gc jitTotalMs=${ct.getTotalCompilationTime} threads=${ManagementFactory.getThreadMXBean.getThreadCount}")
  }
}
