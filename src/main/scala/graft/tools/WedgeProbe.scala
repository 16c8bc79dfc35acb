package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B for the wedge-expansion repartition (GraphOps): times the named
  * graph queries with the explicit expansion parallelism on vs off in
  * one JVM. The CoTables projection is shared per (session, dir) — both
  * cloned sessions hit the same warm projection, so the probe times the
  * kernel, not the build. Usage: runMain graft.tools.WedgeProbe <name> [...]
  */
object WedgeProbe {
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
    val off = spark.newSession()
    off.conf.set(graft.ops.GraphOps.ExpansionRepartitionConf, "false")
    def time(tag: String, s: SparkSession, name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(s, sfDir).count() // warm (also builds/reuses the shared CoTables)
      val ts = (1 to 3).map { _ =>
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[wedgeprobe] $name%-24s $tag best=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // interleave on/off so host weather hits both arms alike
    args.foreach { name =>
      time("exp=off", off, name)
      time("exp=on ", spark, name)
      time("exp=off", off, name)
      time("exp=on ", spark, name)
    }
    spark.stop()
  }
}
