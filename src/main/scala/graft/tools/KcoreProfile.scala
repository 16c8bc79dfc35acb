package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, Lineage}

/** Per-round timing probe for the k-core h-index loop — identifies
  * whether the cost is the round dag, the lineage truncation, or the
  * convergence action (SCALE.md records the findings). */
object KcoreProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def mark(label: String, since: Long): Long = {
      val now = System.nanoTime()
      println(f"[kcore] $label%-28s ${(now - since) / 1e9}%6.2fs (total ${(now - t0) / 1e9}%6.2fs)")
      now
    }
    var t = t0
    val li = graft.ops.GraphOps.cappedMembership(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
    val und = Lineage.truncate(
      li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b")).distinct())
    t = mark("und", t)
    val edges = Lineage.truncate(
      und.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("dst")))
    println(s"[kcore] |E| symmetrized = ${edges.count()}")
    t = mark("edges", t)
    var est = Lineage.truncate(edges
      .groupBy(col("dst").as("n")).agg(count(lit(1)).as("c")))
    println(s"[kcore] |V| = ${est.count()}")
    t = mark("est0", t)
    var prev = -1L
    var iter = 0
    var converged = false
    import org.apache.spark.sql.expressions.Window
    while (!converged && iter < GraphOps.Cores.MaxRounds) {
      val nb = edges
        .join(broadcast(est.withColumnRenamed("n", "src")), Seq("src"))
        .groupBy(col("dst").as("n"), col("c")).agg(count(lit(1)).as("k"))
      val cum = nb.withColumn("cum", sum(col("k"))
        .over(Window.partitionBy(col("n")).orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val h = cum.groupBy(col("n"))
        .agg(max(least(col("c"), col("cum"))).as("h"))
      val next = Lineage.truncate(h.join(broadcast(est), Seq("n"))
        .select(col("n"), least(col("c"), col("h")).as("c")))
      t = mark(s"round $iter truncate", t)
      val cur = Option(next.agg(sum(col("c"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      t = mark(s"round $iter estSum=$cur", t)
      est = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    println(s"[kcore] rounds=$iter converged=$converged")
    spark.stop()
  }
}
