package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diff: engine k-truss vs the sequential reference peel (used
  * to debug the GraphOpsSpec reference; kept as a diagnostic). */
object TrussDiff {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val got = graft.ops.GraphOps.ktruss(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().as[(Long, Long)].collect()
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { grp =>
      val ps = grp.map(_._2).distinct
      for (x <- ps; y <- ps if x < y)
        support((x, y)) = support.getOrElse((x, y), 0L) + 1L
    }
    println(s"n_li=${li.length} n_pairs=${support.size} " +
      s"maxW=${if (support.isEmpty) -1 else support.values.max} " +
      s"ge2=${support.count(_._2 >= 2)} " +
      s"minSupport=${graft.ops.GraphOps.Cores.MinSupport} " +
      s"geMS=${support.count(_._2 >= graft.ops.GraphOps.Cores.MinSupport)} " +
      s"K=${graft.ops.GraphOps.Truss.K}")
    var edges = support.iterator.collect {
      case (e, w) if w >= graft.ops.GraphOps.Cores.MinSupport => e }.toSet
    def sup(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      es.foreach { case (a, b) => adj(a) += b; adj(b) += a }
      es.iterator.map(e => e -> (adj(e._1) & adj(e._2)).size).toMap
    }
    val s0 = sup(edges)
    println(s"round0: edges=${edges.size} sup>=1=${s0.count(_._2 >= 1)} " +
      s"supMax=${if (s0.isEmpty) -1 else s0.values.max}")
    var changed = true
    while (changed) {
      val s = sup(edges)
      val keep = edges.filter(e => s(e) >= graft.ops.GraphOps.Truss.K - 2)
      changed = keep != edges
      edges = keep
    }
    val s = sup(edges)
    val want = edges.toSeq.sorted.map(e => (e._1, e._2, s(e).toLong))
    println(s"got=${got.size} want=${want.size}")
    got.zip(want).zipWithIndex.find { case ((g, w), _) => g != w }
      .foreach { case ((g, w), i) => println(s"first diff at $i: got=$g want=$w") }
    println("equal: " + (got == want))
    spark.stop()
  }
}
