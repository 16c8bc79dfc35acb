package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  test("connected components: chain, separate component, and singleton pair") {
    // components: {1,2,3,4,5} (a 4-hop chain — exercises multi-round
    // propagation), {10,11}, {20,21,22} (triangle-ish via shared node)
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val cc = GraphOps.connectedComponents(pairs)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(cc == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: empty pair set yields empty labels") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(pairs).count() == 0L)
  }

  test("dedup clusters: every twin lands in its original's cluster, survivor = min") {
    val clusters = GraphOps.dedupClusters(spark, sf).cache()
    // every doc_id >= 1e6 is a twin of doc_id - 1e6; they must share a cluster
    val twins = clusters.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("orig", col("doc_id") - 1000000L)
    val origs = clusters.select(col("doc_id").as("orig"), col("cluster_id").as("orig_cluster"))
    val mismatched = twins.join(origs, Seq("orig"))
      .filter(col("cluster_id") =!= col("orig_cluster")).count()
    assert(mismatched == 0L)
    // survivor flag marks exactly the min doc of each cluster
    val badSurvivor = clusters
      .groupBy(col("cluster_id")).agg(
        min(col("doc_id")).as("min_doc"),
        sum(when(col("survivor"), col("doc_id"))).as("flagged"))
      .filter(col("min_doc") =!= col("flagged")).count()
    assert(badSurvivor == 0L)
    // cluster_size agrees with the actual member count
    val badSize = clusters.groupBy(col("cluster_id"), col("cluster_size"))
      .agg(count(lit(1)).as("members"))
      .filter(col("cluster_size") =!= col("members")).count()
    assert(badSize == 0L)
    clusters.unpersist()
  }

  test("with a checkpoint dir configured, CC rounds use RELIABLE checkpoints") {
    // cluster fault model: localCheckpoint blocks die with an executor
    // mid-loop and the truncated lineage leaves nothing to recompute —
    // a configured checkpoint dir must flip every round to reliable
    // checkpoint() files on the (cluster) FS
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir)
    try {
      val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      val cc = GraphOps.connectedComponents(pairs)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(cc == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
      // reliable checkpoint files physically landed under the configured dir
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten
          .flatMap(c => (if (c.getName.startsWith("rdd-")) Seq(c) else Nil) ++ rddDirs(c))
      assert(rddDirs(new java.io.File(dir)).nonEmpty,
        "no rdd-* checkpoint dirs written: CC loop did not use reliable checkpoint()")
      // and the truncation helper itself picks reliable checkpointing
      val t = graft.ops.Lineage.truncate(Seq(1L).toDF("x"))
      assert(t.rdd.toDebugString.contains("ReliableCheckpointRDD"),
        s"Lineage.truncate did not produce a reliable checkpoint:\n${t.rdd.toDebugString}")
    } finally {
      // scala/spark: setCheckpointDir(null) resets to None (Option(null))
      sc.setCheckpointDir(null)
    }
  }

  test("without a checkpoint dir, Lineage.truncate stays on localCheckpoint") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val t = graft.ops.Lineage.truncate(Seq(1L).toDF("x"))
    assert(t.rdd.toDebugString.contains("LocalCheckpoint"),
      s"expected localCheckpoint in local mode:\n${t.rdd.toDebugString}")
  }

  test("triangles: hand-computed co-occurrence graph, duplicates collapsed") {
    // o=1 -> {1,2,3}: one triangle. o=3 -> {4,5,6,7}: K4 = 4 triangles,
    // each vertex in 3 of them. o=2 -> bridge edge 3-4 (no triangle
    // through it). o=4/o=5 re-state edges 2-3 and 1-3 (distinct edge
    // dedup), and (1,1) repeats a membership row (distinct (o,p) dedup).
    val membership = Seq(
      1L -> 1L, 1L -> 1L, 1L -> 2L, 1L -> 3L,
      2L -> 3L, 2L -> 4L,
      3L -> 4L, 3L -> 5L, 3L -> 6L, 3L -> 7L,
      4L -> 2L, 4L -> 3L,
      5L -> 1L, 5L -> 3L).toDF("o", "p")
    val got = GraphOps.trianglesOf(membership)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq(
      4L -> 3L, 5L -> 3L, 6L -> 3L, 7L -> 3L,
      1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: a triangle-free graph (star + path) yields no rows") {
    // o=1 -> {1,2}, o=2 -> {1,3}, o=3 -> {1,4}: star around 1.
    val membership = Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
      .toDF("o", "p")
    assert(GraphOps.trianglesOf(membership).count() == 0L)
  }

  test("butterflies: closed form on a hand-computed bipartite graph") {
    // pair (1,2) shares orders {1,2,3} -> C(3,2)=3 butterflies;
    // (1,3) and (2,3) share {1,2} -> 1 each; (4,5) shares only order 4
    // -> w=1, below the >=2 support, contributes nothing.
    val membership = Seq(
      1L -> 1L, 1L -> 2L, 1L -> 3L,
      2L -> 1L, 2L -> 2L, 2L -> 3L,
      3L -> 1L, 3L -> 2L,
      4L -> 4L, 4L -> 5L).toDF("o", "p")
    val got = GraphOps.butterfliesOf(membership).as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 4L, 2L -> 4L, 3L -> 2L))
  }

  test("triangles: registered query is non-empty, descending, capped at TopK") {
    val top = GraphOps.triangles(spark, sf).as[(Long, Long)].collect().toSeq
    assert(top.nonEmpty && top.size <= GraphOps.Triangles.TopK)
    assert(top.forall(_._2 > 0L))
    // total order (n_tri desc, part asc) actually holds in the output
    assert(top == top.sortBy { case (p, n) => (-n, p) })
  }
}
