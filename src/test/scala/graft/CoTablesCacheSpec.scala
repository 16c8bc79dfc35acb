package graft

import graft.ops.GraphOps

/** Pins the shared co-occurrence projection's survival contract against
  * the bench harness (r14: the bench's per-query unpersist destroyed the
  * lineage-truncated CoTables blocks and ALL NINE graph queries failed
  * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in the first full sweep):
  * (1) the selective cleanup spares exactly the cache's RDD ids, so a
  * later kernel reuses the projection; (2) a harness that unpersists
  * EVERYTHING anyway invalidates the cache entry, which must detect its
  * dead blocks and rebuild instead of throwing. */
class CoTablesCacheSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bench-style selective unpersist spares the shared projection") {
    val n1 = GraphOps.triangles(spark, dir).count() // builds + caches
    val keep = GraphOps.protectedRddIds(spark)
    assert(keep.nonEmpty, "the cache must register its checkpoint blocks")
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep(id)) rdd.unpersist(blocking = false)
    }
    // reuses the spared blocks — and must not crash
    val n2 = GraphOps.linkPrediction(spark, dir).count()
    assert(n1 > 0 && n2 > 0)
    assert(GraphOps.protectedRddIds(spark)
      .subsetOf(spark.sparkContext.getPersistentRDDs.keySet))
  }

  test("a full unpersist invalidates the cache entry and forces a rebuild") {
    val before = GraphOps.butterflies(spark, dir).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // the cached entry's blocks are gone; a hit without the liveness
    // check would throw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND here
    val after = GraphOps.butterflies(spark, dir).count()
    assert(before == after, "rebuild must reproduce the same result")
  }
}
