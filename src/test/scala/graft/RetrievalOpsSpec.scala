package graft

import org.apache.spark.sql.functions._
import graft.ops.{RetrievalOps, SimilarityOps, TextOps}

/** Hybrid RRF retrieval: fusion arithmetic, arm membership, shape. */
class RetrievalOpsSpec extends SparkSuite {
  import spark.implicits._

  private def contrib(rank: Option[Long]): Long =
    rank.map(r => 1000000L / (RetrievalOps.RrfK + r)).getOrElse(0L)

  test("hybridRrf: fused scores are exactly the RRF arithmetic of the arm ranks") {
    val rows = RetrievalOps.hybridRrf(spark, sf)
      .as[(Long, Option[Long], Option[Long], Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= RetrievalOps.RrfTopK)
    rows.foreach { case (id, rs, rd, rrf, _) =>
      assert(rs.nonEmpty || rd.nonEmpty, s"doc $id in neither arm")
      rs.foreach(r => assert(r >= 1 && r <= RetrievalOps.RrfPool))
      rd.foreach(r => assert(r >= 1 && r <= RetrievalOps.RrfPool))
      assert(rrf == contrib(rs) + contrib(rd),
        s"doc $id: rrf_micro $rrf != ${contrib(rs)} + ${contrib(rd)}")
    }
    // fused_rank is the dense 1..n total order by (rrf desc, doc_id)
    assert(rows.map(_._5) == (1L to rows.size).toSeq)
    assert(rows == rows.sortBy(r => (-r._4, r._1)))
  }

  test("hardNegatives: ranks continue the positive band, near-dups excluded, planted dup never mined") {
    val g = RetrievalOps.hardNegatives(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(g.nonEmpty)
    g.groupBy(_._1).foreach { case (q, rows) =>
      val ranks = rows.map(_._4).sorted
      assert(ranks == (RetrievalOps.HardNegK + 1L to
        RetrievalOps.HardNegK + RetrievalOps.HardNegM), s"probe $q ranks: $ranks")
      rows.foreach(r => assert(r._3 < RetrievalOps.HardNegDupCos))
    }
    // plant a near-duplicate of probe 0 (scaled copy, cos ~ 1): it must
    // never appear among the mined negatives for that probe
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dup = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 1.001 AS FLOAT))").as("embedding"))
    val dir2 = java.nio.file.Files.createTempDirectory("hardneg").toString
    emb.select("vec_id", "embedding").unionByName(dup)
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val g2 = RetrievalOps.hardNegatives(spark, dir2)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(!g2.exists(r => r._1 == 0L && r._2 == 999999L),
      "planted near-duplicate was mined as a hard negative")
  }

  test("hybridRrf: arm ranks agree with the standalone arm pipelines") {
    val fused = RetrievalOps.hybridRrf(spark, sf)
      .as[(Long, Option[Long], Option[Long], Long, Long)].collect().toSeq

    val sparseIds = TextOps.bm25TopK(spark, sf)
      .select("doc_id").as[Long].collect().toSeq // already rank-ordered
    val sparseRank = sparseIds.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val probe = broadcast(emb.filter(col("vec_id") === RetrievalOps.RrfProbeId)
      .select(col("embedding").as("q")))
    val denseIds = emb.filter(col("vec_id") =!= RetrievalOps.RrfProbeId)
      .crossJoin(probe)
      .select(col("vec_id"), SimilarityOps.cosineFF(col("embedding"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(RetrievalOps.RrfPool)
      .select("vec_id").as[Long].collect().toSeq
    val denseRank = denseIds.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap

    fused.foreach { case (id, rs, rd, _, _) =>
      assert(rs == sparseRank.get(id), s"doc $id sparse rank mismatch")
      assert(rd == denseRank.get(id), s"doc $id dense rank mismatch")
    }
    // inclusion guarantee: a doc in BOTH arms' top-3 scores at least
    // 2*floor(1e6/63) = 31746; beating that needs both-arm presence
    // with rank_sparse <= 9 (a single arm maxes at 1e6/61 = 16393, and
    // (10,1) = 14285+16393 = 30678 < 31746), and ranks are distinct per
    // arm — so at most 9 docs can score >= it and it always fits in
    // the fused top-10.
    val bothTop3 = sparseRank.filter(_._2 <= 3).keySet &
      denseRank.filter(_._2 <= 3).keySet
    val fusedIds = fused.map(_._1).toSet
    bothTop3.foreach(id => assert(fusedIds.contains(id),
      s"doc $id is top-3 in both arms but missing from the fused list"))
  }
}
