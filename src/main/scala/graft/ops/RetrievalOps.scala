package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack/Clarke/
  * Buettcher SIGIR'09) of the sparse (BM25) and dense (embedding
  * cosine) arms the engine already ships — the standard first-stage
  * ranker of a RAG data pipeline, where neither modality alone is
  * trusted and the fusion is rank-based precisely so the two score
  * scales never need calibrating.
  *
  * Semantics (deterministic; both engines run it verbatim):
  *   sparse arm = [[TextOps.bm25TopK]]'s top-20 docs, re-ranked 1..20
  *     by (bm25_micro DESC, doc_id);
  *   dense arm  = exact cosine of every corpus embedding against the
  *     broadcast probe (vec_id = [[RrfProbeId]], the MMR probe), top-20
  *     by (cos DESC, vec_id) — embeddings.vec_id keys the embedded
  *     subset of the corpus (sf0.1 embeds 2 000 of 5 000 docs), and a
  *     doc absent from one arm is precisely what RRF is built to
  *     tolerate: it just collects no contribution from that arm;
  *   fused      = FULL OUTER join of the two 20-row lists,
  *     rrf_micro = Σ_arm floor(1e6 / (60 + rank_arm)) with absent arms
  *     contributing 0, top-[[RrfTopK]] by (rrf_micro DESC, doc_id).
  * The damping constant 60 is the paper's; floor() of an
  * exactly-rounded IEEE division makes every contribution an exact
  * integer, so the fused score hash-compares cross-engine.
  *
  * Shape for 100 TB: each arm is already scale-shaped — BM25 is a
  * narrow in-array term filter + broadcast stats + TakeOrdered, the
  * dense arm is one corpus scan against a broadcast 1-row probe +
  * TakeOrdered — and the fusion itself joins two ≤20-row frames, so
  * nothing after the arms touches data-scale cardinality. Swapping the
  * brute-force dense arm for [[SimilarityOps.lshTopK]]'s bucketed scan
  * changes nothing downstream.
  */
object RetrievalOps {

  val RrfK = 60
  val RrfTopK = 10
  /** Per-arm candidate list size — matches [[TextOps.Bm25TopK]]. */
  val RrfPool: Int = TextOps.Bm25TopK
  /** Dense-arm probe: the same corpus vector MMR anchors on. */
  val RrfProbeId: Long = SimilarityOps.MmrProbeId

  private def rrfContrib(rank: Column): Column =
    coalesce(
      floor(lit(1000000.0) / (lit(RrfK).cast("double") + rank.cast("double")))
        .cast("long"),
      lit(0L))

  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    // sparse arm: the registered BM25 pipeline (already a bounded
    // 20-row total order); the rank window runs on that bounded frame
    val wS = Window.orderBy(col("bm25_micro").desc, col("doc_id"))
    val sparse = TextOps.bm25TopK(s, dir)
      .select(col("doc_id"), row_number().over(wS).cast("long").as("rank_sparse"))

    // dense arm: one corpus scan vs the broadcast probe, distributed
    // TakeOrdered top-20, then rank the bounded result
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val probe = broadcast(
      emb.filter(col("vec_id") === RrfProbeId).select(col("embedding").as("q")))
    val wD = Window.orderBy(col("cos").desc, col("doc_id"))
    val dense = emb.filter(col("vec_id") =!= RrfProbeId)
      .crossJoin(probe) // 1-row probe: structural
      .select(col("vec_id").as("doc_id"),
        SimilarityOps.cosineFF(col("embedding"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(RrfPool)
      .select(col("doc_id"), row_number().over(wD).cast("long").as("rank_dense"))

    // fusion: two ≤20-row frames
    val wF = Window.orderBy(col("rrf_micro").desc, col("doc_id"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        rrfContrib(col("rank_sparse")) + rrfContrib(col("rank_dense")))
      .orderBy(col("rrf_micro").desc, col("doc_id")).limit(RrfTopK)
      .select(col("doc_id"), col("rank_sparse"), col("rank_dense"),
        col("rrf_micro"), row_number().over(wF).cast("long").as("fused_rank"))
      .orderBy(col("fused_rank"))
  }

  val hybridRrfSql: String = {
    def contrib(rank: String): String =
      s"COALESCE(CAST(floor(CAST(1000000 AS DOUBLE) / (CAST($RrfK AS DOUBLE) + CAST($rank AS DOUBLE))) AS BIGINT), 0)"
    val cosSql =
      """list_reduce(list_transform(list_zip(e.embedding, q), p ->
        |    CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
        |/ (sqrt(list_reduce(list_transform(e.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
        | * sqrt(list_reduce(list_transform(q,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))"""
        .stripMargin
    s"""WITH sparse AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS BIGINT)
       |      AS rank_sparse
       |  FROM (${TextOps.bm25Sql}) bm),
       |probe AS (SELECT embedding AS q FROM embeddings WHERE vec_id = $RrfProbeId),
       |densetop AS (
       |  SELECT e.vec_id AS doc_id, $cosSql AS cos
       |  FROM embeddings e, probe WHERE e.vec_id <> $RrfProbeId
       |  ORDER BY cos DESC, doc_id LIMIT $RrfPool),
       |dense AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
       |      AS rank_dense
       |  FROM densetop),
       |fused AS (
       |  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
       |    s.rank_sparse, d.rank_dense,
       |    ${contrib("s.rank_sparse")} + ${contrib("d.rank_dense")} AS rrf_micro
       |  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id)
       |SELECT doc_id, rank_sparse, rank_dense, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       |  CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
       |    AS fused_rank
       |FROM (SELECT * FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT $RrfTopK)
       |ORDER BY fused_rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_hybrid_rrf" -> (hybridRrf _)
  )

  val oracle: Map[String, String] = Map(
    "search_hybrid_rrf" -> hybridRrfSql
  )
}
