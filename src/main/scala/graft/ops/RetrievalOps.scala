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
    val wS = Windows.boundedGlobal(col("bm25_micro").desc, col("doc_id"))
    val sparse = TextOps.bm25TopK(s, dir)
      .select(col("doc_id"), row_number().over(wS).cast("long").as("rank_sparse"))

    // dense arm: one corpus scan vs the broadcast probe, distributed
    // TakeOrdered top-20, then rank the bounded result
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val probe = broadcast(
      emb.filter(col("vec_id") === RrfProbeId).select(col("embedding").as("q")))
    val wD = Windows.boundedGlobal(col("cos").desc, col("doc_id"))
    val dense = emb.filter(col("vec_id") =!= RrfProbeId)
      .crossJoin(probe) // 1-row probe: structural
      .select(col("vec_id").as("doc_id"),
        SimilarityOps.cosineFF(col("embedding"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(RrfPool)
      .select(col("doc_id"), row_number().over(wD).cast("long").as("rank_dense"))

    // fusion: two ≤20-row frames
    val wF = Windows.boundedGlobal(col("rrf_micro").desc, col("doc_id"))
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

  // ------------------------------------------------------------------
  // Hard-negative mining (the DPR/contrastive-training recipe): for
  // each query, the candidates ranked JUST BELOW the presumed
  // positives are the training negatives that actually move a
  // retriever — random negatives are too easy, and near-duplicates of
  // the query (cos ≥ [[HardNegDupCos]]) are poisoned labels and are
  // excluded BEFORE ranking so they never waste a negative slot.
  // Per probe: rank the corpus by exact cosine (near-dups dropped),
  // keep ranks ([[HardNegK]], [[HardNegK]]+[[HardNegM]]].
  //
  // Shape for 100 TB: identical to the brute-force ANN arm — one
  // corpus scan against broadcast probes with a per-probe rank window;
  // swap in the LSH candidate set for the scan and nothing downstream
  // changes. The dup threshold is a plain column predicate, pushed
  // into the same pass.
  val HardNegK = 4
  val HardNegM = 8
  val HardNegDupCos = 0.98

  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val probes = broadcast(emb.filter(col("vec_id") < SimilarityOps.ProbeIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(probes) // bounded probe set: structural
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        SimilarityOps.cosineFF(col("q_emb"), col("c_emb")).as("cos"))
      .filter(col("cos") < HardNegDupCos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") > HardNegK && col("rank") <= HardNegK + HardNegM)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val hardNegativesSql: String =
    s"""WITH probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < ${SimilarityOps.ProbeIds}),
       |scored AS (
       |  SELECT q_id, c.vec_id AS c_id,
       |    list_reduce(list_transform(list_zip(q_emb, c.embedding),
       |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
       |    / (sqrt(list_reduce(list_transform(q_emb,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
       |     * sqrt(list_reduce(list_transform(c.embedding,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))) AS cos
       |  FROM embeddings c, probes WHERE c.vec_id <> q_id),
       |ranked AS (
       |  SELECT q_id, c_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
       |  FROM scored WHERE cos < $HardNegDupCos)
       |SELECT q_id, c_id, cos, rank FROM ranked
       |WHERE rank > $HardNegK AND rank <= ${HardNegK + HardNegM}
       |ORDER BY q_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_hybrid_rrf" -> (hybridRrf _),
    "sample_hard_negatives" -> (hardNegatives _)
  )

  val oracle: Map[String, String] = Map(
    "search_hybrid_rrf" -> hybridRrfSql,
    "sample_hard_negatives" -> hardNegativesSql
  )
}
