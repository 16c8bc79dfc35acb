package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy k-center coreset selection (Gonzalez 1985) over the embeddings
  * table — the diversity-sampling primitive of training-data curation:
  * pick k documents so every document is close to a picked one, i.e.
  * maximize coverage, not (like MMR) relevance-to-a-query.
  *
  * Algorithm: start from the minimum vec_id; each round picks the vector
  * FARTHEST from its nearest already-chosen center (2-approximation of
  * the optimal k-center radius). The selection distances are the
  * coverage radii — monotonically non-increasing, and radius_k bounds
  * how unrepresented any remaining vector is.
  *
  * 100 TB shape: K passes over the corpus, each a narrow map (distance
  * to ≤ K broadcast-literal centers) into a `TakeOrdered(1)` — no
  * shuffle ever carries a vector, and driver state is K·D integers.
  * Per-row work is O(K²·D) summed over rounds; for selection-sized K
  * (≤ tens) that is cheaper than one corpus shuffle. For large K the
  * running min-distance column would be checkpointed instead of
  * recomputed (the dedup_incremental trade, measured there).
  *
  * Exactness: quantized integer embeddings (1/1024ths, round-half-away
  * — the [[PcaOps]] contract), squared L2 distances are exact BIGINTs,
  * argmax ties break on smaller vec_id. The DuckDB oracle replays the
  * greedy loop as unrolled CTEs: one running-min + one argmax CTE per
  * round, bit-for-bit.
  */
object Coreset {

  val K = 8
  val Dim = 64
  val Quantum = 1024L

  private def quantized = expr(
    s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Quantum) AS BIGINT))")

  /** Exact squared L2 distance from the quantized column to a literal
    * center (codegen'd zip_with/aggregate — no UDF). */
  private def distSq(center: Array[Long]) = {
    val lits = center.map(c => s"${c}L").mkString(",")
    expr(s"aggregate(zip_with(q, array($lits), (a, b) -> (a - b) * (a - b)), " +
      "0L, (acc, x) -> acc + x)")
  }

  /** The selected centers: (sel_order, vec_id, dist_sq) where dist_sq is
    * the selection distance (coverage radius² at that round; 0 for the
    * seed). Also returns the quantized centers for spec assertions. */
  def select(s: SparkSession, dir: String): (Seq[(Long, Long, Long)], Seq[Array[Long]]) = {
    val qe = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), quantized.as("q"))
    val seed = qe.orderBy(col("vec_id")).limit(1).collect()(0)
    var centers = Vector(seed.getSeq[Long](1).toArray)
    var picked = Vector((0L, seed.getLong(0), 0L))
    for (r <- 1 until K) {
      // functions.least needs >= 2 args; round 1 has a single center
      val dists = centers.map(distSq)
      val dMin = if (dists.size == 1) dists.head else least(dists: _*)
      val next = qe.select(col("vec_id"), dMin.as("d"))
        .orderBy(col("d").desc, col("vec_id"))
        .limit(1)
        .join(qe, Seq("vec_id"))
        .collect()(0)
      centers :+= next.getSeq[Long](2).toArray
      picked :+= ((r.toLong, next.getLong(0), next.getLong(1)))
    }
    (picked, centers)
  }

  def kcenter(s: SparkSession, dir: String): DataFrame = {
    val (picked, _) = select(s, dir)
    s.createDataFrame(
      s.sparkContext.parallelize(picked.map(p => Row(p._1, p._2, p._3)), 1),
      StructType(Seq(StructField("sel_order", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("dist_sq", LongType, nullable = false))))
      .orderBy(col("sel_order"))
  }

  /** Oracle: the greedy loop unrolled — per round a running-min CTE
    * (least of the previous min and the distance to the newest center)
    * and a 1-row argmax CTE carrying the winner's vector forward. */
  val kcenterSql: String = {
    def dist(a: String, b: String): String =
      s"list_reduce(list_transform(list_zip($a, $b), " +
        s"p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    val rounds = (1 to K - 1).map { r =>
      val prevC = s"c${r - 1}"
      val d =
        if (r == 1)
          s"""d1 AS MATERIALIZED (
             |  SELECT qe.vec_id, qe.q,
             |    ${dist("qe.q", s"(SELECT q FROM $prevC)")} AS d
             |  FROM qe)""".stripMargin
        else
          s"""d$r AS MATERIALIZED (
             |  SELECT p.vec_id, p.q,
             |    least(p.d, ${dist("p.q", s"(SELECT q FROM $prevC)")}) AS d
             |  FROM d${r - 1} p)""".stripMargin
      d + s""",
         |c$r AS (SELECT vec_id, q, d FROM d$r ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH qe AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * $Quantum) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (SELECT vec_id, q FROM qe ORDER BY vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(sel_order AS BIGINT) AS sel_order,
       |  vec_id, CAST(dist_sq AS BIGINT) AS dist_sq
       |FROM (
       |  SELECT 0 AS sel_order, vec_id, 0 AS dist_sq FROM c0
       |${(1 to K - 1).map(r =>
           s"  UNION ALL SELECT $r, vec_id, d FROM c$r").mkString("\n")}
       |)
       |ORDER BY sel_order""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_kcenter" -> (kcenter _)
  )

  val oracle: Map[String, String] = Map(
    "sample_kcenter" -> kcenterSql
  )
}
