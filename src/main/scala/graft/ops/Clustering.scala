package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic k-means over the embeddings table — the coarse-quantizer
  * / topic-bucketing primitive of a training-data pipeline.
  *
  * Every source of k-means nondeterminism is pinned so the whole
  * algorithm (init, every assignment, every update) is reproducible
  * cross-engine and has an exact DuckDB oracle:
  *   - init: the K vectors with smallest affine id-hash (ties by id);
  *   - assignment: exact squared-L2 in left-fold double arithmetic,
  *     argmin with (distance, cluster) lexicographic tie-break;
  *   - update: quantized-long sums (order-independent) divided in a
  *     fixed op order; an emptied cluster keeps its previous centroid;
  *   - fixed iteration count (no data-dependent convergence test).
  *
  * Scale shape: each iteration is one broadcast of K×dim centroid
  * literals into the plan + one partial-aggregated groupBy — the corpus
  * is scanned once per iteration and never shuffled on anything wider
  * than (cluster, dim). The driver holds only K×dim doubles (the same
  * contract as MLlib's KMeans), independent of corpus size.
  */
object Clustering {

  val K = 8
  val Iters = 3
  val Dim = 64
  val Quantum = 1e6

  /** Assign every embedding to its nearest centroid (squared euclidean,
    * ties to the lowest cluster id — `least` over (dist, id) structs).
    * Centroids ride as plan-time literal arrays: no join, pure codegen. */
  def assign(emb: DataFrame, centroids: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val pairs = centroids.zipWithIndex.map { case (c, k) =>
      val cl = array(c.map(lit): _*)
      struct(
        aggregate(
          zip_with(col("embedding"), cl,
            (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
          lit(0.0), (acc, v) => acc + v).as("d"),
        lit(k.toLong).as("c"))
    }
    emb.withColumn("_a", least(pairs: _*))
      .select(col("vec_id"), col("embedding"), col("_a.c").as("cluster"))
  }

  /** The training loop alone — returns the K×Dim centroid matrix (the
    * IVF coarse quantizer a trained index would persist). */
  def trainCentroids(s: SparkSession, dir: String): IndexedSeq[IndexedSeq[Double]] = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    // deterministic init: K smallest affine id-hashes
    var centroids: IndexedSeq[IndexedSeq[Double]] = emb
      .select(col("embedding"),
        ((col("vec_id") * Sampling.HashA + Sampling.HashB) % Sampling.Mod).as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(K)
      .select(col("embedding"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toIndexedSeq)
      .toIndexedSeq

    for (_ <- 1 to Iters) {
      val sums = assign(emb, centroids)
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i"))
        .agg(sum(expr(s"CAST(round(CAST(x AS DOUBLE) * ${Quantum.toLong}) AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0))
      centroids = (0 until K).map { k =>
        byCluster.get(k.toLong) match {
          case Some(rows) =>
            val arr = new Array[Double](Dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getLong(2).toDouble / Quantum / r.getLong(3))
            arr.toIndexedSeq
          case None => centroids(k) // emptied cluster keeps its centroid
        }
      }
    }
    centroids
  }

  def kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val centroids = trainCentroids(s, dir)
    def assigned: DataFrame = assign(emb, centroids)

    val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    val cdf = centroids.zipWithIndex.flatMap { case (c, k) =>
      c.zipWithIndex.map { case (v, i) => (k.toLong, i.toLong, v) }
    }.toDF("cluster", "dim_idx", "c_val")
    cdf.join(counts, Seq("cluster"))
      .select(col("cluster"), col("dim_idx"), col("c_val"), col("n_members"))
      .orderBy(col("cluster"), col("dim_idx"))
  }

  /** The identical algorithm in DuckDB, iterations unrolled as CTEs.
    * The training chain and the assignment step are exposed separately
    * so other oracles (semantic dedup) can train on `embeddings` and
    * assign a DIFFERENT relation to the final centroids. */
  private def distSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       | p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
       | (x, y) -> x + y)""".stripMargin.replace("\n", "")

  /** Nearest-centroid assignment of `src` (vec_id, embedding) rows to
    * the centroids in CTE `cent`, as a CTE named `name`. */
  def assignSql(name: String, src: String, cent: String): String =
    s"""$name AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT e.vec_id, e.embedding, p.cluster,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${distSql("e.embedding", "p.c")}, p.cluster) AS rn
       |    FROM $src e, $cent p) WHERE rn = 1)""".stripMargin

  /** The cent0 init + Iters train rounds over `embeddings`; the trained
    * centroids end up in CTE [[FinalCent]]. */
  val FinalCent: String = s"cent$Iters"
  val trainingCtes: String = {
    def upd(n: Int): String =
      s"""sum$n AS (
         |  SELECT cluster, i,
         |    SUM(CAST(round(CAST(x AS DOUBLE) * ${Quantum.toLong}) AS BIGINT)) AS s2,
         |    COUNT(*) AS n
         |  FROM (SELECT cluster, UNNEST(embedding) AS x,
         |          UNNEST(range(0, len(embedding))) AS i FROM asg$n)
         |  GROUP BY 1, 2),
         |cent$n AS (
         |  SELECT p.cluster, coalesce(nc.c, p.c) AS c
         |  FROM ${if (n == 1) "cent0" else s"cent${n - 1}"} p
         |  LEFT JOIN (SELECT cluster, list(CAST(s2 AS DOUBLE) / ${Quantum.toLong} / n ORDER BY i) AS c
         |             FROM sum$n GROUP BY 1) nc ON nc.cluster = p.cluster)""".stripMargin
    val iters = (1 to Iters).map { n =>
      assignSql(s"asg$n", "embeddings", if (n == 1) "cent0" else s"cent${n - 1}") + ",\n" + upd(n)
    }.mkString(",\n")
    s"""cent0 AS (
       |  SELECT cluster, c FROM (
       |    SELECT row_number() OVER (
       |        ORDER BY (vec_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod}, vec_id
       |      ) - 1 AS cluster,
       |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
       |    FROM embeddings) WHERE cluster < $K),
       |$iters""".stripMargin
  }

  val kmeansSql: String =
    s"""WITH $trainingCtes,
       |${assignSql("finalasg", "embeddings", FinalCent)},
       |counts AS (SELECT cluster, count(*) AS n_members FROM finalasg GROUP BY 1),
       |cexp AS (SELECT cluster, UNNEST(c) AS c_val,
       |         UNNEST(range(0, len(c))) AS dim_idx FROM $FinalCent)
       |SELECT x.cluster, CAST(dim_idx AS BIGINT) AS dim_idx, c_val, n_members
       |FROM cexp x JOIN counts USING (cluster)
       |ORDER BY cluster, dim_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cluster_kmeans" -> (kmeans _)
  )

  val oracle: Map[String, String] = Map(
    "cluster_kmeans" -> kmeansSql
  )
}
