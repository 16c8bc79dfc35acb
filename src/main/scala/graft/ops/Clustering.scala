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
  *   - assignment: squared-L2 in the norm-expansion form (v² + c² −
  *     2⟨v,c⟩), every cast/fold/op in a pinned order mirrored by the
  *     oracle, argmin with (distance, cluster) lexicographic tie-break;
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

  /** Blocking-cell sizing: the cell count GROWS with the corpus so the
    * expected cell stays near [[TargetCell]] rows — K ∝ n is what makes
    * cluster-then-compare corpus-linear (SemDeDup §3; the role MaxBucket
    * plays for LSH buckets). [[KMin]] keeps tiny corpora at the legacy
    * K = 8, so sf0.001/sf0.01 behavior is unchanged. */
  val KMin = 8
  val TargetCell = 64
  val Iters = 3
  val Dim = 64
  val Quantum = 1e6

  /** Cell count for an n-vector corpus: max(KMin, ceil(n / TargetCell)).
    * Mirrored verbatim in the oracles' `kp` CTE. */
  def kFor(n: Long): Int =
    math.max(KMin.toLong, math.ceil(n.toDouble / TargetCell).toLong).toInt

  /** Above this K the literal-`least` assignment plan (K structs × Dim
    * literal doubles in one expression) stops being codegen-friendly;
    * [[assign]] switches to a broadcast-join argmin with the identical
    * fp fold and tie-break. */
  val LiteralAssignMax = 64

  /** Assign every embedding to its nearest centroid (squared euclidean
    * in the norm-expansion form `|v|² + |c|² − 2⟨v,c⟩`, ties to the
    * lowest cluster id). The expansion makes the per-pair inner loop a
    * single codegen [[graft.functions.FloatDot]] (the centroid is cast
    * to float once, its norm² folded once at plan/broadcast time) —
    * with K ∝ corpus this assignment is the semantic-dedup hot loop,
    * and the interpreted `zip_with` fold it replaces was ~50× slower.
    * The oracle computes the IDENTICAL doubles (same casts, same
    * ascending-index folds, same `(v2 + c2) - 2·dot` op order), so
    * argmin tie-breaks agree bit-for-bit cross-engine.
    *
    * Two plan shapes, value-identical:
    *   - K ≤ [[LiteralAssignMax]]: centroids ride as plan-time literal
    *     float arrays inside one `least` — no join, pure codegen;
    *   - larger K: centroids become a broadcast table, argmin via
    *     `min(struct(dist, cluster))` — the plan stays small however
    *     large K grows (the 100 TB shape: K×Dim floats broadcast once,
    *     corpus scanned once, no shuffle wider than the final groupBy). */
  def assign(emb: DataFrame, centroids: IndexedSeq[IndexedSeq[Double]]): DataFrame =
    if (centroids.length <= LiteralAssignMax) assignLiteral(emb, centroids)
    else assignBroadcast(emb, centroids)

  import graft.functions.FloatDot

  private def cfloat(c: IndexedSeq[Double]): (IndexedSeq[Float], Double) = {
    val cf = c.map(_.toFloat)
    (cf, cf.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
  }

  private[graft] def assignLiteral(emb: DataFrame, centroids: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val pairs = centroids.zipWithIndex.map { case (c, k) =>
      val (cf, c2) = cfloat(c)
      val arr = array(cf.map(lit): _*)
      struct(
        ((col("_v2") + lit(c2)) - lit(2.0) * FloatDot(col("embedding"), arr)).as("d"),
        lit(k.toLong).as("c"))
    }
    emb.withColumn("_v2", FloatDot(col("embedding"), col("embedding")))
      .withColumn("_a", least(pairs: _*))
      .select(col("vec_id"), col("embedding"), col("_a.c").as("cluster"))
  }

  private[graft] def assignBroadcast(emb: DataFrame, centroids: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val cdf = centroids.zipWithIndex
      .map { case (c, k) =>
        val (cf, c2) = cfloat(c)
        (k.toLong, cf.toArray, c2)
      }
      .toDF("_ck", "_cv", "_c2")
    emb.withColumn("_v2", FloatDot(col("embedding"), col("embedding")))
      .crossJoin(broadcast(cdf))
      .withColumn("_d",
        (col("_v2") + col("_c2")) - lit(2.0) * FloatDot(col("embedding"), col("_cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("_d").as("d"), col("_ck").as("c"))).as("_a"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("_a.c").as("cluster"))
  }

  /** The training loop alone — returns the k×Dim centroid matrix (the
    * IVF coarse quantizer a trained index would persist). `k < 0` (the
    * default) sizes the codebook from the corpus via [[kFor]]; callers
    * blocking a DIFFERENT relation (semantic dedup assigns corpus ∪
    * twins) pass the k sized for THAT relation. */
  def trainCentroids(s: SparkSession, dir: String, k: Int = -1): IndexedSeq[IndexedSeq[Double]] = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    trainCentroidsOn(emb, if (k > 0) k else kFor(emb.count()))
  }

  /** The training loop over any (vec_id, embedding) frame — the scale
    * bench trains on blown-up corpora without a parquet detour. */
  def trainCentroidsOn(emb: DataFrame, kk: Int): IndexedSeq[IndexedSeq[Double]] = {
    // deterministic init: k smallest affine id-hashes
    var centroids: IndexedSeq[IndexedSeq[Double]] = emb
      .select(col("embedding"),
        ((col("vec_id") * Sampling.HashA + Sampling.HashB) % Sampling.Mod).as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(kk)
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
      centroids = (0 until kk).map { c =>
        byCluster.get(c.toLong) match {
          case Some(rows) =>
            val arr = new Array[Double](Dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getLong(2).toDouble / Quantum / r.getLong(3))
            arr.toIndexedSeq
          case None => centroids(c) // emptied cluster keeps its centroid
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
  private def sq2Sql(v: String): String =
    s"""list_reduce(list_transform($v,
       | x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)""".stripMargin.replace("\n", "")

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       | p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin.replace("\n", "")

  /** Nearest-centroid assignment of `src` (vec_id, embedding) rows to
    * the centroids in CTE `cent`, as a CTE named `name`. The distance is
    * the norm-expansion `(v2 + c2) - 2·dot` over the FLOAT-cast centroid
    * — the exact casts, folds, and op order of [[assign]], so the argmin
    * (and its (dist, cluster) tie-break) matches Spark bit-for-bit. */
  def assignSql(name: String, src: String, cent: String): String =
    s"""$name AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT e.vec_id, e.embedding, p.cluster,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY (e.v2 + p.c2) - 2 * ${dotSql("e.embedding", "p.cf")}, p.cluster) AS rn
       |    FROM (SELECT vec_id, embedding, ${sq2Sql("embedding")} AS v2 FROM $src) e,
       |         (SELECT cluster, cf, ${sq2Sql("cf")} AS c2 FROM (
       |            SELECT cluster, list_transform(c, x -> CAST(x AS FLOAT)) AS cf
       |            FROM $cent)) p) WHERE rn = 1)""".stripMargin

  /** The `kp` CTE computing the corpus-derived cell count — the SQL
    * twin of [[kFor]], over whatever relation is being blocked (`src`). */
  def kpCte(src: String): String =
    s"kp AS (SELECT greatest($KMin, CAST(ceil(count(*) / $TargetCell.0) AS BIGINT)) AS k FROM $src)"

  /** The cent0 init + Iters train rounds over `embeddings`; the trained
    * centroids end up in CTE [[FinalCent]]. `kSql` is the scalar SQL
    * expression for the cell count (normally `(SELECT k FROM kp)` with
    * [[kpCte]] prepended by the caller — K is data-derived, so the
    * oracle derives it from the data too). */
  val FinalCent: String = s"cent$Iters"
  def trainingCtes(kSql: String): String = {
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
       |    FROM embeddings) WHERE cluster < $kSql),
       |$iters""".stripMargin
  }

  val kmeansSql: String =
    s"""WITH ${kpCte("embeddings")},
       |${trainingCtes("(SELECT k FROM kp)")},
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
