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
    * K = 8, so sf0.001/sf0.01 behavior is unchanged.
    *
    * [[KCap]] bounds the codebook: beyond KCap·TargetCell rows cells
    * grow past TargetCell and semantic dedup's MaxCell→in-cell-LSH
    * fallback carries linearity instead (the capped-cell spec proves
    * that path bounded). An uncapped K ∝ n would make the n·K
    * assignment scan n²/TargetCell — the same quadratic law the round-5
    * fix removed from pair generation, just moved one stage earlier.
    *
    * [[SampleCap]] bounds the TRAINING corpus: Lloyd iterations run
    * over the SampleCap rows with the smallest affine id-hash (the same
    * ordering init uses, so init ⊂ sample by construction). That makes
    * training cost SampleCap·K·Iters — independent of corpus size — and
    * small enough (SampleCap×Dim floats ≈ 1 MB) that the whole training
    * loop runs ON THE DRIVER, exactly as FAISS trains IVF coarse
    * quantizers from a sample. The distributed footprint of
    * training+assignment is then exactly two corpus scans: the sample
    * TakeOrdered and the final NearestCentroid pass. KCap = SampleCap
    * so the init prefix always exists. Corpora ≤ SampleCap rows train
    * on everything — sampling changes nothing at the oracle scales. */
  val KMin = 8
  val TargetCell = 64
  val KCap = 2048
  val SampleCap = 2048
  val Iters = 5
  val Dim = 64
  val Quantum = 1e6

  /** Cell count for an n-vector corpus:
    * min(KCap, max(KMin, ceil(n / TargetCell))).
    * Mirrored verbatim in the oracles' `kp` CTE. */
  def kFor(n: Long): Int =
    math.min(KCap.toLong,
      math.max(KMin.toLong, math.ceil(n.toDouble / TargetCell).toLong)).toInt

  /** Above this K the literal-`least` assignment plan (K structs × Dim
    * literal doubles in one expression) stops being codegen-friendly.
    * Both legacy plan shapes ([[assignLiteral]] below this K,
    * [[assignBroadcast]] above it) are kept only as the equality
    * references for the spec — [[assign]] now always runs the
    * [[graft.functions.NearestCentroid]] codegen argmin, which is
    * value-identical to both and materializes no n·K intermediate. */
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
    *     corpus scanned once, no shuffle wider than the final groupBy).
    *
    * Both shapes are now subsumed by the [[graft.functions.NearestCentroid]]
    * codegen expression: the codebook rides into generated code as ONE
    * reference object and the whole argmin is a tight per-row loop — no
    * K-wide expression tree, no n·K join rows (the broadcast-join form
    * materialized 25M rows through its `min(struct)` agg at n=40k,
    * K=625). Value-identical on null-free input (same folds, same
    * tie-break — AssignEquivalenceSpec proves it against both legacy
    * shapes), so every oracle is untouched. */
  def assign(emb: DataFrame, centroids: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val cf = centroids.map(cfloat)
    emb.withColumn("cluster",
        graft.functions.NearestCentroid(col("embedding"), cf.map(_._1), cf.map(_._2)))
      .select(col("vec_id"), col("embedding"), col("cluster"))
  }

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
    * bench trains on blown-up corpora without a parquet detour.
    *
    * ONE distributed pass (TakeOrdered of the [[SampleCap]] smallest
    * affine id-hashes) pulls the training sample to the driver; the
    * Lloyd iterations then run driver-side over ≤ SampleCap×Dim floats.
    * Every number is identical to the old per-iteration Spark jobs and
    * to the oracle CTEs: init is the first kk rows of the same (hash,
    * vec_id) order; assignment runs the SAME
    * [[graft.functions.NearestCentroid.nearestFloats]] fold the
    * executors run; the update sums the SAME quantized longs (long
    * addition is order-independent, so driver order = any shuffle
    * order) and divides in the same `s / Quantum / n` op order; an
    * emptied cluster keeps its previous centroid. */
  def trainCentroidsOn(emb: DataFrame, kk: Int): IndexedSeq[IndexedSeq[Double]] = {
    require(kk <= SampleCap, s"k=$kk exceeds SampleCap=$SampleCap (KCap should prevent this)")
    // one corpus scan: the SampleCap-row training sample, in init order
    val samp: Array[Array[Float]] = emb
      .select(col("embedding"),
        ((col("vec_id") * Sampling.HashA + Sampling.HashB) % Sampling.Mod).as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(SampleCap)
      .select(col("embedding"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)

    // deterministic init: the k smallest affine id-hashes = sample prefix
    var centroids: IndexedSeq[IndexedSeq[Double]] =
      samp.take(kk).map(_.map(_.toDouble).toIndexedSeq).toIndexedSeq

    for (_ <- 1 to Iters) {
      val cf = centroids.map(cfloat)
      val cMat = cf.map(_._1.toArray).toArray
      val c2 = cf.map(_._2).toArray
      val sums = Array.ofDim[Long](kk, Dim)
      val counts = new Array[Long](kk)
      samp.foreach { v =>
        val c = graft.functions.NearestCentroid.nearestFloats(v, cMat, c2).toInt
        counts(c) += 1
        var i = 0
        while (i < v.length) {
          // Spark's round(double): BigDecimal.valueOf + HALF_UP — half
          // away from zero, unlike math.round's half-toward-+inf. The
          // executors and DuckDB both round this way; so must we.
          sums(c)(i) += java.math.BigDecimal
            .valueOf(v(i).toDouble * Quantum.toLong)
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .longValue()
          i += 1
        }
      }
      centroids = (0 until kk).map { c =>
        if (counts(c) == 0) centroids(c) // emptied cluster keeps its centroid
        else (0 until Dim).map(i => sums(c)(i).toDouble / Quantum / counts(c))
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
    s"""$name AS MATERIALIZED (
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
    s"""kp AS (SELECT least($KCap, greatest($KMin,
       | CAST(ceil(count(*) / $TargetCell.0) AS BIGINT))) AS k FROM $src)""".stripMargin.replace("\n", "")

  /** The cent0 init + Iters train rounds over `embeddings`; the trained
    * centroids end up in CTE [[FinalCent]]. `kSql` is the scalar SQL
    * expression for the cell count (normally `(SELECT k FROM kp)` with
    * [[kpCte]] prepended by the caller — K is data-derived, so the
    * oracle derives it from the data too). */
  val FinalCent: String = s"cent$Iters"
  def trainingCtes(kSql: String): String = {
    // AS MATERIALIZED is load-bearing (the kcore-oracle lesson): DuckDB
    // inlines plain CTEs, and each cent_n is referenced twice (by
    // asg_{n+1} and cent_{n+1}), so an inlined Iters-round chain
    // expands 2^Iters-fold — measured 144 s / ~100 GiB (and flaky OOM)
    // on dedup_semantic's doubled corpus at Iters=5 before the hint.
    def upd(n: Int): String =
      s"""sum$n AS MATERIALIZED (
         |  SELECT cluster, i,
         |    SUM(CAST(round(CAST(x AS DOUBLE) * ${Quantum.toLong}) AS BIGINT)) AS s2,
         |    COUNT(*) AS n
         |  FROM (SELECT cluster, UNNEST(embedding) AS x,
         |          UNNEST(range(0, len(embedding))) AS i FROM asg$n)
         |  GROUP BY 1, 2),
         |cent$n AS MATERIALIZED (
         |  SELECT p.cluster, coalesce(nc.c, p.c) AS c
         |  FROM ${if (n == 1) "cent0" else s"cent${n - 1}"} p
         |  LEFT JOIN (SELECT cluster, list(CAST(s2 AS DOUBLE) / ${Quantum.toLong} / n ORDER BY i) AS c
         |             FROM sum$n GROUP BY 1) nc ON nc.cluster = p.cluster)""".stripMargin
    val iters = (1 to Iters).map { n =>
      assignSql(s"asg$n", "samp", if (n == 1) "cent0" else s"cent${n - 1}") + ",\n" + upd(n)
    }.mkString(",\n")
    // Lloyd runs over the SampleCap-row sample (smallest affine
    // id-hashes — the same ordering init uses, so init ⊂ sample), the
    // SQL twin of the driver-side training loop. Corpora ≤ SampleCap
    // rows train on everything, so the oracle scales are unchanged.
    s"""samp AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM (
       |    SELECT vec_id, embedding, row_number() OVER (
       |        ORDER BY (vec_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod}, vec_id
       |      ) AS rnk
       |    FROM embeddings) WHERE rnk <= $SampleCap),
       |cent0 AS MATERIALIZED (
       |  SELECT cluster, c FROM (
       |    SELECT row_number() OVER (
       |        ORDER BY (vec_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod}, vec_id
       |      ) - 1 AS cluster,
       |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
       |    FROM samp) WHERE cluster < $kSql),
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
