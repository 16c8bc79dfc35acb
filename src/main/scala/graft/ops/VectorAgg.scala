package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession, TypedColumn}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Typed Aggregator surface (SURVEY §2E UDAF row): an element-wise vector
  * centroid — partial sums per partition, merged associatively, so it
  * map-side combines like any built-in agg. Powers an IVF-style ANN:
  * coarse cells -> centroids -> probe the nearest cells only.
  *
  * Determinism: sums are kept as QUANTIZED LONGS (round(x * 1e6)), not
  * doubles — integer addition is order-independent, so the centroid is
  * bit-identical regardless of partitioning / merge order, and a DuckDB
  * oracle can recompute it exactly (fp-summation order would otherwise
  * differ run-to-run and engine-to-engine). 1e-6 quantization of unit-norm
  * embeddings costs nothing at ANN precision.
  */
object VectorAgg {

  /** Micro-units per 1.0 — the fixed-point scale of the quantized sums. */
  val Quantum = 1e6

  /** (count, element-wise quantized sums) — mergeable mean buffer. */
  case class CentroidBuf(n: Long, sums: Array[Long])

  /** Round half-AWAY-FROM-ZERO — SQL `round()` semantics in both Spark and
    * DuckDB. `Math.round` alone rounds half toward +inf, which would put a
    * negative element landing exactly on .5 one micro-unit off the oracle. */
  private def quantize(x: Double): Long =
    if (x >= 0) Math.round(x) else -Math.round(-x)

  class CentroidAggregator(dim: Int)
      extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(0L, new Array[Long](dim))
    override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
      var i = 0
      while (i < dim && i < v.length) {
        b.sums(i) += quantize(v(i).toDouble * Quantum); i += 1
      }
      CentroidBuf(b.n + 1, b.sums)
    }
    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      CentroidBuf(x.n + y.n, x.sums)
    }
    override def finish(b: CentroidBuf): Seq[Double] =
      if (b.n == 0) Seq.fill(dim)(0.0)
      else b.sums.map(s => s.toDouble / Quantum / b.n).toSeq
    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def centroid(dim: Int): TypedColumn[Seq[Float], Seq[Double]] =
    new CentroidAggregator(dim).toColumn

  /** Row-input variant for DataFrame (untyped) aggregation — extracts the
    * embedding column from each row. */
  class RowCentroidAggregator(dim: Int, field: String)
      extends Aggregator[org.apache.spark.sql.Row, CentroidBuf, Seq[Double]] {
    private val inner = new CentroidAggregator(dim)
    override def zero: CentroidBuf = inner.zero
    override def reduce(b: CentroidBuf, r: org.apache.spark.sql.Row): CentroidBuf =
      // getAs returns a mutable ArraySeq wrapper; widen to immutable Seq
      inner.reduce(b, r.getAs[scala.collection.Seq[Float]](field).toSeq)
    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = inner.merge(x, y)
    override def finish(b: CentroidBuf): Seq[Double] = inner.finish(b)
    override def bufferEncoder: Encoder[CentroidBuf] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[Double]] = inner.outputEncoder
  }

  /** Per-label centroids of the embeddings table via the typed Aggregator,
    * exploded to one row per (label, dimension) so the DuckDB oracle checks
    * every element of every centroid, not just a sample. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    val agg = new RowCentroidAggregator(64, "embedding")
    s.read.parquet(s"$dir/embeddings.parquet")
      .groupBy(col("label"))
      .agg(agg.toColumn.name("centroid").as("centroid"),
        count(lit(1)).as("n_vectors"))
      .select(col("label").cast("long").as("label"), col("n_vectors"),
        posexplode(col("centroid")).as(Seq("dim_idx", "c_val")))
      .select(col("label"), col("dim_idx").cast("long").as("dim_idx"),
        col("c_val"), col("n_vectors"))
      .orderBy(col("label"), col("dim_idx"))
  }

  /** DuckDB recomputation of the quantized centroid: unnest each embedding
    * with its dimension index, integer-sum the quantized elements per
    * (label, dim), divide in the same order (sum/1e6/n) → bit-exact. */
  private val perDimSql: String =
    """SELECT label, i,
      |  CAST(SUM(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
      |    / 1000000 / COUNT(*) AS c_val,
      |  COUNT(*) AS n_vectors
      |FROM (SELECT label, UNNEST(embedding) AS x,
      |        UNNEST(range(0, len(embedding))) AS i FROM embeddings)
      |GROUP BY label, i""".stripMargin

  val labelCentroidsSql: String =
    s"""SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim_idx,
       |  c_val, n_vectors
       |FROM ($perDimSql) ORDER BY label, dim_idx""".stripMargin

  /** IVF-style ANN: labels act as coarse cells (a trained k-means would
    * produce the same shape); probe = the `nprobe` cells whose centroids
    * are nearest the query, exact cosine only within probed cells. At
    * 100 TB the cell assignment is a write-time partition key, so a probe
    * touches only matching partitions — and `nprobe` is THE recall/cost
    * dial: scan cost grows linearly with it while recall saturates
    * (measured curve in SCALE.md; the registered query pins nprobe = 3
    * for its oracle). */
  val NProbe = 3

  def annIvf(s: SparkSession, dir: String, nprobe: Int = NProbe): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val agg = new RowCentroidAggregator(64, "embedding")
    val centroids = emb.groupBy(col("label"))
      .agg(agg.toColumn.name("c").as("centroid"))
      .select(col("label").as("c_label"), col("centroid"))
    val probes = emb.filter(col("vec_id") < SimilarityOps.ProbeIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // rank cells per query by centroid cosine, keep nprobe
    val wCell = Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("c_label"))
    val probedCells = probes.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("c_label"),
        SimilarityOps.cosine(col("q_emb"), col("centroid")).as("c_cos"))
      .withColumn("_r", row_number().over(wCell))
      .filter(col("_r") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("c_label").as("label"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    emb.join(broadcast(probedCells), Seq("label"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        SimilarityOps.cosineFF(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= SimilarityOps.TopK)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Full IVF oracle: deterministic centroids (above) → rank cells per
    * probe by centroid cosine → exact cosine within the nprobe cells. The
    * cosine fold order matches SimilarityOps.cosine, so cell selection and
    * final ranking are both bit-exact cross-engine. */
  val annIvfSql: String = {
    def cosSql(a: String, b: String): String =
      s"""list_reduce(list_transform(list_zip($a, $b),
         |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
         |/ (sqrt(list_reduce(list_transform($a,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
         | * sqrt(list_reduce(list_transform($b,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))""".stripMargin
    s"""WITH cent AS (
       |  SELECT label, list(c_val ORDER BY i) AS centroid
       |  FROM ($perDimSql) GROUP BY label),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < ${SimilarityOps.ProbeIds}),
       |cells AS (
       |  SELECT q_id, q_emb, label FROM (
       |    SELECT p.q_id, p.q_emb, c.label,
       |      row_number() OVER (PARTITION BY p.q_id
       |        ORDER BY ${cosSql("p.q_emb", "c.centroid")} DESC, c.label) AS r
       |    FROM probes p, cent c) WHERE r <= $NProbe),
       |scored AS (
       |  SELECT s.q_id, e.vec_id AS c_id,
       |    ${cosSql("s.q_emb", "e.embedding")} AS cos
       |  FROM cells s JOIN embeddings e ON e.label = s.label
       |  WHERE e.vec_id <> s.q_id)
       |SELECT q_id, c_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
       |FROM scored
       |QUALIFY rank <= ${SimilarityOps.TopK}
       |ORDER BY q_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_label_centroids" -> (labelCentroids _),
    "sim_ann_ivf" -> ((s: SparkSession, d: String) => annIvf(s, d))
  )

  val oracle: Map[String, String] = Map(
    "sim_label_centroids" -> labelCentroidsSql,
    "sim_ann_ivf" -> annIvfSql
  )
}
