package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession, TypedColumn}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Typed Aggregator surface (SURVEY §2E UDAF row): an element-wise vector
  * centroid — partial sums per partition, merged associatively, so it
  * map-side combines like any built-in agg. Powers an IVF-style ANN:
  * coarse cells -> centroids -> probe the nearest cells only.
  */
object VectorAgg {

  /** (count, element-wise sums) — the classic mergeable mean buffer. */
  case class CentroidBuf(n: Long, sums: Array[Double])

  class CentroidAggregator(dim: Int)
      extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(0L, new Array[Double](dim))
    override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
      var i = 0
      while (i < dim && i < v.length) { b.sums(i) += v(i); i += 1 }
      CentroidBuf(b.n + 1, b.sums)
    }
    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      CentroidBuf(x.n + y.n, x.sums)
    }
    override def finish(b: CentroidBuf): Seq[Double] =
      if (b.n == 0) Seq.fill(dim)(0.0) else b.sums.map(_ / b.n).toSeq
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

  /** Per-label centroids of the embeddings table via the typed Aggregator
    * (registered as a plain agg expression over a DataFrame). */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    val agg = new RowCentroidAggregator(64, "embedding")
    s.read.parquet(s"$dir/embeddings.parquet")
      .groupBy(col("label"))
      .agg(agg.toColumn.name("centroid").as("centroid"),
        count(lit(1)).as("n_vectors"))
      .select(col("label").cast("long").as("label"), col("n_vectors"),
        round(element_at(col("centroid"), 1), 6).as("c_first"),
        size(col("centroid")).cast("long").as("dim"))
      .orderBy(col("label"))
  }

  /** IVF-style ANN: labels act as coarse cells (a trained k-means would
    * produce the same shape); probe = the `nprobe` cells whose centroids
    * are nearest the query, exact cosine only within probed cells. At
    * 100 TB the cell assignment is a write-time partition key, so a probe
    * touches only matching partitions. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val agg = new RowCentroidAggregator(64, "embedding")
    val nprobe = 3
    val centroids = emb.groupBy(col("label"))
      .agg(agg.toColumn.name("c").as("c"))
      .select(col("label").as("c_label"),
        expr("transform(c, x -> CAST(x AS FLOAT))").as("centroid"))
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
        SimilarityOps.cosine(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= SimilarityOps.TopK)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_label_centroids" -> (labelCentroids _),
    "sim_ann_ivf" -> (annIvf _)
  )
}
