package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * - [[cosine]] folds in exact left-to-right double arithmetic (identical
  *   op order to DuckDB's list_reduce, so oracle comparison is bit-exact).
  * - Brute-force top-k broadcasts the (small) query set and scans the
  *   corpus once — the right baseline at any scale: no shuffle of the
  *   corpus, per-partition top-k via window on (query, cos).
  * - The scale path is hyperplane LSH ([[lshBucket]]): one narrow pass to
  *   bucket vectors, shuffle only on (bucket), probe = same-bucket join.
  */
object SimilarityOps {

  /** Exact cosine similarity of two float-array columns in double math. */
  def cosine(a: Column, b: Column): Column = {
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, v) => acc + v)
    val dot = fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val na = fold(transform(a, x => x.cast("double") * x.cast("double")))
    val nb = fold(transform(b, x => x.cast("double") * x.cast("double")))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Random-hyperplane LSH bucket id: bit i = sign of <v, h_i> where
    * h_i has ±1 weights derived from xxhash64(seed, i, j) parity —
    * deterministic, no stored model, codegen-friendly. */
  def lshBucket(v: Column, bits: Int, seed: Int = 0): Column =
    (0 until bits).map { i =>
      val signedSum = aggregate(
        transform(v, (x, j) =>
          when(pmod(xxhash64(lit(seed), lit(i), j), lit(2)) === 1, x.cast("double"))
            .otherwise(-x.cast("double"))),
        lit(0.0), (acc, w) => acc + w)
      when(signedSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ------------------------------------------------------------------
  // Brute-force cosine top-k: 5 probe vectors vs the corpus.
  val ProbeIds = 5
  val TopK = 10

  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < ProbeIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(probes))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("q_emb"), col("c_emb")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val annBruteForceSql: String =
    s"""WITH probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $ProbeIds),
       |scored AS (
       |  SELECT q_id, c.vec_id AS c_id,
       |    list_reduce(list_transform(list_zip(q_emb, c.embedding),
       |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
       |    / (sqrt(list_reduce(list_transform(q_emb,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
       |     * sqrt(list_reduce(list_transform(c.embedding,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))) AS cos
       |  FROM embeddings c, probes WHERE c.vec_id <> q_id)
       |SELECT q_id, c_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
       |FROM scored
       |QUALIFY rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  // ------------------------------------------------------------------
  // LSH-bucketed ANN (the 100 TB path): multi-table hyperplane LSH —
  // L independent tables of k bits each; a vector is a candidate for a
  // probe if they share a bucket in ANY table. Exact cosine + top-k on
  // the (much smaller) candidate set only. k and L trade candidate count
  // against recall; shuffle keys are (table, bucket) — never O(n²).
  val LshBits = 4
  val LshTables = 8

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val bucketArr = array((0 until LshTables).map { t =>
      struct(lit(t).as("table"), lshBucket(col("embedding"), LshBits, seed = t).as("bucket"))
    }: _*)
    val bucketed = emb
      .select(col("vec_id"), col("embedding"), explode(bucketArr).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.table"), col("tb.bucket"))
    val probes = bucketed.filter(col("vec_id") < ProbeIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("table"), col("bucket"))
    val candidates = bucketed
      .join(broadcast(probes), Seq("table", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"), col("q_emb"), col("embedding"))
      .dropDuplicates("q_id", "c_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    candidates
      .select(col("q_id"), col("c_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_brute_force" -> (annBruteForce _),
    "sim_ann_lsh" -> (annLsh _)
  )

  val oracle: Map[String, String] = Map(
    "sim_ann_brute_force" -> annBruteForceSql
    // sim_ann_lsh: approximate by design -> rows-only + recall ScalaTest.
  )
}
