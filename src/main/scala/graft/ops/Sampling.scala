package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + split assignment for training-data
  * pipelines. Randomness is replaced by an affine hash of the stable
  * document id — reproducible across runs, retries, engines, and
  * cluster sizes (a `rand()` sample changes under task retry; a
  * hash-threshold sample never does). All single-pass, shuffle only on
  * the final aggregation/ranking keys — 100 TB-safe shapes.
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Affine id hash onto [0, Mod): the split/sample coin flip. */
  val HashA = 1103515245L
  val HashB = 12345L
  val Mod = 1000003L

  private def coin = (col("doc_id") * HashA + HashB) % Mod

  /** 80/10/10 train/val/test assignment, stable per doc_id. Emits the
    * per-(split, lang) contingency table so the oracle checks both the
    * assignment function and the stratified counts. */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        when(coin < Mod * 8 / 10, "train")
          .when(coin < Mod * 9 / 10, "val")
          .otherwise("test").as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("split"), col("lang"))

  val splitAssignSql: String =
    s"""SELECT split, lang, count(*) AS n_docs,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id
       |FROM (
       |  SELECT doc_id, lang,
       |    CASE WHEN (doc_id * $HashA + $HashB) % $Mod < ${Mod * 8 / 10} THEN 'train'
       |         WHEN (doc_id * $HashA + $HashB) % $Mod < ${Mod * 9 / 10} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Stratified deterministic sample: the `perStratum` smallest id-hashes
    * per language — a uniform without-replacement sample whose membership
    * is a pure function of the ids (ranking ties broken by doc_id). */
  val PerStratum = 40

  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), coin.as("h"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= PerStratum)
      .select(col("doc_id"), col("lang"), col("h"), col("r").cast("long").as("r"))
      .orderBy(col("lang"), col("r"))
  }

  val stratifiedSampleSql: String =
    s"""SELECT doc_id, lang, h, CAST(r AS BIGINT) AS r FROM (
       |  SELECT doc_id, lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS r
       |  FROM (SELECT doc_id, lang, (doc_id * $HashA + $HashB) % $Mod AS h
       |        FROM documents))
       |WHERE r <= $PerStratum
       |ORDER BY lang, r""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split_assign" -> (splitAssign _),
    "sample_stratified" -> (stratifiedSample _)
  )

  val oracle: Map[String, String] = Map(
    "sample_split_assign" -> splitAssignSql,
    "sample_stratified" -> stratifiedSampleSql
  )
}
