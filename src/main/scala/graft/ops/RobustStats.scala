package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-domain outlier detection for corpus curation: flag
  * documents whose token count sits outside the modified z-score fence
  * |0.6745·(x − median)/MAD| > 3.5 (Iglewicz & Hoaglin 1993) — the
  * standard length-anomaly screen that, unlike mean/stddev fences, is
  * not dragged by the outliers it is hunting.
  *
  * The medians are EXACT but never sort the corpus in one task: both
  * median and MAD run on the VALUE HISTOGRAM (ClickHouse's
  * `quantileExact` shape) — `groupBy(source, value) → count` collapses
  * the corpus to one row per distinct value first, and the cumulative
  * window that finds the median runs over histogram rows (bounded by
  * the value domain, ~10³–10⁶ rows per domain at any corpus size), not
  * corpus rows. The few-valued `source` partition key is therefore safe
  * here — the very shape that made q48's corpus-scale window a
  * 100×-killer is harmless when the partition holds a histogram.
  * median(x) and MAD = median(|x − median|) are two such passes; the
  * per-domain median table broadcasts back for the deviation join.
  *
  * All arithmetic is integer (the fence is 6745·dev > 35000·MAD, the
  * milli-scaled inequality; MAD = 0 degenerates to dev > 0), so the
  * DuckDB oracle replays histogram, cumsum, fence and all cell-exactly.
  */
object RobustStats {

  /** Tokenize-and-count once: the 3-narrow-column projection feeds the
    * value histogram, the deviation join and the fence agg — without
    * the checkpoint each consumer would re-split the corpus text. */
  private def lengths(s: SparkSession, dir: String): DataFrame =
    Lineage.truncate(s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok")))

  /** Exact per-group quantile of `v` via the value histogram: smallest
    * value whose cumulative count reaches ceil(n·num/den). The window
    * runs over HISTOGRAM rows (bounded by the value domain), never
    * corpus rows — the quantileExact shape. num=1, den=2 is the lower
    * median ((n·1 + 2 − 1) DIV 2 = ceil(n/2)). */
  private[ops] def histQuantile(df: DataFrame, grp: String, v: String,
      num: Long, den: Long): DataFrame = {
    val wCum = Window.partitionBy(col(grp)).orderBy(col(v)) // histogram-sized
    val wAll = Window.partitionBy(col(grp))
    df.groupBy(col(grp), col(v)).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(col("cum") >= expr(s"(n * $num + $den - 1) DIV $den"))
      .groupBy(col(grp)).agg(min(col(v)).as("med"))
  }

  /** Exact per-group lower median of `v` via the value histogram. */
  private def histMedian(df: DataFrame, grp: String, v: String): DataFrame =
    histQuantile(df, grp, v, 1, 2)

  def outlierMad(s: SparkSession, dir: String): DataFrame = {
    val d = lengths(s, dir)
    val med = histMedian(d, "source", "n_tok")
    val dev = d.join(broadcast(med), Seq("source"))
      .withColumn("dv", abs(col("n_tok") - col("med")))
    val mad = histMedian(dev, "source", "dv")
      .withColumnRenamed("med", "mad")
    dev.join(broadcast(mad), Seq("source"))
      .withColumn("is_outlier",
        (col("dv") * 6745L > col("mad") * 35000L).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("med")).as("med_tok"), // constant within group
        max(col("mad")).as("mad_tok"),
        sum(col("is_outlier")).as("n_outliers"),
        max(col("dv")).as("max_dev"))
      .orderBy(col("source"))
  }

  val outlierMadSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |hist AS (SELECT source, n_tok, count(*) AS c FROM d GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, n_tok,
      |    sum(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM hist),
      |med AS (SELECT source, min(n_tok) AS med FROM cum
      |        WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |dev AS (
      |  SELECT d.doc_id, d.source, abs(d.n_tok - m.med) AS dv, m.med
      |  FROM d JOIN med m USING (source)),
      |dhist AS (SELECT source, dv, count(*) AS c FROM dev GROUP BY 1, 2),
      |dcum AS (
      |  SELECT source, dv,
      |    sum(c) OVER (PARTITION BY source ORDER BY dv) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM dhist),
      |mad AS (SELECT source, min(dv) AS mad FROM dcum
      |        WHERE cum >= (n + 1) // 2 GROUP BY 1)
      |SELECT dev.source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(max(dev.med) AS BIGINT) AS med_tok,
      |  CAST(max(mad.mad) AS BIGINT) AS mad_tok,
      |  CAST(sum(CASE WHEN dev.dv * 6745 > mad.mad * 35000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  CAST(max(dev.dv) AS BIGINT) AS max_dev
      |FROM dev JOIN mad USING (source)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Winsorized + trimmed mean per source — the robust location estimates
  // a curation dashboard reports next to the MAD fence: the 10/90
  // winsorized mean (clamp into [p10, p90], then average — outliers keep
  // their vote but lose their leverage) and the 10/90 trimmed mean
  // (drop outside [p10, p90] entirely). Same scale discipline as
  // [[outlierMad]]: BOTH exact deciles come from the value histogram
  // (cumulative window over histogram rows, never corpus rows), the
  // per-source cut points broadcast back, and the means are ONE exact
  // integer aggregation — the only double is the final division, the
  // same expression on both engines. histQuantile's convention (smallest
  // value whose cumulative count reaches ceil(n·num/den)) defines p10
  // (num=1, den=10) and p90 (num=9, den=10) identically cross-engine.
  def winsorized(s: SparkSession, dir: String): DataFrame = {
    val d = lengths(s, dir)
    val p10 = histQuantile(d, "source", "n_tok", 1, 10)
      .withColumnRenamed("med", "p10")
    val p90 = histQuantile(d, "source", "n_tok", 9, 10)
      .withColumnRenamed("med", "p90")
    d.join(broadcast(p10), Seq("source"))
      .join(broadcast(p90), Seq("source"))
      .withColumn("w_tok", greatest(least(col("n_tok"), col("p90")), col("p10")))
      .withColumn("in_core",
        (col("n_tok") >= col("p10") && col("n_tok") <= col("p90")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("p10")).as("p10_tok"), // constant within group
        max(col("p90")).as("p90_tok"),
        sum(col("w_tok")).as("w_sum"),
        sum(col("in_core")).as("n_core"),
        sum(when(col("in_core") === 1L, col("n_tok")).otherwise(0L)).as("c_sum"))
      .select(col("source"), col("n_docs"), col("p10_tok"), col("p90_tok"),
        expr("CAST(w_sum AS DOUBLE) / n_docs").as("winsor_mean"),
        col("n_core"),
        expr("CAST(c_sum AS DOUBLE) / n_core").as("trim_mean"))
      .orderBy(col("source"))
  }

  val winsorizedSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |hist AS (SELECT source, n_tok, count(*) AS c FROM d GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, n_tok,
      |    sum(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM hist),
      |p10 AS (SELECT source, min(n_tok) AS p10 FROM cum
      |        WHERE cum >= (n * 1 + 9) // 10 GROUP BY 1),
      |p90 AS (SELECT source, min(n_tok) AS p90 FROM cum
      |        WHERE cum >= (n * 9 + 9) // 10 GROUP BY 1),
      |j AS (
      |  SELECT d.source, d.n_tok, p10.p10, p90.p90,
      |    greatest(least(d.n_tok, p90.p90), p10.p10) AS w_tok,
      |    CASE WHEN d.n_tok >= p10.p10 AND d.n_tok <= p90.p90
      |         THEN 1 ELSE 0 END AS in_core
      |  FROM d JOIN p10 USING (source) JOIN p90 USING (source))
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(max(p10) AS BIGINT) AS p10_tok,
      |  CAST(max(p90) AS BIGINT) AS p90_tok,
      |  CAST(sum(w_tok) AS DOUBLE) / count(*) AS winsor_mean,
      |  CAST(sum(in_core) AS BIGINT) AS n_core,
      |  CAST(sum(CASE WHEN in_core = 1 THEN n_tok ELSE 0 END) AS DOUBLE)
      |    / sum(in_core) AS trim_mean
      |FROM j
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_outlier_mad" -> (outlierMad _),
    "filter_winsorized" -> (winsorized _)
  )

  val oracle: Map[String, String] = Map(
    "filter_outlier_mad" -> outlierMadSql,
    "filter_winsorized" -> winsorizedSql
  )
}
