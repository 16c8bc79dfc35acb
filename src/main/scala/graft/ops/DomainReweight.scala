package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023): choose pretraining
  * mixture weights over domains by multiplicative-weights ascent on
  * per-domain EXCESS LOSS, then smooth with the uniform mixture and
  * average the iterates. The published recipe trains proxy/reference
  * models; the engine-side analogue here uses the corpus add-one bigram
  * LM (the [[TextOps.perplexity]] machinery) as the loss model: a
  * domain's excess loss is its mean bigram NLL above the best
  * (lowest-NLL) domain — the same "harder domains get more weight"
  * signal, computable in ONE corpus pass.
  *
  * Everything after that pass is dimension-sized: k domain rows (k =
  * distinct sources) fold through T multiplicative-weights rounds —
  * update w ∝ w·(1 + η·excess), renormalize, accumulate — entirely in
  * integer ppm/milli arithmetic (DIV, never float), so the DuckDB
  * oracle replays the training loop round for round, bit for bit, the
  * same contract as the trained quality classifier. The final mixture
  * is the round-averaged weight smoothed with uniform ((1−ε)·ᾱ + ε/k,
  * the paper's step 2), and each domain's token budget under the new
  * mixture rides along.
  *
  * 100 TB shape: the corpus contributes exactly one bigram-scoring pass
  * (broadcast LM dims, the perplexity plan); the MW loop touches k rows
  * under [[Windows.boundedGlobal]]-style constant-key windows — no
  * driver-side data, no corpus-scale iteration.
  */
object DomainReweight {

  val Rounds = 12
  val Scale = 1000000L // ppm
  val EtaPpmPerMilli = 400L // MW step: factor 1 + η·excess, η in ppm/milli-nat
  val EpsPpm = 20000L // 2% uniform smoothing

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-domain loss table: token total, bigram count, mean bigram NLL
    * in milli-nats under the corpus add-one bigram LM. NLL is negated
    * AFTER the shared round(1000·ln(p)) quantization, so the integer is
    * the exact negative of the proven perplexity cell — and the mean's
    * DIV truncation runs on nonnegative operands in both engines. */
  private def domainLoss(s: SparkSession, dir: String): DataFrame = {
    val d0 = docs(s, dir)
    val toks = TextOps.tokens(col("text"))
    // LM over the TextOps.LmVocabCap-pruned vocabulary: the model
    // frames below are cap-bounded, so their broadcasts are legitimate
    // at any corpus size (see the contract at TextOps.LmVocabCap).
    val d = TextOps.withLmTokens(d0)
    val docBigrams = d.select(col("source"), col("_mt").as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(_t) - 1), i -> struct(_t[i-1] AS w1, _t[i] AS w2))")).as("b"))
      .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bi = docBigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = d.select(explode(col("_mt")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = d.select(explode(col("_mt")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val nll = docBigrams
      .join(broadcast(bi), Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(vocab)) // 1-row LM constant: structural
      .select(col("source"),
        (-expr("CAST(round(1000 * ln((c12 + 1) / (c1 + v))) AS BIGINT)"))
          .as("nll_milli"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_milli")).as("sum_nll"))
      .withColumn("mean_nll_milli", expr("sum_nll DIV n_bigrams"))
    val tokTotals = d
      .groupBy(col("source")).agg(sum(size(toks)).cast("long").as("n_tokens"))
    nll.join(tokTotals, Seq("source"))
      .select(col("source"), col("n_tokens"), col("mean_nll_milli"))
  }

  def doremiWeights(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(lit(0)) // k-domain frame: bounded
    val base = domainLoss(s, dir)
      .withColumn("excess_milli",
        col("mean_nll_milli") - min(col("mean_nll_milli")).over(wAll))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("total_tokens", sum(col("n_tokens")).over(wAll))
      .withColumn("w", lit(Scale))
      .withColumn("acc", lit(0L))
    val trained = (1 to Rounds).foldLeft(base) { (df, _) =>
      df.withColumn("u",
          expr(s"w * ($Scale + $EtaPpmPerMilli * excess_milli) DIV $Scale"))
        .withColumn("tot", sum(col("u")).over(wAll))
        .withColumn("w", expr(s"u * $Scale DIV tot"))
        .withColumn("acc", col("acc") + col("w"))
        .drop("u", "tot")
    }
    trained
      .withColumn("alpha_mw", expr(s"acc DIV $Rounds"))
      .withColumn("alpha_ppm", expr(
        s"alpha_mw * (${Scale - EpsPpm}) DIV $Scale + $EpsPpm DIV k"))
      .withColumn("token_budget", expr(s"total_tokens * alpha_ppm DIV $Scale"))
      .select(col("source"), col("n_tokens"), col("mean_nll_milli"),
        col("excess_milli"), col("alpha_ppm"), col("token_budget"))
      .orderBy(col("source"))
  }

  /** Oracle: the SAME loss pass and the SAME T-round MW loop, unrolled
    * as CTEs over the k domain rows — integer-exact replay. */
  val doremiWeightsSql: String = {
    val rounds = (1 to Rounds).map { t =>
      val prev = if (t == 1) "r0" else s"r${t - 1}"
      s"""r$t AS (
         |  SELECT source, n_tokens, mean_nll_milli, excess_milli, k, total_tokens,
         |    (u * $Scale) // (sum(u) OVER ()) AS w,
         |    acc + (u * $Scale) // (sum(u) OVER ()) AS acc
         |  FROM (SELECT *, (w * ($Scale + $EtaPpmPerMilli * excess_milli)) // $Scale AS u
         |        FROM $prev))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${TextOps.lmMapCtesSql("source")},
       |bg AS (
       |  SELECT source, toks[i] AS w1, toks[i+1] AS w2
       |  FROM mt, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)),
       |bi AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |uni AS (SELECT w1, count(*) AS c1 FROM (SELECT UNNEST(toks) AS w1 FROM mt) GROUP BY 1),
       |voc AS (SELECT count(DISTINCT w) AS v FROM (SELECT UNNEST(toks) AS w FROM mt)),
       |nll AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(-CAST(round(1000 * ln((c12 + 1) / (c1 + v))) AS BIGINT)) AS BIGINT)
       |      AS sum_nll
       |  FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1), voc
       |  GROUP BY 1),
       |tok AS (
       |  SELECT source, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
       |  FROM t GROUP BY 1),
       |loss AS (
       |  SELECT n.source, tok.n_tokens, sum_nll // n_bigrams AS mean_nll_milli
       |  FROM nll n JOIN tok USING (source)),
       |r0 AS (
       |  SELECT source, n_tokens, mean_nll_milli,
       |    mean_nll_milli - min(mean_nll_milli) OVER () AS excess_milli,
       |    count(*) OVER () AS k,
       |    sum(n_tokens) OVER () AS total_tokens,
       |    CAST($Scale AS BIGINT) AS w, CAST(0 AS BIGINT) AS acc
       |  FROM loss),
       |$rounds
       |SELECT source, n_tokens, CAST(mean_nll_milli AS BIGINT) AS mean_nll_milli,
       |  CAST(excess_milli AS BIGINT) AS excess_milli,
       |  CAST((acc // $Rounds) * ${Scale - EpsPpm} // $Scale + $EpsPpm // k AS BIGINT)
       |    AS alpha_ppm,
       |  CAST(total_tokens *
       |    ((acc // $Rounds) * ${Scale - EpsPpm} // $Scale + $EpsPpm // k)
       |    // $Scale AS BIGINT) AS token_budget
       |FROM r$Rounds
       |ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_doremi" -> (doremiWeights _)
  )

  val oracle: Map[String, String] = Map(
    "sample_doremi" -> doremiWeightsSql
  )
}
