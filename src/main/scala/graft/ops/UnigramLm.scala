package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece unigram
  * model) — the OTHER major tokenizer family next to BPE
  * ([[TextOps.bpeMergesFrom]]): pieces carry log-probabilities and a
  * word's tokenization is the Viterbi-best segmentation under them,
  * refined by hard-EM rounds (segment → recount → re-score).
  *
  * Shape for 100 TB (the same Sennrich reduction as BPE): the corpus
  * collapses ONCE to a (word, count) vocabulary — the only corpus-scale
  * shuffle — capped to the top [[MaxWords]] words by frequency (what
  * SentencePiece's own trainer does by sampling; the cap is the honest
  * scale knob). Training — candidate pieces, [[Iters]] Viterbi/hard-EM
  * rounds — runs on that bounded table with bounded driver state, and
  * ENCODING never re-runs the DP: the per-word piece count from the
  * final segmentation broadcasts back against the corpus word stream,
  * so the apply side is one broadcast join + per-doc sum.
  *
  * Determinism: piece costs are milli-nat integers via the repo's
  * quantized-ln idiom (`round(1000·ln(x))`, identical expression text in
  * both engines); the DP state is integer cost with the total order
  * (cost asc, piece-length desc, piece asc) breaking ties, so every
  * segmentation — and therefore every usage count, every re-scored
  * cost, every per-doc token count — replays bit-for-bit in the DuckDB
  * oracle, where the DP positions and backtrace steps are unrolled as
  * CTE layers (the BPE-oracle construction).
  */
object UnigramLm {

  /** Max piece length in characters. */
  val MaxPiece = 6
  /** Words longer than this are outside the model (DP unroll bound —
    * both engines filter identically). */
  val MaxWord = 16
  /** Multi-character piece budget (single chars are always kept for
    * coverage). */
  val VocabMulti = 48
  /** Word-vocabulary training cap: top-N by (count desc, word). */
  val MaxWords = 4096
  /** Hard-EM rounds (Viterbi segment → recount → re-score). */
  val Iters = 2

  private def qln(num: Double, den: Double): Long =
    Math.round(1000.0 * math.log(num / den))

  /** Driver-side trainer over the capped (word, count) vocabulary.
    * Returns (per-word final piece count, final piece table
    * (piece, uses, cost)). Bounded: |words| ≤ MaxWords, pieces ≤
    * chars + VocabMulti. */
  private[ops] def train(words: Seq[(String, Long)])
      : (Map[String, Long], Seq[(String, Long, Long)]) = {
    // candidate pieces weighted by word frequency
    val cand = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(MaxPiece, w.length - i)) {
      val p = w.substring(i, i + l)
      cand(p) = cand.getOrElse(p, 0L) + c
    }
    val chars = cand.iterator.filter(_._1.length == 1).toSeq
    val multi = cand.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(VocabMulti)
    val vocabF = (chars ++ multi).sortBy(_._1)
    val totF = vocabF.map(_._2).sum
    var cost: Map[String, Long] =
      vocabF.map { case (p, f) => p -> qln(totF.toDouble, f.toDouble) }.toMap
    var usage: Map[String, Long] = Map.empty
    var segN: Map[String, Long] = Map.empty
    for (_ <- 1 to Iters) {
      val u = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val n = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words) {
        val L = w.length
        val best = Array.fill(L + 1)(Long.MaxValue)
        val chLen = new Array[Int](L + 1)
        val chPiece = new Array[String](L + 1)
        best(0) = 0L
        for (t <- 1 to L) {
          var bc = Long.MaxValue; var bl = 0; var bp: String = null
          for (l <- 1 to math.min(MaxPiece, t)) {
            val p = w.substring(t - l, t)
            cost.get(p) match {
              case Some(pc) if best(t - l) != Long.MaxValue =>
                val cc = best(t - l) + pc
                // total order: cost asc, length desc, piece asc
                if (cc < bc || (cc == bc && (l > bl || (l == bl && (bp == null || p < bp))))) {
                  bc = cc; bl = l; bp = p
                }
              case _ => ()
            }
          }
          best(t) = bc; chLen(t) = bl; chPiece(t) = bp
        }
        var t = L; var k = 0L
        while (t > 0) { u(chPiece(t)) += c; k += 1; t -= chLen(t) }
        n(w) = k
      }
      val totU = u.values.sum
      val v = cost.size.toLong
      // add-one smoothing keeps every vocab piece alive and the ln
      // argument positive — and is trivially replayed in SQL
      cost = cost.keys.map(p =>
        p -> qln((totU + v).toDouble, (u(p) + 1L).toDouble)).toMap
      usage = cost.keys.map(p => p -> u(p)).toMap
      segN = n.toMap
    }
    (segN, cost.keys.toSeq.sorted.map(p => (p, usage(p), cost(p))))
  }

  /** Capped word vocabulary of a (doc_id, text) corpus — the one
    * corpus-scale aggregation. */
  private def wordVocab(d: DataFrame): DataFrame =
    d.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWord)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(MaxWords)

  /** Per-doc token counts under the trained unigram tokenizer —
    * the budget number pipelines compare against BPE
    * ([[TextOps.bpeEncodeFrom]] has the identical output shape). */
  def unigramEncode(s: SparkSession, dir: String): DataFrame =
    unigramEncodeFrom(s.read.parquet(s"$dir/documents.parquet"))

  def unigramEncodeFrom(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val wv = wordVocab(d).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (segN, _) = train(wv)
    val seg = broadcast(
      segN.toSeq.toDF("word", "n_pieces"))
    d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWord)
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_unigram_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: candidate selection, both EM rounds' DP (positions 1..16
    * and the 16 backtrace steps unrolled as CTE layers) and the final
    * encode join, all in one statement. */
  val unigramEncodeSql: String = {
    // Viterbi round r (vocab v{r-1} -> b{r}_t layers, backtrace pt{r}_k,
    // usage/seg/re-scored v{r})
    def round(r: Int): String = {
      val bs = (1 to MaxWord).map { t =>
        val branches = (1 to math.min(MaxPiece, t)).map { l =>
          s"""    SELECT b.word, b.c, b.cost + v.cost AS cost, $l AS l, v.piece
             |    FROM b${r}_${t - l} b JOIN v${r - 1} v
             |      ON v.piece = substr(b.word, ${t - l + 1}, $l)
             |    WHERE length(b.word) >= $t""".stripMargin
        }.mkString("\n    UNION ALL\n")
        s"""b${r}_$t AS MATERIALIZED (
           |  SELECT word, c, cost, l, piece FROM (
           |    SELECT word, c, cost, l, piece,
           |      row_number() OVER (PARTITION BY word ORDER BY cost, l DESC, piece) AS rk
           |    FROM (
           |$branches
           |    )) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      val ball = (1 to MaxWord)
        .map(t => s"SELECT word, c, $t AS t, l, piece FROM b${r}_$t")
        .mkString("\n  UNION ALL ")
      val pts = (1 to MaxWord).map { k =>
        s"""pt${r}_$k AS MATERIALIZED (
           |  SELECT p.word, p.c, p.t - b.l AS t, b.piece
           |  FROM pt${r}_${k - 1} p JOIN ball$r b ON b.word = p.word AND b.t = p.t)""".stripMargin
      }.mkString(",\n")
      val emitted = (1 to MaxWord)
        .map(k => s"SELECT word, c, piece FROM pt${r}_$k").mkString("\n  UNION ALL ")
      s"""b${r}_0 AS (SELECT word, c, CAST(0 AS BIGINT) AS cost FROM wvc),
         |$bs,
         |ball$r AS MATERIALIZED (
         |  $ball),
         |pt${r}_0 AS (SELECT word, c, length(word) AS t FROM wvc),
         |$pts,
         |em$r AS MATERIALIZED (
         |  $emitted),
         |use$r AS (SELECT piece, CAST(sum(c) AS BIGINT) AS u FROM em$r GROUP BY 1),
         |seg$r AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces FROM em$r GROUP BY 1),
         |tot$r AS (SELECT CAST(sum(u) AS BIGINT) AS t,
         |                 (SELECT CAST(count(*) AS BIGINT) FROM v0) AS v FROM use$r),
         |v$r AS (
         |  SELECT p.piece,
         |    CAST(round(1000 * ln(CAST(t.t + t.v AS DOUBLE) / (coalesce(u.u, 0) + 1))) AS BIGINT) AS cost
         |  FROM v${r - 1} p LEFT JOIN use$r u ON u.piece = p.piece, tot$r t)""".stripMargin
    }
    s"""WITH words AS MATERIALIZED (
       |  SELECT doc_id, word
       |  FROM (SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |        FROM documents)
       |  WHERE length(word) > 0 AND length(word) <= $MaxWord),
       |wv AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY 1),
       |wvc AS MATERIALIZED (SELECT word, c FROM wv ORDER BY c DESC, word LIMIT $MaxWords),
       |cand AS (
       |  SELECT substr(word, i, l) AS piece, CAST(sum(c) AS BIGINT) AS f
       |  FROM wvc,
       |       UNNEST(generate_series(1, length(word))) AS g(i),
       |       UNNEST(generate_series(1, $MaxPiece)) AS h(l)
       |  WHERE i + l - 1 <= length(word)
       |  GROUP BY 1),
       |multi AS (SELECT piece, f FROM cand WHERE length(piece) > 1
       |          ORDER BY f DESC, piece LIMIT $VocabMulti),
       |v0f AS MATERIALIZED (
       |  SELECT piece, f FROM cand WHERE length(piece) = 1
       |  UNION ALL SELECT piece, f FROM multi),
       |tot0 AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM v0f),
       |v0 AS MATERIALIZED (
       |  SELECT piece, CAST(round(1000 * ln(CAST(t AS DOUBLE) / f)) AS BIGINT) AS cost
       |  FROM v0f, tot0),
       |${(1 to Iters).map(round).mkString(",\n")}
       |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(s.n_pieces) AS BIGINT) AS n_unigram_tokens
       |FROM words w JOIN seg$Iters s ON s.word = w.word
       |GROUP BY 1
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_encode" -> (unigramEncode _)
  )

  val oracle: Map[String, String] = Map(
    "text_unigram_encode" -> unigramEncodeSql
  )
}
