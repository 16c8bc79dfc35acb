package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Corpus-filtering operators for a training-data pipeline: rule-based
  * quality filtering (the C4/Gopher-style heuristic cascade), train/test
  * n-gram decontamination, and Bloom-filter approximate membership — the
  * three passes that sit between raw crawl and training shards.
  *
  * Scale shapes:
  *   - quality metrics are one narrow pass + two (doc, term)-keyed
  *     aggregations (map-side combined) joined back on doc_id — no
  *     corpus-wide state, linear in input;
  *   - contamination is a distinct-(doc, ngram-hash) equi-join, shuffled
  *     on the 64-bit hash, with a stop-gram cap so no single n-gram can
  *     create a quadratic hot key;
  *   - the Bloom filter is a 1024-row bit-packed table built by one
  *     bit_or aggregation and broadcast to probes — the classic
  *     distributed-membership shape (the filter is tiny, the corpus
  *     never re-shuffles).
  *
  * All arithmetic is exact integer (milli-unit ratios, polynomial
  * hashes), so every operator has a bit-exact DuckDB oracle.
  */
object FilterOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val HashMod = DedupOps.HashMod

  /** DuckDB form of the polynomial char fold (Spark side uses the native
    * codegen [[graft.functions.PolyHash]] — value-identical). */
  private def polyHashSql(column: String, base: Long, mod: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($column, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * $base + x) % $mod)"

  // ------------------------------------------------------------------
  // Rule-based quality filtering (Gopher/C4-style): per-document
  // heuristic metrics in exact milli-units + a keep/drop verdict.
  //
  // Rules (a doc is kept iff ALL pass):
  //   r1  token count in [MinTokens, MaxTokens]
  //   r2  mean token length in [3.0, 10.0]
  //   r3  symbol-to-token ratio <= 0.1
  //   r4  >= 2 distinct stopwords present
  //   r5  >= 80% of tokens contain an ASCII letter
  //   r6  most frequent token accounts for <= 20% of tokens
  //   r7  most frequent bigram accounts for <= 20% of bigrams
  // (r5 is deliberately Latin-centric — the classic C4 bias; on a real
  // multilingual crawl non-Latin docs fail it, which is why the metrics
  // are emitted alongside the verdict: the cascade is auditable, not a
  // black box.)
  val MinTokens = 50L
  val MaxTokens = 100000L
  val MinWordLenMilli = 3000L
  val MaxWordLenMilli = 10000L
  val MaxSymbolMilli = 100L
  val MinStopDistinct = 2L
  val MinAlphaMilli = 800L
  val MaxTopTokenMilli = 200L
  val MaxTopBigramMilli = 200L
  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def qualityFilters(s: SparkSession, dir: String): DataFrame =
    qualityMetricsFrom(docs(s, dir)).orderBy(col("doc_id"))

  /** The full metrics + verdict frame over any (doc_id, text) corpus —
    * shared by the standalone query and the end-to-end refinery. */
  def qualityMetricsFrom(d: DataFrame): DataFrame =
    qualityMetricsThrough(d).select(
      col("doc_id"), col("n_tokens"), col("mean_tok_len_milli"),
      col("symbol_ratio_milli"), col("alpha_frac_milli"),
      col("n_stop_distinct"), col("top_token_frac_milli"),
      col("top_bigram_frac_milli"), col("n_rules_failed"), col("keep"))

  /** Max multiplicity of any element of a string-array expression,
    * computed NARROWLY: sort the array, take the longest equal-run.
    * Value-identical to the old explode → per-(doc, gram) count → max
    * pipeline at ZERO shuffles — the repetition metrics were the only
    * reason the quality DAG shuffled at all, and what they shuffled was
    * corpus-TOKEN-cardinality rows (r14 verdict: chi-square's residual
    * is this shared DAG). Per-row sort is O(len·log len) on data already
    * in hand — the shape that survives 100 TB. */
  private def maxRunExpr(arr: String): String =
    s"""aggregate(
       |  sort_array($arr),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |  (s, x) -> IF(s.prev IS NOT NULL AND x = s.prev,
       |    named_struct('prev', x, 'run', s.run + 1L, 'best', greatest(s.best, s.run + 1L)),
       |    named_struct('prev', x, 'run', 1L, 'best', greatest(s.best, 1L))),
       |  s -> s.best)""".stripMargin

  /** [[qualityMetricsFrom]] as a PASS-THROUGH: appends the metric +
    * verdict columns, PRESERVING every input column (lang, source, …) —
    * the whole computation is narrow per-row column algebra now, so
    * consumers that need `keep` alongside other document attributes
    * (chi-square, per-lang rollups) read them from one projection
    * instead of self-joining the corpus on doc_id. */
  private[graft] def qualityMetricsThrough(d: DataFrame): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    val withRaw = d
      .withColumn("_t", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("_t")).cast("long"))
      .withColumn("_sum_tok_len",
        expr("aggregate(transform(_t, t -> CAST(length(t) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("_n_symbols",
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long"))
      .withColumn("_n_alpha",
        size(filter(col("_t"), t => t.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_stop_distinct",
        size(array_distinct(filter(col("_t"), t => array_contains(stopArr, t))))
          .cast("long"))
      .withColumn("_top_tok", expr(maxRunExpr("_t")))
      // <2 tokens -> no bigram (and sequence(1, 0) would count DOWN):
      // guard to a typed empty array, whose max-run is 0 — the same
      // value the old LEFT-join + coalesce path produced.
      .withColumn("_top_big", expr(maxRunExpr(
        "IF(size(_t) >= 2, transform(sequence(1, size(_t) - 1), i -> concat_ws(' ', _t[i-1], _t[i])), CAST(array() AS ARRAY<STRING>))")))
    val m = withRaw
      .withColumn("mean_tok_len_milli", expr("_sum_tok_len * 1000 DIV n_tokens"))
      .withColumn("symbol_ratio_milli", expr("_n_symbols * 1000 DIV n_tokens"))
      .withColumn("alpha_frac_milli", expr("_n_alpha * 1000 DIV n_tokens"))
      .withColumn("top_token_frac_milli", expr("_top_tok * 1000 DIV n_tokens"))
      .withColumn("top_bigram_frac_milli",
        expr("_top_big * 1000 DIV greatest(n_tokens - 1, 1)"))
      .drop("_t", "_sum_tok_len", "_n_symbols", "_n_alpha", "_top_tok", "_top_big")
    val rules = Seq(
      col("n_tokens") >= MinTokens && col("n_tokens") <= MaxTokens,
      col("mean_tok_len_milli") >= MinWordLenMilli && col("mean_tok_len_milli") <= MaxWordLenMilli,
      col("symbol_ratio_milli") <= MaxSymbolMilli,
      col("n_stop_distinct") >= MinStopDistinct,
      col("alpha_frac_milli") >= MinAlphaMilli,
      col("top_token_frac_milli") <= MaxTopTokenMilli,
      col("top_bigram_frac_milli") <= MaxTopBigramMilli)
    m.withColumn("n_rules_failed",
        rules.map(r => when(r, 0L).otherwise(1L)).reduce(_ + _))
      .withColumn("keep", col("n_rules_failed") === 0L)
  }

  /** The failed-rule counter as a SQL expression over the metric CTE. */
  private val ruleFailsSql: String = Seq(
      s"NOT (n_tokens >= $MinTokens AND n_tokens <= $MaxTokens)",
      s"NOT (mean_tok_len_milli >= $MinWordLenMilli AND mean_tok_len_milli <= $MaxWordLenMilli)",
      s"NOT (symbol_ratio_milli <= $MaxSymbolMilli)",
      s"NOT (n_stop_distinct >= $MinStopDistinct)",
      s"NOT (alpha_frac_milli >= $MinAlphaMilli)",
      s"NOT (top_token_frac_milli <= $MaxTopTokenMilli)",
      s"NOT (top_bigram_frac_milli <= $MaxTopBigramMilli)"
    ).map(r => s"CASE WHEN $r THEN 1 ELSE 0 END").mkString(" + ")

  /** Quality CTE chain (no WITH prefix) over relation `rel`, ending in
    * `m(doc_id, n_tokens, …metrics…)` — shared by the standalone oracle
    * (rel = documents) and the refinery oracle (rel = the twin+copy
    * corpus CTE). */
  private def qualityCtes(rel: String): String =
    s"""t AS (
       |  SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM $rel),
       |narrow AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, tk -> CAST(length(tk) AS BIGINT))), (a, x) -> a + x) AS sum_tok_len,
       |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_symbols,
       |    CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_distinct(list_filter(toks,
       |      tk -> list_contains(${Stopwords.mkString("['", "','", "']")}, tk)))) AS BIGINT) AS n_stop_distinct
       |  FROM t),
       |toptok AS (
       |  SELECT doc_id, max(c) AS top_tok FROM (
       |    SELECT doc_id, term, count(*) AS c
       |    FROM (SELECT doc_id, UNNEST(toks) AS term FROM t) GROUP BY 1, 2)
       |  GROUP BY 1),
       |topbig AS (
       |  SELECT doc_id, max(c) AS top_big FROM (
       |    SELECT doc_id, bg, count(*) AS c
       |    FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
       |          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS g(i))
       |    GROUP BY 1, 2)
       |  GROUP BY 1),
       |m AS (
       |  SELECT doc_id, n_tokens,
       |    sum_tok_len * 1000 // n_tokens AS mean_tok_len_milli,
       |    n_symbols * 1000 // n_tokens AS symbol_ratio_milli,
       |    n_alpha * 1000 // n_tokens AS alpha_frac_milli,
       |    n_stop_distinct,
       |    top_tok * 1000 // n_tokens AS top_token_frac_milli,
       |    coalesce(top_big, 0) * 1000 // greatest(n_tokens - 1, 1) AS top_bigram_frac_milli
       |  FROM narrow JOIN toptok USING (doc_id) LEFT JOIN topbig USING (doc_id))""".stripMargin

  val qualityFiltersSql: String = {
    val ruleFails = Seq(
      s"NOT (n_tokens >= $MinTokens AND n_tokens <= $MaxTokens)",
      s"NOT (mean_tok_len_milli >= $MinWordLenMilli AND mean_tok_len_milli <= $MaxWordLenMilli)",
      s"NOT (symbol_ratio_milli <= $MaxSymbolMilli)",
      s"NOT (n_stop_distinct >= $MinStopDistinct)",
      s"NOT (alpha_frac_milli >= $MinAlphaMilli)",
      s"NOT (top_token_frac_milli <= $MaxTopTokenMilli)",
      s"NOT (top_bigram_frac_milli <= $MaxTopBigramMilli)"
    ).map(r => s"CASE WHEN $r THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${qualityCtes("documents")}
       |SELECT doc_id, n_tokens, mean_tok_len_milli, symbol_ratio_milli,
       |  alpha_frac_milli, n_stop_distinct, top_token_frac_milli,
       |  top_bigram_frac_milli,
       |  CAST($ruleFails AS BIGINT) AS n_rules_failed,
       |  ($ruleFails) = 0 AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Per-language quality dashboard: the corpus-level rollup a pipeline
  // operator actually watches (is the German slice dying at the
  // stopword rule? is one language's drop rate drifting?) — per
  // (lang, verdict): doc and token totals plus the failed-rule mass.
  // Pure integer counts over the shared quality frame, one extra
  // doc-keyed join (co-partitioned with the metric joins) and a
  // (lang, keep) aggregation whose output is mixture-table sized.
  def qualityByLang(s: SparkSession, dir: String): DataFrame =
    qualityMetricsThrough(docs(s, dir)) // lang rides the narrow pass-through
      .groupBy(col("lang"), col("keep"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tok_total"),
        sum(col("n_rules_failed")).as("rules_failed_total"))
      .orderBy(col("lang"), col("keep"))

  val qualityByLangSql: String =
    s"""WITH ${qualityCtes("documents")},
       |v AS (SELECT doc_id, n_tokens,
       |        CAST($ruleFailsSql AS BIGINT) AS n_rules_failed
       |      FROM m)
       |SELECT d.lang, n_rules_failed = 0 AS keep, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_total,
       |  CAST(sum(n_rules_failed) AS BIGINT) AS rules_failed_total
       |FROM v JOIN documents d USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Train/test n-gram decontamination: flag every test-split document
  // that shares at least one 8-token n-gram with any train-split
  // document — the standard eval-contamination sweep run before
  // training. Corpus = documents ∪ perturbed twins (a twin and its
  // original usually land in different splits, so real contamination
  // exists to find). The n-gram key is a composed polynomial hash
  // (8 multiply-adds over per-token hashes), deduped per doc BEFORE the
  // explode; the join shuffles only distinct (doc, hash) pairs, and
  // n-gram hashes carried by more than StopGramCap train docs are
  // dropped as stop-grams (skew cap — mirrors the LSH MaxBucket rule).
  val NgramN = 8
  val StopGramCap = 64L

  /** (doc_id, split, h) — distinct composed n-gram hashes per doc. */
  private def ngramHashes(base: DataFrame): DataFrame = {
    val fold = (1 until NgramN).foldLeft("_th[i-1]") { (acc, j) =>
      s"(($acc) * 131 + _th[i-1+$j]) % $HashMod"
    }
    base
      .withColumn("_t", TextOps.tokens(col("text")))
      .withColumn("_th", transform(col("_t"), tok => PolyHash.polyHash(tok, 31, HashMod)))
      .select(col("doc_id"), col("split"), explode(expr(
        s"""CASE WHEN size(_t) >= $NgramN
           |THEN array_distinct(transform(sequence(1, size(_t) - ${NgramN - 1}), i -> $fold))
           |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)).as("h"))
  }

  private def coin = (col("doc_id") * Sampling.HashA + Sampling.HashB) % Sampling.Mod

  def contamination(s: SparkSession, dir: String): DataFrame = {
    val base = DedupOps.withTwins(docs(s, dir))
      .withColumn("split",
        when(coin < Sampling.Mod * 8 / 10, "train")
          .when(coin < Sampling.Mod * 9 / 10, "val")
          .otherwise("test"))
    val grams = ngramHashes(base)
    val train = grams.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("h"))
    val hot = train.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > StopGramCap).select(col("h"))
    val test = grams.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("h"))
    test
      .join(train.join(hot, Seq("h"), "left_anti"), Seq("h"))
      .groupBy(col("test_doc"), col("train_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy(col("test_doc"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(col("n_shared")).as("n_shared_ngrams"),
        min(col("train_doc")).as("first_train_doc"))
      .orderBy(col("test_doc"))
  }

  val contaminationSql: String = {
    val fold = (1 until NgramN).foldLeft("hs[i]") { (acc, j) =>
      s"(($acc) * 131 + hs[i+$j]) % $HashMod"
    }
    s"""WITH base0 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    array_to_string(list_slice(toks, 1, len(toks) - 1), ' ') AS text
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |        FROM documents)),
       |base AS (
       |  SELECT doc_id, text,
       |    CASE WHEN (doc_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod} < ${Sampling.Mod * 8 / 10} THEN 'train'
       |         WHEN (doc_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod} < ${Sampling.Mod * 9 / 10} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM base0),
       |tkh AS (
       |  SELECT doc_id, split,
       |    list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      tok -> ${polyHashSql("tok", 31, HashMod)}) AS hs
       |  FROM base),
       |grams AS (
       |  SELECT DISTINCT doc_id, split, $fold AS h
       |  FROM tkh, UNNEST(generate_series(1, len(hs) - ${NgramN - 1})) AS g(i)),
       |train AS (SELECT doc_id AS train_doc, h FROM grams WHERE split = 'train'),
       |hot AS (SELECT h FROM train GROUP BY h HAVING count(*) > $StopGramCap),
       |test AS (SELECT doc_id AS test_doc, h FROM grams WHERE split = 'test'),
       |pairs AS (
       |  SELECT test_doc, train_doc, count(*) AS n_shared
       |  FROM test JOIN (SELECT * FROM train ANTI JOIN hot USING (h)) USING (h)
       |  GROUP BY 1, 2)
       |SELECT test_doc, count(*) AS n_train_docs,
       |  CAST(sum(n_shared) AS BIGINT) AS n_shared_ngrams,
       |  min(train_doc) AS first_train_doc
       |FROM pairs GROUP BY 1 ORDER BY test_doc""".stripMargin
  }

  // ------------------------------------------------------------------
  // Bloom-filter approximate membership: build a 64 Kbit / 4-hash Bloom
  // filter over the train split's content fingerprints (one bit_or
  // aggregation → 1024 packed BIGINT words), broadcast it, and probe
  // with the test split plus exact copies of every 5th train doc (so
  // the probe set contains true members AND true non-members). Reports
  // the confusion counts — bloom_maybe × is_member — whose off-diagonal
  // (true, false) row IS the measured false-positive count. Bit
  // positions are affine maps of the same polynomial fingerprint the
  // rolling-hash op uses, so the whole filter is bit-exact in DuckDB.
  val BloomBits = 65536L // 63 usable bits per word (bit 63 never set: DuckDB errors on 1<<63)
  val BloomK = 4

  /** Affine position coefficients, shared with the oracle SQL. */
  val bloomAB: IndexedSeq[(Long, Long)] = (0 until BloomK).map { j =>
    val a = Math.floorMod(SimilarityOps.mix(0x7a7a7a7aL + j), HashMod - 1) + 1
    val b = Math.floorMod(SimilarityOps.mix(0x8b8b8b8bL + j), HashMod)
    (a, b)
  }

  def bloomProbe(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val fp = PolyHash.polyHash(col("text"), 31, HashMod)
    val split = when(coin < Sampling.Mod * 8 / 10, "train")
      .when(coin < Sampling.Mod * 9 / 10, "val")
      .otherwise("test")
    val labeled = d.select(col("doc_id"), col("text"), split.as("split"))
    val trainH = labeled.filter(col("split") === "train")
      .select(fp.as("H")).distinct()
    val posArr = array(bloomAB.map { case (a, b) =>
      pmod(lit(a) * col("H") + lit(b), lit(BloomBits))
    }: _*)
    val bloom = trainH
      .select(explode(posArr).as("pos"))
      .select(expr("pos DIV 63").as("w"), expr("CAST(pos % 63 AS INT)").as("b"))
      .groupBy(col("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("bits"))
    // Probes: the test split (expected non-members) + exact copies of
    // every 5th train doc (guaranteed members), ids offset by 2e6.
    val probes = labeled.filter(col("split") === "test")
      .select(col("doc_id").as("probe_id"), col("text"))
      .unionByName(labeled
        .filter(col("split") === "train" && pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 2000000L).as("probe_id"), col("text")))
      .select(col("probe_id"), fp.as("H"))
    val checked = probes
      .select(col("probe_id"), col("H"), explode(posArr).as("pos"))
      .select(col("probe_id"), col("H"),
        expr("pos DIV 63").as("w"), expr("CAST(pos % 63 AS INT)").as("b"))
      .join(broadcast(bloom), Seq("w"), "left")
      .withColumn("hit", coalesce(expr("(bits >> b) & 1 = 1"), lit(false)))
      .groupBy(col("probe_id"), col("H"))
      .agg((sum(when(col("hit"), 1L).otherwise(0L)) === lit(BloomK.toLong)).as("bloom_maybe"))
    checked
      .join(trainH.withColumn("_m", lit(true)), Seq("H"), "left")
      .withColumn("is_member", coalesce(col("_m"), lit(false)))
      .groupBy(col("bloom_maybe"), col("is_member"))
      .agg(count(lit(1)).as("n_probes"),
        min(col("probe_id")).as("min_probe"), max(col("probe_id")).as("max_probe"))
      .orderBy(col("bloom_maybe"), col("is_member"))
  }

  val bloomProbeSql: String = {
    val posSelects = bloomAB.map { case (a, b) => s"($a * H + $b) % $BloomBits" }
      .mkString("[", ", ", "]")
    s"""WITH labeled AS (
       |  SELECT doc_id, text,
       |    CASE WHEN (doc_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod} < ${Sampling.Mod * 8 / 10} THEN 'train'
       |         WHEN (doc_id * ${Sampling.HashA} + ${Sampling.HashB}) % ${Sampling.Mod} < ${Sampling.Mod * 9 / 10} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |trainh AS (SELECT DISTINCT ${polyHashSql("text", 31, HashMod)} AS H
       |           FROM labeled WHERE split = 'train'),
       |bloom AS (
       |  SELECT pos // 63 AS w, bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
       |  FROM (SELECT UNNEST($posSelects) AS pos FROM trainh)
       |  GROUP BY 1),
       |probes AS (
       |  SELECT doc_id AS probe_id, ${polyHashSql("text", 31, HashMod)} AS H
       |  FROM labeled WHERE split = 'test'
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS probe_id, ${polyHashSql("text", 31, HashMod)} AS H
       |  FROM labeled WHERE split = 'train' AND doc_id % 5 = 0),
       |checked AS (
       |  SELECT probe_id, H,
       |    sum(CASE WHEN coalesce((bits >> b) & 1 = 1, FALSE) THEN 1 ELSE 0 END) = $BloomK AS bloom_maybe
       |  FROM (
       |    SELECT probe_id, H, pos // 63 AS w, CAST(pos % 63 AS INT) AS b
       |    FROM probes, UNNEST($posSelects) AS u(pos))
       |  LEFT JOIN bloom USING (w)
       |  GROUP BY 1, 2)
       |SELECT bloom_maybe, H IN (SELECT H FROM trainh) AS is_member,
       |  count(*) AS n_probes, min(probe_id) AS min_probe, max(probe_id) AS max_probe
       |FROM checked
       |GROUP BY 1, 2 ORDER BY bloom_maybe, is_member""".stripMargin
  }

  // ------------------------------------------------------------------
  // Duplicated-passage fraction: per document, the share of its distinct
  // 8-token n-grams that also occur in at least one OTHER document —
  // the Gopher-style "duplicate content" metric that catches boilerplate
  // and near-copies exact dedup misses (a doc can be 40% template and
  // 60% unique). Corpus = documents ∪ twins so duplicated passages
  // exist. Shape: distinct (doc, gram-hash) once, gram doc-frequency by
  // one map-side-combined count, join back on the hash, per-doc rollup —
  // each doc rejoins each of its own grams exactly once, so a
  // corpus-wide boilerplate gram costs O(docs holding it), never O(n²).
  def passageOverlap(s: SparkSession, dir: String): DataFrame = {
    val base = DedupOps.withTwins(docs(s, dir)).withColumn("split", lit(""))
    val grams = ngramHashes(base).select(col("doc_id"), col("h"))
      .localCheckpoint() // one shingling pass feeds both the df count and the rollup
    val df = grams.groupBy(col("h")).agg(count(lit(1)).as("gram_df"))
    grams
      .join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gram_df") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac_milli", expr("n_dup_grams * 1000 DIV n_grams"))
      .orderBy(col("doc_id"))
  }

  val passageOverlapSql: String = {
    val fold = (1 until NgramN).foldLeft("hs[i]") { (acc, j) =>
      s"(($acc) * 131 + hs[i+$j]) % $HashMod"
    }
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    array_to_string(list_slice(toks, 1, len(toks) - 1), ' ') AS text
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |        FROM documents)),
       |tkh AS (
       |  SELECT doc_id,
       |    list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      tok -> ${polyHashSql("tok", 31, HashMod)}) AS hs
       |  FROM base),
       |grams AS (
       |  SELECT DISTINCT doc_id, $fold AS h
       |  FROM tkh, UNNEST(generate_series(1, len(hs) - ${NgramN - 1})) AS g(i)),
       |gdf AS (SELECT h, count(*) AS gram_df FROM grams GROUP BY 1)
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(SUM(CASE WHEN gram_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       |  CAST(SUM(CASE WHEN gram_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000
       |    // count(*) AS dup_frac_milli
       |FROM grams JOIN gdf USING (h)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // The refinery: the END-TO-END corpus pipeline as one audited funnel
  // row — raw corpus → quality cascade → exact dedup → split →
  // test-set decontamination → sequence-packing budget. This is the
  // composition a training-data user actually runs; each stage is the
  // operator verified standalone above, and the one-row audit pins the
  // funnel counts cross-engine (the DuckDB oracle re-runs the ENTIRE
  // pipeline). Corpus = documents ∪ perturbed twins ∪ exact copies of
  // every 10th doc (ids +3e6), so every stage has real work: copies die
  // in dedup, straddling twins trigger decontamination.
  //
  // Decontamination drops the contaminated TEST docs (the held-out set
  // is ours to shrink, keeping eval independent of train); when the
  // eval set is a FIXED external benchmark, the same gram join drops
  // the matching TRAIN docs instead — flip which side is filtered.
  def refinery(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val base = DedupOps.withTwins(d)
      .unionByName(d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      .localCheckpoint() // one derivation feeds quality, dedup, and grams
    // the verdict frame is tiny (3 columns) and feeds the kept-join AND
    // two funnel counters — checkpoint it so the 3-shuffle quality
    // pipeline runs ONCE, not once per consumer
    val qual = qualityMetricsFrom(base)
      .select(col("doc_id"), col("n_tokens"), col("keep"))
      .localCheckpoint()
    val kept = base.join(qual.filter(col("keep"))
      .select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
    val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
    val unique = kept
      .withColumn("_fp", md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_fp")
    val splitDocs = unique.withColumn("split",
      when(coin < Sampling.Mod * 8 / 10, "train")
        .when(coin < Sampling.Mod * 9 / 10, "val")
        .otherwise("test"))
      .localCheckpoint() // grams + three count consumers
    val grams = ngramHashes(splitDocs)
    val train = grams.filter(col("split") === "train")
      .select(col("doc_id").as("_td"), col("h"))
    val hot = train.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > StopGramCap).select(col("h"))
    val contaminated = grams.filter(col("split") === "test")
      .join(train.join(hot, Seq("h"), "left_anti"), Seq("h"))
      .select(col("doc_id")).distinct()
    val finalDocs = splitDocs.join(contaminated, Seq("doc_id"), "left_anti")
    val trainAgg = finalDocs.filter(col("split") === "train")
      .agg(count(lit(1)).as("n_train_docs"),
        sum(col("n_tokens")).as("train_tokens"))
      .select(col("n_train_docs"), col("train_tokens"),
        expr(s"(train_tokens + ${Sampling.ContextLen} - 1) DIV ${Sampling.ContextLen}")
          .as("train_bins"))
    // funnel counters read the CHECKPOINTED frames: kept-count ==
    // keep-verdict count (the base join is 1:1 on doc_id) and
    // unique-count == splitDocs-count (split adds a column, drops no
    // row) — so neither the quality pipeline nor the dedup window
    // re-runs per counter
    base.agg(count(lit(1)).as("n_raw"))
      .crossJoin(qual.filter(col("keep")).agg(count(lit(1)).as("n_quality_kept")))
      .crossJoin(splitDocs.agg(count(lit(1)).as("n_unique_docs")))
      .crossJoin(contaminated.agg(count(lit(1)).as("n_test_contaminated")))
      .crossJoin(finalDocs.agg(count(lit(1)).as("n_final_docs")))
      .crossJoin(trainAgg)
  }

  val refinerySql: String = {
    val (a, b, m) = (Sampling.HashA, Sampling.HashB, Sampling.Mod)
    val fold = (1 until NgramN).foldLeft("hs[i]") { (acc, j) =>
      s"(($acc) * 131 + hs[i+$j]) % $HashMod"
    }
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    array_to_string(list_slice(toks, 1, len(toks) - 1), ' ') AS text
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |        FROM documents)
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |${qualityCtes("base")},
       |kept AS (
       |  SELECT b.doc_id, b.text, m.n_tokens
       |  FROM base b JOIN m USING (doc_id) WHERE ($ruleFailsSql) = 0),
       |uniq AS (
       |  SELECT doc_id, text, n_tokens FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) AS rn
       |    FROM kept) WHERE rn = 1),
       |sdoc AS (
       |  SELECT *, CASE WHEN (doc_id * $a + $b) % $m < ${m * 8 / 10} THEN 'train'
       |                 WHEN (doc_id * $a + $b) % $m < ${m * 9 / 10} THEN 'val'
       |                 ELSE 'test' END AS split
       |  FROM uniq),
       |tkh2 AS (
       |  SELECT doc_id, split,
       |    list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      tok -> ${polyHashSql("tok", 31, HashMod)}) AS hs
       |  FROM sdoc),
       |grams2 AS (
       |  SELECT DISTINCT doc_id, split, $fold AS h
       |  FROM tkh2, UNNEST(generate_series(1, len(hs) - ${NgramN - 1})) AS g(i)),
       |train2 AS (SELECT doc_id AS td, h FROM grams2 WHERE split = 'train'),
       |hot2 AS (SELECT h FROM train2 GROUP BY h HAVING count(*) > $StopGramCap),
       |ctest AS (
       |  SELECT DISTINCT g.doc_id
       |  FROM grams2 g JOIN (SELECT * FROM train2 ANTI JOIN hot2 USING (h)) USING (h)
       |  WHERE g.split = 'test'),
       |final AS (SELECT * FROM sdoc ANTI JOIN ctest USING (doc_id))
       |SELECT
       |  (SELECT count(*) FROM base) AS n_raw,
       |  (SELECT count(*) FROM kept) AS n_quality_kept,
       |  (SELECT count(*) FROM uniq) AS n_unique_docs,
       |  (SELECT count(*) FROM ctest) AS n_test_contaminated,
       |  (SELECT count(*) FROM final) AS n_final_docs,
       |  (SELECT count(*) FROM final WHERE split = 'train') AS n_train_docs,
       |  (SELECT CAST(sum(n_tokens) AS BIGINT) FROM final WHERE split = 'train') AS train_tokens,
       |  (SELECT (CAST(sum(n_tokens) AS BIGINT) + ${Sampling.ContextLen} - 1) // ${Sampling.ContextLen}
       |   FROM final WHERE split = 'train') AS train_bins""".stripMargin
  }

  // ------------------------------------------------------------------
  // Domain mixture audit + blocklist — the URL/domain-level pass of a
  // C4/RefinedWeb-style crawl pipeline, keyed here on the corpus
  // `source` column (the fixture's domain analog): per-domain doc and
  // token totals, each domain's EXACT micro-share (ppm) of the corpus
  // token budget via integer division, and a blocklisted verdict from
  // a literal blocklist. Shape at 100 TB: one narrow token-count pass,
  // one hash aggregation on the domain key (map-side combined, domain
  // cardinality ≪ corpus), then the 1-row corpus total is BROADCAST
  // back across the per-domain rows — the corpus is never re-shuffled
  // and the blocklist is a plan-time literal, so this stays a single
  // shuffle regardless of domain count.
  val DomainBlocklist: Seq[String] = Seq("src04-banned-placeholder", "src13", "src4")

  def domainMix(s: SparkSession, dir: String): DataFrame = {
    val perDomain = docs(s, dir)
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val total = perDomain.agg(sum(col("n_tokens")).as("_total"))
    perDomain.crossJoin(broadcast(total))
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        expr("n_tokens * 1000000 DIV _total").as("ppm_share"),
        col("source").isin(DomainBlocklist: _*).as("blocklisted"))
      .orderBy(col("source"))
  }

  val domainMixSql: String = {
    val banned = DomainBlocklist.map(d => s"'$d'").mkString(", ")
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per)
       |SELECT source, n_docs, n_tokens,
       |  n_tokens * 1000000 // total AS ppm_share,
       |  source IN ($banned) AS blocklisted
       |FROM per, tot ORDER BY source""".stripMargin
  }


  // ------------------------------------------------------------------
  // Gopher repetition rules (Rae et al. 2021, appendix A1.1): documents
  // dominated by repeated phrases are boilerplate/templating, not prose.
  // Signals, in exact milli-units over token characters:
  //   top_{3,4}gram_frac:  character MASS of the heaviest-repeated
  //                        word n-gram (occurrences x n-gram chars)
  //                        over total token chars — deterministic
  //                        argmax-by-mass, which is the quantity the
  //                        threshold actually guards (ties in raw
  //                        occurrence count are broken by mass, not by
  //                        an engine-dependent gram choice);
  //   dup_5gram_frac:      chars at token POSITIONS covered by at
  //                        least one 5-gram that occurs 2+ times
  //                        (position-coverage union, each position
  //                        counted once).
  // Thresholds follow the paper: 0.18 / 0.16 / 0.15. The line/paragraph
  // duplicate rules are omitted: this corpus is single-line by
  // construction (no newlines in documents.text), so they are
  // degenerate here; the n-gram family is the load-bearing part.
  val MaxTop3GramMilli = 180L
  val MaxTop4GramMilli = 160L
  val MaxDup5GramMilli = 150L

  def repetitionRules(s: SparkSession, dir: String): DataFrame =
    repetitionMetricsFrom(docs(s, dir)).orderBy(col("doc_id"))

  /** Repetition metrics + verdict over any (doc_id, text) corpus.
    * 100 TB shape: per-doc n-gram aggregates are the same explode →
    * map-side-combined groupBy(doc_id, gram) as tf-idf; every later
    * join keys on doc_id, so the post-aggregate stages co-partition.
    * No corpus-wide state — repetition is a per-document property. */
  def repetitionMetricsFrom(d: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val base = d.select(col("doc_id"), toks.as("_t"))
    val totals = base.select(
      col("doc_id"),
      size(col("_t")).cast("long").as("n_tokens"),
      expr("aggregate(transform(_t, t -> CAST(length(t) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)")
        .as("total_chars"))
    // heaviest-repeated n-gram mass; docs with < n tokens have none
    // (LEFT join + coalesce 0 below), mirroring the trigram shingle
    // guard — unguarded _t[i] is out of bounds under ANSI mode
    def topMass(n: Int): DataFrame = {
      val gram = (0 until n).map(k => s"_t[i-1+$k]").mkString("concat_ws(' ', ", ", ", ")")
      val gc = (0 until n).map(k => s"CAST(length(_t[i-1+$k]) AS BIGINT)").mkString(" + ")
      base.filter(size(col("_t")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(_t) - ${n - 1}), i -> struct($gram AS g, ($gc) AS gc))")).as("p"))
        .groupBy(col("doc_id"), col("p.g")).agg(count(lit(1)).as("c"), max(col("p.gc")).as("gc"))
        .groupBy(col("doc_id")).agg(max(col("c") * col("gc")).as(s"top${n}_mass"))
    }
    // duplicated-5-gram position coverage: union of covered positions,
    // then one co-partitioned join back to per-position token lengths
    val g5 = base.filter(size(col("_t")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_t) - 4), i -> struct(i AS pos, " +
          "concat_ws(' ', _t[i-1], _t[i], _t[i+1], _t[i+2], _t[i+3]) AS g))")).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.g").as("g"))
    val dupKeys = g5.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("doc_id"), col("g"))
    val covered = g5.join(dupKeys, Seq("doc_id", "g"))
      .select(col("doc_id"), explode(expr("sequence(pos, pos + 4)")).as("cpos"))
      .distinct()
    val tokLens = base
      .select(col("doc_id"), posexplode(col("_t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("cpos"),
        length(col("tok")).cast("long").as("tok_len"))
    val dupChars = covered.join(tokLens, Seq("doc_id", "cpos"))
      .groupBy(col("doc_id")).agg(sum(col("tok_len")).as("dup5_chars"))
    val m = totals
      .join(topMass(3), Seq("doc_id"), "left")
      .join(topMass(4), Seq("doc_id"), "left")
      .join(dupChars, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        expr("coalesce(top3_mass, 0L) * 1000 DIV greatest(total_chars, 1)")
          .as("top_3gram_frac_milli"),
        expr("coalesce(top4_mass, 0L) * 1000 DIV greatest(total_chars, 1)")
          .as("top_4gram_frac_milli"),
        expr("coalesce(dup5_chars, 0L) * 1000 DIV greatest(total_chars, 1)")
          .as("dup_5gram_frac_milli"))
    val rules = Seq(
      col("top_3gram_frac_milli") <= MaxTop3GramMilli,
      col("top_4gram_frac_milli") <= MaxTop4GramMilli,
      col("dup_5gram_frac_milli") <= MaxDup5GramMilli)
    m.select(col("doc_id"), col("n_tokens"),
      col("top_3gram_frac_milli"), col("top_4gram_frac_milli"), col("dup_5gram_frac_milli"),
      rules.map(r => when(r, 0L).otherwise(1L)).reduce(_ + _).as("n_rules_failed"),
      rules.reduce(_ && _).as("keep"))
  }

  val repetitionRulesSql: String = {
    def topMassCte(n: Int): String = {
      val gram = (0 until n).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
      val gc = (0 until n).map(k => s"length(toks[i+$k])").mkString(" + ")
      s"""rep$n AS (
         |  SELECT doc_id, max(c * gc) AS top${n}_mass FROM (
         |    SELECT doc_id, g, count(*) AS c, max(gc) AS gc FROM (
         |      SELECT doc_id, $gram AS g, CAST($gc AS BIGINT) AS gc
         |      FROM t, UNNEST(generate_series(1, len(toks) - ${n - 1})) AS a(i))
         |    GROUP BY 1, 2) GROUP BY 1)"""
    }
    val ruleFails = Seq(
      s"NOT (top_3gram_frac_milli <= $MaxTop3GramMilli)",
      s"NOT (top_4gram_frac_milli <= $MaxTop4GramMilli)",
      s"NOT (dup_5gram_frac_milli <= $MaxDup5GramMilli)"
    ).map(r => s"CASE WHEN $r THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |totals AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, tk -> CAST(length(tk) AS BIGINT))), (a, x) -> a + x) AS total_chars
       |  FROM t),
       |${topMassCte(3).stripMargin},
       |${topMassCte(4).stripMargin},
       |g5 AS (
       |  SELECT doc_id, i AS pos,
       |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] AS g
       |  FROM t, UNNEST(generate_series(1, len(toks) - 4)) AS a(i)),
       |dupg AS (SELECT doc_id, g FROM g5 GROUP BY 1, 2 HAVING count(*) >= 2),
       |cov AS (SELECT DISTINCT doc_id, pos + k AS cpos
       |        FROM g5 JOIN dupg USING (doc_id, g), UNNEST(generate_series(0, 4)) AS b(k)),
       |dupchars AS (
       |  SELECT doc_id, CAST(sum(length(tok)) AS BIGINT) AS dup5_chars FROM (
       |    SELECT cov.doc_id, cov.cpos, t.toks[cov.cpos] AS tok
       |    FROM cov JOIN t ON t.doc_id = cov.doc_id)
       |  GROUP BY 1),
       |m AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(top3_mass, 0) * 1000 // greatest(total_chars, 1) AS top_3gram_frac_milli,
       |    coalesce(top4_mass, 0) * 1000 // greatest(total_chars, 1) AS top_4gram_frac_milli,
       |    coalesce(dup5_chars, 0) * 1000 // greatest(total_chars, 1) AS dup_5gram_frac_milli
       |  FROM totals LEFT JOIN rep3 USING (doc_id) LEFT JOIN rep4 USING (doc_id)
       |    LEFT JOIN dupchars USING (doc_id))
       |SELECT doc_id, n_tokens,
       |  CAST(top_3gram_frac_milli AS BIGINT) AS top_3gram_frac_milli,
       |  CAST(top_4gram_frac_milli AS BIGINT) AS top_4gram_frac_milli,
       |  CAST(dup_5gram_frac_milli AS BIGINT) AS dup_5gram_frac_milli,
       |  CAST($ruleFails AS BIGINT) AS n_rules_failed,
       |  ($ruleFails) = 0 AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Trained quality classifier (the fastText-classifier step of a
  // pretraining pipeline, distilled): a linear model over the SAME
  // seven quality metrics the rule cascade thresholds, trained by
  // full-batch least-squares gradient descent to imitate the cascade's
  // keep/drop verdict. This is the classic rules → learned-classifier
  // distillation (C4's heuristics became fastText quality scores);
  // unlike the cascade it emits a graded score_milli, not a verdict.
  //
  // Everything is exact integer arithmetic so training REPLAYS
  // bit-for-bit in the DuckDB oracle: features are min-max normalized
  // to [0, 1000] milli (corpus min/max from one aggregate), weights
  // live in milli, the logit is a sign-aware integer division (Spark
  // DIV truncates toward zero, DuckDB // floors — divide magnitudes
  // and negate, the sample_temperature idiom), and each GD step is
  //   w_j ← w_j − idiv(LrMilli · Σ_i err_i·x_ij, 10⁶·n).
  //
  // Shape at 100 TB: one metrics pass (the quality cascade's own
  // shuffles), then each GD iteration is ONE map-side-combined
  // aggregate producing 8 numbers — the driver state is the 8-weight
  // vector, nothing data-sized (the same bounded-driver-state pattern
  // as sampled-Lloyd k-means). Full-batch GD costs Iters corpus
  // passes; at real scale you'd mini-batch the same update rule, the
  // aggregate shape is unchanged.
  val ClfIters = 16
  val ClfLrMilli = 200L
  val ClfFeatures: Seq[String] = Seq("n_tokens", "mean_tok_len_milli",
    "symbol_ratio_milli", "alpha_frac_milli", "n_stop_distinct",
    "top_token_frac_milli", "top_bigram_frac_milli")

  /** Sign-aware integer division as a Column: truncate-toward-zero on
    * BOTH engines. Implemented as double divide + long cast on
    * magnitudes, exact here because every operand stays far below 2^53
    * (|z_raw| ≤ Σ|w|·1000 ≲ 10⁸) and a non-divisible integer quotient
    * sits ≥ 1/|b| away from the next integer — orders of magnitude
    * beyond the division's rounding error. DuckDB's `//` floors, hence
    * the negate-magnitudes mirror (the sample_temperature idiom). */
  private def idiv(a: Column, b: Column): Column =
    when(a >= 0, a.cast("long").divide(b).cast("long"))
      .otherwise(-((-a).cast("long").divide(b).cast("long")))

  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val m = qualityMetricsFrom(docs(s, dir))
    val mm = m.agg(
      ClfFeatures.flatMap(f =>
        Seq(min(col(f)).as(s"_lo_$f"), max(col(f)).as(s"_hi_$f"))).head,
      ClfFeatures.flatMap(f =>
        Seq(min(col(f)).as(s"_lo_$f"), max(col(f)).as(s"_hi_$f"))).tail: _*)
    val x = m.crossJoin(broadcast(mm))
      .select(
        col("doc_id") +:
          when(col("keep"), 1000L).otherwise(0L).as("y") +:
          ClfFeatures.zipWithIndex.map { case (f, j) =>
            ((col(f) - col(s"_lo_$f")) * 1000L /
              greatest(col(s"_hi_$f") - col(s"_lo_$f"), lit(1L))).cast("long").as(s"x${j + 1}")
          }: _*)
      .localCheckpoint() // every GD iteration and the final scoring reuse it
    var w = Array.fill(ClfFeatures.size + 1)(0L) // w(0) = bias (x0 = 1000)
    def zRaw: Column =
      (1 to ClfFeatures.size).map(j => lit(w(j)) * col(s"x$j"))
        .foldLeft(lit(w(0)) * lit(1000L): Column)(_ + _)
    val n = x.count()
    for (_ <- 1 to ClfIters) {
      val err = idiv(zRaw, lit(1000L)) - col("y")
      val gradCols = (0 to ClfFeatures.size).map { j =>
        val xj = if (j == 0) lit(1000L) else col(s"x$j")
        sum(err * xj).as(s"g$j")
      }
      val g = x.agg(gradCols.head, gradCols.tail: _*).collect()(0)
      w = w.indices.map { j =>
        val gRaw = g.getLong(j)
        val step = // idiv(LrMilli * gRaw, 1e6 * n), sign-aware, driver-side
          if (gRaw >= 0) ClfLrMilli * gRaw / (1000000L * n)
          else -(ClfLrMilli * -gRaw / (1000000L * n))
        w(j) - step
      }.toArray
    }
    x.select(col("doc_id"), idiv(zRaw, lit(1000L)).as("score_milli"),
        (idiv(zRaw, lit(1000L)) >= 500L).as("predicted"),
        (col("y") === 1000L).as("label"))
      .orderBy(col("doc_id"))
  }

  /** The classifier training loop's CTE chain + final per-doc SELECT as
    * separate pieces, so the ECE oracle below composes the SAME trained
    * model instead of duplicating the unroll. */
  private val clfParts: (String, String) = {
    val nf = ClfFeatures.size
    def idivSql(a: String, b: String): String =
      s"CASE WHEN ($a) >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END"
    val loHi = ClfFeatures.map(f => s"min($f) AS lo_$f, max($f) AS hi_$f").mkString(", ")
    val xCols = ClfFeatures.zipWithIndex.map { case (f, j) =>
      s"($f - lo_$f) * 1000 // greatest(hi_$f - lo_$f, 1) AS x${j + 1}"
    }.mkString(",\n    ")
    val unions = (1 to nf).map(j => s"SELECT doc_id, y, $j AS j, x$j AS xv FROM xw")
      .mkString("\n  UNION ALL ")
    def iter(t: Int): String = {
      val prev = if (t == 1) "w0" else s"w${t - 1}"
      s"""z$t AS MATERIALIZED (
         |  SELECT xl.doc_id, xl.y,
         |    ${idivSql("sum(w.w * xl.xv)", "1000")} AS z
         |  FROM xl JOIN $prev w USING (j) GROUP BY 1, 2),
         |g$t AS MATERIALIZED (
         |  SELECT xl.j, sum((z.z - z.y) * xl.xv) AS graw
         |  FROM z$t z JOIN xl USING (doc_id) GROUP BY 1),
         |w$t AS MATERIALIZED (
         |  SELECT w.j, w.w - ${idivSql(s"$ClfLrMilli * g.graw", "1000000 * nn.n")} AS w
         |  FROM $prev w JOIN g$t g USING (j), nn)""".stripMargin
    }
    val ctes =
      s"""${qualityCtes("documents")},
         |v AS (SELECT m.*, ($ruleFailsSql) = 0 AS keep FROM m),
         |mm AS (SELECT $loHi FROM v),
         |xw AS MATERIALIZED (
         |  SELECT doc_id, CASE WHEN keep THEN 1000 ELSE 0 END AS y,
         |    $xCols
         |  FROM v CROSS JOIN mm),
         |xl AS MATERIALIZED (
         |  SELECT doc_id, y, 0 AS j, 1000 AS xv FROM xw
         |  UNION ALL $unions),
         |nn AS (SELECT count(*) AS n FROM xw),
         |w0 AS (SELECT j, CAST(0 AS BIGINT) AS w
         |       FROM UNNEST(generate_series(0, $nf)) AS u(j)),
         |${(1 to ClfIters).map(iter).mkString(",\n")}""".stripMargin
    val select =
      s"""SELECT xl.doc_id,
         |  CAST(${idivSql("sum(w.w * xl.xv)", "1000")} AS BIGINT) AS score_milli,
         |  ${idivSql("sum(w.w * xl.xv)", "1000")} >= 500 AS predicted,
         |  max(xl.y) = 1000 AS label
         |FROM xl JOIN w$ClfIters w USING (j)
         |GROUP BY 1""".stripMargin
    (ctes, select)
  }

  /** Oracle: the identical training loop unrolled as materialized CTEs
    * (the kcore/kmeans pattern) over a LONG-form feature table; j = 0
    * is the bias with x = 1000. */
  val qualityClassifierSql: String =
    s"""WITH ${clfParts._1}
       |${clfParts._2} ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Calibration readout for the trained classifier (Expected Calibration
  // Error, Naeini et al. 2015 / Guo et al. 2017): a score used as a
  // KEEP-PROBABILITY threshold in a curation pipeline is only as good as
  // its calibration — a model that says "0.9" should be right 90% of the
  // time. Scores (clamped to [0, 1000] milli) are binned into 10
  // equal-width confidence bins; each bin reports its mean stated
  // confidence vs its observed keep rate, and the -1 summary row carries
  // the n-weighted ECE (the SRM guard's tiling idiom). All integer
  // arithmetic (nonnegative DIV), so the oracle replays training AND
  // calibration bit-for-bit. Shape at 100 TB: the classifier's own
  // passes plus ONE 10-row aggregate — nothing new moves.
  val EceBins = 10L

  def classifierEce(s: SparkSession, dir: String): DataFrame = {
    val sc = qualityClassifier(s, dir)
      .select(expr("least(greatest(score_milli, 0), 1000)").as("conf"), col("label"))
    val bins = sc
      .groupBy(expr(s"least(conf DIV 100, ${EceBins - 1})").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(conf) DIV count(1)").as("conf_milli"),
        expr("1000 * sum(CASE WHEN label THEN 1 ELSE 0 END) DIV count(1)").as("acc_milli"))
      .withColumn("gap_milli", abs(col("conf_milli") - col("acc_milli")))
      .localCheckpoint() // 10-row frame feeds both the rows and the summary
    val summary = bins.agg(
      lit(-1L).as("bin"), sum(col("n_docs")).as("n_docs"),
      lit(-1L).as("conf_milli"), lit(-1L).as("acc_milli"),
      expr("sum(n_docs * gap_milli) DIV sum(n_docs)").as("gap_milli"))
    bins.select(col("bin"), col("n_docs"), col("conf_milli"), col("acc_milli"), col("gap_milli"))
      .unionByName(summary)
      .orderBy(col("bin"))
  }

  // ------------------------------------------------------------------
  // Per-domain perplexity fence (the CCNet/Wikipedia-LM filtering
  // recipe, composed from two existing exact primitives): each doc's
  // mean bigram surprisal q = (−Σ logp_milli) DIV n_bigrams (integer,
  // nonnegative), each LANGUAGE gets its own p90 fence from the exact
  // value-histogram quantile (RobustStats.histQuantile — per-language
  // thresholds because surprisal scales differ across languages, the
  // reason CCNet buckets per language), and the most-surprising decile
  // is flagged. Shape at 100 TB: the perplexity pipeline's own passes +
  // one histogram-sized quantile window + one broadcast fence join —
  // nothing new moves at corpus scale.
  val PplFenceNum = 9L
  val PplFenceDen = 10L

  def pplFence(s: SparkSession, dir: String): DataFrame = {
    val scored = Lineage.truncate(TextOps.perplexityPerDoc(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
      // sum_logp_milli <= 0 by construction (add-one probs <= 1), so the
      // magnitude division stays in nonnegative DIV territory
      .withColumn("q_milli", expr("(-sum_logp_milli) DIV n_bigrams")))
    val fence = RobustStats.histQuantile(scored, "lang", "q_milli",
        PplFenceNum, PplFenceDen)
      .withColumnRenamed("med", "p90_q_milli")
    scored.join(broadcast(fence), Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("p90_q_milli")).as("p90_q_milli"), // constant within group
        sum(when(col("q_milli") > col("p90_q_milli"), 1L).otherwise(0L))
          .as("n_flagged"),
        max(col("q_milli")).as("max_q_milli"))
      .orderBy(col("lang"))
  }

  val pplFenceSql: String =
    s"""WITH ${graft.ops.TextOps.lmMapCtesSql()},
       |docbi AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
       |  FROM mt, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)),
       |bi AS (SELECT w1, w2, count(*) AS c12 FROM docbi GROUP BY 1, 2),
       |uni AS (SELECT w1, count(*) AS c1 FROM (SELECT UNNEST(toks) AS w1 FROM mt) GROUP BY 1),
       |vocab AS (SELECT count(DISTINCT w) AS v FROM (SELECT UNNEST(toks) AS w FROM mt)),
       |pd AS (
       |  SELECT doc_id, count(*) AS nb,
       |    CAST(sum(CAST(round(1000 * ln((c12 + 1) / (c1 + v))) AS BIGINT)) AS BIGINT) AS slp
       |  FROM docbi JOIN bi USING (w1, w2) JOIN uni USING (w1), vocab
       |  GROUP BY doc_id),
       |sc AS (
       |  SELECT d.lang, (-pd.slp) // pd.nb AS q
       |  FROM pd JOIN documents d USING (doc_id)),
       |hist AS (SELECT lang, q, count(*) AS c FROM sc GROUP BY 1, 2),
       |cum AS (
       |  SELECT lang, q,
       |    sum(c) OVER (PARTITION BY lang ORDER BY q) AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS n
       |  FROM hist),
       |f AS (SELECT lang, min(q) AS p90 FROM cum
       |      WHERE cum >= (n * $PplFenceNum + $PplFenceDen - 1) // $PplFenceDen GROUP BY 1)
       |SELECT sc.lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(max(f.p90) AS BIGINT) AS p90_q_milli,
       |  CAST(sum(CASE WHEN sc.q > f.p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  CAST(max(sc.q) AS BIGINT) AS max_q_milli
       |FROM sc JOIN f USING (lang)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val classifierEceSql: String =
    s"""WITH ${clfParts._1},
       |clf AS (${clfParts._2}),
       |sc AS (SELECT least(greatest(score_milli, 0), 1000) AS conf, label FROM clf),
       |b AS (
       |  SELECT least(conf // 100, ${EceBins - 1}) AS bin,
       |    count(*) AS n_docs,
       |    sum(conf) // count(*) AS conf_milli,
       |    1000 * sum(CASE WHEN label THEN 1 ELSE 0 END) // count(*) AS acc_milli
       |  FROM sc GROUP BY 1),
       |g AS (SELECT bin, n_docs, conf_milli, acc_milli,
       |        abs(conf_milli - acc_milli) AS gap_milli FROM b)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(conf_milli AS BIGINT) AS conf_milli,
       |  CAST(acc_milli AS BIGINT) AS acc_milli,
       |  CAST(gap_milli AS BIGINT) AS gap_milli
       |FROM g
       |UNION ALL
       |SELECT -1, CAST(sum(n_docs) AS BIGINT), -1, -1,
       |  CAST(sum(n_docs * gap_milli) // sum(n_docs) AS BIGINT)
       |FROM g
       |ORDER BY bin""".stripMargin

  // ------------------------------------------------------------------
  // Line-level boilerplate dedup (the CCNet / RefinedWeb pass): a line
  // that recurs across many documents of the SAME source (site headers,
  // nav menus, cookie banners) is boilerplate and is dropped from every
  // document; each doc is then rebuilt from its surviving lines. This
  // is a corpus REWRITE, not a metric — the output is the cleaned
  // document (here: its exact token count + content hash, so the
  // rewrite is byte-auditable cross-engine).
  //
  // The fixture corpus has no newlines, so a "line" is a fixed
  // LineTokens-token segment — the real implementation splits on '\n';
  // fixed segmentation additionally means only boundary-aligned
  // boilerplate is caught (a deliberate, documented simplification; the
  // injected header/promo lines below are aligned the way real site
  // chrome is line-aligned). Boilerplate is synthesized from the data
  // itself: every doc gets a per-source 10-token header, every third
  // doc a per-source promo line, so line document-frequency within a
  // source is the discovering signal, exactly as in CCNet.
  //
  // Shape: one narrow segmentation pass → distinct (source, line-hash,
  // doc) → line df by map-side-combined count keyed on (source, hash) —
  // vocabulary-sized, never corpus-sized — joined back on the same key,
  // then one per-doc rollup that rebuilds the kept text in line order.
  // No pair joins anywhere; a corpus-wide boilerplate line costs
  // O(docs containing it). At 100 TB the (source, hash) df table is the
  // only global state and sources partition it naturally.
  val LineTokens = 10
  val MinLineDf = 3L

  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val header = concat_ws(" ", lit("site"), col("source"),
      lit("navigation menu copyright"), col("source"), lit("all rights reserved contact"))
    val promo = concat_ws(" ", lit("subscribe to"), col("source"),
      lit("newsletter for weekly updates and free offers"))
    val injected = d.withColumn("text",
      when(col("doc_id") % 3 === 0, concat_ws(" ", header, promo, col("text")))
        .otherwise(concat_ws(" ", header, col("text"))))
    val lines = injected
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("_t"))
      // zero-token guard: on an empty doc Spark's (size-1) DIV 10
      // truncates -1 to 0 and would emit one empty segment where the
      // oracle's floor division emits none — unreachable behind the
      // injected header (>= 10 tokens), but the filter keeps the
      // operator oracle-exact on raw corpora without it
      .filter(size(col("_t")) >= 1)
      .select(col("doc_id"), col("source"), posexplode(expr(
        s"transform(sequence(0, (size(_t) - 1) DIV $LineTokens), " +
          s"i -> concat_ws(' ', slice(_t, i * $LineTokens + 1, $LineTokens)))"))
        .as(Seq("line_idx", "line")))
      .withColumn("h", graft.functions.PolyHash.polyHash(col("line"), 31, HashMod))
      .localCheckpoint() // one segmentation pass feeds both the df count and the rollup
    val lineDf = lines.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("line_df"))
    lines.join(lineDf, Seq("source", "h"))
      .withColumn("kept", col("line_df") < MinLineDf)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
        coalesce(sum(when(col("kept"),
          size(split(col("line"), "\\s+")).cast("long"))), lit(0L)).as("kept_tokens"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN kept THEN struct(line_idx, line) END)), p -> p.line)"))
          .as("_cleaned"))
      .withColumn("cleaned_hash",
        graft.functions.PolyHash.polyHash(col("_cleaned"), 31, HashMod))
      .drop("_cleaned")
      .orderBy(col("doc_id"))
  }

  val lineDedupSql: String =
    s"""WITH injected AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 3 = 0 THEN hdr || ' ' || promo || ' ' || text
       |         ELSE hdr || ' ' || text END AS text
       |  FROM (SELECT doc_id, source, text,
       |          'site ' || source || ' navigation menu copyright ' || source ||
       |            ' all rights reserved contact' AS hdr,
       |          'subscribe to ' || source ||
       |            ' newsletter for weekly updates and free offers' AS promo
       |        FROM documents)),
       |lines AS (
       |  SELECT doc_id, source, i AS line_idx,
       |    array_to_string(list_slice(t, i * $LineTokens + 1, i * $LineTokens + $LineTokens), ' ') AS line
       |  FROM (SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |        FROM injected),
       |    UNNEST(generate_series(0, (len(t) - 1) // $LineTokens)) AS g(i)),
       |keyed AS (SELECT doc_id, source, line_idx, line,
       |            ${polyHashSql("line", 31, HashMod)} AS h FROM lines),
       |ldf AS (SELECT source, h, count(DISTINCT doc_id) AS line_df
       |        FROM keyed GROUP BY 1, 2),
       |marked AS (
       |  SELECT k.doc_id, k.line_idx, k.line, l.line_df < $MinLineDf AS kept
       |  FROM keyed k JOIN ldf l ON l.source = k.source AND l.h = k.h)
       |SELECT doc_id, count(*) AS n_lines,
       |  CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(coalesce(sum(CASE WHEN kept
       |    THEN len(regexp_split_to_array(line, '\\s+')) END), 0) AS BIGINT) AS kept_tokens,
       |  ${polyHashSql(
             s"coalesce(string_agg(line, ' ' ORDER BY line_idx) FILTER (WHERE kept), '')",
             31, HashMod)} AS cleaned_hash
       |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Jensen-Shannon domain divergence — each source's word distribution
  // against the REST of the corpus: the domain-shift audit run before
  // mixing sources into a training blend (a source whose JS is near
  // ln 2 ≈ 693 milli-nats contributes vocabulary the rest of the blend
  // lacks; near 0 it is redundant). JS is the symmetric, bounded
  // alternative to KL (never infinite on disjoint support — the reason
  // it is the mixing-audit standard).
  //
  // Determinism: the transcendental is quantized EXACTLY as the
  // entropy/tfidf family does — round(1000·ln(ratio)) with the ratio a
  // fixed-parenthesization double over exact integer counts, then all
  // accumulation is integer (Σ count·ln_milli) and the final milli
  // readout is one shared double expression. Scale shape: ONE corpus
  // token rollup collapses to the (source × term) table; the Q side
  // needs the full source×vocab grid, which is BOUNDED (sources ×
  // vocabulary), built from two broadcast aggregates — the corpus is
  // never re-read.
  private def jsLnMilli(top: String): String =
    s"CAST(round(CAST(1000 AS DOUBLE) * ln(($top) / " +
      "((CAST(cs AS DOUBLE) / n_s + CAST(rs AS DOUBLE) / nr) / CAST(2 AS DOUBLE)))) AS BIGINT)"

  def jsDivergence(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Lineage
    val st = Lineage.truncate(docs(s, dir)
      .select(col("source"), explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cs")))
    val tot = st.groupBy(col("term")).agg(sum(col("cs")).as("ct"))
    val ns = st.groupBy(col("source")).agg(sum(col("cs")).as("n_s"))
    val nAll = ns.agg(sum(col("n_s")).as("n_all"))
    val grid = ns.join(broadcast(tot), lit(true)) // sources × vocab: bounded
      .join(st, Seq("source", "term"), "left").na.fill(0L, Seq("cs"))
      .crossJoin(broadcast(nAll))
      .withColumn("rs", col("ct") - col("cs"))
      .withColumn("nr", col("n_all") - col("n_s"))
    val lnP = jsLnMilli("CAST(cs AS DOUBLE) / n_s")
    val lnQ = jsLnMilli("CAST(rs AS DOUBLE) / nr")
    // Single-source guard: with one source (or one source holding every
    // token) nr = n_all − n_s = 0 and the ln ratio divides by zero —
    // NaN/Infinity on Spark, an error on DuckDB. Emit NULL for that
    // degenerate source instead (mirrored in the oracle SQL), the same
    // NULL-guard convention sequentialObf uses.
    grid.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_src"), // constant within source
        max(col("nr")).as("n_rest"),
        sum(when(col("cs") > 0, lit(1L)).otherwise(0L)).as("n_terms_src"),
        sum(when(col("cs") > 0 && col("nr") > 0, expr(s"cs * ($lnP)"))
          .otherwise(0L)).as("jsp"),
        sum(when(col("rs") > 0 && col("nr") > 0, expr(s"rs * ($lnQ)"))
          .otherwise(0L)).as("jsq"))
      .select(col("source"), col("n_src"), col("n_rest"), col("n_terms_src"),
        col("jsp"), col("jsq"),
        expr("""CASE WHEN n_rest > 0 THEN
                  (CAST(jsp AS DOUBLE) / n_src + CAST(jsq AS DOUBLE) / n_rest)
                  / CAST(2 AS DOUBLE)
                END""").as("js_milli"))
      .orderBy(col("source"))
  }

  val jsDivergenceSql: String = {
    val lnP = jsLnMilli("CAST(cs AS DOUBLE) / n_s")
    val lnQ = jsLnMilli("CAST(rs AS DOUBLE) / nr")
    s"""WITH st AS MATERIALIZED (
       |  SELECT source, term, CAST(count(*) AS BIGINT) AS cs
       |  FROM (SELECT source, UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |        FROM documents)
       |  WHERE length(term) > 0 GROUP BY 1, 2),
       |tot AS (SELECT term, CAST(sum(cs) AS BIGINT) AS ct FROM st GROUP BY 1),
       |ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_s FROM st GROUP BY 1),
       |na AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_all FROM ns),
       |grid AS (
       |  SELECT ns.source, tot.term, ns.n_s, tot.ct,
       |    CAST(COALESCE(st.cs, 0) AS BIGINT) AS cs,
       |    tot.ct - CAST(COALESCE(st.cs, 0) AS BIGINT) AS rs,
       |    na.n_all - ns.n_s AS nr
       |  FROM ns CROSS JOIN tot
       |  LEFT JOIN st ON st.source = ns.source AND st.term = tot.term
       |  CROSS JOIN na)
       |SELECT source,
       |  CAST(max(n_s) AS BIGINT) AS n_src,
       |  CAST(max(nr) AS BIGINT) AS n_rest,
       |  CAST(sum(CASE WHEN cs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_src,
       |  CAST(sum(CASE WHEN cs > 0 AND nr > 0 THEN cs * ($lnP) ELSE 0 END) AS BIGINT) AS jsp,
       |  CAST(sum(CASE WHEN rs > 0 AND nr > 0 THEN rs * ($lnQ) ELSE 0 END) AS BIGINT) AS jsq,
       |  CASE WHEN max(nr) > 0 THEN
       |    (CAST(sum(CASE WHEN cs > 0 AND nr > 0 THEN cs * ($lnP) ELSE 0 END) AS BIGINT) / CAST(max(n_s) AS DOUBLE)
       |     + CAST(sum(CASE WHEN rs > 0 AND nr > 0 THEN rs * ($lnQ) ELSE 0 END) AS BIGINT) / CAST(max(nr) AS DOUBLE))
       |    / CAST(2 AS DOUBLE) END AS js_milli
       |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // k-anonymity / l-diversity risk audit (Sweeney 2002; Machanavajjhala
  // 2007) — the privacy screen a release pipeline runs before shipping
  // a corpus: group documents by their QUASI-IDENTIFIER tuple
  // (lang × length bucket — the attributes an attacker could join on),
  // flag groups smaller than k (re-identifiable rows) and, among the
  // k-anonymous groups, those whose SENSITIVE attribute (source) shows
  // fewer than l distinct values (attribute-disclosure risk even when
  // k-anonymous). All outputs exact integers; risk share in milli via
  // positive-operand integer division.
  //
  // Shape: one groupBy to QI-group granularity (map-side combined; the
  // distinct-source count rides the same exchange), then a lang-sized
  // rollup — nothing above QI-group cardinality ever moves. At 100 TB
  // the QI table IS the anonymization working set; k-suppression or
  // generalization would be one more join against it.
  val AnonK = 5L
  val AnonL = 2L
  val AnonLenBucket = 100L

  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    kAnonymityOf(docs(s, dir))

  /** The audit over any (lang, source, n_chars) frame. */
  private[graft] def kAnonymityOf(d: DataFrame): DataFrame = {
    val groups = d
      .groupBy(col("lang"), expr(s"n_chars DIV $AnonLenBucket").as("len_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("source")).as("n_sources"))
    groups.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < AnonK, 1L).otherwise(0L)).as("small_groups"),
        sum(when(col("n") < AnonK, col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(when(col("n") >= AnonK && col("n_sources") < AnonL, 1L)
          .otherwise(0L)).as("low_diversity_groups"))
      .withColumn("risk_milli", expr("1000 * rows_at_risk DIV n_rows"))
      .select(col("lang"), col("n_groups"), col("n_rows"), col("small_groups"),
        col("rows_at_risk"), col("risk_milli"), col("low_diversity_groups"))
      .orderBy(col("lang"))
  }

  val kAnonymitySql: String =
    s"""WITH g AS (
       |  SELECT lang, n_chars // $AnonLenBucket AS len_bucket,
       |    count(*) AS n, count(DISTINCT source) AS n_sources
       |  FROM documents GROUP BY 1, 2)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN n < $AnonK THEN 1 ELSE 0 END) AS BIGINT) AS small_groups,
       |  CAST(sum(CASE WHEN n < $AnonK THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       |  CAST(1000 * CAST(sum(CASE WHEN n < $AnonK THEN n ELSE 0 END) AS BIGINT)
       |       // CAST(sum(n) AS BIGINT) AS BIGINT) AS risk_milli,
       |  CAST(sum(CASE WHEN n >= $AnonK AND n_sources < $AnonL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS low_diversity_groups
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------
  // Chi-square independence audit: is the quality-rule verdict
  // INDEPENDENT of language? A corpus whose keep-rate varies by lang is
  // silently reweighting its language mix — the bias screen run before
  // any multilingual training job. Cells are the (lang, keep) grid
  // INCLUDING empty combos (χ² charges an absent cell its full
  // expectation); observed counts and margins are exact BIGINTs from
  // bounded broadcast dims, and each cell's χ² term is quantized to
  // micro-units (round(1e6·term) — the family's milli/micro convention)
  // so the cross-cell sum is an exact, order-free BIGINT on both
  // engines. The double algebra keeps products of potentially-2^63
  // counts in DOUBLE before multiplying (the HUGEINT/overflow trap).
  // 100 TB shape: one corpus pass to cells; everything after is
  // langs×2-sized arithmetic on broadcast margins.

  /** χ² cell term in micro-units — ONE string spliced into both engines
    * (identical parenthesization ⇒ identical IEEE result; nonnegative
    * domain ⇒ HALF_UP and half-away rounding agree). */
  private val chiTermMicroExpr: String =
    """CAST(round(1000000 * (
      |  ((CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
      |   * (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct))
      |  / (CAST(n AS DOUBLE) * rt * ct))) AS BIGINT)""".stripMargin

  def chiSquare(s: SparkSession, dir: String): DataFrame =
    chiSquareOf(docs(s, dir))

  private[graft] def chiSquareOf(d: DataFrame): DataFrame = {
    // keep is BINARY, so the (lang, keep) grid pivots into one row per
    // lang with both cells — absent combos are 0 by construction (no
    // full-grid LEFT join needed), and the whole query is: ONE narrow
    // corpus pass (the pass-through quality frame carries lang, no
    // doc_id self-join) → a lang-keyed map-side-combined pivot agg →
    // a 1-row broadcast of the column margins → stack back to grid
    // rows → the final sum. Two exchanges, no checkpoint. The r14
    // shape (cells checkpoint + margin re-aggs + r×c grid joins) paid
    // ~0.3 s of job/broadcast latency to share a then-expensive DAG;
    // with the DAG narrow, the structure IS the cost.
    val cells = qualityMetricsThrough(d)
      .groupBy(col("lang"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("o_t"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("o_f"))
    val tot = cells.agg(sum(col("o_t")).as("ct_t"), sum(col("o_f")).as("ct_f"),
      count(lit(1)).as("n_langs"))
    cells.crossJoin(broadcast(tot)) // 1-row margins: structural broadcast
      .withColumn("rt", col("o_t") + col("o_f"))
      .withColumn("n", col("ct_t") + col("ct_f"))
      // unpivot to the (lang, keep, o, ct) grid the χ² term reads; a
      // zero column margin contributes no term (the cell simply does
      // not exist in the r×c grid — the pre-pivot semantics)
      .selectExpr("lang", "rt", "n", "n_langs",
        "stack(2, true, o_t, ct_t, false, o_f, ct_f) AS (keep, o, ct)")
      .agg(
        max(col("n")).as("n_docs"),
        max(col("n_langs")).as("n_langs"),
        sum(expr(s"IF(ct = 0, 0L, $chiTermMicroExpr)")).as("chi2_micro"))
      .withColumn("dof", (col("n_langs") - lit(1L)) * lit(1L)) // keep is binary: c−1 = 1
      .select(col("n_docs"), col("n_langs"), col("dof"), col("chi2_micro"))
  }

  val chiSquareSql: String =
    s"""WITH ${qualityCtes("documents")},
       |v AS (SELECT doc_id, ($ruleFailsSql) = 0 AS keep FROM m),
       |b AS (SELECT d.lang, v.keep FROM v JOIN documents d USING (doc_id)),
       |cells AS (SELECT lang, keep, CAST(count(*) AS BIGINT) AS o
       |          FROM b GROUP BY 1, 2),
       |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
       |ct AS (SELECT keep, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |grid AS (
       |  SELECT rt.lang, ct.keep, rt.rt, ct.ct, coalesce(cells.o, 0) AS o, nn.n
       |  FROM rt CROSS JOIN ct
       |  LEFT JOIN cells ON cells.lang = rt.lang AND cells.keep = ct.keep
       |  CROSS JOIN nn)
       |SELECT CAST(max(n) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(count(DISTINCT lang) - 1 AS BIGINT) AS dof,
       |  CAST(sum(${chiTermMicroExpr.replace("\n", " ")}) AS BIGINT) AS chi2_micro
       |FROM grid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_chi_square" -> (chiSquare _),
    "filter_k_anonymity" -> (kAnonymity _),
    "filter_js_divergence" -> (jsDivergence _),
    "pipeline_refinery" -> (refinery _),
    "filter_domain_mix" -> (domainMix _),
    "filter_quality_rules" -> (qualityFilters _),
    "filter_repetition_rules" -> (repetitionRules _),
    "filter_quality_by_lang" -> (qualityByLang _),
    "dedup_contamination" -> (contamination _),
    "dedup_bloom_probe" -> (bloomProbe _),
    "dedup_passage_overlap" -> (passageOverlap _),
    "filter_line_dedup" -> (lineDedup _),
    "filter_quality_classifier" -> (qualityClassifier _),
    "filter_classifier_ece" -> (classifierEce _),
    "filter_ppl_fence" -> (pplFence _)
  )

  val oracle: Map[String, String] = Map(
    "filter_chi_square" -> chiSquareSql,
    "filter_k_anonymity" -> kAnonymitySql,
    "filter_js_divergence" -> jsDivergenceSql,
    "pipeline_refinery" -> refinerySql,
    "filter_domain_mix" -> domainMixSql,
    "filter_quality_rules" -> qualityFiltersSql,
    "filter_repetition_rules" -> repetitionRulesSql,
    "filter_quality_by_lang" -> qualityByLangSql,
    "dedup_contamination" -> contaminationSql,
    "dedup_bloom_probe" -> bloomProbeSql,
    "dedup_passage_overlap" -> passageOverlapSql,
    "filter_line_dedup" -> lineDedupSql,
    "filter_quality_classifier" -> qualityClassifierSql,
    "filter_classifier_ece" -> classifierEceSql,
    "filter_ppl_fence" -> pplFenceSql
  )
}
