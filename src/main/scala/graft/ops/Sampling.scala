package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ------------------------------------------------------------------
  // Mixture re-weighting: down-sample every language stratum to the
  // smallest stratum's token budget — the "training mix" pass that
  // turns raw crawl proportions into a target mixture. The acceptance
  // probability is exact integer micro-units (min_total·1e6 DIV total)
  // and the inclusion coin is the same affine id hash as the splits, so
  // the realized sample is a pure function of the ids: reproducible
  // across engines, retries, and cluster sizes. One token-count
  // aggregate (map-side combined) + a 5-row broadcast back — no second
  // corpus shuffle at any scale.
  /** The mixture acceptance coin uses its OWN affine constants: reusing
    * the split coin would make the mixture sample a deterministic subset
    * of the train split (both are `coin < threshold` on the same hash),
    * correlating sampling with split membership. Distinct multipliers
    * decorrelate the two decisions while keeping both pure id functions. */
  val MixHashA = 69069L
  val MixHashB = 362437L

  def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val mixCoin = (col("doc_id") * MixHashA + MixHashB) % Mod
    val toks = TextOps.tokens(col("text"))
    val perDoc = docs(s, dir).select(col("doc_id"), col("lang"),
      size(toks).cast("long").as("n_tokens"))
    val perLang = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_total"))
    val minTotal = perLang.agg(min(col("tok_total")).as("min_total"))
    val weighted = perLang.crossJoin(broadcast(minTotal))
      .withColumn("weight_micro", expr("min_total * 1000000 DIV tok_total"))
    perDoc
      .join(broadcast(weighted.select(col("lang"), col("weight_micro"))), Seq("lang"))
      .withColumn("sampled", mixCoin < expr(s"weight_micro * $Mod DIV 1000000"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tok_total"),
        min(col("weight_micro")).as("weight_micro"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("sampled"), col("n_tokens")).otherwise(0L)).as("sampled_tok_total"))
      .orderBy(col("lang"))
  }

  val mixtureWeightsSql: String =
    s"""WITH perdoc AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |perlang AS (
       |  SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tok_total
       |  FROM perdoc GROUP BY 1),
       |w AS (
       |  SELECT lang, tok_total,
       |    (SELECT min(tok_total) FROM perlang) * 1000000 // tok_total AS weight_micro
       |  FROM perlang)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_total,
       |  min(weight_micro) AS weight_micro,
       |  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN sampled THEN n_tokens ELSE 0 END) AS BIGINT) AS sampled_tok_total
       |FROM (
       |  SELECT p.lang, p.n_tokens, w.weight_micro,
       |    (p.doc_id * $MixHashA + $MixHashB) % $Mod < w.weight_micro * $Mod // 1000000 AS sampled
       |  FROM perdoc p JOIN w USING (lang))
       |GROUP BY 1 ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------
  // Temperature-scaled mixture (the mT5/XLM-R α-sampling recipe):
  // sampling probability p_l ∝ share_l^α with α = 0.7 — upweights
  // low-resource languages without flattening the mixture entirely.
  // The power is computed bit-portably as exp(α·ln share) with BOTH
  // transcendentals quantized (the tfidf recipe, twice): ln of the
  // exact ppm share → micro-nats, the α product in exact integers
  // (on the positive MAGNITUDE — Spark's DIV truncates toward zero
  // while DuckDB's // floors, which differ on negatives), then exp of
  // the exactly-representable scaled value → micro-units. Shape: one
  // token-count aggregate + a language-count-sized frame; nothing
  // corpus-wide after the first map-side-combined pass.
  val TempAlphaNum = 7L // α = 0.7 as an exact rational
  val TempAlphaDen = 10L

  def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val perLang = docs(s, dir)
      .select(col("lang"), size(toks).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_total"))
    val total = perLang.agg(sum(col("tok_total")).as("_total"))
    val shared = perLang.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("tok_total * 1000000 DIV _total"))
      // magnitude of ln(share) in micro-nats (share < 1 so ln is
      // negative); the greatest(·, 1) floor keeps a sub-ppm stratum
      // (share_ppm = 0 after integer division) from feeding ln(0) = -∞
      .withColumn("_ln_mag_micro", expr(
        "CAST(round(-1000000 * ln(greatest(share_ppm, 1) / CAST(1000000 AS DOUBLE))) AS BIGINT)"))
      .withColumn("_scaled_micro", expr(
        s"-(_ln_mag_micro * $TempAlphaNum DIV $TempAlphaDen)"))
      .withColumn("w_micro", expr(
        "CAST(round(1000000 * exp(_scaled_micro / CAST(1000000 AS DOUBLE))) AS BIGINT)"))
    val wTotal = shared.agg(sum(col("w_micro")).as("_wsum"))
    shared.crossJoin(broadcast(wTotal))
      .select(col("lang"), col("n_docs"), col("tok_total"), col("share_ppm"),
        col("w_micro"),
        expr("w_micro * 1000000 DIV _wsum").as("p_ppm"))
      .orderBy(col("lang"))
  }

  val temperatureMixtureSql: String =
    s"""WITH perlang AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sum(CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT)) AS BIGINT) AS tok_total
       |  FROM documents GROUP BY 1),
       |shared AS (
       |  SELECT lang, n_docs, tok_total,
       |    CAST(tok_total * 1000000 // CAST((SELECT sum(tok_total) FROM perlang) AS BIGINT) AS BIGINT) AS share_ppm
       |  FROM perlang),
       |scaled AS (
       |  SELECT lang, n_docs, tok_total, share_ppm,
       |    CAST(round(1000000 * exp(
       |      -(CAST(round(-1000000 * ln(greatest(share_ppm, 1) / CAST(1000000 AS DOUBLE))) AS BIGINT)
       |        * $TempAlphaNum // $TempAlphaDen) / CAST(1000000 AS DOUBLE))) AS BIGINT) AS w_micro
       |  FROM shared)
       |SELECT lang, n_docs, tok_total, share_ppm, w_micro,
       |  CAST(w_micro * 1000000 // CAST((SELECT sum(w_micro) FROM scaled) AS BIGINT) AS BIGINT) AS p_ppm
       |FROM scaled ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------
  // Sequence packing (concat-and-chunk): documents are concatenated in
  // id order and cut into fixed ContextLen-token windows — the layout
  // step that turns a filtered corpus into pretraining sequences. Each
  // doc's global start offset is a prefix sum of token counts, computed
  // the DISTRIBUTED way: per-shard window cumsum + a broadcast of the
  // tiny cumulative shard-offset table — the classic two-phase scan (a
  // bare `Window.orderBy` with no partition key would serialize the
  // corpus through one task; this shape never does). The oracle
  // recomputes the same offsets with a plain global window, proving the
  // two-phase composition equals the sequential scan.
  val ContextLen = 2048L
  private val PackShard = 1000L // docs per shard; ids are dense from 0

  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val perDoc = docs(s, dir).select(col("doc_id"), col("lang"),
      size(toks).cast("long").as("n_tokens"),
      expr(s"doc_id DIV $PackShard").as("_shard"))
    val wIn = Window.partitionBy(col("_shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = perDoc.withColumn("_cum_in", sum(col("n_tokens")).over(wIn))
    val wSh = Windows.boundedGlobal(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val shardOffsets = perDoc.groupBy(col("_shard"))
      .agg(sum(col("n_tokens")).as("_tot"))
      .withColumn("_offset", coalesce(sum(col("_tot")).over(wSh), lit(0L)))
      .select(col("_shard"), col("_offset"))
    inShard
      .join(broadcast(shardOffsets), Seq("_shard"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("_offset") + col("_cum_in") - col("n_tokens")).as("start_offset"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset DIV $ContextLen").as("bin_first"),
        expr(s"(start_offset + n_tokens - 1) DIV $ContextLen").as("bin_last"))
      .withColumn("n_bins_spanned", col("bin_last") - col("bin_first") + 1)
      .orderBy(col("doc_id"))
  }

  val packSequencesSql: String =
    s"""WITH perdoc AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |scanned AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
       |  FROM perdoc)
       |SELECT doc_id, lang, n_tokens, start_offset,
       |  start_offset // $ContextLen AS bin_first,
       |  (start_offset + n_tokens - 1) // $ContextLen AS bin_last,
       |  (start_offset + n_tokens - 1) // $ContextLen - start_offset // $ContextLen + 1 AS n_bins_spanned
       |FROM scanned ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Sliding-window chunking with overlap: each document is cut into
  // ChunkLen-token windows advancing by ChunkStride (so consecutive
  // chunks share ChunkLen−ChunkStride tokens of context) — the
  // RAG-/embedding-side layout step, where pack_sequences above is the
  // pretraining one. Pure narrow algebra: the chunk count is an exact
  // integer formula, the window is a slice of the already-split token
  // array, and the content fingerprint is an md5 over the re-joined
  // window — one row per chunk, no shuffle except the presentation
  // sort. At 100 TB the fan-out is bounded (≈ n_tokens/stride per doc)
  // and stays inside whole-stage codegen.
  val ChunkLen = 64L
  val ChunkStride = 48L

  def chunkOverlap(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs(s, dir).select(col("doc_id"), toks.as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      // n_chunks = 1 + ceil(max(n-W, 0)/S), in exact integer arithmetic
      .withColumn("_nc", expr(
        s"1 + (greatest(_n - $ChunkLen, 0) + $ChunkStride - 1) DIV $ChunkStride"))
      .select(col("doc_id"), col("_t"), col("_n"),
        explode(expr("sequence(0, _nc - 1)")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkStride).as("start_tok"),
        least(lit(ChunkLen), col("_n") - col("chunk_idx") * ChunkStride).as("chunk_len"),
        md5(concat_ws(" ",
          expr(s"slice(_t, chunk_idx * $ChunkStride + 1, $ChunkLen)"))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val chunkOverlapSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |sized AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
       |    1 + (greatest(CAST(len(toks) AS BIGINT) - $ChunkLen, 0) + ${ChunkStride - 1}) // $ChunkStride AS nc
       |  FROM t),
       |chunks AS (
       |  SELECT doc_id, toks, n, g.i AS chunk_idx
       |  FROM sized, UNNEST(generate_series(0, nc - 1)) AS g(i))
       |SELECT doc_id, chunk_idx,
       |  chunk_idx * $ChunkStride AS start_tok,
       |  least($ChunkLen, n - chunk_idx * $ChunkStride) AS chunk_len,
       |  md5(array_to_string(list_slice(toks, chunk_idx * $ChunkStride + 1,
       |    least(chunk_idx * $ChunkStride + $ChunkLen, n)), ' ')) AS chunk_md5
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------------------------
  // Weighted reservoir sample (Efraimidis–Spirtakis A-ES): keep the K
  // documents with the largest u^(1/w), where w = token count and u is
  // the deterministic id coin mapped into (0, 1] — token-weighted
  // sampling without replacement as a pure id function. Comparing
  // ln(u)/w is equivalent and cross-engine exact with the quantized-log
  // recipe (ln of a single exactly-rounded division, ×1000 + round,
  // then ONE double division by the weight); ties break by doc_id. The
  // top-K is a TakeOrdered — no global sort of the corpus, and at
  // 100 TB the per-partition heaps merge on the driver in O(K·parts).
  val ResK = 50
  val ResHashA = 48271L
  val ResHashB = 11L

  def reservoirWeighted(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tokens"))
      .withColumn("u_scaled", (col("doc_id") * ResHashA + ResHashB) % Mod + 1)
      .withColumn("lnu_milli", expr(
        s"CAST(round(1000 * ln(u_scaled / CAST($Mod AS DOUBLE))) AS BIGINT)"))
      .withColumn("priority", col("lnu_milli").cast("double") / col("n_tokens"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(ResK)
  }

  val reservoirWeightedSql: String =
    s"""SELECT doc_id, lang, n_tokens, u_scaled, lnu_milli,
       |  CAST(lnu_milli AS DOUBLE) / n_tokens AS priority
       |FROM (
       |  SELECT doc_id, lang, n_tokens, u_scaled,
       |    CAST(round(1000 * ln(u_scaled / CAST($Mod AS DOUBLE))) AS BIGINT) AS lnu_milli
       |  FROM (
       |    SELECT doc_id, lang,
       |      CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
       |      (doc_id * $ResHashA + $ResHashB) % $Mod + 1 AS u_scaled
       |    FROM documents))
       |ORDER BY CAST(lnu_milli AS DOUBLE) / n_tokens DESC, doc_id LIMIT $ResK""".stripMargin

  // ------------------------------------------------------------------
  // DSIR importance weights (Xie et al. 2023, "Data Selection for
  // Language Models via Importance Resampling"): score each raw-corpus
  // document by how much likelier its hashed n-gram features are under
  // a target-domain bag-of-ngrams model than under the raw-corpus
  // model, then resample the top of that ranking. Features are
  // unigrams + bigrams hashed into DsirBuckets buckets (the paper's
  // hashed n-gram generative model); per-bucket log-likelihood ratio
  // under add-one smoothing is
  //   λ[b] = ln( (ct[b]+1)/(Nt+B) ) − ln( (cr[b]+1)/(Nr+B) )
  // and a doc's importance weight is log w(x) = Σ_grams λ[bucket(gram)].
  // λ is quantized to milli-nats (the repo-wide recipe: ONE ln of ONE
  // exactly-rounded division of exact integer products, ×1000, round)
  // so the transcendental is bit-portable across engines, and the
  // per-doc sum is exact integer arithmetic.
  //
  // Shape for 100 TB: the two n-gram models are ONE map-side-combined
  // aggregate whose output is bounded by the bucket count (≤ B rows —
  // the paper's whole point is that the model is a fixed-size hashed
  // profile, not a vocabulary); λ is a ≤ B-row broadcast; scoring is a
  // narrow explode + broadcast join + per-doc combine. Two corpus-
  // scale shuffles total (model fit, per-doc sum), both key-bounded;
  // the post-fit totals/λ arithmetic runs on the materialized ≤ B-row
  // counts (lineage-truncated — the corpus is hashed once). The top-K
  // resample is a TakeOrdered, never a global sort. Integer products
  // (c+1)·(N+B) stay exact below 2^53; at corpus scale beyond that,
  // bump the quantization to compute the two ln terms separately —
  // documented tradeoff, same as the tf-idf family.
  val DsirBuckets = 1024L
  val DsirTargetLang = "en"
  val DsirTopK = 64

  /** (doc_id, lang, b): every unigram+bigram occurrence hashed to its
    * DSIR feature bucket. Narrow — no shuffle. */
  private def dsirGrams(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs(s, dir).select(col("doc_id"), col("lang"), toks.as("_t"))
      .select(col("doc_id"), col("lang"),
        explode(concat(col("_t"), expr(
          "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, size(_t) - 1), i -> concat(_t[i-1], ' ', _t[i])) ELSE array() END"))).as("gram"))
      .select(col("doc_id"), col("lang"),
        (graft.functions.PolyHash.polyHash(col("gram"), 31, 1000000007L)
          % DsirBuckets).as("b"))
  }

  /** The λ model (b, lam_milli): the fixed-size artifact a 100 TB
    * deployment trains ONCE and reuses across every scoring run —
    * bounded by the bucket count whatever the corpus size.
    *
    * DENSE over all DsirBuckets rows: buckets unseen at fit time carry
    * the add-one-smoothed default λ the model defines for them, so
    * scoring a DIFFERENT corpus against a saved model (the whole point
    * of train-once/score-many) never drops grams on the inner join.
    * Corpus totals nr/nt are derived from the per-bucket counts (they
    * are exactly sum(cr)/sum(ct)) instead of a second full aggregation
    * over the exploded gram corpus — the fit reads the corpus once. */
  private def dsirLambda(g: DataFrame): DataFrame = {
    // truncate lineage on the ≤B-row counts so the corpus is hashed
    // ONCE for the model — both the λ join and the totals derive from
    // the materialized bucket counts
    val counts = Lineage.truncate(g.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct")))
    val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val allBuckets = g.sparkSession.range(DsirBuckets).select(col("id").as("b"))
    allBuckets
      .join(broadcast(counts), Seq("b"), "left")
      .na.fill(0L, Seq("cr", "ct"))
      .crossJoin(broadcast(totals)) // 1-row totals: structural
      .select(col("b"), expr(
        s"CAST(round(1000 * ln(CAST((ct + 1) * (nr + $DsirBuckets) AS DOUBLE) / CAST((cr + 1) * (nt + $DsirBuckets) AS DOUBLE))) AS BIGINT)")
        .as("lam_milli"))
  }

  /** Score hashed grams against a λ model: broadcast join + per-doc sum. */
  private def dsirScore(g: DataFrame, lam: DataFrame): DataFrame =
    g.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lam_milli")).as("logw_milli"))

  /** Unordered (doc_id, n_grams, logw_milli) importance-weight frame. */
  private def dsirCore(s: SparkSession, dir: String): DataFrame = {
    val g = dsirGrams(s, dir)
    dsirScore(g, dsirLambda(g))
  }

  /** Train-once half of the operational split: fit the λ model on the
    * corpus at `dir` and persist it as a parquet artifact. */
  def dsirFit(s: SparkSession, dir: String, modelPath: String): Unit =
    dsirLambda(dsirGrams(s, dir)).coalesce(1)
      .write.mode("overwrite").parquet(modelPath)

  /** Score-many half: score the corpus at `dir` against a previously
    * saved λ model — identical results to the inline [[dsirWeights]]
    * when the model was fit on the same corpus, and well-defined on a
    * DIFFERENT corpus (the dense model covers every bucket, so no gram
    * is dropped by the join). */
  def dsirScoreWith(s: SparkSession, dir: String, modelPath: String): DataFrame =
    dsirScore(dsirGrams(s, dir), s.read.parquet(modelPath))
      .orderBy(col("doc_id"))

  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirCore(s, dir).orderBy(col("doc_id"))

  /** The resample step: deterministic top-K by importance weight. */
  def dsirTopK(s: SparkSession, dir: String): DataFrame =
    dsirCore(s, dir).orderBy(col("logw_milli").desc, col("doc_id")).limit(DsirTopK)

  private val dsirCtes: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, lang, UNNEST(toks) AS gram FROM t
       |  UNION ALL
       |  SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gram
       |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)),
       |bucketed AS (
       |  SELECT doc_id, lang,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(gram, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) % $DsirBuckets AS b
       |  FROM grams),
       |counts AS (
       |  SELECT b, count(*) AS cr,
       |    CAST(count(*) FILTER (WHERE lang = '$DsirTargetLang') AS BIGINT) AS ct
       |  FROM bucketed GROUP BY 1),
       |tot AS (
       |  SELECT count(*) AS nr,
       |    CAST(count(*) FILTER (WHERE lang = '$DsirTargetLang') AS BIGINT) AS nt
       |  FROM bucketed),
       |lam AS (
       |  SELECT b, CAST(round(1000 * ln(CAST((ct + 1) * (nr + $DsirBuckets) AS DOUBLE) / CAST((cr + 1) * (nt + $DsirBuckets) AS DOUBLE))) AS BIGINT) AS lam_milli
       |  FROM counts, tot),
       |w AS (
       |  SELECT doc_id, count(*) AS n_grams, CAST(sum(lam_milli) AS BIGINT) AS logw_milli
       |  FROM bucketed JOIN lam USING (b) GROUP BY 1)""".stripMargin

  val dsirWeightsSql: String =
    dsirCtes + "\nSELECT doc_id, n_grams, logw_milli FROM w ORDER BY doc_id"

  val dsirTopKSql: String =
    dsirCtes +
      s"\nSELECT doc_id, n_grams, logw_milli FROM w ORDER BY logw_milli DESC, doc_id LIMIT $DsirTopK"

  // ------------------------------------------------------------------
  // Token-budget allocation under the data-constrained epoch cap (the
  // Pile/LLaMA mixture-planning step, with Muennighoff et al. 2023's
  // ~4-epoch rule): given a total training budget of BudgetMultiple ×
  // the corpus token count and an equal per-language target (the
  // "flatten the mixture" recipe), each language's plan is
  //   epochs = min(target / tok_total, 4)   (milli-units)
  //   planned = epochs · tok_total          (what will actually train)
  //   deficit = target − planned            (the data-constrained gap)
  // — a language too small to fill its share without exceeding 4
  // epochs surfaces a deficit instead of silently over-epoching.
  // All integer (nonnegative DIV both engines). Shape at 100 TB: one
  // map-side-combined token-count pass; the allocation itself runs on
  // the language-count-sized frame.
  val BudgetMultiple = 2L
  val BudgetEpochCapMilli = 4000L

  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val perLang = docs(s, dir)
      .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_total"))
    val tot = perLang.agg(sum(col("tok_total")).as("corpus_total"),
      count(lit(1)).as("n_langs"))
    perLang.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr(s"corpus_total * $BudgetMultiple DIV n_langs"))
      .withColumn("epochs_milli",
        least(expr("1000 * target_tokens DIV tok_total"), lit(BudgetEpochCapMilli)))
      .withColumn("planned_tokens", expr("epochs_milli * tok_total DIV 1000"))
      .withColumn("deficit_tokens",
        greatest(col("target_tokens") - col("planned_tokens"), lit(0L)))
      .select(col("lang"), col("n_docs"), col("tok_total"), col("target_tokens"),
        col("epochs_milli"), col("planned_tokens"), col("deficit_tokens"))
      .orderBy(col("lang"))
  }

  val tokenBudgetSql: String =
    s"""WITH perlang AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS BIGINT) AS tok_total
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(tok_total) AS BIGINT) AS corpus_total,
       |               CAST(count(*) AS BIGINT) AS n_langs FROM perlang),
       |a AS (
       |  SELECT lang, n_docs, tok_total,
       |    corpus_total * $BudgetMultiple // n_langs AS target_tokens,
       |    least(1000 * (corpus_total * $BudgetMultiple // n_langs) // tok_total,
       |          $BudgetEpochCapMilli) AS epochs_milli
       |  FROM perlang, tot)
       |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, tok_total,
       |  CAST(target_tokens AS BIGINT) AS target_tokens,
       |  CAST(epochs_milli AS BIGINT) AS epochs_milli,
       |  CAST(epochs_milli * tok_total // 1000 AS BIGINT) AS planned_tokens,
       |  CAST(greatest(target_tokens - epochs_milli * tok_total // 1000, 0) AS BIGINT)
       |    AS deficit_tokens
       |FROM a ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------
  // Curriculum ordering (Bengio et al. 2009, the easy-to-hard training
  // schedule): the corpus sorted into the order it will be FED to
  // training — difficulty bands first (quintiles of exact mean bigram
  // surprisal, the perplexity fence's metric, cut by the value-histogram
  // quantile), a deterministic hash shuffle inside each band (adjacent
  // docs must not correlate), doc_id as the final total-order tiebreak.
  // The output ORDER IS the curriculum. Shape at 100 TB: the perplexity
  // passes + 4 histogram-sized quantile probes (broadcast back as one
  // 1-row fence frame) + ONE range-partitioned global sort — the sort a
  // training-order writer pays by definition, never a single-task
  // window.
  val CurriculumBands = 5

  def curriculum(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.ops.Lineage.truncate(
      TextOps.perplexityPerDoc(s, dir)
        .select(col("doc_id"), expr("(-sum_logp_milli) DIV n_bigrams").as("q_milli"))
        .withColumn("_g", lit(0L))) // constant key: the histogram IS bounded
    val fences = (1 until CurriculumBands).map { k =>
      RobustStats.histQuantile(scored, "_g", "q_milli", k, CurriculumBands)
        .select(col("med").as(s"f$k"))
    }.reduce((a, b) => a.crossJoin(broadcast(b))) // 1-row × 1-row
    val bandExpr = (1 until CurriculumBands)
      .map(k => s"(CASE WHEN q_milli > f$k THEN 1 ELSE 0 END)").mkString(" + ")
    scored.crossJoin(broadcast(fences))
      .select(col("doc_id"), col("q_milli"),
        expr(s"CAST($bandExpr AS BIGINT)").as("band"),
        ((col("doc_id") * MixHashA + MixHashB) % Mod).as("shuffle_key"))
      .orderBy(col("band"), col("shuffle_key"), col("doc_id"))
  }

  val curriculumSql: String = {
    val fences = (1 until CurriculumBands).map { k =>
      s"f$k AS (SELECT min(q) AS f FROM cum WHERE cum >= (n * $k + ${CurriculumBands - 1}) // $CurriculumBands)"
    }.mkString(",\n")
    val bandExpr = (1 until CurriculumBands)
      .map(k => s"(CASE WHEN sc.q > f$k.f THEN 1 ELSE 0 END)").mkString(" + ")
    val fromFences = (1 until CurriculumBands).map(k => s"f$k").mkString(", ")
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
       |sc AS (SELECT doc_id, (-slp) // nb AS q FROM pd),
       |hist AS (SELECT q, count(*) AS c FROM sc GROUP BY 1),
       |cum AS (
       |  SELECT q, sum(c) OVER (ORDER BY q) AS cum, sum(c) OVER () AS n FROM hist),
       |$fences
       |SELECT sc.doc_id, CAST(sc.q AS BIGINT) AS q_milli,
       |  CAST($bandExpr AS BIGINT) AS band,
       |  CAST((sc.doc_id * $MixHashA + $MixHashB) % $Mod AS BIGINT) AS shuffle_key
       |FROM sc, $fromFences
       |ORDER BY band, shuffle_key, doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Neyman optimal allocation (Neyman 1934): split a sampling budget
  // across strata ∝ N_h·S_h — the variance-minimizing allocation for
  // estimating a mean under stratified sampling, vs the proportional
  // N_h/N everyone reaches for first. Here strata are sources and the
  // measured variable is n_chars: a bursty source (high S_h) earns more
  // than its headcount share.
  //
  // Determinism: each stratum's variance numerator n·Σx²−(Σx)² is an
  // exact BIGINT (bound: n·Σx² < 2^63 ⇔ corpus chars² mass < 9e18 per
  // stratum — document-length-scaled, not corpus-scaled, since x is
  // per-doc length); the weight N_h·S_h is then quantized to milli
  // BEFORE the budget split so the allocation is pure integer division
  // on both engines. Shape: one corpus pass → k stratum rows → a 1-row
  // total broadcast back. Rounding is floor-by-division; the emitted
  // remainder column shows the ≤ k−1 unallocated units explicitly
  // (no silent largest-remainder tie-break to drift cross-engine).
  val NeymanBudget = 1000L

  /** Stratum weight N_h·S_h in milli — ONE string spliced into both
    * engines. The n_h > 1 guard: a SINGLETON stratum makes the variance
    * term 0.0/0.0 = NaN, and the engines then diverge (Spark's non-ANSI
    * CAST(NaN AS BIGINT) yields 0 where DuckDB errors) — a singleton has
    * zero ESTIMATED variance, so its Neyman weight is 0, stated
    * explicitly like the w_tot = 0 degenerate below. */
  private val NeymanWMilliSql: String =
    """CASE WHEN n_h > 1 THEN CAST(round(1000 * n_h * sqrt(
      |  CAST(n_h * sxx - sx * sx AS DOUBLE)
      |  / (CAST(n_h AS DOUBLE) * (n_h - 1)))) AS BIGINT) ELSE 0 END""".stripMargin

  def neymanAllocation(s: SparkSession, dir: String): DataFrame =
    neymanAllocationOf(docs(s, dir))

  /** The allocation over any (source, n_chars) frame — exposed so the
    * spec can plant strata with hand-computed variances. */
  private[graft] def neymanAllocationOf(d: DataFrame): DataFrame = {
    import graft.ops.Lineage
    val strata = Lineage.truncate(d
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("w_milli", expr(NeymanWMilliSql)))
    val tot = strata.agg(sum(col("w_milli")).as("w_tot"),
      sum(col("n_h")).as("n_tot"))
    strata.crossJoin(broadcast(tot)) // k rows × 1 row
      .select(col("source"), col("n_h"), col("w_milli"),
        // w_tot = 0 (every stratum variance-free) would divide by zero
        // under ANSI; emit NULL like the other degenerate-metric guards
        expr(s"CASE WHEN w_tot > 0 THEN $NeymanBudget * w_milli DIV w_tot ELSE NULL END")
          .as("alloc_neyman"),
        expr(s"$NeymanBudget * n_h DIV n_tot").as("alloc_proportional"))
      .orderBy(col("source"))
  }

  val neymanAllocationSql: String =
    s"""WITH strata AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
       |    CAST(sum(n_chars) AS BIGINT) AS sx,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
       |  FROM documents GROUP BY 1),
       |w AS (
       |  SELECT source, n_h,
       |    ${NeymanWMilliSql.replace("\n", " ")} AS w_milli
       |  FROM strata),
       |tot AS (SELECT CAST(sum(w_milli) AS BIGINT) AS w_tot,
       |               CAST(sum(n_h) AS BIGINT) AS n_tot FROM w)
       |SELECT source, n_h, w_milli,
       |  CAST(CASE WHEN w_tot > 0 THEN $NeymanBudget * w_milli // w_tot
       |       ELSE NULL END AS BIGINT) AS alloc_neyman,
       |  CAST($NeymanBudget * n_h // n_tot AS BIGINT) AS alloc_proportional
       |FROM w CROSS JOIN tot ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // UNIVERSE (join-aware) sampling — the distributed-sampling subtlety
  // naive pipelines get wrong: sampling each table independently per
  // ROW breaks referential integrity (a kept lineitem's order is kept
  // with probability p, so ~(1−p) of the joined sample ORPHANS), while
  // sampling the KEY UNIVERSE with one shared coin keeps the join of
  // samples exactly equal to the sample of the join. The audit samples
  // orders and lineitem at p = 1/8 both ways with the family's affine
  // coin and reports: the universe arm's orphan count (structurally 0),
  // the Bernoulli arm's (large), and the join sizes. All exact
  // integers; at 100 TB both arms are one filtered pass + one key join
  // (the sampled-orders side broadcasts at any realistic p·|orders|).
  def universeJoinSample(s: SparkSession, dir: String): DataFrame = {
    def keyCoin(c: Column) = (c * lit(HashA) + lit(HashB)) % lit(Mod) % lit(8L)
    def rowCoin(c: Column) =
      ((c * lit(131L)) * lit(HashA) + lit(HashB)) % lit(Mod) % lit(8L)
    val o = s.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"))
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"))
    val oS = o.filter(keyCoin(col("o_orderkey")) === 0L)
    val liUniverse = li.filter(keyCoin(col("l_orderkey")) === 0L)
    val liBernoulli = li.filter(
      rowCoin(col("l_orderkey") * lit(8L) + col("l_linenumber")) === 0L)
    def agg1(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as(name))
    agg1(o, "n_orders")
      .crossJoin(agg1(oS, "n_orders_sampled"))
      .crossJoin(agg1(liUniverse, "n_li_universe"))
      .crossJoin(agg1(liBernoulli, "n_li_bernoulli"))
      .crossJoin(agg1(liUniverse.join(oS,
        col("l_orderkey") === col("o_orderkey")), "n_join_universe"))
      .crossJoin(agg1(liUniverse.join(oS,
        col("l_orderkey") === col("o_orderkey"), "left_anti"), "n_orphans_universe"))
      .crossJoin(agg1(liBernoulli.join(oS,
        col("l_orderkey") === col("o_orderkey"), "left_anti"), "n_orphans_bernoulli"))
  }

  val universeJoinSampleSql: String =
    s"""WITH oS AS (
       |  SELECT o_orderkey FROM orders
       |  WHERE (o_orderkey * $HashA + $HashB) % $Mod % 8 = 0),
       |liU AS (
       |  SELECT l_orderkey FROM lineitem
       |  WHERE (l_orderkey * $HashA + $HashB) % $Mod % 8 = 0),
       |liB AS (
       |  SELECT l_orderkey FROM lineitem
       |  WHERE ((l_orderkey * 8 + l_linenumber) * 131 * $HashA + $HashB) % $Mod % 8 = 0)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
       |  (SELECT CAST(count(*) AS BIGINT) FROM oS) AS n_orders_sampled,
       |  (SELECT CAST(count(*) AS BIGINT) FROM liU) AS n_li_universe,
       |  (SELECT CAST(count(*) AS BIGINT) FROM liB) AS n_li_bernoulli,
       |  (SELECT CAST(count(*) AS BIGINT) FROM liU JOIN oS ON o_orderkey = l_orderkey) AS n_join_universe,
       |  (SELECT CAST(count(*) AS BIGINT) FROM liU WHERE l_orderkey NOT IN (SELECT o_orderkey FROM oS)) AS n_orphans_universe,
       |  (SELECT CAST(count(*) AS BIGINT) FROM liB WHERE l_orderkey NOT IN (SELECT o_orderkey FROM oS)) AS n_orphans_bernoulli""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_universe_join" -> (universeJoinSample _),
    "sample_neyman" -> (neymanAllocation _),
    "sample_token_budget" -> (tokenBudget _),
    "sample_curriculum" -> (curriculum _),
    "sample_split_assign" -> (splitAssign _),
    "sample_stratified" -> (stratifiedSample _),
    "sample_mixture_weights" -> (mixtureWeights _),
    "sample_temperature" -> (temperatureMixture _),
    "sample_reservoir_weighted" -> (reservoirWeighted _),
    "sample_dsir_weights" -> (dsirWeights _),
    "sample_dsir_topk" -> (dsirTopK _),
    "pack_sequences" -> (packSequences _),
    "pack_chunks_overlap" -> (chunkOverlap _)
  )

  val oracle: Map[String, String] = Map(
    "sample_universe_join" -> universeJoinSampleSql,
    "sample_neyman" -> neymanAllocationSql,
    "sample_token_budget" -> tokenBudgetSql,
    "sample_curriculum" -> curriculumSql,
    "sample_split_assign" -> splitAssignSql,
    "sample_stratified" -> stratifiedSampleSql,
    "sample_mixture_weights" -> mixtureWeightsSql,
    "sample_temperature" -> temperatureMixtureSql,
    "sample_reservoir_weighted" -> reservoirWeightedSql,
    "sample_dsir_weights" -> dsirWeightsSql,
    "sample_dsir_topk" -> dsirTopKSql,
    "pack_sequences" -> packSequencesSql,
    "pack_chunks_overlap" -> chunkOverlapSql
  )
}
