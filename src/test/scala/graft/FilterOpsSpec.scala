package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, FilterOps, Sampling}

class FilterOpsSpec extends SparkSuite {

  test("quality filters: verdict is consistent and the cascade actually splits the corpus") {
    val q = FilterOps.qualityFilters(spark, sf).cache()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(q.count() == total) // one verdict per doc, none dropped silently
    // keep <=> zero failed rules, and both verdicts occur
    assert(q.filter(col("keep") =!= (col("n_rules_failed") === 0L)).count() == 0)
    assert(q.filter(col("keep")).count() > 0)
    assert(q.filter(!col("keep")).count() > 0)
    // the length rule is binding: every doc under MinTokens is dropped
    val short = q.filter(col("n_tokens") < FilterOps.MinTokens)
    assert(short.count() > 0 && short.filter(col("keep")).count() == 0)
    // milli metrics are in range
    assert(q.filter(col("top_token_frac_milli") > 1000L || col("alpha_frac_milli") > 1000L).count() == 0)
  }

  test("contamination: a twin in test whose original trains is flagged, clean docs are not") {
    val c = FilterOps.contamination(spark, sf).cache()
    // recompute the split assignment the operator uses
    val coin = (col("doc_id") * Sampling.HashA + Sampling.HashB) % Sampling.Mod
    val base = DedupOps.withTwins(spark.read.parquet(s"$sf/documents.parquet"))
      .withColumn("split",
        when(coin < Sampling.Mod * 8 / 10, "train")
          .when(coin < Sampling.Mod * 9 / 10, "val")
          .otherwise("test"))
    // twin pairs that straddle test/train: twin (id+1e6) in test, original in train
    // (or vice versa). A twin shares all but one trailing token with its
    // original, i.e. plenty of 8-grams -> must be flagged.
    val splits = base.select(col("doc_id"), col("split"))
    val straddle = splits.as("o")
      .join(splits.as("t"), col("t.doc_id") === col("o.doc_id") + 1000000L)
      .filter(col("o.split") === "train" && col("t.split") === "test")
      .select(col("t.doc_id").as("test_doc"))
    val nStraddle = straddle.count()
    assert(nStraddle > 0, "fixture should produce twins straddling train/test")
    val flagged = c.select(col("test_doc"))
    assert(straddle.join(flagged, Seq("test_doc"), "left_anti").count() == 0,
      "every straddling twin must be flagged as contaminated")
    // sanity: contamination counts are positive and refer to real train docs
    assert(c.filter(col("n_shared_ngrams") < 1L || col("n_train_docs") < 1L).count() == 0)
  }

  test("passage overlap: twins are fully duplicated, originals all but their trailing gram") {
    val p = FilterOps.passageOverlap(spark, sf).cache()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(p.count() == 2 * total) // originals + twins
    // a twin is its original minus the LAST token: every one of the twin's
    // 8-grams also exists in the original => dup fraction exactly 1000 milli
    assert(p.filter(col("doc_id") >= 1000000L && col("dup_frac_milli") =!= 1000L).count() == 0)
    // the original's final 8-gram (ending at the dropped token) is almost
    // always unique, so originals sit below 1000 but share everything else
    // (the small-vocab fixture yields a few genuine cross-doc 8-gram
    // coincidences — those are real duplicated passages, not errors)
    val orig = p.filter(col("doc_id") < 1000000L)
    assert(orig.filter(col("dup_frac_milli") >= 1000L).count() <= (total * 0.1).toLong)
    assert(orig.filter(col("dup_frac_milli") < 500L).count() == 0)
  }

  test("mixture weights: smallest stratum keeps weight 1e6, sampling never exceeds the stratum") {
    val m = Sampling.mixtureWeights(spark, sf).cache()
    assert(m.count() == 5) // one row per language
    assert(m.filter(col("weight_micro") > 1000000L).count() == 0)
    // the arg-min stratum is kept whole (weight exactly 1e6)
    val minRow = m.orderBy(col("tok_total")).limit(1)
    assert(minRow.filter(col("weight_micro") =!= 1000000L).count() == 0)
    assert(m.filter(col("n_sampled") > col("n_docs") ||
      col("sampled_tok_total") > col("tok_total")).count() == 0)
  }

  test("domain mix: totals partition the corpus, ppm shares sum to 1e6 - remainders, blocklist exact") {
    val m = FilterOps.domainMix(spark, sf).cache()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(m.agg(sum(col("n_docs"))).head.getLong(0) == total)
    // integer ppm shares: sum within nDomains of exactly 1e6 (floor remainders)
    val nDomains = m.count()
    val ppm = m.agg(sum(col("ppm_share"))).head.getLong(0)
    assert(ppm <= 1000000L && ppm > 1000000L - nDomains)
    // verdict column agrees with the literal blocklist, and actually fires
    assert(m.filter(col("blocklisted") =!=
      col("source").isin(FilterOps.DomainBlocklist: _*)).count() == 0)
    assert(m.filter(col("blocklisted")).count() > 0)
    assert(m.filter(!col("blocklisted")).count() > 0)
  }

  test("pack sequences: two-phase prefix sum equals the sequential scan exactly") {
    import org.apache.spark.sql.expressions.Window
    val packed = Sampling.packSequences(spark, sf).cache()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(packed.count() == total)
    // sequential reference: one global window (fine at test scale)
    val toks = graft.ops.TextOps.tokens(col("text"))
    val seq = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
      .withColumn("start_ref", coalesce(sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)),
        lit(0L)))
    val joined = packed.join(seq.select(col("doc_id"), col("start_ref")), Seq("doc_id"))
    assert(joined.filter(col("start_offset") =!= col("start_ref")).count() == 0)
    // bin bookkeeping is internally consistent
    assert(packed.filter(col("bin_first") > col("bin_last") ||
      col("n_bins_spanned") =!= col("bin_last") - col("bin_first") + 1).count() == 0)
  }

  test("refinery: funnel counts are monotone and every stage does real work") {
    val r = FilterOps.refinery(spark, sf).collect()(0)
    def n(c: String) = r.getAs[Long](c)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    // corpus = docs + twins + every-10th copies
    assert(n("n_raw") == 2 * total + (total + 9) / 10)
    // each stage only removes documents, and each stage removes SOMETHING
    assert(n("n_quality_kept") < n("n_raw") && n("n_quality_kept") > 0)
    assert(n("n_unique_docs") <= n("n_quality_kept"))
    assert(n("n_unique_docs") < n("n_quality_kept") || (total + 9) / 10 == 0,
      "exact copies that survive quality must die in dedup")
    assert(n("n_final_docs") == n("n_unique_docs") - n("n_test_contaminated"))
    assert(n("n_test_contaminated") > 0, "straddling twins must be decontaminated")
    // packing budget covers the train tokens
    assert(n("train_bins") * Sampling.ContextLen >= n("train_tokens"))
    assert((n("train_bins") - 1) * Sampling.ContextLen < n("train_tokens"))
    assert(n("n_train_docs") <= n("n_final_docs"))
  }

  test("perplexity: total, negative, and one row per doc; common-bigram docs score higher") {
    val p = graft.ops.TextOps.perplexity(spark, sf).cache()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(p.count() == total)
    // log-probabilities are strictly negative and finite
    assert(p.filter(col("avg_logp_milli") >= 0.0 || col("avg_logp_milli").isNull).count() == 0)
    assert(p.filter(col("sum_logp_milli") >= 0L).count() == 0)
    // the doc whose transitions are most typical of the corpus must score
    // strictly better than the most atypical one (the LM discriminates)
    val best = p.agg(max(col("avg_logp_milli"))).collect()(0).getDouble(0)
    val worst = p.agg(min(col("avg_logp_milli"))).collect()(0).getDouble(0)
    assert(best > worst, "perplexity must separate documents")
  }

  test("collocations: PMI ranking matches a brute-force model on a hand corpus") {
    import spark.implicits._
    // "san francisco" always co-occurs (high PMI); "the cat"/"the dog"
    // repeat but 'the' is everywhere (low PMI); hapax pairs are pruned
    // by MinCount.
    val d = Seq(
      1L -> "san francisco the cat sat",
      2L -> "san francisco the dog ran",
      3L -> "the cat saw the dog here",
      4L -> "san francisco the cat and the dog",
      5L -> "unique pair once only").toDF("doc_id", "text")
    val got = graft.ops.TextOps.collocationsOf(d)
      .as[(String, String, Long, Long)].collect().toSeq
    // brute-force the same statistic
    val docs = Seq("san francisco the cat sat", "san francisco the dog ran",
      "the cat saw the dog here", "san francisco the cat and the dog",
      "unique pair once only").map(_.split("\\s+").toSeq)
    val bigrams = docs.flatMap(t => t.zip(t.tail))
    val unigrams = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tt = docs.map(_.size).sum.toDouble
    val bt = bigrams.size.toDouble
    val want = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 >= graft.ops.TextOps.Collocations.MinCount)
      .map { case ((w1, w2), c) =>
        val pmi = math.round(1000 * math.log(
          (c.toDouble * tt * tt) / (bt * unigrams(w1) * unigrams(w2))))
        (w1, w2, c, pmi)
      }
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(graft.ops.TextOps.Collocations.TopK)
    assert(got == want)
    // the always-together pair dominates the stop-word glue
    assert(got.head._1 == "san" && got.head._2 == "francisco")
  }

  test("collocations: registered query invariants on the fixture corpus") {
    import spark.implicits._
    val rows = graft.ops.TextOps.collocations(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= graft.ops.TextOps.Collocations.TopK)
    assert(rows.forall(_._3 >= graft.ops.TextOps.Collocations.MinCount))
    assert(rows == rows.sortBy { case (w1, w2, _, p) => (-p, w1, w2) },
      "total order (pmi desc, w1, w2) must hold")
  }

  test("bloom probe: zero false negatives, planted members detected, summary is a confusion table") {
    val b = FilterOps.bloomProbe(spark, sf).cache()
    val rows = b.collect()
    assert(rows.length <= 4 && rows.nonEmpty)
    // Bloom filters never produce false negatives: (maybe=false, member=true) is impossible
    assert(b.filter(!col("bloom_maybe") && col("is_member")).count() == 0)
    // the planted exact copies (probe_id >= 2e6) are members and all detected
    val planted = b.filter(col("bloom_maybe") && col("is_member"))
      .agg(sum(col("n_probes"))).collect()(0).getLong(0)
    val coin = (col("doc_id") * Sampling.HashA + Sampling.HashB) % Sampling.Mod
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(coin < Sampling.Mod * 8 / 10 && pmod(col("doc_id"), lit(5)) === 0)
      .count()
    assert(planted >= expected, s"all $expected planted members must be bloom-positive, got $planted")
  }

  test("quality by lang: rollup tiles the per-doc verdict frame exactly") {
    val perDoc = FilterOps.qualityFilters(spark, sf)
    val rollup = FilterOps.qualityByLang(spark, sf).cache()
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    assert(rollup.agg(sum(col("n_docs"))).collect()(0).getLong(0) == corpus.count())
    // per-verdict doc counts agree with the per-doc frame
    val kept = perDoc.filter(col("keep")).count()
    assert(rollup.filter(col("keep")).agg(sum(col("n_docs")))
      .collect()(0).getLong(0) == kept)
    // kept rows contribute zero failed rules
    assert(rollup.filter(col("keep") && col("rules_failed_total") =!= 0L).count() == 0)
  }

  test("repetition rules: hand-computed n-gram masses and dup-5-gram coverage") {
    import spark.implicits._
    // doc 1: "a b c" x3 — 9 single-char tokens, total_chars = 9.
    //   top 3-gram: "a b c" occurs 3x, 3 chars -> mass 9 -> 1000 milli
    //   top 4-gram: every 4-gram occurs 2x, 4 chars -> mass 8 -> 888
    //   dup 5-grams: p1/p4 and p2/p5 repeat -> positions 1..9 covered -> 1000
    // doc 2: 30 distinct 3-char tokens, total_chars = 90, no repeats:
    //   top3 mass = 9 -> 100, top4 mass = 12 -> 133, dup5 = 0 -> keep
    val clean = (0 until 30).map(i => f"t$i%02d").mkString(" ")
    val d = Seq((1L, "a b c a b c a b c"), (2L, clean)).toDF("doc_id", "text")
    val m = FilterOps.repetitionMetricsFrom(d).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(m(0) == ((1L, 9L, 1000L, 888L, 1000L, 3L, false)))
    assert(m(1) == ((2L, 30L, 100L, 133L, 0L, 0L, true)))
  }

  test("line dedup: injected per-source boilerplate is discovered and stripped exactly") {
    val out = FilterOps.lineDedup(spark, sf).cache()
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val total = d.count()
    assert(out.count() == total)
    // every doc loses at least its header; every third doc also the promo
    assert(out.filter(col("doc_id") % 3 === 0 && col("n_dropped") < 2).count() == 0)
    assert(out.filter(col("n_dropped") < 1).count() == 0)
    // a doc that lost ONLY the injected lines rebuilds to exactly its own
    // normalized text — token count and content hash both match, so the
    // rewrite is byte-exact, not just statistically plausible
    val toks = graft.ops.TextOps.tokens(col("text"))
    val ref = d.select(col("doc_id"),
      size(toks).cast("long").as("own_tokens"),
      graft.functions.PolyHash.polyHash(concat_ws(" ", toks), 31, DedupOps.HashMod)
        .as("own_hash"),
      when(col("doc_id") % 3 === 0, 2L).otherwise(1L).as("injected"))
    val j = out.join(ref, Seq("doc_id")).cache()
    val onlyInjected = j.filter(col("n_dropped") === col("injected"))
    assert(onlyInjected.count() >= total * 9 / 10,
      "most docs drop exactly the injected boilerplate")
    assert(onlyInjected.filter(col("kept_tokens") =!= col("own_tokens") ||
      col("cleaned_hash") =!= col("own_hash")).count() == 0)
    // extra (naturally-repeated) drops only ever shrink the doc
    assert(j.filter(col("kept_tokens") > col("own_tokens")).count() == 0)
    j.unpersist(); out.unpersist()
  }

  test("quality classifier: distills the cascade well above the majority baseline, deterministically") {
    val out = FilterOps.qualityClassifier(spark, sf).cache()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == total)
    // labels are exactly the cascade's verdicts
    val verdicts = FilterOps.qualityFilters(spark, sf).select(col("doc_id"), col("keep"))
    assert(out.join(verdicts, Seq("doc_id"))
      .filter(col("label") =!= col("keep")).count() == 0)
    // predicted <=> score >= 500, by construction
    assert(out.filter(col("predicted") =!= (col("score_milli") >= 500L)).count() == 0)
    // the linear model must beat always-guessing the majority class
    val correct = out.filter(col("predicted") === col("label")).count()
    val majority = out.groupBy(col("label")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(correct > majority,
      s"classifier ($correct/$total) must beat the majority baseline ($majority/$total)")
    assert(correct * 100 >= total * 75, s"accuracy floor: $correct/$total < 75%")
    // integer GD is deterministic: a second training run is bit-identical
    val again = FilterOps.qualityClassifier(spark, sf)
    assert(out.collect().toSeq == again.collect().toSeq)
    out.unpersist()
  }

  test("classifier ECE: bins tile the corpus, gaps are |conf-acc|, summary is the n-weighted mean") {
    val rows = FilterOps.classifierEce(spark, sf).collect()
    val (summary, bins) = rows.partition(_.getLong(0) == -1L)
    assert(summary.length == 1 && bins.nonEmpty)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(bins.map(_.getLong(1)).sum == n, "bins must tile the corpus")
    assert(summary.head.getLong(1) == n)
    bins.foreach { r =>
      val (bin, conf, acc, gap) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bin >= 0 && bin < FilterOps.EceBins)
      assert(conf >= 0 && conf <= 1000 && acc >= 0 && acc <= 1000)
      // stated confidence must sit inside (or at the clamp edge of) its bin
      assert(conf >= bin * 100 && (conf <= (bin + 1) * 100 || bin == FilterOps.EceBins - 1))
      assert(gap == math.abs(conf - acc))
    }
    // the summary ECE is exactly the n-weighted bin-gap mean
    val ece = bins.map(r => r.getLong(1) * r.getLong(4)).sum / n
    assert(summary.head.getLong(4) == ece)
  }

  test("repetition rules: registered query is total over the corpus and ordered") {
    val out = FilterOps.repetitionRules(spark, sf).cache()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == n, "every document gets a repetition verdict row")
    // fractions are valid milli-units and keep <=> zero failed rules
    assert(out.filter(col("top_3gram_frac_milli") < 0 || col("top_3gram_frac_milli") > 1000).count() == 0)
    assert(out.filter(col("dup_5gram_frac_milli") < 0 || col("dup_5gram_frac_milli") > 1000).count() == 0)
    assert(out.filter(col("keep") =!= (col("n_rules_failed") === 0L)).count() == 0)
    out.unpersist()
  }

  test("k-anonymity: planted QI groups — small groups flagged, low-diversity counted") {
    import spark.implicits._
    val K = FilterOps.AnonK.toInt
    // lang "aa": one group of K rows all from ONE source (k-anonymous but
    // low-diversity), one group of K-1 rows (at risk).
    // lang "bb": one group of K rows across 2 sources (fully safe).
    val d = (
      (1 to K).map(i => ("aa", "s1", 150L)) ++
      (1 to K - 1).map(i => ("aa", "s1", 250L)) ++
      (1 to K).map(i => ("bb", if (i % 2 == 0) "s1" else "s2", 50L))
    ).toDF("lang", "source", "n_chars")
    val got = FilterOps.kAnonymityOf(d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("aa", 2L, (2L * K - 1), 1L, (K - 1).toLong,
        1000L * (K - 1) / (2 * K - 1), 1L),
      ("bb", 1L, K.toLong, 0L, 0L, 0L, 0L)))
  }

  test("k-anonymity: fixture — invariants hold and risk is bounded") {
    import spark.implicits._
    val rows = FilterOps.kAnonymity(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, groups, n, small, atRisk, riskMilli, lowDiv) =>
      assert(small <= groups && lowDiv <= groups - small)
      assert(atRisk < FilterOps.AnonK * small + 1)
      assert(riskMilli == 1000L * atRisk / n)
    }
  }

  test("chi_square: matches a brute-force recomputation from the (lang, keep) cells") {
    val got = FilterOps.chiSquare(spark, sf).collect().head
    val (nDocs, nLangs, dof, chiMicro) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    // independent recomputation from the same verdict join
    val cells = FilterOps.qualityFilters(spark, sf)
      .select(col("doc_id"), col("keep"))
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"), col("keep")).count()
      .collect().map(r => ((r.getString(0), r.getBoolean(1)), r.getLong(2))).toMap
    val langs = cells.keys.map(_._1).toSeq.distinct
    val keeps = cells.keys.map(_._2).toSeq.distinct
    val n = cells.values.sum
    val rt = langs.map(l => l -> cells.collect { case ((`l`, _), c) => c }.sum).toMap
    val ct = keeps.map(k => k -> cells.collect { case ((_, `k`), c) => c }.sum).toMap
    val wantMicro = (for (l <- langs; k <- keeps) yield {
      val o = cells.getOrElse((l, k), 0L)
      val diff = o.toDouble * n - rt(l).toDouble * ct(k)
      math.round(1e6 * (diff * diff) / (n.toDouble * rt(l) * ct(k)))
    }).sum
    assert(nDocs == n)
    assert(nLangs == langs.size.toLong)
    assert(dof == nLangs - 1) // keep is binary: c − 1 = 1
    assert(chiMicro == wantMicro, s"chi2_micro $chiMicro != brute $wantMicro")
  }
}
