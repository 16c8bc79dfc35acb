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
}
