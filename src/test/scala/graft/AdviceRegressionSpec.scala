package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.sources.{NativeCodec, PushRouter}

/** Regression pins for the round-6 ADVICE findings (all fixed round 8):
  * subscribeNewHeads TOCTOU head-drop, ANSI-mode short-doc shingle
  * crash, chnative null array-element NPE, silent >32-byte u256
  * truncation, and the dead String-branch conditional (that one is
  * covered by compilation + the schema-driven read tests in
  * NativeSinkSpec). */
class AdviceRegressionSpec extends SparkSuite {

  test("PushRouter: a push racing registration is never dropped, never duplicated") {
    // tight-loop race: a pusher thread streams frames while the main
    // thread registers the handler mid-stream; every frame must be
    // delivered exactly once whichever side wins each interleaving
    for (round <- 1 to 200) {
      val router = new PushRouter[Integer]()
      val got = new ConcurrentLinkedQueue[Integer]()
      val n = 50
      val start = new CountDownLatch(1)
      val pusher = new Thread(() => {
        start.await()
        var i = 0
        while (i < n) { router.push("s", Integer.valueOf(i)); i += 1 }
      })
      pusher.start()
      start.countDown()
      // register somewhere in the middle of the push stream
      if (round % 3 == 0) Thread.onSpinWait()
      router.register("s", v => { got.add(v); () })
      pusher.join()
      // any frame buffered at the instant registration landed must have
      // been drained by one side or the other
      val seen = got.toArray(Array.empty[Integer]).map(_.intValue()).sorted.toSeq
      assert(seen == (0 until n), s"round $round: lost/duplicated frames, got ${seen.size} of $n")
    }
  }

  test("chnative: null array elements encode as empty bytes, not NPE") {
    val schema = StructType(Seq(
      StructField("topics", ArrayType(BinaryType, containsNull = true), nullable = false)))
    val spec = NativeCodec.specFor(schema)
    val rows = Seq(new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](Array[Byte](0x0a), null, Array[Byte](0x0b))))))
    val bos = new ByteArrayOutputStream()
    NativeCodec.writeBlock(new DataOutputStream(bos), spec, rows.toIndexedSeq)
    val got = bos.toByteArray
    val expected = Array.concat(
      Array[Byte](1, 1),
      Array[Byte](6) ++ "topics".getBytes("UTF-8"),
      Array[Byte](13) ++ "Array(String)".getBytes("UTF-8"),
      Array[Byte](3, 0, 0, 0, 0, 0, 0, 0), // end offset 3
      Array[Byte](1, 0x0a), Array[Byte](0), Array[Byte](1, 0x0b))
    assert(got.toSeq == expected.toSeq)
  }

  test("chnative: beToLe32 strips only zero overflow bytes; nonzero width overflow fails") {
    // 33-byte array with a BigInteger sign byte: legitimate max-range u256
    val maxish = new java.math.BigInteger(
      "f000000000000000000000000000000000000000000000000000000000000001", 16)
    val be33 = maxish.toByteArray
    assert(be33.length == 33 && be33(0) == 0)
    val le = NativeCodec.beToLe32(be33)
    assert(le(0) == 0x01 && (le(31) & 0xff) == 0xf0)
    // round-trips back to the same value
    assert(new java.math.BigInteger(1, NativeCodec.beToLe32(le)) == maxish)
    // a genuinely-too-wide value must throw, not silently truncate
    val wide = Array.fill[Byte](33)(0x01)
    val e = intercept[IllegalArgumentException](NativeCodec.beToLe32(wide))
    assert(e.getMessage.contains("wider than 32 bytes"))
  }

  test("bigram pipelines survive sub-2-token docs under ANSI mode, keeping row coverage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ansi-docs").toString
    Seq((1L, "one"), (2L, ""), (3L, "alpha beta gamma alpha beta"), (4L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // pre-r8 each of these threw INVALID_ARRAY_INDEX on docs 1-2
      assert(graft.ops.TextOps.bigrams(spark, dir).count() > 0)
      assert(graft.ops.TextOps.perplexity(spark, dir)
        .select("doc_id").as[Long].collect().toSet == Set(3L, 4L))
      val q = graft.ops.FilterOps.qualityFilters(spark, dir)
      // short docs keep their metric row (LEFT join + coalesce), with a
      // zero top-bigram numerator and a floored denominator
      assert(q.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
      assert(q.filter(col("doc_id") <= 2L)
        .select("top_bigram_frac_milli").as[Long].collect().forall(_ == 0L))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("dedup shingles: docs shorter than 3 tokens survive ANSI mode") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val corpus = Seq(
        (1L, "one"), (2L, "two tokens"), (3L, ""),
        (4L, "alpha beta gamma delta shared tail of text here"),
        (5L, "alpha beta gamma delta shared tail of text here")).toDF("doc_id", "text")
      // pre-fix this threw INVALID_ARRAY_INDEX on docs 1-3; post-fix they
      // simply contribute no trigram shingles
      val pairs = graft.ops.DedupOps.dupPairsFrom(corpus).collect()
      assert(pairs.exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L))
      assert(!pairs.exists(r => r.getLong(0) <= 3L || r.getLong(1) <= 3L))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  // ---- round-9 continuation review findings -------------------------

  test("dsirScoreWith on a model fit elsewhere scores every gram (dense λ, no join drop)") {
    import org.apache.spark.sql.functions._
    import graft.ops.Sampling
    // fit on a 10% slice — most buckets of the full corpus are unseen
    // by this model; pre-fix the inner join dropped those grams
    val modelPath = java.nio.file.Files
      .createTempDirectory("dsir_slice").resolve("lambda").toString
    val slicePath = java.nio.file.Files
      .createTempDirectory("dsir_slice").resolve("docs").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0).write.parquet(s"$slicePath/documents.parquet")
    Sampling.dsirFit(spark, slicePath, modelPath)
    // dense model: exactly DsirBuckets rows, every bucket defined
    assert(spark.read.parquet(modelPath).count() == Sampling.DsirBuckets)
    val scored = Sampling.dsirScoreWith(spark, sf, modelPath)
    val inline = Sampling.dsirWeights(spark, sf)
    // every doc keeps its FULL gram count — nothing dropped by the join
    val gramsByDoc = inline.select(col("doc_id"), col("n_grams").as("n_inline"))
    val drop = scored.join(gramsByDoc, Seq("doc_id"))
      .filter(col("n_grams") =!= col("n_inline")).count()
    assert(drop == 0, "cross-corpus scoring must not drop grams on unseen buckets")
    assert(scored.count() == inline.count())
  }

  test("incremental dedup: a re-sent doc_id does not halve its jaccard") {
    import org.apache.spark.sql.functions._
    import graft.ops.DedupOps
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val all = DedupOps.corpus(spark, sf)
    // delivery = the twins PLUS a re-sent copy of base doc 0 (same id,
    // same text — an idempotent re-delivery)
    val resent = base.filter(col("doc_id") === 0L).select(col("doc_id"), col("text"))
    val delta = all.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id"), col("text")).unionByName(resent)
    val idx = java.nio.file.Files
      .createTempDirectory("minhash_idx2").resolve("bands").toString
    DedupOps.buildMinhashIndex(base, idx)
    val inc = DedupOps.minhashDedupIncremental(spark, delta, idx, base)
    // pre-fix doc 0's shingles counted twice → jaccard(0, 1000000)
    // halved below the 0.5 threshold and the pair vanished
    val pair = inc.filter(col("a") === 0L && col("b") === 1000000L).collect()
    assert(pair.length == 1, "the twin pair of a re-sent doc must survive")
    val batch = DedupOps.dupPairsFrom(all)
      .filter(col("a") === 0L && col("b") === 1000000L).collect()
    assert(pair.head.getAs[Double]("jaccard") == batch.head.getAs[Double]("jaccard"))
  }

  test("A/B spend statistics stay exact where cents-squared sums would wrap int64 (round-11 ADVICE)") {
    import spark.implicits._
    // 1000 users at ~$35M lifetime: Σcents² ≈ 1000 · (3.5e9)² ≈ 1.2e22,
    // FAR past Long.MaxValue (9.2e18) — the pre-fix accumulation wrapped
    // silently here while DuckDB widened to HUGEINT. Dollar-quantized,
    // Σusd² ≈ 1.2e18 fits with headroom.
    val perUser = (1L to 1000L)
      .map(u => (u, (u % 2).toLong, 3000000000L + u * 1000000L))
      .toDF("user_id", "converted", "cents")
    val row = graft.queries.Behavioral.abTestOf(perUser).collect().head
    val z = row.getDouble(9)
    assert(!z.isNaN && !z.isInfinite, s"z_mean_spend not finite: $z")
    // hand-computed Welch z over the dollar-quantized metric, BigInt
    // sums so the reference itself cannot wrap
    val arms = (1L to 1000L).map { u =>
      val cents = 3000000000L + u * 1000000L
      val usd = Math.round(cents / 100.0)
      ((u * graft.queries.Behavioral.AbHashA + graft.queries.Behavioral.AbHashB)
        % graft.queries.Behavioral.AbMod % 2, usd)
    }
    def stats(a: Long): (Long, BigInt, BigInt) = {
      val xs = arms.filter(_._1 == a).map(_._2)
      (xs.size.toLong, xs.map(BigInt(_)).sum, xs.map(x => BigInt(x) * x).sum)
    }
    val (na, sa, ssa) = stats(0)
    val (nb, sb, ssb) = stats(1)
    def meanVar(n: Long, s: BigInt, ss: BigInt): (Double, Double) = {
      val m = s.toDouble / n
      ((m, (ss.toDouble - s.toDouble * s.toDouble / n) / (n - 1)))
    }
    val (ma, va) = meanVar(na, sa, ssa)
    val (mb, vb) = meanVar(nb, sb, ssb)
    val want = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(math.abs(z - want) < 1e-9, s"z $z != BigInt-reference $want")
  }

  test("MMR on a singleton pool returns the anchor row like the oracle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mmr_tiny").toString
    Seq(
      (0L, Array.fill(8)(0.5f), 0),
      (7L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -0.25f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // pool = {7} only; pre-fix rel was derived from the empty a≠b
    // self-join and the query returned 0 rows while the oracle's
    // anchor SELECT returned one
    val out = graft.ops.SimilarityOps.mmrSelect(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 7L)
    assert(out.head.getLong(2) == out.head.getLong(3)) // mmr = rel for the anchor
  }
}
