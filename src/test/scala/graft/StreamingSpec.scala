package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamingSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate into 5-minute tumbling windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    in.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "click", 2.0),
      Event(3, ts(6), 1, "view", 3.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, total_value FROM wc ORDER BY event_type").collect()
    q.stop()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("watermark drops events later than 10 minutes behind max ts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("wm").outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(2, ts(30), 1, "click", 1.0)) // advances watermark to 10:20
    q.processAllAvailable()
    in.addData(Event(3, ts(1), 1, "click", 99.0)) // late beyond watermark -> dropped
    q.processAllAvailable()
    in.addData(Event(4, ts(45), 1, "click", 1.0)) // flush closed windows
    q.processAllAvailable()
    val emitted = spark.sql("SELECT sum(n) FROM wm WHERE w_start = timestamp'2024-01-01 10:00:00'")
      .collect()(0).getLong(0)
    q.stop()
    assert(emitted == 1L, "late event must not be counted")
  }

  test("daily-rollup stream: partition upsert accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val path = s"$dir/daily"
    val in = MemoryStream[Event]
    val q = StreamOps.dailyRollupStream(spark, in.toDF(), path)
    in.addData(
      Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-02 09:00:00"), 2, "view", 5.0))
    q.processAllAvailable()
    // second batch touches an existing day (merge) and a new one (insert)
    in.addData(
      Event(4, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 4.0),
      Event(5, Timestamp.valueOf("2024-01-03 08:00:00"), 1, "view", 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(path)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total")))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      ("2024-01-01", "click", 3L, 7.0),
      ("2024-01-02", "view", 1L, 5.0),
      ("2024-01-03", "view", 1L, 7.0)))
  }

  test("daily-rollup stream restarts from its checkpoint without double counting") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rollup_ckpt").toString
    val (inDir, table, ckpt) = (s"$root/in", s"$root/daily", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    val schema = Seq.empty[Event].toDF().schema
    def arrive(name: String, evs: Event*): Unit =
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(s"$inDir/$name")
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$inDir/*")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          StreamOps.dailyRollupBatch(spark, batch, table, batchId); ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    arrive("b1", Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-02 09:00:00"), 2, "view", 5.0))
    run()
    // restart: the same files are still in the directory; the checkpoint
    // must prevent re-ingesting batch 1 while picking up batch 2
    arrive("b2", Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 4.0))
    run()
    val rows = spark.read.parquet(table).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total")))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      ("2024-01-01", "click", 2L, 5.0), // 1.0 + 4.0, NOT re-counted on restart
      ("2024-01-02", "view", 1L, 5.0)))
  }

  test("daily-rollup batch replay (same batchId) is idempotent, next batch still merges") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft_rollup_replay").toString + "/daily"
    def batchDf(evs: Event*) = evs.toDF()
    val b0 = batchDf(
      Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-02 09:00:00"), 2, "view", 5.0))
    StreamOps.dailyRollupBatch(spark, b0, table, batchId = 0L)
    // the foreachBatch failure window: sink write committed, offset not —
    // the SAME batch (id + data) replays. Totals must not change.
    StreamOps.dailyRollupBatch(spark, b0, table, batchId = 0L)
    def snapshot() = spark.read.parquet(table).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snapshot() == Seq(
      ("2024-01-01", "click", 1L, 1.0),
      ("2024-01-02", "view", 1L, 5.0)), "replayed batch must not double-count")
    // a NEW batch touching the same day still merges additively
    StreamOps.dailyRollupBatch(spark,
      batchDf(Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 4.0)),
      table, batchId = 1L)
    StreamOps.dailyRollupBatch(spark, // and its replay is also a no-op
      batchDf(Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 4.0)),
      table, batchId = 1L)
    assert(snapshot() == Seq(
      ("2024-01-01", "click", 2L, 5.0),
      ("2024-01-02", "view", 1L, 5.0)))
  }

  test("stream-static enrichment joins the broadcast dim, unmatched -> unknown") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "pro"), (2L, "free")).toDF("user_id", "segment")
    val in = MemoryStream[Event]
    val q = StreamOps.enrichWithDim(in.toDF(), dim)
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "view", 2.0),
      Event(3, ts(2), 99, "click", 3.0)) // user absent from the dim
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_id, segment FROM enr ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    q.stop()
    assert(rows == Seq((1L, "pro"), (2L, "free"), (3L, "unknown")))
  }

  test("session windows merge events within the gap and split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    in.addData(
      Event(1, ts(0), 7, "click", 0), Event(2, ts(10), 7, "click", 0), // same session
      Event(3, ts(55), 7, "click", 0)) // > 30 min gap -> new session
    q.processAllAvailable()
    val n = spark.sql("SELECT count(*) FROM sess WHERE user_id = 7").collect()(0).getLong(0)
    q.stop()
    assert(n == 2, s"expected 2 sessions, got $n")
  }

  test("streaming HLL cardinality: final registers equal the batch pipeline, batch-split-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60 events over 2 keys with repeated users; split across 3 batches
    val evs = (0 until 60).map(i =>
      Event(i.toLong, ts(i % 30), (i * 7 % 23).toLong,
        if (i % 3 == 0) "click" else "view", 1.0))
    def run(name: String, chunks: Seq[Seq[Event]]): Map[String, (Long, Long, Long, Long)] = {
      val in = MemoryStream[Event]
      val q = StreamOps.hllDistinctStream(in.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val rows = spark.sql(
        s"SELECT event_type, n_hit, n_zero, s_scaled, est_milli FROM $name")
        .collect()
      q.stop()
      // last emission per key (the memory sink appends update rows in
      // batch order; group and take the final state row)
      rows.groupBy(_.getString(0)).map { case (k, rs) =>
        val r = rs.last
        k -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }
    }
    val a = run("hll3", Seq(evs.take(20), evs.slice(20, 45), evs.drop(45)))
    val b = run("hll1", Seq(evs))
    assert(a == b, "final sketch state must not depend on batch boundaries")
    // cross-implementation parity: the batch SQL-expression pipeline over
    // the same rows must produce the identical registers and estimate
    val batchRows = graft.ops.SketchOps.hllKeyed(
        evs.toDF(), col("event_type"), col("user_id"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(a == batchRows,
      s"stream state $a must equal the batch register pipeline $batchRows")
  }

  test("streaming CMS grid equals the batch sketch probes, batch-split-invariant") {
    import spark.implicits._
    import graft.ops.SketchOps.{CmsMod, CmsWidth, cmsAB}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the SAME corpus terms the batch sketch counts, via the batch tokenizer
    val terms = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .as[String].collect().toSeq
    def run(name: String, chunks: Seq[Seq[String]]): Map[(Int, Long), Long] = {
      val in = MemoryStream[String]
      val q = StreamOps.cmsStream(in.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val rows = spark.sql(s"SELECT d, slot, c FROM $name").collect()
      q.stop()
      rows.groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).max } // counters only grow
    }
    val third = terms.length / 3
    val a = run("cms3", Seq(terms.take(third),
      terms.slice(third, 2 * third), terms.drop(2 * third)))
    val b = run("cms1", Seq(terms))
    assert(a == b, "final counter grid must not depend on batch boundaries")
    // probe parity: min-over-rows estimates from the stream grid must
    // equal the registered batch pipeline's cms_est for every probe term
    val batch = graft.ops.SketchOps.cmsHeavyHitters(spark, dir).collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val term = r.getString(0)
      val h = graft.functions.PolyHash.fold(
        org.apache.spark.unsafe.types.UTF8String.fromString(term), 31L, CmsMod)
      val streamEst = cmsAB.zipWithIndex.map { case ((aa, bb), d) =>
        a((d, ((aa * h + bb) % CmsMod) % CmsWidth))
      }.min
      assert(streamEst == r.getLong(2),
        s"probe '$term': stream est $streamEst != batch est ${r.getLong(2)}")
    }
  }

  test("streaming quantile grid equals the batch sketch and its quantile picks, batch-split-invariant") {
    import spark.implicits._
    import graft.ops.SketchOps.{QWidthMilli, QuantilesMilli}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val vals = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long)].collect().toSeq
    def run(name: String, chunks: Seq[Seq[(String, Long)]]): Map[(String, Long), Long] = {
      val in = MemoryStream[(String, Long)]
      val q = StreamOps.quantileHistStream(in.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val rows = spark.sql(s"SELECT grp, bucket, c FROM $name").collect()
      q.stop()
      rows.groupBy(r => (r.getString(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).max }
    }
    val third = vals.length / 3
    val a = run("qh3", Seq(vals.take(third), vals.slice(third, 2 * third), vals.drop(2 * third)))
    val b = run("qh1", Seq(vals))
    assert(a == b, "final grid must not depend on batch boundaries")
    // grid parity vs the batch SQL-expression bucketing on the same rows
    val batchGrid = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        expr(s"CAST(round(1000 * ln(1 + CAST(round(o_totalprice * 100) AS BIGINT))) AS BIGINT) DIV $QWidthMilli").as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == batchGrid, "stream cells must equal the batch expression grid")
    // quantile picks from the stream grid must equal the registered op's
    val picks = graft.ops.SketchOps.quantileHist(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    picks.foreach { case ((grp, qMilli), expectBucket) =>
      val cells = a.collect { case ((g, bkt), c) if g == grp => (bkt, c) }.toSeq.sortBy(_._1)
      val n = cells.map(_._2).sum
      val thr = (n * qMilli + 999) / 1000
      val got = cells.scanLeft((Long.MinValue, 0L)) { case ((_, cum), (bkt, c)) => (bkt, cum + c) }
        .find(_._2 >= thr).get._1
      assert(got == expectBucket, s"($grp, $qMilli): stream pick $got != batch $expectBucket")
    }
  }

  test("streaming misra-gries: MG guarantee holds against exact counts at every batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val terms = spark.read.parquet(s"$dir/documents.parquet")
      .limit(100)
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .as[String].collect().toSeq
    def shardOf(t: String): Int = {
      val h = graft.functions.PolyHash.fold(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 31L, StreamOps.MgMod)
      (h % StreamOps.MgShards).toInt
    }
    val exact = terms.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val perShardN = terms.groupBy(shardOf).map { case (s, g) => s -> g.length.toLong }
    def run(name: String, chunks: Seq[Seq[String]]): Map[Int, (Map[String, Long], Long)] = {
      val in = MemoryStream[String]
      val q = StreamOps.heavyHittersStream(in.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val rows = spark.sql(s"SELECT shard, n, terms, ests, decs FROM $name").collect()
      q.stop()
      rows.groupBy(_.getInt(0)).map { case (s, rs) =>
        val last = rs.maxBy(_.getLong(1)) // n is monotone: max-n = final
        s -> (last.getSeq[String](2).zip(last.getSeq[Long](3)).toMap, last.getLong(4))
      }
    }
    val third = terms.length / 3
    for ((label, chunks) <- Seq(
        "split3" -> Seq(terms.take(third), terms.slice(third, 2 * third), terms.drop(2 * third)),
        "split1" -> Seq(terms))) {
      val got = run(s"mg_$label", chunks)
      got.foreach { case (shard, (summary, decs)) =>
        assert(summary.size <= StreamOps.MgK, s"$label shard $shard over capacity")
        // the classic MG error price: decs <= N_shard / (K + 1)
        assert(decs <= perShardN(shard) / (StreamOps.MgK + 1),
          s"$label shard $shard decs $decs too large")
        summary.foreach { case (t, est) =>
          val tr = exact(t)
          assert(est <= tr && est >= tr - decs,
            s"$label shard $shard '$t': est $est outside [${tr - decs}, $tr]")
        }
        // completeness: every term heavier than the decrement total survives
        exact.foreach { case (t, tr) =>
          if (shardOf(t) == shard && tr > decs)
            assert(summary.contains(t), s"$label shard $shard lost heavy term '$t' ($tr > $decs)")
        }
      }
      // every shard that received data reports
      assert(got.keySet == perShardN.keySet)
    }
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("rt").outputMode("append").start()
    in.addData(Event(1, ts(0), 5, "click", 10.0))
    q.processAllAvailable()
    in.addData(Event(2, ts(1), 5, "click", 5.0))
    q.processAllAvailable()
    val last = spark.sql("SELECT n, total FROM rt WHERE user_id = 5 ORDER BY n DESC LIMIT 1")
      .collect()(0)
    q.stop()
    assert(last.getLong(0) == 2L && last.getDouble(1) == 15.0)
  }

  test("idle user state is evicted after the event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.runningTotals(in.toDS(), java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("evict").outputMode("append").start()
    in.addData(Event(1, ts(0), 5, "click", 10.0)) // user 5: timeout at 10:30
    q.processAllAvailable()
    in.addData(Event(2, Timestamp.valueOf("2024-01-01 11:10:00"), 6, "click", 1.0))
    q.processAllAvailable() // watermark -> 11:00, past user 5's 10:30
    in.addData(Event(3, Timestamp.valueOf("2024-01-01 11:20:00"), 6, "click", 1.0))
    q.processAllAvailable() // this batch fires user 5's timeout -> state removed
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 11:30:00"), 5, "click", 7.0))
    q.processAllAvailable() // user 5 returns: totals must restart from zero
    val rows = spark.sql(
      "SELECT n, total FROM evict WHERE user_id = 5 ORDER BY total DESC").collect()
    q.stop()
    assert(rows.length == 2, s"expected 2 emitted rows for user 5, got ${rows.length}")
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 10.0)
    // after eviction the counter restarts at 1 with only the new value —
    // with unbounded state this row would read (2, 17.0)
    assert(rows(1).getLong(0) == 1L && rows(1).getDouble(1) == 7.0)
  }

  test("streaming dedup emits each event_id once within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "click", 1.0), Event(1, ts(0), 1, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(2), 1, "click", 9.0), Event(2, ts(3), 2, "view", 2.0))
    q.processAllAvailable()
    val got = spark.sql("SELECT event_id, count(*) FROM dd GROUP BY 1 ORDER BY 1").collect()
    q.stop()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("stream-stream interval join pairs clicks within 10 minutes of impression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = StreamOps.impressionClickJoin(imps.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    imps.addData(Event(100, ts(0), 1, "imp", 0))
    clicks.addData(
      Event(200, ts(5), 1, "click", 0),   // within 10 min -> joins
      Event(201, ts(30), 1, "click", 0),  // too late -> no join
      Event(202, ts(4), 2, "click", 0))   // other user -> no join
    q.processAllAvailable()
    // advance both watermarks so joined results flush
    imps.addData(Event(101, ts(59), 9, "imp", 0))
    clicks.addData(Event(203, ts(59), 9, "click", 0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT imp_id, click_id FROM ssj WHERE user_id = 1").collect()
    q.stop()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((100L, 200L)))
  }

  test("salted join equals the plain join exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = graft.ops.Skew.saltedJoin(li, o, "l_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.select("l_orderkey", "l_linenumber", "o_totalprice")
      .except(plain.select("l_orderkey", "l_linenumber", "o_totalprice")).count() == 0)
  }

  test("incremental streaming near-dup flags twins arriving in a later batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50).cache()
    val twins = graft.ops.DedupOps.withTwins(docs)
      .filter(col("doc_id") >= 1000000L).as[(Long, String)].collect()
    val originals = docs.as[(Long, String)].collect()

    val in = MemoryStream[(Long, String)]
    val q = StreamOps.nearDupStreamIngest(
      spark, in.toDF().toDF("doc_id", "text"), dir)
    in.addData(originals.toSeq: _*) // batch 1: originals only -> no index yet
    q.processAllAvailable()
    in.addData(twins.toSeq: _*)     // batch 2: twins collide with batch 1
    q.processAllAvailable()
    q.stop()

    val pairs = spark.read.parquet(s"$dir/dup_pairs")
    // nearly every twin should collide with its original in some band
    val twinHits = pairs.filter(col("b") === col("a") + 1000000L).count()
    assert(twinHits >= (docs.count() * 0.95).toLong)
    // every emitted pair is canonical (a < b) and passed the exact
    // Jaccard >= 0.5 verify — never a raw LSH band collision
    assert(pairs.filter(col("a") >= col("b")).count() == 0)
    assert(pairs.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("streaming near-dup catches pairs arriving in the SAME micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dedup1").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50).cache()
    val corpus = graft.ops.DedupOps.withTwins(docs).as[(Long, String)].collect()

    val in = MemoryStream[(Long, String)]
    val q = StreamOps.nearDupStreamIngest(
      spark, in.toDF().toDF("doc_id", "text"), dir)
    in.addData(corpus.toSeq: _*) // originals AND twins in one batch
    q.processAllAvailable()
    q.stop()

    val pairs = spark.read.parquet(s"$dir/dup_pairs")
    val twinHits = pairs.filter(col("b") === col("a") + 1000000L).count()
    assert(twinHits >= (docs.count() * 0.95).toLong)
    assert(pairs.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("foreachBatch chain ingest reuses batch flattens and lands correct rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = MemoryStream[Long]
    val q = StreamOps.chainIngestStream(spark, in.toDF().withColumnRenamed("value", "number"), dir)
    in.addData(0L to 9L: _*)
    q.processAllAvailable()
    in.addData(10L to 19L: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$dir/transactions_stream").drop("batch_id")
    val expected = (0L to 19L).map(n => (n % 5) + 1).sum
    assert(got.count() == expected)
    // identical to the batch path over the same range
    val batch = graft.etl.Flatten.transactionRows(
      graft.etl.ChainFixture.blocks(spark, 0, 19),
      graft.etl.ChainFixture.receipts(spark, 0, 19))
    assert(got.except(batch).count() == 0 && batch.except(got).count() == 0)
  }

  test("streaming near-dup state writes are replay-idempotent per batchId") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_replay").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30).cache()
    val originals = docs
    val twins = graft.ops.DedupOps.withTwins(docs).filter(col("doc_id") >= 1000000L)

    // committed history: batch 0 = originals, batch 1 = twins
    StreamOps.nearDupBatch(spark, originals, dir, batchId = 0L)
    StreamOps.nearDupBatch(spark, twins, dir, batchId = 1L)
    def snap(tbl: String): Seq[String] =
      spark.read.parquet(s"$dir/$tbl").collect().map(_.toString).sorted.toSeq
    val (pairs0, idx0, sh0) = (snap("dup_pairs"), snap("band_index"), snap("shingle_index"))
    assert(pairs0.nonEmpty)

    // the foreachBatch failure window: batch 1's sink writes landed but
    // its offsets did not commit, so the SAME batchId replays with the
    // SAME data against state that already contains its writes
    StreamOps.nearDupBatch(spark, twins, dir, batchId = 1L)
    assert(snap("dup_pairs") == pairs0,
      "replayed batch must rewrite, not duplicate, dup_pairs")
    assert(snap("band_index") == idx0 && snap("shingle_index") == sh0,
      "replayed batch must not grow the state tables")
  }

  test("streaming funnel equals the batch window chain on the time-ordered fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the real events table, delivered tip-follow style in 3 time-ordered
    // micro-batches — final streaming state must equal the batch query
    val ev = graft.queries.Relational.events(spark, sf)
    val ordered = ev
      .select(col("event_id"), col("_ms"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("_ms"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), new Timestamp(r.getLong(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val in = MemoryStream[Event]
    val q = StreamOps.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("fun").outputMode("append").start()
    ordered.grouped(math.max(1, ordered.length / 3 + 1)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val got = spark.sql(
      "SELECT user_id, level, t1, t2, t3 FROM fun")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    q.stop()
    val want = graft.queries.Behavioral.windowFunnelPerUser(ev)
      .collect()
      .map { r =>
        def g(i: Int) = if (r.isNullAt(i)) -1L else r.getLong(i)
        val (t1, t2, t3) = (g(1), g(2), g(3))
        val level = if (t3 >= 0) 3L else if (t2 >= 0) 2L else if (t1 >= 0) 1L else 0L
        r.getLong(0) -> ((level, t1, t2, t3))
      }
      .filter(_._2._1 >= 1L).toMap
    assert(got == want,
      s"streaming/batch funnel divergence: extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("streaming transitions equal the batch lag-window matrix on the time-ordered fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Relational.events(spark, sf)
    val ordered = ev
      .select(col("event_id"), col("_ms"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("_ms"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), new Timestamp(r.getLong(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val in = MemoryStream[Event]
    val q = StreamOps.transitionsStream(in.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    ordered.grouped(math.max(1, ordered.length / 3 + 1)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val got = spark.sql(
      "SELECT from_event, to_event, count(*) AS n FROM trans GROUP BY 1, 2")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    val want = graft.queries.Behavioral.transitionsOf(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want,
      s"streaming/batch transition divergence: extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("streaming as-of join: matches equal batch q22 on the time-ordered fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Relational.events(spark, sf)
    val ordered = ev
      .select(col("event_id"), col("_ms"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("_ms"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), new Timestamp(r.getLong(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val in = MemoryStream[Event]
    val q = StreamOps.asofStream(in.toDS())
      .writeStream.format("memory").queryName("asofs").outputMode("append").start()
    // deliver in several micro-batches: state must carry clicks across
    // batch boundaries for matches to stay batch-identical
    ordered.grouped(math.max(1, ordered.length / 4 + 1)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val got = spark.sql(
      "SELECT user_id, purchase_id, last_click_id, last_click_ms FROM asofs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
         Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    q.stop()
    val want = graft.queries.Relational.q22(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
         Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got == want,
      s"streaming/batch as-of divergence: extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("streaming scd2: closed versions equal the batch dimension on the time-ordered fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Relational.events(spark, sf)
    val ordered = ev
      .select(col("event_id"), col("_ms"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("_ms"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), new Timestamp(r.getLong(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val in = MemoryStream[Event]
    val q = StreamOps.scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("scd2s").outputMode("append").start()
    ordered.grouped(math.max(1, ordered.length / 3 + 1)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val got = spark.sql(
      "SELECT user_id, version, attr, valid_from_ms, valid_to_ms, n_events FROM scd2s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    q.stop()
    // nothing timed out inside the fixture's span, so the stream emitted
    // exactly the CLOSED versions; the batch non-current rows must match
    val want = graft.queries.Behavioral.scd2(spark, sf)
      .filter(!col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want,
      s"streaming/batch scd2 divergence: extra=${(got -- want).take(3)} " +
        s"missing=${(want -- got).take(3)}")
  }

  test("streaming scd2: eviction finalizes the open version; a returning user restarts at v1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = 3600000L // 1 h
    val B = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val in = MemoryStream[Event]
    val q = StreamOps.scd2Stream(in.toDS(),
        retention = java.time.Duration.ofHours(1))
      .writeStream.format("memory").queryName("scd2ev").outputMode("append").start()
    // batch 1: user 7 opens version 1 (A×2) then version 2 (B) — v1 closes
    in.addData(Event(1L, new Timestamp(B), 7L, "A", 0.0),
      Event(2L, new Timestamp(B + 1000L), 7L, "A", 0.0),
      Event(3L, new Timestamp(B + 2000L), 7L, "B", 0.0))
    q.processAllAvailable()
    // batches 2-3: another user far ahead advances the watermark, then an
    // empty-for-7 batch fires the timeout -> v2 finalized as current
    in.addData(Event(4L, new Timestamp(B + 10L * D), 8L, "X", 0.0))
    q.processAllAvailable()
    in.addData(Event(5L, new Timestamp(B + 10L * D + 500L), 8L, "X", 0.0))
    q.processAllAvailable()
    // batch 4: user 7 returns -> fresh episode, version numbering restarts
    in.addData(Event(6L, new Timestamp(B + 10L * D + 1000L), 7L, "C", 0.0),
      Event(7L, new Timestamp(B + 10L * D + 2000L), 7L, "D", 0.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, version, attr, valid_to_ms, n_events, is_current FROM scd2ev WHERE user_id = 7")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), Option(r.get(3)), r.getLong(4),
        r.getBoolean(5))).toSet
    q.stop()
    // v1 closed by the A->B change with 2 events
    assert(rows.contains((1L, "A", Some(B + 2000L), 2L, false)))
    // v2 finalized OPEN by the eviction (valid_to null, is_current true)
    assert(rows.contains((2L, "B", None, 1L, true)))
    // the returning user's C run is a fresh v1, closed by the C->D change
    assert(rows.contains((1L, "C", Some(B + 10L * D + 2000L), 1L, false)))
  }

  test("streaming transitions: an evicted user starts a fresh chain, never a phantom pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = 3600000L // 1 h
    // a base comfortably above the initial watermark (0): a ts at epoch 0
    // is "late" against the starting watermark and silently dropped
    val B = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val in = MemoryStream[Event]
    val q = StreamOps.transitionsStream(in.toDS(),
        retention = java.time.Duration.ofHours(1))
      .writeStream.format("memory").queryName("transev").outputMode("append").start()
    // batch 1: user 7 emits view then click (one transition)
    in.addData(Event(1L, new Timestamp(B), 7L, "view", 0.0),
      Event(2L, new Timestamp(B + 1000L), 7L, "click", 0.0))
    q.processAllAvailable()
    // batch 2: another user far in the future advances the watermark past
    // user 7's retention horizon
    in.addData(Event(3L, new Timestamp(B + 10L * D), 8L, "view", 0.0))
    q.processAllAvailable()
    // batch 3: a further batch WITHOUT user-7 data fires the timeout
    // (timed-out groups are only evicted when invoked with no new data)
    in.addData(Event(6L, new Timestamp(B + 10L * D + 500L), 8L, "click", 0.0))
    q.processAllAvailable()
    // batch 4: user 7 returns — the bridging click->purchase pair must NOT
    // appear (state was dropped); only later in-episode pairs may
    in.addData(Event(4L, new Timestamp(B + 10L * D + 1000L), 7L, "purchase", 0.0),
      Event(5L, new Timestamp(B + 10L * D + 2000L), 7L, "error", 0.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, from_event, to_event FROM transev")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    q.stop()
    assert(rows.contains((7L, "view", "click")))
    assert(!rows.contains((7L, "click", "purchase")),
      "phantom transition across an eviction")
    assert(rows.contains((7L, "purchase", "error")), "fresh episode must chain")
  }

  test("streaming funnel: evicted user re-anchors as a fresh episode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // 1-hour retention: user 5's day-1 level-1 funnel is evicted once the
    // watermark passes; the day-3 return starts a NEW anchor and climbs
    // to level 2 in one batch
    val q = StreamOps.funnelStream(in.toDS(),
        retention = java.time.Duration.ofHours(1))
      .writeStream.format("memory").queryName("episode").outputMode("append").start()
    in.addData(Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 5, "view", 0))
    q.processAllAvailable()
    // another user pushes the watermark days past user 5's timeout
    in.addData(Event(2, Timestamp.valueOf("2024-01-03 10:00:00"), 6, "view", 0))
    q.processAllAvailable()
    in.addData(Event(3, Timestamp.valueOf("2024-01-03 12:00:00"), 6, "click", 0))
    q.processAllAvailable() // fires user 5's timeout -> state removed
    in.addData(
      Event(4, Timestamp.valueOf("2024-01-03 13:00:00"), 5, "view", 0),
      Event(5, Timestamp.valueOf("2024-01-03 13:05:00"), 5, "click", 0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT level, t1 FROM episode WHERE user_id = 5 ORDER BY t1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    val day1 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val day3 = Timestamp.valueOf("2024-01-03 13:00:00").getTime
    assert(rows == Seq((1L, day1), (2L, day3)),
      "expected the old episode's level-1 row, then a re-anchored level-2 row")
  }

  test("streaming attribution credits equal the batch multi-touch query on the time-ordered fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Relational.events(spark, sf)
    val ordered = ev
      .select(col("event_id"), col("_ms"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("_ms"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), new Timestamp(r.getLong(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val in = MemoryStream[Event]
    val q = StreamOps.attributionStream(in.toDS())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    ordered.grouped(math.max(1, ordered.length / 3 + 1)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // aggregate the emitted per-touch credits to the batch query's grain
    val got = spark.sql(
      """SELECT user_id, touch_type, count(*) AS n_touches,
        |  count(DISTINCT p_id) AS n_conversions,
        |  sum(credit_milli) AS credit_milli_total
        |FROM attr GROUP BY 1, 2""".stripMargin)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // per-purchase credits must sum to exactly 1000
    val perPurchase = spark.sql(
      "SELECT p_id, sum(credit_milli) AS s FROM attr GROUP BY 1")
      .collect().map(_.getLong(1)).toSet
    q.stop()
    assert(perPurchase == Set(1000L), s"credit split must be exact: $perPurchase")
    val want = graft.queries.Behavioral.attributionOf(ev)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == want,
      s"streaming/batch attribution divergence: extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }
}
