package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamOps, StreamParity}
import graft.streaming.StreamOps.Event

/** Pins the EXACT watermark semantics the ordered-replay oracles
  * (stream_window/sliding/session_parity) encode in SQL. Spark runs TWO
  * watermarks per micro-batch (SPARK-42376): the late-row filter uses
  * the PREVIOUS batch's watermark (filter_wm(k) = evict_wm(k−1) = max
  * event time over batches ≤ k−2, minus delay) while state
  * eviction/emission uses the advanced one (evict_wm(k) = max over
  * batches < k, minus delay). Each test here is one comparator in
  * StreamParity's oracle CTEs:
  *
  *   1. the late filter keys on `window.end`, lagged one batch — a row
  *      whose raw ts is behind filter_wm but whose window end is past it
  *      still aggregates;
  *   2. the no-data finalization batch runs under processAllAvailable,
  *      so the final emission cutoff is max(event time) − delay over ALL
  *      batches — not the watermark of the last data batch;
  *   3. the filter comparator at exact equality is `window.end <= wm` →
  *      drop (and eviction at equality emits);
  *   4. the file source's mtime ordering is the batch order under
  *      maxFilesPerTrigger=1 (end-to-end through streamWindowParity on
  *      a hand-built fixture with a hand-computed drop set exercising
  *      keep-late, drop-late, and withhold-open outcomes).
  */
class StreamOrderedSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("late filter keys on window end and lags one batch behind eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("wend").outputMode("append").start()
    try {
      in.addData(Event(1, ts(16), 1, "click", 1.0)) // b1: window [10:15,10:20)
      q.processAllAvailable()
      in.addData(Event(2, ts(28), 1, "click", 1.0)) // b2: max -> 10:28
      q.processAllAvailable()
      in.addData(Event(3, ts(28), 1, "click", 1.0)) // b3 (+ no-data b4)
      q.processAllAvailable()
      // Next batch's filter_wm = prior evict_wm = 10:28 − 10 min = 10:18.
      // ts 10:17 is BEHIND that watermark, but window end 10:20 is past
      // it: the row must still aggregate (the oracle keeps rows with
      // wend > filter_wm, whatever their raw ts).
      in.addData(Event(4, ts(17), 1, "click", 1.0))
      q.processAllAvailable()
      in.addData(Event(5, ts(40), 1, "click", 1.0)) // final wm 10:30: flush
      q.processAllAvailable()
      val n = spark.sql(
        "SELECT n FROM wend WHERE w_start = timestamp'2024-01-01 10:15:00'")
        .collect()(0).getLong(0)
      assert(n == 2L, "ts-behind-watermark row into a still-open window must count")
    } finally q.stop()
  }

  test("no-data finalization batch emits closed windows under processAllAvailable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("nodata").outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 1, "click", 1.0)) // window [10:00,10:05)
      q.processAllAvailable()
      // This batch moves the eviction watermark to 10:17; the
      // [10:00,10:05) window must then be emitted by the trailing
      // no-data batch WITHOUT any further input — the oracles' final
      // cutoff (max ms − delay over ALL batches) depends on exactly this.
      in.addData(Event(2, ts(27), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT n FROM nodata WHERE w_start = timestamp'2024-01-01 10:00:00'").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 1L,
        "watermark-closed window must flush on the no-data batch")
    } finally q.stop()
  }

  test("boundary: eviction at end == wm emits; filter at end == wm drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("exact").outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 1, "click", 1.0)) // window end 10:05
      q.processAllAvailable()
      // b2 max 10:15 -> no-data b3 runs with evict_wm EXACTLY 10:05:
      in.addData(Event(2, ts(15), 1, "click", 1.0))
      q.processAllAvailable()
      val emitted = spark.sql(
        "SELECT count(*) FROM exact WHERE w_start = timestamp'2024-01-01 10:00:00'")
        .collect()(0).getLong(0)
      assert(emitted == 1L, "end == evict_wm must evict/emit (the <= comparator)")
      // The NEXT batch's filter_wm is that same 10:05 (previous batch's
      // watermark): a late row whose window end equals it is dropped —
      // the oracle's strict `wend > wm` keep-predicate.
      in.addData(Event(3, ts(1), 1, "click", 99.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(45), 1, "click", 1.0))
      q.processAllAvailable()
      val n = spark.sql(
        "SELECT max(n) FROM exact WHERE w_start = timestamp'2024-01-01 10:00:00'")
        .collect()(0).getLong(0)
      assert(n == 1L, "row with wend == filter_wm must be dropped")
    } finally q.stop()
  }

  test("ordered landing drives batches in mtime order: hand-computed drop set") {
    import spark.implicits._
    // Hand-built events fixture, batch = event_id % 4:
    //   b0: e0 10:01, e4 11:31          b1: e1 10:02, e5 11:32
    //   b2: e2 11:23, e6 11:33          b3: e3 11:19, e7 11:34, e11 11:44
    // filter_wm: b0/b1 = 0; b2 = 11:31−10m = 11:21; b3 = 11:32−10m = 11:22.
    // Outcomes: e1 KEPT (filter lags: wm 0 in b1) -> [10:00,05) n=2;
    //   e2 KEPT late (wend 11:25 > 11:21) -> [11:20,25) n=1;
    //   e3 DROPPED (wend 11:20 <= 11:22);
    //   e4..e7 [11:30,35) and e11 [11:40,45) WITHHELD: final wm =
    //   11:44 − 10 min = 11:34 < their ends.
    val dir = java.nio.file.Files.createTempDirectory("graft_ordered").toString
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (0L, t(10, 1), 1L, "click", 1.0), (1L, t(10, 2), 1L, "click", 1.0),
      (2L, t(11, 23), 1L, "click", 1.0), (3L, t(11, 19), 1L, "click", 1.0),
      (4L, t(11, 31), 1L, "click", 1.0), (5L, t(11, 32), 1L, "click", 1.0),
      (6L, t(11, 33), 1L, "click", 1.0), (7L, t(11, 34), 1L, "click", 1.0),
      (11L, t(11, 44), 1L, "click", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = StreamParity.streamWindowParity(spark, dir)
      .select(col("w_start_ms"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wStart = (h: Int, m: Int) => t(h, m).getTime
    assert(out == Seq((wStart(10, 0), 2L), (wStart(11, 20), 1L)),
      s"ordered drop set mismatch: $out")
  }

  test("dedup: same-event-time duplicates never re-emit (the DISTINCT-oracle theorem)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = graft.streaming.StreamOps.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("ddp").outputMode("append").start()
    try {
      // in-batch dup + first occurrences
      in.addData(Event(1, ts(0), 1, "a", 1.0), Event(1, ts(0), 1, "a", 1.0),
        Event(2, ts(1), 1, "a", 1.0))
      q.processAllAvailable()
      // cross-batch dup with state alive (wm still 0) -> dropped
      in.addData(Event(1, ts(0), 1, "a", 1.0))
      q.processAllAvailable()
      // advance wm to 10:20: id1's state (expiry 10:10) is EVICTED
      in.addData(Event(3, ts(30), 1, "a", 1.0))
      q.processAllAvailable()
      // dup of the now-evicted key, same ts: eviction implied
      // t + delay < wm, so the same-ts dup is necessarily LATE -> dropped,
      // never re-emitted (the theorem streamDedupParity's oracle rests on)
      in.addData(Event(1, ts(0), 1, "a", 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, count(*) FROM ddp GROUP BY 1 ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)),
        s"every key must emit exactly once, got $got")
    } finally q.stop()
  }

  test("session eviction boundary: end == wm emits the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("sessx").outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 7, "click", 1.0)) // session end 10:30
      q.processAllAvailable()
      // max 11:00 -> no-data batch with evict_wm EXACTLY 10:30:
      in.addData(Event(2, Timestamp.valueOf("2024-01-01 11:00:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM sessx").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 1L)),
        "session with end == evict_wm must emit (the <= comparator in the oracle cutoff)")
    } finally q.stop()
  }
}
