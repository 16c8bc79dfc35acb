package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamOps.Event

object StreamTimeoutSpec {
  case class Fired(uid: Long, kind: String, wm: Long, n: Long)
}

/** Pins the EXACT event-time-timeout semantics of flatMapGroupsWithState
  * that `stream_funnel_parity`'s oracle encodes (measured round 14 —
  * the round-13 verdict's "grade or terminally refute" item):
  *
  *   1. a group's timeout fires at the FIRST batch where it has no data
  *      and timeout_ts < evict_wm(k) = max(event ms over batches < k)
  *      − delay — STRICT comparator, == does not fire;
  *   2. a group WITH data in that batch gets the data call on its OLD
  *      state (the episode continues; eviction needs a data-free batch);
  *   3. the input late filter is the 2-lag watermark keyed on raw ts
  *      (filter_wm(k) = evict_wm(k−1)), STRICT: ts == filter_wm drops;
  *   4. getCurrentWatermarkMs() inside the function reports evict_wm(k).
  *
  * The funnel oracle's `brk` CTE (episode break iff m ≥ j+2 and
  * cmax(m−2) − delay > last_user_ms + retention) is the composition of
  * 1+2 under time-ordered batches; 3 is why no input row drops there. */
class StreamTimeoutSpec extends SparkSuite {
  import StreamTimeoutSpec.Fired

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
  private def ms(h: Int, m: Int): Long = ts(h, m).getTime

  // Keyed probe op: on data, emit ("data", currentWatermarkMs, RUNNING
  // state total — reveals whether prior state survived) and re-arm the
  // timeout to max(batchMaxTs + retMs, wm + 1); on timeout, emit
  // ("timeout", currentWatermarkMs, -1) and remove.
  private def probeOp(df: org.apache.spark.sql.DataFrame, retMs: Long) = {
    import spark.implicits._
    df.withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Fired](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(Fired(uid, "timeout", wm, -1L))
          } else {
            val evs = batch.toSeq
            val n = state.getOption.getOrElse(0L) + evs.size
            state.update(n)
            state.setTimeoutTimestamp(
              math.max(evs.map(_.ts.getTime).max + retMs, wm + 1))
            Iterator.single(Fired(uid, "data", wm, n))
          }
      }
  }

  test("file-replay: timeout fires on the strict 1-lag watermark; data in the firing batch keeps state; late filter is 2-lag strict") {
    import spark.implicits._
    // Schedule (delay 10 min, retention 20 min), back-to-back file
    // batches via landOrdered + maxFilesPerTrigger=1:
    //   b0: u1@10:00, u5@10:00, u8@10:05
    //   b1: u5@11:00
    //   b2: u5@11:10, u8@11:12
    //   b3: u6@11:15, u7@10:55, u9@10:50
    val rows = Seq(
      (1L, ts(10, 0), 1L, "a", 1.0, 0),
      (2L, ts(10, 0), 5L, "a", 1.0, 0),
      (7L, ts(10, 5), 8L, "a", 1.0, 0),
      (3L, ts(11, 0), 5L, "a", 1.0, 1),
      (4L, ts(11, 10), 5L, "a", 1.0, 2),
      (8L, ts(11, 12), 8L, "a", 1.0, 2),
      (5L, ts(11, 15), 6L, "a", 1.0, 3),
      (6L, ts(10, 55), 7L, "a", 1.0, 3),
      (9L, ts(10, 50), 9L, "a", 1.0, 3))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "_b")
    val dir = java.nio.file.Files.createTempDirectory("graft_toprobe").toString
    graft.streaming.StreamParity.landOrdered(spark, df, s"$dir/in", 4)
    val stream = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"))
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    implicit val sqlCtx = spark.sqlContext
    val q = probeOp(stream, 20 * 60000L)
      .toDF().writeStream.format("memory").queryName("prf")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT uid, kind, wm, n FROM prf ORDER BY uid, kind, wm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // (4) wm reports = evict_wm(k): u5's three data rows step 0 → 09:55
    // (max b0 10:05 − 10m) → 10:50 (max b1 11:00 − 10m).
    assert(got.filter(r => r._1 == 5L && r._2 == "data").map(_._3) ==
      Seq(0L, ms(9, 55), ms(10, 50)), s"wm must report the 1-lag watermark: $got")
    // (1) u1 (timeout_ts 10:20): b1's wm 09:50 < 10:20 no fire; fires at
    // b2 whose wm 10:50 > 10:20 — NOT later, NOT at equality.
    assert(got.filter(r => r._1 == 1L && r._2 == "timeout").map(_._3) ==
      Seq(ms(10, 50)), s"timeout must fire at the first strict exceedance: $got")
    // (2) u8 (timeout_ts 10:25 expired at b2's wm 10:50) has DATA in b2:
    // the data call must see the old state (running n = 2), no timeout row.
    assert(got.filter(_._1 == 8L).map(r => (r._2, r._4)) ==
      Seq(("data", 1L), ("data", 2L)),
      s"data in the would-fire batch must continue the episode: $got")
    // (3) late filter in b3: filter_wm = evict_wm(b2) = 10:50 (2-lag).
    // u7@10:55 > 10:50 KEPT even though the 1-lag wm is 11:02;
    // u9@10:50 == filter_wm DROPPED (strict comparator).
    assert(got.exists(r => r._1 == 7L && r._2 == "data"),
      s"raw ts ahead of the 2-lag filter must reach the fold: $got")
    assert(!got.exists(_._1 == 9L),
      s"raw ts == filter_wm must drop (strict): $got")
  }

  test("memory-stream: timeout fires in a trailing no-data batch once the watermark passes it, never at equality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = probeOp(in.toDF(), 20 * 60000L)
      .toDF().writeStream.format("memory").queryName("prb")
      .outputMode("append").start()
    def fired(uid: Long): Seq[Long] =
      spark.sql(s"SELECT wm FROM prb WHERE uid = $uid AND kind = 'timeout'")
        .collect().map(_.getLong(0)).toSeq
    try {
      in.addData(Event(1, ts(10, 0), 1, "a", 1.0)) // timeout_ts(u1) = 10:20
      q.processAllAvailable()
      in.addData(Event(2, ts(11, 0), 2, "a", 1.0)) // wm -> 10:50 > 10:20
      q.processAllAvailable()
      assert(fired(1L) == Seq(ms(10, 50)),
        "timeout must fire in the trailing no-data batch with the advanced wm")
      // u2's timeout_ts = 11:20; push wm to EXACTLY 11:20: must not fire
      in.addData(Event(3, ts(11, 30), 3, "a", 1.0))
      q.processAllAvailable()
      assert(fired(2L).isEmpty, "timeout_ts == wm must NOT fire (strict <)")
      in.addData(Event(4, ts(13, 0), 4, "a", 1.0)) // wm -> 12:50
      q.processAllAvailable()
      assert(fired(2L) == Seq(ms(12, 50)) && fired(3L) == Seq(ms(12, 50)),
        "both expired groups fire once the wm strictly passes them")
      // u3 returns AFTER its eviction: state restarted (n back to 1)
      in.addData(Event(5, ts(13, 5), 3, "a", 1.0))
      q.processAllAvailable()
      val u3n = spark.sql("SELECT n FROM prb WHERE uid = 3 AND kind = 'data' ORDER BY wm")
        .collect().map(_.getLong(0)).toSeq
      assert(u3n == Seq(1L, 1L), s"a returning evicted group starts fresh: $u3n")
    } finally q.stop()
  }
}
