package graft

/** CLI entry (reference src/main.rs:16-44 parity): flag parsing and the
  * schema-bootstrap + ingest body against a temp warehouse. */
class IngestCliSpec extends SparkSuite {

  test("parse handles the reference's flags") {
    val c = Ingest.parse(Seq("--schema", "--from", "10", "--to", "42",
      "--warehouse", "/tmp/w", "--endpoint", "http://n:8545/"))
    assert(c.schema && c.from == 10 && c.to == 42 &&
      c.warehouse == "/tmp/w" && c.endpoint.contains("http://n:8545/"))
    assert(!Ingest.parse(Seq("--from", "0", "--to", "1")).schema)
    intercept[IllegalArgumentException](Ingest.parse(Seq("--bogus")))
  }

  test("run ingests a range into the warehouse (and is idempotent)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cli").toString
    Ingest.run(spark, Ingest.Config(from = 0, to = 49, warehouse = wh))
    val tx = spark.read.parquet(s"$wh/transactions")
    val expected = (0L to 49L).map(n => (n % 5) + 1).sum
    assert(tx.count() == expected)
    // re-run of the same range overwrites the same partitions — same counts
    Ingest.run(spark, Ingest.Config(from = 0, to = 49, warehouse = wh))
    assert(spark.read.parquet(s"$wh/transactions").count() == expected)
    assert(spark.read.parquet(s"$wh/blocks").count() == 50)
  }

  test("resumable ingest skips complete ranges, re-ingests partial ones") {
    val wh = java.nio.file.Files.createTempDirectory("graft_resume").toString
    // first run: blocks 0..1499 -> range 0 complete, range 1 partial
    val first = graft.etl.Load.ingestResumable(spark, 0, 1499, wh)
    assert(first == Seq((0L, 999L), (1000L, 1499L)))
    // re-resume of the SAME unaligned range: the tail (1000..1499, count
    // 500 != Batch) must be recognized as complete and not re-fetched
    assert(graft.etl.Load.ingestResumable(spark, 0, 1499, wh).isEmpty)
    // and a sub-range of already-landed blocks is complete too (clamped lo)
    assert(graft.etl.Load.ingestResumable(spark, 500, 1499, wh).isEmpty)
    // resume to 2999: range 0 skipped, partial range 1 redone whole, range 2 new
    val second = graft.etl.Load.ingestResumable(spark, 0, 2999, wh)
    assert(second == Seq((1000L, 1999L), (2000L, 2999L)))
    val blocks = spark.read.parquet(s"$wh/blocks")
    assert(blocks.count() == 3000)
    assert(blocks.select("number").distinct().count() == 3000)
    // third run: everything complete -> nothing to do
    assert(graft.etl.Load.ingestResumable(spark, 0, 2999, wh).isEmpty)
  }

  test("--sink selects the landing encoding; content identical across all three sinks") {
    import org.apache.spark.sql.functions.col
    import graft.types.Schemas
    val base = java.nio.file.Files.createTempDirectory("graft_cli_sink").toString
    Seq("parquet", "orc", "jsonl", "native").foreach { s =>
      Ingest.run(spark, Ingest.parse(Seq(
        "--from", "0", "--to", "49", "--warehouse", s"$base/$s", "--sink", s)))
    }
    def cols(df: org.apache.spark.sql.DataFrame) =
      df.select(Schemas.transactions.fieldNames.map(col).toIndexedSeq: _*)
    val pq = cols(graft.etl.ParquetSink.read(spark, s"$base/parquet/transactions", Schemas.transactions))
    val orc = cols(graft.etl.OrcSink.read(spark, s"$base/orc/transactions", Schemas.transactions))
    val js = cols(graft.etl.JsonLinesSink.read(spark, s"$base/jsonl/transactions", Schemas.transactions))
    val nat = cols(graft.etl.ClickHouseNativeSink.read(spark, s"$base/native/transactions", Schemas.transactions))
    assert(pq.count() == (0L to 49L).map(n => (n % 5) + 1).sum)
    assert(orc.except(pq).count() == 0 && pq.except(orc).count() == 0,
      "--sink orc must land the identical rows")
    assert(js.except(pq).count() == 0 && pq.except(js).count() == 0,
      "--sink jsonl must land the identical rows")
    assert(nat.except(pq).count() == 0 && pq.except(nat).count() == 0,
      "--sink native must land the identical rows")
    // a bad sink name fails fast at parse time
    intercept[IllegalArgumentException](Ingest.parse(Seq("--sink", "csv")))
    // resume reads completeness through the sink's encoding: all landed
    assert(graft.etl.Load.ingestResumable(spark, 0, 49, s"$base/orc",
      sink = graft.etl.OrcSink).isEmpty)
    assert(graft.etl.Load.ingestResumable(spark, 0, 49, s"$base/jsonl",
      sink = graft.etl.JsonLinesSink).isEmpty)
    assert(graft.etl.Load.ingestResumable(spark, 0, 49, s"$base/native",
      sink = graft.etl.ClickHouseNativeSink).isEmpty)
  }

  test("run with schema flag bootstraps the table definitions") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cli_ddl").toString
    Ingest.run(spark, Ingest.Config(schema = true, warehouse = wh))
    val tables = spark.sql("SHOW TABLES IN ethereum").collect().map(_.getString(1)).toSet
    assert(Set("blocks", "transactions", "events", "withdraws").subsetOf(tables))
  }
}
