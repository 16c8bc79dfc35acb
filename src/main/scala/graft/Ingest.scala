package graft

import org.apache.spark.sql.SparkSession

/** CLI ingest entry point, mirroring the reference's flags
  * (reference: src/main.rs:16-44 — `--schema`, `--from A`, `--to B`):
  *
  *   sbt "runMain graft.Ingest --from 0 --to 999 --warehouse /path/wh"
  *   sbt "runMain graft.Ingest --schema --warehouse /path/wh"
  *   ... [--endpoint http://node:8545/]  # JSON-RPC node; omit = fixture
  *
  * `--schema` bootstraps the four CREATE TABLE IF NOT EXISTS definitions
  * (A4); a from/to range runs the full extract→flatten→load pipeline.
  */
object Ingest {

  case class Config(
      from: Long = 0L,
      to: Long = -1L,
      warehouse: String = "/tmp/graft_warehouse",
      schema: Boolean = false,
      resume: Boolean = false,
      endpoint: Option[String] = None,
      sink: etl.TableSink = etl.ParquetSink)

  /** `--sink` names the D1 landing encoding ([[etl.TableSink]]). */
  def sinkFor(name: String): etl.TableSink = name match {
    case "parquet" => etl.ParquetSink
    case "orc" => etl.OrcSink
    case "jsonl" => etl.JsonLinesSink
    case "native" => etl.ClickHouseNativeSink
    case other => throw new IllegalArgumentException(
      s"unknown sink '$other' — expected parquet|orc|jsonl|native")
  }

  def parse(args: Seq[String]): Config = {
    def loop(rest: List[String], c: Config): Config = rest match {
      case "--from" :: v :: t => loop(t, c.copy(from = v.toLong))
      case "--to" :: v :: t => loop(t, c.copy(to = v.toLong))
      case "--warehouse" :: v :: t => loop(t, c.copy(warehouse = v))
      case "--schema" :: t => loop(t, c.copy(schema = true))
      case "--resume" :: t => loop(t, c.copy(resume = true))
      case "--endpoint" :: v :: t => loop(t, c.copy(endpoint = Some(v)))
      case "--sink" :: v :: t => loop(t, c.copy(sink = sinkFor(v)))
      case Nil => c
      case bad :: _ => throw new IllegalArgumentException(
        s"unknown argument '$bad' — expected [--schema] [--from A --to B] " +
          "[--warehouse PATH] [--resume] [--endpoint URL] [--sink parquet|orc|jsonl|native]")
    }
    loop(args.toList, Config())
  }

  /** Session-injected body, separated from main() so specs can drive it
    * on an existing session. */
  def run(spark: SparkSession, c: Config): Unit = {
    if (c.schema) etl.Load.createTables(spark, c.warehouse)
    if (c.to >= c.from && c.to >= 0) {
      if (c.resume) {
        val done = etl.Load.ingestResumable(spark, c.from, c.to, c.warehouse, c.endpoint, c.sink)
        System.err.println(s"[ingest] resumed: ${done.size} range(s) ingested")
      } else etl.Load.ingest(spark, c.from, c.to, c.warehouse, c.endpoint, c.sink)
    }
  }

  def main(args: Array[String]): Unit = {
    val c = parse(args.toIndexedSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, c) finally spark.stop()
  }
}
