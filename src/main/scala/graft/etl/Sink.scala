package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** D1 sink abstraction. The reference bulk-loads ClickHouse's native
  * columnar block format over one connection per table
  * (`insert_native_block`, reference: src/main.rs:294-309); this build's
  * analytical store is Parquet. The trait makes that substitution a
  * CONTRACT rather than an accident of the code: a sink lands one
  * flattened chain table and must provide
  *
  *   (a) columnar-at-rest layout (or an explicitly interchange-grade
  *       encoding),
  *   (b) idempotent re-runs of any block range — rewriting a range
  *       replaces exactly that range's data (the property
  *       ReplacingMergeTree gives the reference at merge time),
  *   (c) within-partition sort by the table's dedup/order key, so
  *       point/range lookups prune (row-group stats here; sparse
  *       primary-key index in ClickHouse).
  *
  * [[ParquetSink]] is the production default. [[JsonLinesSink]] proves
  * the trait is genuinely pluggable (same bucketing + overwrite + sort
  * contract, interchange-grade encoding: binaries as base64, lossless
  * under an explicit read schema). [[ClickHouseNativeSink]] lands the
  * reference's own encoding: the ClickHouse Native block format
  * (SURVEY §2 D1) — there is no server in this sandbox to speak the
  * TCP protocol to, but the blocks themselves are a file format
  * (`FORMAT Native`), implemented here as a full Spark datasource.
  */
trait TableSink {

  /** Spark datasource name of the at-rest encoding — the maintenance
    * primitives (compact / deleteWhere, [[Load]]) read and rewrite
    * through it so they operate on ANY sink's layout, not just parquet. */
  def format: String

  /** Extension of this sink's data files, for file-count accounting. */
  def dataExt: String

  /** Whether files carry their own schema (parquet/orc footers). A
    * non-self-describing sink (JSON lines) needs an explicit schema for
    * any maintenance read — inference could silently retype columns. */
  def selfDescribing: Boolean = true

  /** Write options the MAINTENANCE rewrites must carry too: a compact
    * or deleteWhere that re-wrote a compressed table without its
    * compression option would silently land a decompressed copy. */
  def writeOptions: Map[String, String] = Map.empty

  /** Land `df` at `path`, bucketed by `blockRange = floor(numberCol /
    * Load.Batch)` with dynamic partition overwrite, sorted within
    * partitions by `sortKeys`. */
  def write(df: DataFrame, path: String, sortKeys: Seq[String], numberCol: String): Unit

  /** Read a written table back under an explicit schema (no inference —
    * the fixed-schema stance of the reference DDL). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame

  /** Shared bucketing/sort shape: every sink derives the same partition
    * column and within-partition order, so layout properties (b) and (c)
    * are uniform across encodings. */
  protected def bucketed(df: DataFrame, sortKeys: Seq[String], numberCol: String): DataFrame =
    df.withColumn("blockRange", floor(col(numberCol) / Load.Batch).cast("long"))
      .repartition(col("blockRange"))
      .sortWithinPartitions(sortKeys.map(col): _*)
}

/** Columnar Parquet, the analytical default: row-group min/max stats on
  * the sorted keys give the scan pruning ClickHouse gets from its sort
  * key. */
object ParquetSink extends TableSink {
  override def format: String = "parquet"
  override def dataExt: String = ".parquet"
  override def write(df: DataFrame, path: String, sortKeys: Seq[String], numberCol: String): Unit =
    bucketed(df, sortKeys, numberCol)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("blockRange")
      .parquet(path)

  override def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.parquet(path)
}

/** ORC — the other Spark-native columnar format, same contract: row
  * stride min/max statistics on the sorted keys prune like parquet
  * row groups. Exists so "columnar sink" is demonstrably a family,
  * not a synonym for parquet. */
object OrcSink extends TableSink {
  override def format: String = "orc"
  override def dataExt: String = ".orc"
  override def write(df: DataFrame, path: String, sortKeys: Seq[String], numberCol: String): Unit =
    bucketed(df, sortKeys, numberCol)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("blockRange")
      .orc(path)

  override def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.orc(path)
}

/** Interchange-grade JSON-lines sink with the identical bucketing /
  * overwrite / sort contract — binaries land as base64 and roundtrip
  * losslessly under the explicit read schema. Exists to keep the sink
  * surface honestly pluggable (and as the dump format for engines
  * without parquet readers). */
/** ClickHouse Native block format — the reference's ACTUAL landing
  * encoding (`insert_native_block`, reference: src/main.rs:294-309),
  * closing the one capability that previously had no executable twin:
  * no ClickHouse server exists in this sandbox to speak the TCP
  * protocol to, but the Native BLOCK format those inserts carry is a
  * file format too (`FORMAT Native`), and
  * [[graft.sources.NativeFileFormat]] implements it as a first-class
  * Spark datasource — same bucketing / dynamic-overwrite / sort
  * contract, with the reference's own column types
  * (String/UInt64/UInt256/Bool/Array(String)/Nullable per
  * src/schema.rs). Non-self-describing from Spark's point of view:
  * ClickHouse String carries no text/bytes distinction, so maintenance
  * reads pass the table schema (bare reads fall back to a documented
  * lossless binary-default mapping). */
class ClickHouseNativeSink private[etl] (compressed: Boolean) extends TableSink {
  override def format: String = "chnative"
  // Both variants claim ".native": the compressed files' ".lz4.native"
  // suffix still ends with it, the datasource reads either transparently
  // by file name, and maintenance accounting stays uniform across a
  // table holding a mix (e.g. compacted after a compression switch).
  override def dataExt: String = ".native"
  override def selfDescribing: Boolean = false
  override def writeOptions: Map[String, String] =
    if (compressed) Map("compression" -> "lz4") else Map.empty
  override def write(df: DataFrame, path: String, sortKeys: Seq[String], numberCol: String): Unit =
    bucketed(df, sortKeys, numberCol)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .options(writeOptions)
      .partitionBy("blockRange")
      .format(format)
      .save(path)

  override def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(format).load(path)
}

object ClickHouseNativeSink extends ClickHouseNativeSink(compressed = false)

/** The same Native blocks inside ClickHouse's LZ4 compressed frames
  * ([[graft.sources.ChCompressed]]) — the encoding the reference's
  * TCP INSERT actually puts on the wire. */
object ClickHouseNativeLz4Sink extends ClickHouseNativeSink(compressed = true)

object JsonLinesSink extends TableSink {
  override def format: String = "json"
  override def dataExt: String = ".json"
  override def selfDescribing: Boolean = false
  override def write(df: DataFrame, path: String, sortKeys: Seq[String], numberCol: String): Unit =
    bucketed(df, sortKeys, numberCol)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("blockRange")
      .json(path)

  override def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
