package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards the fixture-schema boundary. Round 7's regression: the driver
  * regenerated events.parquet and `ts` silently changed from INT64
  * TIMESTAMP(NANOS) to timestamp[us], killing 17 queries at analysis
  * time. These specs pin (a) that the `_ms` derivation is invariant
  * across every encoding `ts` has shipped in, and (b) that the fixture
  * schemas still match what the query surface assumes — so the next
  * silent regen fails HERE with a readable message, not 17 places
  * downstream.
  */
class FixtureSchemaSpec extends SparkSuite {
  import spark.implicits._

  private def derive(df: DataFrame): Seq[Long] =
    df.select(graft.queries.Relational.eventsMs(df).as("v")).as[Long].collect().toSeq.sorted

  test("eventsMs is encoding-invariant: raw nanos, TIMESTAMP, TIMESTAMP_NTZ agree") {
    // (kept within the INT64-nanos representable range, ~year 2262)
    val ms = Seq(0L, 1L, 999L, 1700000000123L, 4102444800123L)
    val longDf = ms.map(_ * 1000000L).toDF("ts") // legacy nanosAsLong read
    val tsDf   = ms.toDF("_m").select(timestamp_millis(col("_m")).as("ts"))
    val ntzDf  = ms.toDF("_m").select(timestamp_millis(col("_m")).cast(TimestampNTZType).as("ts"))
    assert(derive(longDf) == ms.sorted)
    assert(derive(tsDf) == ms.sorted)
    assert(derive(ntzDf) == ms.sorted)
  }

  test("timestamp[us] parquet round-trip: NTZ write reads back NTZ, _ms exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val ms = Seq(123L, 1700000000123L)
    ms.toDF("_m").select(timestamp_millis(col("_m")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = spark.read.parquet(s"$dir/events.parquet")
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(derive(back) == ms.sorted)
  }

  test("an unsupported ts encoding fails loudly at the boundary") {
    val e = intercept[IllegalStateException] {
      graft.queries.Relational.eventsMs(Seq("x").toDF("ts"))
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("fixture schemas match the query surface's assumptions") {
    val expect: Map[String, Map[String, DataType]] = Map(
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderpriority" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
    expect.foreach { case (table, cols) =>
      val schema = spark.read.parquet(s"$sf/$table.parquet").schema
      cols.foreach { case (name, dt) =>
        assert(schema.fieldNames.contains(name), s"$table missing column $name")
        assert(schema(name).dataType == dt,
          s"$table.$name is ${schema(name).dataType}, expected $dt — fixture regenerated?")
      }
    }
    // temporal columns may ship in any encoding the surface handles, but a
    // NEW encoding must fail here with a pointer at the one fix site.
    val evTs = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(evTs),
      s"events.ts regenerated with unhandled type $evTs — extend Relational.eventsMs")
  }
}
