package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.types.U256

/** Exercises the SparkSessionExtensions hook: SQL-registered u256
  * functions and the codec-roundtrip elimination rule. Needs its own
  * session (extensions are builder-time), hence not SparkSuite. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions are builder-time: getOrCreate would silently reuse a
    // previous suite's session without them, so start clean
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("u256 functions are callable from SQL") {
    import spark.implicits._
    Seq(U256.toBytes32(BigInt("123456789012345678901234567890")))
      .toDF("bin").createOrReplaceTempView("t_u256")
    val dec = spark.sql("SELECT u256_to_decimal(bin) AS d FROM t_u256")
      .collect()(0).getDecimal(0)
    assert(dec.toBigInteger.toString == "123456789012345678901234567890")
    val rt = spark.sql(
      "SELECT u256_add(bin, decimal_to_u256(CAST(1 AS DECIMAL(38,0)))) AS s FROM t_u256")
      .collect()(0).getAs[Array[Byte]](0)
    assert(U256.fromBytes32(rt) == BigInt("123456789012345678901234567891"))
    val md = spark.sql(
      """SELECT u256_mul(bin, decimal_to_u256(CAST(3 AS DECIMAL(38,0)))) AS m,
        |       u256_div(bin, decimal_to_u256(CAST(10 AS DECIMAL(38,0)))) AS d,
        |       u256_sub(bin, decimal_to_u256(CAST(90 AS DECIMAL(38,0)))) AS s,
        |       u256_mod(bin, decimal_to_u256(CAST(1000 AS DECIMAL(38,0)))) AS r
        |FROM t_u256""".stripMargin).collect()(0)
    assert(U256.fromBytes32(md.getAs[Array[Byte]]("m")) ==
      BigInt("123456789012345678901234567890") * 3)
    assert(U256.fromBytes32(md.getAs[Array[Byte]]("d")) ==
      BigInt("12345678901234567890123456789"))
    assert(U256.fromBytes32(md.getAs[Array[Byte]]("s")) ==
      BigInt("123456789012345678901234567800"))
    assert(U256.fromBytes32(md.getAs[Array[Byte]]("r")) == BigInt(890))
  }

  test("poly_hash is callable from SQL and equals the Column API expression") {
    import spark.implicits._
    Seq("the quick brown fox", "spark").toDF("s").createOrReplaceTempView("t_ph")
    val viaSql = spark.sql("SELECT poly_hash(s, 31, 1000000007) AS h FROM t_ph ORDER BY s")
      .collect().map(_.getLong(0)).toSeq
    val apiVals = spark.table("t_ph")
      .select(org.apache.spark.sql.functions.col("s"),
        graft.functions.PolyHash.polyHash(org.apache.spark.sql.functions.col("s"), 31, 1000000007L).as("h"))
      .orderBy("s").collect().map(_.getLong(1)).toSeq
    assert(viaSql == apiVals)
    // non-literal base is an analysis-time error, not a runtime crash
    val err = intercept[Exception] {
      spark.sql("SELECT poly_hash(s, length(s), 7) FROM t_ph").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("optimizer eliminates decimal->binary->decimal roundtrips") {
    import spark.implicits._
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // expression over the literal input — we want the rule, not folding
    val df = Seq(BigDecimal(42)).toDF("d").repartition(1)
      .selectExpr("u256_to_decimal(decimal_to_u256(CAST(d AS DECIMAL(38,0)))) AS out")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("u256_to_decimal"),
      s"roundtrip not eliminated:\n$optimized")
    assert(df.collect()(0).getDecimal(0).intValue == 42)
  }

  test("rule leaves the lossy direction (binary->decimal->binary) intact") {
    import spark.implicits._
    val df = Seq(U256.toBytes32(BigInt(10).pow(40))).toDF("bin").repartition(1)
      .selectExpr("decimal_to_u256(u256_to_decimal(bin)) AS out")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("u256_to_decimal"))
    // 10^40 exceeds Decimal(38,0): the pair must null it, not pass it through
    assert(df.collect()(0).isNullAt(0))
  }

  test("hilbert_key is callable from SQL and widens INT arguments") {
    assert(spark.sql("SELECT hilbert_key(3, 5) AS h").collect()(0).getLong(0) ==
      graft.functions.Hilbert.xy2d(3L, 5L))
  }

  test("zorder_key3 is callable from SQL and widens INT arguments") {
    assert(spark.sql("SELECT zorder_key3(3, 5, 7) AS z").collect()(0).getLong(0) ==
      graft.functions.ZOrder.interleave3(3L, 5L, 7L))
  }

  test("zorder_key is callable from SQL and widens INT arguments") {
    // INT literals: the builder's explicit widening must kick in (the
    // expression itself only accepts BIGINT)
    assert(spark.sql("SELECT zorder_key(3, 5) AS z").collect()(0).getLong(0) ==
      graft.functions.ZOrder.interleave(3L, 5L))
    // BIGINT passthrough
    assert(spark.sql("SELECT zorder_key(CAST(65535 AS BIGINT), CAST(0 AS BIGINT)) AS z")
      .collect()(0).getLong(0) == graft.functions.ZOrder.interleave(65535L, 0L))
  }
}
