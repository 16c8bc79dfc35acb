package graft

import org.apache.spark.sql.functions._

import graft.types.{U256, U256Arith}

class U256ArithSpec extends SparkSuite {

  private val Mod = BigInt(1) << 256

  test("addBytes matches BigInt addition mod 2^256, incl. wraparound") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val a = BigInt(256, rnd.self)
      val b = BigInt(256, rnd.self)
      val got = U256.fromBytes32(U256Arith.addBytes(U256.toBytes32(a), U256.toBytes32(b)))
      assert(got == (a + b) % Mod)
    }
    // explicit wrap: max + 1 == 0
    val max = Mod - 1
    assert(U256.fromBytes32(U256Arith.addBytes(U256.toBytes32(max), U256.toBytes32(BigInt(1)))) == 0)
  }

  test("U256Add expression works in a DataFrame plan (codegen path)") {
    import spark.implicits._
    val rows = Seq(
      (U256.toBytes32(BigInt(10).pow(40)), U256.toBytes32(BigInt(10).pow(40) * 2)),
      (U256.toBytes32(BigInt(5)), U256.toBytes32(BigInt(7))))
    val df = rows.toDF("a", "b")
      .select(U256Arith.u256Add(col("a"), col("b")).as("s"))
    val got = df.collect().map(r => U256.fromBytes32(r.getAs[Array[Byte]](0)))
    assert(got(0) == BigInt(10).pow(40) * 3) // beyond Decimal(38,0) range
    assert(got(1) == 12)
  }

  test("U256Sum aggregates across partitions, matches BigInt reference") {
    import spark.implicits._
    val vals = (1 to 500).map(i => BigInt(10).pow(39) + i * 12345)
    val df = vals.map(U256.toBytes32).toDF("v").repartition(8)
    val got = U256.fromBytes32(
      df.agg(U256Arith.u256Sum(col("v")).as("total")).collect()(0).getAs[Array[Byte]](0))
    assert(got == vals.sum % (BigInt(1) << 256))
  }

  test("U256Sum grouped: per-group totals beyond decimal range") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, U256.toBytes32(BigInt(10).pow(40) + i)))
      .toDF("g", "v")
    val got = df.groupBy(col("g")).agg(U256Arith.u256Sum(col("v")).as("t"))
      .collect().map(r => r.getInt(0) -> U256.fromBytes32(r.getAs[Array[Byte]](1))).toMap
    (0 to 2).foreach { g =>
      val expect = (1 to 100).filter(_ % 3 == g).map(i => BigInt(10).pow(40) + i).sum
      assert(got(g) == expect)
    }
  }
}
