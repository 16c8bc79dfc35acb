package graft

import org.apache.spark.sql.functions._

import graft.types.U256

class U256Spec extends SparkSuite {

  test("toBytes32/fromBytes32 roundtrip, including edge values") {
    val edges = Seq(BigInt(0), BigInt(1), BigInt(2).pow(64) - 1,
      BigInt(2).pow(255), BigInt(2).pow(256) - 1, BigInt("12345678901234567890"))
    edges.foreach { v =>
      val b = U256.toBytes32(v)
      assert(b.length == 32)
      assert(U256.fromBytes32(b) == v)
    }
  }

  test("roundtrip property over random bigints (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val v = BigInt(256 - rnd.nextInt(200), rnd.self).abs & ((BigInt(1) << 256) - 1)
      assert(U256.fromBytes32(U256.toBytes32(v)) == v)
    }
  }

  test("bytewise order of 32-byte encoding equals numeric order") {
    val vals = Seq(BigInt(0), BigInt(255), BigInt(256), BigInt(2).pow(128),
      BigInt(2).pow(128) + 1, BigInt(2).pow(200)).sorted
    val enc = vals.map(U256.toBytes32)
    enc.sliding(2).foreach { case Seq(a, b) =>
      assert(java.util.Arrays.compareUnsigned(a, b) < 0)
    }
  }

  test("U256ToDecimal expression: values in range convert, huge values null out") {
    import spark.implicits._
    val small = BigInt("99999999999999999999999999999999999999") // 38 nines
    val huge = BigInt(10).pow(39)
    val df = Seq(U256.toBytes32(BigInt(42)), U256.toBytes32(small), U256.toBytes32(huge))
      .toDF("bin")
      .select(U256.toDecimal(col("bin")).as("dec"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).contains("42"))
    assert(got(1).contains(small.toString))
    assert(got(2).isEmpty) // exceeds Decimal(38,0) => null, documented
  }

  test("DecimalToU256 ∘ U256ToDecimal is identity for in-range values") {
    import spark.implicits._
    val vs = Seq(BigInt(0), BigInt(7), BigInt("123456789012345678901234567890"))
    val df = vs.map(U256.toBytes32).toDF("bin")
      .select(col("bin"), U256.fromDecimal(U256.toDecimal(col("bin"))).as("rt"))
    assert(df.filter(not(col("bin") === col("rt"))).count() == 0)
  }
}
