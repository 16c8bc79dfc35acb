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

  test("mulBytes matches BigInt multiplication mod 2^256, incl. overflow") {
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val a = BigInt(256, rnd.self)
      val b = BigInt(256, rnd.self)
      val got = U256.fromBytes32(U256Arith.mulBytes(U256.toBytes32(a), U256.toBytes32(b)))
      assert(got == (a * b) % Mod)
    }
    // identities and explicit overflow wrap
    val max = Mod - 1
    def mul(a: BigInt, b: BigInt) =
      U256.fromBytes32(U256Arith.mulBytes(U256.toBytes32(a), U256.toBytes32(b)))
    assert(mul(max, BigInt(1)) == max)
    assert(mul(max, BigInt(0)) == 0)
    assert(mul(max, max) == (max * max) % Mod)
    assert(mul(BigInt(1) << 128, BigInt(1) << 128) == 0) // exactly 2^256 wraps to 0
  }

  test("divBytes matches BigInt floor division; division by zero is null") {
    val rnd = new scala.util.Random(13)
    (1 to 300).foreach { _ =>
      val a = BigInt(256, rnd.self)
      val b = BigInt(1 + rnd.nextInt(255), rnd.self) + 1 // nonzero, varied width
      val got = U256.fromBytes32(U256Arith.divBytes(U256.toBytes32(a), U256.toBytes32(b)))
      assert(got == a / b)
    }
    assert(U256Arith.divBytes(U256.toBytes32(BigInt(42)), U256.toBytes32(BigInt(0))) == null)
    // small / large floors to zero; self-division is 1
    val max = Mod - 1
    def div(a: BigInt, b: BigInt) =
      U256.fromBytes32(U256Arith.divBytes(U256.toBytes32(a), U256.toBytes32(b)))
    assert(div(BigInt(5), max) == 0)
    assert(div(max, max) == 1)
  }

  test("subBytes wraps mod 2^256; modBytes matches BigInt; both null-safe on edges") {
    val rnd = new scala.util.Random(17)
    val max = Mod - 1
    def sub(a: BigInt, b: BigInt) =
      U256.fromBytes32(U256Arith.subBytes(U256.toBytes32(a), U256.toBytes32(b)))
    def mod(a: BigInt, b: BigInt) =
      U256.fromBytes32(U256Arith.modBytes(U256.toBytes32(a), U256.toBytes32(b)))
    (1 to 300).foreach { _ =>
      val a = BigInt(256, rnd.self)
      val b = BigInt(256, rnd.self)
      assert(sub(a, b) == ((a - b) % Mod + Mod) % Mod)
      val m = BigInt(1 + rnd.nextInt(255), rnd.self) + 1 // nonzero modulus
      assert(mod(a, m) == a % m)
    }
    assert(sub(BigInt(0), BigInt(1)) == max, "0 - 1 must wrap to 2^256-1")
    assert(sub(max, max) == 0)
    assert(mod(BigInt(7), max) == 7)
    assert(U256Arith.modBytes(U256.toBytes32(BigInt(42)), U256.toBytes32(BigInt(0))) == null)
    // subtraction inverts addition under wrap: (a + b) - b == a
    (1 to 50).foreach { _ =>
      val a = BigInt(256, rnd.self); val b = BigInt(256, rnd.self)
      val aPlusB = U256Arith.addBytes(U256.toBytes32(a), U256.toBytes32(b))
      assert(U256.fromBytes32(U256Arith.subBytes(aPlusB, U256.toBytes32(b))) == a)
    }
  }

  test("U256Mul/U256Div expressions work in a DataFrame plan; div-by-zero row is null") {
    import spark.implicits._
    val big = BigInt(10).pow(40) // beyond Decimal(38,0)
    val rows = Seq(
      (U256.toBytes32(big), U256.toBytes32(BigInt(3))),
      (U256.toBytes32(BigInt(100)), U256.toBytes32(BigInt(7))),
      (U256.toBytes32(BigInt(100)), U256.toBytes32(BigInt(0))))
    val got = rows.toDF("a", "b")
      .select(
        U256Arith.u256Mul(col("a"), col("b")).as("m"),
        U256Arith.u256Div(col("a"), col("b")).as("d"))
      .collect()
    assert(U256.fromBytes32(got(0).getAs[Array[Byte]]("m")) == big * 3)
    assert(U256.fromBytes32(got(0).getAs[Array[Byte]]("d")) == big / 3)
    assert(U256.fromBytes32(got(1).getAs[Array[Byte]]("m")) == 700)
    assert(U256.fromBytes32(got(1).getAs[Array[Byte]]("d")) == 14)
    assert(got(2).isNullAt(got(2).fieldIndex("d")), "division by zero must be null")
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
