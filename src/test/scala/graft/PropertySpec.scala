package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.types.{U256, U256Arith}

/** Property-based checks (ScalaCheck generators, fixed seed so runs are
  * reproducible) for the hand-written arithmetic the engine's exactness
  * claims rest on: the u256 carry loop and the polynomial hash fold.
  * Each property is verified against an independent reference
  * implementation (BigInt / a direct Scala fold), not against the code
  * under test.
  */
class PropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val Two256 = BigInt(1) << 256

  /** Uniform over [0, 2^256): 32 raw bytes. */
  private val u256Gen: Gen[BigInt] =
    Gen.containerOfN[Array, Byte](32, Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(bs => BigInt(new java.math.BigInteger(1, bs)))

  private val edges: List[BigInt] = List(
    BigInt(0), BigInt(1), Two256 - 1, Two256 - 2, BigInt(1) << 255,
    (BigInt(1) << 255) - 1, (Two256 - 1) / 3, BigInt(0xff))

  test("property: addBytes == BigInt addition mod 2^256 (incl. full carry chains)") {
    val vals = edges ++ samples(u256Gen, 300, 0xA11CE5L)
    val pairs = vals.zip(vals.reverse) ++ edges.flatMap(e => vals.take(8).map(e -> _))
    pairs.foreach { case (a, b) =>
      val got = U256.fromBytes32(U256Arith.addBytes(U256.toBytes32(a), U256.toBytes32(b)))
      val want = (a + b).mod(Two256)
      assert(got == want, s"a=$a b=$b")
    }
  }

  test("property: toBytes32/fromBytes32 roundtrip is the identity on [0, 2^256)") {
    (edges ++ samples(u256Gen, 300, 0xB0B0L)).foreach { v =>
      assert(U256.fromBytes32(U256.toBytes32(v)) == v)
      val bytes = U256.toBytes32(v)
      assert(bytes.length == U256.WIDTH)
    }
  }

  test("property: addBytes folds order-independently (merge soundness)") {
    // the aggregate buffer merges in whatever order partitions finish;
    // any fold order must land on sum mod 2^256
    val vals = samples(u256Gen, 60, 0xC0FFEEL)
    val want = vals.sum.mod(Two256)
    val orders = Seq(vals, vals.reverse, vals.sortBy(_.toString),
      vals.drop(30) ++ vals.take(30))
    orders.foreach { vs =>
      val got = vs.map(U256.toBytes32).reduce(U256Arith.addBytes)
      assert(U256.fromBytes32(got) == want)
    }
  }

  test("fuzz generator: seeded specs are deterministic and all execute on Spark") {
    val a = (0 until 10).map(graft.tools.FuzzDump.spec(_, 42L, sf))
    val b = (0 until 10).map(graft.tools.FuzzDump.spec(_, 42L, sf))
    assert(a.map(_.sql) == b.map(_.sql), "same seed must yield identical SQL")
    assert(a.map(_.sql).distinct.size > 5, "specs should be diverse")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    a.foreach(s => assert(s.df(li).count() >= 0)) // every spec planable+runnable
  }

  test("property: PolyHash in generated code matches an independent byte fold") {
    val strGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        9 -> Gen.asciiPrintableChar,
        1 -> Gen.oneOf('\t', ' ', '~', 'é', '中')))) // multi-byte UTF-8 too
    val strs = samples(strGen, 200, 0xD00DL).distinct
    def ref(s: String, base: Long, mod: Long): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * base + (b & 0xff)) % mod)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(strs.zipWithIndex.map { case (s, i) => (i, s) }, 4))
      .toDF("id", "s")
      .select(col("id"), col("s"),
        graft.functions.PolyHash.polyHash(col("s"), 31, 1000000007L).as("h31"),
        graft.functions.PolyHash.polyHash(col("s"), 131, 2147483629L).as("h131"))
    df.collect().foreach { r =>
      val s = r.getString(1)
      assert(r.getLong(2) == ref(s, 31, 1000000007L), s"h31 of '$s'")
      assert(r.getLong(3) == ref(s, 131, 2147483629L), s"h131 of '$s'")
    }
  }
}
