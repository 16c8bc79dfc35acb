package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The verify harness must fail LOUDLY: round 7's artifact showed 98
  * green rows and no trace of 17 errored queries, because a failure
  * wrote nothing. A failing query now leaves a sentinel error parquet
  * (red row in the driver's compare) and an errors entry. */
class VerifySpec extends SparkSuite {

  test("a deliberately broken query produces a sentinel parquet + errors entry") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("deliberate verify failure")
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1L).toDF("x") }
    val errors = Verify.dumpQueries(spark, sf, out, Map("q_ok" -> ok, "q_boom" -> boom))
    assert(errors.keySet == Set("q_boom"))
    assert(errors("q_boom").contains("deliberate verify failure"))
    val sentinel = spark.read.parquet(s"$out/q_boom")
    assert(sentinel.columns.toSeq == Seq("graft_verify_error"))
    assert(sentinel.head.getString(0).contains("deliberate verify failure"))
    assert(spark.read.parquet(s"$out/q_ok").count() == 1)
  }
}
