package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry point's contract: every advertised view resolves, the
  * injected functions work from plain SQL, and a ClickHouse-era chain
  * query runs unmodified against the flattened views. Extensions are
  * builder-time, so this suite starts its own session (same pattern as
  * ExtensionsSpec). */
class SqlSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val sqlSession: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    graft.tools.Sql.registerViews(s, sf)
    s
  }

  test("every advertised view resolves and is non-empty") {
    (graft.tools.Sql.StarTables ++ Seq(
      "chain_blocks", "chain_transactions", "chain_events", "chain_withdraws"))
      .foreach { v =>
        assert(sqlSession.sql(s"SELECT count(*) FROM $v").collect()(0).getLong(0) > 0, v)
      }
  }

  test("a warehouse-style SQL query with the injected u256 functions runs unmodified") {
    val r = sqlSession.sql(
      """SELECT floor(blockNumber / 100) AS bucket,
        |  count(*) AS n_tx,
        |  CAST(sum(u256_to_decimal(value)) AS DECIMAL(38,0)) AS wei,
        |  poly_hash(first(hex(hash)), 31, 1000000007) AS h
        |FROM chain_transactions
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(r.length == 2)
    assert(r.forall(_.getLong(1) > 0))
    assert(r.forall(row => row.getDecimal(2).signum() >= 0))
  }
}
