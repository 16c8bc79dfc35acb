package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources

import graft.etl.{ChainFixture, Flatten}
import graft.sources.RangePlanner

class ChainSourceSpec extends SparkSuite {

  private def readChain(from: Long, to: Long, per: Long = 250) =
    spark.read.format("chainblocks")
      .option("from", from).option("to", to).option("blocksPerPartition", per)
      .load()

  test("DSv2 source returns exactly the flattened fixture blocks") {
    val viaSource = readChain(0, 199)
    val viaBatch = Flatten.blockRows(ChainFixture.blocks(spark, 0, 199))
    assert(viaSource.count() == 200)
    assert(viaSource.except(viaBatch).count() == 0)
    assert(viaBatch.except(viaSource).count() == 0)
  }

  test("number predicates prune partitions before the scan") {
    val df = readChain(0, 999, per = 100).filter(col("number") < 100)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    // 1000 blocks / 100 per partition = 10 without pushdown; pruned to 1
    assert(scans.head.inputPartitions.length == 1,
      s"expected 1 partition, got ${scans.head.inputPartitions.length}")
    assert(df.count() == 100)
  }

  test("column pruning reaches the reader") {
    val df = readChain(0, 99).select("number", "miner")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("number", "miner"))
    assert(df.count() == 100)
  }

  test("RangePlanner narrows bounds from filters and splits ranges") {
    val (lo, hi, accepted) = RangePlanner.narrow(0, 999, Seq(
      sources.GreaterThanOrEqual("number", 100L),
      sources.LessThan("number", 301L),
      sources.EqualTo("miner", "x")))
    assert(lo == 100 && hi == 300)
    assert(accepted.length == 2)
    assert(RangePlanner.ranges(100, 300, 100) == Seq((100L, 199L), (200L, 299L), (300L, 300L)))
    assert(RangePlanner.ranges(10, 5, 100).isEmpty)
  }

  test("equality predicate collapses the scan to a single block") {
    val df = readChain(0, 9999, per = 100).filter(col("number") === 1234L)
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.inputPartitions.length == 1)
    assert(df.count() == 1)
    assert(df.select("number").collect()(0).getLong(0) == 1234L)
  }
}
