package graft

import graft.plans.{TopKPerGroupExec, TopKPerGroupOps}
import graft.plans.TopKPerGroupOps.Sort

class TopKPerGroupSpec extends SparkSuite {

  test("custom operator matches the window-based top-K exactly") {
    val viaWindow = graft.queries.Relational.q07(spark, sf)
    val viaCustom = graft.queries.Relational.q30(spark, sf)
    assert(viaWindow.except(viaCustom).count() == 0)
    assert(viaCustom.except(viaWindow).count() == 0)
    assert(viaCustom.count() == viaWindow.count())
  }

  test("physical plan uses the two-phase heap exec, not a window") {
    val df = TopKPerGroupOps.topKPerGroup(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      Seq("l_returnflag"), Seq(Sort("l_extendedprice", desc = true)), 3)
    // AQE wraps the plan; assert on its rendered tree
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("TopKPerGroupPartial"), planStr)
    assert(planStr.contains("TopKPerGroupFinal"), planStr)
    assert(!planStr.contains("Window"))
  }

  test("ties and k larger than group size are handled") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val top = TopKPerGroupOps.topKPerGroup(df, Seq("g"), Seq(Sort("v", desc = true)), 10)
    assert(top.count() == 3) // k > group sizes: all rows survive
    val top1 = TopKPerGroupOps.topKPerGroup(df, Seq("g"), Seq(Sort("v", desc = true)), 1)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(top1 == Set(("a", 2), ("b", 5)))
  }
}
