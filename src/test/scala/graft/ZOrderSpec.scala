package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.ops.Layout

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Bit-by-bit reference interleave — independent of the mask-doubling
    * spread the production code uses. */
  private def naive(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleave matches the bit-by-bit reference on edges and a sweep") {
    val edges = Seq(0L, 1L, 2L, 0xffffL, 0x8000L, 0x5555L, 0xaaaaL, 12345L)
    for (x <- edges; y <- edges)
      assert(ZOrder.interleave(x, y) == naive(x, y), s"($x, $y)")
    // deterministic pseudo-random sweep, including values beyond 16 bits
    // (only the low 16 must matter)
    var seed = 0x9e3779b97f4a7c15L
    for (_ <- 1 to 2000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val x = seed >>> 20
      val y = (seed * 31) >>> 17
      assert(ZOrder.interleave(x, y) == naive(x & 0xffffL, y & 0xffffL))
    }
  }

  test("3-D interleave matches the bit-by-bit reference") {
    def naive3(x: Long, y: Long, z: Long): Long =
      (0 until 21).foldLeft(0L) { (acc, i) =>
        acc |
          (((x >> i) & 1L) << (3 * i)) |
          (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }
    val edges = Seq(0L, 1L, 0x1fffffL, 0x100000L, 0x155555L, 987654L)
    for (x <- edges; y <- edges; z <- edges)
      assert(ZOrder.interleave3(x, y, z) == naive3(x, y, z), s"($x, $y, $z)")
    var seed = 0x6a09e667f3bcc908L
    for (_ <- 1 to 2000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val x = seed >>> 20
      val y = (seed * 31) >>> 17
      val z = (seed * 131) >>> 23
      assert(ZOrder.interleave3(x, y, z) ==
        naive3(x & 0x1fffffL, y & 0x1fffffL, z & 0x1fffffL))
    }
  }

  test("layout_zorder3 bounds ALL THREE dimensions per bucket") {
    val out = graft.ops.Layout.layoutZorder3(spark, sf).cache()
    assert(out.count() > 1)
    val doms = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(max(col("l_partkey")), max(col("l_suppkey")), max(col("l_orderkey")))
      .as[(Long, Long, Long)].head()
    val w = out.agg(
        avg(col("p_max") - col("p_min")), avg(col("s_max") - col("s_min")),
        avg(col("o_max") - col("o_min")))
      .as[(Double, Double, Double)].head()
    // measured ~0.18-0.31 of each domain at the test sfs; an
    // unclustered dimension would sit at ~1.0
    assert(w._1 < doms._1 * 0.5, s"part width ${w._1} vs ${doms._1}")
    assert(w._2 < doms._2 * 0.5, s"supp width ${w._2} vs ${doms._2}")
    assert(w._3 < doms._3 * 0.5, s"order width ${w._3} vs ${doms._3}")
    out.unpersist()
  }

  test("monotone per dimension: growing one coordinate never shrinks the key") {
    // within a fixed y, the key is strictly increasing in x (and vice
    // versa) — the property that makes range filters map to key ranges
    for (y <- Seq(0L, 7L, 999L); x <- 0L until 255L)
      assert(ZOrder.interleave(x, y) < ZOrder.interleave(x + 1, y))
    for (x <- Seq(0L, 7L, 999L); y <- 0L until 255L)
      assert(ZOrder.interleave(x, y) < ZOrder.interleave(x, y + 1))
  }

  test("codegen and interpreted agree; SQL function is registered") {
    val df = Seq((3L, 5L), (65535L, 0L), (70000L, 70000L)).toDF("x", "y")
    val viaExpr = df.select(ZOrder.zorderKey(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(viaExpr == Seq(ZOrder.interleave(3, 5),
      ZOrder.interleave(65535, 0), ZOrder.interleave(70000, 70000)))
    // non-codegen (interpreted) path: force eval through a filter on a
    // literal expression
    val lit3 = ZOrder.interleave(3, 5)
    assert(df.filter(ZOrder.zorderKey(col("x"), col("y")) === lit3).count() == 1L)
  }

  test("wide domains (span >= 2^47) stay monotone: no overflow in grid ranks") {
    // nanosecond-timestamp-style keys: span ~2^52 would overflow the
    // naive (v - lo) * 65536 product; the bit-shift pre-scale must keep
    // the z key monotone in x (y held constant) so the range-partitioned
    // layout still orders files by x
    val base = 1700000000000000000L
    val span = 1L << 52
    val xs = (0 until 64).map(i => base + i * (span / 64))
    val df = xs.map(x => (x, 7L)).toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft_wide").toString
    Layout.zorderWrite(df, col("x"), col("y"), s"$tmp/wide", 4)
    val boxes = Layout.fileBoxes(spark, s"$tmp/wide", "x", "y")
      .orderBy(col("x_min"))
      .select(col("x_min"), col("x_max")).as[(Long, Long)].collect().toSeq
    assert(boxes.size == 4)
    // files must partition the x range without interleaving — overflow
    // would scramble the key order and overlap the boxes
    boxes.sliding(2).foreach { case Seq((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, s"overlapping file ranges: $boxes")
    }
    // and all 64 rows survived the roundtrip
    assert(spark.read.parquet(s"$tmp/wide").count() == 64L)
  }

  test("z-order layout prunes more files than a single-column sort layout") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val files = 16
    // layout A: sorted by p only (the naive single-column clustering)
    li.repartitionByRange(files, col("p")).sortWithinPartitions(col("p"))
      .write.mode("overwrite").parquet(s"$tmp/by_p")
    // layout B: z-order on (p, sk)
    Layout.zorderWrite(li, col("p"), col("sk"), s"$tmp/by_z", files)
    // a box filter selective on sk ONLY — the regime where a p-only
    // sort cannot help AT ALL (every file spans the full sk domain, so
    // all 16 are touched) while the z layout's two-dimensional boxes
    // prune most files. (A near-square conjunctive box is too close to
    // break-even at 16 files to assert on: repartitionByRange samples
    // its boundaries, so marginal cells drift run to run.)
    val (pLo, pHi, sLo, sHi) = (0L, 1000L, 4L, 5L)
    def touched(path: String): Long =
      Layout.fileBoxes(spark, path, "p", "sk")
        .filter(col("x_max") >= pLo && col("x_min") <= pHi &&
          col("y_max") >= sLo && col("y_min") <= sHi)
        .count()
    val byP = touched(s"$tmp/by_p")
    val byZ = touched(s"$tmp/by_z")
    // the p-sorted layout has tight p boxes but every file spans the sk
    // domain; the z layout bounds both — it must touch strictly fewer
    // files for a two-dimensional box
    assert(byZ < byP, s"z layout touched $byZ files, p-sorted touched $byP")
    // and both layouts return identical rows for the actual filter
    def rows(path: String): Set[(Long, Long)] =
      spark.read.parquet(path)
        .filter(col("p").between(pLo, pHi) && col("sk").between(sLo, sHi))
        .as[(Long, Long)].collect().toSet
    assert(rows(s"$tmp/by_z") == rows(s"$tmp/by_p"))
  }

  test("bucketed tables join with ZERO exchanges (co-located sort-merge)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec) hold their
    // real subtree outside `children` — descend explicitly
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case _ => Nil
      })
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.bucketedWrite(spark.read.parquet(s"$sf/lineitem.parquet"),
        "li_bucketed", s"$tmp/li", "l_orderkey", 8)
      Layout.bucketedWrite(spark.read.parquet(s"$sf/orders.parquet"),
        "ord_bucketed", s"$tmp/ord", "o_orderkey", 8)
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // force AQE to finalize the physical plan
      val plan = nodes(joined.queryExecution.executedPlan)
      val exchanges = plan.count(_.isInstanceOf[ShuffleExchangeExec])
      // the join itself must be exchange-free: only the (tiny) groupBy
      // aggregation above it may shuffle
      assert(plan.exists(_.nodeName.contains("SortMergeJoin")),
        s"expected a sort-merge join:\n${joined.queryExecution.executedPlan}")
      assert(exchanges <= 1,
        s"bucketed join should not shuffle its inputs, got $exchanges exchanges:\n" +
          joined.queryExecution.executedPlan)
      // and the result matches the unbucketed join
      val expect = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(joined.as[(String, Long)].collect().toMap == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("registered bucketed join: SMJ with zero exchanges beneath it, rollup matches plain join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case _ => Nil
      })
    try {
      val joined = Layout.layoutBucketedJoin(spark, sf)
      val rows = joined.as[(String, Long, Long, Double)].collect()
      val plan = nodes(joined.queryExecution.executedPlan)
      val smj = plan.find(_.nodeName.contains("SortMergeJoin"))
      assert(smj.nonEmpty, s"expected a sort-merge join:\n${joined.queryExecution.executedPlan}")
      // the co-location claim: nothing below the join shuffles — the
      // only exchanges in the whole plan belong to the rollup + sort
      val below = smj.get.children.flatMap(nodes)
      assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"bucketed join inputs must not shuffle:\n${joined.queryExecution.executedPlan}")
      val expect = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .as[(String, Long, Long, Double)].collect().toSet
      assert(rows.toSet == expect, "bucketed layout changed the answer")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_li")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_ord")
    }
  }

  test("dynamic partition pruning: scan carries a DPP filter, reads only qualifying partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.initialPlan)
        case _ => Seq.empty
      }
      (p +: p.children.flatMap(nodes)) ++ inner ++
        p.subqueries.flatMap(nodes)
    }
    val (out, path) = Layout.dppJoin(spark, sf)
    val rows = out.collect()
    // the partitioned fact scan must carry a dynamicpruning partition filter
    val scan = nodes(out.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec
          if f.metadata.get("PartitionFilters").exists(_.contains("dynamicpruning")) => f
    }
    assert(scan.nonEmpty, "no FileSourceScanExec with a dynamicpruning partition filter")
    // pruning is real: qualifying months are a strict subset of
    // partitions. The fact copy lives under the Scratch root, which is
    // a Hadoop-FS path (possibly non-local scheme) — list it through
    // the FileSystem API, not java.io.File.
    val (fs, hp) = graft.etl.WarehouseFs.resolve(spark, path)
    val totalParts = fs.listStatus(hp)
      .count(_.getPath.getName.startsWith("ship_month="))
    assert(rows.length > 0 && rows.length < totalParts,
      s"${rows.length} qualifying months of $totalParts partitions — no pruning headroom")
    // semantic parity with the plain unpartitioned join
    val D = "decimal(18,2)"
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("ship_month",
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("int"))
      .join(Layout.dppMonths(spark, sf).select(col("m").as("ship_month")), Seq("ship_month"))
      .groupBy(col("ship_month").cast("long").as("month"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
          .cast("double").as("revenue"))
      .orderBy(col("month")).collect()
    assert(rows.toSeq == want.toSeq)
  }

  test("hilbert: d2xy/xy2d roundtrip and curve adjacency (neighbors differ by 1 step)") {
    import graft.functions.Hilbert
    // full-curve anchors: the curve starts at the origin
    assert(Hilbert.xy2d(0L, 0L) == 0L)
    assert(Hilbert.d2xy(0L) == (0L, 0L))
    // deterministic pseudo-random sweep over the 2^32 distance domain
    var seed = 0x2545f4914f6cdd1dL
    for (_ <- 1 to 2000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val d = (seed >>> 16) % (Hilbert.N * Hilbert.N - 1)
      val (x1, y1) = Hilbert.d2xy(d)
      val (x2, y2) = Hilbert.d2xy(d + 1)
      // the defining Hilbert property Morton lacks: consecutive curve
      // positions are always GRID NEIGHBORS
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L, s"jump at d=$d")
      assert(Hilbert.xy2d(x1, y1) == d, s"roundtrip at d=$d")
    }
  }

  test("hilbert codegen and interpreted agree on a DataFrame") {
    import graft.functions.Hilbert
    val df = Seq((3L, 5L), (65535L, 0L), (70000L, 70000L)).toDF("x", "y")
    val got = df.select(Hilbert.hilbertKey(col("x"), col("y")).as("h"))
      .as[Long].collect().toSeq
    assert(got == Seq(Hilbert.xy2d(3, 5), Hilbert.xy2d(65535, 0),
      Hilbert.xy2d(70000, 70000)))
  }

  test("hilbert buckets are tighter than z-order buckets on BOTH dimensions") {
    def widths(df: org.apache.spark.sql.DataFrame): (Double, Double) =
      df.agg(avg(col("p_max") - col("p_min")), avg(col("s_max") - col("s_min")))
        .as[(Double, Double)].head()
    val (zp, zs) = widths(Layout.layoutZorder(spark, sf))
    val (hp, hs) = widths(Layout.layoutHilbert(spark, sf))
    // measured at sf0.001: part 0.120 vs 0.163 of domain, supplier
    // 0.028 vs 0.049 — the no-diagonal-jumps property in data form
    assert(hp < zp, s"hilbert part width $hp !< zorder $zp")
    assert(hs < zs, s"hilbert supplier width $hs !< zorder $zs")
  }

  test("layout_zorder buckets carry tight boxes in BOTH dimensions") {
    val out = Layout.layoutZorder(spark, sf).cache()
    val buckets = out.count()
    assert(buckets > 1, "expected multiple coarse z buckets")
    // each bucket's part-range must cover well under the full part
    // domain (a p-sort gives this too), AND its supplier-range must
    // cover under the full supplier domain (a p-sort does NOT give
    // this) — on average across buckets
    val doms = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(max(col("l_partkey")), max(col("l_suppkey"))).as[(Long, Long)].head()
    val widths = out.agg(
        avg(col("p_max") - col("p_min")).as("pw"),
        avg(col("s_max") - col("s_min")).as("sw"))
      .as[(Double, Double)].head()
    assert(widths._1 < doms._1 * 0.4, s"avg part width ${widths._1} vs domain ${doms._1}")
    assert(widths._2 < doms._2 * 0.4, s"avg supp width ${widths._2} vs domain ${doms._2}")
    out.unpersist()
  }

  test("zonemap prune: the Morton layout skips most zone checks, linear skips ~none") {
    val rows = graft.ops.Layout.layoutZonemapPrune(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (linChecks, linPruned, linMilli) = rows("linear")
    val (zChecks, zPruned, zMilli) = rows("zorder")
    assert(linChecks == zChecks && linChecks > 0)
    // ingestion order is uncorrelated with (part, supplier): every
    // bucket's box spans ~the whole domain, so ~nothing prunes
    assert(linMilli < 200, s"linear layout should barely prune, got $linMilli milli")
    // the Morton curve's whole point: most square predicates miss most boxes
    assert(zMilli > 700, s"zorder layout should prune most checks, got $zMilli milli")
    assert(zPruned > linPruned * 3 + 10)
  }
}
