package graft

class RelationalSpec extends SparkSuite {

  // Exact hash-equality vs DuckDB is checked by the driver (and locally by
  // tools/check_oracle.py); these specs pin non-empty results, stable
  // schemas, and a few hand-computed invariants at sf0.001.

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("entry() flagship returns the 6 pricing-summary groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).distinct.sorted.sameElements(Array("A", "N", "R")))
  }

  test("q01 aggregates reconcile: sum_disc_price <= sum_base_price") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.Relational.q01(spark, sf)
    val bad = df.filter(col("sum_disc_price") > col("sum_base_price"))
    assert(bad.count() == 0)
  }

  test("q22 as-of join: every purchase appears exactly once") {
    import org.apache.spark.sql.functions._
    val asof = graft.queries.Relational.q22(spark, sf)
    val dup = asof.groupBy("purchase_id").count().filter(col("count") > 1)
    assert(dup.count() == 0)
  }

  test("q43 retention: day-0 cell holds the full cohort, offsets nonnegative") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.Relational.q43(spark, sf)
    assert(r.filter(col("day_offset") < 0L).count() == 0)
    // the signup event itself is activity on the cohort day, so the
    // offset-0 cell must equal the cohort size
    val ev = graft.queries.Relational.events(spark, sf)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(expr("_ms DIV 86400000")).as("cohort_day"))
      .groupBy(col("cohort_day")).agg(countDistinct(col("user_id")).as("n_cohort"))
    val day0 = r.filter(col("day_offset") === 0L)
      .select(col("cohort_day"), col("n_active"))
    val mismatch = day0.join(cohorts, Seq("cohort_day"))
      .filter(col("n_active") =!= col("n_cohort"))
    assert(mismatch.count() == 0)
  }

  test("q45 interval overlap: quarter-start windows, only nearby shipments join") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.Relational.q45(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val d = java.time.LocalDate.parse(row.getString(0))
      // promo windows are quarter starts
      assert(d.getDayOfMonth == 1 && Set(1, 4, 7, 10).contains(d.getMonthValue))
      assert(row.getAs[Long]("n_orders") <= row.getAs[Long]("n_lines"))
      assert(row.getAs[Long]("n_lines") > 0L)
    }
    // the overlap window is 21 days around the quarter start, so only a
    // fraction of each quarter's shipments can join
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.map(_.getAs[Long]("n_lines")).sum < total)
  }

  test("q44 anomaly flags match a BigInt re-derivation from the daily totals") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Relational.q44(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val cents = rs.map(r => BigInt(r.getAs[Long]("cents")))
      val n = BigInt(rs.length)
      val s = cents.sum
      val q = cents.map(c => c * c).sum
      rs.foreach { r =>
        val x = BigInt(r.getAs[Long]("cents"))
        val dev = n * x - s
        val want = dev * dev > (n * q - s * s) * 4
        assert(r.getAs[Boolean]("is_anomaly") == want, s"day ${r.getAs[Long]("day")}")
      }
    }
    // the 2-sigma rule must not flag the bulk of days
    val flagged = rows.count(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.toDouble / rows.length < 0.3)
  }

  test("q48 window stats: deciles tile each flag, rank statistics bounded and terminal") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Relational.q48(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFlag = rows.groupBy(_.getString(0))
    val flagCounts = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byFlag.foreach { case (flag, g) =>
      val tiles = g.map(_.getLong(1)).sorted
      assert(tiles.toSeq == (1L to 10L), s"$flag deciles not 1..10: ${tiles.toSeq}")
      // deciles tile the partition exactly
      assert(g.map(_.getLong(2)).sum == flagCounts(flag))
      // ntile balance: sizes differ by at most 1
      assert(g.map(_.getLong(2)).max - g.map(_.getLong(2)).min <= 1)
      // price ranges are non-overlapping and ordered across deciles
      val ordered = g.sortBy(_.getLong(1))
      ordered.foreach(r => assert(r.getDouble(3) <= r.getDouble(4)))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3))
        case _ =>
      }
      // percent_rank starts at 0 in decile 1; cume_dist ends at exactly 1
      assert(ordered.head.getDouble(5) == 0.0)
      assert(ordered.last.getDouble(6) == 1.0)
      g.foreach { r =>
        assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
        assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
      }
    }
  }

  test("q41 full outer: both exclusive sides exist and totals reconcile") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.Relational.q41(spark, sf)
    val sides = df.groupBy(col("side"))
      .agg(sum(col("n_orders")).as("o"), sum(col("n_ships")).as("l"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // shipping lags ordering, so ship-only days (after the last order) and
    // order-only days must both be present for the full-outer to matter
    assert(sides.contains("ship_only") && sides.contains("both"))
    val totalOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val totalShips = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(sides.values.map(_._1).sum == totalOrders)
    assert(sides.values.map(_._2).sum == totalShips)
  }

  test("q50 recursive chain: covers every order, steps tile each customer, totals telescope") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.Relational.q50(spark, sf)
    val rows = df.collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // the recursion walks every customer's full chain: one row per order
    assert(rows.length == orders.count())
    // per customer: steps are exactly 1..n (the chain neither skips nor forks)
    val byCust = rows.groupBy(_.getLong(0))
    byCust.foreach { case (c, rs) =>
      val steps = rs.map(_.getLong(2)).sorted
      assert(steps.sameElements(1L to steps.length.toLong), s"customer $c steps")
    }
    // the final step's running total telescopes to the customer's exact
    // cent sum — recompute independently from the raw table
    val expect = orders
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCust.foreach { case (c, rs) =>
      val last = rs.maxBy(_.getLong(2))
      assert(last.getLong(3) == expect(c), s"customer $c terminal total")
    }
    // running totals are strictly increasing along each chain (prices > 0)
    byCust.foreach { case (c, rs) =>
      val tot = rs.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(tot.zip(tot.drop(1)).forall { case (a, b) => a < b }, s"customer $c monotone")
    }
  }
}
