package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  test("connected components: chain, separate component, and singleton pair") {
    // components: {1,2,3,4,5} (a 4-hop chain — exercises multi-round
    // propagation), {10,11}, {20,21,22} (triangle-ish via shared node)
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val cc = GraphOps.connectedComponents(pairs)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(cc == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: empty pair set yields empty labels") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(pairs).count() == 0L)
  }

  test("dedup clusters: every twin lands in its original's cluster, survivor = min") {
    val clusters = GraphOps.dedupClusters(spark, sf).cache()
    // every doc_id >= 1e6 is a twin of doc_id - 1e6; they must share a cluster
    val twins = clusters.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("orig", col("doc_id") - 1000000L)
    val origs = clusters.select(col("doc_id").as("orig"), col("cluster_id").as("orig_cluster"))
    val mismatched = twins.join(origs, Seq("orig"))
      .filter(col("cluster_id") =!= col("orig_cluster")).count()
    assert(mismatched == 0L)
    // survivor flag marks exactly the min doc of each cluster
    val badSurvivor = clusters
      .groupBy(col("cluster_id")).agg(
        min(col("doc_id")).as("min_doc"),
        sum(when(col("survivor"), col("doc_id"))).as("flagged"))
      .filter(col("min_doc") =!= col("flagged")).count()
    assert(badSurvivor == 0L)
    // cluster_size agrees with the actual member count
    val badSize = clusters.groupBy(col("cluster_id"), col("cluster_size"))
      .agg(count(lit(1)).as("members"))
      .filter(col("cluster_size") =!= col("members")).count()
    assert(badSize == 0L)
    clusters.unpersist()
  }

  test("with a checkpoint dir configured, CC rounds use RELIABLE checkpoints") {
    // cluster fault model: localCheckpoint blocks die with an executor
    // mid-loop and the truncated lineage leaves nothing to recompute —
    // a configured checkpoint dir must flip every round to reliable
    // checkpoint() files on the (cluster) FS
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir)
    try {
      val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      val cc = GraphOps.connectedComponents(pairs)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(cc == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
      // reliable checkpoint files physically landed under the configured dir
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten
          .flatMap(c => (if (c.getName.startsWith("rdd-")) Seq(c) else Nil) ++ rddDirs(c))
      assert(rddDirs(new java.io.File(dir)).nonEmpty,
        "no rdd-* checkpoint dirs written: CC loop did not use reliable checkpoint()")
      // and the truncation helper itself picks reliable checkpointing
      val t = graft.ops.Lineage.truncate(Seq(1L).toDF("x"))
      assert(t.rdd.toDebugString.contains("ReliableCheckpointRDD"),
        s"Lineage.truncate did not produce a reliable checkpoint:\n${t.rdd.toDebugString}")
    } finally {
      // scala/spark: setCheckpointDir(null) resets to None (Option(null))
      sc.setCheckpointDir(null)
    }
  }

  test("without a checkpoint dir, Lineage.truncate stays on localCheckpoint") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val t = graft.ops.Lineage.truncate(Seq(1L).toDF("x"))
    assert(t.rdd.toDebugString.contains("LocalCheckpoint"),
      s"expected localCheckpoint in local mode:\n${t.rdd.toDebugString}")
  }

  test("triangles: hand-computed co-occurrence graph, duplicates collapsed") {
    // o=1 -> {1,2,3}: one triangle. o=3 -> {4,5,6,7}: K4 = 4 triangles,
    // each vertex in 3 of them. o=2 -> bridge edge 3-4 (no triangle
    // through it). o=4/o=5 re-state edges 2-3 and 1-3 (distinct edge
    // dedup), and (1,1) repeats a membership row (distinct (o,p) dedup).
    val membership = Seq(
      1L -> 1L, 1L -> 1L, 1L -> 2L, 1L -> 3L,
      2L -> 3L, 2L -> 4L,
      3L -> 4L, 3L -> 5L, 3L -> 6L, 3L -> 7L,
      4L -> 2L, 4L -> 3L,
      5L -> 1L, 5L -> 3L).toDF("o", "p")
    val got = GraphOps.trianglesOf(membership)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq(
      4L -> 3L, 5L -> 3L, 6L -> 3L, 7L -> 3L,
      1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: a triangle-free graph (star + path) yields no rows") {
    // o=1 -> {1,2}, o=2 -> {1,3}, o=3 -> {1,4}: star around 1.
    val membership = Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
      .toDF("o", "p")
    assert(GraphOps.trianglesOf(membership).count() == 0L)
  }

  test("butterflies: closed form on a hand-computed bipartite graph") {
    // pair (1,2) shares orders {1,2,3} -> C(3,2)=3 butterflies;
    // (1,3) and (2,3) share {1,2} -> 1 each; (4,5) shares only order 4
    // -> w=1, below the >=2 support, contributes nothing.
    val membership = Seq(
      1L -> 1L, 1L -> 2L, 1L -> 3L,
      2L -> 1L, 2L -> 2L, 2L -> 3L,
      3L -> 1L, 3L -> 2L,
      4L -> 4L, 4L -> 5L).toDF("o", "p")
    val got = GraphOps.butterfliesOf(membership).as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 4L, 2L -> 4L, 3L -> 2L))
  }

  test("triangles: registered query is non-empty, descending, capped at TopK") {
    val top = GraphOps.triangles(spark, sf).as[(Long, Long)].collect().toSeq
    assert(top.nonEmpty && top.size <= GraphOps.Triangles.TopK)
    assert(top.forall(_._2 > 0L))
    // total order (n_tri desc, part asc) actually holds in the output
    assert(top == top.sortBy { case (p, n) => (-n, p) })
  }

  test("star CC equals label-propagation CC on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 10 + rnd.nextInt(50)
      val pairs = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
        .toDF("a", "b")
      val lp = GraphOps.connectedComponents(pairs)
        .as[(Long, Long)].collect().toSet
      val st = GraphOps.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().toSet
      assert(st == lp, s"trial $trial: star CC diverged from label propagation")
    }
  }

  test("star CC collapses a 200-node path — beyond label propagation's round budget") {
    // Diameter 199: label propagation at default maxIter=25 CANNOT
    // finish this graph; star contraction converges in O(log n) rounds.
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val st = GraphOps.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(st == (0L until 200L).map(_ -> 0L))
  }

  test("star CC: empty pair set yields empty labels") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponentsStar(pairs).count() == 0L)
  }

  test("dedup_clusters_star matches dedup_clusters row for row on the fixture") {
    val lp = GraphOps.dedupClusters(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val st = GraphOps.dedupClustersStar(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(st == lp)
  }

  test("core decomposition: hand-computed graph (K4 + pendant + path), support rule applied") {
    // Each kept edge is stated by TWO orders (o and o+100) to clear the
    // MinSupport=2 bar. K4 on {1,2,3,4}: core 3 each. Node 5 hangs off
    // 4: core 1. Path 10-11-12: core 1 each. Orders 50/51 state a 6-7
    // edge only ONCE — support 1, dropped, so 6 and 7 never appear.
    val base = Seq(
      1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 4L,
      4L -> 2L, 4L -> 3L, 5L -> 2L, 5L -> 4L, 6L -> 3L, 6L -> 4L,
      7L -> 4L, 7L -> 5L,
      8L -> 10L, 8L -> 11L, 9L -> 11L, 9L -> 12L)
    val membership =
      (base ++ base.map { case (o, p) => (o + 100L, p) } ++
        Seq(50L -> 6L, 50L -> 7L)).toDF("o", "p")
    val got = GraphOps.coreDecompositionOf(membership)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L,
      10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

  test("k-truss: hand-computed graph — bridges drop, the triangle cluster survives") {
    // K4 on {1,2,3,4} (each edge in 2 triangles), a bridge 4-5, and an
    // isolated supported edge 10-11; every edge stated by two orders to
    // clear MinSupport. 3-truss = the K4 edges with support 2.
    val base = Seq(
      1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 4L,
      4L -> 2L, 4L -> 3L, 5L -> 2L, 5L -> 4L, 6L -> 3L, 6L -> 4L,
      7L -> 4L, 7L -> 5L,
      8L -> 10L, 8L -> 11L)
    val membership =
      (base ++ base.map { case (o, p) => (o + 100L, p) }).toDF("o", "p")
    val got = GraphOps.ktrussOf(membership)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("k-truss: fixpoint equals a sequential reference peel on the fixture graph") {
    val got = GraphOps.ktruss(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    // sequential reference on the same support-filtered edge set
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().as[(Long, Long)].collect()
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { grp =>
      val ps = grp.map(_._2).distinct
      for (x <- ps; y <- ps if x < y)
        support((x, y)) = support.getOrElse((x, y), 0L) + 1L
    }
    // iterator first: Map.collect over pair-producing functions would
    // rebuild a Map and collapse edges sharing an endpoint
    var edges = support.iterator.collect {
      case (e, w) if w >= GraphOps.Cores.MinSupport => e }.toSet
    var changed = true
    def sup(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      es.foreach { case (a, b) => adj(a) += b; adj(b) += a }
      es.iterator.map(e => e -> (adj(e._1) & adj(e._2)).size).toMap
    }
    while (changed) {
      val s = sup(edges)
      val keep = edges.filter(e => s(e) >= GraphOps.Truss.K - 2)
      changed = keep != edges
      edges = keep
    }
    val s = sup(edges)
    val want = edges.toSeq.sorted.map(e => (e._1, e._2, s(e).toLong))
    assert(got == want)
  }

  test("core decomposition: estimates reach the exact peel fixpoint at fixture scale") {
    val got = GraphOps.kcore(spark, sf).as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    // exact sequential peel on the collected fixture graph (tiny at sf0.001)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().as[(Long, Long)].collect()
    val byO = li.groupBy(_._1).values
    // support-filtered edges: pairs co-occurring in >= MinSupport orders
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byO.foreach { grp =>
      val ps = grp.map(_._2).distinct
      for (x <- ps; y <- ps if x < y)
        support((x, y)) = support.getOrElse((x, y), 0L) + 1L
    }
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    support.foreach { case ((x, y), w) =>
      if (w >= GraphOps.Cores.MinSupport) {
        adj.getOrElseUpdate(x, scala.collection.mutable.Set.empty) += y
        adj.getOrElseUpdate(y, scala.collection.mutable.Set.empty) += x
      }
    }
    val deg = scala.collection.mutable.Map(adj.view.mapValues(_.size).toSeq: _*)
    val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var cur = 0L
    while (alive.nonEmpty) {
      val v = alive.minBy(x => (deg(x), x))
      cur = math.max(cur, deg(v).toLong)
      core(v) = cur
      alive -= v
      adj(v).foreach(u => if (alive(u)) deg(u) -= 1)
    }
    assert(got == core.toMap,
      "h-index fixpoint must equal the exact sequential peel")
  }

  test("bfs: hand-computed path graph — depth bound cuts, disconnected excluded") {
    // path 1-2-...-12 (each edge stated by two orders to clear
    // MinSupport) + a disconnected supported edge 20-21. Source is the
    // smallest node (1); MaxRounds=8 reaches nodes 1..9 at dist 0..8;
    // 10..12 are beyond the bound and 20/21 unreachable — all excluded.
    val base = (1L to 11L).flatMap { i =>
      Seq((100L + i) -> i, (100L + i) -> (i + 1)) } ++
      Seq(300L -> 20L, 300L -> 21L)
    val membership =
      (base ++ base.map { case (o, p) => (o + 1000L, p) }).toDF("o", "p")
    val got = GraphOps.bfsOf(membership).as[(Long, Long)].collect().toSeq
    assert(got == (1L to 9L).map(n => n -> (n - 1L)))
  }

  test("bfs: fixture distances are a valid BFS layering from the min node") {
    val rows = GraphOps.bfs(spark, sf).as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1) == rows.map(_._1).sorted)
    val dist = rows.toMap
    assert(rows.count(_._2 == 0L) == 1 && dist(rows.map(_._1).min) == 0L,
      "exactly the smallest reachable node is at distance 0")
    assert(rows.forall(r => r._2 >= 0L && r._2 <= GraphOps.Bfs.MaxRounds))
    // recompute the supported edge set; check the BFS layering property
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("a"), col("b")).as[(Long, Long)].collect()
    edges.foreach { case (a, b) =>
      (dist.get(a), dist.get(b)) match {
        case (Some(da), Some(db)) =>
          assert(math.abs(da - db) <= 1, s"edge ($a,$b) spans levels $da,$db")
        case (Some(da), None) => assert(da == GraphOps.Bfs.MaxRounds,
          s"node $b unreached but neighbor $a at $da < bound")
        case (None, Some(db)) => assert(db == GraphOps.Bfs.MaxRounds,
          s"node $a unreached but neighbor $b at $db < bound")
        case _ => // both outside the reached set (other component)
      }
    }
    // every non-source node has a parent one level up
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.filter(_._2 > 0).foreach { case (n, d) =>
      assert(adj(n).exists(m => dist.get(m).contains(d - 1)),
        s"node $n at $d has no neighbor at ${d - 1}")
    }
  }

  test("modularity: hand graph matches the rational form, one-community graph is exactly 0") {
    // two brand-pure triangles bridged by one cross-brand edge
    val member = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), // order 1: parts 1,2,3 (brand A clique)
      (2L, 4L), (2L, 5L), (2L, 6L), // order 2: parts 4,5,6 (brand B clique)
      (3L, 3L), (3L, 4L)            // order 3: the bridge edge 3—4
    ).toDF("o", "p")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"), (6L, "B"))
      .toDF("p", "c")
    val r = GraphOps.modularityOf(member, labels).collect().head
    // m=7 edges, 6 intra; degrees 2,2,3,3,2,2 → d_A = d_B = 7, Σd² = 98
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (7L, 2L, 6L, 98L))
    assert(r.getDouble(4) == (4.0 * 7 * 6 - 98.0) / (4.0 * 7 * 7)) // 70/196
    // everything in one community: Q is identically 0 (se = m, Σd² = (2m)²)
    val one = labels.select(col("p"), lit("A").as("c"))
    val r1 = GraphOps.modularityOf(member, one).collect().head
    assert(r1.getDouble(4) == 0.0)
    // fixture: a defined Q in the valid range, deterministic
    val f = GraphOps.modularity(spark, sf).collect().head
    assert(f.getDouble(4) >= -0.5 && f.getDouble(4) <= 1.0)
    assert(GraphOps.modularity(spark, sf).collect().head == f)
  }

  test("assortativity: star is exactly -1, regular graph is NULL, fixture r is a valid correlation") {
    // star K1,3 through shared orders: hub part 0 meets 1/2/3 in three orders
    val star = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L), (3L, 0L), (3L, 3L))
      .toDF("o", "p")
    val sr = GraphOps.assortativityOf(star).collect().head
    assert((sr.getLong(0), sr.getLong(1), sr.getLong(3), sr.getLong(4)) ==
      (6L, 12L, 18L, 30L)) // m, sj, sjk, sj2 — hand-computed stub sums
    assert(sr.getDouble(6) == -1.0, "a star mixes maximally disassortatively")
    // a 3-clique (one shared order) is 2-regular: zero degree variance -> NULL
    val clique = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("o", "p")
    val cr = GraphOps.assortativityOf(clique).collect().head
    assert(cr.isNullAt(6))
    // fixture: a genuine correlation with variance on both sides
    val fr = GraphOps.assortativity(spark, sf).collect().head
    assert(!fr.isNullAt(6))
    val r = fr.getDouble(6)
    assert(r >= -1.0 && r <= 1.0)
    // the formula replayed in plain Scala over the returned sums
    val (m, sj, sk, sjk, sj2, sk2) = (fr.getLong(0).toDouble, fr.getLong(1).toDouble,
      fr.getLong(2).toDouble, fr.getLong(3).toDouble, fr.getLong(4).toDouble,
      fr.getLong(5).toDouble)
    assert(r == (m * sjk - sj * sk) /
      (math.sqrt(m * sj2 - sj * sj) * math.sqrt(m * sk2 - sk * sk)))
    // stub symmetry: both orientations are present
    assert(fr.getLong(1) == fr.getLong(2) && fr.getLong(4) == fr.getLong(5))
  }

  test("link prediction: hand-computed scores on a 6-wedge non-edge pair") {
    // orders of size 2 build edges 100-k and 200-k for k=1..6; 100-200
    // is NOT an edge. Six degree-2 centers each contribute one wedge
    // (100,200); pairs (k1,k2) share only {100,200} = 2 < MinCommon.
    val membership = (1L to 6L).flatMap { k =>
      Seq((10 * k, 100L), (10 * k, k), (10 * k + 1, 200L), (10 * k + 1, k))
    }.toDF("o", "p")
    val got = GraphOps.linkPredictionOf(membership)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val aaPerWedge = math.round(1000000.0 / math.log(2.0)) // deg(center)=2
    assert(got == Seq((100L, 200L, 6L, 6L, 6L,
      1000L * 6 / (6 + 6 - 6), 6L * aaPerWedge)))
  }

  test("link prediction: hub centers above the degree cap are suppressed") {
    // same 6-wedge pair, plus center 999 adjacent to 100, 200 and 127
    // fillers: deg(999) = 129 > HubCap -> its wedge must NOT count,
    // but 999's edges still raise the endpoint degrees used by Jaccard
    val base = (1L to 6L).flatMap { k =>
      Seq((10 * k, 100L), (10 * k, k), (10 * k + 1, 200L), (10 * k + 1, k))
    }
    val hub = Seq((1000L, 999L, 100L), (1001L, 999L, 200L)).flatMap {
      case (o, h, x) => Seq((o, h), (o, x))
    } ++ (1L to 127L).flatMap { i =>
      Seq((2000L + i, 999L), (2000L + i, 5000L + i))
    }
    val membership = (base ++ hub).toDF("o", "p")
    val got = GraphOps.linkPredictionOf(membership)
      .filter(col("a") === 100L && col("b") === 200L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val aaPerWedge = math.round(1000000.0 / math.log(2.0))
    // n_common stays 6 (hub suppressed); degrees are now 7 each
    assert(got == Seq((100L, 200L, 6L, 7L, 7L,
      1000L * 6 / (7 + 7 - 6), 6L * aaPerWedge)))
  }

  test("link prediction: fixture output is valid, non-adjacent, totally ordered") {
    val out = GraphOps.linkPrediction(spark, sf).cache()
    val rows = out.as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= GraphOps.LinkPred.TopK)
    rows.foreach { case (a, b, cn, da, db, jm, aa) =>
      assert(a < b && cn >= GraphOps.LinkPred.MinCommon)
      assert(cn <= math.min(da, db)) // common neighbors bounded by degree
      assert(jm >= 0 && jm <= 1000 && aa > 0)
    }
    assert(rows == rows.sortBy(r => (-r._3, -r._7, r._1, r._2)))
    // no returned pair is an existing edge
    import org.apache.spark.sql.functions.{col => c}
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(c("l_orderkey").as("o"), c("l_partkey").as("p")).distinct()
    val und = li.as("x").join(li.as("y"),
        c("x.o") === c("y.o") && c("x.p") < c("y.p"))
      .select(c("x.p").as("a"), c("y.p").as("b")).distinct()
    assert(out.join(und, Seq("a", "b"), "left_semi").count() == 0)
    out.unpersist()
  }
}
