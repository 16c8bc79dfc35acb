package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-CLUSTER resolution: near-dup PAIRS (the LSH output) are only
  * half of dedup — to actually drop documents you need the connected
  * components of the pair graph and one elected survivor per component
  * (a–b and b–c similar ⇒ {a,b,c} is one cluster even if a–c never met in
  * an LSH bucket).
  *
  * Algorithm: minimum-label propagation (Pregel-style). Every node starts
  * labeled with its own id; each round a node takes the min label across
  * itself and its neighbors — one equi-join (edges ⋈ labels on src) plus
  * one shuffle-on-node min-aggregation per round, both map-side combined.
  * Fixpoint detection is O(1) per round: labels only ever decrease, so an
  * unchanged global label SUM means no label moved (one scalar action, no
  * data to the driver). Rounds needed = component diameter.
  *
  * 100 TB shape: per round the moving set is (node, label) pairs — far
  * smaller than the corpus — shuffled on `node`, co-partitioned with the
  * edge list; there is no all-pairs step anywhere and no growth between
  * rounds. Near-dup clusters are small and dense by construction (near-
  * transitive similarity), so diameter — and the round count — is tiny;
  * `maxIter` bounds the loop against pathological chains, where the
  * alternating large/small-star contraction (O(log n) rounds) would be
  * the upgrade path.
  */
object GraphOps {

  /** Connected components of an undirected pair graph given as (a, b)
    * rows. Returns (node, label) with label = min node id reachable —
    * a canonical, deterministic component id. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Lineage.truncate (eager) both materializes AND TRUNCATES LINEAGE.
    // Plain persist() short-circuits execution but not analysis: every
    // round Catalyst would re-optimize a logical plan embedding the whole
    // upstream pipeline (here: the entire MinHash LSH dag) plus all
    // previous rounds, and driver-side planning dominates the loop
    // (measured ~2 s/round at sf0.1 vs ~0.2 s with truncation). It also
    // stops the symmetrizing union's two branches from racing to compute
    // the cold upstream twice. The primitive is fault-model-bound: with
    // a checkpoint dir configured it is reliable checkpoint() (the loop
    // survives executor loss on a cluster); otherwise localCheckpoint
    // (local mode — losing the one executor is losing the job anyway).
    val p = Lineage.truncate(pairs.select(col("a"), col("b")))
    val edges = Lineage.truncate(
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst"))))
    // Seed labels with the FIRST propagation round for free: label(v) =
    // min(v, min neighbor) is one aggregation over the (already
    // symmetrized) edge list — no join, and for diameter-1 components
    // (the bulk of near-dup clusters: twin pairs) it is already the
    // fixpoint, so the loop below runs exactly one confirming round.
    var labels = Lineage.truncate(edges
      .groupBy(col("src").as("node"))
      .agg(least(col("node"), min(col("dst"))).as("label")))
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum(col("label"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var prev = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = Lineage.truncate(edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label")))
      val cur = labelSum(next)
      labels = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    labels
  }

  /** Cluster resolution over the MinHash-LSH dup pairs: every doc that
    * appears in a dup pair gets its cluster id (min doc id reachable),
    * the cluster size, and a survivor flag (the canonical min doc). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.dupPairs(s, dir).select(col("a"), col("b"))
    connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("survivor", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe train/val/test assignment: near-duplicates straddling
    * the train/test boundary CONTAMINATE evaluation, so the split coin
    * is flipped on the doc's CLUSTER id (min doc id of its component;
    * singletons use their own id) — every member of a dup cluster lands
    * in the same split by construction. The output is a one-row audit:
    * corpus/split counts plus the number of dup pairs crossing splits
    * under the naive per-doc coin (non-zero: the leak) vs the
    * cluster-keyed coin (zero, enforced). Same affine-hash coin as
    * [[Sampling.splitAssign]] — deterministic across engines, retries,
    * and cluster sizes. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val base = DedupOps.withTwins(
        s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"))
    val pairs = Lineage.truncate(DedupOps.dupPairs(s, dir).select(col("a"), col("b")))
    val cc = connectedComponents(pairs)
    def coin(c: Column) = (c * Sampling.HashA + Sampling.HashB) % Sampling.Mod
    def splitOf(c: Column) =
      when(coin(c) < Sampling.Mod * 8 / 10, "train")
        .when(coin(c) < Sampling.Mod * 9 / 10, "val")
        .otherwise("test")
    val assigned = Lineage.truncate(base
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("split_key"))
      .select(col("doc_id"), col("split_key"),
        splitOf(col("split_key")).as("split"),
        splitOf(col("doc_id")).as("naive_split")))
    val pairSplits = pairs
      .join(assigned.select(col("doc_id").as("a"),
        col("split").as("sa"), col("naive_split").as("na")), Seq("a"))
      .join(assigned.select(col("doc_id").as("b"),
        col("split").as("sb"), col("naive_split").as("nb")), Seq("b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("na") =!= col("nb"), 1L).otherwise(0L)).as("naive_cross_split_pairs"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("safe_cross_split_pairs"))
    val counts = assigned.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("split_key")).as("n_split_keys"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    counts.crossJoin(pairSplits) // 1-row × 1-row audit summary
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (dedupClusters _),
    "dedup_split_leakage" -> (splitLeakage _)
  )

  /** DuckDB oracle: re-runs the whole MinHash pipeline (shared CTE chain
    * from [[DedupOps.dupPairCtes]]), then computes components with a
    * RECURSIVE reachability walk + min-per-node — an independent
    * algorithm arriving at the same fixpoint, so both candidate
    * generation and cluster resolution are cross-checked. */
  val dedupClustersSql: String =
    "WITH RECURSIVE " + DedupOps.dupPairCtes + s""",
       |dup AS (SELECT a, b FROM jac WHERE jaccard >= 0.5),
       |edges AS (SELECT a AS src, b AS dst FROM dup
       |          UNION ALL SELECT b AS src, a AS dst FROM dup),
       |walk(node, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
       |cc AS (SELECT node AS doc_id, min(label) AS cluster_id
       |       FROM walk GROUP BY node)
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  doc_id = cluster_id AS survivor
       |FROM cc ORDER BY doc_id""".stripMargin

  /** Oracle: same recursive-CTE components, same affine coin. */
  val splitLeakageSql: String = {
    val (a, b, m) = (Sampling.HashA, Sampling.HashB, Sampling.Mod)
    def splitSql(key: String) =
      s"""CASE WHEN ($key * $a + $b) % $m < ${m * 8 / 10} THEN 'train'
         |     WHEN ($key * $a + $b) % $m < ${m * 9 / 10} THEN 'val'
         |     ELSE 'test' END""".stripMargin
    "WITH RECURSIVE " + DedupOps.dupPairCtes + s""",
       |dup AS (SELECT a, b FROM jac WHERE jaccard >= 0.5),
       |edges AS (SELECT a AS src, b AS dst FROM dup
       |          UNION ALL SELECT b AS src, a AS dst FROM dup),
       |walk(node, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
       |cc AS (SELECT node, min(label) AS lbl FROM walk GROUP BY node),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(cc.lbl, d.doc_id) AS split_key,
       |    ${splitSql("COALESCE(cc.lbl, d.doc_id)")} AS split,
       |    ${splitSql("d.doc_id")} AS naive_split
       |  FROM (SELECT doc_id FROM base) d LEFT JOIN cc ON cc.node = d.doc_id),
       |pairstats AS (
       |  SELECT count(*) AS n_pairs,
       |    CAST(SUM(CASE WHEN pa.naive_split <> pb.naive_split THEN 1 ELSE 0 END) AS BIGINT) AS naive_cross_split_pairs,
       |    CAST(SUM(CASE WHEN pa.split <> pb.split THEN 1 ELSE 0 END) AS BIGINT) AS safe_cross_split_pairs
       |  FROM dup JOIN asg pa ON pa.doc_id = dup.a JOIN asg pb ON pb.doc_id = dup.b),
       |counts AS (
       |  SELECT count(*) AS n_docs, count(DISTINCT split_key) AS n_split_keys,
       |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |  FROM asg)
       |SELECT counts.*, pairstats.* FROM counts, pairstats""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql,
    "dedup_split_leakage" -> splitLeakageSql
  )
}
