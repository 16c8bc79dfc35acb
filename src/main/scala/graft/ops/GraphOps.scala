package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // localCheckpoint (eager) both materializes AND TRUNCATES LINEAGE.
    // Plain persist() short-circuits execution but not analysis: every
    // round Catalyst would re-optimize a logical plan embedding the whole
    // upstream pipeline (here: the entire MinHash LSH dag) plus all
    // previous rounds, and driver-side planning dominates the loop
    // (measured ~2 s/round at sf0.1 vs ~0.2 s with truncation). It also
    // stops the symmetrizing union's two branches from racing to compute
    // the cold upstream twice. On a real cluster the same role is played
    // by reliable checkpoint() to the cluster FS (localCheckpoint blocks
    // are lost with an executor; fine in local mode).
    val p = pairs.select(col("a"), col("b")).localCheckpoint()
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum(col("label"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var prev = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (dedupClusters _)
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

  val oracle: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql
  )
}
