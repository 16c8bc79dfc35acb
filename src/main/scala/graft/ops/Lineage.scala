package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation bound to the cluster's fault model.
  *
  * Iterative dags (connected-components label propagation, BPE merge
  * rounds) MUST truncate lineage each round — otherwise Catalyst
  * re-optimizes a plan embedding every previous round plus the whole
  * upstream pipeline, and driver-side planning dominates the loop
  * (measured ~2 s/round vs ~0.2 s truncated at sf0.1). But the two
  * truncation primitives fail differently:
  *
  *  - `localCheckpoint()` stores blocks on executors. Fast, no
  *    configuration — and FATAL to the job if an executor dies, because
  *    the truncated lineage leaves nothing to recompute from. Fine on
  *    local[N] (one JVM: losing the executor IS losing the job).
  *  - `checkpoint()` writes to the configured checkpoint directory
  *    through the cluster FS: a lost executor's blocks are re-read, the
  *    loop survives. Requires `SparkContext.setCheckpointDir`.
  *
  * [[truncate]] picks reliable `checkpoint()` whenever a checkpoint dir
  * is configured and falls back to `localCheckpoint()` otherwise — so a
  * cluster job opts into fault tolerance with one standard setting
  * (`spark.sparkContext.setCheckpointDir("hdfs://…")`) and local runs
  * keep the zero-config fast path. Single-pass shares (a frame consumed
  * by two joins in the same job) stay on plain `localCheckpoint` at
  * their call sites: a lost block there fails one bounded job whose
  * rerun is the recovery, which is not true mid-loop.
  */
private[graft] object Lineage {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
