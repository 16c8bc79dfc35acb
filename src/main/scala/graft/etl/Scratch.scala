package graft.etl

import org.apache.spark.sql.SparkSession

/** Cluster-portable scratch root for registered diagnostics that persist
  * an intermediate artifact mid-query (the incremental MinHash index,
  * the DPP month-partitioned fact copy).
  *
  * These used to land in `java.nio.file.Files.createTempDirectory` —
  * a DRIVER-LOCAL `file:/tmp/...` path that executors on a multi-node
  * cluster cannot see (round-8's maintenance-layer failure mode, again),
  * and a fresh directory per invocation, so repeated bench reps leaked
  * one artifact of disk each. Instead:
  *
  *   - the root is configurable via `spark.graft.scratchDir` — on a
  *     real cluster set it to shared storage (`hdfs://…`, `s3a://…`);
  *     the default is the JVM temp dir, correct for local[n] and tests;
  *   - each artifact gets a FIXED name under the root and is written
  *     with overwrite, so disk usage is bounded at one copy per
  *     artifact no matter how many times the diagnostic runs;
  *   - all path handling goes through the scheme-aware
  *     [[WarehouseFs]] binding, never `java.io.File`.
  *
  * No post-run delete: the registered queries RETURN a lazy DataFrame
  * that still reads the artifact when the caller materializes it, so
  * eager cleanup would race the consumer. [[cleanAll]] removes the
  * whole root once results are consumed (Verify/Bench call it at exit).
  */
private[graft] object Scratch {

  val ConfKey = "spark.graft.scratchDir"

  def root(s: SparkSession): String =
    s.conf.getOption(ConfKey).getOrElse(
      "file:" + sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_scratch")

  /** Fixed scratch path for a named artifact; parents are created via
    * the root's own FileSystem scheme. */
  def path(s: SparkSession, name: String): String = {
    val p = root(s).stripSuffix("/") + "/" + name
    val (fs, hp) = WarehouseFs.resolve(s, p)
    WarehouseFs.mkdirs(fs, hp.getParent)
    p
  }

  /** Delete the entire scratch root (safe: everything under it is
    * overwrite-written derived state). */
  def cleanAll(s: SparkSession): Unit = {
    val (fs, hp) = WarehouseFs.resolve(s, root(s))
    WarehouseFs.deleteTree(fs, hp)
  }
}
