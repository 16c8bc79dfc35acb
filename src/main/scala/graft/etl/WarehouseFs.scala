package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Scheme-aware filesystem binding for warehouse maintenance (resume
  * markers, compaction swaps, emptied-partition deletion, stream-state
  * probes).
  *
  * These features used to go through `java.io.File`, which silently
  * binds to the LOCAL filesystem: on an `hdfs://` or `s3a://` warehouse
  * an existence check is always false (so resume re-ingests everything)
  * and a delete never happens (so a reorg rollback leaves exactly the
  * emptied tail partitions it exists to remove). Resolving the
  * FileSystem FROM THE PATH's scheme via Hadoop's `Path.getFileSystem`
  * keeps the identical logic working on every Hadoop-supported store —
  * `file:`, HDFS, S3A, ABFS — which is the same binding Spark itself
  * uses for its reads and writes. Scheme-less paths resolve against
  * `fs.defaultFS`, exactly like a `spark.read.parquet(path)` would.
  */
private[graft] object WarehouseFs {

  /** Resolve (FileSystem, Path) from the path's own scheme, under the
    * session's Hadoop conf (so `spark.hadoop.*` credentials/overrides
    * apply, same as Spark's own I/O). */
  def resolve(spark: SparkSession, path: String): (FileSystem, Path) =
    resolve(spark.sessionState.newHadoopConf(), path)

  /** Conf-only variant for call sites with no SparkSession in scope
    * (e.g. the chain-tip head spool, which runs on a listener thread). */
  def resolve(conf: Configuration, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  def exists(fs: FileSystem, p: Path): Boolean = fs.exists(p)

  def isFile(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && fs.getFileStatus(p).isFile

  def isDirectory(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && fs.getFileStatus(p).isDirectory

  def mkdirs(fs: FileSystem, p: Path): Unit = { fs.mkdirs(p); () }

  /** Children of `p`; empty when `p` is missing or not a directory. */
  def list(fs: FileSystem, p: Path): Seq[FileStatus] =
    if (isDirectory(fs, p)) fs.listStatus(p).toSeq else Seq.empty

  /** Recursive delete; no-op when missing. */
  def deleteTree(fs: FileSystem, p: Path): Unit = {
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Rename that THROWS on failure — Hadoop's `rename` reports failure
    * as a boolean, which a maintenance swap must never ignore (a false
    * here mid-compaction means the table is at the aside path). */
  def rename(fs: FileSystem, from: Path, to: Path): Unit =
    require(fs.rename(from, to), s"rename failed: $from -> $to")

  def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Create-overwrite write of a small text file (markers). On HDFS the
    * create+close is atomic enough for a commit record (readers see the
    * old content or the new, never a torn file on rename-based stores;
    * on S3A the object is visible only once fully PUT). */
  def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
