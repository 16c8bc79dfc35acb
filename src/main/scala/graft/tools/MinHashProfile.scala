package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Phase profile of the MinHash-LSH near-dup pipeline — where do the
  * seconds of `dedup_minhash_lsh` go? Shingling (explode + HOF hash),
  * signature aggregation (wide 32-min groupBy), banding + bucket
  * grouping, and the exact-verify Jaccard joins, each forced with an
  * action on top of the previous phase's checkpoint.
  */
object MinHashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ($sfDir)")
      val base = DedupOps.withTwins(
        spark.read.parquet(s"$sfDir/documents.parquet")).localCheckpoint()
      println(s"  docs=${base.count()}")
      val sh = t("shingles+ckpt")(DedupOps.shingleSet(base).localCheckpoint())
      println(s"  shingle_rows=${sh.count()}")
      val sig = t("signatures")(
        { val s = DedupOps.signaturesFromShingles(sh).localCheckpoint(); s.count(); s })
      val cand = t("band+buckets+pairs")(
        { val c = DedupOps.minhashCandidatesFromShingles(sh).localCheckpoint(); c.count(); c })
      println(s"  candidates=${cand.count()}")
      // candidate-volume stats — the confirm-before-flagging diagnostic:
      // a timing shift with UNCHANGED counts is host noise; a shift that
      // tracks candidate growth is the corpus changing near-dup density
      // stats MUST come from the same candidate path being timed
      // (bandKeysFromShingles): the narrow bandKeys() path emits null
      // band_key rows for sub-3-token docs, which would pool into one
      // pseudo-bucket per band and inflate buckets/max_bucket/raw_pairs
      // relative to the pipeline actually profiled above
      val buckets = DedupOps.bandKeysFromShingles(sh)
        .groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
      val st = buckets.agg(count(lit(1)), max(col("n")),
        sum(col("n") * (col("n") - 1) / 2),
        sum(when(col("n") > DedupOps.MaxBucket, 1).otherwise(0))).head()
      println(s"  buckets(n>1)=${st.getLong(0)} max_bucket=${st.getLong(1)} " +
        s"raw_pairs=${st.getDouble(2).toLong} over_cap=${st.getLong(3)}")
      val touched = cand.select(col("a").as("d"))
        .unionByName(cand.select(col("b").as("d"))).distinct().count()
      println(s"  docs_touched_by_verify=$touched")
      t("exact jaccard") {
        DedupOps.jaccard(cand, sh).filter(col("jaccard") >= 0.5).count()
      }
      // the narrow codegen path, end to end
      t("FAST sig narrow") {
        DedupOps.signatureArray(base).agg(count(col("sig"))).head
      }
      t("FAST candidates") {
        DedupOps.minhashCandidates(base).count()
      }
      t("FAST full dupPairs") {
        DedupOps.dupPairsFrom(base).count()
      }
      sig.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
