package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Clustering, DedupOps, GraphOps}

/** Phase profile of `dedup_semantic` — where do the seconds go?
  * Times: corpus count, k-means training (Iters Lloyd rounds), final
  * assignment (+norm, checkpoint), candidate pairs (MaxCell guard),
  * connected components. Each phase forced with an action.
  */
object SemProfile {
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
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val twins = emb.select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 1.001d AS FLOAT))").as("embedding"))
      val base = emb.unionByName(twins)
      val n = t("count")(base.count())
      val k = Clustering.kFor(n)
      println(s"  n=$n k=$k")
      val cents = t("train (3 iters)")(Clustering.trainCentroids(spark, sfDir, k))
      import graft.functions.FloatDot
      val asg = t("assign+ckpt") {
        Clustering.assign(base, cents)
          .withColumn("nrm", sqrt(FloatDot(col("embedding"), col("embedding"))))
          .localCheckpoint()
      }
      val pairs = t("pairs+ckpt")(DedupOps.semanticPairs(asg).localCheckpoint())
      t("cc+collect") {
        GraphOps.connectedComponents(pairs.select(col("a"), col("b")))
          .filter(col("node") =!= col("label"))
          .count()
      }
    }
    spark.stop()
  }
}
