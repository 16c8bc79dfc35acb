package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable sketch summaries for corpus statistics — here the
  * count-min sketch (Cormode & Muthukrishnan 2005), the standard
  * fixed-size frequency summary a 100 TB token-statistics pass ships to
  * the driver instead of a vocabulary-sized exact table.
  *
  * Shape: the corpus is aggregated ONCE into per-term counts (map-side
  * combined — the only corpus-wide shuffle), then folded into the
  * depth×width counter grid, which is a CONSTANT-size artifact
  * (4×512 longs here) however large the corpus: counter building and
  * merging are associative sums, so partial sketches combine across
  * executors/days/shards for free. Probing broadcasts the grid.
  *
  * Hashing is the engine-independent recipe the LSH family uses
  * (polynomial string fold + affine row hashes with plan-time literal
  * coefficients), so DuckDB re-runs the ENTIRE sketch — build, probe,
  * min-over-rows — and the estimate is graded cell-exact, not
  * "approximately right".
  */
object SketchOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val CmsDepth = 4
  val CmsWidth = 512
  val CmsMod = 1000000007L
  val CmsProbeK = 30

  /** Affine per-row hash coefficients, shared with the oracle SQL. */
  val cmsAB: IndexedSeq[(Long, Long)] = (0 until CmsDepth).map { d =>
    val a = Math.floorMod(SimilarityOps.mix(0x73737373L + d), CmsMod - 1) + 1
    val b = Math.floorMod(SimilarityOps.mix(0x84848484L + d), CmsMod)
    (a, b)
  }

  /** Build the 4×512 counter grid from the corpus, then probe it with
    * the true top-K terms: est = min over rows of the hashed-slot
    * counter. CMS guarantees est ≥ exact always (graded by the oracle
    * and pinned by the spec); the overcount column surfaces the
    * collision noise the width bounds. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    // per-term exact counts: vocabulary-sized, consumed by both the
    // sketch build and the probe set — materialize once.
    val tf = docs(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("exact_tf"))
      .withColumn("h", graft.functions.PolyHash.polyHash(col("term"), 31, CmsMod))
      .localCheckpoint()
    val slots = cmsAB.zipWithIndex.map { case ((a, b), d) =>
      struct(lit(d).as("d"),
        (((lit(a) * col("h") + lit(b)) % CmsMod) % CmsWidth).as("slot"))
    }
    val counters = tf
      .select(col("exact_tf"), explode(array(slots: _*)).as("ds"))
      .groupBy(col("ds.d").as("d"), col("ds.slot").as("slot"))
      .agg(sum(col("exact_tf")).as("c"))
    val probes = tf.orderBy(col("exact_tf").desc, col("term")).limit(CmsProbeK)
      .select(col("term"), col("exact_tf"), explode(array(slots: _*)).as("ds"))
      .select(col("term"), col("exact_tf"),
        col("ds.d").as("pd"), col("ds.slot").as("pslot"))
    probes
      .join(broadcast(counters),
        col("pd") === col("d") && col("pslot") === col("slot"))
      .groupBy(col("term"), col("exact_tf"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("term"), col("exact_tf"), col("cms_est"),
        (col("cms_est") - col("exact_tf")).as("overcount"))
      .orderBy(col("exact_tf").desc, col("term"))
  }

  val cmsHeavyHittersSql: String = {
    val slotSelects = cmsAB.zipWithIndex.map { case ((a, b), d) =>
      s"SELECT term, exact_tf, $d AS d, (($a * h + $b) % $CmsMod) % $CmsWidth AS slot FROM h"
    }.mkString("\nUNION ALL ")
    s"""WITH tf AS (
       |  SELECT term, count(*) AS exact_tf
       |  FROM (SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |        FROM documents)
       |  GROUP BY 1),
       |h AS (SELECT term, exact_tf,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(term, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $CmsMod) AS h
       |  FROM tf),
       |slots AS ($slotSelects),
       |counters AS (SELECT d, slot, CAST(sum(exact_tf) AS BIGINT) AS c
       |             FROM slots GROUP BY 1, 2),
       |probes AS (SELECT term, exact_tf FROM tf
       |           ORDER BY exact_tf DESC, term LIMIT $CmsProbeK)
       |SELECT p.term, p.exact_tf, min(c.c) AS cms_est,
       |  min(c.c) - p.exact_tf AS overcount
       |FROM probes p
       |JOIN slots s ON s.term = p.term
       |JOIN counters c ON c.d = s.d AND c.slot = s.slot
       |GROUP BY 1, 2
       |ORDER BY 2 DESC, 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cms_heavy_hitters" -> (cmsHeavyHitters _)
  )

  val oracle: Map[String, String] = Map(
    "sketch_cms_heavy_hitters" -> cmsHeavyHittersSql
  )
}
