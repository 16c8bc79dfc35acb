package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (entity resolution): match a "dirty" delivery
  * of records against a master table under typos, the
  * blocking-then-verify shape every large-scale linkage system uses
  * (Fellegi-Sunter style candidate generation; see also the reference's
  * ReplacingMergeTree identity-key dedup, which is the EXACT-key
  * special case of this operator).
  *
  * Shape: a cheap deterministic blocking key (here: first name token +
  * first character of the last token — the parts of the name a data
  *-entry typo is least likely to corrupt) partitions both sides; the
  * edit-distance verify runs only within blocks. At 100 TB the blocked
  * equi-join is the only shuffle, keyed on the blocking key; blocks
  * larger than [[MaxBlock]] masters are dropped entirely (the same
  * skew-cap discipline as the LSH families' MaxBucket — a degenerate
  * key like a one-word name category would otherwise go quadratic),
  * and the per-probe best match is a bounded rank window inside each
  * probe's candidate set, never a global sort.
  *
  * The dirty side is synthesized from the master itself: every 10th
  * part re-enters with one substituted character in its last name
  * token (probe_id = p_partkey + 1e6), so ground truth exists — the
  * probe's original is at edit distance 1 in the same block.
  * Levenshtein is unit-cost on both engines, so the whole operator is
  * exact-integer and hash-matches its DuckDB oracle.
  */
object LinkageOps {

  val MaxEditDist = 2L
  val MaxBlock = 256L

  /** name column -> blocking key: first token | first char of last token. */
  private def blockKey(name: String): Column =
    concat_ws("|",
      expr(s"element_at(split($name, ' '), 1)"),
      expr(s"substring(element_at(split($name, ' '), -1), 1, 1)"))

  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val master = s.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), lower(col("p_name")).as("name"))
    // dirty delivery: one substituted character in the last token
    val probes = master.filter(col("p_partkey") % 10 === 0)
      .select((col("p_partkey") + 1000000L).as("probe_id"),
        expr("concat(array_join(slice(split(name, ' '), 1, size(split(name, ' ')) - 1), ' '), " +
          "' ', substring(element_at(split(name, ' '), -1), 1, 1), 'q', " +
          "substring(element_at(split(name, ' '), -1), 3))").as("probe_name"))
      .withColumn("block", blockKey("probe_name"))
    val blocked = master.withColumn("block", blockKey("name"))
    // skew cap: a blocking key carrying more than MaxBlock master rows
    // is degenerate and dropped from candidate generation entirely
    val blockSizes = blocked.groupBy(col("block")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= MaxBlock)
    val candidates = probes
      .join(blocked.join(blockSizes.select(col("block")), Seq("block")), Seq("block"))
      .withColumn("dist", levenshtein(col("probe_name"), col("name")).cast("long"))
      .filter(col("dist") <= MaxEditDist)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist"), col("p_partkey"))
    candidates
      .withColumn("n_candidates", count(lit(1)).over(Window.partitionBy(col("probe_id"))))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("probe_id"), col("probe_name"),
        col("p_partkey").as("matched_part"), col("name").as("matched_name"),
        col("dist"), col("n_candidates"))
      .orderBy(col("probe_id"))
  }

  val fuzzyMatchSql: String =
    s"""WITH master AS (
       |  SELECT p_partkey, lower(p_name) AS name FROM part),
       |probes AS (
       |  SELECT p_partkey + 1000000 AS probe_id,
       |    array_to_string(list_slice(t, 1, len(t) - 1), ' ') || ' ' ||
       |      substring(t[-1], 1, 1) || 'q' || substring(t[-1], 3) AS probe_name
       |  FROM (SELECT p_partkey, string_split(name, ' ') AS t FROM master)
       |  WHERE p_partkey % 10 = 0),
       |pb AS (
       |  SELECT probe_id, probe_name,
       |    string_split(probe_name, ' ')[1] || '|' ||
       |      substring(string_split(probe_name, ' ')[-1], 1, 1) AS block
       |  FROM probes),
       |mb AS (
       |  SELECT p_partkey, name,
       |    string_split(name, ' ')[1] || '|' ||
       |      substring(string_split(name, ' ')[-1], 1, 1) AS block
       |  FROM master),
       |ok AS (SELECT block FROM mb GROUP BY 1 HAVING count(*) <= $MaxBlock),
       |cand AS (
       |  SELECT probe_id, probe_name, p_partkey, name,
       |    CAST(levenshtein(probe_name, name) AS BIGINT) AS dist
       |  FROM pb JOIN mb USING (block) JOIN ok USING (block)
       |  WHERE levenshtein(probe_name, name) <= $MaxEditDist)
       |SELECT probe_id, probe_name, p_partkey AS matched_part, name AS matched_name,
       |  dist, CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT) AS n_candidates
       |FROM cand
       |QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY dist, p_partkey) = 1
       |ORDER BY probe_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "match_fuzzy_blocked" -> (fuzzyMatch _)
  )

  val oracle: Map[String, String] = Map(
    "match_fuzzy_blocked" -> fuzzyMatchSql
  )
}
