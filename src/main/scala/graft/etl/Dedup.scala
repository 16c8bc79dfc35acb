package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D5: the ReplacingMergeTree dedup-by-key storage contract
  * (reference DDL ORDER BY clauses, src/main.rs:87-88,122-123,139-140,
  * 156-157). ClickHouse keeps one arbitrary survivor per key *eventually*
  * via background merges; we implement exact dedup at read/compaction time,
  * which is strictly stronger (deterministic, immediate). Divergence
  * documented per SURVEY §7.4.
  */
object Dedup {

  /** Arbitrary-survivor dedup — the closest analog of a no-version
    * ReplacingMergeTree. One shuffle on the key columns; partial
    * (map-side) dedup happens automatically via the aggregate. */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic-survivor dedup: keep the first row per key under an
    * explicit tiebreak order — what ClickHouse users emulate with
    * FINAL/argMax. Single shuffle on the keys (window partition). */
  def deterministic(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
