package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Window helpers shared by the ops families. */
private[graft] object Windows {

  /** Global-order window over a PROVABLY BOUNDED frame — shard-count
    * offset tables, post-`limit` top-K pools. Semantically identical to
    * a bare `Window.orderBy` (one partition either way; the input is
    * small by construction), but the constant partition key keeps
    * WindowExec's "No Partition Defined" warning MEANINGFUL: these
    * known-benign sites used to emit it dozens of times per bench run,
    * so a real unbounded global window appearing in a future plan would
    * drown in the noise. Use only where the input row count is bounded
    * by a constant or a shard count, never on corpus-scale frames.
    *
    * The annotation only survives to WindowExec when the session
    * excludes [[KeepConstPartitionKeysRule]] (Bench/Verify/SparkSuite
    * do): Catalyst's `EliminateWindowPartitions` otherwise folds the
    * literal key back to an empty partition spec. Without the
    * exclusion the plan is identical and merely warns — degradation is
    * cosmetic, never semantic.
    */
  def boundedGlobal(order: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(order: _*)

  /** Optimizer rule that folds constant window partition keys away —
    * excluded in our sessions so [[boundedGlobal]]'s marker reaches the
    * physical plan. */
  val KeepConstPartitionKeysRule =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"
}
