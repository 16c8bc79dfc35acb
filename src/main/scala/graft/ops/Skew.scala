package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join. AQE's skew-join handles most cases
  * at runtime; explicit salting is the deterministic fallback for *known*
  * hot keys (a contract address with 10^9 events): the big side gets a
  * random-but-deterministic salt in [0, n), the small side is replicated
  * n times, and the join key becomes (key, salt) — one hot key spreads
  * over n tasks.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side salted
    * `factor` ways. Result equals the unsalted join exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0)
    // deterministic salt from row content (stable under retries, unlike rand())
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
