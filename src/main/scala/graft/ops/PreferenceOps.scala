package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bradley-Terry preference-strength fitting (Bradley & Terry 1952) via
  * Hunter's MM algorithm (Hunter 2004) — the aggregation step behind
  * reward-model / RLHF data pipelines: billions of pairwise preference
  * judgements reduce to a tiny per-item-pair win matrix, and the
  * maximum-likelihood item strengths come from a fixed-point iteration
  * over that matrix.
  *
  * Pipeline shape at 100 TB: the ONLY corpus-scale work is deriving and
  * aggregating the pairwise judgements — here, within each order the
  * brand with the higher line-revenue total beats each lower one (ties
  * abstain), a per-order fan-out bounded by C(7,2) pairs, aggregated to
  * a (winner, loser, n) matrix bounded by the item vocabulary squared.
  * The MM iterations run on that broadcastable matrix (driver-side
  * here; the state is |items| numbers) — the same bounded-driver-state
  * loop as the trained quality classifier and Fellegi-Sunter EM.
  *
  * Determinism: strengths live in MICRO-integer units; each MM step is
  *   d_i = Σ_j floor(N_ij·10¹² / (w_i + w_j)),  w_i' = floor(W_i·10¹² / d_i)
  * renormalized to Σw = |items|·10⁶ — all operands positive and
  * < 2^63, so Spark's truncating DIV equals DuckDB's flooring `//` and
  * the oracle replays every iteration bit-for-bit as unrolled CTEs.
  */
object PreferenceOps {

  val BtIters = 8
  val BtScale = 1000000000000L // 1e12 — per-term fixed-point scale
  val BtUnit = 1000000L // 1e6 micro-units per 1.0 strength

  /** (winner, loser, n) win matrix + per-item totals from the order
    * basket preferences. Ties on total revenue abstain. */
  private[ops] def winMatrix(s: SparkSession, dir: String): DataFrame = {
    val brandTotals = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .join(broadcast(s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_brand"))
      .agg(sum(col("cents")).as("total_cents"))
    brandTotals.as("x").join(brandTotals.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.total_cents") > col("y.total_cents"))
      .groupBy(col("x.p_brand").as("winner"), col("y.p_brand").as("loser"))
      .agg(count(lit(1)).as("n"))
  }

  def bradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val matrix = winMatrix(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = matrix.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = new Array[Long](k) // W_i: total wins
    val games = Array.ofDim[Long](k, k) // N_ij: games between i and j
    matrix.foreach { case (win, lose, n) =>
      val i = idx(win); val j = idx(lose)
      wins(i) += n; games(i)(j) += n; games(j)(i) += n
    }
    val total = k.toLong * BtUnit
    var w = Array.fill(k)(BtUnit)
    for (_ <- 1 to BtIters) {
      val d = Array.tabulate(k) { i =>
        var s0 = 0L
        var j = 0
        while (j < k) {
          // greatest(..., 1): two zero-win items that met each other
          // both renormalize to 0 — their mutual term must not divide
          // by zero (same guard in the oracle)
          if (games(i)(j) > 0) s0 += games(i)(j) * BtScale / math.max(w(i) + w(j), 1L)
          j += 1
        }
        s0
      }
      val u = Array.tabulate(k)(i => if (d(i) > 0) wins(i) * BtScale / d(i) else 0L)
      val sU = u.sum
      w = u.map(v => v * total / math.max(sU, 1L))
    }
    import s.implicits._
    val strengths = items.indices
      .map(i => (items(i), wins(i), games(i).sum, w(i)))
      .toDF("brand", "n_wins", "n_games", "strength_micro")
    strengths
      .orderBy(col("strength_micro").desc, col("brand"))
  }

  /** Oracle: same win matrix in SQL, the MM loop unrolled — per round
    * one pair-term CTE (d_i from the symmetric matrix joined to the
    * previous round's weights twice), one update CTE, one normalize
    * CTE. */
  val bradleyTerrySql: String = {
    val iters = (1 to BtIters).map { r =>
      val prev = s"w${r - 1}"
      s"""d$r AS MATERIALIZED (
         |  SELECT g.i, CAST(sum(g.n * $BtScale // greatest(wi.w + wj.w, 1)) AS BIGINT) AS d
         |  FROM sym g JOIN $prev wi ON wi.i = g.i JOIN $prev wj ON wj.i = g.j
         |  GROUP BY 1),
         |u$r AS MATERIALIZED (
         |  SELECT t.i,
         |    CAST(CASE WHEN d > 0 THEN t.wins * $BtScale // d ELSE 0 END AS BIGINT) AS u
         |  FROM totals t JOIN d$r ON d$r.i = t.i),
         |w$r AS MATERIALIZED (
         |  SELECT i, CAST(u * (SELECT count(*) * $BtUnit FROM totals)
         |    // greatest((SELECT sum(u) FROM u$r), 1) AS BIGINT) AS w
         |  FROM u$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH bt AS MATERIALIZED (
       |  SELECT l_orderkey, p_brand,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS total_cents
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT x.p_brand AS winner, y.p_brand AS loser, CAST(count(*) AS BIGINT) AS n
       |  FROM bt x JOIN bt y
       |    ON x.l_orderkey = y.l_orderkey AND x.total_cents > y.total_cents
       |  GROUP BY 1, 2),
       |sym AS MATERIALIZED (
       |  SELECT i, j, CAST(sum(n) AS BIGINT) AS n FROM (
       |    SELECT winner AS i, loser AS j, n FROM m
       |    UNION ALL SELECT loser, winner, n FROM m)
       |  GROUP BY 1, 2),
       |totals AS MATERIALIZED (
       |  SELECT i, CAST(coalesce(sum(CASE WHEN won THEN n END), 0) AS BIGINT) AS wins,
       |    CAST(sum(n) AS BIGINT) AS games
       |  FROM (
       |    SELECT winner AS i, n, true AS won FROM m
       |    UNION ALL SELECT loser, n, false FROM m)
       |  GROUP BY 1),
       |w0 AS (SELECT i, CAST($BtUnit AS BIGINT) AS w FROM totals),
       |$iters
       |SELECT t.i AS brand, t.wins AS n_wins, t.games AS n_games,
       |  w.w AS strength_micro
       |FROM totals t JOIN w$BtIters w ON w.i = t.i
       |ORDER BY strength_micro DESC, brand""".stripMargin
  }

  // ------------------------------------------------------------------
  // Cohen's kappa (Cohen 1960) between two deterministic "raters" over
  // the SAME preference pairs — the inter-annotator-agreement QA gate a
  // preference-data pipeline runs before trusting judgments enough to
  // fit Bradley-Terry on them: agreement corrected for the agreement
  // two raters would reach by chance given their marginal vote rates.
  // Rater A prefers the brand with higher order-revenue (the BT
  // signal); rater B the one with higher order-quantity. Pairs where
  // either rater ties abstain (standard practice).
  //
  // Shape at 100 TB: ONE (order, brand) rollup carrying both metrics,
  // one within-order pair fan-out bounded by C(brands-per-order, 2),
  // then a single global aggregate to five integers. Exactness: po/pe
  // in milli via nonnegative DIV; kappa's numerator can be NEGATIVE
  // (worse-than-chance), so it uses the sign-aware divide-magnitudes
  // idiom (Spark DIV truncates toward zero, DuckDB // floors).
  def cohenKappa(s: SparkSession, dir: String): DataFrame = {
    val t = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("qunits"))
      .join(broadcast(s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_brand"))
      .agg(sum(col("cents")).as("cents"), sum(col("qunits")).as("qunits"))
    val rated = t.as("x").join(t.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.p_brand") < col("y.p_brand")) // canonical pair order
      .filter(col("x.cents") =!= col("y.cents") &&
        col("x.qunits") =!= col("y.qunits")) // both raters must vote
      .select(
        when(col("x.cents") > col("y.cents"), 1L).otherwise(2L).as("ra"),
        when(col("x.qunits") > col("y.qunits"), 1L).otherwise(2L).as("rb"))
    rated.agg(
        count(lit(1)).as("n"),
        sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("agree"),
        sum(when(col("ra") === 1L, 1L).otherwise(0L)).as("na1"),
        sum(when(col("rb") === 1L, 1L).otherwise(0L)).as("nb1"))
      .select(col("n").as("n_pairs"), col("agree").as("n_agree"),
        expr("1000 * agree DIV n").as("po_milli"),
        expr("1000 * (na1 * nb1 + (n - na1) * (n - nb1)) DIV (n * n)").as("pe_milli"),
        expr("""CASE WHEN agree * n - (na1 * nb1 + (n - na1) * (n - nb1)) >= 0
               |THEN 1000 * (agree * n - (na1 * nb1 + (n - na1) * (n - nb1)))
               |     DIV (n * n - (na1 * nb1 + (n - na1) * (n - nb1)))
               |ELSE -((1000 * ((na1 * nb1 + (n - na1) * (n - nb1)) - agree * n))
               |     DIV (n * n - (na1 * nb1 + (n - na1) * (n - nb1))))
               |END""".stripMargin.replace('\n', ' ')).as("kappa_milli"))
  }

  val cohenKappaSql: String =
    """WITH t AS (
      |  SELECT l_orderkey, p_brand,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT) AS qunits
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |rated AS (
      |  SELECT CASE WHEN x.cents > y.cents THEN 1 ELSE 2 END AS ra,
      |         CASE WHEN x.qunits > y.qunits THEN 1 ELSE 2 END AS rb
      |  FROM t x JOIN t y
      |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
      |  WHERE x.cents <> y.cents AND x.qunits <> y.qunits),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree,
      |    CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na1,
      |    CAST(sum(CASE WHEN rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb1
      |  FROM rated)
      |SELECT n AS n_pairs, agree AS n_agree,
      |  CAST(1000 * agree // n AS BIGINT) AS po_milli,
      |  CAST(1000 * (na1 * nb1 + (n - na1) * (n - nb1)) // (n * n) AS BIGINT) AS pe_milli,
      |  CAST(CASE WHEN agree * n - (na1 * nb1 + (n - na1) * (n - nb1)) >= 0
      |    THEN 1000 * (agree * n - (na1 * nb1 + (n - na1) * (n - nb1)))
      |         // (n * n - (na1 * nb1 + (n - na1) * (n - nb1)))
      |    ELSE -((1000 * ((na1 * nb1 + (n - na1) * (n - nb1)) - agree * n))
      |         // (n * n - (na1 * nb1 + (n - na1) * (n - nb1))))
      |  END AS BIGINT) AS kappa_milli
      |FROM a""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rank_bradley_terry" -> (bradleyTerry _),
    "rank_cohen_kappa" -> (cohenKappa _)
  )

  val oracle: Map[String, String] = Map(
    "rank_bradley_terry" -> bradleyTerrySql,
    "rank_cohen_kappa" -> cohenKappaSql
  )
}
