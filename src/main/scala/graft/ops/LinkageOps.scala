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
  * edit-distance verify runs only within blocks.
  *
  * Blocking is HIERARCHICAL (two-level): level-0 blocks whose master
  * count outgrows [[MaxBlock]] are not dropped but REFINED by a
  * preserved structured attribute (brand) — block sizes scale with the
  * corpus while the key vocabulary does not, so at 10× the data a flat
  * cap-and-drop silently degenerates to ZERO candidates (the round-10
  * sf0.1 bench caught exactly that: all 48 name blocks held 278-655
  * masters against a 256 cap). Refinement keeps recall while bounding
  * the join; blocks still over the cap after refinement are degenerate
  * and dropped (the honest residual cap, same discipline as the LSH
  * families' MaxBucket). The oversized-block set is master-derived,
  * tiny (≤ the level-0 key vocabulary), and broadcast to both sides.
  * At 100 TB the blocked equi-join is the only shuffle, keyed on the
  * refined blocking key, and the per-probe best match is a bounded
  * rank window inside each probe's candidate set, never a global sort.
  *
  * The dirty side is synthesized from the master itself: every 10th
  * part re-enters with one substituted character in its last name
  * token (probe_id = p_partkey + 1e6) while the structured attributes
  * (brand/type/size) ride along uncorrupted — the usual re-keyed-
  * delivery failure mode — so ground truth exists: the probe's
  * original is at edit distance 1 in the same (refined) block.
  * Levenshtein is unit-cost on both engines, so the whole operator is
  * exact-integer and hash-matches its DuckDB oracle.
  */
object LinkageOps {

  val MaxEditDist = 2L
  val MaxBlock = 256L

  /** name column -> level-0 blocking key: first token | first char of
    * last token. */
  private def blockKey(name: String): Column =
    concat_ws("|",
      expr(s"element_at(split($name, ' '), 1)"),
      expr(s"substring(element_at(split($name, ' '), -1), 1, 1)"))

  /** Two-level hierarchical blocking. Inputs carry a `b0` level-0 key;
    * master blocks over `maxBlock` refine to `b0#brand` on BOTH sides
    * (brand survives the corruption model), then the residual cap drops
    * still-degenerate refined blocks from the master side. Returns
    * (master, probes) each keyed by `block`, master side cap-filtered. */
  private[ops] def refineBlocks(m0: DataFrame, p0: DataFrame,
      mBrand: Column, pBrand: Column, maxBlock: Long): (DataFrame, DataFrame) = {
    // one corpus-scale stats pass, truncated — the oversized set feeds
    // THREE subtrees (master tag, probe tag, residual-cap recount);
    // without truncation each re-runs the b0 aggregate
    val over = Lineage.truncate(
      m0.groupBy(col("b0")).agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBlock).select(col("b0"), lit(1L).as("_ov")))
    def tag(df: DataFrame, brand: Column): DataFrame =
      df.join(broadcast(over), Seq("b0"), "left")
        .withColumn("block",
          when(col("_ov").isNotNull, concat(col("b0"), lit("#"), brand))
            .otherwise(col("b0")))
        .drop("_ov", "b0")
    val mB = tag(m0, mBrand)
    val ok = mB.groupBy(col("block")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBlock).select(col("block"))
    (mB.join(ok, Seq("block")), tag(p0, pBrand))
  }

  /** Blocking observability — the audit face of the hierarchical-
    * blocking contract (the graph_groupcap_audit pattern extended to
    * linkage, r13 verdict next-round #7): level-0 master block sizes in
    * power-of-two buckets with kept = size ≤ MaxBlock (oversized blocks
    * REFINE by brand, not drop), then the post-refinement blocks — the
    * actual join key — with kept = survives the residual cap (a refined
    * block still over MaxBlock drops its masters from the join). The
    * refined stage's dropped share is exactly the data the contract
    * excludes; this is the query an operator runs on a new corpus
    * before trusting the blocked join. One grouped pass per stage over
    * block STATS (block-count-sized, never master-scale rows). */
  def blockingAudit(s: SparkSession, dir: String): DataFrame = {
    val master = s.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), lower(col("p_name")).as("name"), col("p_brand"))
    val m0 = master.withColumn("b0", blockKey("name"))
    val s0 = Lineage.truncate(
      m0.groupBy(col("b0")).agg(count(lit(1)).as("bn")))
    val over = s0.filter(col("bn") > MaxBlock)
      .select(col("b0"), lit(1L).as("_ov"))
    val sR = m0.join(broadcast(over), Seq("b0"), "left")
      .withColumn("block",
        when(col("_ov").isNotNull, concat(col("b0"), lit("#"), col("p_brand")))
          .otherwise(col("b0")))
      .groupBy(col("block")).agg(count(lit(1)).as("bn"))
    s0.select(lit("level0").as("stage"), col("bn"))
      .unionByName(sR.select(lit("refined").as("stage"), col("bn")))
      .withColumn("size_bucket", (length(bin(col("bn"))) - lit(1)).cast("long"))
      .withColumn("kept", col("bn") <= lit(MaxBlock))
      .groupBy(col("stage"), col("size_bucket"), col("kept"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("bn")).as("n_masters"))
      .orderBy(col("stage"), col("size_bucket"), col("kept"))
  }

  val blockingAuditSql: String =
    s"""WITH master AS (
       |  SELECT p_partkey, lower(p_name) AS name, p_brand FROM part),
       |mb0 AS (
       |  SELECT p_partkey, p_brand,
       |    string_split(name, ' ')[1] || '|' ||
       |      substring(string_split(name, ' ')[-1], 1, 1) AS b0
       |  FROM master),
       |s0 AS (SELECT b0, CAST(count(*) AS BIGINT) AS bn FROM mb0 GROUP BY 1),
       |ov AS (SELECT b0 FROM s0 WHERE bn > $MaxBlock),
       |mb AS (
       |  SELECT CASE WHEN ov.b0 IS NOT NULL THEN mb0.b0 || '#' || p_brand
       |              ELSE mb0.b0 END AS block
       |  FROM mb0 LEFT JOIN ov ON mb0.b0 = ov.b0),
       |sr AS (SELECT block, CAST(count(*) AS BIGINT) AS bn FROM mb GROUP BY 1),
       |u AS (SELECT 'level0' AS stage, bn FROM s0
       |      UNION ALL SELECT 'refined', bn FROM sr)
       |SELECT stage, CAST(length(bin(bn)) - 1 AS BIGINT) AS size_bucket,
       |  bn <= $MaxBlock AS kept, CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(sum(bn) AS BIGINT) AS n_masters
       |FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  def fuzzyMatch(s: SparkSession, dir: String): DataFrame =
    fuzzyMatchAt(s, dir, MaxBlock)

  private[graft] def fuzzyMatchAt(s: SparkSession, dir: String,
      maxBlock: Long): DataFrame = {
    val master = s.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), lower(col("p_name")).as("name"), col("p_brand"))
    // dirty delivery: one substituted character in the last name token;
    // brand rides along uncorrupted (refinement attribute)
    val probes = master.filter(col("p_partkey") % 10 === 0)
      .select((col("p_partkey") + 1000000L).as("probe_id"),
        expr("concat(array_join(slice(split(name, ' '), 1, size(split(name, ' ')) - 1), ' '), " +
          "' ', substring(element_at(split(name, ' '), -1), 1, 1), 'q', " +
          "substring(element_at(split(name, ' '), -1), 3))").as("probe_name"),
        col("p_brand").as("probe_brand"))
      .withColumn("b0", blockKey("probe_name"))
    val m0 = master.withColumn("b0", blockKey("name"))
    val (mB, pB) = refineBlocks(m0, probes, col("p_brand"), col("probe_brand"), maxBlock)
    val candidates = pB.join(mB, Seq("block"))
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

  /** The blocked-candidate CTE chain (master → probes → hierarchical
    * blocks → edit-distance-filtered candidates), shared by the fuzzy
    * match oracle and the golden-record oracle so the two stay one
    * definition. */
  private val candCtesSql: String =
    s"""master AS (
       |  SELECT p_partkey, lower(p_name) AS name, p_brand FROM part),
       |probes AS (
       |  SELECT p_partkey + 1000000 AS probe_id,
       |    array_to_string(list_slice(t, 1, len(t) - 1), ' ') || ' ' ||
       |      substring(t[-1], 1, 1) || 'q' || substring(t[-1], 3) AS probe_name,
       |    p_brand AS probe_brand
       |  FROM (SELECT p_partkey, p_brand, string_split(name, ' ') AS t FROM master)
       |  WHERE p_partkey % 10 = 0),
       |pb0 AS (
       |  SELECT probe_id, probe_name, probe_brand,
       |    string_split(probe_name, ' ')[1] || '|' ||
       |      substring(string_split(probe_name, ' ')[-1], 1, 1) AS b0
       |  FROM probes),
       |mb0 AS (
       |  SELECT p_partkey, name, p_brand,
       |    string_split(name, ' ')[1] || '|' ||
       |      substring(string_split(name, ' ')[-1], 1, 1) AS b0
       |  FROM master),
       |ov AS (SELECT b0 FROM mb0 GROUP BY 1 HAVING count(*) > $MaxBlock),
       |mb AS (
       |  SELECT p_partkey, name,
       |    CASE WHEN ov.b0 IS NOT NULL THEN mb0.b0 || '#' || p_brand
       |         ELSE mb0.b0 END AS block
       |  FROM mb0 LEFT JOIN ov ON mb0.b0 = ov.b0),
       |pbr AS (
       |  SELECT probe_id, probe_name,
       |    CASE WHEN ov.b0 IS NOT NULL THEN pb0.b0 || '#' || probe_brand
       |         ELSE pb0.b0 END AS block
       |  FROM pb0 LEFT JOIN ov ON pb0.b0 = ov.b0),
       |ok AS (SELECT block FROM mb GROUP BY 1 HAVING count(*) <= $MaxBlock),
       |cand AS (
       |  SELECT probe_id, probe_name, p_partkey, name,
       |    CAST(levenshtein(probe_name, name) AS BIGINT) AS dist
       |  FROM pbr JOIN mb USING (block) JOIN ok USING (block)
       |  WHERE levenshtein(probe_name, name) <= $MaxEditDist)""".stripMargin

  val fuzzyMatchSql: String =
    s"""WITH $candCtesSql
       |SELECT probe_id, probe_name, p_partkey AS matched_part, name AS matched_name,
       |  dist, CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT) AS n_candidates
       |FROM cand
       |QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY dist, p_partkey) = 1
       |ORDER BY probe_id""".stripMargin

  // ------------------------------------------------------------------
  // Fellegi-Sunter probabilistic linkage with UNSUPERVISED EM-trained
  // match/non-match weights (Fellegi & Sunter 1969; the Splink/dedupe
  // production shape): candidate pairs from the SAME hierarchical
  // blocking scheme as [[fuzzyMatch]] are reduced to binary comparison
  // vectors (γ_name = edit distance ≤ 2, γ_brand / γ_type / γ_size =
  // agreement), and a 2-class mixture is fit by EM — no labels
  // anywhere; the match class emerges because true pairs agree on
  // everything and block-mates agree at base rates.
  //
  // Everything is exact MILLI-integer arithmetic so training replays
  // bit-for-bit in the DuckDB oracle (the quality-classifier GD idiom):
  // probabilities live in [1, 999] milli, the per-pair posterior is
  //   w = 1000·p·Π_f t_f DIV (p·Π_f t_f + (1000−p)·Π_f s_f)
  // with t_f = m_f if γ_f else 1000−m_f (s_f likewise from u_f) — all
  // operands ≤ 10¹⁸, all nonnegative, so truncating DIV equals flooring
  // `//`. Each M-step re-quantizes to milli, which also kills any
  // float-drift channel between engines.
  //
  // Shape at 100 TB: the blocked pair table (the only corpus-scale
  // join, hierarchically refined + capped like fuzzyMatch) is
  // materialized ONCE; each EM round is one map-side-combined aggregate
  // producing 10 numbers, and the driver state is the 9-parameter
  // vector — the same bounded-driver-state loop as the trained quality
  // classifier.
  val FsIters = 8
  val FsInitP = 100L // prior match prevalence, milli
  val FsInitM = 900L // P(agree | match) init
  val FsInitU = 100L // P(agree | non-match) init
  private val FsFields = Seq("g1", "g2", "g3", "g4")

  /** Blocked candidate pairs with binary comparison vectors. The dirty
    * side reuses [[fuzzyMatch]]'s corruption (one substituted character
    * in the last name token) but carries the original's brand/type/size
    * — the attributes a re-keyed delivery usually preserves. */
  def fsPairs(s: SparkSession, dir: String): DataFrame =
    fsPairsAt(s, dir, MaxBlock)

  private[graft] def fsPairsAt(s: SparkSession, dir: String,
      maxBlock: Long): DataFrame = {
    val master = s.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), lower(col("p_name")).as("name"),
        col("p_brand"), col("p_type"), col("p_size"))
    val probes = master.filter(col("p_partkey") % 10 === 0)
      .select((col("p_partkey") + 1000000L).as("probe_id"),
        expr("concat(array_join(slice(split(name, ' '), 1, size(split(name, ' ')) - 1), ' '), " +
          "' ', substring(element_at(split(name, ' '), -1), 1, 1), 'q', " +
          "substring(element_at(split(name, ' '), -1), 3))").as("probe_name"),
        col("p_brand").as("probe_brand"), col("p_type").as("probe_type"),
        col("p_size").as("probe_size"))
      .withColumn("b0", blockKey("probe_name"))
    val m0 = master.withColumn("b0", blockKey("name"))
    val (mB, pB) = refineBlocks(m0, probes, col("p_brand"), col("probe_brand"), maxBlock)
    pB.join(mB, Seq("block"))
      .select(col("probe_id"), col("p_partkey"),
        when(levenshtein(col("probe_name"), col("name")) <= MaxEditDist, 1L)
          .otherwise(0L).as("g1"),
        when(col("probe_brand") === col("p_brand"), 1L).otherwise(0L).as("g2"),
        when(col("probe_type") === col("p_type"), 1L).otherwise(0L).as("g3"),
        when(col("probe_size") === col("p_size"), 1L).otherwise(0L).as("g4"))
  }

  private def clamp(v: Long): Long = math.max(1L, math.min(999L, v))

  def fsEm(s: SparkSession, dir: String): DataFrame = {
    // Every EM round + final scoring reuse the pair table; mid-loop loss
    // is unrecoverable once lineage is cut, so route through the
    // fault-model-aware primitive (reliable checkpoint when configured).
    val pairs = Lineage.truncate(fsPairs(s, dir))
    var p = FsInitP
    var m = Array.fill(FsFields.size)(FsInitM)
    var u = Array.fill(FsFields.size)(FsInitU)
    // True integer DIV (not Column.divide, whose double quotient loses
    // exactness above 2^53 — numerators here reach ~10^18). Operands
    // are nonnegative, so Spark's truncating DIV equals DuckDB's
    // flooring //; parameters embed as BIGINT literals per round.
    def wCol: Column = {
      val tProd = FsFields.zipWithIndex
        .map { case (g, j) => s"(CASE WHEN $g = 1 THEN ${m(j)}L ELSE ${1000L - m(j)}L END)" }
        .mkString(" * ")
      val sProd = FsFields.zipWithIndex
        .map { case (g, j) => s"(CASE WHEN $g = 1 THEN ${u(j)}L ELSE ${1000L - u(j)}L END)" }
        .mkString(" * ")
      expr(s"((${p}L * $tProd) * 1000L) DIV (${p}L * $tProd + ${1000L - p}L * $sProd)")
    }
    val n = pairs.count()
    // n == 0 (every block degenerate even after refinement) leaves the
    // init parameters in place and an empty scored frame — a sum over
    // zero rows is NULL, which must never reach getLong
    if (n > 0) for (_ <- 1 to FsIters) {
      val aggCols =
        sum(wCol).as("sw") +:
          FsFields.map(g => sum(wCol * col(g)).as(s"swg_$g")) ++:
          FsFields.map(g => sum((lit(1000L) - wCol) * col(g)).as(s"scg_$g"))
      val r = pairs.agg(aggCols.head, aggCols.tail: _*).collect()(0)
      val sw = r.getLong(0)
      p = clamp(sw / n)
      m = FsFields.indices.map(j => clamp(1000L * r.getLong(1 + j) / math.max(sw, 1L))).toArray
      u = FsFields.indices.map(j =>
        clamp(1000L * r.getLong(1 + FsFields.size + j) / math.max(1000L * n - sw, 1L))).toArray
    }
    pairs
      .withColumn("w_milli", wCol)
      .withColumn("is_match", col("w_milli") >= 500L)
      .orderBy(col("probe_id"), col("p_partkey"))
  }

  /** Oracle: the identical EM loop unrolled as materialized CTEs (the
    * trained-classifier pattern) — pairs once, then per round one
    * posterior CTE from the previous round's scalar parameter row and
    * one aggregate CTE producing the next parameter row. */
  val fsEmSql: String = {
    def wSql(paramsAlias: String): String = {
      val t = FsFields.zipWithIndex.map { case (g, j) =>
        s"(CASE WHEN $g = 1 THEN $paramsAlias.m${j + 1} ELSE 1000 - $paramsAlias.m${j + 1} END)"
      }.mkString(" * ")
      val sTerm = FsFields.zipWithIndex.map { case (g, j) =>
        s"(CASE WHEN $g = 1 THEN $paramsAlias.u${j + 1} ELSE 1000 - $paramsAlias.u${j + 1} END)"
      }.mkString(" * ")
      s"(($paramsAlias.p * $t) * 1000) // ($paramsAlias.p * $t + (1000 - $paramsAlias.p) * $sTerm)"
    }
    // every parameter is CAST back to BIGINT: DuckDB sums BIGINT into
    // HUGEINT, which would otherwise propagate int128 into the next
    // round's products and land in pandas as float64 (dtype drift)
    def clampSql(v: String): String = s"CAST(greatest(least($v, 999), 1) AS BIGINT)"
    val iters = (1 to FsIters).map { r =>
      val prev = s"p${r - 1}"
      val mCols = FsFields.zipWithIndex.map { case (g, j) =>
        s"${clampSql(s"1000 * sum(w * $g) // greatest(sum(w), 1)")} AS m${j + 1}"
      }.mkString(",\n    ")
      val uCols = FsFields.zipWithIndex.map { case (g, j) =>
        s"${clampSql(s"1000 * sum((1000 - w) * $g) // greatest(sum(1000 - w), 1)")} AS u${j + 1}"
      }.mkString(",\n    ")
      s"""e$r AS MATERIALIZED (
         |  SELECT pairs.*, ${wSql(prev)} AS w FROM pairs, $prev),
         |p$r AS MATERIALIZED (
         |  SELECT ${clampSql("sum(w) // (SELECT count(*) FROM pairs)")} AS p,
         |    $mCols,
         |    $uCols
         |  FROM e$r)""".stripMargin
    }.mkString(",\n")
    // BIGINT init literals: int32 products would overflow at 999^5
    val initM = FsFields.indices
      .map(j => s"CAST($FsInitM AS BIGINT) AS m${j + 1}").mkString(", ")
    val initU = FsFields.indices
      .map(j => s"CAST($FsInitU AS BIGINT) AS u${j + 1}").mkString(", ")
    s"""WITH master AS (
       |  SELECT p_partkey, lower(p_name) AS name, p_brand, p_type, p_size FROM part),
       |probes AS (
       |  SELECT p_partkey + 1000000 AS probe_id,
       |    array_to_string(list_slice(t, 1, len(t) - 1), ' ') || ' ' ||
       |      substring(t[-1], 1, 1) || 'q' || substring(t[-1], 3) AS probe_name,
       |    p_brand AS probe_brand, p_type AS probe_type, p_size AS probe_size
       |  FROM (SELECT p_partkey, p_brand, p_type, p_size, string_split(name, ' ') AS t
       |        FROM master)
       |  WHERE p_partkey % 10 = 0),
       |pb0 AS (
       |  SELECT probes.*,
       |    string_split(probe_name, ' ')[1] || '|' ||
       |      substring(string_split(probe_name, ' ')[-1], 1, 1) AS b0
       |  FROM probes),
       |mb0 AS (
       |  SELECT master.*,
       |    string_split(name, ' ')[1] || '|' ||
       |      substring(string_split(name, ' ')[-1], 1, 1) AS b0
       |  FROM master),
       |ov AS (SELECT b0 FROM mb0 GROUP BY 1 HAVING count(*) > $MaxBlock),
       |mb AS (
       |  SELECT p_partkey, name, p_brand, p_type, p_size,
       |    CASE WHEN ov.b0 IS NOT NULL THEN mb0.b0 || '#' || p_brand
       |         ELSE mb0.b0 END AS block
       |  FROM mb0 LEFT JOIN ov ON mb0.b0 = ov.b0),
       |pbr AS (
       |  SELECT probe_id, probe_name, probe_brand, probe_type, probe_size,
       |    CASE WHEN ov.b0 IS NOT NULL THEN pb0.b0 || '#' || probe_brand
       |         ELSE pb0.b0 END AS block
       |  FROM pb0 LEFT JOIN ov ON pb0.b0 = ov.b0),
       |ok AS (SELECT block FROM mb GROUP BY 1 HAVING count(*) <= $MaxBlock),
       |pairs AS MATERIALIZED (
       |  SELECT probe_id, p_partkey,
       |    CAST(CASE WHEN levenshtein(probe_name, name) <= $MaxEditDist THEN 1 ELSE 0 END AS BIGINT) AS g1,
       |    CAST(CASE WHEN probe_brand = p_brand THEN 1 ELSE 0 END AS BIGINT) AS g2,
       |    CAST(CASE WHEN probe_type = p_type THEN 1 ELSE 0 END AS BIGINT) AS g3,
       |    CAST(CASE WHEN probe_size = p_size THEN 1 ELSE 0 END AS BIGINT) AS g4
       |  FROM pbr JOIN mb USING (block) JOIN ok USING (block)),
       |p0 AS (SELECT CAST($FsInitP AS BIGINT) AS p, $initM, $initU),
       |$iters
       |SELECT probe_id, p_partkey, g1, g2, g3, g4,
       |  CAST(${wSql(s"p$FsIters")} AS BIGINT) AS w_milli,
       |  ${wSql(s"p$FsIters")} >= 500 AS is_match
       |FROM pairs, p$FsIters
       |ORDER BY probe_id, p_partkey""".stripMargin
  }

  // ------------------------------------------------------------------
  // Golden-record survivorship — the step AFTER matching in an MDM /
  // entity-resolution pipeline: each matched cluster (master + the
  // dirty re-entries linked to it) elects ONE canonical record by a
  // deterministic survivorship rule (most-frequent value, ties broken
  // lexicographically — the standard "majority then stable" election),
  // with per-entity audit stats (member count, distinct variants,
  // total edit distance absorbed). The plan is the blocked linkage
  // plus two entity-keyed aggregates and one bounded rank window per
  // entity — entity_id is master-key-grade cardinality, so everything
  // after matching partitions as well as the match itself.
  def goldenRecord(s: SparkSession, dir: String): DataFrame = {
    // the match table feeds THREE subtrees (two member arms + stats);
    // truncation materializes the (probe-count-sized) frame once so the
    // whole blocked-linkage dag does not re-execute per consumer
    val matches = Lineage.truncate(fuzzyMatch(s, dir))
    val members = matches
      .select(col("matched_part").as("entity_id"),
        col("probe_name").as("name"), col("dist"))
      .unionByName(matches
        .select(col("matched_part").as("entity_id"),
          col("matched_name").as("name"), lit(0L).as("dist"))
        .distinct())
    // survivorship: consensus-closest first (min edit distance to the
    // cluster's match spine — the master sits at 0), then frequency,
    // then a stable lexicographic tiebreak
    val votes = members.groupBy(col("entity_id"), col("name"))
      .agg(min(col("dist")).as("d"), count(lit(1)).as("v"))
    val wElect = Window.partitionBy(col("entity_id"))
      .orderBy(col("d"), col("v").desc, col("name"))
    val canon = votes
      .withColumn("_rk", row_number().over(wElect))
      .filter(col("_rk") === 1)
      .select(col("entity_id"), col("name").as("canonical_name"))
    val stats = members.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("name")).as("n_name_variants"),
        sum(col("dist")).as("total_dist"))
    canon.join(stats, Seq("entity_id"))
      .orderBy(col("entity_id"))
  }

  val goldenRecordSql: String =
    s"""WITH $candCtesSql,
       |best AS (
       |  SELECT probe_id, probe_name, p_partkey, name AS matched_name, dist
       |  FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY dist, p_partkey) = 1),
       |members AS (
       |  SELECT p_partkey AS entity_id, probe_name AS name, dist FROM best
       |  UNION ALL
       |  SELECT DISTINCT p_partkey AS entity_id, matched_name AS name,
       |    CAST(0 AS BIGINT) AS dist FROM best),
       |votes AS (SELECT entity_id, name, min(dist) AS d, count(*) AS v
       |          FROM members GROUP BY 1, 2),
       |canon AS (
       |  SELECT entity_id, name AS canonical_name FROM votes
       |  QUALIFY row_number() OVER (PARTITION BY entity_id ORDER BY d, v DESC, name) = 1),
       |stats AS (
       |  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
       |    CAST(count(DISTINCT name) AS BIGINT) AS n_name_variants,
       |    CAST(sum(dist) AS BIGINT) AS total_dist
       |  FROM members GROUP BY 1)
       |SELECT entity_id, canonical_name, n_records, n_name_variants, total_dist
       |FROM canon JOIN stats USING (entity_id)
       |ORDER BY entity_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "match_fuzzy_blocked" -> (fuzzyMatch _),
    "match_blocking_audit" -> (blockingAudit _),
    "match_fs_em" -> (fsEm _),
    "match_golden_record" -> (goldenRecord _)
  )

  val oracle: Map[String, String] = Map(
    "match_fuzzy_blocked" -> fuzzyMatchSql,
    "match_blocking_audit" -> blockingAuditSql,
    "match_fs_em" -> fsEmSql,
    "match_golden_record" -> goldenRecordSql
  )
}
