package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ------------------------------------------------------------------
  // KMV distinct sketch over orders: distinct customers per order
  // priority AND the grand total, in ONE rollup pass. The per-group
  // sketch is the k smallest distinct customer hashes ([[graft
  // .functions.KMinHashes]], k-long mergeable buffer); the estimator
  // (k-1)·H div h_(k) is exact integer arithmetic, so the oracle
  // recomputes sketch + estimate cell-exactly via rank-k SQL. The
  // exact distinct count rides along to surface the sketch error the
  // spec bounds (±1/sqrt(k-1) std). Groups with fewer than k distinct
  // hashes report their exact distinct-hash count (the sketch IS the
  // value set there) and a null h_(k).
  val KmvK = 64
  val KmvMod = 1000000007L

  /** KMV is a RANK statistic: it needs hashes ~uniform on [0, mod).
    * The polynomial fold alone is fine for equality-keyed uses (LSH
    * buckets, dedup joins) but concentrates short keys near 0, which
    * wrecks the k-th-minimum estimator. This two-round quadratic
    * permutation-ish map mod p scatters any input range across the
    * full space with pure BIGINT arithmetic (every intermediate
    * < 2.2e18, so no overflow in either engine), and the SAME text is
    * evaluated by Spark's `expr` and the DuckDB oracle — one
    * definition, two engines, identical integers. */
  def kmvMixSql(x: String): String = {
    def round(v: String, a: Long, b: Long, c: Long): String =
      s"((($v) * ($v)) % $KmvMod * $a + ($v) * $b + $c) % $KmvMod"
    val r1 = round(x, 776531401L, 15485863L, 32452843L)
    round(s"($r1)", 413158511L, 452930477L, 715827883L)
  }

  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val hashed = s.read.parquet(s"$dir/orders.parquet").select(
      col("o_orderpriority"),
      graft.functions.PolyHash
        .polyHash(col("o_custkey").cast("string"), 31, KmvMod).as("ph"),
      col("o_custkey"))
      .withColumn("hv", expr(kmvMixSql("ph")))
    hashed
      .rollup(col("o_orderpriority"))
      .agg(
        graft.functions.KMinHashes.kMinHashes(col("hv"), KmvK).as("kmin"),
        countDistinct(col("o_custkey")).as("exact_distinct"))
      .select(
        coalesce(col("o_orderpriority"), lit("*ALL*")).as("grp"),
        when(size(col("kmin")) < KmvK, size(col("kmin")).cast("long"))
          .otherwise(expr(s"${(KmvK - 1) * KmvMod}L div element_at(kmin, $KmvK)"))
          .as("est_distinct"),
        col("exact_distinct"),
        when(size(col("kmin")) >= KmvK, expr(s"element_at(kmin, $KmvK)"))
          .cast("long").as("kth_hash"))
      .orderBy(col("grp"))
  }

  val kmvDistinctSql: String = {
    val est = s"CASE WHEN n < $KmvK THEN n ELSE ${(KmvK - 1) * KmvMod} // kth END"
    val kth = s"CASE WHEN n < $KmvK THEN NULL ELSE kth END"
    s"""WITH hp AS (
       |  SELECT o_orderpriority AS grp, o_custkey,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(o_custkey AS VARCHAR), ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $KmvMod) AS ph
       |  FROM orders),
       |h AS (SELECT grp, o_custkey, ${kmvMixSql("ph")} AS hv FROM hp),
       |dh AS (SELECT DISTINCT grp, hv FROM h),
       |rk AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM dh),
       |pg AS (SELECT grp, max(hv) AS kth, count(*) AS n FROM rk WHERE rn <= $KmvK GROUP BY grp),
       |ex AS (SELECT grp, count(DISTINCT o_custkey) AS exact FROM h GROUP BY grp),
       |rka AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
       |        FROM (SELECT DISTINCT hv FROM h)),
       |pga AS (SELECT max(hv) AS kth, count(*) AS n FROM rka WHERE rn <= $KmvK),
       |exa AS (SELECT count(DISTINCT o_custkey) AS exact FROM h)
       |SELECT grp, CAST($est AS BIGINT) AS est_distinct,
       |  CAST(exact AS BIGINT) AS exact_distinct, CAST($kth AS BIGINT) AS kth_hash
       |FROM pg JOIN ex USING (grp)
       |UNION ALL
       |SELECT '*ALL*' AS grp, CAST($est AS BIGINT) AS est_distinct,
       |  CAST(exact AS BIGINT) AS exact_distinct, CAST($kth AS BIGINT) AS kth_hash
       |FROM pga, exa
       |ORDER BY grp""".stripMargin
  }

  // ------------------------------------------------------------------
  // KMV set-operation estimation (Beyer et al., SIGMOD'07 §4): the
  // distinct-key overlap between two tables' join columns, estimated
  // from their k-min sketches alone — what a distributed planner uses
  // to size runtime filters and pick join sides WITHOUT scanning
  // either table twice. Combined sketch K_∪ = k smallest of K_A ∪ K_B;
  // ρ = |{h ∈ K_∪ : h ∈ K_A ∧ h ∈ K_B}| / k estimates the Jaccard, and
  // est_∩ = ρ · est_∪. When the union has fewer than k distinct hashes
  // the sketch IS the union and every estimate collapses to exact.
  // All integer arithmetic (the estimator divisions are DIV), so the
  // oracle recomputes cell-exactly. Exact counts ride along to surface
  // the error. Arms: the 1995 vs 1996 order-customer cohorts — a real
  // partial overlap on the fixture (Jaccard ≈ 0.64 at sf0.01), the
  // year-over-year repeat-audience question.
  //
  // Shape for 100 TB: each sketch is ONE map-side-combined aggregate
  // (k-long buffer); the fusion is a 1-row × 1-row broadcast cross.
  // The exact arms (for the error report) are the only corpus-scale
  // joins and would be dropped in production use.
  def kmvJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    def cohort(year: Int): DataFrame =
      s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
        .select(
          col("o_custkey").as("k"),
          graft.functions.PolyHash
            .polyHash(col("o_custkey").cast("string"), 31, KmvMod).as("ph"))
        .withColumn("hv", expr(kmvMixSql("ph")))
    val ca = cohort(1995)
    val ob = cohort(1996)
    val a = ca.agg(
      graft.functions.KMinHashes.kMinHashes(col("hv"), KmvK).as("ka"),
      countDistinct(col("k")).as("exact_a"))
    val b = ob.agg(
      graft.functions.KMinHashes.kMinHashes(col("hv"), KmvK).as("kb"),
      countDistinct(col("k")).as("exact_b"))
    val inter = ca.select(col("k")).distinct()
      .join(ob.select(col("k")).distinct(), Seq("k"), "left_semi")
      .agg(count(lit(1)).as("exact_inter"))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(inter)) // 1-row frames
      .withColumn("ku", expr(s"slice(array_sort(array_union(ka, kb)), 1, $KmvK)"))
      .withColumn("n_u", size(col("ku")).cast("long"))
      .withColumn("rho_num", expr(
        "CAST(size(filter(ku, h -> array_contains(ka, h) AND array_contains(kb, h))) AS BIGINT)"))
      .withColumn("est_union", expr(
        s"CASE WHEN n_u < $KmvK THEN n_u " +
          s"ELSE ${(KmvK - 1).toLong * KmvMod}L div element_at(ku, $KmvK) END"))
      .withColumn("est_inter", expr(
        s"CASE WHEN n_u < $KmvK THEN rho_num ELSE rho_num * est_union div $KmvK END"))
      .withColumn("exact_union", col("exact_a") + col("exact_b") - col("exact_inter"))
      .select(
        col("est_union"), col("est_inter"),
        expr("1000 * rho_num DIV n_u").as("est_jaccard_milli"),
        col("exact_union"), col("exact_inter"),
        expr("1000 * exact_inter DIV exact_union").as("exact_jaccard_milli"))
  }

  val kmvJoinEstimateSql: String = {
    def fold(column: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(string_split(CAST($column AS VARCHAR), ''), " +
        s"c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $KmvMod)"
    s"""WITH ca AS (SELECT o_custkey FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
       |cb AS (SELECT o_custkey FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
       |ha AS (SELECT DISTINCT ${kmvMixSql(fold("o_custkey"))} AS hv FROM ca),
       |hb AS (SELECT DISTINCT ${kmvMixSql(fold("o_custkey"))} AS hv FROM cb),
       |ka AS (SELECT hv FROM ha ORDER BY hv LIMIT $KmvK),
       |kb AS (SELECT hv FROM hb ORDER BY hv LIMIT $KmvK),
       |ku AS (SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
       |       ORDER BY hv LIMIT $KmvK),
       |u AS (SELECT CAST(count(*) AS BIGINT) AS n_u, max(hv) AS kth,
       |        CAST((SELECT count(*) FROM ku
       |              WHERE hv IN (SELECT hv FROM ka)
       |                AND hv IN (SELECT hv FROM kb)) AS BIGINT) AS rho_num
       |      FROM ku),
       |ex AS (SELECT
       |        (SELECT count(DISTINCT o_custkey) FROM ca) AS exact_a,
       |        (SELECT count(DISTINCT o_custkey) FROM cb) AS exact_b,
       |        (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM ca
       |                               WHERE o_custkey IN (SELECT o_custkey FROM cb)))
       |          AS exact_inter),
       |est AS (SELECT
       |        CASE WHEN n_u < $KmvK THEN n_u
       |             ELSE ${(KmvK - 1).toLong * KmvMod} // kth END AS est_union,
       |        rho_num, n_u FROM u)
       |SELECT CAST(est_union AS BIGINT) AS est_union,
       |  CAST(CASE WHEN n_u < $KmvK THEN rho_num
       |       ELSE rho_num * est_union // $KmvK END AS BIGINT) AS est_inter,
       |  CAST(1000 * rho_num // n_u AS BIGINT) AS est_jaccard_milli,
       |  CAST(exact_a + exact_b - exact_inter AS BIGINT) AS exact_union,
       |  CAST(exact_inter AS BIGINT) AS exact_inter,
       |  CAST(1000 * exact_inter // (exact_a + exact_b - exact_inter) AS BIGINT)
       |    AS exact_jaccard_milli
       |FROM est, ex""".stripMargin
  }

  // ------------------------------------------------------------------
  // HyperLogLog distinct sketch (Flajolet et al.): the register-based
  // cardinality estimator, next to KMV as the second classic family.
  // hv = the same scattered hash as KMV; register j = hv mod 64, rank
  // ρ = leading zeros of the 24-bit payload + 1, register value M_j =
  // max ρ. The whole estimator is EXACT INTEGER: the harmonic sum
  // Σ 2^−M_j is kept scaled by 2^25 (every term a nonnegative shift,
  // since ρ ≤ 25), so E_milli = α_milli·m²·2^25 DIV S_scaled has no
  // float anywhere; the small-range branch is linear counting with the
  // house round(1000·ln(·)) quantization. Registers merge by MAX —
  // the sketch is one map-side-combined (group, register) aggregate,
  // 64 rows per group, mergeable across any partitioning; at 100 TB
  // that is the entire shuffle.
  val HllM = 64
  val HllWBits = 24 // payload bit width: (KmvMod-1)/64 < 2^24
  val HllAlphaMilli = 709L // α_64 quantized to milli

  /** JVM twin of [[kmvMixSql]] — byte-identical integer algebra (the
    * streaming HLL state fold needs the mix executor-side; the
    * cross-implementation parity spec pins the two against each
    * other through the full register pipeline). */
  def kmvMixLong(x: Long): Long = {
    def round(v: Long, a: Long, b: Long, c: Long): Long =
      ((v * v) % KmvMod * a + v * b + c) % KmvMod
    round(round(x, 776531401L, 15485863L, 32452843L),
      413158511L, 452930477L, 715827883L)
  }

  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    hllDistinctOf(s.read.parquet(s"$dir/orders.parquet"))

  /** The generalized register pipeline over any (grp, key) frame —
    * key is string-hashed exactly like the orders op. */
  def hllKeyed(df: DataFrame, grp: Column, key: Column): DataFrame = {
    val scale = HllWBits + 1
    val hashed = df.select(grp.as("grp"),
        graft.functions.PolyHash.polyHash(key.cast("string"), 31, KmvMod).as("ph"),
        key.as("_k"))
      .withColumn("hv", expr(kmvMixSql("ph")))
    val regs = hashed
      .withColumn("j", col("hv") % HllM)
      .withColumn("rho", expr(
        s"CASE WHEN hv DIV $HllM = 0 THEN $scale " +
          s"ELSE $scale - length(bin(hv DIV $HllM)) END"))
      .groupBy(col("grp"), col("j")).agg(max(col("rho")).as("m"))
    val numer = HllAlphaMilli * HllM * HllM * (1L << scale)
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - m)")).as("s_hit"))
      .withColumn("n_zero", lit(HllM.toLong) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("n_zero") * (1L << scale))
      .withColumn("est_raw_milli", expr(s"$numer DIV s_scaled"))
      .withColumn("est_milli", expr(
        s"CASE WHEN est_raw_milli <= ${2500L * HllM} AND n_zero > 0 " +
          s"THEN $HllM * CAST(round(1000 * ln($HllM / n_zero)) AS BIGINT) " +
          "ELSE est_raw_milli END"))
      .select(col("grp"), col("n_hit"), col("n_zero"), col("s_scaled"), col("est_milli"))
  }

  def hllDistinctOf(orders: DataFrame): DataFrame = {
    val scale = HllWBits + 1 // ρ ∈ [1, 25] -> exponent 25-ρ ∈ [0, 24]
    val hashed = orders.select(
        col("o_orderpriority").as("grp"),
        graft.functions.PolyHash
          .polyHash(col("o_custkey").cast("string"), 31, KmvMod).as("ph"),
        col("o_custkey"))
      .withColumn("hv", expr(kmvMixSql("ph")))
    val regs = hashed
      .withColumn("j", col("hv") % HllM)
      .withColumn("rho", expr(
        s"CASE WHEN hv DIV $HllM = 0 THEN $scale " +
          s"ELSE $scale - length(bin(hv DIV $HllM)) END"))
      .groupBy(col("grp"), col("j")).agg(max(col("rho")).as("m"))
    val exact = hashed.groupBy(col("grp"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    val numer = HllAlphaMilli * HllM * HllM * (1L << scale)
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - m)")).as("s_hit"))
      .withColumn("n_zero", lit(HllM.toLong) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("n_zero") * (1L << scale))
      .withColumn("est_raw_milli", expr(s"$numer DIV s_scaled"))
      // linear counting below 2.5·m (the standard small-range switch)
      .withColumn("est_milli", expr(
        s"CASE WHEN est_raw_milli <= ${2500L * HllM} AND n_zero > 0 " +
          s"THEN $HllM * CAST(round(1000 * ln($HllM / n_zero)) AS BIGINT) " +
          "ELSE est_raw_milli END"))
      .join(exact, Seq("grp"))
      .select(col("grp"), col("n_hit"), col("n_zero"), col("s_scaled"),
        col("est_milli"), col("exact_distinct"))
      .orderBy(col("grp"))
  }

  val hllDistinctSql: String = {
    val scale = HllWBits + 1
    val numer = HllAlphaMilli * HllM * HllM * (1L << scale)
    s"""WITH hp AS (
       |  SELECT o_orderpriority AS grp, o_custkey,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(o_custkey AS VARCHAR), ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $KmvMod) AS ph
       |  FROM orders),
       |h AS (SELECT grp, o_custkey, ${kmvMixSql("ph")} AS hv FROM hp),
       |r AS (
       |  SELECT grp, hv % $HllM AS j,
       |    max(CASE WHEN hv // $HllM = 0 THEN $scale
       |             ELSE $scale - length(bin(hv // $HllM)) END) AS m
       |  FROM h GROUP BY 1, 2),
       |agg AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_hit,
       |    CAST(sum(CAST(1 AS BIGINT) << (($scale - m))) AS BIGINT) AS s_hit
       |  FROM r GROUP BY 1),
       |ex AS (SELECT grp, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
       |       FROM h GROUP BY 1),
       |e AS (
       |  SELECT grp, n_hit, $HllM - n_hit AS n_zero,
       |    s_hit + ($HllM - n_hit) * CAST(${1L << scale} AS BIGINT) AS s_scaled
       |  FROM agg),
       |est AS (
       |  SELECT grp, n_hit, n_zero, s_scaled,
       |    $numer // s_scaled AS est_raw_milli
       |  FROM e)
       |SELECT grp, n_hit, n_zero, s_scaled,
       |  CAST(CASE WHEN est_raw_milli <= ${2500L * HllM} AND n_zero > 0
       |    THEN $HllM * CAST(round(1000 * ln($HllM / n_zero)) AS BIGINT)
       |    ELSE est_raw_milli END AS BIGINT) AS est_milli,
       |  exact_distinct
       |FROM est JOIN ex USING (grp)
       |ORDER BY grp""".stripMargin
  }

  // ------------------------------------------------------------------
  // Sliding-window distinct via mergeable HLL states — the window
  // algebra that makes "distinct users, trailing 7 days, per day"
  // affordable at 100 TB: exact sliding distinct needs every (day,
  // user) pair in every window it touches, but HLL registers merge by
  // MAX, so each day is sketched ONCE (64 registers) and every window
  // is a register-wise max over ≤ 7 state rows — the corpus is never
  // re-read per window. This is the uniqState + window-view pattern of
  // the reference's storage engine, and the window-merge step costs
  // days × 7 × 64 rows however large the corpus.
  //
  // The exact trailing-window distinct rides along as the diagnostic
  // arm, computed from the DISTINCT (day, user) pairs (daily-active
  // table, itself corpus-collapsed first) — dropped in production use.
  val SlideDays = 7

  def hllSliding(s: SparkSession, dir: String): DataFrame =
    hllSlidingAt(s, dir, SlideDays, withExact = true)

  /** Parameterized form: window width + optional exact arm (the scale
    * bench measures sketch-only vs exact-only cost as the window
    * widens — the sketch's window-merge work is 64 rows/day regardless
    * of W's user volume, the exact arm's grows with W × daily actives). */
  /** Shared construction for the sliding-HLL paths: the hashed event
    * stream, the day spine, and the exploded register grid joined back
    * to the spine (the window-merge exchange's actual input). */
  private def slidingParts(s: SparkSession, dir: String,
      slideDays: Int): (DataFrame, DataFrame, DataFrame) = {
    val scale = HllWBits + 1
    val ev = graft.queries.Relational.events(s, dir)
      .select(expr("_ms DIV 86400000").as("day"),
        graft.functions.PolyHash
          .polyHash(col("user_id").cast("string"), 31, KmvMod).as("ph"),
        col("user_id"))
      .withColumn("hv", expr(kmvMixSql("ph")))
    // per-day states feed the spine AND the window merge: truncation
    // materializes the (days × 64)-sized grid once so the corpus agg
    // does not re-execute per consumer
    val regs = graft.ops.Lineage.truncate(ev
      .withColumn("j", col("hv") % HllM)
      .withColumn("rho", expr(
        s"CASE WHEN hv DIV $HllM = 0 THEN $scale " +
          s"ELSE $scale - length(bin(hv DIV $HllM)) END"))
      .groupBy(col("day"), col("j")).agg(max(col("rho")).as("m")))
    // day spine: only days with events emit a window row
    val days = regs.select(col("day")).distinct()
    // each day's state contributes to the SlideDays windows it falls in
    // (equi-join shape: explode the bounded offset range, then restrict
    // to spine days — no range join, no per-window corpus scan)
    val exploded = regs
      .withColumn("tday", explode(expr(s"sequence(day, day + ${slideDays - 1})")))
      .join(broadcast(days.withColumnRenamed("day", "tday")), Seq("tday"))
    (ev, days, exploded)
  }

  /** MEASURED register-row volume the sketch path pushes through its
    * window-merge exchange at width `slideDays` — the scale bench's
    * cost table must compare like-for-like with its measured exact-arm
    * row count; the analytic nDays·64·W is only an upper bound (days
    * hit fewer than 64 registers when daily actives are sparse). */
  private[graft] def slidingRegRowCount(s: SparkSession, dir: String,
      slideDays: Int): Long =
    slidingParts(s, dir, slideDays)._3.count()

  private[graft] def hllSlidingAt(s: SparkSession, dir: String,
      slideDays: Int, withExact: Boolean): DataFrame = {
    val scale = HllWBits + 1
    val (ev, days, exploded) = slidingParts(s, dir, slideDays)
    val win = exploded
      .groupBy(col("tday"), col("j")).agg(max(col("m")).as("m"))
    val numer = HllAlphaMilli * HllM * HllM * (1L << scale)
    val est = win.groupBy(col("tday"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - m)")).as("s_hit"))
      .withColumn("n_zero", lit(HllM.toLong) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("n_zero") * (1L << scale))
      .withColumn("est_raw_milli", expr(s"$numer DIV s_scaled"))
      .withColumn("est_milli", expr(
        s"CASE WHEN est_raw_milli <= ${2500L * HllM} AND n_zero > 0 " +
          s"THEN $HllM * CAST(round(1000 * ln($HllM / n_zero)) AS BIGINT) " +
          "ELSE est_raw_milli END"))
    if (!withExact)
      return est.select(col("tday").as("day"), col("n_hit"), col("n_zero"),
        col("s_scaled"), col("est_milli")).orderBy(col("day"))
    // diagnostic arm: exact trailing distinct from the daily-active table
    val du = ev.select(col("day"), col("user_id")).distinct()
    val exact = du
      .withColumn("tday", explode(expr(s"sequence(day, day + ${slideDays - 1})")))
      .join(broadcast(days.withColumnRenamed("day", "tday")), Seq("tday"))
      .groupBy(col("tday"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"),
        countDistinct(col("day")).as("n_days"))
    est.join(exact, Seq("tday"))
      .select(col("tday").as("day"), col("n_days"), col("n_hit"), col("n_zero"),
        col("s_scaled"), col("est_milli"), col("exact_distinct"))
      .orderBy(col("day"))
  }

  val hllSlidingSql: String = {
    val scale = HllWBits + 1
    val numer = HllAlphaMilli * HllM * HllM * (1L << scale)
    s"""WITH hp AS (
       |  SELECT CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day, user_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(user_id AS VARCHAR), ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $KmvMod) AS ph
       |  FROM events),
       |h AS (SELECT day, user_id, ${kmvMixSql("ph")} AS hv FROM hp),
       |r AS (
       |  SELECT day, hv % $HllM AS j,
       |    max(CASE WHEN hv // $HllM = 0 THEN $scale
       |             ELSE $scale - length(bin(hv // $HllM)) END) AS m
       |  FROM h GROUP BY 1, 2),
       |days AS (SELECT DISTINCT day FROM r),
       |win AS (
       |  SELECT d.day AS day, r.j, max(r.m) AS m
       |  FROM days d JOIN r ON r.day BETWEEN d.day - ${SlideDays - 1} AND d.day
       |  GROUP BY 1, 2),
       |agg AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS n_hit,
       |    CAST(sum(CAST(1 AS BIGINT) << (($scale - m))) AS BIGINT) AS s_hit
       |  FROM win GROUP BY 1),
       |du AS (SELECT DISTINCT day, user_id FROM h),
       |ex AS (
       |  SELECT d.day AS day,
       |    CAST(count(DISTINCT du.user_id) AS BIGINT) AS exact_distinct,
       |    CAST(count(DISTINCT du.day) AS BIGINT) AS n_days
       |  FROM days d JOIN du ON du.day BETWEEN d.day - ${SlideDays - 1} AND d.day
       |  GROUP BY 1),
       |e AS (
       |  SELECT day, n_hit, $HllM - n_hit AS n_zero,
       |    s_hit + ($HllM - n_hit) * CAST(${1L << scale} AS BIGINT) AS s_scaled
       |  FROM agg),
       |est AS (
       |  SELECT day, n_hit, n_zero, s_scaled,
       |    $numer // s_scaled AS est_raw_milli
       |  FROM e)
       |SELECT day, n_days, n_hit, n_zero, s_scaled,
       |  CAST(CASE WHEN est_raw_milli <= ${2500L * HllM} AND n_zero > 0
       |    THEN $HllM * CAST(round(1000 * ln($HllM / n_zero)) AS BIGINT)
       |    ELSE est_raw_milli END AS BIGINT) AS est_milli,
       |  exact_distinct
       |FROM est JOIN ex USING (day)
       |ORDER BY day""".stripMargin
  }

  // ------------------------------------------------------------------
  // Mergeable quantile sketch via a log-spaced histogram — the fourth
  // classic sketch family (frequencies: CMS; cardinality: KMV/HLL;
  // quantiles: here), the engine-side analogue of ClickHouse's
  // quantile* functions. The state is (group, bucket, count) where
  // bucket = round(1000·ln(1+v)) DIV 100 — a CONSTANT-size grid
  // (≤ ~180 buckets per group for any 64-bit value domain, each bucket
  // spanning ~10.5% relative width) that merges by count addition
  // across shards/days, so a 100 TB percentile never sorts anything:
  // one map-side-combined aggregate builds the state, and any quantile
  // is a cumulative walk over the tiny grid. The guarantee is a BUCKET
  // (≤ e^0.1 − 1 ≈ 10.5% relative error at the edges); the exact
  // quantile rides along from the value histogram (the quantileExact
  // shape) so the oracle checks the containment invariant — the exact
  // value's ln-bucket IS the sketch's bucket — cell-exactly per run.
  val QWidthMilli = 100L
  val QuantilesMilli: Seq[Long] = Seq(500L, 900L, 990L)

  def quantileHist(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("lnm", expr("CAST(round(1000 * ln(1 + cents)) AS BIGINT)"))
      .withColumn("bucket", expr(s"lnm DIV $QWidthMilli"))
    val qArr = array(QuantilesMilli.map(lit(_)): _*)
    // the sketch state: one map-side-combined agg, grid-sized output
    val state = o.groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("bucket")) // grid-sized
    val wAll = Window.partitionBy(col("grp"))
    val cum = state
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val fromSketch = cum
      .withColumn("q_milli", explode(qArr))
      .filter(col("cum") >= expr(s"(n * q_milli + 999) DIV 1000"))
      .groupBy(col("grp"), col("q_milli")).agg(min(col("bucket")).as("bucket"))
    // exact arm (diagnostic): value-histogram exact quantile
    val vh = o.groupBy(col("grp"), col("cents")).agg(count(lit(1)).as("c"))
    val vCum = vh
      .withColumn("cum", sum(col("c")).over(Window.partitionBy(col("grp")).orderBy(col("cents"))))
      .withColumn("n", sum(col("c")).over(wAll))
    val exact = vCum
      .withColumn("q_milli", explode(qArr))
      .filter(col("cum") >= expr(s"(n * q_milli + 999) DIV 1000"))
      .groupBy(col("grp"), col("q_milli")).agg(min(col("cents")).as("exact_cents"))
    fromSketch.join(exact, Seq("grp", "q_milli"))
      .select(col("grp"), col("q_milli"), col("bucket"),
        (col("bucket") * QWidthMilli).as("edge_milli_ln"),
        col("exact_cents"),
        expr("CAST(round(1000 * ln(1 + exact_cents)) AS BIGINT)").as("exact_ln_milli"))
      .orderBy(col("grp"), col("q_milli"))
  }

  val quantileHistSql: String =
    s"""WITH o AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |b AS (
       |  SELECT grp, cents,
       |    CAST(round(1000 * ln(1 + cents)) AS BIGINT) // $QWidthMilli AS bucket
       |  FROM o),
       |state AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS cnt
       |          FROM b GROUP BY 1, 2),
       |cum AS (
       |  SELECT grp, bucket,
       |    sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
       |    sum(cnt) OVER (PARTITION BY grp) AS n
       |  FROM state),
       |qs AS (SELECT UNNEST([500, 900, 990]) AS q_milli),
       |sk AS (
       |  SELECT grp, q_milli, min(bucket) AS bucket
       |  FROM cum, qs WHERE cum >= (n * q_milli + 999) // 1000
       |  GROUP BY 1, 2),
       |vh AS (SELECT grp, cents, count(*) AS c FROM o GROUP BY 1, 2),
       |vcum AS (
       |  SELECT grp, cents,
       |    sum(c) OVER (PARTITION BY grp ORDER BY cents) AS cum,
       |    sum(c) OVER (PARTITION BY grp) AS n
       |  FROM vh),
       |ex AS (
       |  SELECT grp, q_milli, min(cents) AS exact_cents
       |  FROM vcum, qs WHERE cum >= (n * q_milli + 999) // 1000
       |  GROUP BY 1, 2)
       |SELECT sk.grp, CAST(sk.q_milli AS BIGINT) AS q_milli,
       |  CAST(sk.bucket AS BIGINT) AS bucket,
       |  CAST(sk.bucket * $QWidthMilli AS BIGINT) AS edge_milli_ln,
       |  CAST(ex.exact_cents AS BIGINT) AS exact_cents,
       |  CAST(round(1000 * ln(1 + ex.exact_cents)) AS BIGINT) AS exact_ln_milli
       |FROM sk JOIN ex ON sk.grp = ex.grp AND sk.q_milli = ex.q_milli
       |ORDER BY sk.grp, sk.q_milli""".stripMargin

  // ------------------------------------------------------------------
  // KMV sketch SET ALGEBRA — the reason production sketch libraries
  // exist (Apache DataSketches' theta use-case): once each cohort keeps
  // its bottom-k hash set, |A∪B| is estimable from the MERGED sketch
  // (union of sketches = bottom-k of the union of their hash sets — no
  // re-scan of either cohort) and |A∩B| by inclusion-exclusion, floored
  // at 0. Cohorts here are customer sets of overlapping order-priority
  // classes (2-HIGH sits in both, so the intersection is real). One
  // corpus pass fans each row into its memberships; everything after
  // the per-(set, hv) distinct is k-sized. Exact counts ride along per
  // set (the sketch-error audit), and every estimate is the exact
  // integer (k−1)·M / kth — deterministic cross-engine.
  val SetA = Seq("1-URGENT", "2-HIGH")
  val SetB = Seq("2-HIGH", "3-MEDIUM")

  def kmvSetOps(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Windows
    val mem = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("pri"), col("o_custkey"))
      .withColumn("ph", graft.functions.PolyHash
        .polyHash(col("o_custkey").cast("string"), 31, KmvMod))
      .withColumn("hv", expr(kmvMixSql("ph")))
      .select(explode(array(
        when(col("pri").isin(SetA.map(lit): _*), "A"),
        when(col("pri").isin(SetB.map(lit): _*), "B"))).as("st"),
        col("hv"), col("o_custkey"))
      .filter(col("st").isNotNull)
    val distinctHv = Lineage.truncate(
      mem.select(col("st"), col("hv"), col("o_custkey")).distinct())
    // per-set bottom-k sketches (rows, not arrays: the merge is a union)
    val wSet = org.apache.spark.sql.expressions.Window
      .partitionBy(col("st")).orderBy(col("hv"))
    val sketch = distinctHv.select(col("st"), col("hv")).distinct()
      .withColumn("rn", row_number().over(wSet))
      .filter(col("rn") <= KmvK)
    // union sketch = bottom-k of the two sketches' merged hash sets
    val wAll = Windows.boundedGlobal(col("hv"))
    val uSketch = sketch.select(col("hv")).distinct()
      .withColumn("rn", row_number().over(wAll))
      .filter(col("rn") <= KmvK)
      .select(lit("UNION").as("st"), col("hv"), col("rn"))
    def estOf(kth: Column, n: Column): Column =
      when(n < KmvK, n).otherwise(
        org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graft.ColumnBridge.expression(lit((KmvK - 1) * KmvMod)),
            org.apache.spark.sql.graft.ColumnBridge.expression(kth))))
    val perSet = sketch.unionByName(uSketch)
      .groupBy(col("st"))
      .agg(max(when(col("rn") === KmvK, col("hv"))).as("kth"),
        count(lit(1)).as("n"))
      .withColumn("est_distinct", estOf(col("kth"), col("n")))
    val exact = distinctHv.groupBy(col("st"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
      .unionByName(distinctHv.select(col("o_custkey")).distinct()
        .agg(count(lit(1)).as("exact_distinct"))
        .select(lit("UNION").as("st"), col("exact_distinct")))
    val abu = perSet.join(exact, Seq("st"))
      .select(col("st"), col("est_distinct"), col("exact_distinct"),
        when(col("n") >= KmvK, col("kth")).cast("long").as("kth_hash"))
    // intersection row: inclusion-exclusion over the three estimates,
    // floored at 0; exact = customers carrying BOTH memberships
    val ests = abu.groupBy()
      .agg(sum(when(col("st") === "A", col("est_distinct"))).as("ea"),
        sum(when(col("st") === "B", col("est_distinct"))).as("eb"),
        sum(when(col("st") === "UNION", col("est_distinct"))).as("eu"))
    val exactI = distinctHv.groupBy(col("o_custkey"))
      .agg(countDistinct(col("st")).as("nm"))
      .filter(col("nm") === 2).agg(count(lit(1)).as("exact_distinct"))
    val inter = ests.crossJoin(exactI) // two 1-row frames
      .select(lit("INTERSECT").as("st"),
        greatest(col("ea") + col("eb") - col("eu"), lit(0L)).as("est_distinct"),
        col("exact_distinct"), lit(null).cast("long").as("kth_hash"))
    abu.unionByName(inter).orderBy(col("st"))
  }

  val kmvSetOpsSql: String = {
    val inA = SetA.mkString("('", "','", "')")
    val inB = SetB.mkString("('", "','", "')")
    val est = s"CASE WHEN n < $KmvK THEN n ELSE ${(KmvK - 1) * KmvMod} // kth END"
    s"""WITH mem0 AS (
       |  SELECT CASE WHEN o_orderpriority IN $inA THEN 'A' END AS st,
       |         o_custkey FROM orders
       |  UNION ALL
       |  SELECT CASE WHEN o_orderpriority IN $inB THEN 'B' END AS st,
       |         o_custkey FROM orders),
       |mem1 AS (SELECT DISTINCT st, o_custkey FROM mem0 WHERE st IS NOT NULL),
       |hp AS (
       |  SELECT st, o_custkey,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(o_custkey AS VARCHAR), ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $KmvMod) AS ph
       |  FROM mem1),
       |mem AS (SELECT st, o_custkey, ${kmvMixSql("ph")} AS hv FROM hp),
       |sk AS (
       |  SELECT st, hv, row_number() OVER (PARTITION BY st ORDER BY hv) AS rn
       |  FROM (SELECT DISTINCT st, hv FROM mem)),
       |skk AS (SELECT st, hv, rn FROM sk WHERE rn <= $KmvK),
       |usk AS (
       |  SELECT 'UNION' AS st, hv,
       |    row_number() OVER (ORDER BY hv) AS rn
       |  FROM (SELECT DISTINCT hv FROM skk)),
       |allsk AS (SELECT * FROM skk UNION ALL SELECT * FROM usk WHERE rn <= $KmvK),
       |agg AS (
       |  SELECT st, max(CASE WHEN rn = $KmvK THEN hv END) AS kth,
       |    count(*) AS n
       |  FROM allsk GROUP BY 1),
       |ex AS (
       |  SELECT st, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
       |  FROM mem GROUP BY 1
       |  UNION ALL
       |  SELECT 'UNION', CAST(count(DISTINCT o_custkey) AS BIGINT) FROM mem),
       |abu AS (
       |  SELECT agg.st, CAST($est AS BIGINT) AS est_distinct, ex.exact_distinct,
       |    CAST(CASE WHEN n >= $KmvK THEN kth END AS BIGINT) AS kth_hash
       |  FROM agg JOIN ex ON ex.st = agg.st),
       |ests AS (
       |  SELECT sum(CASE WHEN st = 'A' THEN est_distinct END) AS ea,
       |    sum(CASE WHEN st = 'B' THEN est_distinct END) AS eb,
       |    sum(CASE WHEN st = 'UNION' THEN est_distinct END) AS eu
       |  FROM abu),
       |exi AS (
       |  SELECT CAST(count(*) AS BIGINT) AS exact_distinct
       |  FROM (SELECT o_custkey FROM mem GROUP BY 1 HAVING count(DISTINCT st) = 2)),
       |inter AS (
       |  SELECT 'INTERSECT' AS st,
       |    CAST(greatest(ea + eb - eu, 0) AS BIGINT) AS est_distinct,
       |    exi.exact_distinct, CAST(NULL AS BIGINT) AS kth_hash
       |  FROM ests CROSS JOIN exi)
       |SELECT st, CAST(est_distinct AS BIGINT) AS est_distinct,
       |  exact_distinct, kth_hash
       |FROM (SELECT * FROM abu UNION ALL SELECT * FROM inter)
       |ORDER BY st""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_setops" -> (kmvSetOps _),
    "sketch_quantile_hist" -> (quantileHist _),
    "sketch_hll_sliding" -> (hllSliding _),
    "sketch_hll_distinct" -> (hllDistinct _),
    "sketch_cms_heavy_hitters" -> (cmsHeavyHitters _),
    "sketch_kmv_distinct" -> (kmvDistinct _),
    "sketch_join_estimate" -> (kmvJoinEstimate _)
  )

  val oracle: Map[String, String] = Map(
    "sketch_kmv_setops" -> kmvSetOpsSql,
    "sketch_quantile_hist" -> quantileHistSql,
    "sketch_hll_sliding" -> hllSlidingSql,
    "sketch_hll_distinct" -> hllDistinctSql,
    "sketch_cms_heavy_hitters" -> cmsHeavyHittersSql,
    "sketch_kmv_distinct" -> kmvDistinctSql,
    "sketch_join_estimate" -> kmvJoinEstimateSql
  )
}
