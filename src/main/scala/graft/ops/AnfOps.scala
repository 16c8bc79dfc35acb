package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperANF — the approximate neighborhood function (Boldi, Rosa &
  * Vigna, WWW 2011; Palmer et al.'s ANF lineage): N(r) = Σ_v |B(v, r)|,
  * the number of node pairs within distance r, from which average
  * distance and effective diameter fall out. The EXACT computation is an
  * all-pairs BFS (quadratic state — the ball sets grow to |V| each);
  * HyperANF replaces each ball set with a tiny HLL register vector,
  * because set UNION is register-wise MAX — so one round is "each node
  * maxes its neighbors' registers", a single self-join + aggregate, and
  * R rounds cost R edge-scale exchanges with V×m total state. This is
  * THE graph-metrics algorithm that survives 100 TB: state per node is
  * [[AnfM]] longs regardless of ball size, rounds are bounded, and the
  * register merge is an associative map-side-combined aggregate (the
  * same mergeability argument as [[SketchOps.hllDistinctOf]]).
  *
  * Determinism: node hashes reuse the KMV mix (uniform on [0, KmvMod)),
  * registers are integers, the estimator is exact integer arithmetic
  * (harmonic sum scaled 2^[[AnfScale]], truncating DIV), and the
  * small-range linear-counting branch reads milli-ln values from a
  * PRECOMPUTED 15-entry table embedded identically in both engines — no
  * transcendental is evaluated at query time, so the whole register
  * evolution and every estimate replay bit-for-bit in the DuckDB oracle
  * (rounds unrolled as chained max-group CTEs).
  *
  * Registers travel as ONE array column per node (16 longs), merged by a
  * typed [[RegsMax]] Aggregator — the shuffle carries |E| arrays per
  * round, not |E|×m exploded rows; the oracle's exploded (n, j, m) form
  * is semantically identical (absent row = zero register).
  */
object AnfOps {

  /** Register count per node. m=16 keeps per-round shuffle width at 16
    * longs/edge; the (~26% / √m) estimator error is inherent to ANF and
    * irrelevant to correctness, which is register-replay equality. */
  val AnfM = 16
  /** Payload bit width: (KmvMod-1)/16 < 2^26. */
  val AnfWBits = 26
  val AnfScale: Int = AnfWBits + 1 // ρ ∈ [1, 27]
  /** α_16 quantized to milli (Flajolet et al. 2007: α_16 = 0.673). */
  val AnfAlphaMilli = 673L
  /** Ball radius bound — co-occurrence graphs are small-world; the
    * neighborhood function saturates within a few hops (same bound
    * family as [[GraphOps.Bfs.MaxRounds]], kept tighter because each
    * round is an edge-scale exchange). */
  val AnfRounds = 4

  private val Numer = AnfAlphaMilli * AnfM * AnfM * (1L << AnfScale)
  private val TwoScale = 1L << AnfScale
  private val LcSwitch = 2500L * AnfM

  /** round(1000·ln(m/z)) for z = 1..m-1, computed ONCE here and embedded
    * as the same CASE text in both engines. */
  private val lcMilli: IndexedSeq[Long] =
    (1 to AnfM - 1).map(z => Math.round(1000.0 * math.log(AnfM.toDouble / z)))

  /** Shared linear-counting CASE over the zero-register count. */
  private def lcCase(nz: String): String =
    s"CASE $nz " +
      (1 to AnfM - 1).map(z => s"WHEN $z THEN ${lcMilli(z - 1)}").mkString(" ") +
      " END"

  /** Buffer wrapper: Encoders.product needs a case class around the
    * primitive array (the [[VectorAgg.CentroidBuf]] idiom). */
  case class RegBuf(m: Array[Long])

  /** Element-wise max over register arrays — set union in HLL space.
    * Associative + commutative, so Spark map-side combines it. */
  class RegsMax(m: Int, field: String) extends Aggregator[Row, RegBuf, Seq[Long]] {
    override def zero: RegBuf = RegBuf(new Array[Long](m))
    override def reduce(b: RegBuf, r: Row): RegBuf = {
      val v = r.getAs[scala.collection.Seq[Long]](field)
      var i = 0
      while (i < m && i < v.length) {
        if (v(i) > b.m(i)) b.m(i) = v(i); i += 1
      }
      b
    }
    override def merge(x: RegBuf, y: RegBuf): RegBuf = {
      var i = 0
      while (i < m) { if (y.m(i) > x.m(i)) x.m(i) = y.m(i); i += 1 }
      x
    }
    override def finish(b: RegBuf): Seq[Long] = b.m.toSeq
    override def bufferEncoder: Encoder[RegBuf] = Encoders.product[RegBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def anf(s: SparkSession, dir: String): DataFrame =
    anfOf(s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  def anfOf(membership: DataFrame): DataFrame = {
    val und = Lineage.truncate(GraphOps.supportedEdges(membership))
    val edges = Lineage.truncate(
      und.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("src")))
    // round-0 registers: each node's own hash, as a 16-wide array with a
    // single hit at register j
    val init = edges.select(col("src").as("n")).distinct()
      .withColumn("ph", graft.functions.PolyHash
        .polyHash(col("n").cast("string"), 31, SketchOps.KmvMod))
      .withColumn("hv", expr(SketchOps.kmvMixSql("ph")))
      .withColumn("j", col("hv") % AnfM)
      .withColumn("rho", expr(
        s"CASE WHEN hv DIV $AnfM = 0 THEN $AnfScale " +
          s"ELSE $AnfScale - length(bin(hv DIV $AnfM)) END").cast("long"))
      .select(col("n"), expr(
        s"transform(sequence(0, ${AnfM - 1}), " +
          "i -> CASE WHEN i = j THEN rho ELSE CAST(0 AS BIGINT) END)").as("regs"))
    val maxAgg = new RegsMax(AnfM, "regs")
    var regs = Lineage.truncate(init)
    val perRadius = scala.collection.mutable.ArrayBuffer(estRow(regs, 0))
    for (r <- 1 to AnfRounds) {
      // one round = propagate registers along edges, union the node's
      // own, register-wise max per node (ball union in sketch space)
      val prop = edges.join(regs.withColumnRenamed("n", "src"), Seq("src"))
        .select(col("dst").as("n"), col("regs"))
        .unionByName(regs)
      regs = Lineage.truncate(
        prop.groupBy(col("n")).agg(maxAgg.toColumn.name("r").as("regs")))
      perRadius += estRow(regs, r)
    }
    perRadius.reduce(_ unionByName _).orderBy(col("radius"))
  }

  /** One output row from a register table: the summed per-node ball
    * estimate at this radius (exact integer HLL estimator). */
  private def estRow(regs: DataFrame, radius: Int): DataFrame =
    regs
      .select(
        expr(s"aggregate(regs, CAST(0 AS BIGINT), " +
          s"(acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), $AnfScale - CAST(x AS INT)))")
          .as("s_scaled"),
        expr("size(filter(regs, x -> x = 0))").cast("long").as("n_zero"))
      .withColumn("raw", expr(s"$Numer DIV s_scaled"))
      .withColumn("est_milli", expr(
        s"CASE WHEN raw <= $LcSwitch AND n_zero > 0 " +
          s"THEN $AnfM * (${lcCase("n_zero")}) ELSE raw END"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("est_milli")).cast("long").as("nf_est_milli"))
      .select(lit(radius.toLong).as("radius"), col("n_nodes"), col("nf_est_milli"))

  /** Oracle: identical registers in exploded (n, j, m) form — absent row
    * = zero register — with the rounds unrolled as chained max-group
    * CTEs and the same integer estimator + embedded ln table. */
  val anfSql: String = {
    val rounds = (1 to AnfRounds).map { r =>
      s"""reg$r AS MATERIALIZED (
         |  SELECT n, j, max(m) AS m FROM (
         |    SELECT e.dst AS n, r.j, r.m FROM edges e JOIN reg${r - 1} r ON r.n = e.src
         |    UNION ALL SELECT n, j, m FROM reg${r - 1})
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    def estSel(k: Int): String =
      s"""SELECT CAST($k AS BIGINT) AS radius, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(CASE WHEN raw <= $LcSwitch AND n_zero > 0
         |           THEN $AnfM * (${lcCase("n_zero")}) ELSE raw END) AS BIGINT)
         |    AS nf_est_milli
         |FROM (
         |  SELECT $AnfM - n_hit AS n_zero,
         |    $Numer // (s_hit + ($AnfM - n_hit) * CAST($TwoScale AS BIGINT)) AS raw
         |  FROM (
         |    SELECT n, CAST(count(*) AS BIGINT) AS n_hit,
         |      CAST(sum(CAST(1 AS BIGINT) << ($AnfScale - m)) AS BIGINT) AS s_hit
         |    FROM reg$k GROUP BY 1))""".stripMargin
    s"""WITH ${GraphOps.LiCappedCte},
       |und AS MATERIALIZED (
       |  SELECT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
       |  GROUP BY 1, 2 HAVING count(*) >= ${GraphOps.Cores.MinSupport}),
       |edges AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und),
       |h AS (
       |  SELECT n, ${SketchOps.kmvMixSql("ph")} AS hv FROM (
       |    SELECT n, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(n AS VARCHAR), ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % ${SketchOps.KmvMod}) AS ph
       |    FROM (SELECT DISTINCT src AS n FROM edges))),
       |reg0 AS MATERIALIZED (
       |  SELECT n, hv % $AnfM AS j,
       |    CAST(CASE WHEN hv // $AnfM = 0 THEN $AnfScale
       |              ELSE $AnfScale - length(bin(hv // $AnfM)) END AS BIGINT) AS m
       |  FROM h),
       |$rounds
       |SELECT radius, n_nodes, nf_est_milli FROM (
       |${(0 to AnfRounds).map(k => "(" + estSel(k) + ")").mkString("\nUNION ALL\n")}
       |)
       |ORDER BY radius""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_anf" -> (anf _)
  )

  val oracle: Map[String, String] = Map(
    "graph_anf" -> anfSql
  )
}
