package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over the embeddings table — the whitening /
  * dimensionality-reduction step a training-data pipeline runs before
  * semantic dedup or coreset selection ("which axes of the embedding
  * space actually carry variance?").
  *
  * The 100 TB shape is the textbook one: the ONLY corpus-scale work is a
  * single map-side-combined pass computing the sufficient statistics
  * (count, per-dimension sums, upper-triangular second-moment matrix) —
  * a mergeable [[Aggregator]], so executors combine partials locally and
  * one D(D+3)/2-number row reaches the driver. Everything eigen happens
  * on the driver over a DxD table (D=64: 2 080 longs), and scoring is
  * one more narrow map with the fitted components embedded as literals.
  * No shuffle ever carries a vector; the corpus is read exactly twice
  * (fit pass, scoring pass).
  *
  * Exactness contract (the EM/GD idiom): embeddings are quantized to
  * integer 1/1024ths, the covariance is the exact integer
  * `n·M_ij − S_i·S_j` (no mean subtraction, so no division), and the
  * power iteration runs in integer arithmetic with sign-safe truncating
  * division, renormalizing each round to max|v_i| = 1024. The DuckDB
  * oracle replays fit AND scoring bit-for-bit as unrolled CTEs; all
  * intermediates stay under int128 (documented per step), and every
  * division is of positive magnitudes so DuckDB's flooring `//` equals
  * the driver's truncating BigInt `/`.
  *
  * The second component is deflation-free: each round of its power
  * iteration renormalizes, then orthogonalizes against the finished
  * first component with the same integer-division projection — the
  * classical orthogonal-iteration step, exactly replayable.
  */
object PcaOps {

  /** Fixed-point scale: embedding values (unit-ish floats) become
    * integer 1/1024ths; fitted components are renormalized to the same
    * scale each round, so all magnitudes below are auditable. */
  val Quantum = 1024L

  /** Power-iteration rounds per component. With renormalization to
    * 1024 each round, the iterate gains ~1 digit of alignment per round
    * on any spectral gap the fixture plausibly has; 12 is far past
    * fixed-point resolution. */
  val Iters = 12

  val Dim = 64

  /** Mergeable sufficient statistics: n, S_i = Σ q_i, and the packed
    * upper triangle M_ij = Σ q_i·q_j (i ≤ j). Magnitudes: |q| ≤ ~1100
    * for embeddings in [-1, 1]; M entries grow as n·q² ≈ n·1.2e6 —
    * longs overflow past n ≈ 7.6e12 rows, far beyond any single fit. */
  case class GramBuf(var n: Long, s: Array[Long], m: Array[Long])

  class GramAggregator extends Aggregator[Seq[Long], GramBuf, GramBuf] {
    private val tri = Dim * (Dim + 1) / 2
    override def zero: GramBuf = GramBuf(0L, new Array[Long](Dim), new Array[Long](tri))
    override def reduce(b: GramBuf, q: Seq[Long]): GramBuf = {
      val a = q.toArray
      var i = 0
      var k = 0
      while (i < Dim) {
        b.s(i) += a(i)
        var j = i
        while (j < Dim) { b.m(k) += a(i) * a(j); k += 1; j += 1 }
        i += 1
      }
      b.n += 1
      b
    }
    override def merge(x: GramBuf, y: GramBuf): GramBuf = {
      var i = 0
      while (i < Dim) { x.s(i) += y.s(i); i += 1 }
      var k = 0
      while (k < tri) { x.m(k) += y.m(k); k += 1 }
      x.n += y.n
      x
    }
    override def finish(b: GramBuf): GramBuf = b
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** Sign-safe integer division: truncate-toward-zero semantics made
    * explicit by dividing positive magnitudes (the cross-engine rule —
    * Spark/BigInt truncate, DuckDB floors; they agree on positives). */
  private def idiv(a: BigInt, b: BigInt): BigInt =
    (a.abs / b) * a.signum

  /** Integer power iteration against the exact scaled covariance
    * `C_ij = n·M_ij − S_i·S_j`, optionally re-orthogonalized against a
    * fixed prior component each round. Returns max|v_i| = 1024. */
  private def powerIterate(c: Array[Array[BigInt]], v0: Array[BigInt],
      against: Option[Array[BigInt]]): Array[BigInt] = {
    var v = v0
    for (_ <- 1 to Iters) {
      val u = Array.tabulate(Dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      val m = u.map(_.abs).max.max(BigInt(1))
      var w = u.map(x => idiv(x * Quantum, m))
      against.foreach { p =>
        val t = (0 until Dim).map(i => w(i) * p(i)).sum
        val d = p.map(x => x * x).sum.max(BigInt(1))
        w = Array.tabulate(Dim)(i => w(i) - idiv(t * p(i), d))
      }
      v = w
    }
    // canonical sign: first nonzero component positive
    val sgn = v.find(_ != 0).map(_.signum).getOrElse(1)
    if (sgn < 0) v.map(-_) else v
  }

  /** Quantized-embedding column: integer 1/1024ths, round-half-away
    * (SQL `round` semantics in both engines). */
  private def quantized: org.apache.spark.sql.Column =
    expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Quantum) AS BIGINT))")

  /** Fitted top-2 components (1024-scale integers) + the sufficient
    * statistics they came from — exposed for spec assertions. */
  case class PcaModel(n: Long, s: Array[Long], v1: Array[BigInt], v2: Array[BigInt])

  def fit(s: SparkSession, dir: String): PcaModel = {
    import s.implicits._
    val g: GramBuf = s.read.parquet(s"$dir/embeddings.parquet")
      .select(quantized.as("q")).as[Seq[Long]]
      .select(new GramAggregator().toColumn)
      .head()
    val c = Array.tabulate(Dim, Dim) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      val k = lo * Dim - lo * (lo - 1) / 2 + (hi - lo)
      BigInt(g.n) * BigInt(g.m(k)) - BigInt(g.s(i)) * BigInt(g.s(j))
    }
    val v1 = powerIterate(c, Array.fill(Dim)(BigInt(Quantum)), None)
    // start orthogonal-ish to the all-ones direction so the second
    // iterate has generic overlap with the runner-up eigenvector
    val v2 = powerIterate(c,
      Array.tabulate(Dim)(i => BigInt(if (i % 2 == 0) Quantum else -Quantum)), Some(v1))
    PcaModel(g.n, g.s, v1, v2)
  }

  /** Registered query: per-vector exact integer projections onto the two
    * fitted components, centered without division — `n·(q·v) − (S·v)` is
    * the mean-centered dot product scaled by n·Quantum². */
  def pcaProject(s: SparkSession, dir: String): DataFrame = {
    val mdl = fit(s, dir)
    def score(v: Array[BigInt], name: String) = {
      val lits = v.map(_.toLong).mkString(",")
      val sv = (0 until Dim).map(i => BigInt(mdl.s(i)) * v(i)).sum.toLong
      expr(s"${mdl.n}L * aggregate(zip_with(q, array($lits), (a, b) -> a * b), " +
        s"0L, (acc, x) -> acc + x) - ${sv}L").as(name)
    }
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("label"), quantized.as("q"))
      .select(col("vec_id"), col("label"),
        score(mdl.v1, "pc1"), score(mdl.v2, "pc2"))
      .orderBy(col("vec_id"))
  }

  /** Oracle: the identical fit + scoring unrolled as CTEs. DuckDB sums
    * land in HUGEINT (int128), which bounds every product here:
    * |C_ij| ≤ n²·q² ≈ 1e13 at sf0.1, C·v ≤ 64·1e13·1024 ≈ 7e17,
    * projection t·p_i ≤ (64·1024²)·1024 ≈ 7e10. Each round's iterate is
    * cast back to BIGINT so types stay fixed across rounds. */
  val pcaProjectSql: String = {
    def idivSql(a: String, b: String): String =
      s"(CASE WHEN ($a) >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"
    def rounds(tag: String, prev0: String, orth: Boolean): String =
      (1 to Iters).map { r =>
        val prev = if (r == 1) prev0 else s"$tag${r - 1}"
        val renormed =
          s"""u$tag$r AS MATERIALIZED (
             |  SELECT c.i AS i, sum(c.c * v.v) AS u FROM c JOIN $prev v ON v.i = c.j
             |  GROUP BY 1),
             |m$tag$r AS (SELECT greatest(max(abs(u)), 1) AS m FROM u$tag$r),
             |w$tag$r AS (
             |  SELECT i, CAST(${idivSql("u * 1024", "(SELECT m FROM m" + tag + r + ")")} AS BIGINT) AS v
             |  FROM u$tag$r)""".stripMargin
        if (!orth) renormed.replace(s"w$tag$r AS", s"$tag$r AS")
        else
          renormed + s""",
             |t$tag$r AS (SELECT sum(w.v * p.v) AS t FROM w$tag$r w JOIN v1c p ON p.i = w.i),
             |$tag$r AS (
             |  SELECT w.i,
             |    CAST(w.v - ${idivSql("(SELECT t FROM t" + tag + r + ") * p.v",
                    "(SELECT d FROM d1)")} AS BIGINT) AS v
             |  FROM w$tag$r w JOIN v1c p ON p.i = w.i)""".stripMargin
      }.mkString(",\n")
    def canon(tag: String, last: String): String =
      s"""sg$tag AS (
         |  SELECT CASE WHEN (SELECT v FROM $last WHERE v <> 0 ORDER BY i LIMIT 1) < 0
         |    THEN -1 ELSE 1 END AS s),
         |$tag AS (SELECT i, CAST(v * (SELECT s FROM sg$tag) AS BIGINT) AS v FROM $last)""".stripMargin
    s"""WITH qe AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * $Quantum) AS BIGINT)) AS q
       |  FROM embeddings),
       |nn AS (SELECT count(*) AS n FROM qe),
       |el AS MATERIALIZED (
       |  SELECT vec_id, CAST(j AS BIGINT) AS i, q[CAST(j + 1 AS INTEGER)] AS val
       |  FROM qe, range($Dim) r(j)),
       |sv AS MATERIALIZED (SELECT i, CAST(sum(val) AS BIGINT) AS s FROM el GROUP BY 1),
       |mm AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, CAST(sum(a.val * b.val) AS BIGINT) AS m
       |  FROM el a JOIN el b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |c AS MATERIALIZED (
       |  SELECT mm.i, mm.j, (SELECT n FROM nn) * mm.m - sa.s * sb.s AS c
       |  FROM mm JOIN sv sa ON sa.i = mm.i JOIN sv sb ON sb.i = mm.j),
       |a0 AS (SELECT CAST(j AS BIGINT) AS i, CAST($Quantum AS BIGINT) AS v FROM range($Dim) r(j)),
       |${rounds("a", "a0", orth = false)},
       |${canon("v1c", s"a$Iters")},
       |d1 AS (SELECT sum(v * v) AS d FROM v1c),
       |b0 AS (SELECT CAST(j AS BIGINT) AS i,
       |  CAST(CASE WHEN j % 2 = 0 THEN $Quantum ELSE -$Quantum END AS BIGINT) AS v
       |  FROM range($Dim) r(j)),
       |${rounds("b", "b0", orth = true)},
       |${canon("v2c", s"b$Iters")},
       |s1 AS (SELECT sum(sv.s * v.v) AS x FROM sv JOIN v1c v ON v.i = sv.i),
       |s2 AS (SELECT sum(sv.s * v.v) AS x FROM sv JOIN v2c v ON v.i = sv.i),
       |dots AS (
       |  SELECT el.vec_id,
       |    sum(el.val * a.v) AS d1, sum(el.val * b.v) AS d2
       |  FROM el JOIN v1c a ON a.i = el.i JOIN v2c b ON b.i = el.i
       |  GROUP BY 1)
       |SELECT qe.vec_id, qe.label,
       |  CAST((SELECT n FROM nn) * dots.d1 - (SELECT x FROM s1) AS BIGINT) AS pc1,
       |  CAST((SELECT n FROM nn) * dots.d2 - (SELECT x FROM s2) AS BIGINT) AS pc2
       |FROM qe JOIN dots ON dots.vec_id = qe.vec_id
       |ORDER BY qe.vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_pca_project" -> (pcaProject _)
  )

  val oracle: Map[String, String] = Map(
    "emb_pca_project" -> pcaProjectSql
  )
}
