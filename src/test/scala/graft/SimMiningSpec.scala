package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Planted-ground-truth specs for the round-14 similarity additions:
  * the oracle proves cross-engine agreement; these prove the OPERATORS
  * compute the thing they claim on inputs with known answers. */
class SimMiningSpec extends SparkSuite {

  /** Deterministic pseudo-random vector per (id, salt): two modular
    * multiply-mix rounds per component (an affine-in-d generator left
    * every vector correlated and the first margin test flaky). */
  private def vec(id: Long, salt: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      val P = 999999937L
      var x = (id * 131L + salt * 7919L + d) % P
      x = (x * 2654435761L + 97L) % P
      x = (x * 2654435761L + 17L) % P
      ((x % 2001L) - 1000L).toFloat / 1000f
    }

  test("bitext mining recovers planted parallel pairs as mutual matches") {
    import spark.implicits._
    val dim = 16
    // side A (label 0): 8 probes; side B (label 1): each planted partner
    // is its A twin plus tiny deterministic noise, plus 40 distractors
    val a = (0L until 8L).map(i => (i, vec(i, 7L, dim), 0L))
    val b = (0L until 8L).map { i =>
      val t = vec(i, 7L, dim).zipWithIndex.map { case (x, d) =>
        x + ((i + d) % 3L - 1L).toFloat / 1000f
      }
      (1000L + i, t, 1L)
    } ++ (0L until 40L).map(j => (2000L + j, vec(j, 999L, dim), 1L))
    val emb = (a ++ b).toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.bitextMiningOf(emb)
      .select(col("a_id"), col("b_id"), col("mutual"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got.size == 8)
    got.foreach { case (aId, bId, mutual) =>
      assert(bId == 1000L + aId, s"probe $aId must mine its planted twin, got $bId")
      assert(mutual, s"planted pair ($aId, $bId) must be a mutual match")
    }
  }

  test("isotropy audit: near-collinear corpus reads ~1, sign-balanced corpus reads ~0") {
    import spark.implicits._
    val dim = 16
    val base = vec(42L, 1L, dim)
    // all vectors = the same direction, tiny jitter -> mean pair cos ~ 1
    val collinear = (0L until 50L).map { i =>
      (i, base.zipWithIndex.map { case (x, d) =>
        x + ((i + d) % 5L).toFloat / 10000f }, 0L)
    }.toDF("vec_id", "embedding", "label")
    val c1 = SimilarityOps.isotropyAuditOf(collinear)
      .select(col("mean_pair_cos")).head.getDouble(0)
    assert(c1 > 0.99, s"collinear corpus must read ~1, got $c1")
    // each vector paired with its negation -> sum vector ~ 0 -> ~ -1/(n-1)
    val balanced = (0L until 25L).flatMap { i =>
      val v = vec(i, 5L, dim)
      Seq((2 * i, v, 0L), (2 * i + 1, v.map(-_), 0L))
    }.toDF("vec_id", "embedding", "label")
    val c0 = SimilarityOps.isotropyAuditOf(balanced)
      .select(col("mean_pair_cos")).head.getDouble(0)
    assert(math.abs(c0 + 1.0 / 49) < 1e-3,
      s"sign-balanced corpus must read -1/(n-1), got $c0")
  }
}
