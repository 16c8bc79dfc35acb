package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Personalized PageRank (Page et al. 1999; the personalized/seeded
  * variant behind graph-based retrieval expansion, related-item
  * surfacing and GraphSAGE-style neighborhood sampling): random-walk-
  * with-restart mass from a SEED set, not the global stationary vector —
  * the ranking says "close to these items", which is what a recommender
  * or a retrieval expander actually wants from a co-occurrence graph.
  *
  * Power iteration in exact MICRO-integer mass: each round every node
  * streams `floor(m·(1000−α) / (1000·deg))` to each neighbor and the
  * seeds re-inject their `α·10⁶` restart mass; flooring loses a little
  * mass (sub-milli per hop) but is engine-exact, so every round and the
  * final ranking replay bit-for-bit in the DuckDB oracle (unrolled
  * push CTEs). Mass state is SPARSE — only reached nodes carry rows —
  * and monotone in reach, never larger than |V|.
  *
  * 100 TB shape: the degree-annotated adjacency is built once and
  * truncated; each round is ONE frontier⋈adjacency equi-join plus a
  * map-side-combined sum — the ANF/BFS exchange budget, R rounds total.
  * Restart mass keeps the walk local, so the frontier stays
  * seed-neighborhood-sized on graphs whose diameter exceeds R.
  */
object PprOps {

  /** Restart probability α, milli. */
  val PprAlphaMilli = 150L
  /** Push rounds — walk length; mass beyond R hops is α·(1−α)^R < 4%. */
  val PprRounds = 6
  /** Seed selection: parts ≡ 0 (mod SeedMod), the walks convention. */
  val PprSeedMod = 97L
  /** Initial/restart unit mass per seed, micro. */
  val PprUnit = 1000000L

  /** Registered query: rides the family-shared [[GraphOps.coTables]]
    * projection like the other eight kernels (it was the one holdout
    * rebuilding its own). */
  def ppr(s: SparkSession, dir: String): DataFrame =
    pprFrom(GraphOps.coTables(s, dir).se)

  def pprOf(membership: DataFrame): DataFrame =
    pprFrom(GraphOps.supportedEdges(membership))

  private def pprFrom(und: DataFrame): DataFrame = {
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val adj = Lineage.truncate(
      sym.select(col("src"), col("dst"),
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))).as("deg"))
        .repartition(col("src")))
    val seeds = Lineage.truncate(
      adj.select(col("src").as("n")).distinct()
        .filter(col("n") % PprSeedMod === 0))
    val restart = seeds.select(col("n"),
      lit(PprAlphaMilli * PprUnit / 1000L).as("m"))
    var mass = Lineage.truncate(seeds.select(col("n"), lit(PprUnit).as("m")))
    for (_ <- 1 to PprRounds) {
      val pushed = adj.join(mass.withColumnRenamed("n", "src"), Seq("src"))
        .select(col("dst").as("n"),
          expr(s"(m * ${1000L - PprAlphaMilli}) DIV (1000 * deg)").as("m"))
      mass = Lineage.truncate(
        pushed.unionByName(restart)
          .groupBy(col("n")).agg(sum(col("m")).as("m")))
    }
    mass.select(col("n").as("part"), col("m").as("mass_micro"))
      .orderBy(col("part"))
  }

  /** Oracle: same degree-annotated adjacency (SQL window), the push
    * rounds unrolled — absent row = zero mass, exactly the Spark sparse
    * representation. */
  val pprSql: String = {
    val rounds = (1 to PprRounds).map { r =>
      s"""m$r AS MATERIALIZED (
         |  SELECT n, CAST(sum(m) AS BIGINT) AS m FROM (
         |    SELECT a.dst AS n, (t.m * ${1000L - PprAlphaMilli}) // (1000 * a.deg) AS m
         |    FROM m${r - 1} t JOIN adj a ON a.src = t.n
         |    UNION ALL SELECT n, ${PprAlphaMilli * PprUnit / 1000L} FROM seeds)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${GraphOps.LiCappedCte},
       |und AS MATERIALIZED (
       |  SELECT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
       |  GROUP BY 1, 2 HAVING count(*) >= ${GraphOps.Cores.MinSupport}),
       |sym AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und),
       |adj AS MATERIALIZED (
       |  SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM sym),
       |seeds AS MATERIALIZED (
       |  SELECT DISTINCT src AS n FROM sym WHERE src % $PprSeedMod = 0),
       |m0 AS (SELECT n, CAST($PprUnit AS BIGINT) AS m FROM seeds),
       |$rounds
       |SELECT n AS part, m AS mass_micro FROM m$PprRounds
       |ORDER BY part""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_ppr" -> (ppr _)
  )

  val oracle: Map[String, String] = Map(
    "graph_ppr" -> pprSql
  )
}
