package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{AggStateMv, AnfOps, Clustering, Coreset, DedupOps, DomainReweight, FilterOps, GraphOps, IncrementalMv, Layout, LinkageOps, Multimodal, PcaOps, PprOps, PreferenceOps, RetrievalOps, RobustStats, Sampling, SimilarityOps, SketchOps, TextOps, UnigramLm, VectorAgg}
import graft.queries.{Behavioral, ChainQueries, Relational, TimeSeries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ ChainQueries.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ Multimodal.queries ++
      VectorAgg.queries ++ Sampling.queries ++ Clustering.queries ++
      GraphOps.queries ++ FilterOps.queries ++ SketchOps.queries ++
      Layout.queries ++ Behavioral.queries ++ TimeSeries.queries ++ RetrievalOps.queries ++
      LinkageOps.queries ++ PcaOps.queries ++ Coreset.queries ++
      IncrementalMv.queries ++ AnfOps.queries ++ PreferenceOps.queries ++ PprOps.queries ++ UnigramLm.queries ++
      AggStateMv.queries ++ DomainReweight.queries ++ RobustStats.queries ++
      graft.streaming.StreamParity.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ DedupOps.oracle ++
      SimilarityOps.oracle ++ Multimodal.oracle ++ ChainQueries.oracle ++
      VectorAgg.oracle ++ Sampling.oracle ++ Clustering.oracle ++
      GraphOps.oracle ++ FilterOps.oracle ++ SketchOps.oracle ++
      Layout.oracle ++ Behavioral.oracle ++ TimeSeries.oracle ++ RetrievalOps.oracle ++
      LinkageOps.oracle ++ PcaOps.oracle ++ Coreset.oracle ++
      IncrementalMv.oracle ++ AnfOps.oracle ++ PreferenceOps.oracle ++ PprOps.oracle ++ UnigramLm.oracle ++
      AggStateMv.oracle ++ DomainReweight.oracle ++ RobustStats.oracle ++
      graft.streaming.StreamParity.oracle
}
