package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Graph, GraphGen, Iterative, PropertyGraph}
import graft.operators.{Aggregators, AsOfJoin, Partitioning, Patterns, RangeJoin, Relational, Typed, Windows}
import graft.pipeline.{Curation, Dedup, Multimodal, Scoring, Similarity, TextAnalysis}
import graft.streaming.WindowSpi

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator registry (one entry per
  * implemented operator from SURVEY.md §2); `oracleSql` pairs each
  * with DuckDB-runnable ANSI SQL over the same parquet tables.
  * Entries without an oracle are non-SQL-expressible ops checked by
  * the driver as rows-only and by ScalaTest specs here.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Typed.queries ++ Windows.queries ++ Iterative.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Graph.queries ++ GraphGen.queries ++ PropertyGraph.queries ++ Aggregators.queries ++ AsOfJoin.queries ++ RangeJoin.queries ++
      Curation.queries ++ Scoring.queries ++ Partitioning.queries ++ WindowSpi.queries ++
      Patterns.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Typed.oracles ++ Windows.oracles ++ Iterative.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      Graph.oracles ++ GraphGen.oracles ++ PropertyGraph.oracles ++ Aggregators.oracles ++ AsOfJoin.oracles ++ RangeJoin.oracles ++
      Curation.oracles ++ Scoring.oracles ++ Partitioning.oracles ++ WindowSpi.oracles ++
      Patterns.oracles
}
