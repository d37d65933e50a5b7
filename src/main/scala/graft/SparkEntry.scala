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

  /** Family of each registry query (r16 verdict #6): the bench walk's
    * stdout JSON carries a per-family wall-time rollup so a round can
    * see WHERE its budget goes without reconstructing it from 218
    * rows. Families follow the contributing module, except that every
    * FileDrip-driven row (a real StreamingQuery drives the
    * computation) rolls up as `streaming` regardless of which pipeline
    * module hosts it — trigger-drive overhead is the quantity the
    * rollup exists to expose. */
  private val streamingRows: Set[String] = Set(
    "q184", "q185", "q186", "q191", "q192", "q193", "q197", "q199",
    "q205", "q208", "q209", "q212", "q214", "q216", "q217")

  def familyOf(name: String): String = {
    val short = name.takeWhile(_ != '_')
    if (streamingRows.contains(short)) "streaming"
    else if (Graph.queries.contains(name) || GraphGen.queries.contains(name) ||
      PropertyGraph.queries.contains(name) || Iterative.queries.contains(name)) "graph"
    else if (Dedup.queries.contains(name) || Similarity.queries.contains(name) ||
      TextAnalysis.queries.contains(name) || Multimodal.queries.contains(name) ||
      Curation.queries.contains(name) || Scoring.queries.contains(name)) "pipeline"
    else if (Patterns.queries.contains(name)) "cep"
    else if (Windows.queries.contains(name) || WindowSpi.queries.contains(name)) "windows"
    else "relational"
  }

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Typed.oracles ++ Windows.oracles ++ Iterative.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      Graph.oracles ++ GraphGen.oracles ++ PropertyGraph.oracles ++ Aggregators.oracles ++ AsOfJoin.oracles ++ RangeJoin.oracles ++
      Curation.oracles ++ Scoring.oracles ++ Partitioning.oracles ++ WindowSpi.oracles ++
      Patterns.oracles
}
