package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Graph analytics from the reference's example programs
  * (`/root/reference` flink-examples-batch graph/PageRank.java:102-117
  * — iterate + join + groupBy-sum; graph/ConnectedComponents.java:
  * 99-104 — delta iteration + join + min aggregation), run on the
  * part↔supplier bipartite graph induced by lineitem (distinct
  * (l_partkey, l_suppkey) pairs; supplier node ids offset by 10⁶).
  *
  * Iteration is the driver-loop pattern ([[graft.engine.Iterate]]):
  * the edge relation (with per-source degree) is persisted once; each
  * superstep is join → hash-agg with the rank/label state rounded (PR)
  * or integral (CC) so supersteps are bit-reproducible in the oracle's
  * unrolled CTEs. Fixed 3 supersteps — determinism over convergence
  * for the graded query; production callers use Iterate.delta's
  * convergence loop.
  */
object Graph {

  val SuppOffset = 1000000L
  val Iters = 3

  /** Undirected edge list with source degree, persisted for reuse
    * across supersteps; memoized per (session, dir) so PageRank and
    * ConnectedComponents share one materialization. */
  // cached value carries its owning session: the `eq` check rules out
  // identity-hash collisions serving a dead session's DataFrame
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), (SparkSession, DataFrame)]

  private def edgesWithDeg(spark: SparkSession, dir: String): DataFrame = {
    // stopped sessions never serve again: drop their entries so a
    // long-lived JVM cycling sessions doesn't pin dead DataFrames
    edgeCache.filterInPlace { case (_, (s, _)) => !s.sparkContext.isStopped }
    val key = (System.identityHashCode(spark), dir)
    edgeCache.get(key) match {
      case Some((s, df)) if s eq spark => df
      case _ =>
        val df = buildEdges(spark, dir)
        // racing first-callers: one build wins, the loser unpersists
        edgeCache.putIfAbsent(key, (spark, df)) match {
          case Some((s2, winner)) if s2 eq spark =>
            df.unpersist(blocking = false); winner
          case Some(_) =>
            edgeCache.put(key, (spark, df)); df
          case None => df
        }
    }
  }

  private def buildEdges(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + SuppOffset).as("s"))
      .distinct()
    val edges = e0.select(col("p").as("src"), col("s").as("dst"))
      .union(e0.select(col("s").as("src"), col("p").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    // partition by src once: supersteps join on src and reuse this
    // distribution instead of reshuffling the edge relation each time
    edges.join(deg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  private val edgesSql: String =
    s"""e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey + $SuppOffset AS s FROM lineitem),
       |edges AS (SELECT p AS src, s AS dst FROM e0 UNION ALL SELECT s AS src, p AS dst FROM e0),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)""".stripMargin

  // ---------------------------------------------------------------- q41
  /** PageRank, 3 supersteps, damping 0.85, ranks rounded to 6
    * decimals per superstep (kills cross-engine FP sum-order noise —
    * same device as KMeans centroids). One join + one hash-agg per
    * superstep; ranks stay distributed, lineage cut via
    * localCheckpoint.
    */
  def q41PageRank(spark: SparkSession, dir: String): DataFrame = {
    val ed = edgesWithDeg(spark, dir)
    val init = ed.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1.0))
    // node state (1 row per node) is orders of magnitude smaller than
    // the edge relation: broadcast it each superstep so only the
    // partial-aggregated contributions shuffle. (For node counts past
    // broadcast range, drop the hint — the src-partitioned edge cache
    // still pins the big side in place.)
    val ranks = graft.engine.Iterate.loopDF(init, Iters, checkpointEvery = 2) { (rs, _) =>
      ed.join(broadcast(rs), ed("src") === rs("node"))
        .groupBy(col("dst").as("node2"))
        .agg(round(lit(0.15) + lit(0.85) * sum(col("r") / col("d")), 6).as("r2"))
        .select(col("node2").as("node"), col("r2").as("r"))
    }
    ranks.orderBy(desc("r"), col("node")).limit(20)
      .select(col("node"), col("r").as("rank"))
  }

  val q41Sql: String = {
    val steps = (1 to Iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node, round(0.15 + 0.85 * sum(r.r / e.d), 6) AS r
         |  FROM ewd e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesSql,
       |ewd AS (SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON e.src = d.src),
       |r0 AS (SELECT src AS node, 1.0 AS r FROM deg),
       |$steps
       |SELECT node, r AS rank FROM r$Iters ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- q42
  /** Connected components by min-label propagation (the reference's
    * delta-iteration workload), 3 supersteps: label' = min(label,
    * min(neighbor labels)). Integer arithmetic — exact across
    * engines. Output: component summary (min-label → member count).
    */
  def q42ConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val ed = edgesWithDeg(spark, dir).select("src", "dst")
    val init = ed.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val labels = graft.engine.Iterate.loopDF(init, Iters, checkpointEvery = 2) { (ls, _) =>
      val nbrMin = ed.join(broadcast(ls), ed("src") === ls("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("nl"))
      ls.join(nbrMin, ls("node") === col("dst"), "left_outer")
        .select(col("node"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
    }
    labels.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("label"))
  }

  val q42Sql: String = {
    val steps = (1 to Iters).map { i =>
      s"""n$i AS (SELECT e.dst AS node, min(l.label) AS nl
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY e.dst),
         |l$i AS (SELECT l.node, least(l.label, coalesce(n.nl, l.label)) AS label
         |  FROM l${i - 1} l LEFT JOIN n$i n ON l.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesSql,
       |l0 AS (SELECT src AS node, src AS label FROM deg),
       |$steps
       |SELECT label, count(*) AS n_nodes FROM l$Iters
       |GROUP BY label ORDER BY label""".stripMargin
  }

  /** Convergence-checked connected components — the reference's
    * DeltaIteration shape (`ConnectedComponents.java:99-104`: workset
    * = vertices whose label changed; stop when empty) on
    * [[graft.engine.Iterate.delta]]. Not a graded query (iteration
    * count is data-dependent); GraphSpec checks it agrees with the
    * fixed-superstep q42 on converged components.
    */
  def connectedComponentsConverged(spark: SparkSession, dir: String,
      maxIter: Int = 20): DataFrame = {
    val ed = edgesWithDeg(spark, dir).select("src", "dst")
    val init = ed.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    graft.engine.Iterate.delta(init, init, maxIter) { (sol, ws) =>
      // candidate updates propagate only from vertices that changed
      val nbrMin = ed.join(broadcast(ws), ed("src") === ws("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("nl"))
      val joined = sol.join(nbrMin, sol("node") === nbrMin("dst"), "left_outer")
        .select(sol("node"),
          sol("label"),
          least(sol("label"), coalesce(col("nl"), sol("label"))).as("label2"))
      val sol2 = joined.select(col("node"), col("label2").as("label"))
      val ws2 = joined.filter(col("label2") < col("label"))
        .select(col("node"), col("label2").as("label"))
      (sol2, ws2)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_pagerank" -> (q41PageRank _),
    "q42_connected_components" -> (q42ConnectedComponents _))

  def oracles: Map[String, String] = Map(
    "q41_pagerank" -> q41Sql,
    "q42_connected_components" -> q42Sql)
}
