package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.PropertyGraph

/** The Gelly Graph-API facade, method by method, on a hand graph:
  *   1 --10--> 2, 2 --20--> 3, 3 --30--> 1, 1 --40--> 3
  * vertex values = id * 100.
  */
class PropertyGraphSpec extends AnyFunSuite with SparkSpec {

  private def g: PropertyGraph = {
    import spark.implicits._
    PropertyGraph(
      Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 400L)).toDF("id", "value"),
      Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 1L, 30L), (1L, 3L, 40L))
        .toDF("src", "dst", "value"))
  }

  test("mapVertices / mapEdges rewrite values only") {
    val mv = g.mapVertices(_ + 1).vertices.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mv == Map(1L -> 101L, 2L -> 201L, 3L -> 301L, 4L -> 401L))
    val me = g.mapEdges(_ * 2).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(me == Set((1L, 2L, 20L), (2L, 3L, 40L), (3L, 1L, 60L), (1L, 3L, 80L)))
  }

  test("subgraph keeps only surviving-endpoint edges passing the edge predicate") {
    val sg = g.subgraph(col("id") <= 3, col("value") >= 20)
    assert(sg.vertices.count() == 3)
    val es = sg.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((2L, 3L), (3L, 1L), (1L, 3L)))
    // vertex filter drops edges even when the edge predicate passes
    val sg2 = g.subgraph(col("id") =!= 3, lit(true))
    assert(sg2.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
  }

  test("joinWithVertices merges matched values and keeps unmatched") {
    import spark.implicits._
    val in = Seq((1L, 5L), (3L, 7L)).toDF("id", "input")
    val jv = g.joinWithVertices(in, _ + _).vertices.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(jv == Map(1L -> 105L, 2L -> 200L, 3L -> 307L, 4L -> 400L))
  }

  test("degree families include zero-degree vertices") {
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(g.outDegrees) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    assert(m(g.inDegrees) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
    assert(m(g.degrees) == Map(1L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 0L))
    assert(g.numberOfVertices == 4 && g.numberOfEdges == 4)
  }

  test("triplets carry both vertex values and the edge value") {
    val t = g.triplets.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(t.contains((1L, 100L, 2L, 200L, 10L)))
    assert(t.contains((3L, 300L, 1L, 100L, 30L)))
    assert(t.size == 4)
  }

  test("reduceOnNeighbors aggregates neighbor VALUES per direction") {
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // out-neighbors of 1 are {2, 3} -> sum 500
    assert(m(g.reduceOnNeighbors(sum(_), "out")) ==
      Map(1L -> 500L, 2L -> 300L, 3L -> 100L))
    // in-neighbors of 3 are {2, 1} -> min 100
    assert(m(g.reduceOnNeighbors(min(_), "in")) ==
      Map(1L -> 300L, 2L -> 100L, 3L -> 100L))
    assert(m(g.reduceOnNeighbors(max(_), "all")) ==
      Map(1L -> 300L, 2L -> 300L, 3L -> 200L))
  }

  test("reverse flips arcs; undirected doubles them") {
    val rv = g.reverse.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rv == Set((2L, 1L), (3L, 2L), (1L, 3L), (3L, 1L)))
    assert(g.undirected.numberOfEdges == 8)
    // reverse twice is identity
    val back = g.reverse.reverse.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == g.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("scatterGatherIteration re-derives connected components exactly") {
    import graft.analytics.{Graph, GraphGen}
    // disconnected graph: a 6-cycle shifted to 100+ and 3 disjoint edges
    val edges = GraphGen.cycle(spark, 6L)
      .select((col("src") + 100L).as("src"), (col("dst") + 100L).as("dst"))
      .union(GraphGen.singletonEdges(spark, 3L))
      .withColumn("value", lit(1L))
    val pg = PropertyGraph(
      edges.select(col("src").as("id")).distinct()
        .withColumn("value", col("id")), edges)
    val viaSg = pg.scatterGatherIteration(
      pg.vertices.select(col("id").as("node"), col("value").as("label")), 6)(
      scatter = (es, st) =>
        es.join(broadcast(st), es("src") === st("node"))
          .select(col("dst").as("node2"), col("label")),
      gather = (st, msgs) =>
        msgs.union(st.select(col("node").as("node2"), col("label")))
          .groupBy(col("node2")).agg(min(col("label")).as("label2"))
          .select(col("node2").as("node"), col("label2").as("label")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLib = Graph.connectedComponentsFromEdges(edges.select("src", "dst"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSg == viaLib && viaSg.nonEmpty)
    // 4 components: the cycle (label 100) + three pairs (0, 2, 4)
    assert(viaSg.map(_._2) == Set(100L, 0L, 2L, 4L))
  }
}
