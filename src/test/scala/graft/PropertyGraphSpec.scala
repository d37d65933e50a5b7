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

  test("mutation methods follow Gelly's merge/remove/union/difference/intersect rules") {
    import spark.implicits._
    def vset(pg: PropertyGraph) = pg.vertices.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def eseq(pg: PropertyGraph) = pg.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // addVertices: existing vertex wins on id conflict; in-batch
    // duplicate ids collapse to one (the reference coGroup's rule)
    val av = g.addVertices(Seq((4L, 999L), (5L, 500L)).toDF("id", "value"))
    assert(vset(av) == Set((1L, 100L), (2L, 200L), (3L, 300L), (4L, 400L), (5L, 500L)))
    val avDup = g.addVertices(Seq((6L, 1L), (6L, 2L)).toDF("id", "value"))
    assert(avDup.vertices.filter(col("id") === 6L).count() == 1)
    // addEdges: bag union keeps duplicates
    val ae = g.addEdges(Seq((1L, 2L, 10L)).toDF("src", "dst", "value"))
    assert(eseq(ae).count(_ == (1L, 2L, 10L)) == 2)
    // removeVertices drops the id and every touching edge
    val rv = g.removeVertices(Seq(Tuple1(3L)).toDF("id"))
    assert(vset(rv).map(_._1) == Set(1L, 2L, 4L))
    assert(eseq(rv) == Seq((1L, 2L, 10L)))
    // removeEdges matches on (src, dst) only; vertices intact
    val re = g.removeEdges(Seq((1L, 2L)).toDF("src", "dst"))
    assert(eseq(re).map(e => (e._1, e._2)).toSet == Set((2L, 3L), (3L, 1L), (1L, 3L)))
    assert(vset(re).size == 4)
    // union: distinct vertices, bag edges
    val u = g.union(PropertyGraph(
      Seq((3L, 300L), (5L, 500L)).toDF("id", "value"),
      Seq((3L, 1L, 30L)).toDF("src", "dst", "value")))
    assert(vset(u).size == 5)
    assert(eseq(u).count(_ == (3L, 1L, 30L)) == 2)
    // difference removes the other graph's vertex SET
    val d = g.difference(PropertyGraph(
      Seq((1L, 0L)).toDF("id", "value"),
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "value")))
    assert(vset(d).map(_._1) == Set(2L, 3L, 4L))
    assert(eseq(d) == Seq((2L, 3L, 20L)))
    // intersect: (src, dst, value)-equal edges, induced vertices
    val i = g.intersect(PropertyGraph(
      Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "value"),
      Seq((1L, 2L, 10L), (2L, 3L, 99L)).toDF("src", "dst", "value")))
    assert(eseq(i) == Seq((1L, 2L, 10L)), "value mismatch excludes the 2->3 edge")
    assert(vset(i).map(_._1) == Set(1L, 2L))
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

  test("gatherSumApplyIteration re-derives the q146 scatter-gather SSSP exactly") {
    import graft.analytics.GraphGen
    // weighted path 0→1→2→3→4 plus a costly shortcut 0→4
    val edges = GraphGen.path(spark, 5L)
      .filter(col("src") < col("dst"))
      .withColumn("value", col("src") + 1L)
      .union(spark.range(1).select(lit(0L).as("src"), lit(4L).as("dst"),
        lit(100L).as("value")))
    val vs = edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
      .distinct().withColumn("value", lit(0L))
    val pg = PropertyGraph(vs, edges)
    val init = pg.vertices.select(col("id").as("node"),
      when(col("id") === 0L, 0L).otherwise(lit(null).cast("long")).as("dist"))
    def viaSurface(run: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      run(init, 4).filter(col("dist").isNotNull)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaGsa = viaSurface((st0, n) => pg.gatherSumApplyIteration(st0, n)(
      gatherSum = (es, st) =>
        es.join(broadcast(st.filter(col("dist").isNotNull)),
            es("src") === col("node"))
          .groupBy(col("dst").as("mnode"))
          .agg(min(col("dist") + col("value")).as("msg")),
      apply = (st, sums) =>
        st.join(sums, st("node") === sums("mnode"), "left_outer")
          .select(col("node"), least(col("dist"), col("msg")).as("dist"))))
    val viaSg = viaSurface((st0, n) => pg.scatterGatherIteration(st0, n)(
      scatter = (es, st) =>
        es.join(broadcast(st.filter(col("dist").isNotNull)),
            es("src") === col("node"))
          .groupBy(col("dst").as("mnode"))
          .agg(min(col("dist") + col("value")).as("msg")),
      gather = (st, msgs) =>
        st.join(msgs, st("node") === msgs("mnode"), "left_outer")
          .select(col("node"), least(col("dist"), col("msg")).as("dist"))))
    assert(viaGsa == viaSg && viaGsa.nonEmpty)
    // the shortcut loses: dist(4) = 1+2+3+4 = 10, not 100
    assert(viaGsa.contains((4L, 10L)))
  }

  test("vertexCentricIteration (pregel) re-derives connected components exactly") {
    import graft.analytics.{Graph, GraphGen}
    val edges = GraphGen.cycle(spark, 6L)
      .select((col("src") + 100L).as("src"), (col("dst") + 100L).as("dst"))
      .union(GraphGen.singletonEdges(spark, 3L))
      .withColumn("value", lit(1L))
    val pg = PropertyGraph(
      edges.select(col("src").as("id")).distinct()
        .withColumn("value", col("id")), edges)
    val st0 = pg.vertices.select(col("id").as("node"), col("value").as("label"))
    // round-0 inbox: every vertex messages itself its own label
    val msg0 = st0.select(col("node").as("dst"), col("label").as("msg"))
    // 7 supersteps: pregel's first fold is the self-inbox no-op, so
    // k iterations = k-1 propagation hops; the 6-cycle needs 5
    val viaPregel = pg.vertexCentricIteration(st0, msg0, 7) { (st, inbox, es) =>
      // compute: fold inbox minima into the state, then send the new
      // label along every out-edge (the Pregel ComputeFunction body)
      val folded = st.join(
          inbox.groupBy(col("dst").as("mnode")).agg(min(col("msg")).as("m")),
          st("node") === col("mnode"), "left_outer")
        .select(col("node"), least(col("label"), col("m")).as("label"))
      val outbox = es.join(broadcast(folded), es("src") === col("node"))
        .select(es("dst").as("dst"), col("label").as("msg"))
      (folded, outbox)
    }.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLib = Graph.connectedComponentsFromEdges(edges.select("src", "dst"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPregel == viaLib && viaPregel.nonEmpty)
  }
}
