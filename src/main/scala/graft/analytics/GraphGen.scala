package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic graph generators (reference Gelly
  * `flink-gelly/src/main/java/org/apache/flink/graph/generator/`:
  * CompleteGraph, CycleGraph, PathGraph, StarGraph, GridGraph,
  * HypercubeGraph, CirculantGraph, SingletonEdgeGraph — each builds
  * its edge list from a parallelized LongValueSequenceIterator, i.e.
  * from a distributed id range, never a driver loop).
  *
  * Re-expressed Spark-first: every generator is a closed-form
  * projection of `spark.range(n)` — whole-stage-codegen'd, zero
  * shuffles, partitioned by the range source, so a 10⁹-vertex
  * generator parallelizes exactly like the reference's sequence
  * splits. Undirected graphs are emitted as both directed arcs,
  * Gelly's representation. RMatGraph ships too, with its random
  * stream replaced by the portable integer LCG (see [[rmat]]) so the
  * edge list is a cross-engine pure function — the reference's JDK
  * stream itself has no portable twin.
  *
  * The graded census (q138) pins every generator's edge list
  * cross-engine with exact integers: vertex/edge counts, degree
  * extrema, and a positional checksum Σ(src·P + dst) that detects
  * any single edge difference.
  */
object GraphGen {

  /** K_n: every ordered pair (i, j), i ≠ j. */
  def complete(spark: SparkSession, n: Long): DataFrame = {
    val a = spark.range(n).select(col("id").as("src"))
    val b = spark.range(n).select(col("id").as("dst"))
    a.crossJoin(b).filter(col("src") =!= col("dst"))
  }

  /** C_n: i ~ (i+1) mod n, both arcs. */
  def cycle(spark: SparkSession, n: Long): DataFrame = {
    val f = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    f.union(f.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** P_n: i ~ i+1 for i < n−1, both arcs. */
  def path(spark: SparkSession, n: Long): DataFrame = {
    val f = spark.range(n - 1).select(col("id").as("src"),
      (col("id") + 1).as("dst"))
    f.union(f.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** S_n: hub 0 ~ every spoke 1..n−1, both arcs. */
  def star(spark: SparkSession, n: Long): DataFrame = {
    val f = spark.range(1, n).select(lit(0L).as("src"), col("id").as("dst"))
    f.union(f.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** rows × cols lattice (vertex = row·cols + col), right + down
    * neighbors, both arcs; `wrap` adds the torus edges. */
  def grid(spark: SparkSession, rows: Long, cols: Long,
      wrap: Boolean = false): DataFrame = {
    val v = spark.range(rows * cols)
      .select(col("id"), (col("id") / cols).cast("long").as("r"),
        (col("id") % cols).as("c"))
    val rightLim = if (wrap) cols else cols - 1
    val downLim = if (wrap) rows else rows - 1
    val right = v.filter(col("c") < rightLim)
      .select(col("id").as("src"),
        (col("r") * cols + (col("c") + 1) % cols).as("dst"))
    val down = v.filter(col("r") < downLim)
      .select(col("id").as("src"),
        (((col("r") + 1) % rows) * cols + col("c")).as("dst"))
    val f = right.union(down)
    f.union(f.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Q_d: i ~ i⊕2^b for every bit b — symmetric, so the flat map
    * already emits both arcs of every edge. */
  def hypercube(spark: SparkSession, d: Int): DataFrame =
    spark.range(1L << d)
      .crossJoin(spark.range(d).select(col("id").as("b")))
      .select(col("id").as("src"),
        expr("id ^ shiftleft(1L, cast(b AS INT))").as("dst"))

  /** Circulant graph: i ~ (i+off) mod n per offset, both arcs. */
  def circulant(spark: SparkSession, n: Long, offsets: Seq[Long]): DataFrame = {
    require(offsets.nonEmpty, "circulant needs at least one offset")
    val offDf = offsets.map { off =>
      spark.range(n).select(col("id").as("src"), ((col("id") + off) % n).as("dst"))
    }.reduce(_ union _)
    offDf.union(offDf.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** EchoGraph(n, d) (reference generator/EchoGraph.java:77 — a
    * CirculantGraph over the single offset range of width d centered
    * at n/2, start (n−d+1)/2): every vertex links the d vertices
    * farthest from it. The centered range is complement-closed
    * (offset o pairs with n−o inside the range), so one arc per
    * (vertex, offset) already contains both directions of every edge
    * — per-vertex degree is exactly d. */
  def echo(spark: SparkSession, n: Long, d: Long): DataFrame = {
    val start = (n - d + 1) / 2
    spark.range(n)
      .crossJoin(spark.range(start, start + d).select(col("id").as("off")))
      .select(col("id").as("src"), ((col("id") + col("off")) % n).as("dst"))
  }

  /** EmptyGraph: zero edges. An edge frame cannot carry isolated
    * vertices — the vertex set lives beside it ([[PropertyGraph]]
    * holds both), which is why the q138 census states the empty
    * graph's row in closed form instead of aggregating this frame. */
  def empty(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("src"), col("id").as("dst"))

  /** RMatGraph (reference generator/RMatGraph.java — recursive-matrix
    * power-law edges: each of L = log₂(n) levels picks a quadrant
    * with probabilities a/b/c/d, accumulating one src and one dst
    * bit). The reference draws from a JDK random stream; here the
    * draw for (edge e, level l) is a PORTABLE squared-LCG hash —
    * k = e·L+l+1, u = ((k² mod 1000003)·2654435761 mod 1000003) /
    * 1000003 — the q35 integer device plus a squaring nonlinearity
    * (a plain linear LCG makes consecutive-level draws differ by a
    * CONSTANT step mod 1, collapsing the 2^L bit patterns to ~16;
    * measured before shipping, the square restores 172 distinct
    * sources with max out-degree 57 over 2048 edges — RMat's skew).
    * Quadrant thresholds are the literal doubles 0.45/0.60/0.75
    * (a=0.45, b=0.15, c=0.15, d=0.25 — RMat's canonical skew):
    * src bit = draw ≥ 0.60, dst bit = draw in [0.45,0.60) ∪ ≥ 0.75.
    * One groupBy(edge) hash-agg folds the L bit pairs into ids;
    * noise-free integer arithmetic end to end. */
  def rmat(spark: SparkSession, levels: Int, edges: Long): DataFrame = {
    val l = levels
    spark.range(edges).select(col("id").as("e"))
      .crossJoin(spark.range(l).select(col("id").as("lv")))
      .select(col("e"), col("lv"),
        expr(s"((e * $l + lv + 1) * (e * $l + lv + 1) % 1000003L)").as("k2"))
      .select(col("e"), col("lv"),
        ((col("k2") * 2654435761L % 1000003L) / 1000003.0).as("u"))
      .select(col("e"), col("lv"),
        when(col("u") >= 0.60, 1L).otherwise(0L).as("sb"),
        when((col("u") >= 0.45 && col("u") < 0.60) || col("u") >= 0.75, 1L)
          .otherwise(0L).as("db"))
      .groupBy(col("e"))
      .agg(sum(expr("sb * shiftleft(1L, cast(lv AS INT))")).as("src"),
        sum(expr("db * shiftleft(1L, cast(lv AS INT))")).as("dst"))
      .select(col("src"), col("dst"))
  }

  /** m disjoint edges (2i, 2i+1), both arcs. */
  def singletonEdges(spark: SparkSession, m: Long): DataFrame = {
    val f = spark.range(m).select((col("id") * 2).as("src"),
      (col("id") * 2 + 1).as("dst"))
    f.union(f.select(col("dst").as("src"), col("src").as("dst")))
  }

  // ---------------------------------------------------------------- q138
  /** Generator census — one row per generator at a pinned size:
    * vertex/edge counts, degree extrema, and the positional checksum
    * Σ(src·P + dst) with P = 1000003 (exact longs at these sizes; any
    * single differing arc shifts the sum). The oracle rebuilds every
    * edge list from DuckDB `range()` — the generators themselves are
    * the thing under test, cross-engine. */
  val ChkP = 1000003L

  /** Gelly `metric/ChecksumHashCode.java` as a library fold: one
    * (count, checksum) row over any edge frame, checksum =
    * Σ(src·P + dst) — the positional form the q138 census pins per
    * generator (the reference sums Java hashCodes; a positional
    * polynomial is the same any-single-difference detector with a
    * cross-engine-exact value). Empty frame → (0, 0), the
    * reference's empty-checksum. */
  def checksumHashCode(edges: DataFrame): DataFrame =
    edges.agg(count(lit(1)).as("cnt"),
      coalesce(sum(col("src") * ChkP + col("dst")), lit(0L)).as("checksum"))

  private def tag(name: String, edges: DataFrame): DataFrame =
    edges.select(lit(name).as("gen"), col("src"), col("dst"))

  def q138GeneratorCensus(spark: SparkSession, dir: String): DataFrame = {
    // ONE unioned pass over every generator: per-(gen, src) partial
    // degree + checksum, then one per-gen rollup — two exchanges
    // total instead of a groupBy + crossJoin per generator (the
    // 11-census first draft planned 28)
    val all = Seq(
      tag("complete", complete(spark, 64)),
      tag("cycle", cycle(spark, 1000)),
      tag("path", path(spark, 1000)),
      tag("star", star(spark, 1000)),
      tag("grid", grid(spark, 32, 32)),
      tag("grid_wrap", grid(spark, 32, 32, wrap = true)),
      tag("hypercube", hypercube(spark, 10)),
      tag("circulant", circulant(spark, 512, Seq(1L, 2L, 5L))),
      tag("echo", echo(spark, 64, 5)),
      tag("rmat", rmat(spark, 8, 2048)),
      tag("singleton", singletonEdges(spark, 500))).reduce(_ union _)
    val perSrc = all.groupBy(col("gen"), col("src"))
      .agg(count(lit(1)).as("d"),
        sum(col("src") * ChkP + col("dst")).as("chk"))
    val censuses = perSrc.groupBy(col("gen"))
      .agg(count(lit(1)).as("n_vertices"), sum(col("d")).as("n_edges"),
        min(col("d")).as("min_degree"), max(col("d")).as("max_degree"),
        sum(col("chk")).as("checksum"))
    // EmptyGraph has no edges, so its census row is the closed form
    // (n vertices, all-zero edge stats) rather than an agg over an
    // empty degree relation
    val emptyRow = spark.range(1024).agg(count(lit(1)).as("n_vertices"))
      .select(lit("empty").as("gen"), col("n_vertices"),
        lit(0L).as("n_edges"), lit(0L).as("min_degree"),
        lit(0L).as("max_degree"), lit(0L).as("checksum"))
    censuses.union(emptyRow).orderBy(col("gen"))
  }

  val q138Sql: String = {
    val p = ChkP
    // each generator's edge list in DuckDB range() algebra, both arcs
    val gens = Seq(
      "complete" ->
        "SELECT a.range AS src, b.range AS dst FROM range(64) a, range(64) b WHERE a.range <> b.range",
      "cycle" ->
        """SELECT range AS src, (range + 1) % 1000 AS dst FROM range(1000)
          | UNION ALL SELECT (range + 1) % 1000, range FROM range(1000)""".stripMargin,
      "path" ->
        """SELECT range AS src, range + 1 AS dst FROM range(999)
          | UNION ALL SELECT range + 1, range FROM range(999)""".stripMargin,
      "star" ->
        """SELECT 0 AS src, range AS dst FROM range(1, 1000)
          | UNION ALL SELECT range, 0 FROM range(1, 1000)""".stripMargin,
      "grid" ->
        """WITH v AS (SELECT range AS id, range // 32 AS r, range % 32 AS c FROM range(1024)),
          | f AS (SELECT id AS src, r * 32 + (c + 1) % 32 AS dst FROM v WHERE c < 31
          |       UNION ALL SELECT id, ((r + 1) % 32) * 32 + c FROM v WHERE r < 31)
          | SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f""".stripMargin,
      "grid_wrap" ->
        """WITH v AS (SELECT range AS id, range // 32 AS r, range % 32 AS c FROM range(1024)),
          | f AS (SELECT id AS src, r * 32 + (c + 1) % 32 AS dst FROM v
          |       UNION ALL SELECT id, ((r + 1) % 32) * 32 + c FROM v)
          | SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f""".stripMargin,
      "hypercube" ->
        """SELECT i.range AS src, xor(i.range, 1 << CAST(b.range AS INT)) AS dst
          | FROM range(1024) i, range(10) b""".stripMargin,
      "circulant" ->
        """WITH f AS (SELECT i.range AS src, (i.range + o.off) % 512 AS dst
          |           FROM range(512) i, (VALUES (1), (2), (5)) o(off))
          | SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f""".stripMargin,
      "echo" ->
        """SELECT i.range AS src, (i.range + o.range) % 64 AS dst
          | FROM range(64) i, range(30, 35) o""".stripMargin,
      "rmat" ->
        """WITH bits AS (
          |  SELECT e.range AS e, l.range AS lv,
          |    (((e.range * 8 + l.range + 1) * (e.range * 8 + l.range + 1) % 1000003)
          |      * 2654435761 % 1000003) / 1000003.0 AS u
          |  FROM range(2048) e, range(8) l),
          | q AS (SELECT e, lv,
          |    CASE WHEN u >= 0.60 THEN 1 ELSE 0 END AS sb,
          |    CASE WHEN (u >= 0.45 AND u < 0.60) OR u >= 0.75 THEN 1 ELSE 0 END AS db
          |  FROM bits)
          | SELECT sum(sb * (1 << CAST(lv AS INT))) AS src,
          |        sum(db * (1 << CAST(lv AS INT))) AS dst
          | FROM q GROUP BY e""".stripMargin,
      "singleton" ->
        """SELECT range * 2 AS src, range * 2 + 1 AS dst FROM range(500)
          | UNION ALL SELECT range * 2 + 1, range * 2 FROM range(500)""".stripMargin)
    val blocks = gens.map { case (name, sql) =>
      s"""SELECT '$name' AS gen, CAST(count(DISTINCT src) AS BIGINT) AS n_vertices,
         |  CAST(count(*) AS BIGINT) AS n_edges,
         |  CAST(min(d) AS BIGINT) AS min_degree, CAST(max(d) AS BIGINT) AS max_degree,
         |  CAST(sum(chk) AS BIGINT) AS checksum
         |FROM (SELECT src, dst, src * $p + dst AS chk,
         |        count(*) OVER (PARTITION BY src) AS d
         |      FROM ($sql))""".stripMargin
    }
    val emptyBlock =
      """SELECT 'empty' AS gen, CAST(count(*) AS BIGINT) AS n_vertices,
        |  CAST(0 AS BIGINT) AS n_edges, CAST(0 AS BIGINT) AS min_degree,
        |  CAST(0 AS BIGINT) AS max_degree, CAST(0 AS BIGINT) AS checksum
        |FROM range(1024)""".stripMargin
    (blocks :+ emptyBlock).mkString("", "\nUNION ALL\n", "\nORDER BY gen")
  }

  // ---------------------------------------------------------------- q175
  /** [[checksumHashCode]] graded as a query surface (Gelly
    * `metric/ChecksumHashCode.java` — previously spec-pinned only):
    * the library fold applied to three generated graphs plus the
    * EMPTY frame, whose (0, 0) closed form is the reference's
    * empty-checksum contract. One row per graph; the oracle rebuilds
    * each edge list in DuckDB range() algebra and re-states the
    * positional polynomial. */
  def q175ChecksumHashcode(spark: SparkSession, dir: String): DataFrame = {
    def row(name: String, edges: DataFrame): DataFrame =
      checksumHashCode(edges)
        .select(lit(name).as("gen"), col("cnt"), col("checksum"))
    Seq(
      row("empty", empty(spark)),
      row("hypercube", hypercube(spark, 10)),
      row("rmat", rmat(spark, 8, 2048)),
      row("singleton", singletonEdges(spark, 500)))
      .reduce(_ union _).orderBy(col("gen"))
  }

  val q175Sql: String = {
    val p = ChkP
    s"""WITH h AS (
       |  SELECT i.range AS src, xor(i.range, 1 << CAST(b.range AS INT)) AS dst
       |  FROM range(1024) i, range(10) b),
       |rm AS (
       |  WITH bits AS (
       |    SELECT e.range AS e, l.range AS lv,
       |      (((e.range * 8 + l.range + 1) * (e.range * 8 + l.range + 1) % 1000003)
       |        * 2654435761 % 1000003) / 1000003.0 AS u
       |    FROM range(2048) e, range(8) l),
       |  q AS (SELECT e, lv,
       |      CASE WHEN u >= 0.60 THEN 1 ELSE 0 END AS sb,
       |      CASE WHEN (u >= 0.45 AND u < 0.60) OR u >= 0.75 THEN 1 ELSE 0 END AS db
       |    FROM bits)
       |  SELECT sum(sb * (1 << CAST(lv AS INT))) AS src,
       |         sum(db * (1 << CAST(lv AS INT))) AS dst
       |  FROM q GROUP BY e),
       |sg AS (
       |  SELECT range * 2 AS src, range * 2 + 1 AS dst FROM range(500)
       |  UNION ALL SELECT range * 2 + 1, range * 2 FROM range(500))
       |SELECT 'empty' AS gen, CAST(0 AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS checksum
       |UNION ALL SELECT 'hypercube', CAST(count(*) AS BIGINT),
       |  CAST(coalesce(sum(src * $p + dst), 0) AS BIGINT) FROM h
       |UNION ALL SELECT 'rmat', CAST(count(*) AS BIGINT),
       |  CAST(coalesce(sum(src * $p + dst), 0) AS BIGINT) FROM rm
       |UNION ALL SELECT 'singleton', CAST(count(*) AS BIGINT),
       |  CAST(coalesce(sum(src * $p + dst), 0) AS BIGINT) FROM sg
       |ORDER BY gen""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_generator_census" -> (q138GeneratorCensus _),
    "q175_checksum_hashcode" -> (q175ChecksumHashcode _))

  def oracles: Map[String, String] = Map(
    "q138_generator_census" -> q138Sql,
    "q175_checksum_hashcode" -> q175Sql)
}
