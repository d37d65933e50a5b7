package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Capability target: the execution environment of the reference
  * artifact (`/root/reference` ExecutionEnvironment.java) — but
  * realized as a tuned Catalyst/Tungsten `SparkSession`, not a custom
  * runtime. All the reference's hand-built optimizer decisions
  * (join-strategy selection, partial aggregation, ship strategies —
  * SURVEY.md §4.1) are delegated to Catalyst + AQE here.
  *
  * Scale posture: these settings are the local[N] test shape of a
  * cluster config. On a 1000-executor cluster the same code runs with
  * `spark.sql.shuffle.partitions` sized to ~2-3× total cores and AQE
  * coalescing down; nothing in the library hard-codes local paths or
  * partition counts.
  */
object GraftSession {

  /** Default local parallelism: read from SPARK_GRAFT_CPUS, else all cores. */
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")

  def local(appName: String = "graft", cpus: String = defaultCpus): SparkSession = {
    val spark = builder(appName, s"local[$cpus]",
      shufflePartitions = if (cpus == "*") Runtime.getRuntime.availableProcessors() else cpus.toInt)
      // local catalog tables (bucketed layouts) land in tmp, not cwd;
      // per-process path so concurrent JVMs can't clobber each other
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Base builder with the engine's standard conf; master left to caller
    * for cluster deployment. */
  def builder(appName: String, master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      // canonical engine registration: graft_dot + TopKPerKey planner
      // strategy ride every session built here (library entry points
      // also self-register, so sessions built elsewhere still work)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // driver testdata `events.ts` is parquet TIMESTAMP(NANOS): read as
      // epoch-nanos LongType (Spark has no nanos timestamp)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine-altitude guard for the whole class of bug behind the
      // round-9 bench timeout: for a non-outer explode over a COMPUTED
      // array, InferFiltersFromGenerate adds size(arr)>0 and pushes it
      // into the scan — the entire generator expression (gram digests,
      // shingle builds) evaluated a second time at file-split
      // parallelism. The hot sites also use explode_outer+isNotNull
      // (graft.engine.Cpu.explodeComputed) so they stay safe on
      // sessions built elsewhere; this exclusion protects every future
      // site on engine sessions. What the rule buys — pruning rows
      // with empty arrays before the generate — is a trivial win only
      // for STORED array columns, which our plans explode rarely.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // StreamingQuery.stop() default (stopTimeout=0) JOINS the
      // micro-batch thread FOREVER; a wedged stream would then hang
      // whoever calls stop() — including the bench watchdog's grace
      // loop, reproducing the very no-metric-line failure it
      // prevents. 2 s bounds each stop attempt (stop() throws a
      // TimeoutException, which callers treat as "not yet dead").
      .config("spark.sql.streaming.stopTimeout", "2000")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
}
