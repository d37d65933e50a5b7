package graft

/** Dev tool: dump formatted physical plans for representative queries
  * so plan regressions (lost pushdown, surprise shuffles, broken
  * broadcasts, codegen fallbacks) are visible at a glance.
  * Usage: graft.PlanAudit [sfDir] [queryName ...]
  *
  * [[planCounts]] is the mechanized form: PlanBudgetSpec pins the
  * scan/exchange node counts of the heaviest queries so the
  * "count relation joined back to its own source defeats exchange
  * reuse" regression class (it cost q85/q90 2× in round 3) fails a
  * test instead of a bench read-through.
  */
object PlanAudit {

  /** Node census of the pre-execution physical plan, subqueries
    * included. Run it on an AQE-DISABLED session: under AQE the
    * executed plan is an opaque AdaptiveSparkPlanExec leaf and the
    * census sees nothing. */
  case class PlanCounts(fileScans: Int, memScans: Int, shuffles: Int, broadcasts: Int)

  def planCounts(df: org.apache.spark.sql.DataFrame): PlanCounts = {
    val plan = df.queryExecution.executedPlan
    val nodes = plan.collectWithSubqueries { case n => n.getClass.getSimpleName }
    def cnt(name: String) = nodes.count(_ == name)
    PlanCounts(
      fileScans = cnt("FileSourceScanExec"),
      memScans = cnt("InMemoryTableScanExec"),
      shuffles = cnt("ShuffleExchangeExec"),
      broadcasts = cnt("BroadcastExchangeExec"))
  }

  /** `PlanAudit <sfDir> --counts qNN...` prints the PlanCounts census
    * (AQE disabled, same posture as PlanBudgetSpec) instead of the
    * formatted plans — the fast way to pin a new query's budget. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val countsMode = args.length > 1 && args(1) == "--counts"
    if (countsMode) {
      val spark = graft.engine.GraftSession.local("graft-plan-audit", "4")
      spark.sparkContext.setLogLevel("ERROR")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      args.drop(2).foreach { n =>
        val c = planCounts(SparkEntry.queries(n)(spark, sfDir))
        println(s"$n -> PlanCounts(${c.fileScans}, ${c.memScans}, ${c.shuffles}, ${c.broadcasts})")
      }
      spark.stop()
      return
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_shipping_priority", "q12_first_n_per_group",
        "q18_window_tumbling", "q29_dedup_minhash_lsh", "q31_simhash_pairs",
        "q35_ann_lsh", "q41_pagerank", "q60_weblog", "q63_contamination",
        "q64_large_orders", "q66_asof_join", "q67_range_join",
        "q70_shuffle_shard", "q72_vocab_topk", "q75_packed_sequences",
        "q77_group_sample", "q78_incremental_dedup", "q84_importance_weight",
        "q88_grouping_sets", "q89_tfidf_keywords", "q90_bigram_perplexity",
        "q92_sessionize", "q95_curriculum_buckets", "q96_bloom_semi_join",
        "q98_zip_with_index")
    val spark = graft.engine.GraftSession.local("graft-plan-audit", "4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
