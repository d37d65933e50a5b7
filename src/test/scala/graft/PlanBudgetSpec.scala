package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.PlanAudit.PlanCounts

/** Pins the physical-plan node census (parquet scans, cached scans,
  * shuffles, broadcasts) of the heaviest queries. The plans these
  * counts encode were audited by hand (PlanAudit + round-2/3 verdict
  * review); a count going UP means a scan or shuffle crept back in —
  * the exchange-reuse regression class that silently doubled q85/q90
  * in round 3. A count going DOWN is an improvement: update the
  * budget alongside the change, consciously.
  *
  * Counted on an AQE-disabled twin session: AQE hides the plan behind
  * an adaptive leaf pre-execution, and these queries' static and
  * adaptive shapes only differ by runtime coalescing, which the
  * census ignores anyway.
  */
class PlanBudgetSpec extends AnyFunSuite with SparkSpec {

  lazy val noAqe: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  val budgets: Map[String, PlanCounts] = Map(
    // 4 cached-shingle reads (sig + posting self-join + sizes), never
    // a second documents scan; broadcasts: bucket-cap hot set + sizes
    "q29_dedup_minhash_lsh" -> PlanCounts(0, 4, 6, 4),
    "q31_simhash_pairs" -> PlanCounts(1, 0, 6, 1),
    "q32_ngram_jaccard" -> PlanCounts(0, 4, 4, 3),
    // superstep loops run over one localCheckpoint/cache: the final
    // plan re-reads the corpus zero times
    "q41_pagerank" -> PlanCounts(0, 1, 1, 1),
    // per-step localCheckpoint (the step reads its state TWICE — join
    // + union legs — so uncheckpointed lineage doubles per superstep):
    // the final plan is one hash-agg + one output sort over the
    // checkpointed labels
    "q42_connected_components" -> PlanCounts(0, 0, 2, 0),
    "q57_transitive_closure" -> PlanCounts(0, 0, 1, 0),
    "q62_dedup_clusters" -> PlanCounts(0, 0, 3, 0),
    "q73_bpe_pairs" -> PlanCounts(1, 0, 1, 0),
    "q75_packed_sequences" -> PlanCounts(3, 0, 5, 2),
    // ONE corpus scan: the dup-ngram count rides a window over its
    // own lineage (a join-back to a count relation = 2 scans = the
    // round-3 regression this spec exists to catch)
    // +1 shuffle each (q85/q90): the Cpu.spread exchange lifting the
    // gram build off file-split parallelism — tiny (projected input
    // columns) and a no-op at real corpus scale
    "q85_dup_ngram_frac" -> PlanCounts(1, 0, 4, 0),
    "q89_tfidf_keywords" -> PlanCounts(2, 0, 4, 1),
    "q90_bigram_perplexity" -> PlanCounts(3, 0, 6, 2),
    // SPI graded twins: one events scan into the groupByKey exchange,
    // one output sort — any extra scan/shuffle means the fold stopped
    // being a single pass per key
    "q106_continuous_fires" -> PlanCounts(1, 0, 2, 0),
    "q107_punctuated_closes" -> PlanCounts(1, 0, 2, 0),
    "q108_sliding_continuous" -> PlanCounts(1, 0, 2, 0),
    "q109_late_refires" -> PlanCounts(1, 0, 2, 0),
    "q110_session_fires" -> PlanCounts(1, 0, 2, 0),
    // five scans = supplier + orders + lineitem l1/l2/l3 — the semi
    // and anti legs each rescan lineitem ONCE, never per-row
    "q103_waiting_supplier" -> PlanCounts(5, 0, 1, 4),
    // pair scoring is scan + one broadcast; zero shuffles pre-TopK
    "q104_cosine_expr" -> PlanCounts(2, 0, 0, 1),
    // customer + orders, join-broadcast at test scale (shuffle-keyed
    // on a cluster), two aggs + sort
    "q112_cust_distribution" -> PlanCounts(2, 0, 3, 1),
    // customer twice (threshold + cohort) + orders; broadcasts = the
    // ONE-ROW threshold and the anti-join side
    "q113_dormant_rich" -> PlanCounts(3, 0, 3, 2),
    // correlated-scalar rewrite: lineitem twice (outer + per-part
    // avg) + part, joined ONCE each — never per-row re-execution
    "q115_small_quantity" -> PlanCounts(3, 0, 2, 2),
    // CEP: one events scan into the groupByKey exchange + output sort
    "q116_funnel" -> PlanCounts(1, 0, 2, 0),
    // chunking: one scan, generated explode, only the output sort
    "q118_doc_chunks" -> PlanCounts(1, 0, 1, 0),
    // supersteps end on a localCheckpoint: the final plan is just the
    // sort+limit over the checkpointed dist relation
    "q119_sssp" -> PlanCounts(0, 0, 0, 0),
    // dimension pyramids: every nation/region/supplier/customer chain
    // broadcasts — the 4 shuffles are the lineitem-orders fact join
    // (2 exchanges) + final agg + sort, nothing else
    "q121_market_share" -> PlanCounts(7, 0, 4, 5),
    "q122_volume_shipping" -> PlanCounts(6, 0, 4, 4),
    // one documents scan, window rank exchange + output sort
    "q123_priority_sample" -> PlanCounts(1, 0, 2, 0),
    // every half-step state is checkpointed before normalization (an
    // unmaterialized score relation re-ran each join+agg up to 4x per
    // superstep: 6.0 s -> 2.5 s); the final plan is just the
    // normalize-join + sort over the checkpointed auth relation
    "q125_hits" -> PlanCounts(0, 0, 1, 1),
    // two lineitem scans (pair legs), basket-bounded expansion; deg
    // relation broadcasts twice
    "q126_jaccard_index" -> PlanCounts(2, 0, 4, 2),
    // final superstep (not checkpoint-aligned at 3 iters) reads the
    // cached edges once: label broadcast + count/argmax aggs + sort
    "q124_label_propagation" -> PlanCounts(0, 1, 4, 1),
    // ONE lineitem scan + one o-exchange shared by both pair legs:
    // the weight rides a count window over e0's own lineage — a
    // groupBy+join-back here re-shuffled the EXPANDED pair relation
    // (measured 14 s at sf1, the q85/q90 regression class)
    "q128_adamic_adar" -> PlanCounts(1, 0, 3, 1),
    // summarization reads the MEMOIZED trade rollup (nation×nation×
    // flag, ≤ 1875 rows) + 2 tiny nation scans for the rep maps — the
    // fact join materializes once for q132/q136/q137/q143
    "q132_summarization" -> PlanCounts(2, 1, 3, 2),
    // both metrics read ONLY the shared edge cache — zero file scans
    "q133_vertex_metrics" -> PlanCounts(0, 1, 1, 0),
    "q134_edge_metrics" -> PlanCounts(0, 3, 1, 2),
    // skip-strategy CEP: same single-pass census as q116
    "q135_all_funnels" -> PlanCounts(1, 0, 2, 0),
    // trade digraph checkpoints eagerly (the q125/q119 pattern), so
    // the audited plans are node-cardinality aggs only — zero scans
    "q136_directed_vertex_metrics" -> PlanCounts(0, 0, 6, 2),
    "q137_directed_edge_metrics" -> PlanCounts(0, 0, 13, 3),
    // generators are range projections: zero table scans by
    // definition; ONE unioned pass (per-(gen,src) partials + per-gen
    // rollup) replaced the 28-exchange per-generator first draft
    "q138_generator_census" -> PlanCounts(0, 0, 4, 4),
    "q139_bipartite_projection" -> PlanCounts(1, 0, 2, 1),
    // strict-next is ONE window exchange + output sort, no fold
    "q140_strict_next" -> PlanCounts(1, 0, 2, 0),
    "q141_semdedup" -> PlanCounts(0, 0, 3, 1),
    // NO_SKIP window matches: ONE events scan, two chained window
    // passes over one sort, no join (the join-back draft re-scanned
    // events for the clicks leg — twice-read rule, fourth sighting)
    "q142_all_starts" -> PlanCounts(1, 0, 2, 0),
    // followedByAny: two filtered events scans into one equi-key join
    // (broadcast-hash at test scale; SMJ with one exchange per side on
    // a cluster) + output sort — the within bound is a join condition,
    // never a cross product
    "q144_any_pairs" -> PlanCounts(2, 0, 1, 1),
    // until burst: same single-pass census as q116/q127
    "q145_until_burst" -> PlanCounts(1, 0, 2, 0),
    // scatter-gather supersteps end on a localCheckpoint: the final
    // plan is filter+sort over the checkpointed state relation
    "q146_scatter_gather_sssp" -> PlanCounts(0, 0, 1, 0),
    // skip-to CEP: same single-pass census as q116/q135
    "q147_skip_to_click" -> PlanCounts(1, 0, 2, 0),
    // ONE aggregate over deg ⋈ per-vertex-credits: nothing is read
    // twice, so no checkpoint — the 4 scans are q56's internal
    // column-pruned edge legs + the degree leg, pipelined in one job
    // (checkpointed variants measured 2.4 s/4.5 s vs 1.7 s/2.6 s at
    // sf0.1/sf1 — materialization barriers beat parallel slack only
    // when a relation is genuinely derived twice)
    "q148_clustering_metrics" -> PlanCounts(4, 0, 9, 3),
    // identical frame + closed-form projections, same census
    "q149_triadic_census" -> PlanCounts(4, 0, 9, 3),
    // pair + triangle frames localCheckpoint'd in dirCreditFrames
    // (each fed 4-5 downstream reads — round-7 verdict finding #1):
    // the final plan is credit/degree aggs + join + fused metric agg
    // over checkpoint scans, with the 1-row triangle count broadcast
    "q151_directed_clustering_metrics" -> PlanCounts(0, 0, 4, 1),
    // listing over the checkpointed pair frame: the self-join's two
    // tiny sides broadcast, one output-sort exchange
    "q154_directed_triangle_listing" -> PlanCounts(0, 0, 1, 2),
    // one lineitem scan + bucket equi-join (promo side broadcast) +
    // agg/sort exchanges — the overlap predicate adds no plan nodes
    "q157_interval_overlap" -> PlanCounts(1, 0, 2, 1),
    // supersteps run over localCheckpoint'd edge/node frames built
    // eagerly: the RETURNED frame is checkpoint scans + a top-20
    // TakeOrdered — zero file scans, zero exchanges
    "q163_library_pagerank" -> PlanCounts(0, 0, 0, 0),
    // one embeddings scan into the encode+ADC kernel (training and
    // query tables are driver-built model state); rank window + output
    // sort are the two exchanges
    "q166_pq_adc" -> PlanCounts(1, 0, 2, 0),
    // each of the five tables scanned ONCE (supply cost is a window
    // over the facts' own lineage — a join-back re-scan is the
    // regression this entry exists to catch)
    "q168_product_profit" -> PlanCounts(5, 0, 3, 4),
    // lineitem + 4 broadcast dims, each once; (part,supp) agg
    // exchange + window — the filters sit BELOW the supply agg
    "q167_min_cost_supplier" -> PlanCounts(5, 0, 2, 4),
    // one scan, part agg + final sort; 1-row total broadcast
    "q169_important_supply" -> PlanCounts(1, 0, 3, 1),
    // facts + part dim + excluded-supplier anti side, each once
    "q170_supplier_relationship" -> PlanCounts(3, 0, 3, 2),
    // facts + red parts + supplier + nation, each once; one
    // (part,supp) agg exchange feeding the semi join
    "q171_promotion_suppliers" -> PlanCounts(4, 0, 2, 3),
    // one embeddings scan into the vecsum agg (2 exchanges: agg +
    // output sort); posexplode adds projection nodes only
    "q164_centroid_accumulate" -> PlanCounts(1, 0, 2, 0),
    // composed IVF-PQ: ONE embeddings scan into the routing+encode+ADC
    // kernel (codebook training is its own bounded job, not in this
    // plan — its result enters as broadcast model state); rank window
    // + output sort
    "q173_ivf_pq" -> PlanCounts(1, 0, 2, 0),
    // allowCombinations: two filtered events scans into the q144-shaped
    // pair join (broadcast at test scale), ONE anchor-keyed exchange
    // shared by the rank window and the combination agg (same keys —
    // Catalyst reuses the partitioning) + output sort; the mask
    // expansion is a generate, never an exchange
    "q174_combinations" -> PlanCounts(2, 0, 2, 1),
    // generated graphs: range projections, zero table scans; the 2
    // broadcasts are rmat's and hypercube's range×range nested loops,
    // the 4 exchanges are rmat's per-edge bit fold plus 1-row global
    // agg partials and the 4-row union sort — all constant-size
    "q175_checksum_hashcode" -> PlanCounts(0, 0, 4, 2),
    // ONE part scan feeds both the prefix join legs and the small
    // block (exchange reuse); broadcasts: gram-df, small-b leg, and
    // the prefix self-join's build side
    "q176_fuzzy_join" -> PlanCounts(1, 0, 3, 3),
    // single documents pass into the native winnow kernel; exchanges:
    // the CPU-spread repartition (small-file inputs arrive in fewer
    // splits than cores — the kernel must not run at file-split
    // parallelism) + the output sort. The explode is the outer form:
    // a plain explode would let InferFiltersFromGenerate push a
    // size(kernel)>0 filter below the spread — the whole digest pass
    // evaluated twice, once at single-task parallelism (the round-9
    // bench-window killer)
    "q177_winnow_fingerprint" -> PlanCounts(1, 0, 2, 0),
    // 3 cached-fingerprint reads (df census + both join legs), never
    // a second documents scan / md5 recompute; shuffles: df-census
    // agg + pair-key agg + output sort (all keyed differently — no
    // reusable partitioning); broadcasts: hot set (reused across both
    // anti legs) + the pair join's build side
    "q178_winnow_pairs" -> PlanCounts(0, 3, 3, 2),
    // char histogram: Cpu.spread exchange (the 256-wide expansion ran
    // on ONE file split at sf1 — 8.5 s -> 1.9 s) + two keyed aggs
    // (map-side combined) + output sort
    "q179_char_entropy" -> PlanCounts(1, 0, 4, 0),
    // BM25 family: the corpus posting build (the only documents scan)
    // materializes EAGERLY into corpusTfd's localCheckpoint before the
    // audited plan exists, so the audited census shows ZERO file scans
    // — any documents scan appearing here means a leg stopped reading
    // the shared checkpoint (the q195 review regression class).
    // Shuffles: dl window + df agg + (qid,doc) score agg + TakeOrdered;
    // broadcasts: dfp + stats + query-terms relation.
    "q187_bm25" -> PlanCounts(0, 0, 4, 3),
    // 2 scans are the EMBEDDINGS legs (hybrid rerank + dense ranks);
    // the 11 broadcasts are all model-sized (per-list idcg/tot
    // scalars, mx normalizer, dfp/stats/qterms)
    "q190_retrieval_eval" -> PlanCounts(2, 0, 3, 11),
    "q194_bm25_multiquery" -> PlanCounts(0, 0, 6, 3),
    "q195_multiquery_eval" -> PlanCounts(0, 0, 9, 6),
    // lineitem + orders scans; agg + sort shuffles; the ONE broadcast
    // is the salt-replicated small side (shuffle-keyed on a cluster)
    // — the big side must never broadcast
    "q196_salted_join" -> PlanCounts(2, 0, 2, 1),
    // ONE catalog scan serves the whole 32-query batch (the point of
    // q200); query matrix + probe tables ride a sparkContext
    // broadcast inside the kernel, invisible to the plan census.
    // Shuffles: qid rank window + output sort.
    "q200_multiquery_ivf" -> PlanCounts(1, 0, 2, 0),
    // one token-catalog scan; (qid, doc) max/sum fold + rank window +
    // output sort
    "q201_maxsim" -> PlanCounts(1, 0, 3, 0),
    // 2 scans are the EMBEDDINGS legs (dense scoring + the broadcast
    // query-vector block); the documents tokenize hides inside
    // corpusTfd's eager checkpoint like the whole BM25 family.
    // Shuffles: rel agg + dense window + anti join + negs window +
    // output sort; broadcasts: qterms + qsizes + qvecs (all tiny).
    "q202_hard_negatives" -> PlanCounts(2, 0, 5, 3),
    // the two snapshot legs each scan documents once (different id
    // filters — no exchange reuse possible) projected to 32-char
    // digests BEFORE the shuffle; shuffles: both full-outer join
    // sides + the per-source agg + output sort; ZERO broadcasts (at
    // graded SF AQE could broadcast a side, but the audited no-AQE
    // plan is the honest cluster shape where both snapshots are big)
    "q204_snapshot_diff" -> PlanCounts(2, 0, 4, 0),
    // ONE embeddings scan serves the routed candidate pass (centroids
    // + query block ride a sparkContext broadcast inside the kernel,
    // invisible to the census); the documents tokenize hides inside
    // corpusTfd's eager checkpoint like the whole BM25 family.
    // Shuffles: candidate rank window + rel agg + anti join + negs
    // window + output sort; broadcasts: qterms + qsizes. One scan
    // FEWER than exact q202 — routing replaced its broadcast
    // query-vector leg.
    "q206_hard_negatives_routed" -> PlanCounts(1, 0, 5, 2),
    // media decode runs ONCE into the signature checkpoint (zero
    // file scans in the audited plan — the banding forks would
    // otherwise re-decode the corpus per fork); shuffles: bucket
    // membership agg + pair distinct (2 exchanges) + output sort;
    // the broadcast is the hot-bucket cap's anti side
    "q207_media_near_dup" -> PlanCounts(0, 0, 4, 1),
    // signatures AND the collapsed pair graph are each checkpointed
    // once (zero file scans — decode runs once, the q207 posture);
    // the visible plan is the final min-label superstep segment
    // (label agg + output sort past the loop's checkpointEvery=2
    // cut) with its broadcast of the small label frontier
    "q211_media_cluster_star" -> PlanCounts(0, 0, 2, 1),
    // the maintained SCD2 table is served via Localize (the durable
    // log is deleted after the graded read), so the census sees the
    // local relation only — the per-trigger maintenance plans run
    // inside foreachBatch, outside this census's reach (same as the
    // q209 maintainer family)
    "q212_scd2_history" -> PlanCounts(0, 0, 0, 0),
    // 4 scans derive the fixture feed's four event classes + 1 probe
    // scan (a deployment reads ONE event log); shuffles: history
    // lead-window + the single as-of union-window + output sort — the
    // point: a point-in-time join costs ONE join shuffle, not an
    // interval theta-join explosion
    "q213_pointintime_join" -> PlanCounts(5, 0, 3, 0),
    // Localize serves the maintained index read (q212 posture)
    "q214_streaming_media_index" -> PlanCounts(0, 0, 0, 0),
    // the real-decoder graded row keeps q207's exact shuffle shape:
    // encode+decode+sign in ONE checkpointed narrow pass (0 file
    // scans here), then the banded pair join — the decoder cannot
    // add a stage by construction
    "q215_ppm_decoder_neardup" -> PlanCounts(0, 0, 4, 1),
    "q218_wav_decoder_neardup" -> PlanCounts(0, 0, 4, 1),
    // both SCD2 maintainers serve through Localize after the drip
    // (the q212 posture): the graded plan is the localized result
    "q216_scd2_outoforder" -> PlanCounts(0, 0, 0, 0),
    "q217_pointintime_maintained" -> PlanCounts(0, 0, 0, 0))

  test("heavy-query plan census matches the audited budget") {
    val got = budgets.keys.toSeq.sorted.map { name =>
      name -> PlanAudit.planCounts(SparkEntry.queries(name)(noAqe, sf))
    }
    val bad = got.filter { case (n, c) => c != budgets(n) }
    assert(bad.isEmpty, "plan census drifted:\n" + got.map { case (n, c) =>
      s"    \"$n\" -> PlanCounts(${c.fileScans}, ${c.memScans}, ${c.shuffles}, ${c.broadcasts})," +
        (if (c == budgets(n)) "" else s"  // budget was ${budgets(n)}")
    }.mkString("\n"))
  }
}
