package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Physical-plan assertions — the properties that matter at 100 TB, so a
  * regression that silently de-optimizes a plan (lost pushdown, a
  * broadcast degrading to sort-merge, partial aggregation disappearing)
  * fails CI, not the cluster bill.
  */
class PlanQualitySpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // settle AQE so we assert the FINAL plan
    df.queryExecution.executedPlan.toString
  }

  test("q_filter_project pushes filters and prunes columns at the scan") {
    val plan = finalPlan("q_filter_project")
    assert(plan.contains("PushedFilters: ["), "filters must reach the parquet scan")
    assert(plan.contains("IsNotNull"), "pushed filter list should be non-trivial")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"), s"unused columns must be pruned: $readSchema")
    assert(readSchema.contains("l_orderkey"))
  }

  test("q_join_chain6 broadcasts every dimension side (no sort-merge)") {
    val plan = finalPlan("q_join_chain6")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), "dimension joins must not shuffle-sort")
  }

  test("q_agg_pricing aggregates partially before the exchange") {
    val plan = finalPlan("q_agg_pricing")
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      "map-side combine must precede the shuffle")
    // whole-stage codegen renders as "*(n)" stage markers in plan strings
    assert(plan.contains("*("), "agg pipeline must be codegen'd")
  }

  test("native dot_product stays inside whole-stage codegen") {
    val plan = finalPlan("q_dedup_embed_cosine")
    val projLine = plan.linesIterator.find(_.contains("dot_product")).getOrElse("")
    assert(projLine.contains("*("),
      s"dot_product projection must sit inside a codegen stage: $projLine")
    // the interpreted HOF formulation this replaced planned an
    // aggregate(zip_with(...)) projection outside any codegen stage
    assert(!plan.contains("zip_with"))
  }

  test("q_semi_anti plans existence joins, not inner join + distinct") {
    val plan = finalPlan("q_semi_anti")
    assert(plan.contains("LeftSemi") || plan.contains("ExistenceJoin"))
    assert(plan.contains("LeftAnti"))
  }

  test("q_exists_subquery decorrelates to broadcast semi/anti joins") {
    val plan = finalPlan("q_exists_subquery")
    assert(plan.contains("LeftSemi"), "EXISTS must become a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS must become an anti join")
    assert(!plan.contains("SortMergeJoin"),
      "small filtered build sides must broadcast, not shuffle-sort")
  }

  test("q_window_range plans a RANGE frame over exactly one shuffle") {
    val plan = finalPlan("q_window_range")
    assert(plan.contains("RangeFrame"), "frame must be value-based, not ROWS")
    // plan.toString appends the pre-AQE "Initial Plan" — count only the final
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"one shuffle on user_id expected, saw $exchanges")
  }

  test("q_decontaminate broadcasts the benchmark set; corpus side never pre-shuffles") {
    val plan = finalPlan("q_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), "benchmark probe must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the 100 TB corpus side must not shuffle before the probe")
    assert(plan.contains("partial_count"), "per-doc counts must pre-aggregate")
  }

  test("q_full_outer pre-aggregates both sides before the full outer join") {
    val plan = finalPlan("q_full_outer")
    assert(plan.contains("FullOuter"))
    assert(plan.contains("partial_sum") && plan.contains("partial_count"),
      "both aggregate branches must map-side combine before their exchange")
  }

  test("q_anomaly_zscore broadcasts the 5-row stats frame over the scan") {
    val plan = finalPlan("q_anomaly_zscore")
    assert(plan.contains("BroadcastHashJoin"),
      "the per-type stats must broadcast back over the events scan")
    assert(!plan.contains("SortMergeJoin"),
      "the 100 TB fact side must not shuffle to meet a 5-row frame")
  }

  test("q_interval_join joins on (user, bucket), not user alone") {
    val plan = finalPlan("q_interval_join")
    val joinLine = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("user_id")).getOrElse("")
    assert(joinLine.contains("lb") || joinLine.contains("rb"),
      s"time bucket must be part of the join key, bounding per-group pairs: $joinLine")
    // exactness guard (r7 anomalous band): the equi-keyed pair join and
    // nothing else — a cartesian/nested-loop fallback would be a plan
    // regression this pin makes test-visible, so a driver-bench wall-time
    // swing on this query is provably environmental
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct") &&
      !finalSection.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay equi-keyed on (user, bucket):\n$finalSection")
  }

  test("q_train_test_split: embarrassingly parallel — scan, project, ONE agg exchange") {
    val plan = finalPlan("q_train_test_split")
    val finalSection = plan.split("== Initial Plan ==").head
    // exactness guard (r7 anomalous band, 6.8x driver swing on untouched
    // code): the md5-bucket projection rides the scan inside codegen and
    // the ONLY exchange is the final group agg, partial-aggregated
    // map-side. Any extra exchange/join/window here is a plan regression;
    // a wall-time swing without one is environment, not plan.
    assert(hashExchanges(finalSection) == 1,
      s"expected the single groupBy exchange, got:\n$finalSection")
    assert(!finalSection.contains("Join") && !finalSection.contains("Window"),
      s"pure projection + aggregation, nothing else:\n$finalSection")
    assert(finalSection.contains("partial_count") || finalSection.contains("partial"),
      "split counts must combine map-side before the exchange")
    assert(finalSection.contains("*("), "the md5 split projection must be codegen'd")
  }

  test("q_funnel_stages is two aggregations, no self-joins of events") {
    val plan = finalPlan("q_funnel_stages")
    assert(!plan.contains("Join"), "funnel must not self-join the events table")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      "conditional mins must combine map-side")
  }

  test("q_markov_transitions shuffles events once (window), then tiny frames") {
    val plan = finalPlan("q_markov_transitions")
    val finalSection = plan.split("== Initial Plan ==").head
    // one exchange for the user_id window; the (from,to) count and the
    // per-source window run over a ≤25-row frame, coalesced by AQE
    val bigExchanges = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(bigExchanges === 1,
      s"events must shuffle exactly once on user_id, saw $bigExchanges")
  }

  test("q_global_sort never plans a single-partition window stage") {
    // the RangePartitioning exchange itself sits behind GlobalRank's
    // localCheckpoint (the final plan reads the checkpointed RDD), so the
    // assertable property here is the absence of the anti-pattern: no
    // Window operator anywhere (a global row_number would need one with
    // an empty partition spec = all rows through one task)
    val plan = finalPlan("q_global_sort")
    assert(!plan.contains("Window"),
      "global rank must not fall back to a single-partition window")
    assert(plan.contains("BroadcastHashJoin"),
      "partition offsets must broadcast, not shuffle the ranked table again")
  }

  test("q_topk_pruned plans the custom PartialTopK exec below the window") {
    val plan = finalPlan("q_topk_pruned")
    assert(plan.contains("PartialTopK"),
      "the strategy-injected hash-heap prune must be in the physical plan")
    // the prune feeds the exchange: PartialTopK must appear below the
    // hashpartitioning exchange in the tree (deeper = later in the string)
    val pruneAt = plan.indexOf("PartialTopK")
    val exchangeAt = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeAt >= 0 && exchangeAt < pruneAt,
      "prune must sit below (after, in tree print) the shuffle it shrinks")
  }

  test("q_lm_quality broadcasts the trained model; tokens shuffle for training only") {
    val plan = finalPlan("q_lm_quality")
    assert(plan.contains("BroadcastHashJoin"),
      "the vocabulary-sized model must broadcast back over the token stream")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      "vocabulary counts must map-side combine")
  }

  test("q_weighted_sample is a scan + TakeOrdered, no shuffle of the data") {
    val plan = finalPlan("q_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k by priority must plan as TakeOrdered (per-task heaps), not a sort")
    assert(!plan.contains("Exchange hashpartitioning"),
      "priority sampling must not shuffle the table")
  }

  test("q_asof_join merges timelines — no pair-exploding join, one shuffle") {
    val plan = finalPlan("q_asof_join")
    assert(!plan.contains("Join"),
      "as-of must not equi-join events×orders (quadratic intermediate on a hot user)")
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(exchanges === 1, s"one shuffle on user_id expected, saw $exchanges")
  }

  test("q_set_ops_all aggregates orders once; second branch reuses the exchange") {
    val plan = finalPlan("q_set_ops_all")
    assert(!plan.contains("Join"))
    val finalSection = plan.split("== Initial Plan ==").head
    val fresh = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(fresh === 1, s"orders must shuffle exactly once, saw $fresh")
    assert(finalSection.contains("ReusedExchange"),
      "intersect/except branches must share the single aggregation exchange")
  }

  test("q_heavy_hitters probes the sketch on executors, no driver key dictionary") {
    val plan = finalPlan("q_heavy_hitters")
    assert(plan.contains("LeftSemi"), "candidate pruning must be a semi join")
    assert(plan.contains("BroadcastHashJoin"), "the few candidates must broadcast")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.linesIterator
        .exists(l => l.contains("Filter") && l.contains("UDF")),
      "the CMS probe must run as an executor-side filter, never a collected isin literal")
  }

  test("q_profile_columns profiles every column in ONE scan and one aggregation") {
    val plan = finalPlan("q_profile_columns")
    val finalSection = plan.split("== Initial Plan ==").head
    val scans = finalSection.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"multi-column profile must read the table once, saw $scans scans")
    assert(finalSection.contains("partial_min") || finalSection.contains("partial"),
      "stats must combine map-side")
  }

  test("q_pack_sequences computes its global prefix without a single-partition window") {
    val plan = finalPlan("q_pack_sequences")
    val winLine = plan.linesIterator.find(_.contains("windowspecdefinition")).getOrElse("")
    assert(winLine.contains("_pid"),
      s"the running token offset must window per partition id, never globally: $winLine")
    assert(plan.contains("BroadcastHashJoin"),
      "per-partition offsets must broadcast back, not shuffle the corpus again")
  }

  test("q_pareto_front windows only within partitions (no global window)") {
    val plan = finalPlan("q_pareto_front")
    // the running max is partitioned by _pid — a window with a partition
    // spec — never an empty-partition (single task) window over all rows
    val winLine = plan.linesIterator.find(_.contains("windowspecdefinition")).getOrElse("")
    assert(winLine.contains("_pid"),
      s"running max must be partitioned by the range-partition id: $winLine")
    assert(plan.contains("BroadcastHashJoin"),
      "per-partition prefix maxes must broadcast")
  }

  test("q_bm25 broadcasts the 3-row term stats; token stream combines map-side") {
    val plan = finalPlan("q_bm25")
    assert(plan.contains("BroadcastHashJoin"),
      "df/avgl/N frames must broadcast over the corpus side")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      "tf/df counts must map-side combine")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized shuffle join to meet query-term stats")
  }

  test("q_vocab_coverage broadcasts the trained vocabulary over the token stream") {
    val plan = finalPlan("q_vocab_coverage")
    assert(plan.contains("BroadcastHashJoin"), "vocab probe must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus token stream must not shuffle to meet a 256-row vocab")
  }

  test("q_bootstrap_ci collapses the replicate explode before its only exchange") {
    val plan = finalPlan("q_bootstrap_ci")
    assert(!plan.contains("Join"), "replicates come from explode, never a join")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      "per-replica means must combine map-side (64 buffers/partition)")
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(exchanges === 1, s"one 64-row-per-partition shuffle expected, saw $exchanges")
  }

  test("q_not_in_nulls plans a null-aware anti join, not a nested loop over events") {
    val plan = finalPlan("q_not_in_nulls")
    assert(plan.contains("LeftAnti"), "NOT IN must become an anti join")
    assert(!plan.contains("CartesianProduct"),
      "null-aware probe must not degenerate to a cartesian plan")
  }

  test("q_sql_q5 broadcasts the dimension chain; no cartesian anywhere") {
    val plan = finalPlan("q_sql_q5")
    assert(plan.contains("BroadcastHashJoin"),
      "region→nation→supplier must collapse into broadcast joins")
    assert(!plan.contains("CartesianProduct"))
    val finalSection = plan.split("== Initial Plan ==").head
    // the 6-way join must not shuffle a fact table more than once: at most
    // the orders⋈lineitem equi-join pair (AQE typically broadcasts orders
    // after the date filter, leaving lineitem un-shuffled entirely)
    val factExchanges = finalSection.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("o_orderkey") || l.contains("l_orderkey")))
    assert(factExchanges <= 2, s"fact tables over-shuffled: $factExchanges exchanges")
  }

  test("q_sql_q1 is one pushed-down scan + one exchange") {
    val plan = finalPlan("q_sql_q1")
    assert(plan.contains("PushedFilters: ["), "the shipdate filter must reach parquet")
    assert(plan.contains("partial"), "the wide agg must map-side combine into 6 groups")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"Q1 touches 7 of 11 lineitem columns; keys must prune: $readSchema")
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(exchanges === 1, s"one groupBy exchange expected, saw $exchanges")
  }

  test("q_sql_q4 decorrelates EXISTS to a semi join on the order key") {
    val plan = finalPlan("q_sql_q4")
    assert(plan.contains("LeftSemi"), "EXISTS must become a semi join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "the correlated date predicate must ride the equi-join, not a loop join")
  }

  test("q_sql_q7 keeps both nation broadcasts; no cartesian under the OR pair filter") {
    val plan = finalPlan("q_sql_q7")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(plan.contains("BroadcastHashJoin"), "both nation dims must broadcast")
  }

  test("q_sql_q6 is a joinless pushed-down scan over 4 pruned columns") {
    val plan = finalPlan("q_sql_q6")
    assert(plan.contains("PushedFilters: ["), "date+discount+quantity must reach parquet")
    assert(!plan.contains("Join"), "Q6 has no join")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"Q6 touches 4 of 11 lineitem columns; the rest must prune: $readSchema")
  }

  test("q_sql_q2 decorrelates the scalar min to an aggregate join, no loop join") {
    val plan = finalPlan("q_sql_q2")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "per-part min acctbal must plan as aggregate + equi-join, not a re-executed subquery")
    assert(plan.contains("min("), "the decorrelated aggregate must survive")
  }

  test("q_sql_q17 decorrelates the per-part AVG threshold to one aggregate join") {
    val plan = finalPlan("q_sql_q17")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "0.2*avg(l_quantity) per part must not become a per-row subquery loop")
    assert(plan.contains("avg("), "the decorrelated aggregate must survive")
  }

  test("q_sql_q21 plans the double correlation as one semi and one anti join") {
    val plan = finalPlan("q_sql_q21")
    assert(plan.contains("LeftSemi"), "EXISTS(other supplier) must be a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS(other late supplier) must be an anti join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "both correlations carry an l_orderkey equality; a loop join is the 100 TB killer")
  }

  test("q_sql_q20 chains the nested INs as semi joins, never materializing id lists") {
    val plan = finalPlan("q_sql_q20")
    assert(plan.contains("LeftSemi"), "IN-subqueries must become semi joins")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("q_sql_q19 extracts the shared equi-key from the disjunction") {
    val plan = finalPlan("q_sql_q19")
    // all three OR arms share p_partkey = l_partkey: the planner must
    // join on it (broadcast or hash) and keep the per-arm ranges as a
    // pushed/post filter — a nested-loop fallback is the 100 TB killer
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"disjunctive predicate fell off the equi-join:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters: [") && l.contains("Or(")),
      "the OR-of-ranges must push into the scans")
  }

  test("q_rfm_features is one aggregation pass; the anchor date broadcasts") {
    val plan = finalPlan("q_rfm_features")
    assert(plan.contains("partial_max") || plan.contains("partial"),
      "RFM aggregates must map-side combine")
    assert(!plan.contains("SortMergeJoin"),
      "the 1-row anchor must broadcast, never shuffle the per-customer frame")
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(exchanges === 1, s"one o_custkey shuffle expected, saw $exchanges")
  }

  test("q_kl_divergence moves only vocabulary-sized frames after the token aggs") {
    val plan = finalPlan("q_kl_divergence")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      "both slices' token counts must map-side combine")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 drift drivers must be a TakeOrdered heap, not a global sort")
  }

  test("q_winsorize clamp joins a broadcast bounds frame over the scan") {
    val plan = finalPlan("q_winsorize")
    assert(plan.contains("BroadcastHashJoin"),
      "the 3-row bisected bounds must broadcast over the orders scan")
    assert(!plan.contains("Window"),
      "the graded plan must be the bisection path — no per-group sort window")
  }

  test("q_embed_pca projection is a zero-shuffle scan once the model is trained") {
    val plan = finalPlan("q_embed_pca")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("Exchange"),
      "projecting onto a frozen component must be scan + project, no exchange")
    val projLine = finalSection.linesIterator.find(_.contains("dot_product")).getOrElse("")
    assert(projLine.contains("*("),
      s"the native dot kernel must sit inside whole-stage codegen: $projLine")
  }

  test("q_quantiles_by_key: windows and aggregation share ONE key exchange") {
    val plan = finalPlan("q_quantiles_by_key")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "window sort, both windows and the final agg must reuse the single o_custkey partitioning")
    assert(finalSection.contains("partial_max"),
      "rank selection must partial-aggregate before any exchange it meets")
    val readSchema = finalSection.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment") && readSchema.contains("o_custkey"),
      s"scan must read only the key and value columns: $readSchema")
  }

  test("q_source_cap_sample: one shuffle, md5 priority never leaves the window stage") {
    val plan = finalPlan("q_source_cap_sample")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "the per-source cap is exactly one hash exchange on source")
    assert(finalSection.contains("row_number"))
  }

  test("q_negative_sample goes through PartialTopK with a broadcast query side") {
    val plan = finalPlan("q_negative_sample")
    assert(plan.contains("PartialTopK"),
      "per-query selection must use the map-side-pruning physical operator, not a bare window")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the tiny query side must broadcast over the corpus scan")
  }

  test("q_asof_nearest: both direction carries share ONE timeline-merge exchange") {
    val plan = finalPlan("q_asof_nearest")
    val finalSection = plan.split("== Initial Plan ==").head
    // the union of orders+events shuffles once on user_id; both window
    // carries and the distance projection ride that partitioning — a
    // pair-exploding join (the oracle's formulation) must never appear
    assert(finalSection.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "nearest as-of is one shuffle: backward and forward carries share it")
    assert(!finalSection.contains("SortMergeJoin") && !finalSection.contains("BroadcastHashJoin"),
      "no pair-exploding join — the timeline merge IS the plan")
  }

  test("q_weighted_sample_by_key goes through PartialTopK") {
    val plan = finalPlan("q_weighted_sample_by_key")
    assert(plan.contains("PartialTopK"),
      "per-key priority sampling must map-side prune, not window over the table")
  }

  test("q_multimodal_resize synthesis stays inside whole-stage codegen") {
    val plan = finalPlan("q_multimodal_resize")
    // the P6 synthesis (repeat + substring) must be codegen'd row work in
    // the pre-resize projection — the interpreted HOF formulation
    // (transform/lambda) measured 19x slower and must not come back
    assert(!plan.contains("lambdafunction"),
      "cyclic pixel synthesis must not use interpreted higher-order functions")
  }

  // ReusedExchange nodes repeat the reused exchange's description, but a
  // reused exchange is exactly NOT another shuffle — don't count it
  private def hashExchanges(planSection: String): Int =
    planSection.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))

  test("q_cdc_apply: one log shuffle serves both windows; tombstones broadcast") {
    val plan = finalPlan("q_cdc_apply")
    val finalSection = plan.split("== Initial Plan ==").head
    // exactly two key exchanges exist: the tombstone-frontier agg (tiny)
    // and THE change-log shuffle — both IGNORE NULLS last_value windows
    // and the keep-latest row_number must ride the latter, never add a
    // third exchange or a per-column self-join
    assert(hashExchanges(finalSection) == 2,
      s"expected tombstone agg + one log shuffle, got:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"),
      "the tombstone frontier must broadcast over the log")
  }

  test("q_temperature_mix: quota math on the counts frame; one corpus window") {
    val plan = finalPlan("q_temperature_mix")
    val finalSection = plan.split("== Initial Plan ==").head
    // source-count agg + the per-source rank window: two key exchanges;
    // the quota join must broadcast (quota frame is ~|sources| rows)
    assert(hashExchanges(finalSection) == 2,
      s"expected counts agg + rank window only, got:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"),
      "quotas must broadcast-join onto the ranked corpus")
    // the total-weight branch must ride the counts exchange, not re-scan
    assert(finalSection.contains("ReusedExchange"),
      "total weight must reuse the counts shuffle")
    // and the global total must NOT be a partitionBy()-less window (its
    // single-partition WindowExec warning would pollute every bench log)
    assert(!finalSection.contains("Window [sum("),
      "total weight must be an aggregate, not a global window")
  }

  // ------------------------------------------------------------------
  // r8 anomalous-band pins (CPU-bound queries that swung 2-6x in the
  // driver record with ~zero gc/shuffle/spill and untouched code): each
  // pin makes the healthy plan shape test-visible, so a future wall-time
  // swing WITHOUT a failing pin is provably environmental — the same
  // adjudication the r7 pins bought q_interval_join/q_train_test_split.
  // ------------------------------------------------------------------

  test("q_corpus_clean: regex metrics ride the scan; ONE fingerprint exchange") {
    val plan = finalPlan("q_corpus_clean")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(hashExchanges(finalSection) == 1,
      s"scan -> metrics projection -> one md5-fp shuffle, got:\n$finalSection")
    assert(!finalSection.contains("Join"),
      "dedup-keep-first is a window over the fp shuffle, never a self-join")
    assert(finalSection.contains("*("),
      "the regex/length metrics projection must be codegen'd")
  }

  test("q_text_winnow: zero exchanges — the winnow kernel is scan-side codegen") {
    val plan = finalPlan("q_text_winnow")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("Exchange"),
      s"fingerprinting is scan + project + generate, no shuffle:\n$finalSection")
    assert(!finalSection.contains("lambdafunction"),
      "the winnow kernel must be the native expression, not interpreted HOFs")
  }

  test("q_filter_funnel: one tiny agg exchange; cascade counts combine map-side") {
    val plan = finalPlan("q_filter_funnel")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(hashExchanges(finalSection) <= 1,
      s"the funnel is one conditional-count aggregation, got:\n$finalSection")
    assert(!finalSection.contains("Join"),
      "stage counts must not self-join the documents table")
    assert(finalSection.contains("partial_count") || finalSection.contains("partial"),
      "the cascade's conditional counts must map-side combine")
  }

  test("q_tfidf: totals broadcast; token aggs bounded; no corpus-sized sort-merge") {
    val plan = finalPlan("q_tfidf")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"),
      "the df/N totals must broadcast back over the tf frame")
    assert(!finalSection.contains("SortMergeJoin"),
      "no shuffle join of token streams to meet vocabulary-sized frames")
    assert(hashExchanges(finalSection) <= 5,
      s"tf/df/totals aggregations only — extra exchanges are a regression:\n$finalSection")
    assert(finalSection.contains("partial_count") || finalSection.contains("partial"),
      "token counts must map-side combine before their exchanges")
  }

  test("q_boilerplate_strip: gram frequency partial-aggregates, no range join") {
    val plan = finalPlan("q_boilerplate_strip")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      "the gram-document frequency agg must map-side combine")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "covered positions come from exploding occurrences — never a range join")
  }

  test("q_catalog_spj: the fact⋈fact join runs storage-partitioned, zero exchange") {
    val plan = finalPlan("q_catalog_spj")
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.contains("GraftKeyGroupedScan"),
      s"both sides must report key-grouped partitioning:\n$finalSection")
    assert(finalSection.contains("SortMergeJoin"),
      "the co-partitioned join is a sort-merge over aligned partitions")
    assert(!finalSection.contains("Exchange"),
      s"a storage-partitioned join must not shuffle either side:\n$finalSection")
  }
}
