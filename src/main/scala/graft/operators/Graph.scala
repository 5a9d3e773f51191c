package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Companion to
  * [[ConnectedComponents]] (which owns the near-dup clustering path): this
  * file holds the rank/centrality side.
  *
  * PageRank here is the classic synchronous power iteration:
  *
  *   r₀(v)    = 1/N
  *   rₖ₊₁(v) = (1−d)/N + d · Σ_{(u,v)∈E} rₖ(u)/outdeg(u)
  *
  * expressed per iteration as ONE join + ONE aggregation — the contribution
  * join shuffles on src, the gather on dst; with the edge table
  * pre-partitioned by src the join side of every iteration reuses the same
  * exchange. Iteration state is a tiny (id, rank) frame; each step is
  * `localCheckpoint`ed so the lineage (and the task closure) stays O(1) in
  * the iteration count instead of growing a plan tree per step — the thing
  * that kills driver memory at iteration 30 on a real cluster — and the
  * previous step's cache is released eagerly.
  *
  * Ranks are rounded to 12 decimals each iteration: the per-node
  * contribution sum is FP-order-dependent, and re-rounding at every step
  * keeps the engines (and any external re-implementation, e.g. the DuckDB
  * oracle) bit-identical throughout instead of letting ulp noise compound.
  */
object Graph {

  /** Synchronous PageRank over a directed edge list (`src`, `dst`).
    * Callers wanting undirected semantics pass both edge directions.
    * Every node must appear as a `src` (undirected graphs satisfy this
    * trivially); otherwise dangling mass is dropped, matching the oracle.
    *
    * `tol > 0` adds L1-delta early termination: the loop stops once
    * Σ|rₖ₊₁ − rₖ| < tol. The delta is one tiny aggregation over the two
    * O(N) rank frames per iteration — noise next to the contribution
    * join — but it requires materializing every step (the delta action
    * would otherwise recompute the un-checkpointed plan), so the default
    * tol = 0 keeps the sparse every-4th checkpoint cadence and a
    * byte-identical plan for fixed-iteration callers.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      tol: Double = 0.0): DataFrame =
    pageRankIter(edges, iters, damping, tol)._1

  /** [[pageRank]] plus the number of iterations actually executed (for
    * convergence assertions; early-stops when `tol > 0`).
    */
  /** Storage for loop-lived frames: serialized blocks cost one
    * deserialization per read but shrink the live heap several-fold vs
    * deserialized row caches — the GC trade an iterative loop wants
    * (the driver bench attributed ~6.5 s of GC to the deserialized-cache
    * variant of this loop inside a 5.7 s wall).
    */
  private val IterStorage =
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

  /** Eagerly release a localCheckpoint'd frame's persisted blocks. A
    * checkpoint plans as a LogicalRDD leaf over a persisted RDD, and that
    * RDD's blocks stay in the block manager until driver GC notices the
    * frame is unreachable — across a rank iteration that's every
    * superseded step accumulating as live-ish heap. Unpersisting the leaf
    * RDDs directly frees each step the moment its successor materializes.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  def pageRankIter(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      tol: Double = 0.0): (DataFrame, Int) = {
    // cache the edge list FIRST: nodes, degrees and the adjacency all
    // derive from it, and without the cache each one re-executes the
    // caller's (possibly join-heavy) edge construction pipeline.
    // EXCEPT when every leaf of the edge plan already reads a cache the
    // caller installed (q_pagerank persists the directed half and unions
    // both directions): then e has exactly two consumers (deg, adj) and
    // re-running a narrow projection over cached blocks twice is cheaper
    // than writing a second full copy of the edge list through the block
    // manager — one less O(E) cache materialization and that much less
    // storage churn per call (guide §5: cache only when recomputing costs
    // more than the memory pressure the cache creates).
    val leaves = edges.queryExecution.optimizedPlan.collectLeaves()
    val inputCached = leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (inputCached) e0 else e0.persist(IterStorage)
    // every node appears as a src (the documented contract, trivially true
    // for undirected input) — so the degree aggregate's key set IS the
    // node set: one shuffle of the edge list yields degrees AND nodes,
    // where a separate distinct would re-shuffle the full edge list for
    // information the groupBy already computed.
    val deg = e.groupBy("src").agg(count(lit(1)).as("d")).persist(IterStorage)
    val nodes = deg.select(col("src").as("id"))
    val n = deg.count()
    // adjacency with out-degree attached ONCE and cached. The groupBy
    // leaves it hash-partitioned on src — the same key every iteration's
    // contribution join uses — so the edge side never re-shuffles.
    val adj = e.join(deg, "src").persist(IterStorage)

    // checkpoint cadence: lineage must stay O(1) in ITERS on a long run,
    // but each localCheckpoint is a full materialization — at 3-5
    // iterations checkpointing every step just multiplies job count. Every
    // 4th step (and always the last, so the returned frame is computed
    // work, not a pending 4-deep plan) keeps both properties.
    var ranks = nodes.withColumn("r", lit(1.0) / lit(n.toDouble))
      .localCheckpoint(true, IterStorage)
    // the most recent checkpoint whose blocks are still held — freed the
    // moment its successor checkpoint has materialized (localCheckpoint
    // is eager), so block-manager state stays O(1) in the iteration count
    var lastCkpt = ranks
    var executed = 0
    var converged = false
    for (i <- 0 until iters if !converged) {
      val contribs = adj
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("r") / col("d")).as("s"))
      // NO broadcast hint on the gather: `contribs` is one row per node
      // with in-edges — O(N), i.e. tiny at sf0.1 but a guaranteed OOM on a
      // billion-node graph. Both sides arrive hash-partitioned on id
      // (nodes from its distinct, contribs from its groupBy), so the join
      // is exchange-free co-partitioned work; AQE may still choose to
      // broadcast when the frame really is small, which is the right call
      // at BOTH scales — made at runtime, not hard-coded.
      var next = nodes
        .join(contribs, Seq("id"), "left")
        .select(
          col("id"),
          round(
            lit((1.0 - damping) / n.toDouble) +
              lit(damping) * coalesce(col("s"), lit(0.0)),
            12).as("r"))
      val ckptNow = tol > 0.0 || i % 4 == 3 || i == iters - 1
      if (ckptNow) next = next.localCheckpoint(true, IterStorage)
      executed += 1
      if (tol > 0.0) {
        val delta = next
          .join(ranks.withColumnRenamed("r", "prev"), "id")
          .agg(sum(abs(col("r") - col("prev"))).as("d1"))
          .head().getDouble(0)
        if (delta < tol) converged = true
      }
      ranks = next
      if (ckptNow) {
        // next is materialized and self-contained (and the tol delta, the
        // last reader of the old step, has run) — release the old blocks
        freeCheckpoint(lastCkpt)
        lastCkpt = next
      }
    }
    // teardown is BLOCKING: the result is already checkpointed, so the
    // wait is a local block-manager removal (milliseconds) — while a
    // non-blocking teardown under a contended scheduler leaves edge-sized
    // block sets queued for removal across the NEXT queries' allocations
    // (the round-12 official record's 73 s GC storm fed on exactly that
    // backlog). Mid-loop frees stay async: their backlog is bounded by
    // the checkpoint cadence, and blocking there would serialize rounds.
    adj.unpersist(blocking = true)
    deg.unpersist(blocking = true)
    if (!inputCached) e.unpersist(blocking = true)
    (ranks, executed)
  }

  /** Per-node triangle counts over an undirected edge list (`a`, `b`;
    * either orientation, self-loops and duplicates tolerated).
    *
    * Classic compact-forward: orient every edge from the lower-(degree,id)
    * endpoint to the higher, so each triangle {a,b,c} materializes exactly
    * one wedge (a→b, a→c with rank(b)<rank(c)) closed by exactly one
    * stored edge b→c. Orienting by DEGREE (id as tie-break) is the part
    * that scales: a skewed graph's hub node has huge in-rank but tiny
    * out-rank, so wedge counts are Σ min-degree-bounded — O(E^1.5) total
    * work instead of Σ deg² blowing up on the hottest key. Both joins are
    * equi-joins on edge keys (shuffle or broadcast as AQE chooses); the
    * (deg,id) comparison rides along as a post-join filter, never a join
    * condition, so no BNL sneaks in.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: low id first, dedup, drop self-loops
    val und = edges
      .select(
        least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      // serialized blocks (the pageRank discipline): und/deg/oriented are
      // probed by multiple consumers each, and deserialized MEMORY_ONLY
      // rows would sit as old-gen object graphs for the whole wedge phase
      .persist(IterStorage)
    // persisted: deg feeds BOTH orientation joins and the final densify —
    // un-cached, each consumer re-runs the union + aggregation (three
    // identical exchanges, three driver stage round-trips under AQE)
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("d"))
      .persist(IterStorage)
    // orient u→v iff (deg,id)(u) < (deg,id)(v)
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
    val oriented = withDeg
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .persist(IterStorage)
    // wedges around the lowest-rank corner; rank order on the two tips
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.s") === col("e2.s"))
      .filter(
        col("e1.dt") < col("e2.dt") ||
          (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t")))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    // close the wedge with the stored b→c edge (b outranks nothing: it is
    // the middle rank, so the closing edge is oriented b→c by construction)
    val tris = wedges.join(
      oriented.select(col("s").as("b"), col("t").as("c")),
      Seq("b", "c"))
    // densify INSIDE the aggregation: every node rides in with weight 0,
    // so triangle-free nodes appear without a post-aggregation left join
    // (one less exchange + broadcast stage round-trip)
    val out = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"), lit(1L).as("w"))
      .unionByName(deg.select(col("id"), lit(0L).as("w")))
      .groupBy("id")
      .agg(sum(col("w")).as("tri"))
    val materialized = out.localCheckpoint()
    // blocking teardown, same rationale as [[pageRankIter]]'s: bound the
    // heap high-water against a slow scheduler's unpersist backlog
    oriented.unpersist(blocking = true)
    deg.unpersist(blocking = true)
    und.unpersist(blocking = true)
    materialized
  }

  /** Multi-source BFS shortest hop-distance over a directed edge list
    * (`src`, `dst`). Returns (id, dist) for every REACHED node (sources at
    * 0); unreachable nodes are absent. Callers wanting undirected
    * semantics pass both edge directions.
    *
    * Frontier iteration, not dense relaxation: round k joins only the
    * k-hop frontier against the adjacency, so total join work across the
    * run is O(Σ frontier-adjacent edges) ≤ O(E) for BFS (each node enters
    * the frontier at most once) — the property that makes this viable when
    * the graph is 100 TB but the reachable set per round is not.
    *
    * Execution shape — RDD iteration after ONE declarative pass (the
    * same split [[graft.operators.Bpe]] uses, and for the same reason):
    * a DataFrame formulation pays Catalyst planning + whole-stage
    * codegen compilation + an AQE stage round-trip per join PER ROUND —
    * ~4 driver-blocking stage-jobs every round regardless of data size,
    * which is exactly the profile a contended driver punishes (the
    * official record had this loop at 14.9 s with 0.9 MB of shuffle and
    * zero GC). Here the edge list is keyed and hash-partitioned ONCE;
    * each round's frontier join is then NARROW on the edge side (no
    * re-shuffle, no broadcast, no re-plan — a property the DataFrame
    * version could only rediscover via a per-round AQE broadcast), the
    * only shuffle is the candidate set (O(frontier-adjacent edges)),
    * and the reached set is a partitioner-aware union (nParts tasks
    * regardless of round count) probed by a narrow `subtractByKey`.
    * Driver-blocking actions: ONE `count` per 4-round interval — rounds
    * in between just extend the lazy chain, and the interval count
    * materializes (and caches) every round's frontier in a single job.
    * An empty frontier stays empty, so probing the interval's LAST
    * frontier is an exact termination test; the trade is up to 3
    * zero-row rounds after exhaustion, cheaper than 3 driver jobs.
    */
  def shortestPaths(
      edges: DataFrame,
      sources: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val part = new org.apache.spark.HashPartitioner(nParts)
    val idType = edges.schema("src").dataType
    // the one corpus-sized pass: project, key by src, partition, cache
    // (serialized blocks — the [[IterStorage]] GC discipline)
    val e = edges.select(col("src"), col("dst")).rdd
      .map(r => (r.get(0), r.get(1)))
      .partitionBy(part)
      .persist(IterStorage)
    var frontier = sources.select(col("id").cast(idType)).distinct().rdd
      .map(r => (r.get(0), 0L))
      .partitionBy(part)
      .persist(IterStorage)
    // reached set: per-round frontiers all share `part`, so the union is
    // partitioner-aware — nParts tasks however deep it grows, and every
    // frontier stays cached (it IS the result, not superseded state)
    var seen = frontier
    var cached: List[org.apache.spark.rdd.RDD[_]] = List(frontier)
    var round = 0
    var exhausted = false
    while (round < maxRounds && !exhausted) {
      val candidates = e.join(frontier) // co-partitioned: narrow on both sides
        .map { case (_, (dst, d)) => (dst, d + 1L) }
        .reduceByKey(part, math.min(_: Long, _: Long)) // map-side combined; O(frontier-adjacent)
      // BFS invariant: a node reached in round k can never improve later,
      // so "not yet reached" is the full improvement test — a narrow
      // subtract, no dist comparison
      frontier = candidates.subtractByKey(seen, part).persist(IterStorage)
      cached ::= frontier
      seen = seen.union(frontier)
      round += 1
      if (round % 4 == 0 || round == maxRounds)
        // the interval's ONE driver-blocking job: counting the newest
        // frontier materializes (and caches) the whole lazy chain behind it
        exhausted = frontier.count() == 0L
    }
    // hand back a self-contained DataFrame: the eager checkpoint reads the
    // cached frontier blocks once, after which the loop's RDDs can drop
    // without the caller's later actions re-running the search
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType, nullable = true),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val out = spark.createDataFrame(
      seen.map { case (id, d) => org.apache.spark.sql.Row(id, d) }, schema)
      .localCheckpoint()
    // blocking teardown, same rationale as [[pageRankIter]]'s: bound the
    // heap high-water against a slow scheduler's unpersist backlog
    cached.foreach(_.unpersist(blocking = true))
    e.unpersist(blocking = true)
    out
  }

  /** k-core decomposition by iterative peeling: repeatedly delete every
    * node whose degree in the REMAINING subgraph is < k, until none is —
    * the classic cohesive-subgraph / spam-farm detector. Returns the
    * surviving nodes with their in-core degree: `(id, core_deg)`.
    *
    * `edges` is treated as undirected: callers pass the symmetric edge
    * set (both directions present), self-loops and multi-edges already
    * resolved to taste — degree here is COUNT of incident edge rows, so a
    * distinct symmetric set gives simple-graph degree.
    *
    * Scale shape: each round is one degree aggregation (shuffle on src,
    * partial-aggregated map-side) plus two anti-joins of the edge set
    * against the DELETED node set. The deleted set per round is the
    * peeling frontier — typically small and broadcast by AQE; the edge
    * frame shrinks monotonically and is `localCheckpoint`ed per round so
    * lineage stays O(1) in rounds (the [[pageRank]] discipline). Rounds
    * are bounded by the degeneracy ordering depth — O(log n) on
    * power-law graphs in practice; `maxRounds` is a safety valve and the
    * return includes no partial peel: hitting it means "not converged",
    * callers needing certainty check [[kCoreRounds]].
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame =
    kCoreIter(edges, k, maxRounds)._1

  /** [[kCore]] + the number of peel rounds actually run (spec hook). */
  def kCoreIter(edges: DataFrame, k: Int, maxRounds: Int): (DataFrame, Int) = {
    require(k >= 1, s"k-core wants k >= 1, got $k")
    // lazy checkpoints: the degree aggregation's map stage scans every
    // partition of e, so the emptiness probe below materializes the
    // round's checkpoint blocks in the same action — one job per peel
    // round instead of checkpoint-job + probe-job
    var e = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    var round = 0
    var done = false
    // each round's shrunken edge frame supersedes its predecessor the
    // moment the emptiness probe has materialized it — free the old
    // blocks then (the [[pageRank]] GC discipline), not at loop exit
    var prevE: Option[DataFrame] = None
    var deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
    while (round < maxRounds && !done) {
      val doomed = deg.filter(col("core_deg") < k).select(col("id"))
      // this action materializes the CURRENT e's checkpoint blocks (deg
      // reads e), so the predecessor's blocks are now garbage
      if (doomed.isEmpty) done = true
      prevE.foreach(freeCheckpoint)
      prevE = None
      if (!done) {
        prevE = Some(e)
        e = e
          .join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .localCheckpoint(eager = false)
        deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
        round += 1
      }
    }
    (deg, round)
  }
}
