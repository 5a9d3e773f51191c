package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the clustering step
  * that turns near-duplicate PAIRS (from [[SetSimJoin]] / [[MinHash]] LSH)
  * into dedup CLUSTERS, so a corpus keeps exactly one canonical document
  * per group of mutual near-dups.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * shuffle-native formulation:
  *
  *   - '''large-star''': every node connects its strictly-larger neighbors
  *     to its smallest neighbor (or itself if smaller);
  *   - '''small-star''': every node connects its smaller-or-equal neighbors
  *     (and itself) to the group minimum.
  *
  * Each operation is ONE window (`min(v) over (partition by u)`) — the
  * group minimum computed in the same exchange that co-locates the group,
  * where the groupBy+re-join formulation paid a second pass over the edge
  * set (aggregate exchange, then join the aggregate back, a broadcast
  * build per star at small scale and a full extra edge exchange at large).
  * No `collect_set`, so a 100M-degree hub node never materializes its
  * neighbor list in one task; the per-round shuffle volume is O(|E|).
  * The edge set converges to per-component stars rooted at the component
  * minimum in O(log n) rounds (each round at least halves the height of the
  * implicit forest), vs O(diameter) for naive min-label propagation — the
  * difference between 8 rounds and 10,000 on a 100 TB pair graph with long
  * chains.
  *
  * Convergence is detected from a 2-row aggregate per round (edge count +
  * order-insensitive hash), not by comparing materialized edge sets. Each
  * round runs exactly ONE Spark action: the edge frame is lazily
  * `localCheckpoint`ed and the signature aggregation is what materializes
  * it, storing the round's blocks and truncating lineage in the same job a
  * convergence check needs anyway. (An eager checkpoint would double the
  * job count per round — the overhead that made this loop's wall time
  * hyper-sensitive to a contended host.) Local checkpoints are not
  * fault-tolerant to executor loss; on a real cluster a lost block fails
  * the round and the caller retries — the standard trade for not writing
  * O(E) to the reliable store every round.
  */
object ConnectedComponents {

  /** edges(srcCol, dstCol): undirected pair graph over long ids (self loops
    * and duplicate/reversed pairs tolerated). Returns (id, component) for
    * every id that appears in `edges`, component = min id reachable.
    */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val cols = edges.columns
    require(cols.length >= 2, "edges needs (src, dst) columns")
    var e = edges
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)

    var converged = false
    var round = 0
    // the signature aggregation doubles as the checkpoint materializer:
    // its full scan computes every partition, so the lazy checkpoint's
    // blocks are stored by this same action — one job per round, not two
    var prev = signature(e)
    while (!converged && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val sig = signature(e)
      converged = sig == prev
      prev = sig
      round += 1
    }

    // At the star fixpoint every edge is (child, root) with root < child;
    // the root itself has no outgoing edge, so add its identity row.
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .groupBy("id")
      .agg(min("component").as("component"))
  }

  /** Components for ALL vertices: ids absent from the pair graph become
    * singleton components of themselves (the common dedup case — most
    * documents have no near-duplicate).
    */
  def withVertices(vertices: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val labels = run(edges)
    vertices
      .select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("component"), col("id")).as("component"))
  }

  /** large-star: for each node u, connect every neighbor v > u to
    * m = min(N(u) ∪ {u}). Keeps all inter-component connectivity (every
    * dropped edge is re-derivable through m) while pointing large nodes at
    * ever-smaller ones.
    *
    * Output is NOT deduplicated: as a set it equals the classic
    * formulation (min over a group ignores multiplicity, so input
    * duplicates never change what is emitted), and the loop's only
    * consumer is
    * [[smallStar]], whose own final `distinct` canonicalizes the round —
    * deduplicating here would buy nothing but one more O(|E|) exchange
    * per round.
    */
  def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val w = Window.partitionBy("u")
    sym
      .withColumn("m", least(col("u"), min(col("v")).over(w)))
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** small-star: orient every edge toward the smaller endpoint, then for
    * each node u connect its smaller neighbors (and u itself) to the group
    * minimum.
    *
    * The group-minimum row itself (exactly one per group: `v == m`, the
    * input is set-distinct per (u,v) after the final `distinct`) doubles
    * as the carrier of the identity edge (u,m), so every input row emits
    * exactly one output row — no separate `mins` frame to union back.
    */
  def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val w = Window.partitionBy("u")
    oriented
      .withColumn("m", min(col("v")).over(w))
      .select(
        when(col("v") === col("m"), col("u")).otherwise(col("v")).as("u"),
        col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Order-insensitive convergence signature: (|E|, hash sum). Hashes are
    * folded to 31 bits before summing so the sum of up to 2^31 edges stays
    * inside a long under ANSI overflow checking.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1L << 31))), lit(0L)).as("h"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** Driver-side reference union-find (specs only — not a distributed path). */
  private[graft] def unionFindReference(
      vertices: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    (vertices ++ edges.flatMap(e => Seq(e._1, e._2))).foreach(v => parent.getOrElseUpdate(v, v))
    edges.foreach { case (a, b) => union(a, b) }
    parent.keys.map(v => v -> find(v)).toMap
  }
}
