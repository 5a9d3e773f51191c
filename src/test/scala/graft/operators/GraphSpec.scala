package graft.operators

import graft.SparkSpec

/** PageRank must agree with a driver-side reference power iteration
  * (including the per-iteration 12-decimal rounding contract) and satisfy
  * the conservation/centrality properties on known shapes.
  */
class GraphSpec extends SparkSpec {

  private def sparkRanks(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Double] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(edges, 4)).toDF("src", "dst")
    Graph.pageRank(df, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Reference implementation: same recurrence, same rounding. */
  private def refRanks(
      edges: Seq[(Long, Long)],
      iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n.toDouble).toMap
    for (_ <- 0 until iters) {
      val contrib = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (u, _) => r(u) / out(u) }.sum)
        .toMap
      r = nodes.map { v =>
        v -> BigDecimal((1.0 - d) / n.toDouble + d * contrib.getOrElse(v, 0.0))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  private def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap(p => Seq(p, p.swap))

  test("matches the reference power iteration exactly (12-decimal contract)") {
    val edges = undirected(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 1L), (6L, 5L))
    val got = sparkRanks(edges)
    val want = refRanks(edges, iters = 3)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
  }

  test("rank mass is conserved on an undirected graph") {
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val total = sparkRanks(edges).values.sum
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("star center outranks the leaves") {
    val edges = undirected((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = sparkRanks(edges)
    assert((1L to 4L).forall(leaf => r(0L) > r(leaf)))
    assert((1L to 4L).map(r).distinct.size === 1)
  }

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(edges, 4)).toDF("a", "b")
    Graph.triangleCounts(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: K4 — every node in C(3,2)=3 triangles") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(triangles(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCounts: triangle + pendant, noisy input") {
    // duplicates, reversed orientation and self-loops must not change counts
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (1L, 2L), (3L, 3L), (1L, 4L))
    assert(triangles(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("triangleCounts: bipartite graph has none") {
    val edges = for (l <- 0L to 2L; r <- 10L to 12L) yield (l, r)
    assert(triangles(edges).values.forall(_ == 0L))
  }

  test("triangleCounts: two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: shared edge (2,3) participates in both
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L))
    assert(triangles(edges) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  private def bfs(edges: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Long] = {
    val e = spark.createDataFrame(
      spark.sparkContext.parallelize(edges, 4)).toDF("src", "dst")
    val s = spark.createDataFrame(
      spark.sparkContext.parallelize(sources.map(Tuple1(_)), 2)).toDF("id")
    Graph.shortestPaths(e, s)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("shortestPaths: path graph distances, unreachable absent") {
    // 1→2→3→4 directed chain plus isolated 9→10: BFS from 1 never sees them
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
    assert(bfs(edges, Seq(1L)) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("shortestPaths: picks the shorter of two routes, directed") {
    // 1→2→3→4 and shortcut 1→4; direction matters (no back-propagation)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L))
    assert(bfs(edges, Seq(1L)) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("shortestPaths: multi-source takes the nearer source; cycles terminate") {
    // cycle 1→2→3→1 with sources {1, 3}: dist is min over sources
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(bfs(edges, Seq(1L, 3L)) === Map(1L -> 0L, 3L -> 0L, 2L -> 1L))
  }
}
