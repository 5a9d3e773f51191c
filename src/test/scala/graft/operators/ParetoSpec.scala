package graft.operators

import graft.SparkSpec

/** Pareto.front2D must equal the brute-force O(n²) dominance filter on
  * every shape, including cross-partition boundaries and duplicate rows.
  */
class ParetoSpec extends SparkSpec {

  private def sparkFront(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pts, 7)).toDF("x", "y")
    Pareto.front2D(df).collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
  }

  private def bruteFront(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (x2, y2) => (x2, y2) != (x, y) && x2 >= x && y2 >= y }
    }.toSet
  }

  test("random clouds match brute force") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 17, 400)) {
      val pts = Seq.fill(n)((rnd.nextInt(30).toDouble, rnd.nextInt(30).toDouble))
      assert(sparkFront(pts) === bruteFront(pts), s"n=$n")
    }
  }

  test("duplicates collapse to one representative") {
    val pts = Seq((1.0, 5.0), (1.0, 5.0), (5.0, 1.0), (0.0, 0.0))
    assert(sparkFront(pts) === Set((1.0, 5.0), (5.0, 1.0)))
  }

  test("strict chain keeps only the maximum") {
    val pts = (1 to 50).map(i => (i.toDouble, i.toDouble))
    assert(sparkFront(pts) === Set((50.0, 50.0)))
  }

  test("anti-chain keeps everything") {
    val pts = (1 to 50).map(i => (i.toDouble, (51 - i).toDouble))
    assert(sparkFront(pts) === pts.toSet)
  }

  test("equal-y ties keep the largest x only") {
    val pts = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0))
    assert(sparkFront(pts) === Set((3.0, 7.0)))
  }
}
