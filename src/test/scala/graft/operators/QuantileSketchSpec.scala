package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact window-rank face must reproduce rank-ceil(q·n) selection
  * bit-exactly; the KLL sketch face must stay inside its rank-error
  * budget under any partitioning (merge order) and conserve weight.
  */
class QuantileSketchSpec extends SparkSpec {

  private def refQ(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    sorted(math.ceil(q * sorted.size - 1e-9).toLong.max(1L).toInt - 1)
  }

  test("exact face matches per-key rank selection") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = for (g <- 0 until 40; _ <- 0 until (g % 7) + 1)
      yield (s"k$g", rnd.nextDouble() * 1000)
    val df = s.sparkContext.parallelize(rows, 6).toDF("g", "v")
    val got = QuantileSketch.quantilesByKeyExact(df, "g", "v", Seq(0.25, 0.5, 1.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val v = vs.map(_._2)
      assert(got(g) === ((refQ(v, 0.25), refQ(v, 0.5), refQ(v, 1.0))), g)
    }
  }

  test("exact face ignores nulls and handles single-row keys") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", java.lang.Double.valueOf(5.0)), ("a", null),
      ("b", java.lang.Double.valueOf(7.0))).toDF("g", "v")
    val got = QuantileSketch.quantilesByKeyExact(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 5.0, "b" -> 7.0))
  }

  private def rankError(vals: Seq[Double], q: Double, est: Double): Double = {
    val sorted = vals.sorted
    val target = math.ceil(q * sorted.size - 1e-9).toLong.max(1L)
    // rank range occupied by the estimate's value in the sorted data
    val lo = sorted.indexWhere(_ >= est) + 1
    val hi = sorted.lastIndexWhere(_ <= est) + 1
    val dist = if (target < lo) lo - target else if (target > hi) target - hi else 0L
    dist.toDouble / sorted.size
  }

  test("sketch rank error stays under 2% of n across partitionings") {
    val rnd = new scala.util.Random(17)
    val vals = Seq.fill(50000)(rnd.nextGaussian() * 100 + 37)
    for (parts <- Seq(2, 16, 64)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals.map(v => ("x", v)), parts)).toDF("g", "v")
      val row = QuantileSketch.quantilesByKeySketch(df, "g", "v", Seq(0.1, 0.5, 0.9, 0.99))
        .head()
      Seq(0.1, 0.5, 0.9, 0.99).zipWithIndex.foreach { case (q, i) =>
        val err = rankError(vals, q, row.getDouble(i + 1))
        assert(err <= 0.02, s"q=$q parts=$parts err=$err")
      }
    }
  }

  test("sketch handles skew, duplicates and many keys in one shuffle") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (for (g <- 0 until 50; i <- 0 until 400)
      yield (s"g$g", if (i % 3 == 0) 42.0 else rnd.nextDouble() * g.max(1))) ++
      Seq.fill(20000)(("hot", rnd.nextDouble()))
    val df = s.sparkContext.parallelize(rows, 13).toDF("g", "v")
    val got = QuantileSketch.quantilesByKeySketch(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byKey = rows.groupBy(_._1)
    assert(got.keySet === byKey.keySet)
    byKey.foreach { case (g, vs) =>
      val err = rankError(vs.map(_._2), 0.5, got(g))
      assert(err <= 0.02, s"key=$g err=$err")
    }
  }

  test("sketch weight conservation: exact on small inputs (no compaction)") {
    val s = spark
    import s.implicits._
    // fewer than k=256 values never compact → the sketch IS the data and
    // estimates must equal exact rank selection.
    val vals = (1 to 100).map(_.toDouble).reverse
    val df = vals.map(("a", _)).toDF("g", "v")
    val row = QuantileSketch.quantilesByKeySketch(df, "g", "v", Seq(0.25, 0.5, 1.0)).head()
    assert(row.getDouble(1) === 25.0)
    assert(row.getDouble(2) === 50.0)
    assert(row.getDouble(3) === 100.0)
  }

  test("colName renders quantiles unambiguously") {
    assert(QuantileSketch.colName(0.25) === "p25")
    assert(QuantileSketch.colName(0.5) === "p50")
    assert(QuantileSketch.colName(0.975) === "p97_5")
    assert(QuantileSketch.colName(1.0) === "p100")
  }
}
