package graft.operators

import graft.SparkSpec

/** ExactQuantile must reproduce rank-ceil(q*n) selection (DuckDB
  * quantile_disc semantics) exactly. collectAt is forced low so the
  * histogram-bisection rounds actually run (not just the collect path).
  */
class ExactQuantileSpec extends SparkSpec {

  private def sparkQ(vals: Seq[Double], q: Double): Double = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Tuple1(_)), 5)).toDF("v")
    ExactQuantile.quantileDisc(df, "v", q, collectAt = 64L)
  }

  private def refQ(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    val k = math.ceil(q * sorted.size - 1e-9).toLong.max(1L)
    sorted(k.toInt - 1)
  }

  test("random data matches rank selection for several q") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 1000 - 500)
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
      assert(sparkQ(vals, q) === refQ(vals, q), s"q=$q")
  }

  test("heavy duplicates") {
    val vals = Seq.fill(2000)(5.0) ++ Seq.fill(999)(1.0) ++ Seq.fill(1000)(9.0)
    assert(sparkQ(vals, 0.5) === 5.0)
    assert(sparkQ(vals, 0.1) === 1.0)
    assert(sparkQ(vals, 0.99) === 9.0)
  }

  test("small inputs and exact-integral ranks") {
    assert(sparkQ(Seq(10.0), 0.5) === 10.0)
    assert(sparkQ(Seq(1.0, 2.0, 3.0, 4.0), 0.5) === 2.0) // ceil(2.0) = 2, not 3
    assert(sparkQ(Seq(1.0, 2.0, 3.0, 4.0), 0.25) === 1.0)
    assert(sparkQ(Seq(1.0, 2.0, 3.0, 4.0), 0.9) === 4.0)
  }

  test("nulls are ignored") {
    val s = spark
    import s.implicits._
    val df = Seq[java.lang.Double](1.0, null, 3.0, null, 2.0).toDF("v")
    assert(ExactQuantile.quantileDisc(df, "v", 0.5) === 2.0)
  }

  test("per-group bisection matches per-group rank selection, forced multi-round") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // three groups with very different sizes, ranges and duplicate mass
    val rows =
      Seq.fill(4000)(("a", rnd.nextDouble() * 100)) ++
        Seq.fill(900)(("b", rnd.nextGaussian() * 5 + 50)) ++
        (Seq.fill(300)(("c", 7.0)) ++ Seq.fill(200)(("c", rnd.nextDouble())))
    val df = s.sparkContext.parallelize(rows, 7).toDF("g", "v")
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val got = ExactQuantile.quantileDiscByGroup(df, "g", "v", q, collectAt = 32L)
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        val k = math.ceil(q * sorted.size - 1e-9).toLong.max(1L)
        g -> sorted(k.toInt - 1)
      }
      assert(got === want, s"q=$q")
    }
  }

  test("per-group bisection equals q_winsorize's window-rank boundaries on real data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val byVal = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val all = Window.partitionBy("o_orderstatus")
    val windowBounds = o
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy("o_orderstatus")
      .agg(max(when(col("rn") === ceil(round(col("n") * 0.95, 9)), col("o_totalprice"))).as("hi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bisected = ExactQuantile.quantileDiscByGroup(o, "o_orderstatus", "o_totalprice", 0.95)
    assert(bisected === windowBounds,
      "histogram bisection must reproduce the window-rank boundary exactly")
  }
}
