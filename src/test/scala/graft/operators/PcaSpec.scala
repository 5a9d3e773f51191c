package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Power iteration must recover the dominant direction of a synthetic
  * anisotropic cloud, and the distributed Gram pass must equal the
  * driver-side Gram regardless of partitioning.
  */
class PcaSpec extends SparkSpec {

  private def vecsDf(vs: Seq[Array[Double]]) = {
    val s = spark
    import s.implicits._
    s.createDataset(vs.map(_.toSeq))(implicitly).toDF("v")
  }

  test("recovers the dominant axis of an axis-aligned cloud") {
    // variance concentrated on axis 2 of 4: component ≈ ±e2
    val vs = (1 to 40).map { i =>
      Array(0.1 * (i % 3 - 1), 0.1 * (i % 5 - 2), 10.0 * (i % 7 - 3), 0.05 * (i % 2))
    }
    val w = Pca.topComponent(vecsDf(vs), "v")
    assert(math.abs(w(2)) > 0.99, s"expected e2-dominant, got ${w.mkString(",")}")
    val norm = math.sqrt(w.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("recovers an oblique direction, sign-canonicalized") {
    // points spread along (3,4)/5 with small orthogonal noise
    val d = Array(0.6, 0.8)
    val vs = (-20 to 20).map { i =>
      Array(d(0) * i + 0.01 * (i % 3), d(1) * i - 0.01 * (i % 3))
    }
    val w = Pca.topComponent(vecsDf(vs), "v")
    val cos = w(0) * d(0) + w(1) * d(1)
    assert(math.abs(cos) > 0.999, s"got ${w.mkString(",")}")
    // canonical sign: first significant entry positive
    assert(w.find(x => math.abs(x) > 1e-9).forall(_ > 0))
  }

  test("Gram aggregation is partitioning-invariant") {
    val vs = (1 to 25).map(i => Array(i.toDouble, (i * i % 13).toDouble, -i / 2.0))
    val w1 = Pca.topComponent(vecsDf(vs).repartition(1), "v")
    val w8 = Pca.topComponent(vecsDf(vs).repartition(8), "v")
    // 9-decimal rounding inside topComponent absorbs sum-order ulp noise
    assert(w1.toSeq === w8.toSeq)
  }

  test("projection column matches a driver-side dot product") {
    val vs = Seq(Array(1.0, 2.0, 3.0), Array(-1.0, 0.5, 2.0))
    val w = Array(0.5, -0.25, 0.125)
    val got = vecsDf(vs)
      .select(Pca.project(col("v"), w).as("p"))
      .collect().map(_.getDouble(0)).toSet
    val want = vs.map(v => v.zip(w).map { case (a, b) => a * b }.sum).toSet
    assert(got === want)
  }

  test("ragged vector dims fail loudly instead of corrupting the Gram matrix") {
    // direct Aggregator surface: a shorter vector after a longer one (the
    // silent-corruption case) and a longer one after a shorter (the
    // would-be ArrayIndexOutOfBounds case) must both throw the guard.
    val b3 = Pca.GramAgg.reduce(Pca.GramAgg.zero, Seq(1.0, 2.0, 3.0))
    val eShort = intercept[IllegalArgumentException] {
      Pca.GramAgg.reduce(b3, Seq(1.0, 2.0))
    }
    assert(eShort.getMessage.contains("dims must be uniform"))
    val eLong = intercept[IllegalArgumentException] {
      Pca.GramAgg.reduce(b3, Seq(1.0, 2.0, 3.0, 4.0))
    }
    assert(eLong.getMessage.contains("dims must be uniform"))
    val b2 = Pca.GramAgg.reduce(Pca.GramAgg.zero, Seq(5.0, 6.0))
    val eMerge = intercept[IllegalArgumentException] {
      Pca.GramAgg.merge(b3, b2)
    }
    assert(eMerge.getMessage.contains("different dims"))
  }
}
