package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must equal the single-partition row_number() on any input,
  * partition-count independent (the whole point is removing that stage).
  */
class GlobalRankSpec extends SparkSpec {

  test("matches single-partition row_number on real orders data") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val got = GlobalRank
      .withRank(orders, "rank", col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "rank")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = orders
      .withColumn("rank",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .select("o_orderkey", "rank")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === want)
    assert(got.values.min === 1 && got.values.max === got.size)
  }

  test("ranks stay contiguous across many skewed partitions") {
    val s = spark
    import s.implicits._
    // skewed values force uneven range partitions; ranks must still be 1..n
    val df = (1 to 997).map(i => (i.toLong, (i % 13).toDouble)).toDF("id", "v")
      .repartition(7)
    val ranked = GlobalRank.withRank(df, "rank", col("v"), col("id"))
      .orderBy("rank")
      .collect()
    assert(ranked.map(_.getAs[Int]("rank")).toSeq === (1 to 997))
    val sorted = ranked.map(r => (r.getAs[Double]("v"), r.getAs[Long]("id")))
    assert(sorted.toSeq === sorted.sortBy(identity).toSeq, "rank order == sort order")
  }
}
