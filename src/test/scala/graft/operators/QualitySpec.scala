package graft.operators

import graft.SparkSpec
import graft.operators.Quality.{Completeness, RowCheck, Uniqueness}
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def checksMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("suite: row, completeness and uniqueness checks count violations") {
    val df = Seq(
      (1, Some("a"), 10.0),
      (2, None, -1.0),
      (2, Some("b"), 3.0),
      (3, Some("c"), -0.5)
    ).toDF("id", "name", "score")
    val got = checksMap(Quality.suite(df, Seq(
      Uniqueness("pk", Seq("id")),
      Completeness("name_set", "name"),
      RowCheck("score_nonneg", col("score") < 0))))
    assert(got === Map("pk" -> 1L, "name_set" -> 1L, "score_nonneg" -> 2L))
  }

  test("suite: multi-column uniqueness counts combination duplicates") {
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"))
      .toDF("a", "b")
    val got = checksMap(Quality.suite(df, Seq(
      Uniqueness("ab", Seq("a", "b")),
      Uniqueness("a_only", Seq("a")))))
    assert(got === Map("ab" -> 1L, "a_only" -> 2L))
  }

  test("suite: empty input still emits one zero-violation row per check") {
    val df = Seq.empty[(Int, String)].toDF("id", "name")
    val got = checksMap(Quality.suite(df, Seq(
      RowCheck("r", col("id") > 0),
      Completeness("c", "name"),
      Uniqueness("u", Seq("id")))))
    assert(got === Map("r" -> 0L, "c" -> 0L, "u" -> 0L))
  }

  test("fkOrphans: child keys without a parent, NULL child keys exempt") {
    val child = Seq(Some(1), Some(1), Some(9), None).toDF("fk")
    val parent = Seq(1, 2).toDF("pk")
    val got = Quality.fkOrphans("fk", child, "fk", parent, "pk").collect()
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toSeq === Seq("fk" -> 1L))
  }

  test("suite compiles to ONE aggregation pass (single scan of the input)") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val plan = Quality.suite(df, Seq(
      RowCheck("r", col("id") > 1),
      Completeness("c", "name"),
      Uniqueness("u", Seq("id")))).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size === 1, s"expected one scan, got ${scans.size}:\n$plan")
  }
}
