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

  test("kAnonymity flags small groups and homogeneous groups, and only those") {
    // (zip, age) quasi-identifiers; diagnosis sensitive.
    // g1: 3 members, diverse        -> k-violation only
    // g2: 5 members, all same value -> l-violation only (homogeneity)
    // g3: 5 members, diverse        -> clean, must NOT appear
    val rows =
      Seq.tabulate(3)(i => ("g1", 30, s"d$i")) ++
        Seq.fill(5)(("g2", 40, "flu")) ++
        Seq.tabulate(5)(i => ("g3", 50, s"d$i"))
    val df = rows.toDF("zip", "age", "diag")
    val out = Quality.kAnonymity(df, Seq("zip", "age"), col("diag"), k = 5, l = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_sensitive"),
        r.getAs[Boolean]("k_violation"), r.getAs[Boolean]("l_violation"))))
      .toMap
    assert(out.keySet === Set("g1", "g2"))
    assert(out("g1") === ((3L, 3L, true, false)))
    assert(out("g2") === ((5L, 1L, false, true)))
  }
}
