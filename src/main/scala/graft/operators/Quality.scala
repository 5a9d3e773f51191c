package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint verification (the Deequ idea:
  * arbitrary per-table constraints compiled into ONE aggregation pass per
  * table, so a 50-check audit of a 100 TB table costs one scan, not 50).
  *
  * Reference analogue: the audit-count step the FFI pipeline runs after
  * every merge (reference `exporter/audit.py` counts rows per table); this
  * generalizes it to content constraints — completeness, uniqueness,
  * domain/range membership, referential integrity — each reported as a
  * `(check_name, violations)` row so a curation gate can alert on any
  * non-zero count.
  *
  * Scale shape:
  *  - [[suite]] folds every single-table check into one `agg(...)` —
  *    row predicates become conditional sums (partial-aggregated map-side,
  *    one exchange of ONE row); uniqueness checks add `count(distinct …)`
  *    terms, which Catalyst plans via Expand — still a single scan, with
  *    shuffle volume proportional to distinct keys, the unavoidable cost
  *    of an exact uniqueness audit.
  *  - [[fkOrphans]] is a left-anti join child→parent on the key: Catalyst
  *    broadcasts the parent side when small, shuffle-joins otherwise;
  *    either way the count partial-aggregates to one row per task.
  */
object Quality {

  sealed trait Check { def name: String }

  /** violations = rows where `bad` is true (range / domain / format). */
  final case class RowCheck(name: String, bad: Column) extends Check

  /** violations = rows with a NULL in `column`. */
  final case class Completeness(name: String, column: String) extends Check

  /** violations = total rows − distinct key combinations (0 ⇔ unique).
    * NULL-key semantics: EVERY row participates — the distinct count is
    * over `struct(cols)`, which is non-null even when all its fields are
    * null, so rows with NULL keys form their own group(s) and two
    * all-NULL-key rows count as duplicates. This deliberately differs
    * from SQL `COUNT(DISTINCT col)` (which silently IGNORES null keys —
    * an audit that skips exactly the rows most likely to be broken):
    * a uniqueness check on nullable keys should surface NULL-key
    * duplicates, not exempt them. Add a [[Completeness]] check on the
    * same columns to alert on the NULLs themselves.
    */
  final case class Uniqueness(name: String, cols: Seq[String]) extends Check

  /** All `checks` over `df` in one aggregation pass →
    * `(check_name string, violations bigint)`, one row per check.
    * Check names must be unique (they key alert routing downstream) but
    * are otherwise arbitrary strings — they travel as literals, never
    * spliced into SQL text.
    */
  def suite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "suite needs at least one check")
    val dup = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dup.isEmpty, s"duplicate check names: ${dup.mkString(", ")}")
    // aggregates are keyed by POSITION (c0, c1, …) and names attached as
    // literal columns afterwards: no check name is ever interpolated
    // into parsed SQL (a quote/backtick in a name cannot break the plan
    // or inject fragments) and name collisions with df's columns are
    // impossible
    val aggs = checks.zipWithIndex.map {
      case (RowCheck(_, bad), i) =>
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"c$i")
      case (Completeness(_, c), i) =>
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"c$i")
      case (Uniqueness(_, cs), i) =>
        (count(lit(1)) - count_distinct(struct(cs.map(col): _*))).as(s"c$i")
    }
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    // one row → one (check_name, violations) row per metric
    oneRow
      .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"), col(s"c$i").as("violations"))
      }: _*)).as("kv"))
      .select(col("kv.check_name"), col("kv.violations"))
  }

  /** Referential-integrity audit: child rows whose `childKey` has no match
    * in `parent.parentKey` (NULL child keys are not orphans — SQL FK
    * semantics). One `(check_name, violations)` row.
    */
  def fkOrphans(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame =
    child
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Privacy audit before a dataset leaves the pipeline: k-anonymity
    * (a quasi-identifier group with fewer than `k` members re-identifies
    * its members) and l-diversity (a group whose `sensitive` expression
    * takes fewer than `l` distinct values leaks it to everyone who knows
    * the group — the homogeneity attack, which k-anonymity alone cannot
    * see). One shuffle on the QI columns; both measures ride the same
    * aggregation pass. Returns only the violating groups, flagged:
    * `(quasi..., n_rows, n_sensitive, k_violation, l_violation)`.
    */
  def kAnonymity(
      df: DataFrame, quasi: Seq[String], sensitive: Column, k: Long, l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), count_distinct(sensitive).as("n_sensitive"))
      .withColumn("k_violation", col("n_rows") < k)
      .withColumn("l_violation", col("n_sensitive") < l)
      .filter(col("k_violation") || col("l_violation"))
  }
}
