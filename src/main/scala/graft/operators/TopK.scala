package graft.operators

import graft.plans.PartialTopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Exact per-key top-k with map-side pruning (see [[graft.plans.PartialTopK]]).
  *
  * Equivalent to
  * {{{ row_number() OVER (PARTITION BY keys ORDER BY ord [DESC], tie) <= k }}}
  * but shuffles at most k·(distinct keys per partition) rows per map task
  * instead of the whole table. Columns are passed BY NAME and must exist on
  * `df` (derive them with withColumn first): the custom logical node is
  * built from the analyzed child's own attribute references, so it enters
  * the planner fully resolved — the analyzer does not descend into foreign
  * nodes to resolve Column wrappers. `tie` must be unique per row; `ord`
  * any numeric column.
  */
object TopK {

  def perKey(
      df: DataFrame,
      keys: Seq[String],
      ord: String,
      tie: String,
      k: Int,
      descending: Boolean = true): DataFrame = {
    val lp = Bridge.logicalPlan(df)
    def attr(name: String): Attribute =
      lp.output.find(a => df.sparkSession.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found among ${lp.output.map(_.name).mkString(", ")}"))
    val pruned = Bridge.ofRows(
      df.sparkSession,
      PartialTopK(keys.map(attr), attr(ord), attr(tie), descending, k, lp))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(
        (if (descending) Seq(col(ord).desc, col(tie).asc)
         else Seq(col(ord).asc, col(tie).asc)): _*)
    pruned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
