package graft.etl

import org.apache.spark.sql.DataFrame

/** The engine's unit of state: a named-table catalog of dynamic-schema
  * DataFrames — the Spark re-expression of the reference's
  * `FFIFile._data_map` dict (`/root/reference/parser/xml.py:43,63-80`).
  *
  * Immutable: every transform stage returns a new catalog, so the whole
  * pipeline stays a pure LogicalPlan graph until a sink forces execution.
  */
final case class FfiCatalog(tables: Map[String, DataFrame]) {
  def apply(name: String): DataFrame =
    tables.getOrElse(name, throw new NoSuchElementException(s"$name not in FFI catalog"))
  def get(name: String): Option[DataFrame] = tables.get(name)
  def contains(name: String): Boolean = tables.contains(name)
  def updated(name: String, df: DataFrame): FfiCatalog =
    copy(tables = tables + (name -> df))
  def removed(names: String*): FfiCatalog =
    copy(tables = tables -- names)
  def names: Seq[String] = tables.keys.toSeq.sorted

  /** S11: dump every catalog table as headered CSV under `dir/<table>/`
    * (`/root/reference/parser/xml.py:758-765`). Distributed write — each
    * table lands as one-or-more part files, not a driver-side dump.
    */
  def toCsv(dir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.option("header", "true").mode("overwrite").csv(s"$dir/$name")
    }
}

object FfiCatalog {

  /** FFI system tables parsed but never loaded
    * (`/root/reference/parser/xml.py:44-46,754-756`).
    */
  val Excluded: Set[String] = Set(
    "FuelConstants_DL", "FuelConstants_ExpDL", "FuelConstants_FWD",
    "FuelConstants_Veg", "FuelConstants_CWD", "Schema_Version", "Program",
    "Project", "DataGridViewSettings", "MasterSpecies_LastModified", "Settings")

  val empty: FfiCatalog = FfiCatalog(Map.empty)
}
