package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL-callable lake maintenance — the DSv2 procedure surface
  * (`CALL graft.system.<proc>(...)`) over the library's table-lifecycle
  * operations, so a SQL-only client can run the jobs a 100 TB table
  * needs on a schedule: compaction, retention, rollback, branching, and
  * mirror replication. Each procedure resolves its table arguments
  * through the OWNING catalog's directory scheme (dotted names =
  * namespace segments), executes the library call — every one an
  * ordinary optimistic commit, safe against concurrent writers — and
  * returns a one-row result set (the affected version) as a
  * [[LocalScan]].
  *
  * Reference behavior: the pipeline has no maintenance surface at all —
  * its whole lifecycle is the `main` loop that moves processed files
  * aside (`/root/reference/xml_to_rdb.py:39-56`); here the same
  * operations are engine-native SQL with the commit log as the audit
  * trail (`$history`).
  */
object GraftProcedures {

  /** Procedure names under the `system` namespace. */
  val Names: Seq[String] = Seq(
    "vacuum", "optimize", "rollback", "clone_table", "replicate",
    "tag", "drop_ref")

  /** `resolve` maps a (possibly dotted) table name to its directory
    * under the calling catalog's root — creation targets (clone/replicate
    * destinations) resolve the same way without existing yet.
    */
  def load(spark: SparkSession, name: String, resolve: String => String): UnboundProcedure =
    name match {
      case "vacuum" =>
        proc(name, "retention: keep the newest versions, reclaim the rest",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("keep_versions", IntegerType).defaultValue("1").build(),
            ProcedureParameter.in("min_age_ms", LongType)
              .defaultValue(VersionedLake.DefaultVacuumMinAgeMs.toString)
              .comment("unreferenced dirs younger than this survive (in-flight commits)")
              .build())) { in =>
          val dir = resolve(str(in, 0))
          VersionedLake.vacuum(spark, dir, keepVersions = in.getInt(1),
            minAgeMs = in.getLong(2))
          VersionedLake.currentVersion(spark, dir).get
        }
      case "optimize" =>
        proc(name, "compaction: rewrite the layout (optionally Z-clustered) as one commit; " +
          "small_rows > 0 = INCREMENTAL (consolidate only sub-threshold directories, " +
          "O(small dirs) not O(table))",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("zorder_by", StringType).defaultValue("''")
              .comment("comma-separated cluster columns; empty = plain compaction").build(),
            ProcedureParameter.in("num_dirs", IntegerType).defaultValue("1")
              .comment(">= 2 splits into Z-range-disjoint directories").build(),
            ProcedureParameter.in("small_rows", LongType).defaultValue("-1")
              .comment("> 0 compacts only directories under this row count").build())) { in =>
          val dir = resolve(str(in, 0))
          val z = str(in, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val n = in.getInt(2)
          val smallRows = in.getLong(3)
          if (smallRows > 0) {
            require(z.isEmpty && n < 2,
              "small_rows is incremental consolidation - it composes with " +
                "neither zorder_by nor num_dirs (run a full optimize for those)")
            VersionedLake.compactSmall(spark, dir, smallRows)
              .getOrElse(VersionedLake.currentVersion(spark, dir).get)
          } else if (n >= 2) VersionedLake.optimizeClustered(spark, dir, z, n)
          else VersionedLake.optimize(spark, dir, zorderBy = z)
        }
      case "rollback" =>
        proc(name, "republish a retained version's exact content as the new current",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("version", LongType).build())) { in =>
          VersionedLake.rollback(spark, resolve(str(in, 0)), in.getLong(1))
        }
      case "clone_table" =>
        proc(name, "deep-clone one retained version as a new independent table",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("dst", StringType).build(),
            ProcedureParameter.in("version", LongType).defaultValue("-1")
              .comment("-1 = current").build())) { in =>
          val v = in.getLong(2)
          VersionedLake.cloneTable(spark, resolve(str(in, 0)), resolve(str(in, 1)),
            version = if (v < 0) None else Some(v))
        }
      case "replicate" =>
        proc(name, "CDC-fed mirror sync: bootstrap or apply the row delta, exactly-once",
          Seq(
            ProcedureParameter.in("src", StringType).build(),
            ProcedureParameter.in("dst", StringType).build(),
            ProcedureParameter.in("keys", StringType)
              .comment("comma-separated key columns").build())) { in =>
          LakeReplicate.sync(spark, resolve(str(in, 0)), resolve(str(in, 1)),
            str(in, 2).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        }
      case "tag" =>
        proc(name, "name a retained version (vacuum keeps it alive; " +
          "read it via VERSION AS OF '<name>')",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("name", StringType).build(),
            ProcedureParameter.in("version", LongType).defaultValue("-1")
              .comment("-1 = current").build())) { in =>
          val dir = resolve(str(in, 0))
          val v = in.getLong(2)
          val at =
            if (v >= 0) v
            else VersionedLake.currentVersion(spark, dir).getOrElse(
              throw new IllegalStateException(s"no published version in $dir"))
          LakeRefs.tag(spark, dir, str(in, 1), at)
          at
        }
      case "drop_ref" =>
        proc(name, "drop a named ref (its version re-enters normal retention)",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("name", StringType).build())) { in =>
          val dir = resolve(str(in, 0))
          LakeRefs.drop(spark, dir, str(in, 1))
          VersionedLake.currentVersion(spark, dir).getOrElse(-1L)
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown procedure 'system.$other' - available: ${Names.mkString(", ")}")
    }

  private def str(in: InternalRow, i: Int): String = in.getUTF8String(i).toString

  /** One-row (version BIGINT) result set; `body` runs at CALL time. */
  private def proc(
      procName: String,
      desc: String,
      params: Seq[ProcedureParameter])(body: InternalRow => Long): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): util.Iterator[Scan] = {
        val v = body(input)
        util.Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] =
            Array(new GenericInternalRow(Array[Any](v)))
          override def readSchema(): StructType =
            StructType(Seq(StructField("version", LongType, nullable = false)))
          override def description(): String = s"graft.system.$procName result"
        }).iterator()
      }
    }
}
