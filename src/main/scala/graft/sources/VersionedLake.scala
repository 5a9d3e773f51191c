package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured versioned lake table with ATOMIC publishes — the
  * minimal transaction log that fixes bare-parquet's 100 TB problems:
  *
  *   1. '''No atomic multi-file commit.''' Every commit writes immutable
  *      data directories, then a MANIFEST (`manifest/v=N.txt`, the list
  *      of data directories the version comprises), then publishes by
  *      replacing ONE pointer file (`_latest`) via temp + rename — the
  *      single-object atomicity every store provides. A writer that dies
  *      at any earlier point leaves unreferenced garbage, never a
  *      half-visible table.
  *   2. '''O(delta) appends.''' [[appendCommit]]'s manifest is the prior
  *      version's directory list plus the new batch's directory — a
  *      streaming `foreachBatch` ingests TBs/day writing only its own
  *      batch per commit, while each commit is still a complete,
  *      atomically-published snapshot.
  *   3. '''Snapshot isolation.''' [[upsert]] writes merged data into NEW
  *      directories while the old version's files stay on disk: the plan
  *      streams straight from read to write (no localCheckpoint barrier —
  *      the workaround [[Lake.upsertPartitioned]] needs because it
  *      overwrites what it reads), and in-flight readers of v=N never
  *      observe v=N+1. Retained versions are time travel until [[vacuum]].
  *   4. '''Manifest-level data skipping.''' Commits may record per-data-
  *      directory min/max column stats in the manifest ([[StatsHeader]]);
  *      [[readBetween]] prunes whole directories against them BEFORE the
  *      scan is planned — no file listing, no parquet footer reads for
  *      skipped commits. On a time-keyed ingest (the common shape: each
  *      micro-batch covers a narrow time range) a point-in-range query
  *      over a year of commits plans against days, not the year; footer-
  *      level row-group pruning then works WITHIN the survivors. Stats
  *      travel with the manifest, so they are exactly as atomic and
  *      versioned as the data they describe. Per-directory BLOOM filters
  *      ([[BloomHeader]], [[readPoint]]) cover the case min/max can't:
  *      point lookups on high-cardinality keys whose range spans every
  *      ingest batch.
  *
  * Layout: `table/data/<uuid>/...parquet` (immutable),
  * `table/manifest/v=N.txt`, `table/_latest` holding N.
  */
object VersionedLake {

  private val Pointer = "_latest"

  /** Manifest header line carrying the version's canonical schema as
    * single-line Spark JSON. Schema evolution design: the merged schema
    * is computed ONCE at commit time (union-by-name of the prior
    * version's schema and the batch's, new columns appended, everything
    * nullable) and stored in the manifest; reads pass it to the scan as
    * an explicit schema, which makes the parquet reader null-backfill
    * columns a file predates — ONE scan over all directories, no
    * `mergeSchema` footer sweep (which would re-read 10^5 footers per
    * read on a year of micro-batch commits). Same-name columns must
    * keep their type across commits; widening is a rewrite
    * ([[optimize]] after an explicit cast), not a silent cast.
    * Manifests written before this header existed read as before
    * (first-file schema), so old tables stay readable.
    */
  private val SchemaHeader = "#schema="

  /** Manifest comment line carrying one data directory's column stats:
    * `#stats=<dir>\t{"col":["min","max"],...}` with min/max as the
    * column's Spark string-cast (null for an all-null directory).
    * Comment-prefixed, so [[manifest]] and pre-stats readers skip them;
    * directories without a stats line are read unconditionally
    * (conservative — absence of evidence never drops data).
    */
  private val StatsHeader = "#stats="

  /** Manifest comment line carrying one data directory's per-column Bloom
    * filters: `#bloom=<dir>\t{"col":{"m":bits,"k":hashes,"b":"base64"},...}`.
    * Complements [[StatsHeader]] where min/max is useless: a
    * high-cardinality key (uuid, doc_id, user_id) spread uniformly over
    * every ingest batch has each directory's [min,max] spanning the whole
    * domain, so range stats prune nothing — but a point lookup probes the
    * Bloom and skips every directory that provably lacks the key.
    * Comment-prefixed like stats: pre-bloom readers ignore the lines,
    * bloom-less directories are read conservatively.
    */
  private val BloomHeader = "#bloom="

  /** Bloom sizing for [[commit]]/[[appendCommit]]/[[optimize]]. Defaults
    * give ~10 bits/key at 100k distinct keys per directory (FP ≈ 1%);
    * size `bits` ≥ 10× the expected distinct keys per commit. Cost is
    * bits/8 bytes per directory per column in the manifest, and one
    * O(delta) aggregation per column at commit time.
    */
  final case class BloomConfig(cols: Seq[String], bits: Int = 1 << 20, k: Int = 7) {
    require(bits > 0 && (bits & (bits - 1)) == 0, s"bloom bits must be a power of two: $bits")
    require(k >= 1 && k <= 16, s"bloom k out of range: $k")
  }

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmallFile(spark: SparkSession, path: org.apache.hadoop.fs.Path): String = {
    val f = fs(spark, path.toString)
    val in = f.open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Write bytes to `name.tmp`, rename over `name` — atomic publish. */
  private def atomicWrite(
      spark: SparkSession,
      dir: String,
      name: String,
      content: String): Unit = {
    val f = fs(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s"$name.tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    val out = f.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"atomic publish of $dir/$name failed")
  }

  /** Currently published version; None for an empty/uninitialized table. */
  def currentVersion(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val p = new org.apache.hadoop.fs.Path(tableDir, Pointer)
    if (!f.exists(p)) None else Some(readSmallFile(spark, p).trim.toLong)
  }

  /** Data-directory names a retained version comprises. */
  def manifest(spark: SparkSession, tableDir: String, version: Long): Seq[String] =
    manifestLines(spark, tableDir, version).filterNot(_.startsWith("#"))

  /** The version's committed schema, if its manifest carries one
    * (manifests predating the schema header yield None → first-file
    * schema at read, the old behavior).
    */
  def versionSchema(
      spark: SparkSession,
      tableDir: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] =
    manifestLines(spark, tableDir, version)
      .find(_.startsWith(SchemaHeader))
      .map(l => org.apache.spark.sql.types.DataType.fromJson(l.stripPrefix(SchemaHeader))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  private def manifestLines(
      spark: SparkSession,
      tableDir: String,
      version: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$tableDir/manifest", s"v=$version.txt")
    readSmallFile(spark, p).linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Union-by-name: prior columns keep their position, genuinely new
    * columns append in batch order, everything nullable (old files lack
    * the new columns, so the merged schema must admit null). A same-name
    * column changing type is an error — silent coercion would corrupt
    * every reader downstream.
    */
  private def mergeSchemas(
      prior: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.types.StructField]
    prior.fields.foreach(f => out += f.copy(nullable = true))
    next.fields.foreach { f =>
      prior.fields.find(_.name == f.name) match {
        case Some(p) =>
          require(p.dataType.sql == f.dataType.sql,
            s"schema evolution cannot change column '${f.name}' " +
              s"from ${p.dataType.sql} to ${f.dataType.sql}; cast before committing")
        case None => out += f.copy(nullable = true)
      }
    }
    org.apache.spark.sql.types.StructType(out.toSeq)
  }

  /** One aggregation pass over the batch: per-column min/max, string-cast
    * by Spark itself so the stored form matches what a reader's literal
    * would cast to. O(delta) like the write it accompanies.
    */
  private def columnStats(df: DataFrame, statsCols: Seq[String]): Option[String] = {
    if (statsCols.isEmpty) return None
    val missing = statsCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"statsCols not in the batch schema: ${missing.mkString(", ")}")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).cast("string"), max(col(c)).cast("string")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    import org.json4s.JsonAST._
    val obj = JObject(statsCols.zipWithIndex.map { case (c, i) =>
      def v(j: Int): JValue =
        if (row.isNullAt(j)) JNull else JString(row.getString(j))
      c -> (JArray(List(v(2 * i), v(2 * i + 1))): JValue)
    }.toList)
    Some(org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(obj)))
  }

  /** Kirsch–Mitzenmacher double hashing: k bit positions for one value as
    * `(h1 + i*h2) mod bits`, with both base hashes computed by Spark's own
    * codegen'd xxhash64 — the same expression builds the filter
    * distributed at commit time and probes it for a literal at read time,
    * so writer and reader can never disagree on the hash.
    */
  private def bloomPositions(c: Column, bits: Int, k: Int): Column = {
    // reduce each base hash mod bits BEFORE combining: identical positions
    // ((a+i·b) mod m ≡ ((a mod m)+i·(b mod m)) mod m) and the arithmetic
    // stays far from Long overflow under ANSI mode (bits ≤ 2^30, i ≤ 16)
    val m = lit(bits.toLong)
    val h1 = pmod(xxhash64(c), m)
    val h2 = pmod(xxhash64(c, lit(0x9e3779b97f4a7c15L)), m)
    array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, m)): _*)
  }

  /** Build the batch's Bloom filters: one distributed distinct-positions
    * pass per column (the shuffle carries bit POSITIONS, capped at `bits`
    * values regardless of batch size — the driver collect is bounded by
    * the filter's own capacity, never by the data). Nulls are skipped:
    * point-equality never matches null, so they need no representation.
    */
  private def bloomJson(df: DataFrame, cfg: Option[BloomConfig]): Option[String] = {
    val c = cfg.getOrElse(return None)
    if (c.cols.isEmpty) return None
    val missing = c.cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"bloom cols not in the batch schema: ${missing.mkString(", ")}")
    import org.json4s.JsonAST._
    val obj = JObject(c.cols.toList.map { name =>
      val bytes = new Array[Byte](c.bits / 8)
      df.filter(col(name).isNotNull)
        .select(explode(bloomPositions(col(name), c.bits, c.k)).as("p"))
        .distinct()
        .collect()
        .foreach { r =>
          val p = r.getLong(0).toInt
          bytes(p >> 3) = (bytes(p >> 3) | (1 << (p & 7))).toByte
        }
      name -> (JObject(List(
        "m" -> (JInt(c.bits): JValue),
        "k" -> (JInt(c.k): JValue),
        "b" -> (JString(java.util.Base64.getEncoder.encodeToString(bytes)): JValue))): JValue)
    })
    Some(org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(obj)))
  }

  /** Per-directory Bloom filters a version's manifest carries:
    * dir -> col -> (bits, k, filter bytes).
    */
  def dirBlooms(
      spark: SparkSession,
      tableDir: String,
      version: Long): Map[String, Map[String, (Int, Int, Array[Byte])]] = {
    import org.json4s.JsonAST._
    manifestLines(spark, tableDir, version)
      .filter(_.startsWith(BloomHeader))
      .flatMap { line =>
        val rest = line.stripPrefix(BloomHeader)
        val tab = rest.indexOf('\t')
        if (tab < 0) None
        else {
          val cols = org.json4s.jackson.JsonMethods.parse(rest.substring(tab + 1)) match {
            case JObject(fields) => fields.collect {
              case (c, JObject(props)) =>
                val m = props.toMap
                (m.get("m"), m.get("k"), m.get("b")) match {
                  case (Some(JInt(bits)), Some(JInt(k)), Some(JString(b64))) =>
                    Some(c -> ((bits.toInt, k.toInt, java.util.Base64.getDecoder.decode(b64))))
                  case _ => None
                }
            }.flatten.toMap
            case _ => Map.empty[String, (Int, Int, Array[Byte])]
          }
          Some(rest.substring(0, tab) -> cols)
        }
      }
      .toMap
  }

  /** Raw bloom JSON per directory, for O(delta) carry-forward (the data
    * directories are immutable, so their filters are too).
    */
  private def dirBloomsRaw(
      spark: SparkSession,
      tableDir: String,
      version: Long): Map[String, String] =
    manifestLines(spark, tableDir, version)
      .filter(_.startsWith(BloomHeader))
      .flatMap { line =>
        val rest = line.stripPrefix(BloomHeader)
        val tab = rest.indexOf('\t')
        if (tab < 0) None else Some(rest.substring(0, tab) -> rest.substring(tab + 1))
      }
      .toMap

  /** Per-directory stats a version's manifest carries:
    * dir -> col -> (min, max) as Spark string-casts, None = all-null.
    */
  def dirStats(
      spark: SparkSession,
      tableDir: String,
      version: Long): Map[String, Map[String, (Option[String], Option[String])]] = {
    import org.json4s.JsonAST._
    manifestLines(spark, tableDir, version)
      .filter(_.startsWith(StatsHeader))
      .flatMap { line =>
        val rest = line.stripPrefix(StatsHeader)
        val tab = rest.indexOf('\t')
        if (tab < 0) None
        else {
          val cols = org.json4s.jackson.JsonMethods.parse(rest.substring(tab + 1)) match {
            case JObject(fields) => fields.collect {
              case (c, JArray(List(mn, mx))) =>
                def s(j: JValue): Option[String] = j match {
                  case JString(x) => Some(x)
                  case _          => None
                }
                c -> (s(mn), s(mx))
            }.toMap
            case _ => Map.empty[String, (Option[String], Option[String])]
          }
          Some(rest.substring(0, tab) -> cols)
        }
      }
      .toMap
  }

  /** Write `df` into one fresh immutable data directory; returns its name.
    * With `zorderBy`, rows are clustered on the interleaved Z-curve key
    * ([[Lake.withZorderKey]]): unpartitioned tables range-partition on the
    * key first, so files cover DISJOINT Z-ranges and parquet footer stats
    * prune on every clustered dimension, not just a leading sort column.
    */
  private def writeDataDir(
      df: DataFrame,
      tableDir: String,
      parts: Seq[String],
      maxRecordsPerFile: Long,
      zorderBy: Seq[String] = Nil): String = {
    val name = java.util.UUID.randomUUID().toString
    val keyed = if (zorderBy.isEmpty) df else Lake.withZorderKey(df, zorderBy)
    val shaped =
      if (parts.nonEmpty)
        keyed.repartition(parts.map(col): _*)
      else if (zorderBy.nonEmpty)
        keyed.repartitionByRange(col(Lake.ZKey))
      else keyed
    val sorted =
      if (zorderBy.nonEmpty)
        shaped.sortWithinPartitions((parts.map(col) :+ col(Lake.ZKey)): _*)
      else shaped
    val writer0 = sorted.drop(Lake.ZKey)
      .write.mode("error").option("maxRecordsPerFile", maxRecordsPerFile)
    val writer = if (parts.nonEmpty) writer0.partitionBy(parts: _*) else writer0
    writer.parquet(s"$tableDir/data/$name")
    name
  }

  private def publishManifest(
      spark: SparkSession,
      tableDir: String,
      dirs: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      stats: Map[String, String] = Map.empty,
      blooms: Map[String, String] = Map.empty): Long = {
    val next = currentVersion(spark, tableDir).getOrElse(-1L) + 1
    val statsLines = dirs.flatMap(d => stats.get(d).map(j => s"$StatsHeader$d\t$j"))
    val bloomLines = dirs.flatMap(d => blooms.get(d).map(j => s"$BloomHeader$d\t$j"))
    val body = (SchemaHeader + schema.json) +: (statsLines ++ bloomLines ++ dirs)
    atomicWrite(spark, s"$tableDir/manifest", s"v=$next.txt", body.mkString("\n"))
    atomicWrite(spark, tableDir, Pointer, next.toString)
    next
  }

  /** Full-snapshot commit: the new version is exactly `df`. Data lands
    * fully before the pointer moves; a crash earlier leaves only
    * unreferenced garbage directories.
    */
  def commit(
      df: DataFrame,
      tableDir: String,
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000,
      statsCols: Seq[String] = Nil,
      bloom: Option[BloomConfig] = None): Long = {
    val d = writeDataDir(df, tableDir, parts, maxRecordsPerFile)
    val stats = columnStats(df, statsCols).map(d -> _).toMap
    val blooms = bloomJson(df, bloom).map(d -> _).toMap
    publishManifest(df.sparkSession, tableDir, Seq(d), nullableAll(df.schema), stats, blooms)
  }

  /** O(delta) append commit: writes ONLY the batch; the new manifest is
    * the prior version's directories plus the batch's. The
    * `foreachBatch` body for an atomically-published streaming ingest.
    * A batch may add columns: the committed schema is the union-by-name
    * of the prior version's and the batch's (see [[SchemaHeader]]), so
    * older directories read back with nulls in the new columns.
    */
  def appendCommit(
      df: DataFrame,
      tableDir: String,
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000,
      statsCols: Seq[String] = Nil,
      bloom: Option[BloomConfig] = None): Long = {
    val spark = df.sparkSession
    val cur = currentVersion(spark, tableDir)
    val prior = cur.map(v => manifest(spark, tableDir, v)).getOrElse(Nil)
    val priorSchema = cur.map { v =>
      versionSchema(spark, tableDir, v)
        .getOrElse(nullableAll(readVersion(spark, tableDir, v).schema))
    }
    // prior directories keep their stats and blooms verbatim (their data
    // is immutable); only the new batch is aggregated — the commit stays
    // O(delta)
    val priorStats = cur.map { v =>
      dirStats(spark, tableDir, v).map { case (dir, cols) =>
        dir -> statsJson(cols)
      }
    }.getOrElse(Map.empty)
    val priorBlooms = cur.map(v => dirBloomsRaw(spark, tableDir, v)).getOrElse(Map.empty)
    val d = writeDataDir(df, tableDir, parts, maxRecordsPerFile)
    val merged = priorSchema
      .map(p => mergeSchemas(p, df.schema))
      .getOrElse(nullableAll(df.schema))
    val stats = priorStats ++ columnStats(df, statsCols).map(d -> _).toMap
    val blooms = priorBlooms ++ bloomJson(df, bloom).map(d -> _).toMap
    publishManifest(spark, tableDir, prior :+ d, merged, stats, blooms)
  }

  /** Re-encode parsed stats for carry-forward into the next manifest. */
  private def statsJson(cols: Map[String, (Option[String], Option[String])]): String = {
    import org.json4s.JsonAST._
    val obj = JObject(cols.toList.sortBy(_._1).map { case (c, (mn, mx)) =>
      def v(o: Option[String]): JValue = o.map(JString(_): JValue).getOrElse(JNull)
      c -> (JArray(List(v(mn), v(mx))): JValue)
    })
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(obj))
  }

  private def nullableAll(
      s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(s.fields.map(_.copy(nullable = true)).toSeq)

  /** Read the published snapshot — only manifested directories resolve;
    * in-flight or crashed writers' directories are invisible.
    */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir,
      currentVersion(spark, tableDir)
        .getOrElse(throw new IllegalStateException(s"no published version in $tableDir")))

  /** Time travel: read a specific retained version. With a committed
    * schema (see [[SchemaHeader]]) the scan gets it explicitly — files
    * predating an added column return null for it; headerless legacy
    * manifests fall back to first-file schema inference.
    */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val dirs = manifest(spark, tableDir, version).map(d => s"$tableDir/data/$d")
    require(dirs.nonEmpty, s"version $version of $tableDir has an empty manifest")
    versionSchema(spark, tableDir, version) match {
      case Some(schema) => spark.read.schema(schema).parquet(dirs: _*)
      case None         => spark.read.parquet(dirs: _*)
    }
  }

  /** Range read with manifest-level data skipping: directories whose
    * committed [min,max] for `column` cannot intersect [lo,hi] are
    * dropped BEFORE the scan exists — zero file listing, zero footer IO
    * for them. Directories without stats for the column are kept
    * (conservative); an all-null directory is skipped because BETWEEN
    * never matches null. The surviving scan still applies the exact
    * filter, so results are identical to `read(...).filter(between)` —
    * the stats only decide what gets PLANNED.
    *
    * Comparison semantics: stats are stored as Spark string-casts and
    * compared numerically for numeric columns, lexicographically
    * otherwise — correct for strings, ISO dates, and Spark's
    * fixed-field-width timestamp rendering. `lo`/`hi` must render
    * (`toString`) in the same form, e.g. `"2024-01-01"` for a date
    * column. Pruning on other types is not attempted (kept
    * conservative).
    */
  def readBetween(
      spark: SparkSession,
      tableDir: String,
      column: String,
      lo: Any,
      hi: Any): DataFrame = {
    val cur = currentVersion(spark, tableDir)
      .getOrElse(throw new IllegalStateException(s"no published version in $tableDir"))
    val dirs = manifest(spark, tableDir, cur)
    val stats = dirStats(spark, tableDir, cur)
    val schemaOpt = versionSchema(spark, tableDir, cur)
    val dt = schemaOpt.flatMap(_.fields.find(_.name == column)).map(_.dataType)
    val numeric = dt.exists(_.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val prunable = numeric || dt.exists {
      case org.apache.spark.sql.types.StringType    => true
      case org.apache.spark.sql.types.DateType      => true
      case org.apache.spark.sql.types.TimestampType => true
      case _                                        => false
    }
    val loS = String.valueOf(lo)
    val hiS = String.valueOf(hi)
    // None = incomparable (e.g. NaN/Infinity renderings) -> keep the dir
    def cmp(a: String, b: String): Option[Int] =
      if (numeric) scala.util.Try(BigDecimal(a).compare(BigDecimal(b))).toOption
      else Some(a.compareTo(b))
    val keep = dirs.filter { d =>
      stats.get(d).flatMap(_.get(column)) match {
        case Some((Some(mn), Some(mx))) if prunable =>
          (cmp(mn, hiS), cmp(loS, mx)) match {
            case (Some(x), Some(y)) => x <= 0 && y <= 0
            case _                  => true
          }
        case Some((None, None)) => false // all-null directory: BETWEEN never matches
        case _                  => true  // no/partial stats or unprunable type
      }
    }
    val filter = dt match {
      case Some(t) => col(column).between(lit(lo).cast(t), lit(hi).cast(t))
      case None    => col(column).between(lit(lo), lit(hi))
    }
    if (keep.isEmpty) {
      val schema = schemaOpt.getOrElse(readVersion(spark, tableDir, cur).schema)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val paths = keep.map(d => s"$tableDir/data/$d")
      val base = schemaOpt match {
        case Some(schema) => spark.read.schema(schema).parquet(paths: _*)
        case None         => spark.read.parquet(paths: _*)
      }
      base.filter(filter)
    }
  }

  /** Point lookup with manifest-level Bloom skipping: directories whose
    * committed Bloom filter for `column` provably lacks `value` are
    * dropped BEFORE the scan is planned (min/max stats prune too when
    * present, but on a high-cardinality key uniformly spread across
    * batches they never fire — the Bloom is what makes "find this doc_id
    * in a year of commits" read one directory instead of 10^5).
    * Bloom positives may be false (≈1% at default sizing), so survivors
    * still apply the exact equality filter: results are identical to
    * `read(...).filter(col === value)`, the filters only decide what gets
    * PLANNED. Directories committed without a Bloom for the column are
    * read conservatively. `value` is cast to the column's committed type
    * before hashing — writer and probe use the same codegen'd xxhash64,
    * so they cannot disagree. Equality never matches null, so
    * `value=null` returns the empty frame.
    */
  def readPoint(
      spark: SparkSession,
      tableDir: String,
      column: String,
      value: Any): DataFrame = {
    val cur = currentVersion(spark, tableDir)
      .getOrElse(throw new IllegalStateException(s"no published version in $tableDir"))
    val dirs = manifest(spark, tableDir, cur)
    val schemaOpt = versionSchema(spark, tableDir, cur)
    val schema = schemaOpt.getOrElse(readVersion(spark, tableDir, cur).schema)
    val dt = schema.fields.find(_.name == column).map(_.dataType)
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    if (value == null) return empty
    val typedLit = dt.map(t => lit(value).cast(t)).getOrElse(lit(value))
    val blooms = dirBlooms(spark, tableDir, cur)
    val stats = dirStats(spark, tableDir, cur)
    // probe positions once per (bits, k) sizing present in the manifest,
    // via the same Spark expression that built the filters
    val posByCfg = blooms.values.flatMap(_.get(column)).map { case (m, k, _) => (m, k) }
      .toSet.map { cfg: (Int, Int) =>
        val ps = spark.range(1)
          .select(bloomPositions(typedLit, cfg._1, cfg._2).as("ps"))
          .head().getSeq[Long](0)
        cfg -> ps
      }.toMap
    val vS = String.valueOf(value)
    val numeric = dt.exists(_.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val prunable = numeric || dt.exists {
      case org.apache.spark.sql.types.StringType    => true
      case org.apache.spark.sql.types.DateType      => true
      case org.apache.spark.sql.types.TimestampType => true
      case _                                        => false
    }
    def cmp(a: String, b: String): Option[Int] =
      if (numeric) scala.util.Try(BigDecimal(a).compare(BigDecimal(b))).toOption
      else Some(a.compareTo(b))
    val keep = dirs.filter { d =>
      val bloomOk = blooms.get(d).flatMap(_.get(column)) match {
        case Some((m, k, bytes)) =>
          posByCfg((m, k)).forall { p =>
            val i = p.toInt
            (bytes(i >> 3) & (1 << (i & 7))) != 0
          }
        case None => true // committed without a bloom: conservative
      }
      val statsOk = stats.get(d).flatMap(_.get(column)) match {
        case Some((Some(mn), Some(mx))) if prunable =>
          (cmp(mn, vS), cmp(vS, mx)) match {
            case (Some(x), Some(y)) => x <= 0 && y <= 0
            case _                  => true
          }
        case Some((None, None)) => false // all-null directory
        case _                  => true
      }
      bloomOk && statsOk
    }
    if (keep.isEmpty) empty
    else {
      val paths = keep.map(d => s"$tableDir/data/$d")
      val base = schemaOpt match {
        case Some(s) => spark.read.schema(s).parquet(paths: _*)
        case None    => spark.read.parquet(paths: _*)
      }
      base.filter(col(column) === typedLit)
    }
  }

  /** Keyed upsert as a new full-snapshot version: updates replace
    * same-key rows, others append — streamed from the old version's
    * files into fresh directories with NO materialization barrier,
    * because nothing is overwritten.
    */
  def upsert(
      spark: SparkSession,
      tableDir: String,
      updates: DataFrame,
      keys: Seq[String],
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Long = {
    val existing = read(spark, tableDir)
    val survivors = existing.join(updates.select(keys.map(col): _*), keys, "left_anti")
    // allowMissingColumns: updates may carry new columns (survivors get
    // null) or omit existing ones (updates get null) — upserts evolve
    // the schema the same way appendCommit does
    commit(survivors.unionByName(updates, allowMissingColumns = true),
      tableDir, parts, maxRecordsPerFile)
  }

  /** OPTIMIZE: rewrite the published version's N data directories into
    * ONE and publish the compacted manifest as a new version — the
    * antidote to append-forever manifest growth (a year of 5-minute
    * micro-batches is ~10^5 directories per read without it). Runs as an
    * ordinary snapshot-isolated commit: readers of the old version keep
    * their files, prior versions stay time-travelable until [[vacuum]],
    * and a crash mid-rewrite leaves only an unreferenced directory. Data
    * and schema are byte-identical to the pre-optimize snapshot; only
    * the layout changes. Run it from the same maintenance cadence as
    * vacuum; on a real cluster, schedule by manifest length (e.g. every
    * 64 appends) so read-side file listing stays O(1)-ish.
    */
  /** `zorderBy` makes this OPTIMIZE ... ZORDER BY: the compacted rewrite
    * also co-clusters rows on 2-4 columns, so the one table rewrite the
    * compaction already pays buys multi-dimensional footer-stat pruning
    * too. With `statsCols` the layers stack: manifest stats skip whole
    * commits, Z-order footer stats skip row groups within survivors.
    */
  def optimize(
      spark: SparkSession,
      tableDir: String,
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000,
      statsCols: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil,
      bloom: Option[BloomConfig] = None): Long = {
    val cur = currentVersion(spark, tableDir)
      .getOrElse(throw new IllegalStateException(s"no published version in $tableDir"))
    val snapshot = readVersion(spark, tableDir, cur)
    val d = writeDataDir(snapshot, tableDir, parts, maxRecordsPerFile, zorderBy)
    val schema = versionSchema(spark, tableDir, cur).getOrElse(nullableAll(snapshot.schema))
    // a compaction merges N directories into one, so per-directory stats
    // and blooms must be recomputed over the union, not carried forward
    val stats = columnStats(snapshot, statsCols).map(d -> _).toMap
    val blooms = bloomJson(snapshot, bloom).map(d -> _).toMap
    publishManifest(spark, tableDir, Seq(d), schema, stats, blooms)
  }

  /** The [[optimize]] cadence as a one-liner for ingest loops: compact
    * only when the manifest has reached `maxDirs` directories, else do
    * nothing. Dropping this after [[appendCommit]] in a `foreachBatch`
    * body bounds read-side listing at O(maxDirs) forever while keeping
    * the amortized write amplification at one extra table rewrite per
    * `maxDirs` batches. Returns the new version when it compacted.
    */
  def optimizeIfNeeded(
      spark: SparkSession,
      tableDir: String,
      maxDirs: Int = 64,
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Option[Long] = {
    require(maxDirs >= 2, s"maxDirs must be >= 2, got $maxDirs")
    currentVersion(spark, tableDir)
      .filter(v => manifest(spark, tableDir, v).size >= maxDirs)
      .map(_ => optimize(spark, tableDir, parts, maxRecordsPerFile))
  }

  /** Drop manifests below the published version and every data directory
    * the current manifest no longer references — ends the time-travel
    * window, never touches the live snapshot.
    */
  def vacuum(spark: SparkSession, tableDir: String): Unit = {
    val f = fs(spark, tableDir)
    currentVersion(spark, tableDir).foreach { cur =>
      val live = manifest(spark, tableDir, cur).toSet
      val dataRoot = new org.apache.hadoop.fs.Path(s"$tableDir/data")
      if (f.exists(dataRoot))
        f.listStatus(dataRoot)
          .filter(s => s.isDirectory && !live(s.getPath.getName))
          .foreach(s => f.delete(s.getPath, true))
      val manRoot = new org.apache.hadoop.fs.Path(s"$tableDir/manifest")
      f.listStatus(manRoot)
        .filter { s =>
          s.getPath.getName.stripPrefix("v=").stripSuffix(".txt")
            .toLongOption.exists(_ < cur)
        }
        .foreach(s => f.delete(s.getPath, false))
    }
  }
}
