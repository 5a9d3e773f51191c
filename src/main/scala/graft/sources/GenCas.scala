package graft.sources

import org.apache.spark.sql.SparkSession

/** The exclusive-generation compare-and-swap both small metadata stores
  * ride ([[LakeProps]], [[LakeRefs]]): state is one opaque payload,
  * re-published whole as `dir/g=<n+1>.txt` through
  * [[VersionedLake.CommitStore.createExclusive]] — the same OCC fence
  * manifests use, so two concurrent mutations serialize and the loser
  * re-reads the winner's payload and re-applies. Zero-length generation
  * files (a committer crashed inside its open fence) heal after the
  * grace window; old generations retire keeping a few, so an in-flight
  * reader that already listed an older max can still open its file.
  */
private[sources] object GenCas {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** (newest generation, payload); (0, None) when none published. */
  def read(spark: SparkSession, genRoot: String): (Long, Option[String]) = {
    val f = fs(spark, genRoot)
    val root = new org.apache.hadoop.fs.Path(genRoot)
    val newest =
      if (!f.exists(root)) None
      else f.listStatus(root)
        .filter(_.getLen > 0)
        .flatMap(s =>
          s.getPath.getName.stripPrefix("g=").stripSuffix(".txt").toLongOption
            .map(_ -> s.getPath))
        .maxByOption(_._1)
    newest match {
      case None => (0L, None)
      case Some((g, p)) =>
        val in = f.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        (g, Some(text))
    }
  }

  /** CAS loop: re-read, re-apply `f`, publish the next generation
    * exclusively; a conflict re-bases and retries (bounded). Mutation
    * functions must be IDEMPOTENT on their own effect (re-applying onto
    * a state that already holds it must not error): the ABA guard below
    * can retry a mutation that actually landed.
    */
  def mutate(
      spark: SparkSession,
      genRoot: String)(f: Option[String] => String): Unit =
    VersionedLake.retryOnConflict() {
      val (gen, cur) = read(spark, genRoot)
      val next = gen + 1
      val name = s"g=$next.txt"
      val body = f(cur)
      try VersionedLake.createExclusive(spark, genRoot, name, body)
      catch {
        case e: VersionedLake.CommitConflictException =>
          val mp = new org.apache.hadoop.fs.Path(genRoot, name)
          val healed = scala.util.Try {
            val st = fs(spark, genRoot).getFileStatus(mp)
            st.getLen == 0 &&
              System.currentTimeMillis() - st.getModificationTime >
                VersionedLake.OrphanManifestGraceMs &&
              fs(spark, genRoot).delete(mp, false)
          }.getOrElse(false)
          if (!healed) throw e
          VersionedLake.createExclusive(spark, genRoot, name, body)
      }
      def listGens(): Seq[(Long, org.apache.hadoop.fs.Path)] =
        fs(spark, genRoot).listStatus(new org.apache.hadoop.fs.Path(genRoot))
          .flatMap(s =>
            s.getPath.getName.stripPrefix("g=").stripSuffix(".txt").toLongOption
              .map(_ -> s.getPath)).toSeq
      // ABA guard: retirement deletes generations < max-3, so a create
      // stalled past FOUR subsequent mutations can land on a slot that
      // was already used and retired — a SILENT lost update (readers
      // resolve the newer max). Detect the ambiguity after the create:
      // if the listing's max is >= next+4, our slot was inside the
      // retirement range when we claimed it; withdraw and retry loudly
      // (f re-applies on the winner state — hence the idempotence
      // contract above).
      val maxNow = scala.util.Try(listGens().map(_._1).maxOption)
        .toOption.flatten.getOrElse(next)
      if (maxNow >= next + 4) {
        scala.util.Try(
          fs(spark, genRoot).delete(
            new org.apache.hadoop.fs.Path(genRoot, name), false)): Unit
        throw new VersionedLake.CommitConflictException(
          s"$genRoot/$name raced past the retirement horizon (max $maxNow); re-basing")
      }
      // retire old generations best-effort: only slots BOTH below the
      // keep-window AND older than the grace period — an in-flight
      // CAS'er inside the grace window can never have its claimed slot
      // deleted out from under it
      scala.util.Try {
        val cutoff = System.currentTimeMillis() - VersionedLake.OrphanManifestGraceMs
        val f2 = fs(spark, genRoot)
        listGens()
          .filter(_._1 < next - 3)
          .foreach { case (_, p) =>
            val st = f2.getFileStatus(p)
            if (st.getModificationTime < cutoff) f2.delete(p, false): Unit
          }
      }: Unit
    }
}
