package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WRITE-AUDIT-PUBLISH on one table: stage a commit INVISIBLY, read and
  * audit exactly what would publish, then make it visible with one
  * atomic decision — or abort without a trace. The staged version rides
  * the [[LakeAtomicTxn]] pending-manifest machinery (marker + decision file),
  * and a named BRANCH ref points at it so the audit side can find it by
  * name (`VERSION AS OF 'staging'` through the catalog).
  *
  *   - WRITE: [[begin]] runs an ordinary library write under staging;
  *     the data lands durable, the manifest claims the next version
  *     slot PENDING — invisible to every reader, exactly like an
  *     in-flight commit.
  *   - AUDIT: [[read]] (or time travel to the branch name) reads the
  *     staged snapshot: the full would-be table, not just the batch —
  *     DQ suites, row counts, FK checks all run against the real thing.
  *   - PUBLISH: [[publish]] writes `commit` into the decision slot —
  *     the same single-create atomic point as a multi-table txn; every
  *     reader sees the version from that instant. [[abort]] writes
  *     `abort` and removes the claim; nothing was ever visible.
  *
  * Concurrency contract (deliberate, documented): the staged claim
  * fences the table like any in-flight commit, so concurrent writers
  * conflict-and-retry until the decision; an auditor that dies leaves
  * the fence to the standard orphan heal ([[VersionedLake.OrphanManifestGraceMs]])
  * — a healer aborts the undecided txn via its decision slot, after
  * which [[publish]] here fails LOUDLY (the decision createExclusive
  * lost) instead of resurrecting half a workflow. Audit promptly; a
  * dead auditor can never wedge the table.
  */
object LakeWap {

  /** Handle of one staged branch. `version` is the chain TIP (what the
    * audit reads and the branch ref points at); `versions` is the full
    * pending chain oldest-first — [[begin]] stages one commit, each
    * [[write]] appends another, and [[publish]]/[[abort]] decide the
    * WHOLE chain through the one decision file.
    */
  final case class Staged(
      tableDir: String,
      branch: String,
      version: Long,
      decisionDir: String,
      decisionName: String,
      versions: Seq[Long] = Nil) {
    def chain: Seq[Long] = if (versions.isEmpty) Seq(version) else versions
    private[sources] def decisionPath: String = s"$decisionDir/$decisionName"
  }

  /** Stage `write` (exactly one commit against `tableDir`) invisibly
    * and point branch ref `branch` at the staged version.
    */
  def begin(
      spark: SparkSession,
      tableDir: String,
      branch: String)(write: => Unit): Staged = {
    // refuse a taken branch name BEFORE doing any work: a leaked ref
    // from a crashed WAP (its claim healed, its ref did not) must fail
    // here, not after a fresh claim is already fencing the table
    require(LakeRefs.resolve(spark, tableDir, branch).isEmpty,
      s"branch '$branch' already exists on $tableDir - a crashed WAP's " +
        "leftover ref? Inspect/audit it, then LakeRefs.drop it first")
    VersionedLake.retryOnConflict(maxAttempts = 8) {
      val st = LakeAtomicTxn.stage(write)
      require(st.staged.size == 1 && st.staged.head.tableDir == tableDir,
        s"a WAP stages exactly ONE commit against $tableDir; " +
          s"got ${st.staged.size} staged writes")
      val sg = st.staged.head
      val txnId = s"wap-$branch-${java.util.UUID.randomUUID()}"
      val decisionDir = s"$tableDir/txn2pc"
      val decisionPath = s"$decisionDir/$txnId.txt"
      VersionedLake.claimManifestSlot(spark, tableDir, sg.version,
        s"${VersionedLake.Txn2pcHeader}$decisionPath\n${sg.body}")
      val staged = Staged(tableDir, branch, sg.version, decisionDir, s"$txnId.txt",
        versions = Seq(sg.version))
      // anything failing after the claim (a racing ref create, a store
      // error) must not leave an undecided fence on the table: abort
      // our own claim before surfacing
      try LakeRefs.branch(spark, tableDir, branch, sg.version)
      catch {
        case t: Throwable =>
          scala.util.Try(abort(spark, staged))
          throw t
      }
      staged
    }
  }

  /** Stage ANOTHER commit on the branch — the real write-audit-publish
    * window shape (a backfill lands, then corrections, then ONE audit
    * and one atomic publish). The new write bases on the chain TIP, not
    * the published table: inside this call the thread resolves the
    * branch's own pending manifests as committed
    * ([[LakeAtomicTxn.withAssumedDecision]]), so an upsert here sees
    * [[begin]]'s rows — while every other reader and writer still sees
    * the whole chain as one invisible fence. The new manifest rides the
    * SAME decision file, so publish/abort stay a single atomic point
    * for the entire chain. Returns the advanced handle (old handles go
    * stale — the branch ref has moved past them).
    */
  def write(spark: SparkSession, staged: Staged)(w: => Unit): Staged = {
    require(LakeRefs.resolve(spark, staged.tableDir, staged.branch)
      .contains(staged.version),
      s"branch '${staged.branch}' no longer points at v${staged.version}; " +
        "stage further writes through the handle that owns the branch")
    val st = LakeAtomicTxn.withAssumedDecision(staged.decisionPath) {
      val st0 = LakeAtomicTxn.stage(w)
      require(st0.staged.size == 1 && st0.staged.head.tableDir == staged.tableDir,
        s"a WAP write stages exactly ONE commit against ${staged.tableDir}; " +
          s"got ${st0.staged.size} staged writes")
      val sg = st0.staged.head
      require(sg.version == staged.version + 1,
        s"staged v${sg.version} does not extend the chain tip v${staged.version} " +
          "- a concurrent commit moved the table? Abort and rerun the flow")
      VersionedLake.claimManifestSlot(spark, staged.tableDir, sg.version,
        s"${VersionedLake.Txn2pcHeader}${staged.decisionPath}\n${sg.body}")
      st0
    }
    val tip = st.staged.head.version
    // advance the branch ref with a value-level CAS; a failure must not
    // leave the freshly-claimed slot fencing the table
    val moved =
      try LakeRefs.repointIf(spark, staged.tableDir, staged.branch, staged.version, tip)
      catch {
        case t: Throwable =>
          scala.util.Try(dropClaim(spark, staged, tip))
          throw t
      }
    if (!moved) {
      scala.util.Try(dropClaim(spark, staged, tip))
      throw new IllegalStateException(
        s"branch '${staged.branch}' was re-pointed under this handle; " +
          "the new owner's chain wins")
    }
    staged.copy(version = tip, versions = staged.chain :+ tip)
  }

  /** Remove ONE of our own undecided claims (same our-marker guard as
    * [[abort]]).
    */
  private def dropClaim(spark: SparkSession, staged: Staged, v: Long): Unit =
    if (VersionedLake.txn2pcDecisionPath(spark, staged.tableDir, v)
      .contains(staged.decisionPath)) {
      VersionedLake.fsOf(spark, staged.tableDir).delete(
        new org.apache.hadoop.fs.Path(s"${staged.tableDir}/manifest", s"v=$v.txt"),
        false): Unit
      VersionedLake.invalidateManifestCache(staged.tableDir, v)
    }

  /** The staged snapshot — the full table as it WOULD read after
    * publish (pending manifests parse normally; only head resolution
    * hides them). Reads the chain TIP: the audit sees every staged
    * write at once.
    */
  def read(spark: SparkSession, staged: Staged): DataFrame =
    VersionedLake.readVersion(spark, staged.tableDir, staged.version)

  /** The atomic swap to main: from this instant every reader resolves
    * the staged version. Throws [[VersionedLake.CommitConflictException]]
    * when a healer aborted the staging first (audit outlived the grace
    * window under writer pressure) — rerun the flow.
    */
  def publish(spark: SparkSession, staged: Staged): Long = {
    // the branch must still point at OUR staged version: a re-pointed
    // branch means another attempt owns the name now, and publishing a
    // stale handle under it would silently ship the wrong audit
    require(LakeRefs.resolve(spark, staged.tableDir, staged.branch)
      .forall(_ == staged.version),
      s"branch '${staged.branch}' was re-pointed under this audit; " +
        "publish the current staging or abort this handle")
    try VersionedLake.createExclusive(
      spark, staged.decisionDir, staged.decisionName, "commit")
    catch {
      case e: VersionedLake.CommitConflictException =>
        throw new VersionedLake.CommitConflictException(
          s"WAP '${staged.branch}' on ${staged.tableDir} was aborted by a " +
            s"healer before publish: ${e.getMessage}")
    }
    // the whole chain became visible at the decision instant; finalize
    // oldest-first so the pointer hint only ever advances
    staged.chain.foreach(v =>
      LakeAtomicTxn.finalizePending(spark, staged.tableDir, v))
    // retire the branch ONLY while it still points at this staging
    // (value-level CAS): a re-pointed ref belongs to its new owner
    scala.util.Try(LakeRefs.dropIf(spark, staged.tableDir, staged.branch,
      staged.version)): Unit
    staged.version
  }

  /** Abort: decide against the staged version and remove the claim.
    * Idempotent against a healer that aborted first; refuses (loudly)
    * if the txn was already PUBLISHED.
    */
  def abort(spark: SparkSession, staged: Staged): Unit = {
    try VersionedLake.createExclusive(
      spark, staged.decisionDir, staged.decisionName, "abort")
    catch {
      case _: VersionedLake.CommitConflictException =>
        val decided = VersionedLake.txn2pcDecision(spark, staged.tableDir,
          s"${staged.decisionDir}/${staged.decisionName}")
        require(!decided.contains("commit"),
          s"WAP '${staged.branch}' was already PUBLISHED; abort is impossible")
    }
    // delete the slots ONLY while they still carry OUR marker: a healer
    // may have aborted this claim already and another writer re-claimed
    // (and even committed) the same version number — an unconditional
    // delete here would destroy that writer's manifest. Newest-first so
    // an interrupted abort never leaves a chain gap below a survivor.
    staged.chain.reverse.foreach(v =>
      scala.util.Try(dropClaim(spark, staged, v)): Unit)
    scala.util.Try(LakeRefs.dropIf(spark, staged.tableDir, staged.branch,
      staged.version)): Unit
  }
}
