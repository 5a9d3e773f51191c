package graft.sources

import org.apache.spark.sql.SparkSession

/** MULTI-TABLE ATOMIC COMMIT: run several lake writes as ONE
  * all-or-nothing transaction — the FK-consistent star-load shape
  * (reference behavior: the pipeline loads parent tables before
  * children in one process, `/root/reference/parser/xml.py:596-604`;
  * distributed, a mirror sync of an FK-related pair must never be
  * observable half-applied).
  *
  * Protocol — two-phase commit whose single atomic point is one
  * [[VersionedLake.CommitStore.createExclusive]] on a DECISION file:
  *
  *   1. STAGE. The write thunks run under a staging context:
  *      every library commit inside executes fully (data directories
  *      written durable, manifest bodies computed against each table's
  *      current version) but [[VersionedLake.publishManifest]] registers
  *      the (table, version, body) intent instead of claiming.
  *   2. CLAIM. Each table's `v=N.txt` slot is claimed exclusively with
  *      the manifest body PREFIXED by `#txn2pc:<decision-path>` — the
  *      per-table OCC fence is unchanged, so a concurrent single-table
  *      writer conflicts exactly as it would against an open fence. A
  *      lost claim rolls the already-claimed slots back (no decision
  *      exists yet, so they are dead by construction) and the whole
  *      stage re-runs re-based.
  *   3. DECIDE. `createExclusive(decisionPath, "commit")` — the commit
  *      point. From this instant every participating table's pending
  *      manifest is reader-visible ([[VersionedLake.currentVersion]]
  *      resolves the marker through the decision), so no interleaving
  *      of reads and crashes observes table A at its new version with
  *      table B at its old one: before the decision, ALL pending
  *      versions are invisible; after, ALL are visible.
  *   4. FINALIZE (hygiene). Each manifest rewrites without the marker
  *      (atomic replace) and the pointer hint advances. A crash
  *      anywhere here is harmless: readers resolve the marker through
  *      the decision, and the next committer's claim-conflict heal
  *      finalizes on its behalf.
  *
  * Crash healing: a coordinator that dies BEFORE deciding leaves
  * pending manifests that block their tables (like any open fence);
  * once stale beyond [[VersionedLake.OrphanManifestGraceMs]], any later
  * committer races `abort` into the decision slot (createExclusive — a
  * resurrected coordinator cannot commit after that) and reclaims. A
  * coordinator that dies AFTER deciding left a committed txn; healers
  * finalize it. DECIDED decision files are never deleted (an aborted
  * txn's pending manifest may still be cached somewhere; the decision
  * is the permanent record) — only a ZERO-LENGTH decision file (a
  * coordinator crashed inside the decision create itself) heals away
  * after the grace window, so the abort race can land instead of
  * conflicting on the empty fence forever.
  *
  * Scope: all participating tables must share a commit store (the
  * decision file rides the same store primitives). The transaction
  * holds no locks and scans nothing itself — cost is the writes' own
  * cost plus one decision-file create, so a 100-table atomic sync pays
  * 100 ordinary commits + 1 create.
  */
object LakeAtomicTxn {

  /** Registered intent of one staged publish. */
  private[sources] final case class Staged(tableDir: String, version: Long, body: String)

  private[sources] final class Staging {
    private[sources] val staged = scala.collection.mutable.ArrayBuffer.empty[Staged]
    def register(tableDir: String, version: Long, body: String): Unit = {
      require(!staged.exists(_.tableDir == tableDir),
        s"a LakeTxn stages at most one commit per table; $tableDir staged twice " +
          "(compose the writes into one commit, or run two transactions)")
      staged += Staged(tableDir, version, body)
    }
  }

  private[sources] val staging = new ThreadLocal[Staging]

  /** Decision paths THIS thread treats as committed while resolving
    * pending manifests — the mechanism that lets a multi-commit branch
    * ([[LakeWap.write]]) base its next staged commit on the chain tip:
    * inside the override, `currentVersion` resolves the branch's own
    * pending manifests as if published, while every other reader and
    * writer still sees them as invisible fences. Thread-local by
    * design: visibility leaks nowhere.
    */
  private[sources] val assumeDecided = new ThreadLocal[Set[String]]

  private[sources] def withAssumedDecision[T](decisionPath: String)(f: => T): T = {
    val prev = assumeDecided.get()
    assumeDecided.set(Option(prev).getOrElse(Set.empty) + decisionPath)
    try f
    finally if (prev == null) assumeDecided.remove() else assumeDecided.set(prev)
  }

  /** Run `write` under a fresh staging context and return what it
    * staged. Staging does NOT nest — a commitAll/WAP inside another's
    * writes would silently swap the outer context out and let later
    * writes publish OUTSIDE the transaction, so it refuses up front.
    */
  private[sources] def stage(write: => Unit): Staging = {
    require(staging.get() == null,
      "LakeAtomicTxn/WAP staging cannot nest: a transaction's writes must " +
        "not open another transaction (compose the writes into one)")
    val st = new Staging
    staging.set(st)
    try write finally staging.remove()
    st
  }

  /** Run `writes` (each an ordinary library-write call against its own
    * table) as ONE atomic transaction. Returns the published version per
    * table in staging order. `txnDir` hosts the decision file — any
    * directory on the same commit store as the tables (conventionally
    * one of the tables' roots).
    */
  def commitAll(spark: SparkSession, txnDir: String)(writes: => Unit): Seq[Long] =
    VersionedLake.retryOnConflict(maxAttempts = 8) {
      val st = stage(writes)
      if (st.staged.isEmpty) return Nil
      val txnId = java.util.UUID.randomUUID().toString
      val decisionDir = s"$txnDir/txn2pc"
      val decisionPath = s"$decisionDir/$txnId.txt"
      // CLAIM each slot with the pending marker; on a lost race, roll
      // back our own dead claims (no decision file exists yet, so they
      // can never become visible) and rethrow into the retry loop —
      // the stage re-runs against the winner's new state
      val claimed = scala.collection.mutable.ArrayBuffer.empty[Staged]
      try {
        st.staged.foreach { s =>
          // the healing claim: a crashed fence or dead txn in the slot
          // heals; a live conflict rethrows into the rollback below
          VersionedLake.claimManifestSlot(spark, s.tableDir, s.version,
            s"${VersionedLake.Txn2pcHeader}$decisionPath\n${s.body}")
          claimed += s
        }
      } catch {
        // ANY failure mid-claim (conflict, store IO error) rolls the
        // already-claimed slots back — leaking them would fence every
        // claimed table for the full grace window. Each delete first
        // verifies the slot still carries OUR marker: a healer may have
        // aborted a stalled claim and another writer re-claimed the same
        // version number, and deleting that would destroy their commit.
        case scala.util.control.NonFatal(e) =>
          claimed.foreach(s => scala.util.Try {
            if (VersionedLake.txn2pcDecisionPath(spark, s.tableDir, s.version)
              .contains(decisionPath)) {
              VersionedLake.fsOf(spark, s.tableDir).delete(
                new org.apache.hadoop.fs.Path(s"${s.tableDir}/manifest",
                  s"v=${s.version}.txt"), false)
              VersionedLake.invalidateManifestCache(s.tableDir, s.version)
            }
          })
          throw e
      }
      // DECIDE — the one atomic point. This create can only conflict
      // with a healer that aborted us (our claims sat stale beyond the
      // grace window, e.g. a long GC pause); treat that as the conflict
      // it is.
      try VersionedLake.createExclusive(spark, decisionDir, s"$txnId.txt", "commit")
      catch {
        case e: VersionedLake.CommitConflictException =>
          throw new VersionedLake.CommitConflictException(
            s"LakeTxn $txnId was aborted by a healer before deciding: ${e.getMessage}")
      }
      // FINALIZE (hygiene; crash-safe — see scaladoc)
      st.staged.foreach(s => finalizePending(spark, s.tableDir, s.version))
      st.staged.map(_.version).toSeq
    }

  /** Strip a committed pending manifest's marker (atomic replace) and
    * advance the pointer hint. Idempotent; safe to run on behalf of a
    * crashed coordinator — only ever called for decided-commit txns.
    */
  private[sources] def finalizePending(
      spark: SparkSession,
      tableDir: String,
      version: Long): Unit = scala.util.Try {
    val p = new org.apache.hadoop.fs.Path(s"$tableDir/manifest", s"v=$version.txt")
    val lines = VersionedLake.readSmallFileAt(spark, tableDir, p).linesIterator.toSeq
    if (lines.headOption.exists(_.startsWith(VersionedLake.Txn2pcHeader))) {
      VersionedLake.atomicWriteAt(spark, s"$tableDir/manifest", s"v=$version.txt",
        lines.drop(1).mkString("\n"))
      VersionedLake.advancePointer(spark, tableDir, version)
    }
  }: Unit
}
