package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based randomized check of the lake's row-level semantics: a
  * seeded random sequence of mutations (append, CoW/MoR upsert and
  * delete, predicate delete/update, compaction, materialization,
  * metadata-only rename) runs against BOTH the real table and a
  * driver-side reference model; after every operation the table must
  * read back exactly the model, and at the end the CDC feed replayed
  * from v0 must reproduce the final snapshot. One seeded trajectory —
  * deterministic, debuggable — covering operator INTERLEAVINGS the
  * per-operator specs can't enumerate (e.g. a MoR delete folded by a
  * compaction, then renamed, then CoW-upserted).
  */
class VersionedLakeModelSpec extends SparkSpec {

  test("30 random interleaved mutations: table == model after each; CDC replays the end state") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_model").toString
    val rnd = new scala.util.Random(4211L)

    // model: id -> payload, under the CURRENT logical column name
    var model = Map.empty[Long, String]
    var nextId = 0L
    var colName = "payload"
    var pendingMor = false // CoW ops must materialize first

    def freshIds(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n)
      nextId += n
      ids
    }
    def existing(n: Int): Seq[Long] =
      rnd.shuffle(model.keys.toSeq).take(n)
    def df(rows: Seq[(Long, String)]) = rows.toDF("id", colName)

    // v0: seed
    val seed = freshIds(20).map(i => i -> s"s$i")
    VersionedLake.appendCommit(df(seed), dir, statsCols = Seq("id"))
    model = seed.toMap

    def check(op: String): Unit = {
      val got = VersionedLake.read(s, dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === model, s"table diverged from model after $op")
    }

    for (step <- 1 to 30) {
      val op = rnd.nextInt(9)
      op match {
        case 0 => // append fresh rows
          val rows = freshIds(1 + rnd.nextInt(5)).map(i => i -> s"a$step-$i")
          VersionedLake.appendCommit(df(rows), dir, statsCols = Seq("id"))
          model ++= rows
          check(s"append@$step")
        case 1 => // CoW keyed upsert: update some + insert some
          if (pendingMor) { VersionedLake.materializeDeletes(s, dir); pendingMor = false }
          val upd = existing(rnd.nextInt(4)).map(i => i -> s"u$step-$i")
          val ins = freshIds(rnd.nextInt(3)).map(i => i -> s"n$step-$i")
          if ((upd ++ ins).nonEmpty) {
            VersionedLake.upsert(s, dir, df(upd ++ ins), keys = Seq("id"))
            model ++= upd ++ ins
            check(s"upsert@$step")
          }
        case 2 => // MoR upsert
          val upd = existing(rnd.nextInt(4)).map(i => i -> s"m$step-$i")
          val ins = freshIds(rnd.nextInt(3)).map(i => i -> s"o$step-$i")
          if ((upd ++ ins).nonEmpty) {
            VersionedLake.upsertMor(s, dir, df(upd ++ ins), keys = Seq("id"))
            model ++= upd ++ ins
            pendingMor = true
            check(s"upsertMor@$step")
          }
        case 3 => // CoW keyed delete
          if (pendingMor) { VersionedLake.materializeDeletes(s, dir); pendingMor = false }
          val ids = existing(1 + rnd.nextInt(3))
          if (ids.nonEmpty) {
            VersionedLake.deleteKeys(s, dir, ids.toDF("id"), Seq("id"))
            model --= ids
            check(s"deleteKeys@$step")
          }
        case 4 => // MoR keyed delete
          val ids = existing(1 + rnd.nextInt(3))
          if (ids.nonEmpty) {
            VersionedLake.deleteKeysMor(s, dir, ids.toDF("id"), Seq("id"))
            model --= ids
            pendingMor = true
            check(s"deleteKeysMor@$step")
          }
        case 5 => // predicate delete (modulus band)
          if (pendingMor) { VersionedLake.materializeDeletes(s, dir); pendingMor = false }
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          VersionedLake.deleteWhere(s, dir, col("id") % m === r)
          model = model.filter { case (i, _) => i % m != r }
          check(s"deleteWhere%$m=$r@$step")
        case 6 => // predicate update (append a suffix)
          if (pendingMor) { VersionedLake.materializeDeletes(s, dir); pendingMor = false }
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          VersionedLake.updateWhere(s, dir, col("id") % m === r,
            Map(colName -> concat(col(colName), lit(s"+$step"))))
          model = model.map { case (i, v) =>
            i -> (if (i % m == r) s"$v+$step" else v)
          }
          check(s"updateWhere@$step")
        case 7 => // compaction (folds MoR debt too)
          VersionedLake.optimize(s, dir, statsCols = Seq("id"))
          pendingMor = false
          check(s"optimize@$step")
        case 8 => // metadata-only rename to a fresh name (former names can
          // never be rebound — the guard the rename chain exists to keep)
          if (pendingMor) { VersionedLake.materializeDeletes(s, dir); pendingMor = false }
          val to = s"payload_$step"
          VersionedLake.renameColumn(s, dir, colName, to)
          colName = to
          check(s"rename->$to@$step")
      }
    }

    // the end-to-end CDC pin: replaying the whole feed over an empty
    // start reproduces the final snapshot — every interleaving above
    // must have produced a replayable, exactly-once event history
    val cur = VersionedLake.currentVersion(s, dir).get
    val feed = VersionedLake.readRowChanges(s, dir, -1L, cur)
    val added = feed.filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("id"), col(colName))
    val removed = feed.filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col("id"), col(colName))
    val replayed = added.exceptAll(removed)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replayed === model,
      "CDC feed replay from v0 must reproduce the final snapshot exactly")
  }
}
