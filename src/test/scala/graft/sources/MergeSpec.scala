package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE contract (Tables.merge): latest-change-wins semantics on a
  * hand-checkable base, idempotence, and the window-free scale plan. */
class MergeSpec extends SparkSpecBase {

  import spark.implicits._

  private def base: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")

  // change log: update k=1, delete k=2, insert k=9, update-then-update
  // k=3 (seq 1 then 2 — only seq 2 may survive), delete-then-reinsert
  // k=4 (the row must SURVIVE with the seq-2 payload)
  private def changes: DataFrame =
    Seq(
      (1L, 1L, "U", "a2", 11.0),
      (2L, 1L, "D", "b", 20.0),
      (9L, 1L, "U", "new", 99.0),
      (3L, 1L, "U", "stale", -1.0),
      (3L, 2L, "U", "c2", 33.0),
      (4L, 1L, "D", "d", 40.0),
      (4L, 2L, "U", "d2", 44.0)
    ).toDF("k", "seq", "op", "name", "v")

  test("merge applies update / delete / insert / supersede / re-insert") {
    val out = Tables.merge(base, changes, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a2", 11.0), // updated
      // 2 deleted
      (3L, "c2", 33.0), // second update wins; "stale" gone entirely
      (4L, "d2", 44.0), // re-inserted after delete
      (9L, "new", 99.0) // inserted
    ))
  }

  test("merge of an empty change batch is the identity") {
    val out = Tables.merge(base, changes.limit(0), Seq("k"))
    assert(out.orderBy("k").collect().toSeq ==
      base.orderBy("k").collect().toSeq)
  }

  test("merge is idempotent: re-applying the same batch is a no-op") {
    val once = Tables.merge(base, changes, Seq("k"))
    val twice = Tables.merge(once, changes, Seq("k"))
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("merge plan has no window and the base side carries no exchange") {
    val plan = Tables.merge(base, changes, Seq("k"))
      .queryExecution.executedPlan.toString()
    // latest-per-key must be the partial max(struct) aggregate, never a
    // per-key sort window (the closed r13 single-reducer class)
    assert(!plan.contains("Window"), plan)
    // the anti-join's key side is broadcast (executor-small change
    // batch), so the base snapshot never crosses the network
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("entry-shaped merge over orders: counts reconcile path by path") {
    val o = Tables.orders(spark, sfDir)
    val merged = Tables.merge(o, Tables.ordersChanges(spark, sfDir), Seq("o_orderkey"))
    val n = o.count()
    val deleted = o.where("o_orderkey % 10 = 7 AND o_orderkey % 40 != 7").count()
    val inserted = o.where("o_orderkey % 100 = 11").count()
    assert(merged.count() == n - deleted + inserted)
    // latest-wins: every %20==3 key shows the seq-2 status Q, never P
    assert(merged.where("o_orderkey % 20 = 3 AND o_orderstatus != 'Q'").count() == 0)
    assert(merged.where("o_orderkey % 40 = 7 AND o_orderstatus != 'R'").count() == 0)
    // untouched rows pass through bit-identical
    val untouched = merged.join(o.where("o_orderkey % 10 NOT IN (3, 7)")
        .select(col("o_orderkey").as("uk")), $"o_orderkey" === $"uk", "left_semi")
    val orig = o.where("o_orderkey % 10 NOT IN (3, 7)")
    assert(untouched.exceptAll(orig).count() == 0 &&
      orig.exceptAll(untouched).count() == 0)
  }

  // ------------------------------------------------ streaming CDC apply

  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.as[(Long, String, Double)].collect().toSet

  test("versioned batch-by-batch apply equals the one-shot merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      assert(rows(Tables.readSnapshot(spark, dir)) ==
        rows(Tables.merge(base, changes, Seq("k"))))
      // every intermediate version stays readable (snapshot isolation)
      assert(rows(spark.read.parquet(s"$dir/v0")) == rows(base))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("applyChangeBatch retry re-merges onto the ORIGINAL parent, not its own output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      val afterFirst = rows(spark.read.parquet(s"$dir/v1"))
      // a foreachBatch replay after a crash-between-write-and-offset-commit:
      // same batch, same version — must succeed (reading the latest would
      // hand the merge its own output and Spark would refuse the overwrite)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      assert(rows(spark.read.parquet(s"$dir/v1")) == afterFirst)
      // and a batch whose parent never committed fails loud
      intercept[IllegalArgumentException] {
        Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 9L)
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("readSnapshot ignores a torn version (no _SUCCESS marker)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      // a crash mid-write leaves v7 without its commit marker
      base.limit(1).write.parquet(s"$dir/v7")
      assert(new java.io.File(s"$dir/v7/_SUCCESS").delete())
      assert(rows(Tables.readSnapshot(spark, dir)) == rows(base))
      intercept[IllegalArgumentException] {
        Tables.readSnapshot(spark, java.nio.file.Files.createTempDirectory("graft_empty").toString)
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("time travel: readSnapshotAt pins each committed version exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      // VERSION AS OF k == the change-log prefix applied to the base
      assert(rows(Tables.readSnapshotAt(spark, dir, 0L)) == rows(base))
      assert(rows(Tables.readSnapshotAt(spark, dir, 1L)) ==
        rows(Tables.merge(base, changes.where($"seq" === 1), Seq("k"))))
      assert(rows(Tables.readSnapshotAt(spark, dir, 2L)) ==
        rows(Tables.merge(base, changes, Seq("k"))))
      assert(Tables.snapshotHistory(spark, dir) == Seq(0L, 1L, 2L))
      // a missing version fails loud, never silently reads a neighbor
      intercept[IllegalArgumentException] {
        Tables.readSnapshotAt(spark, dir, 3L)
      }
      // a torn version (no _SUCCESS) is invisible to time travel too
      base.limit(1).write.parquet(s"$dir/v7")
      assert(new java.io.File(s"$dir/v7/_SUCCESS").delete())
      intercept[IllegalArgumentException] {
        Tables.readSnapshotAt(spark, dir, 7L)
      }
      assert(Tables.snapshotHistory(spark, dir) == Seq(0L, 1L, 2L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("snapshotChanges: U/D classes, NET semantics across ranges, loud on bad ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      def diff(a: Long, b: Long): Set[(Long, String, String, Double)] =
        Tables.snapshotChanges(spark, dir, Seq("k"), a, b)
          .as[(Long, String, String, Double)].collect().toSet
      // v0 -> v1: update, delete, insert, the seq-1 intermediate states
      assert(diff(0L, 1L) == Set(
        (1L, "U", "a2", 11.0), (2L, "D", "b", 20.0), (3L, "U", "stale", -1.0),
        (4L, "D", "d", 40.0), (9L, "U", "new", 99.0)))
      // v1 -> v2: only the seq-2 effects (supersede + re-insert)
      assert(diff(1L, 2L) == Set((3L, "U", "c2", 33.0), (4L, "U", "d2", 44.0)))
      // v0 -> v2 is NET: the superseded 'stale' state and the k=4
      // delete-then-reinsert intermediate never appear
      assert(diff(0L, 2L) == Set(
        (1L, "U", "a2", 11.0), (2L, "D", "b", 20.0), (3L, "U", "c2", 33.0),
        (4L, "U", "d2", 44.0), (9L, "U", "new", 99.0)))
      intercept[IllegalArgumentException] { diff(2L, 1L) }
      intercept[IllegalArgumentException] { diff(1L, 5L) } // v5 not committed
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("vacuum retention: old versions drop, latest + time travel stay consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      val latest = rows(Tables.readSnapshot(spark, dir))
      assert(Tables.vacuumSnapshots(spark, dir, keepLast = 2) == Seq(0L))
      assert(Tables.snapshotHistory(spark, dir) == Seq(1L, 2L))
      // the surviving versions read exactly as before the vacuum
      assert(rows(Tables.readSnapshot(spark, dir)) == latest)
      assert(rows(Tables.readSnapshotAt(spark, dir, 1L)).nonEmpty)
      // a vacuumed version fails loud, exactly like a never-committed one
      intercept[IllegalArgumentException] { Tables.readSnapshotAt(spark, dir, 0L) }
      // history metadata dropped the vacuumed row and kept the others
      val hist = Tables.snapshotHistoryMeta(spark, dir)
        .as[(Long, String, Long)].collect().toSet
      assert(hist.map(_._1) == Set(1L, 2L))
      assert(hist.forall(_._2 == "MERGE"))
      // keepLast must retain at least the newest version
      intercept[IllegalArgumentException] {
        Tables.vacuumSnapshots(spark, dir, keepLast = 0)
      }
      assert(Tables.vacuumSnapshots(spark, dir, keepLast = 1) == Seq(1L))
      assert(rows(Tables.readSnapshot(spark, dir)) == latest)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("vacuum never deletes a pinned version; unpin releases it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      Tables.pinSnapshot(spark, dir, 1L, "reader-a")
      // pinning an uncommitted version fails loud
      intercept[IllegalArgumentException] {
        Tables.pinSnapshot(spark, dir, 9L, "reader-a")
      }
      assert(Tables.vacuumSnapshots(spark, dir, keepLast = 1) == Seq(0L))
      // the pinned reader still sees its version
      assert(rows(Tables.readSnapshotAt(spark, dir, 1L)).nonEmpty)
      Tables.unpinSnapshot(spark, dir, 1L, "reader-a")
      assert(Tables.vacuumSnapshots(spark, dir, keepLast = 1) == Seq(1L))
      assert(Tables.snapshotHistory(spark, dir) == Seq(2L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("manifest (r17): one-file listing equals the directory walk on every mutation path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      def pinned(): Unit =
        assert(Tables.snapshotManifest(spark, dir).map(_.sorted) ==
          Some(Tables.snapshotVersionsWalk(spark, dir).sorted),
          "manifest must mirror the walk after every mutation")
      Tables.initSnapshot(base, dir)
      pinned()
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      pinned()
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      pinned()
      assert(Tables.snapshotManifest(spark, dir) == Some(Seq(0L, 1L, 2L)))
      assert(Tables.vacuumSnapshots(spark, dir, keepLast = 2) == Seq(0L))
      pinned()
      // a STALE manifest (crash between version write and manifest
      // update) degrades the reader to the previous committed view —
      // and the replayed commit heals it
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_manifest"), false)
      assert(Tables.snapshotManifest(spark, dir).isEmpty)
      assert(Tables.snapshotHistory(spark, dir) == Seq(1L, 2L),
        "no manifest -> the walk serves readers unchanged")
      Tables.applyChangeBatch(changes.where($"seq" === 2), Seq("k"), dir, 2L)
      pinned()
      // a CORRUPT manifest also degrades to the walk, loudly-silently
      // correct either way
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_manifest"), true)
      out.write("not-a-version\n".getBytes("UTF-8")); out.close()
      assert(Tables.snapshotHistory(spark, dir) == Seq(1L, 2L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("column rename/drop commits (r17): history records them, CDC maps across, guards fire") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      val keys = Seq("k")
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), keys, dir, 1L)
      // rename commits v2; old versions keep the old name
      assert(Tables.renameSnapshotColumn(spark, dir, "name", "label", keys) == 2L)
      assert(Tables.readSnapshotAt(spark, dir, 1L).columns.contains("name"))
      assert(Tables.readSnapshotAt(spark, dir, 2L).columns.toSeq == Seq("k", "label", "v"))
      // a feed using the NEW name merges on top
      Tables.applyChangeBatch(
        changes.where($"seq" === 2).withColumnRenamed("name", "label"), keys, dir, 3L)
      // CDC ACROSS the rename: v1 -> v3 diffs on the renamed schema; a
      // row untouched by seq-2 emits nothing despite the rename
      val ch13 = Tables.snapshotChanges(spark, dir, keys, 1L, 3L)
      assert(ch13.columns.contains("label") && !ch13.columns.contains("name"))
      val touched = ch13.select("k").as[Long].collect().toSet
      assert(touched == Set(3L, 4L), s"only seq-2 rows change, got $touched")
      // drop commits v4; CDC across the drop diffs the surviving schema
      assert(Tables.dropSnapshotColumn(spark, dir, "label", keys) == 4L)
      assert(Tables.readSnapshot(spark, dir).columns.toSeq == Seq("k", "v"))
      val ch14 = Tables.snapshotChanges(spark, dir, keys, 1L, 4L)
      assert(ch14.columns.sorted.toSeq == Seq("k", "op", "v"))
      // history records the schema commits
      val ops = Tables.snapshotHistoryMeta(spark, dir).orderBy("version")
        .as[(Long, String, Long)].collect().map(_._2).toSeq
      assert(ops == Seq("INIT", "MERGE", "RENAME(name->label)", "MERGE", "DROP(label)"))
      // the rename record SURVIVES vacuuming the rename version itself:
      // v1 and v4 both outlive v2 (the RENAME commit), and the v1->v4
      // CDC read must still map the old side (the _schema_ops file is
      // independent of vacuum by design)
      Tables.pinSnapshot(spark, dir, 1L, "cdc-reader")
      assert(Tables.vacuumSnapshots(spark, dir, keepLast = 1)
        .contains(2L), "the rename version vacuums away")
      val ch14v = Tables.snapshotChanges(spark, dir, keys, 1L, 4L)
      assert(ch14v.columns.sorted.toSeq == Seq("k", "op", "v"))
      // guards: keys refuse, case-collisions refuse, last payload refuses
      intercept[IllegalArgumentException] {
        Tables.renameSnapshotColumn(spark, dir, "k", "kk", keys)
      }
      intercept[IllegalArgumentException] {
        Tables.renameSnapshotColumn(spark, dir, "v", "K", keys)
      }
      intercept[IllegalArgumentException] {
        Tables.dropSnapshotColumn(spark, dir, "v", keys) // last payload column
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("history metadata records operation and row counts per commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      val hist = Tables.snapshotHistoryMeta(spark, dir)
        .orderBy("version").as[(Long, String, Long)].collect().toSeq
      assert(hist.map(t => (t._1, t._2)) == Seq((0L, "INIT"), (1L, "MERGE")))
      assert(hist(0)._3 == base.count())
      assert(hist(1)._3 == spark.read.parquet(s"$dir/v1").count())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("schema evolution: opt-in widens, untouched rows null-fill, typo'd feeds fail loud") {
    // a change batch carrying a NEW payload column
    val evolved = changes.where($"seq" === 1)
      .withColumn("tier", concat(lit("t"), $"k"))
    // without the opt-in the extra column is a loud error (typo guard)
    val e = intercept[IllegalArgumentException] {
      Tables.merge(base, evolved, Seq("k"))
    }
    assert(e.getMessage.contains("evolveSchema"))
    val out = Tables.merge(base, evolved, Seq("k"), "seq", "op", evolveSchema = true)
    assert(out.columns.contains("tier"))
    // upserted keys carry the new value; untouched base rows null-fill
    val byK = out.collect().map(r => r.getAs[Long]("k") -> Option(r.getAs[String]("tier"))).toMap
    val touched = evolved.where($"op" =!= "D").select("k").as[Long].collect().toSet
    byK.foreach { case (k, tier) =>
      if (touched(k)) assert(tier.contains(s"t$k"), s"upsert $k carries the new column")
      else assert(tier.isEmpty, s"untouched $k null-fills")
    }
    // dropping a base column still fails loud even WITH the opt-in
    intercept[IllegalArgumentException] {
      Tables.merge(base, evolved.drop("v"), Seq("k"), "seq", "op", evolveSchema = true)
    }
    // a feed column differing ONLY IN CASE is drift, not evolution:
    // under the default case-insensitive resolver withColumn would
    // REPLACE the live column with nulls — it must fail loud instead
    // (r16 review fix)
    val cased = changes.where($"seq" === 1).withColumnRenamed("v", "V")
    intercept[IllegalArgumentException] {
      Tables.merge(base, cased, Seq("k"), "seq", "op", evolveSchema = true)
    }
  }

  test("store-level evolution: per-version schemas, MERGE+SCHEMA history, evolved CDC read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    try {
      Tables.initSnapshot(base, dir)
      Tables.applyChangeBatch(changes.where($"seq" === 1), Seq("k"), dir, 1L)
      val evolved = changes.where($"seq" === 2)
        .withColumn("tier", concat(lit("t"), $"k"))
      // un-opted evolution fails loud and commits NOTHING
      intercept[IllegalArgumentException] {
        Tables.applyChangeBatch(evolved, Seq("k"), dir, 2L)
      }
      assert(Tables.snapshotHistory(spark, dir) == Seq(0L, 1L))
      Tables.applyChangeBatch(evolved, Seq("k"), dir, 2L, evolveSchema = true)
      // old versions keep their own schema; the new one is widened
      assert(!Tables.readSnapshotAt(spark, dir, 1L).columns.contains("tier"))
      assert(Tables.readSnapshotAt(spark, dir, 2L).columns.contains("tier"))
      // history records where the schema widened
      val hist = Tables.snapshotHistoryMeta(spark, dir)
        .orderBy("version").as[(Long, String, Long)].collect().toSeq
      assert(hist.map(_._2) == Seq("INIT", "MERGE", "MERGE+SCHEMA"))
      // CDC read across the widening: the old side null-extends, rows
      // whose only change is the new column emit a 'U'
      val ch = Tables.snapshotChanges(spark, dir, Seq("k"), 1L, 2L)
      assert(ch.columns.contains("tier"))
      val touched = evolved.where($"op" =!= "D").select("k").as[Long].collect().toSet
      val uRows = ch.where($"op" === "U").collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("tier")).toMap
      touched.foreach(k => assert(uRows.get(k).contains(s"t$k"), s"evolved U row for $k"))
      // the reversed direction — a later version MISSING an older one's
      // column — is genuine drift and fails loud (hand-write a v3 that
      // dropped the base payload; an out-of-band dir is not a commit, so
      // drop the manifest to degrade readers to the walk that sees it)
      Tables.readSnapshotAt(spark, dir, 2L).drop("v")
        .write.parquet(s"$dir/v3")
      new org.apache.hadoop.fs.Path(s"$dir/_manifest")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$dir/_manifest"), false)
      val e = intercept[IllegalArgumentException] {
        Tables.snapshotChanges(spark, dir, Seq("k"), 2L, 3L)
      }
      assert(e.getMessage.contains("schema drift"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("mergeStreaming folds MemoryStream micro-batches into the snapshot store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    try {
      Tables.initSnapshot(base, dir)
      val input = MemoryStream[ChangeRow]
      val q = Tables.mergeStreaming(input.toDF(), Seq("k"), dir, ckpt)
      try {
        // batch 0: the seq-1 changes; batch 1: the seq-2 changes
        input.addData(changes.where($"seq" === 1).as[ChangeRow].collect().toSeq)
        q.processAllAvailable()
        input.addData(changes.where($"seq" === 2).as[ChangeRow].collect().toSeq)
        q.processAllAvailable()
      } finally q.stop()
      // stream == one-shot, and the store holds v0..v2 all committed
      assert(rows(Tables.readSnapshot(spark, dir)) ==
        rows(Tables.merge(base, changes, Seq("k"))))
      val versions = new java.io.File(dir).listFiles()
        .filter(f => f.getName.matches("v\\d+")).map(_.getName).sorted
      assert(versions.toSeq == Seq("v0", "v1", "v2"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }
}

/** One CDC change row for the MemoryStream run (base schema + seq/op). */
case class ChangeRow(k: Long, seq: Long, op: String, name: String, v: Double)
