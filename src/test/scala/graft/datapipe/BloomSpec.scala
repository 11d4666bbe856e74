package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bloom cross-refresh membership gate (r14): zero false negatives,
  * union mergeability, file-backed append, and the m-bounded filter. */
class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  test("zero false negatives: every snapshot member is flagged") {
    val members = docs.where(col("doc_id") % 2 === 0)
    val filter = Dedup.bloomBuild(members)
    val flagged = Dedup.bloomFlag(docs, filter)
      .select("doc_id").as[Long].collect().toSet
    val memberIds = members.select("doc_id").as[Long].collect().toSet
    assert((memberIds -- flagged).isEmpty,
      s"false negatives: ${(memberIds -- flagged).take(3)}")
  }

  test("filter is m-bounded and mergeable by plain union") {
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val whole = Dedup.bloomBuild(docs)
    assert(whole.count() <= Dedup.bloomBits)
    val merged = Dedup.bloomBuild(a).unionByName(Dedup.bloomBuild(b)).distinct()
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("a novel text with provably-unset positions is NOT flagged") {
    // compute the gate's own position maths in plain Scala for a novel
    // text; regenerate until all k positions miss the built filter —
    // that doc must not be flagged (and with m=2^17 over ~250 members
    // the first candidate already misses)
    val members = docs.where(col("doc_id") % 2 === 0)
    val filter = Dedup.bloomBuild(members)
    val set = filter.as[Long].collect().toSet
    def positions(text: String): Seq[Long] = {
      val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseUnsignedLong(md5.take(15), 16)
      val s = h % Dedup.mhP
      (0 until Dedup.bloomK).map(i => ((Dedup.mhA(i) * s + Dedup.mhB(i)) % Dedup.mhP) % Dedup.bloomBits)
    }
    val novel = (1 to 50).map(i => s"novel zz$i unseen text probe")
      .find(t => positions(t).forall(p => !set.contains(p)))
      .getOrElse(fail("no all-miss novel text in 50 candidates (FP storm?)"))
    val probe = Seq((999999L, novel)).toDF("doc_id", "text")
    assert(Dedup.bloomFlag(probe, filter).isEmpty)
    // sanity: the Scala-side maths IS the gate's (a member's positions
    // all hit)
    val memberText = members.select("text").as[String].head()
    assert(positions(memberText).forall(set.contains))
  }

  test("file-backed filter with staged append equals the full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bloom_gate").toString
    try {
      val a = docs.where(col("doc_id") % 4 === 0)
      val b = docs.where(col("doc_id") % 4 === 2)
      Dedup.bloomBuild(a).write.mode("overwrite").parquet(s"$dir/pos")
      graft.sources.Tables.stagedAppend(Dedup.bloomBuild(b), s"$dir/pos")
      val fileFilter = graft.sources.Tables.readIndexDir(spark, s"$dir/pos")
      val full = Dedup.bloomFlag(docs,
        Dedup.bloomBuild(docs.where(col("doc_id") % 2 === 0)))
      val appended = Dedup.bloomFlag(docs, fileFilter)
      assert(full.exceptAll(appended).isEmpty && appended.exceptAll(full).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
