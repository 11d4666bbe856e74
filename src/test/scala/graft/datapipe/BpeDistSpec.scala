package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Distributed BPE trainer contract: the Spark pair-count/merge fixpoint
  * must be TABLE-IDENTICAL to the pure-Scala reference trainer — on the
  * canonical corpus slice, on a larger synthetic vocabulary, and through
  * exhaustion / tie edge cases. */
class BpeDistSpec extends SparkSpecBase {

  import spark.implicits._

  test("distributed trainer equals bpeTrain on the canonical slice (and the frozen table)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val slice = docs.where(col("doc_id") % 20 === 0)
    val dist = TextOps.bpeTrainDistributed(slice, 48)
    val samples = slice.select("text").as[String].collect().toSeq
    assert(dist == TextOps.bpeTrain(samples, 48))
    // sf0.001's slice is the frozen table's provenance — all three agree
    assert(dist == TextOps.bpeMerges)
  }

  test("distributed trainer equals bpeTrain on a larger synthetic vocabulary") {
    // 400 words over a 12-letter alphabet, zipf-ish repetition so merges
    // have real frequency structure; 64 merges goes past the frozen 48
    val rnd = new scala.util.Random(151001)
    val words = Seq.fill(400) {
      val len = 2 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(12)).toChar).mkString
    }
    val texts = (0 until 120).map { i =>
      (0 until 15).map(_ => words(math.min(rnd.nextInt(words.size),
        rnd.nextInt(words.size)))).mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(TextOps.bpeTrainDistributed(docs, 64) == TextOps.bpeTrain(texts, 64))
  }

  test("exhaustion: stops early when no pair remains, like bpeTrain") {
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val dist = TextOps.bpeTrainDistributed(docs, 10)
    assert(dist == TextOps.bpeTrain(Seq("ab ab ab"), 10))
    assert(dist == Seq(("a", "b"))) // one merge, then nothing left
  }

  test("ties break on the lexicographically smallest pair, matching bpeTrain") {
    // "xy" and "ab" both appear twice: the winner must be (a, b)
    val texts = Seq("xy ab", "ab xy")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = TextOps.bpeTrainDistributed(docs, 1)
    assert(dist == TextOps.bpeTrain(texts, 1) && dist == Seq(("a", "b")))
  }

  test("non-ASCII ties break in UTF-8 byte order on BOTH trainers (r16 advice fix)") {
    // U+FF01 (fullwidth !) vs U+10000 (𐀀, a surrogate pair): Java
    // UTF-16 code-unit order ranks 𐀀 (0xD800...) BELOW ！ (0xFF01),
    // UTF-8 byte order ranks ！ first — exactly the divergence the fix
    // closes. Both candidate first-merges ("！x" vs "𐀀x") tie at count 2.
    val sup = new String(Character.toChars(0x10000))
    val texts = Seq(s"！x ${sup}x", s"！x ${sup}x")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = TextOps.bpeTrainDistributed(docs, 2)
    val local = TextOps.bpeTrain(texts, 2)
    assert(dist == local, s"trainers diverged on non-ASCII ties: $dist vs $local")
    assert(local.head == ("！", "x"), s"UTF-8 order must rank ！ first: $local")
  }

  test("NULL and empty texts contribute nothing, empty corpus trains nothing") {
    val docs = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "  "),
      (3L, "cd cd")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainDistributed(docs, 5) == Seq(("c", "d")))
    assert(TextOps.bpeTrainDistributed(docs.limit(0), 5) == Seq.empty)
  }

  test("entry frame carries ranked rows in merge order") {
    val out = TextOps.bpeDistTable(
      graft.sources.Tables.documents(spark, sfDir), 6)
      .as[(Long, String, String)].collect().toSeq
    assert(out.map(_._1) == (1L to 6L))
    val ref = TextOps.bpeTrain(
      graft.sources.Tables.documents(spark, sfDir)
        .where(col("doc_id") % 20 === 0).select("text").as[String].collect().toSeq, 6)
    assert(out.map(r => (r._2, r._3)) == ref)
  }
}
