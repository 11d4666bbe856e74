package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Weighted corpus mixing: deterministic fractional-epoch up/down-sampling
  * per source (the LLM data-mixing step). */
class MixSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("full copies are guaranteed: every doc appears at least floor(w) times") {
    val perDoc = TextOps.mixEpochs(docs)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val w = r.getDouble(1); val n = r.getLong(2)
      val full = w.toInt
      assert(n >= full && n <= full + 1,
        s"doc ${r.getLong(0)} w=$w emitted $n copies")
    }
  }

  test("w=1.0 sources pass through exactly: one copy per doc, no gate") {
    val one = TextOps.mixEpochs(docs).where(col("w") === 1.0)
    val in = docs.where(substring(col("source"), 4, 10).cast("int") % 4 === 1)
    assert(one.count() == in.count())
    assert(one.select(col("doc_id")).distinct().count() == in.count())
  }

  test("downsampled sources (w<1) keep exactly the hash-gated subset") {
    val got = TextOps.mixEpochs(docs).where(col("w") === 0.3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val want = docs
      .where(substring(col("source"), 4, 10).cast("int") % 4 === 0)
      .where(pmod(TextOps.h60(concat(col("text"), lit(":0"))), lit(1000)) < 300)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty)
    // the realized rate is in the right ballpark of the 0.3 target
    val in = docs.where(substring(col("source"), 4, 10).cast("int") % 4 === 0).count()
    assert(math.abs(want.size.toDouble / in - 0.3) < 0.15)
  }

  test("mixing is deterministic: two runs produce the identical multiset") {
    def snap() = TextOps.mixEpochs(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snap() == snap())
  }

  test("summary reconciles with the exploded corpus") {
    val sum = TextOps.mixSummary(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    val want = TextOps.mixEpochs(docs)
      .groupBy("source")
      .agg(count(lit(1)).as("d"), expr("sum(n_chars)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sum == want && want.nonEmpty)
  }

  test("upsampled mass exceeds input mass, downsampled is below it") {
    val in = docs.groupBy(substring(col("source"), 4, 10).cast("int") % 4 as "idx")
      .agg(count(lit(1)).as("n")).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val out = TextOps.mixEpochs(docs)
      .groupBy(substring(col("source"), 4, 10).cast("int") % 4 as "idx")
      .agg(count(lit(1)).as("n")).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(0) < in(0))            // w = 0.3
    assert(out(2) > in(2))            // w = 1.5
    assert(out(3) >= 2 * in(3))       // w = 2.25: two full epochs guaranteed
  }

  // --------------------------- temperature-sampled language balancing

  test("temperature rates flatten the mix: head lang w < 1 < rare lang w, N preserved in expectation") {
    val rows = TextOps.mixByLanguage(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byLang = rows.map(r => r._1 -> r).toMap
    val n = rows.map(_._2).sum
    // en dominates this corpus: down-sampled; every other lang up-samples
    assert(byLang("en")._3 < 1.0)
    rows.filter(_._1 != "en").foreach(r => assert(r._3 > 1.0, s"$r"))
    // expectation preservation: sum n_l * w_l == N up to the 6dp rounding
    val expected = rows.map(r => r._2 * r._3).sum
    assert(math.abs(expected - n) < n * 1e-5, s"$expected vs $n")
    // emitted copies bracket the guaranteed/full+1 band per lang
    rows.foreach { case (lang, nl, w, out) =>
      val full = w.toInt
      assert(out >= nl * full && out <= nl * (full + 1), s"$lang: $out outside [$full, ${full + 1}] * $nl")
    }
  }

  test("a uniform corpus is a fixed point: every lang rate is exactly 1.0, pass-through") {
    import spark.implicits._
    val uni = (0L until 40L).map(i =>
      (i, s"text body $i", Seq("aa", "bb", "cc", "dd")(i.toInt % 4), s"src${i % 4}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextOps.mixByLanguage(uni).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 4)
    rows.foreach { case (_, nl, w, out) =>
      assert(w == 1.0 && nl == 10L && out == 10L)
    }
  }

  test("language balancing is deterministic: two runs produce the identical summary") {
    val a = TextOps.mixByLanguage(docs).collect().map(_.toString).sorted.toSeq
    val b = TextOps.mixByLanguage(docs).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
