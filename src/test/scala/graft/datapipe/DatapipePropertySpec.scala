package graft.datapipe

import java.security.MessageDigest

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Randomized checks of the r7 datapipe ops against brute-force PURE
  * SCALA oracles — independent of both the Spark expression engine and
  * the DuckDB driver oracle. */
class DatapipePropertySpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference implementation of [[TextOps.h60]]: md5 hex, first 15
    * nibbles as a base-16 long. */
  private def h60Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def grams(text: String, k: Int): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    if (w.size < k) Seq.empty else w.sliding(k).map(_.mkString(" ")).toSeq
  }

  test("mixEpochs equals the brute-force per-doc copy count on random corpora") {
    val rnd = new scala.util.Random(149207)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 80).map { i =>
      val text = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, s"src${rnd.nextInt(12)}", text.length.toLong)
    }
    val df = docs.toDF("doc_id", "text", "source", "n_chars")

    val got = TextOps.mixEpochs(df).groupBy("doc_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = docs.map { case (id, text, src, _) =>
      val idx = src.stripPrefix("src").toInt % TextOps.mixWeights.size
      val w = TextOps.mixWeights(idx)
      val full = w.toInt
      val frac1000 = math.round((w - full) * 1000).toInt
      val extra = if (h60Ref(s"$text:$full") % 1000 < frac1000) 1 else 0
      id -> (full + extra).toLong
    }.filter(_._2 > 0).toMap

    assert(got == want)
  }

  test("Decontam.flag equals brute-force containment on random corpora") {
    val rnd = new scala.util.Random(149323)
    val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8", "w9")
    def randText(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val probes = (0 until 5).map(i => (100L + i, randText(6)))
    val docs = (0 until 60).map { i =>
      // a third of the docs embed a random probe window at a random
      // offset — genuine contamination the flag must find
      val base = randText(4 + rnd.nextInt(10))
      val text = if (i % 3 == 0) {
        val p = probes(rnd.nextInt(probes.size))._2.split(" ")
        val win = p.drop(rnd.nextInt(p.length - Decontam.probeN + 1))
          .take(Decontam.probeN).mkString(" ")
        val w = base.split(" ")
        val cut = rnd.nextInt(w.length + 1)
        (w.take(cut) ++ Seq(win) ++ w.drop(cut)).mkString(" ")
      } else base
      (i.toLong, text)
    }

    val got = Decontam.flag(docs.toDF("doc_id", "text"),
        Decontam.probeIndex(probes.toDF("probe_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val probeGrams = probes.map { case (pid, t) =>
      pid -> grams(t, Decontam.probeN).toSet }
    val want = docs.flatMap { case (id, t) =>
      val dg = grams(t, Decontam.probeN).toSet
      val hits = probeGrams.filter(_._2.exists(dg)).map(_._1)
      if (hits.isEmpty) None else Some((id, hits.distinct.size.toLong, hits.min))
    }.toSet

    assert(got == want && want.nonEmpty)
  }

  test("keptCorpus equals the componentwise pipeline on random planted corpora") {
    val rnd = new scala.util.Random(149453)
    // en-stopword-bearing vocab so the language/quality gates pass a
    // realistic subset; distinct fillers keep repetition fractions low
    val fillers = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia", "kilo", "lima", "mike", "nov")
    def enText(n: Int) = {
      val words = Seq("the", "a", "of") ++ Seq.fill(n)(fillers(rnd.nextInt(fillers.size)))
      rnd.shuffle(words).mkString(" ")
    }
    for (trial <- 1 to 3) {
      val base = (0 until 50).map { i =>
        val text = i % 10 match {
          case 7 => "the " + Seq.fill(14)("spam").mkString(" ")    // repetitious
          case 8 => "short one"                                    // too short
          case _ => enText(9 + rnd.nextInt(8))
        }
        (i.toLong, text)
      }
      // plant duplicates of earlier docs under new ids
      val docs = (base ++ (0 until 6).map { j =>
        (100L + j, base(rnd.nextInt(base.size))._2)
      }).map { case (id, t) => (id, t, s"src${rnd.nextInt(8)}", t.length.toLong) }
      val df = docs.toDF("doc_id", "text", "source", "n_chars")

      val got = Prep.keptCorpus(df).select("doc_id")
        .collect().map(_.getLong(0)).toSet

      import org.apache.spark.sql.functions.{col, md5, min => fmin}
      val q = TextOps.quality(df)
      val l = TextOps.langId(df).select(col("doc_id"), col("pred_lang"))
      val r = TextOps.repetition(df).select(col("doc_id"), col("repetitious"))
      val gatedIds = q.join(l, "doc_id").join(r, "doc_id")
        .where(col("pred_lang") === TextOps.cleanLang &&
          col("score") >= TextOps.cleanMinScore &&
          col("n_tokens").between(TextOps.cleanMinTok, TextOps.cleanMaxTok) &&
          !col("repetitious"))
        .select("doc_id")
      val gated = df.join(gatedIds, "doc_id")
      val flagged = Decontam.flag(gated, Decontam.probeIndex(Decontam.probes(df)))
      val clean = gated.join(flagged.select("doc_id"), Seq("doc_id"), "left_anti")
      val want = clean.withColumn("h", md5(Dedup.normText))
        .groupBy("h").agg(fmin("doc_id").as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSet

      assert(got == want && want.nonEmpty, s"trial $trial")
      graft.CacheRegistry.unpersistAll()
    }
  }

  test("repetition fractions equal brute-force distinct counts on random docs") {
    val rnd = new scala.util.Random(149597)
    val vocab = Vector("x", "y", "z")   // tiny vocab forces heavy repetition
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = TextOps.repetition(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    docs.foreach { case (id, text) =>
      def frac(k: Int): (Long, Double) = {
        val g = grams(text, k)
        val f = if (g.isEmpty) 0.0 else 1.0 - g.distinct.size.toDouble / g.size
        (g.size.toLong, f)
      }
      val (n2, d2) = frac(2); val (n3, d3) = frac(3)
      val (gn2, gd2, gn3, gd3, flag) = got(id)
      assert(gn2 == n2 && gn3 == n3, s"doc $id gram counts")
      assert(math.abs(gd2 - BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9 &&
        math.abs(gd3 - BigDecimal(d3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id fracs: got ($gd2,$gd3) want ($d2,$d3)")
      assert(flag == (d2 > TextOps.repDupThreshold || d3 > TextOps.repDupThreshold),
        s"doc $id flag")
    }
  }
}
