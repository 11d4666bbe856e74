package graft.datapipe

import graft.SparkSpecBase

/** Cross-document substring-span dedup ([[TextOps.spanDedup]], the
  * ExactSubstr recipe at word granularity): later copies of any
  * repeated spanWords-word window are excised, first occurrence
  * survives; within-doc repeats count too. */
class SpanDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val L = TextOps.spanWords
  private def ws(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Option[String])] =
    TextOps.spanDedup(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_dropped"),
          Option(r.getAs[String]("text_span_deduped")))))
      .toMap

  test("boilerplate embedded in distinct documents is excised from later docs") {
    val boiler = ws("b", L) // exactly one span width
    val docs = Seq(
      (1L, s"${ws("x", 5)} $boiler ${ws("y", 5)}"),
      (2L, s"${ws("p", 7)} $boiler ${ws("q", 4)}"), // later copy -> excised
      (3L, ws("z", 8))) // short doc, untouched
    val out = run(docs)
    assert(out(1L) == ((L + 10L, 0L, Some(docs.head._2))), "first occurrence intact")
    assert(out(2L)._2 == L.toLong, s"the later span is dropped: ${out(2L)}")
    assert(out(2L)._3.contains(s"${ws("p", 7)} ${ws("q", 4)}"),
      "surrounding unique words survive in order")
    assert(out(3L) == ((8L, 0L, Some(ws("z", 8)))), "sub-span docs never match")
  }

  test("overlapping duplicate spans merge their covered words (no double count)") {
    // doc 2 repeats an L+2-word window of doc 1: its L+2 covered words
    // come from 3 overlapping spans but each word drops once
    val core = ws("c", L + 2)
    val out = run(Seq(
      (1L, s"$core ${ws("u", 3)}"),
      (2L, s"${ws("v", 3)} $core")))
    assert(out(2L)._2 == (L + 2).toLong, s"covered union, not per-span sum: ${out(2L)}")
    assert(out(2L)._3.contains(ws("v", 3)))
  }

  test("NULL-text docs keep their output row (same guard as chunk)") {
    // r10 review fix: words(NULL) explodes to zero rows, silently losing
    // the doc from the one-row-per-doc contract; the coalesce('') guard
    // keeps it as a single untouchable empty word
    val out = run(Seq((1L, null.asInstanceOf[String]), (2L, ws("n", L + 1))))
    assert(out.contains(1L), "NULL-text doc must not vanish from the output")
    assert(out(1L) == ((1L, 0L, Some(""))), s"empty word, nothing dropped: ${out(1L)}")
    assert(out(2L)._1 == (L + 1).toLong)
  }

  test("a fully-duplicated document drops to NULL text") {
    val body = ws("d", L + 4)
    val out = run(Seq((1L, body), (2L, body)))
    assert(out(1L)._3.contains(body))
    assert(out(2L) == (((L + 4).toLong, (L + 4).toLong, None)),
      "every word covered -> NULL text")
  }

  test("within-doc repetition: the second copy inside the SAME doc is excised") {
    val rep = ws("r", L)
    val out = run(Seq((1L, s"$rep ${ws("m", 2)} $rep")))
    assert(out(1L)._1 == (2 * L + 2).toLong)
    assert(out(1L)._2 == L.toLong, s"later in-doc copy dropped: ${out(1L)}")
    assert(out(1L)._3.contains(s"$rep ${ws("m", 2)}"))
  }

  // --------------------------- character-level form (r16, ExactSubstr)

  private def runChars(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Option[String])] =
    TextOps.spanDedupChars(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_dropped"),
          Option(r.getAs[String]("text_byte_deduped")))))
      .toMap

  test("char form excises a SUB-WORD boundary repeat the word form misses") {
    val C = TextOps.spanChars
    // the repeat crosses word boundaries AND starts mid-word: with only
    // 4 shared words, no 10-word window repeats — but the 40-char
    // substring does
    val core = "xysharedalphabetagammadeltaepsilonzeta01 tail9"
    assert(core.length >= C)
    val d1 = s"first unique prefix words $core one closer"
    val d2 = s"completely different set of tokens ab$core extra"
    val word = run(Seq((1L, d1), (2L, d2)))
    assert(word(2L)._2 == 0L, "word windows must NOT catch the sub-word repeat")
    val chars = runChars(Seq((1L, d1), (2L, d2)))
    assert(chars(1L)._2 == 0L, "first occurrence intact")
    assert(chars(2L)._2 >= C, s"later sub-word copy must be excised: ${chars(2L)}")
    assert(!chars(2L)._3.get.contains("sharedalphabeta"),
      "the repeated run must be gone from the rebuilt text")
  }

  test("char form: NULL/empty docs keep rows, fully-covered doc drops to NULL") {
    val C = TextOps.spanChars
    val repeat = ("r" * C)
    val out = runChars(Seq(
      (1L, repeat),                 // first occurrence, survives whole
      (2L, repeat),                 // identical -> fully covered -> NULL
      (3L, null.asInstanceOf[String]),
      (4L, "")))
    assert(out(1L) == ((C.toLong, 0L, Some(repeat))))
    assert(out(2L) == ((C.toLong, C.toLong, None)))
    assert(out(3L) == ((0L, 0L, None)))
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("char form within-doc repetition and overlap: covered set never double-counts") {
    val C = TextOps.spanChars
    // one doc holding the same C-char run twice, separated: second run covered
    val block = "abcdefghij" * (C / 10)
    val doc = s"$block--filler filler filler--$block"
    val out = runChars(Seq((7L, doc)))
    assert(out(7L)._1 == doc.length.toLong)
    assert(out(7L)._2 == C.toLong, s"exactly the second copy: ${out(7L)}")
  }

  test("randomized battery: equals a pure-Scala oracle on planted corpora") {
    // independent brute-force oracle: global first occurrence per gram
    // CONTENT (not hash — collisions aside, h60 is 60-bit), covered =
    // union of non-first gram spans, rebuild in order
    def oracle(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Option[String])] = {
      val wordsOf = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val grams = for {
        (id, w) <- docs.map { case (id, t) => (id, wordsOf(id)) }
        p <- 0 to w.length - L if w.length >= L
      } yield (w.slice(p, p + L).mkString(" "), id, p)
      val firstOf = grams.groupBy(_._1).view
        .mapValues(_.map(g => (g._2, g._3)).min).toMap
      val covered = grams.filter(g => firstOf(g._1) != ((g._2, g._3)))
        .flatMap(g => (g._3 until g._3 + L).map(i => (g._2, i))).toSet
      docs.map { case (id, _) =>
        val w = wordsOf(id)
        val kept = w.zipWithIndex.collect { case (x, i) if !covered((id, i)) => x }
        id -> ((w.length.toLong, (w.length - kept.length).toLong,
          if (kept.isEmpty) None else Some(kept.mkString(" "))))
      }.toMap
    }
    val rnd = new scala.util.Random(149833)
    for (trial <- 1 to 6) {
      // small vocab + long docs => frequent genuine span collisions
      val vocab = 4 + rnd.nextInt(5)
      val docs = (1L to (4 + rnd.nextInt(5)).toLong).map { id =>
        val n = 5 + rnd.nextInt(40)
        (id, (0 until n).map(_ => s"t${rnd.nextInt(vocab)}").mkString(" "))
      }
      val got = run(docs)
      val want = oracle(docs)
      assert(got == want, s"trial $trial:\n got=$got\nwant=$want\ndocs=$docs")
    }
  }

  test("matches the oracle semantics on the real corpus (spot invariants)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = TextOps.spanDedup(docs).collect()
    assert(out.length == docs.count(), "one row per document")
    out.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_dropped"))
      assert(d >= 0 && d <= n)
      val t = Option(r.getAs[String]("text_span_deduped"))
      if (d == n) assert(t.isEmpty) else assert(t.exists(_.split(" ").length == (n - d)))
    }
  }
}
