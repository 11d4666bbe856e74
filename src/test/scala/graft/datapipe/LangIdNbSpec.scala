package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiclass NB language ID (r16): classifies planted per-language
  * vocabularies correctly — including exactly where the stopword vote
  * ties — plus the deterministic tie/edge contracts. */
class LangIdNbSpec extends SparkSpecBase {

  import spark.implicits._

  // two planted languages with disjoint content vocabularies; every doc
  // also carries BOTH 'the' (en stopword) and 'la' (es stopword), so the
  // stopword vote ties on every single document
  private val enWords = Seq("window", "batch", "stream", "shuffle", "column")
  private val esWords = Seq("ventana", "lote", "flujo", "mezcla", "columna")

  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(161002)
    def doc(id: Long, lang: String, vocab: Seq[String]) = {
      val body = Seq.fill(12)(vocab(rnd.nextInt(vocab.length)))
      (id, (body :+ "the" :+ "la").mkString(" "), lang, "web", 0L)
    }
    val curated = (0 until 20).map(i =>
      if (i % 2 == 0) doc(i * 10L, "en", enWords) else doc(i * 10L, "es", esWords))
    val test = (0 until 30).map(i =>
      if (i % 2 == 0) doc(1001L + i, "en", enWords) else doc(1001L + i, "es", esWords))
    (curated ++ test).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("NB langid classifies planted vocabularies where the stopword vote ties") {
    val docs = corpus
    // precondition: the vote genuinely ties on every doc (hits_en == hits_es > 0)
    val vote = TextOps.langId(docs)
    assert(vote.where(col("hits_en") =!= col("hits_es")).count() == 0)
    assert(vote.where(col("pred_lang") === "es").count() == 0) // alphabetical tie -> all 'en'
    val nb = TextOps.langIdNb(docs, col("doc_id") % 10 === 0)
    val joined = nb.join(docs.select(col("doc_id"), col("lang").as("truth")), "doc_id")
    val wrong = joined.where(col("pred_lang") =!= col("truth")).count()
    assert(wrong == 0, s"$wrong misclassified planted docs")
  }

  test("empty/no-signal docs: 'und' only when no words; ties break alphabetically") {
    val docs = Seq(
      (0L, "ventana lote", "es", "web", 0L),   // curated es
      (10L, "window batch", "en", "web", 0L),  // curated en
      (1L, null.asInstanceOf[String], null.asInstanceOf[String], "web", 0L),
      (2L, "zzz qqq", null.asInstanceOf[String], "web", 0L) // all-unseen words
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.langIdNb(docs, col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((0L, "und")))            // null text -> no words -> und
    // all words unseen: equal class sizes -> exact score tie -> 'en' (alphabetical)
    assert(out(2L)._2 == "en")
    assert(out(2L)._1 == 2L)
  }

  test("trained-slice labels drive the model: flipping labels flips predictions") {
    val docs = corpus
    // deliberately swap the curated labels -> predictions must swap too
    val flipped = docs.withColumn("lang",
      when(col("lang") === "en", "es").otherwise(lit("en")))
    val nb = TextOps.langIdNb(flipped, col("doc_id") % 10 === 0)
    val joined = nb.join(corpus.select(col("doc_id"), col("lang").as("truth")), "doc_id")
    assert(joined.where(col("pred_lang") === col("truth")).count() == 0)
  }

  test("char-trigram NB (r17): unseen inflected forms classified where the word vocab misses") {
    // curated: 4 'aa' docs with -ing verb stems, 2 'bb' docs with a
    // disjoint charset. Test doc 7 is an UNSEEN inflection ("runnings"):
    // the word model's vocab misses it entirely, so every class scores
    // the same +1 smoothing mass and the smaller class 'bb' wins on its
    // prior (1/(n_bb+2) > 1/(n_aa+2)) — wrong. The char model shares
    // run/unn/nni/ing grams with 'aa' and classifies correctly.
    val docs = Seq(
      (0L, "running jumping resting", "aa", "web", 0L),
      (10L, "running singing jumping", "aa", "web", 0L),
      (20L, "resting singing running", "aa", "web", 0L),
      (30L, "jumping resting singing", "aa", "web", 0L),
      (40L, "zovux qezyx", "bb", "web", 0L),
      (50L, "qezyx wuvzo", "bb", "web", 0L),
      (7L, "runnings", null.asInstanceOf[String], "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val word = TextOps.langIdNb(docs, col("doc_id") % 10 === 0)
      .where(col("doc_id") === 7L).head()
    assert(word.getString(2) == "bb",
      "precondition: the word model misranks the unseen inflection on class priors")
    val char = TextOps.langIdNbChar(docs, col("doc_id") % 10 === 0)
      .where(col("doc_id") === 7L).head()
    assert(char.getString(2) == "aa", "shared char grams carry the unseen form")
    assert(char.getLong(1) == 6L, "'runnings' has 6 distinct trigrams")
    // sub-3-char and null docs keep the 'und' contract
    val edge = Seq((0L, "running", "aa", "w", 0L), (10L, "zovux", "bb", "w", 0L),
      (1L, "ab", null.asInstanceOf[String], "w", 0L),
      (2L, null.asInstanceOf[String], null.asInstanceOf[String], "w", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.langIdNbChar(edge, col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((0L, "und")) && out(2L) == ((0L, "und")))
  }
}
