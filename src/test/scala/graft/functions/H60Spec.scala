package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The fused h60 expression must be BIT-EQUAL to the declarative
  * conv(substring(md5(c),1,15),16,10) form (and therefore to the DuckDB
  * oracle rendering) on every input — ASCII, unicode incl. supplementary
  * chars, empty strings, long strings. */
class H60Spec extends SparkSpecBase {

  import spark.implicits._

  test("fused h60 == conv(substring(md5)) on fuzz strings, unicode included") {
    val rnd = new scala.util.Random(161003)
    val pool = "abc XYZ09!@#äöü你好𐀀·:/" // incl. a surrogate pair
    val strs = Seq("", " ", "·", "a" * 5000) ++
      (1 to 500).map(_ => (0 until rnd.nextInt(60))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val df = strs.toDF("s").select(col("s"),
      H60.h60(col("s")).as("fused"),
      conv(substring(md5(col("s")), 1, 15), 16, 10)
        .cast("long").as("legacy"))
    val bad = df.where(col("fused") =!= col("legacy")).count()
    assert(bad == 0, s"$bad fuzz strings diverged")
    // non-negative 60-bit range (the conv form's contract)
    assert(df.where(col("fused") < 0 || col("fused") >= (1L << 60)).count() == 0)
    // null propagates
    val n = Seq((1, null: String)).toDF("i", "s")
      .select(H60.h60(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("non-string/binary input fails at ANALYSIS, like the legacy chain") {
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(H60.h60(col("x"))).collect()
    }
    assert(e.getMessage.contains("graft_h60"), e.getMessage)
  }

  test("matches the DuckDB h60 rendering on a hand value") {
    // md5("graft") = df0f... — assert against the java digest directly
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("graft".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val got = Seq("graft").toDF("s").select(H60.h60(col("s"))).collect()(0).getLong(0)
    assert(got == want)
  }
}
