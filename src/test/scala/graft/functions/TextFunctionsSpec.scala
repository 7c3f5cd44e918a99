package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token counts, distinct, chars, stopwords") {
    val r = one("the cat and the hat").select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.distinctTokenCount(col("text")),
      TextFunctions.charCountNoSpaces(col("text")),
      TextFunctions.stopwordCount(col("text"), Seq("the", "and"))).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 4 && r.getLong(2) == 15 && r.getLong(3) == 3)
  }

  test("fingerprint equals a local fold of (acc*31 + code) mod 1e9+7") {
    val text = "hello world"
    val want = text.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val got = one(text).select(TextFunctions.fingerprint(col("text"))).head().getLong(0)
    assert(got == want)
  }

  test("word shingles") {
    val got = one("a b c d").select(TextFunctions.wordShingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
    val short = one("a b").select(TextFunctions.wordShingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("langId picks marker-majority language; und when no markers") {
    val df = Seq(
      "the cat is in the house and of course",
      "el gato de la casa que y los perros",
      "qwerty zzz xxx").toDF("text")
    val got = df.select(TextFunctions.langId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "und"))
  }

  test("regex token count splits letter runs, digit runs, symbols") {
    val got = one("abc 123 x!y").select(TextFunctions.regexTokenCount(col("text")))
      .head().getLong(0)
    // abc | 123 | x | ! | y
    assert(got == 5)
  }
}
