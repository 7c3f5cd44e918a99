package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for a training-data pipeline, expressed as
  * native Spark column expressions (codegen'd, no UDFs): tokenization,
  * token/quality statistics, rolling-hash fingerprinting, word
  * n-gram shingles, and a marker-word language-ID heuristic.
  */
object TextFunctions {

  /** Whitespace tokenizer (the corpus is single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  def distinctTokenCount(c: Column): Column =
    size(array_distinct(tokens(c))).cast(LongType)

  /** Characters excluding spaces — cheap length-based quality signal. */
  def charCountNoSpaces(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast(LongType)

  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(c), w => w.isInCollection(stopwords))).cast(LongType)

  /** BPE-ish regex token count: letter runs, digit runs, or single
    * non-alphanumeric symbols.
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
      .cast(LongType)

  /** Deterministic document fingerprint: left-fold polynomial rolling
    * hash over character code points, `acc = (acc*31 + code) mod
    * 1e9+7`. Pure integer arithmetic, identical in any engine; the
    * implementation is the single-pass codegen'd expression
    * [[graft.expressions.TextFingerprint]] (same arithmetic as the
    * SQL-expressible fold — see the text_fingerprint oracle).
    */
  def fingerprint(c: Column): Column =
    graft.expressions.TextFingerprint(c)

  /** Word n-gram shingles ("a b c" with n=2 → ["a b", "b c"]); empty
    * array when the document has fewer than n tokens.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val ws = tokens(c)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Marker stopwords per language for the n-gram/marker language-ID
    * heuristic. Order is the deterministic tie-break priority.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "in", "a"),
    "es" -> Seq("el", "la", "los", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "在", "了")
  )

  /** Heuristic language ID: argmax of per-language marker-word counts,
    * ties broken by marker priority order, zero hits → "und"
    * (undetermined). Single projection, no shuffle.
    *
    * The struct-max compares (score, tb, lang) lexicographically; `tb`
    * (= -index) is unique per entry, so the `lang` field never
    * participates in the comparison — guarded by the require below so
    * a duplicated language entry can't silently change tie semantics.
    */
  def langId(c: Column): Column = {
    require(langMarkers.map(_._1).distinct.size == langMarkers.size,
      "langMarkers languages must be unique (tb tie-break relies on it)")
    val scored = langMarkers.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        stopwordCount(c, words).as("score"),
        lit(-i).cast(LongType).as("tb"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
