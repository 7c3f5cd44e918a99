package graft.expressions

import graft.SparkSuite
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("VectorDot is bit-identical to the HOF fold on real embeddings") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings").limit(200)
    val both = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(
        VectorFunctions.dot(col("x.embedding"), col("y.embedding")).as("fast"),
        VectorFunctions.dotHof(col("x.embedding"), col("y.embedding")).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(both.count() == 0)
  }

  test("VectorDot handles mixed float/double element types (plane literals)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val plane = array(lit(2.0), lit(0.5), lit(1.0))
    val got = df.select(VectorFunctions.dot(col("v"), plane)).head().getDouble(0)
    assert(got == 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
  }

  test("VectorDot participates in whole-stage codegen") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val plan = emb.select(VectorFunctions.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vector_dot"), s"plan:\n$plan")
  }

  test("TextFingerprint matches the reference fold, including non-BMP code points") {
    val inputs = Seq("hello world", "", "a", "the quick brown fox",
      "emoji 😀 and beyond") // surrogate pair: per-Char folds diverge here
    val df = inputs.toDF("text")
    val got = df.select(TextFingerprint(col("text"))).collect().map(_.getLong(0)).toSeq
    assert(got == inputs.map(graft.TestFolds.fingerprintRef))
  }

  test("WordShingleHashes: count, range, determinism, short-doc empty") {
    val df = Seq("a b c d e", "a b").toDF("text")
    val rows = df.select(WordShingleHashes(col("text"), 3)).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0).size == 3)                  // 5 tokens -> 3 trigrams
    assert(rows(0).forall(h => h >= 0 && h < 2147483647L))
    assert(rows(1).isEmpty)                    // fewer than n tokens
    // same shingle ("a b c") hashes identically wherever it appears
    val again = Seq("x a b c d").toDF("text")
      .select(WordShingleHashes(col("text"), 3)).head().getSeq[Long](0)
    assert(again(1) == rows(0)(0))             // "a b c" in both
  }

  test("SimHash64: identical text same bits, token-permutation-insensitive votes") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha",
      "completely different words here").toDF("text")
    val hs = df.select(SimHash64(col("text"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) == hs(2)) // bag-of-words: order-insensitive
    assert(hs(0) != hs(3))
  }
}
