package graft

import org.apache.spark.sql.functions._

/** The SQL-facing function surface: graft's native expressions
  * registered per session and used from `spark.sql`.
  */
class GraftFunctionsSpec extends SparkSuite {

  test("registered SQL functions match the Column API results") {
    GraftFunctions.register(spark)
    Tables(spark, sf("sf0.001"), "documents").limit(50)
      .createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      """SELECT doc_id, text_fingerprint(text) AS fp, simhash64(text) AS sh,
        |  size(word_shingle_hashes(text, 3)) AS nsh,
        |  size(minhash_signature(text, 3, 64, 42)) AS sigk
        |FROM docs_v""".stripMargin)
    val viaApi = Tables(spark, sf("sf0.001"), "documents").limit(50).select(
      col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
      graft.operators.SimHash.simhash(col("text")).as("sh"),
      size(graft.expressions.WordShingleHashes(col("text"), 3)).as("nsh"),
      size(graft.expressions.MinHashSignature(col("text"), 3, 64, 42L)).as("sigk"))
    assert(viaSql.collect().toSet == viaApi.collect().toSet)
  }

  test("vector_dot usable in SQL over embeddings") {
    GraftFunctions.register(spark)
    Tables(spark, sf("sf0.001"), "embeddings").limit(5)
      .createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      "SELECT vec_id, vector_dot(embedding, embedding) AS selfdot FROM emb_v")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("SparkSessionExtensions injection: functions exist in a fresh newSession without register()") {
    // temp-function registration does NOT propagate to newSession();
    // only the extensions-injected functions do — so this passing
    // proves the GraftSparkExtensions path works.
    val s2 = spark.newSession()
    val r = s2.sql("SELECT simhash64('a b c') AS sh, text_fingerprint('abc') AS fp").head()
    assert(r.getLong(0) == graft.expressions.TextHashing.simhash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(r.getLong(1) == TestFolds.fingerprintRef("abc"))
  }

  test("bad literal argument yields a clear error") {
    GraftFunctions.register(spark)
    spark.range(1).selectExpr("CAST(id AS STRING) AS text")
      .createOrReplaceTempView("one_v")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingle_hashes(text, text) FROM one_v").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("argument"))
  }
}
