package graft

import org.apache.spark.sql.SparkSession

/** Public entry point for the engine's SQL function surface: makes
  * graft's native expressions (`vector_dot`, `word_shingle_hashes`,
  * `minhash_signature`, `text_fingerprint`, `simhash64`,
  * `byte_stride`, `token_count`, `interleave_bits`, `topn_agg`)
  * callable from `spark.sql`. Session-scoped and idempotent.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.GraftFunctionRegistry.register(spark)
}
