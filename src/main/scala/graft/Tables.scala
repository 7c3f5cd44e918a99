package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Parquet + explicit per-table paths keeps every scan eligible for
  * predicate pushdown, column pruning and (on a real cluster)
  * file-level parallelism; at 100 TB these would be partitioned
  * directories and the same call sites would pick up partition
  * pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as a nanos-since-epoch long instead.
      // Keeping nanosecond longs (not truncated micros timestamps)
      // preserves exact ordering for as-of / strictly-before semantics.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
