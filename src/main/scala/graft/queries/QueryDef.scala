package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * Conventions that keep the driver's hash-match exact across engines
  * (the driver sorts columns by name, then hashes values — SURVEY §5):
  *  - every LIMIT carries a deterministic tiebreaker, so the row SET is
  *    unique, not just the ranking values;
  *  - money/decimal aggregates are computed exactly in DECIMAL and cast
  *    to DOUBLE only at the end (both engines then produce the same
  *    correctly-rounded double — never round doubles mid-plan);
  *  - computed integer columns are cast to BIGINT on both sides
  *    (DuckDB's count/length/row_number are BIGINT, Spark's are int);
  *  - raw timestamp columns are cast to DATE or string in outputs
  *    (parquet timestamp annotations differ between writers);
  *  - aliases are identical lowercase snake_case on both sides.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Oracle SQL that can only be produced with the data in hand —
      * e.g. the ann_ivf_topk oracle inlines k-means centroids trained
      * (deterministically) on the target table, so the SQL is a
      * function of (session, sfDir). Resolved by [[graft.SparkEntry]]
      * at dump time; a generator that throws degrades that query to
      * the driver's rows-only check instead of failing the dump.
      */
    oracleGen: Option[(SparkSession, String) => String] = None
)
