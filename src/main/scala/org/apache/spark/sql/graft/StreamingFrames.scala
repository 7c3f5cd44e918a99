package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** Bridge for the v1 streaming Source contract: `getBatch` must
  * return a STREAMING-tagged DataFrame (MicroBatchExecution asserts
  * `isStreaming`), and the only way to tag one is the `private[sql]`
  * `internalCreateDataFrame` — same call FileStreamSource makes.
  * Lives in the sql package namespace for that access, like the
  * sibling TopNAggregate.
  */
object StreamingFrames {
  def asStreaming(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    session.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
