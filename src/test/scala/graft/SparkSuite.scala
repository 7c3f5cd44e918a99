package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * `getOrCreate` returns the same session across suites in the forked
  * test JVM, which keeps `sbt test` fast).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  def sf(dir: String): String = s"/root/testdata/$dir"
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Task-level ERROR traces are redundant in local-mode tests:
    // every real failure propagates to the driver and fails its test
    // with the same stack, so the executor/scheduler/stream-engine
    // duplicates only bury real failures in the 1000+-test log —
    // especially around tests that INTERCEPT expected errors
    // (raise_error guards, refusal contracts, expected stream
    // aborts), which used to print full QueryExecutionErrors traces
    // from passing suites. Driver-side WARN+ from everything else
    // stays visible.
    Seq(
      "org.apache.spark.executor.Executor",
      "org.apache.spark.scheduler.TaskSetManager",
      // DAGScheduler: "Failed to update accumulator (Unknown class)"
      // one-liners from updates racing an expected job abort, plus
      // "Failed to cancel job group" WARN chatter on stream stops
      "org.apache.spark.scheduler.DAGScheduler",
      "org.apache.spark.util.Utils",
      "org.apache.spark.broadcast.TorrentBroadcast",
      "org.apache.spark.sql.execution.datasources.FileFormatWriter",
      // V2 write abort bookkeeping ("is aborting"/"aborted") around
      // expected streaming-epoch failures
      "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec",
      // task-side twin of the above ("Aborting commit for partition
      // N") — fires only when an expected job abort catches tasks
      // still in flight, so it appears or not by scheduling luck
      "org.apache.spark.sql.execution.datasources.v2.DataWritingSparkTask",
      // "Error occurred while fetching local blocks, null" teardown
      // race when a stop() lands mid-fetch; the failure, if real,
      // still surfaces as the task's own exception
      "org.apache.spark.storage.ShuffleBlockFetcherIterator",
      "org.apache.spark.sql.execution.streaming.MicroBatchExecution",
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution"
    ).foreach(l => org.apache.logging.log4j.core.config.Configurator
      .setLevel(l, org.apache.logging.log4j.Level.FATAL))
    s
  }
}
