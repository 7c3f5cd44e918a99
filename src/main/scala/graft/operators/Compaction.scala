package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction: rewrite a fragmented parquet dataset into
  * ~`targetBytes`-sized files. At 100 TB the small-file problem is an
  * operational cliff — a streaming sink or over-parallel writer that
  * leaves 10^6 KB-sized files makes every downstream scan pay task
  * startup + footer reads per file and crushes the namenode/listing
  * layer; periodic compaction is the standing maintenance job of
  * every lakehouse.
  *
  * The file count is derived from the MEASURED input bytes (a
  * filesystem listing — deterministic, no sampling, no size
  * estimator): `ceil(totalBytes / targetBytes)` output files of
  * roughly equal size. Two layouts:
  *  - round-robin (`sortCol = None`): pure size balancing via
  *    `repartition(n)` — even files, no ordering promise;
  *  - range-clustered (`sortCol = Some(c)`): `repartitionByRange` +
  *    in-partition sort, so each output file covers a contiguous
  *    value range and parquet min/max stats prune point/range reads
  *    (the one-dimensional cousin of the z-order layout, which
  *    handles the 2-D case).
  *
  * Row content is untouched — compaction is a physical re-layout,
  * proven by round-trip equality in CompactionSpec.
  */
object Compaction {

  final case class Report(filesIn: Long, bytesIn: Long, filesOut: Long,
                          targetBytes: Long)

  /** Compact parquet at `inPath` into `outPath`. Returns the measured
    * before/after file counts. `targetBytes` is the COMPRESSED
    * on-disk target (input bytes are compressed too, so the ratio
    * carries through); the final file sizes track it up to
    * row-group granularity and compression variance.
    *
    * A hive-partitioned input (`day=.../part-*.parquet`) is read with
    * its partition columns recovered as data columns, but the OUTPUT
    * is a flat layout — to compact per partition and keep the layout,
    * run per partition directory (which is also the right unit of
    * work for incremental daily compaction).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long, sortCol: Option[String] = None): Report = {
    require(targetBytes >= (1L << 16),
      s"targetBytes must be >= 64 KiB, got $targetBytes — smaller " +
        "targets recreate the small-file problem being fixed")
    val (filesIn, bytesIn) = parquetFootprint(spark, inPath)
    require(filesIn > 0, s"no parquet files under $inPath")
    val n = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val laid = sortCol match {
      case Some(c) =>
        df.repartitionByRange(n, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(n)
    }
    laid.write.mode(SaveMode.Overwrite).parquet(outPath)
    val (filesOut, _) = parquetFootprint(spark, outPath)
    Report(filesIn, bytesIn, filesOut, targetBytes)
  }

  /** (file count, total bytes) of the parquet data files under `path`
    * — driver-side metadata listing only, never data.
    */
  def parquetFootprint(spark: SparkSession, path: String): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      val it = fs.listFiles(p, true)
      var files = 0L
      var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          files += 1; bytes += f.getLen
        }
      }
      (files, bytes)
    }
  }
}
