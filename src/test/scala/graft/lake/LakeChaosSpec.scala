package graft.lake

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Seeded randomized DIFFERENTIAL test of the lake's transactional
  * core: a random chain of append / copy-on-write delete /
  * merge-on-read delete / keyed merge / compact / restore is applied
  * to both the table and an in-memory reference model; after every
  * commit the live scan must equal the model, and random HISTORICAL
  * versions must equal the model state recorded when that version
  * committed. One chain crosses the checkpoint interval, so sharded-
  * checkpoint replay, DV supersession, restore bookkeeping and layout
  * rewrites are all exercised under interleavings no hand-written
  * spec enumerates. Seeds are FIXED — failures reproduce exactly.
  */
class LakeChaosSpec extends SparkSuite {

  private type Model = Map[Long, (Long, String)] // k -> (cents, tag)

  private def toDf(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "cents", "tag")
  }

  private def readBack(root: String, asOf: Option[Long]): Model =
    LakeTable.scanAsOf(spark, root, asOf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap

  private def runChain(seed: Int, ops: Int): Unit = {
    val rnd = new Random(seed)
    val root = Files.createTempDirectory(s"graft_chaos_$seed")
      .toString + "/t"
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = LakeLog.fileSystem(rootP,
      spark.sparkContext.hadoopConfiguration)

    var model: Model = (0L until 60L).map(k =>
      k -> (k * 100, s"t$k")).toMap
    LakeTable.create(spark, root,
      toDf(model.toSeq.map { case (k, (c, t)) => (k, c, t) }),
      Seq("k"), nFiles = 4, clusterBy = Some("k"))
    val history = mutable.Map[Long, Model]()
    var nextKey = 60L
    def version: Long = LakeLog.latestVersion(f, rootP).get
    history(version) = model

    (1 to ops).foreach { i =>
      val op = rnd.nextInt(10)
      op match {
        case 0 | 1 | 2 => // append fresh keys
          val n = 5 + rnd.nextInt(20)
          val batch = (nextKey until nextKey + n).map(k =>
            (k, k * 100 + rnd.nextInt(50), s"a$i"))
          nextKey += n
          LakeTable.append(spark, root, toDf(batch),
            nFiles = 1 + rnd.nextInt(3))
          model = model ++ batch.map { case (k, c, t) => k -> (c, t) }
        case 3 => // copy-on-write range delete
          val lo = rnd.nextLong(nextKey)
          val hi = math.min(nextKey, lo + 1 + rnd.nextInt(40))
          LakeTable.deleteWhere(spark, root,
            Seq(LakeTable.ColRange("k", Some(lo), Some(hi))))
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 4 => // merge-on-read delete (deletion vectors)
          val lo = rnd.nextLong(nextKey)
          val hi = math.min(nextKey, lo + 1 + rnd.nextInt(25))
          LakeTable.deleteWhereMor(spark, root,
            Seq(LakeTable.ColRange("k", Some(lo), Some(hi))))
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 5 | 6 => // keyed merge: upserts over existing + new, deletes
          val existing = model.keys.toSeq.sorted
          val ups = rnd.shuffle(existing).take(1 + rnd.nextInt(10))
            .map(k => (k, k * 100 + 1000 + i, s"u$i", 1L, "U"))
          val ins = (nextKey until nextKey + 1 + rnd.nextInt(5))
            .map(k => (k, k * 100, s"i$i", 1L, "U"))
          nextKey += ins.size
          val dels = rnd.shuffle(existing).take(rnd.nextInt(5))
            .filterNot(k => ups.exists(_._1 == k))
            .map(k => (k, 0L, "", 1L, "D"))
          val changes = ups ++ ins ++ dels
          if (changes.nonEmpty) {
            import spark.implicits._
            LakeTable.merge(spark, root,
              changes.toDF("k", "cents", "tag", "version", "op"), "k")
            model = model --
              dels.map(_._1) ++
              (ups ++ ins).map { case (k, c, t, _, _) => k -> (c, t) }
          }
        case 7 => // compact small files
          LakeTable.compact(spark, root, smallBytes = 1L << 20,
            targetBytes = 4L << 20)
        case 8 => // restore to a random surviving earlier version
          val vs = history.keys.toSeq.sorted
          val target = vs(rnd.nextInt(vs.size))
          if (target < version) {
            LakeTable.restore(spark, root, target)
            model = history(target)
          }
        case 9 => // overwrite with a model-derived subset (content reset)
          val keep = model.toSeq.sortBy(_._1)
            .take(math.max(1, model.size / 2))
          LakeTable.overwrite(spark, root,
            toDf(keep.map { case (k, (c, t)) => (k, c, t) }))
          model = keep.toMap
      }
      history(version) = model
      val got = readBack(root, None)
      assert(got == model,
        s"seed=$seed op#$i (kind $op): live scan diverged — " +
          s"missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)} " +
          s"changed=${model.keySet.intersect(got.keySet)
            .filter(k => model(k) != got(k)).take(5)}")
      if (i % 5 == 0) {
        // a random HISTORICAL version must replay to the state
        // recorded when it committed (snapshot isolation across every
        // interleaving of rewrites, DVs, restores and checkpoints)
        val vs = history.keys.toSeq.sorted
        val v = vs(rnd.nextInt(vs.size))
        assert(readBack(root, Some(v)) == history(v),
          s"seed=$seed op#$i: time travel to v$v diverged")
      }
    }
    assert(version > LakeLog.checkpointInterval,
      "the chain must cross a checkpoint boundary")
  }

  test("random op chains match the reference model (seed 1)") {
    runChain(seed = 1, ops = 24)
  }
  test("random op chains match the reference model (seed 2)") {
    runChain(seed = 2, ops = 24)
  }
  test("random op chains match the reference model (seed 3)") {
    runChain(seed = 3, ops = 24)
  }
}
