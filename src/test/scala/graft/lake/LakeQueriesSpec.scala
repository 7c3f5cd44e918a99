package graft.lake

import graft.SparkSuite
import graft.queries.LakeQueries

class LakeQueriesSpec extends SparkSuite {

  test("registry chain ends compacted AND still prunes on the key") {
    val root = LakeQueries.chainFor(spark, sf("sf0.001"))
    val snap = LakeTable.snapshot(spark, root)
    assert(snap.files.size >= 2 && snap.files.size <= 4,
      s"expected ~3 post-compaction files, got ${snap.files.size}")
    val (_, rep) = LakeTable.scanPruned(spark, root,
      Seq(LakeTable.ColRange("o_orderkey", Some(200L), Some(399L))))
    assert(rep.filesRead < rep.filesTotal,
      s"registry chain lost its pruning layout: $rep")
    // history proves the full op chain survived in the log
    val ops = LakeTable.history(spark, root).orderBy("version")
      .collect().map(_.getString(1)).toSeq
    assert(ops == Seq("create", "append", "merge", "delete", "compact"))
  }
}
