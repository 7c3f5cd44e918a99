package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  test("cumulative equals the sequential prefix sum, any shard count") {
    val rows = (1L to 500L).map(i => (i, (i * 7) % 23))
    val expect = rows.scanLeft((0L, 0L)) { case ((_, acc), (k, v)) =>
      (k, acc + v)
    }.drop(1).toMap
    for (shards <- Seq(1, 4, 32)) {
      val got = PrefixSum.cumulative(rows.toDF("k", "v"), Seq("k"), "v", shards)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
      assert(got == expect, s"shards=$shards")
    }
  }

  test("negative deltas: cumulative sweeps down as well as up") {
    val deltas = Seq((1L, 3L), (2L, -1L), (3L, -1L), (4L, 5L), (5L, -6L))
    val got = PrefixSum.cumulative(deltas.toDF("k", "v"), Seq("k"), "v", 3)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 6L, 5L -> 0L))
  }

  test("input partitioning never changes the result") {
    val df = (1L to 300L).map(i => (i, i % 11)).toDF("k", "v")
    val a = PrefixSum.cumulative(df.repartition(13), Seq("k"), "v")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("cum"))).toSet
    val b = PrefixSum.cumulative(df.repartition(2), Seq("k"), "v")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("cum"))).toSet
    assert(a == b)
  }

  test("no single-task global sort: the data window is partitioned") {
    val df = (1L to 100L).map(i => (i, 1L)).toDF("k", "v")
    val plan = PrefixSum.cumulative(df, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    // the per-row window must carry the shard in its partition spec;
    // a bare `Window [.. ORDER BY k]` over the data would be the
    // single-task shape this operator exists to avoid
    assert(plan.contains("__shard"), s"expected shard-partitioned window:\n$plan")
  }

  test("systematicPps: every step-multiple crossing selected, total mass preserved") {
    // weights 1..100, total 5050; step 500 -> crossings at 500, 1000, ...
    val rows = (1L to 100L).map(i => (i, i))
    val picked = PrefixSum.systematicPps(rows.toDF("k", "w"), Seq("k"), "w",
        step = 500L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("cum")))
    // sequential replay
    var acc = 0L
    val expect = rows.flatMap { case (k, w) =>
      val before = acc; acc += w
      if (acc / 500L != before / 500L) Some((k, acc)) else None
    }
    assert(picked.sortBy(_._1).toSeq == expect.sortBy(_._1))
    assert(picked.length == 10) // floor(5050/500)
  }

  test("systematicPps: a row heavier than step is always selected") {
    val rows = Seq((1L, 10L), (2L, 5000L), (3L, 10L))
    val picked = PrefixSum.systematicPps(rows.toDF("k", "w"), Seq("k"), "w",
        step = 100L).collect().map(_.getAs[Long]("k")).toSet
    assert(picked.contains(2L))
  }

  test("negative weights refuse loudly; bad config refuses loudly") {
    intercept[Exception] {
      PrefixSum.systematicPps(Seq((1L, -5L)).toDF("k", "w"), Seq("k"), "w",
        step = 10L).collect()
    }
    intercept[IllegalArgumentException] {
      PrefixSum.systematicPps(Seq((1L, 5L)).toDF("k", "w"), Seq("k"), "w",
        step = 0L)
    }
    intercept[IllegalArgumentException] {
      PrefixSum.cumulative(Seq((1L, 5L)).toDF("k", "w"), Nil, "w")
    }
  }
}
