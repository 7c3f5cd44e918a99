package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("added / removed / changed / unchanged are classified exactly") {
    val newSnap = Seq(
      (1L, "a", 10.0),  // unchanged
      (2L, "b", 21.0),  // changed value
      (3L, "x", 30.0),  // changed string
      (5L, "e", 50.0)   // added; 4 removed
    ).toDF("k", "s", "v")
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("identical snapshots diff to empty") {
    assert(SnapshotDiff.diff(oldSnap, oldSnap, Seq("k")).count() == 0)
  }

  test("column order does not matter (fingerprint sorts columns)") {
    val reordered = oldSnap.select("v", "k", "s")
    assert(SnapshotDiff.diff(oldSnap, reordered, Seq("k")).count() == 0)
  }

  test("schema mismatch is refused loudly") {
    val other = oldSnap.withColumnRenamed("v", "w")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(oldSnap, other, Seq("k"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("composite keys are supported") {
    val o = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val n = Seq((1L, "x", 1.0), (1L, "y", 3.0)).toDF("k1", "k2", "v")
    val d = SnapshotDiff.diff(o, n, Seq("k1", "k2")).collect()
    assert(d.length == 1)
    assert(d.head.getString(1) == "y" && d.head.getString(2) == "changed")
  }

  test("a value shifting across a NULL in same-typed columns is 'changed'") {
    // xxhash64 skips NULL struct fields, so (x, NULL) vs (NULL, x)
    // would collide without the per-column null flags in the
    // fingerprint — these rows MUST report changed, not silence
    val o = Seq((1L, Some("x"), None: Option[String]),
      (2L, Some("same"), Some("same"))).toDF("k", "c1", "c2")
    val n = Seq((1L, None: Option[String], Some("x")),
      (2L, Some("same"), Some("same"))).toDF("k", "c1", "c2")
    val d = SnapshotDiff.diff(o, n, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "changed"), s"NULL shift missed: $d")
  }

  test("requireUniqueKeys refuses duplicate snapshot keys loudly") {
    val dup = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k", "s", "v")
    val ok = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val e = intercept[Exception] {
      SnapshotDiff.diff(dup, ok, Seq("k"), requireUniqueKeys = true)
        .collect()
    }
    assert(e.getMessage.contains("duplicate snapshot key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate snapshot key")),
      s"wrong failure: $e")
    // and the checked path still passes on genuinely unique keys
    assert(SnapshotDiff.diff(ok, ok, Seq("k"),
      requireUniqueKeys = true).count() == 0)
  }
}
