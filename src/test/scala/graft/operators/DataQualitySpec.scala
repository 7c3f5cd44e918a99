package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSuite {
  import spark.implicits._

  private val withNulls = Seq(
    (1L, Some(10.0)), (2L, Some(60.0)), (3L, None), (4L, Some(5.0))
  ).toDF("k", "q")

  test("NULL predicate outcomes count as violations") {
    // the range check over NULL q evaluates to NULL — in a quality
    // gate that is a violation (the NULL is the problem being hunted),
    // not a silent pass-through
    val r = DataQuality.predicateRule(withNulls, "range",
        col("q") < 1 || col("q") > 50)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("range", 4L, 2L)), // 60.0 out of range + NULL
      s"NULL under-reported: ${r.toSeq}")
  }

  test("predicateSuite equals the union of individual rules, one scan") {
    val rules = Seq(
      "range" -> (col("q") < 1 || col("q") > 50),
      "review" -> (col("q") > 45))
    val suite = DataQuality.predicateSuite(withNulls, rules)
    val separate = DataQuality.suite(rules.map { case (n, v) =>
      DataQuality.predicateRule(withNulls, n, v)
    })
    val a = suite.collect().map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    val b = separate.collect().map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b), s"${a.toSeq} vs ${b.toSeq}")
    // ONE aggregate feeds every rule row: a single scan in the plan
    val scans = suite.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode => l
    }
    assert(scans.length == 1,
      s"predicate suite must scan once, saw ${scans.length} leaves")
  }

  test("empty input: zero checked, zero violations") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("k", "q")
    val r = DataQuality.predicateSuite(empty, Seq(
        "range" -> (col("q") < 1), "sign" -> (col("q") < 0)))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("range", 0L, 0L), ("sign", 0L, 0L)))
  }

  test("histogramDrift: exact flags at the threshold boundary, one-sided bins count 0") {
    // ref: 50 values in bin 0, 50 in bin 1  (shares .5/.5)
    // cur: 48 in bin 0, 48 in bin 1, 4 in bin 9 (shares .48/.48/.04)
    // threshold 2%: |.5-.48| = .02 is NOT > 2% (strict); bin 9's
    // .04 - 0 = .04 IS. Cross-multiplied exactly, never via doubles.
    val ref = (1L to 100L).map(i => if (i <= 50) 5L else 15L).toDF("v")
    val cur = ((1L to 48L).map(_ => 5L) ++ (1L to 48L).map(_ => 15L) ++
      Seq(95L, 95L, 95L, 95L)).toDF("v")
    val r = DataQuality.histogramDrift(ref, cur, "v",
        binWidth = 10L, thresholdPct = 2)
      .collect().map(x => (x.getLong(0),
        (x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r == Map(
      0L -> (50L, 48L, false),
      1L -> (50L, 48L, false),
      9L -> (0L, 4L, true)))
  }

  test("histogramDrift: identical distributions never drift; config refuses loudly") {
    val d = (1L to 60L).map(i => i % 30).toDF("v")
    val r = DataQuality.histogramDrift(d, d, "v", 10L, 2)
      .collect().map(_.getBoolean(3))
    assert(r.nonEmpty && r.forall(_ == false))
    intercept[IllegalArgumentException] {
      DataQuality.histogramDrift(d, d, "v", 0L, 2)
    }
    intercept[IllegalArgumentException] {
      // 3 does not divide 100 — the exact cross-multiplication needs it
      DataQuality.histogramDrift(d, d, "v", 10L, 3)
    }
  }

  test("histogramDrift: negative values refuse loudly in-plan") {
    val neg = Seq(5L, -1L).toDF("v")
    val ex = intercept[Exception] {
      DataQuality.histogramDrift(neg, neg, "v", 10L, 2).collect()
    }
    assert(ex.getMessage != null)
  }
}
