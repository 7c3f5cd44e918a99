package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contract of the top-N operator (SURVEY §5), driven
  * by seeded scalacheck generators (sampled manually — the
  * scalatest/scalacheck bridge artifact isn't in the offline cache):
  * for any input and any N —
  *  - |output| = min(N, |eligible input|)
  *  - output is a sub-multiset of the input
  *  - every kept value >= every excluded value (nulls smallest)
  *  - output is non-increasing in the sort field, NULLs last
  *  - ignoreNull drops exactly the null-field rows
  */
class TopNPropertiesSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", IntegerType, nullable = true)))

  private val caseGen: Gen[(List[(Long, Option[Int])], Int)] = for {
    n <- Gen.chooseNum(0, 60)
    vs <- Gen.listOfN(n, Gen.option(Gen.chooseNum(-50, 50)))
    topN <- Gen.chooseNum(1, 70)
  } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, topN)

  private def cases(count: Int): Seq[(List[(Long, Option[Int])], Int)] =
    (1 to count).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def df(rows: List[(Long, Option[Int])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.map(Integer.valueOf).orNull) }, 3),
      schema)

  private def key(v: Option[Int]): Long = v.map(_.toLong).getOrElse(Long.MinValue)

  test("property: size, containment, cut correctness, ordering, null modes (15 seeded cases)") {
    cases(15).foreach { case (rows, n) =>
      val clue = s"rows=$rows n=$n"
      val out = TopN.transform(TopNConfig("v", n))(df(rows)).collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Int])))

      assert(out.length == math.min(n, rows.length), clue)
      val inputMultiset = rows.groupBy(identity).view.mapValues(_.size).toMap
      out.groupBy(identity).foreach { case (row, kept) =>
        assert(inputMultiset.getOrElse(row, 0) >= kept.size, clue)
      }
      val keptIds = out.map(_._1).toSet
      val excluded = rows.filterNot(r => keptIds.contains(r._1))
      if (out.nonEmpty && excluded.nonEmpty) {
        assert(out.map(r => key(r._2)).min >= excluded.map(r => key(r._2)).max, clue)
      }
      val keys = out.map(r => key(r._2))
      assert(keys.zip(keys.drop(1)).forall { case (a, b) => a >= b }, clue)

      val outNoNull = TopN.transform(TopNConfig("v", n, ignoreNull = true))(df(rows))
        .collect()
      assert(outNoNull.forall(!_.isNullAt(1)), clue)
      assert(outNoNull.length == math.min(n, rows.count(_._2.nonEmpty)), clue)
    }
  }

  test("property: grouped top-N bounds group sizes and keeps per-group maxima (10 seeded cases)") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    cases(10).foreach { case (rows, _) =>
      if (rows.nonEmpty) {
        val n = 1 + rows.length % 5
        val grouped = df(rows).withColumn("g", pmod(col("id"), lit(4L)))
        val out = GroupedTopN.transform(TopNConfig("v", n), Seq("g"), Seq("id"))(grouped)
          .collect()
          .map(r => (r.getLong(2), r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Int])))
        out.groupBy(_._1).foreach { case (_, rs) => assert(rs.size <= n) }
        rows.groupBy(_._1 % 4).foreach { case (g, rs) =>
          val maxV = rs.map(r => key(r._2)).max
          val keptVals = out.filter(_._1 == g).map(r => key(r._3))
          assert(keptVals.contains(maxV), s"group $g rows=$rows n=$n")
        }
      }
    }
  }
}
