package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Ports the reference's 5 end-to-end golden cases
  * (`TopNTest.java:128-144`), the docs golden example
  * (`docs/TopN-batchaggregator.md:32-58`), and the edge fixtures from
  * SURVEY §7.4 (empty input, N > rows, NaN / ±0.0 / ±Inf, ties).
  * Set equality on full rows, exactly like the reference's e2e test
  * (`TopNTest.java:122-125`) — the contract is tie-agnostic.
  */
class TopNSpec extends SparkSuite {

  private val peopleSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("kg", DoubleType, nullable = false),
    StructField("cm", FloatType, nullable = false),
    StructField("age", IntegerType, nullable = true)
  ))

  private def people: DataFrame = {
    val rows = Seq(
      Row("Leo", 1L, 11.1, 111.1f, Integer.valueOf(11)),
      Row("Eve", 2L, 22.2, 222.2f, Integer.valueOf(22)),
      Row("Bob", 3L, 33.3, 333.3f, null),
      Row("Alice", 4L, 44.4, 444.4f, Integer.valueOf(44))
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), peopleSchema)
  }

  private def names(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  test("age int, N=4, ignoreNull=true -> {Alice, Eve, Leo} (TopNTest.java:131)") {
    val out = TopN.transform(TopNConfig("age", 4, ignoreNull = true))(people)
    assert(names(out) == Set("Alice", "Eve", "Leo"))
  }

  test("age int, N=4, ignoreNull=false -> all 4, NULL kept (TopNTest.java:134)") {
    val out = TopN.transform(TopNConfig("age", 4))(people)
    assert(names(out) == Set("Alice", "Eve", "Leo", "Bob"))
    // NULL ranks below every non-NULL value (docs golden, md:32-50)
    assert(out.collect().last.getString(0) == "Bob")
  }

  test("id long, N=2 -> {Alice, Bob} (TopNTest.java:137)") {
    assert(names(TopN.transform(TopNConfig("id", 2))(people)) == Set("Alice", "Bob"))
  }

  test("kg double, N=2 -> {Alice, Bob} (TopNTest.java:140)") {
    assert(names(TopN.transform(TopNConfig("kg", 2))(people)) == Set("Alice", "Bob"))
  }

  test("cm float, N=2 -> {Alice, Bob} (TopNTest.java:143)") {
    assert(names(TopN.transform(TopNConfig("cm", 2))(people)) == Set("Alice", "Bob"))
  }

  test("docs golden example: ordered desc, NULL last (docs/TopN-batchaggregator.md:32-58)") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("age", IntegerType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("alice", null), Row("bob", Integer.valueOf(1)),
        Row("dave", Integer.valueOf(6))), 2), schema)
    val kept = TopN.transform(TopNConfig("age", 3))(df).collect()
    assert(kept.map(_.getString(0)).toSeq == Seq("dave", "bob", "alice"))
    val dropped = TopN.transform(TopNConfig("age", 3, ignoreNull = true))(df).collect()
    assert(dropped.map(_.getString(0)).toSeq == Seq("dave", "bob"))
  }

  test("late-bound config end-to-end: deploy defer -> runtime resolve -> execute") {
    val raw = TopNRawConfig(field = "${sort_field}", size = "${n}", ignoreNull = "true")
    // deploy time: field/size unknown, only concrete values checked
    assert(TopNMacro.validateAtDeploy(raw, Some(people.schema)).isEmpty)
    val out = TopN.transformLateBound(raw, Map("sort_field" -> "age", "n" -> "4"))(people)
    assert(names(out) == Set("Alice", "Eve", "Leo")) // == the ignoreNull golden case
  }

  test("output schema identical to input (TopN.java:71)") {
    val out = TopN.transform(TopNConfig("age", 2))(people)
    assert(out.schema == people.schema)
  }

  test("empty input -> empty output, no error (TopN.java:101-103)") {
    val empty = people.where("id < 0")
    assert(TopN.transform(TopNConfig("id", 3))(empty).count() == 0)
  }

  test("N > |input| -> all rows, sorted descending (docs md:13)") {
    val out = TopN.transform(TopNConfig("id", 100))(people).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L, 2L, 1L))
  }

  test("invalid config throws with all failures (FailureCollector parity)") {
    val e = intercept[TopNValidationException] {
      TopN.transform(TopNConfig("nope", -1))(people)
    }
    assert(e.failures.size == 2)
  }

  test("float semantics: NaN sorts above +Inf; ±0.0 equal (SURVEY §7.4)") {
    val schema = StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("nan", Double.NaN), Row("pinf", Double.PositiveInfinity),
        Row("ninf", Double.NegativeInfinity), Row("zero", 0.0),
        Row("negzero", -0.0), Row("one", 1.0)), 2), schema)
    val top2 = TopN.transform(TopNConfig("v", 2))(df).collect().map(_.getString(0))
    assert(top2.toSeq == Seq("nan", "pinf")) // Java Float.compare parity
    // ±0.0 are one equivalence class: top-4 must include exactly one boundary pick
    val top5 = TopN.transform(TopNConfig("v", 5))(df).collect().map(_.getString(0)).toSet
    assert(Set("nan", "pinf", "one").subsetOf(top5))
    assert((top5 & Set("zero", "negzero")).nonEmpty)
  }

  test("physical plan is TakeOrderedAndProject (no full sort, no single-reducer funnel)") {
    val out = TopN.transform(TopNConfig("kg", 2))(people)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("ignoreNull filter reaches the scan as IsNotNull pushdown on parquet") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val out = TopN.transform(TopNConfig("l_extendedprice", 5, ignoreNull = true))(li)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice)]"), s"plan:\n$plan")
  }

  test("top-10 lineitem by l_extendedprice matches naive oracle at sf0.001") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val got = TopN.transform(TopNConfig("l_extendedprice", 10))(li)
      .collect().map(_.getAs[Double]("l_extendedprice")).toSeq
    val want = li.collect().map(_.getAs[Double]("l_extendedprice"))
      .sorted(Ordering[Double].reverse).take(10).toSeq
    assert(got == want)
  }
}
