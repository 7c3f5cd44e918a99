package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LevenshteinPrefilter

/** Contract of the [[LevenshteinPrefilter]] optimizer rule: the
  * implied length-difference predicate appears in the optimized plan,
  * results are bit-identical with and without the rule, and a
  * disjunctive predicate is NOT strengthened (the implication only
  * holds for top-level conjuncts).
  */
class OptimizerRuleSpec extends SparkSuite {

  private lazy val s2 = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(LevenshteinPrefilter)
    s
  }

  private def names(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq((1L, "kettle"), (2L, "kettles"), (3L, "cat"),
      (4L, "settle"), (5L, "ket")).toDF("id", "name")
  }

  test("capped levenshtein filter gains the length-difference prefilter") {
    val df = names(s2).as("l").join(names(s2).as("r"),
        col("l.id") < col("r.id"))
      .where(levenshtein(col("l.name"), col("r.name")) <= 1)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length(") || opt.contains("abs(("),
      s"expected length prefilter in:\n$opt")
    // semantics unchanged: same pairs as the rule-free session
    val base = names(spark).as("l").join(names(spark).as("r"),
        col("l.id") < col("r.id"))
      .where(levenshtein(col("l.name"), col("r.name")) <= 1)
      .select("l.id", "r.id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select("l.id", "r.id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == base && got == Set((1L, 2L), (1L, 4L)), got)
  }

  test("a LONG-literal cap also gains the prefilter (through the coercion Cast)") {
    // `<= 1L` coerces the int-typed levenshtein under a Cast to LONG;
    // the rule must match through that Cast or silently skip the
    // prefilter for long caps.
    val df = names(s2).as("l").join(names(s2).as("r"),
        col("l.id") < col("r.id"))
      .where(levenshtein(col("l.name"), col("r.name")) <= lit(1L))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs("), s"expected length prefilter in:\n$opt")
    val got = df.select("l.id", "r.id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 4L)), got)
  }

  test("a disjunctive levenshtein predicate is NOT strengthened") {
    val df = names(s2).as("l").join(names(s2).as("r"),
        col("l.id") < col("r.id"))
      .where(levenshtein(col("l.name"), col("r.name")) <= 1 ||
        col("r.id") === 5)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("abs("), s"disjunct leaked a prefilter:\n$opt")
    // (3, 5) survives only through the OR branch: lengths differ by 0
    // but distance is 2 — a wrongly-conjoined prefilter on a DIFFERENT
    // shaped pair like (1 kettle, 5 ket) [diff 3 > 1] would drop it
    val got = df.select("l.id", "r.id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 5L)) && got.contains((3L, 5L)), got)
  }

  test("rule is idempotent (second application adds nothing)") {
    val df = names(s2)
      .where(levenshtein(col("name"), lit("kettle")) <= 1)
    val once = LevenshteinPrefilter(df.queryExecution.optimizedPlan)
    val twice = LevenshteinPrefilter(once)
    assert(once == twice)
  }

  test("extensions path injects the rule (fresh-JVM analog via newSession)") {
    // GraftFunctionRegistry.injectInto wires the rule; ExtensionsSmoke
    // proves the spark-submit conf path end-to-end. Here: the builder
    // hook exists and composes with the function injections.
    val e = new org.apache.spark.sql.SparkSessionExtensions
    org.apache.spark.sql.graft.GraftFunctionRegistry.injectInto(e)
    val rules = org.apache.spark.sql.graft.ExtensionsTestShim.optimizerRules(e, spark)
    assert(rules.exists(_ eq LevenshteinPrefilter), rules.toString)
  }
}
