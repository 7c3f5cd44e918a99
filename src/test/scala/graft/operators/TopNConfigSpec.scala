package graft.operators

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's 7 config-validation unit tests
  * (`TopNConfigTest.java:30-111`) onto the `people` fixture schema
  * (FIXTURES.md §1), including the DATE field used only by validation.
  */
class TopNConfigSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("kg", DoubleType, nullable = false),
    StructField("cm", FloatType, nullable = false),
    StructField("age", IntegerType, nullable = true),
    StructField("date", DateType, nullable = false)
  ))

  test("valid config passes (TopNConfigTest.java:30-36)") {
    assert(TopNValidator.validate(TopNConfig("id", 3), Some(schema)).isEmpty)
  }

  test("non-existent field fails, attributed to 'field' (TopNConfigTest.java:38-45)") {
    val fs = TopNValidator.validate(TopNConfig("nonExist", 3), Some(schema))
    assert(fs.size == 1 && fs.head.property.contains("field"))
  }

  test("DATE field rejected for sorting (TopNConfigTest.java:47-54)") {
    val fs = TopNValidator.validate(TopNConfig("date", 3), Some(schema))
    assert(fs.size == 1 && fs.head.property.contains("field"))
  }

  test("non-numeric (string) field rejected (TopNConfigTest.java:56-63)") {
    val fs = TopNValidator.validate(TopNConfig("name", 3), Some(schema))
    assert(fs.size == 1 && fs.head.property.contains("field"))
  }

  test("size < 1 fails, attributed to 'size' (TopNConfigTest.java:65-72)") {
    val fs = TopNValidator.validate(TopNConfig("id", -1), Some(schema))
    assert(fs.size == 1 && fs.head.property.contains("size"))
  }

  test("size > MAX_TOP fails (TopNConfigTest.java:74-81)") {
    val fs = TopNValidator.validate(TopNConfig("id", TopNConfig.MaxTop + 1), Some(schema))
    assert(fs.size == 1 && fs.head.property.contains("size"))
  }

  test("two simultaneous failures both collected with attribution (TopNConfigTest.java:83-91)") {
    val fs = TopNValidator.validate(TopNConfig("nonExist", -1), Some(schema))
    assert(fs.size == 2)
    assert(fs.map(_.property).flatten.toSet == Set("field", "size"))
  }

  test("unknown input schema defers field checks (reference NPE risk, TopNConfig.java:62-66)") {
    assert(TopNValidator.validate(TopNConfig("whatever", 3), None).isEmpty)
    val fs = TopNValidator.validate(TopNConfig("whatever", 0), None)
    assert(fs.size == 1 && fs.head.property.contains("size"))
  }

  test("defaults: size=1, ignoreNull=false (TopNConfig.java:121-131)") {
    val cfg = TopNConfig("id")
    assert(cfg.size == 1 && !cfg.ignoreNull)
  }

  // ---- V5: late-bound (@Macro) config, TopNConfig.java:41-52 ----

  test("macro'd properties are deferred at deploy; concrete ones still checked") {
    val cfg = TopNRawConfig(field = "${sort_field}", size = "${n}")
    assert(TopNMacro.validateAtDeploy(cfg, Some(schema)).isEmpty)
    // concrete bad size fails at deploy even while field is deferred
    val bad = TopNRawConfig(field = "${sort_field}", size = "0")
    val fs = TopNMacro.validateAtDeploy(bad, Some(schema))
    assert(fs.size == 1 && fs.head.property.contains("size"))
  }

  test("non-integer size / non-boolean ignoreNull fail at deploy when concrete") {
    val fs = TopNMacro.validateAtDeploy(
      TopNRawConfig("id", size = "lots", ignoreNull = "maybe"), Some(schema))
    assert(fs.map(_.property).flatten.toSet == Set("size", "ignoreNull"))
  }

  test("deferred-then-passing: macros resolve at run prep and validate clean") {
    val cfg = TopNRawConfig(field = "${sort_field}", size = "${n}", ignoreNull = "${skip}")
    assert(TopNMacro.validateAtDeploy(cfg, Some(schema)).isEmpty)
    val resolved = TopNMacro.resolve(cfg,
      Map("sort_field" -> "kg", "n" -> "7", "skip" -> "true"), Some(schema))
    assert(resolved == TopNConfig("kg", 7, ignoreNull = true))
  }

  test("deferred-then-failing: a bad runtime value fails at run prep with attribution") {
    val cfg = TopNRawConfig(field = "${sort_field}", size = "${n}")
    assert(TopNMacro.validateAtDeploy(cfg, Some(schema)).isEmpty) // deploy passes
    val e = intercept[TopNValidationException] {
      TopNMacro.resolve(cfg, Map("sort_field" -> "name", "n" -> "0"), Some(schema))
    }
    assert(e.failures.map(_.property).flatten.toSet == Set("field", "size"))
  }

  test("unresolved runtime arguments fail at run prep, attributed to their property") {
    val cfg = TopNRawConfig(field = "${sort_field}", size = "3")
    val e = intercept[TopNValidationException] {
      TopNMacro.resolve(cfg, Map.empty, Some(schema))
    }
    assert(e.failures.size == 1 && e.failures.head.property.contains("field"))
    assert(e.failures.head.message.contains("sort_field"))
  }

  test("partial substitution composes with literal text") {
    val cfg = TopNRawConfig(field = "${prefix}g", size = "1")
    val resolved = TopNMacro.resolve(cfg, Map("prefix" -> "k"), Some(schema))
    assert(resolved.field == "kg")
  }
}
