package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's one-line JSON stdout contract. The round-19 driver
  * run failed to parse the bench line (`parsed: null` on an rc-0 run),
  * which cost that round its official perf comparison — this spec
  * round-trips EXACTLY what `Bench.main` emits (same assembly function)
  * through a strict JSON parser and pins the contract fields, for both
  * the idle and the loaded-run (warn-carrying) shapes, plus the
  * ASCII-only invariant that keeps the line decodable under any
  * consumer charset.
  */
class BenchLineSpec extends AnyFunSuite {

  private val reruns = """{"q_a":[0.100,0.250,0.110]}"""
  private val diag =
    """{"q_a":[1.234,4.56,0.01,1.23,0.05,31,1.22],"q_b":[0.500,1.00,0.00,1.10,0.00,4,0.10]}"""
  private val queries = """{"q_a":1.234,"q_b":0.500}"""

  private def parse(line: String): org.json4s.JValue =
    org.json4s.jackson.JsonMethods.parse(line,
      useBigDecimalForDouble = false)

  test("compact line round-trips a strict JSON parse (idle shape)") {
    val line = Bench.compactLine(12.345, 2, 0, 0.5, 1.0,
      reruns, diag, queries, "/tmp/bench.json", "/root/testdata/sf0.1")
    assert(!line.contains("\n"), "contract is ONE line")
    val j = parse(line)
    import org.json4s._
    assert((j \ "metric") === JString("total"))
    assert((j \ "unit") === JString("sec"))
    assert((j \ "value") === JDouble(12.345))
    assert((j \ "n") === JInt(2))
    assert((j \ "failed") === JInt(0))
    assert((j \ "warn") === JNothing, "idle runs carry no warn")
    assert((j \ "sf") === JString("/root/testdata/sf0.1"))
    val qs = (j \ "queries").asInstanceOf[JObject].obj.toMap
    assert(qs("q_a") === JDouble(1.234) && qs.size === 2)
    assert((j \ "full") === JString("/tmp/bench.json"))
  }

  test("loaded-run warn fragment stays parseable and ASCII-only") {
    val line = Bench.compactLine(99.9, 259, 1, 5.67, 2.0,
      reruns, diag, queries, "/tmp/bench.json", "/root/testdata/sf0.1")
    val j = parse(line)
    import org.json4s._
    val warn = (j \ "warn") match {
      case JString(s) => s
      case other => fail(s"warn missing on a loaded run: $other")
    }
    assert(warn.startsWith("LOADED RUN: loadavg 5.67"))
    // the whole LINE must be ASCII: a consumer decoding stdout under a
    // non-UTF-8 charset must still hand its JSON parser valid bytes
    assert(line.forall(c => c >= 0x20 && c < 0x7f),
      s"non-ASCII or control char in: " +
        line.filterNot(c => c >= 0x20 && c < 0x7f).map(_.toInt).mkString(","))
  }

  test("idle line is ASCII-only too") {
    val line = Bench.compactLine(1.0, 1, 0, 0.1, 0.1,
      "{}", "{}", queries, "/tmp/bench.json", "/root/testdata/sf0.01")
    assert(line.forall(c => c >= 0x20 && c < 0x7f))
  }
}
