package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The driver bench contract: sbt "runMain graft.Bench" must end with ONE
  * JSON line `{"metric":..., "value":N, "unit":"sec", "queries":{"name":
  * sec,...}, "sf":...}` that survives a ~2k-char tail capture and a
  * per-line json.loads. Every BENCH_r01..r17.json came back
  * `parsed: null` — the line was either truncated, "[info] "-prefixed
  * (fixed in build.sbt via outputStrategy := StdoutOutput), or carried
  * nested {wall,cpu,norm} objects where the contract says plain seconds.
  * This spec feeds the rendered line through a real JSON parser the way
  * the driver would. */
class BenchContractSpec extends AnyFunSuite {

  private def worstCaseLine: String =
    Bench.renderCompact(
      total = 9999.999, totalCpu = 99999.999, nRerun = 999, nQueries = 999,
      drift = 99.99,
      headlineWalls = Bench.headline.map(_ -> 999.999),
      sfDir = "/root/testdata/sf0.1")

  test("compact line is valid JSON with flat numeric queries and numeric sf") {
    val line = worstCaseLine
    val j = JsonMethods.parse(line)
    assert((j \ "metric") === JString("total"))
    assert((j \ "unit") === JString("sec"))
    assert((j \ "value").isInstanceOf[JDouble] ||
      (j \ "value").isInstanceOf[JDecimal])
    (j \ "sf") match {
      case JDouble(v)  => assert(v === 0.1)
      case JDecimal(v) => assert(v === BigDecimal("0.1"))
      case other       => fail(s"sf must be numeric, got $other")
    }
    val JObject(fields) = (j \ "queries"): @unchecked
    assert(fields.size === Bench.headline.size)
    fields.foreach { case (name, v) =>
      assert(v.isInstanceOf[JDouble] || v.isInstanceOf[JDecimal] ||
        v.isInstanceOf[JInt] || v.isInstanceOf[JLong],
        s"queries.$name must be a plain number, got $v")
    }
  }

  test("every headline name is a declared query (never remove or rename)") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names missing from queries: $missing")
  }

  test("worst-case line fits the driver's 2000-char tail capture with slack") {
    // after the line the capture must still hold "\n[success] Total time:
    // ... completed <date>" (~80 chars); leave real headroom for a stray
    // late log line too
    assert(worstCaseLine.length <= 1800,
      s"compact line too long for the 2k tail capture: ${worstCaseLine.length}")
  }

  test("line survives a simulated 2000-char tail capture per-line parse") {
    val line = worstCaseLine
    val noise = (1 to 40).map(i =>
      s"26/08/18 03:00:$i INFO BlockManagerMaster: Registering BlockManager " +
        s"BlockManagerId(driver, localhost, 4053$i, None)").mkString("\n")
    val capture = (noise + "\n" + line +
      "\n[success] Total time: 1151 s (19:11), completed Aug 18, 2026")
      .takeRight(2000)
    val parsed = capture.split("\n").flatMap { l =>
      try Some(JsonMethods.parse(l)) catch { case _: Throwable => None }
    }
    assert(parsed.length === 1, "exactly one tail line must parse as JSON")
    assert((parsed.head \ "metric") === JString("total"))
  }
}
