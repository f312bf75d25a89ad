package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench sidecar's self-adjudicating gate fields (VERDICT
  * r16 #2): a drift above the alert factor must be labeled loudly in
  * the emitted JSON itself, so a raw-gate breach on a half-speed
  * container (the r16 driver leg: raw 2.94×, drift 2.215, normalized
  * 1.33×) reads as weather at emission time — and a calm leg must NOT
  * carry the alert, so the flag stays meaningful. */
class BenchSpec extends AnyFunSuite
    with org.scalactic.TripleEquals with org.scalactic.Tolerance {

  private def parse(fragment: String): Map[String, String] = {
    // the fragment is a comma-led run of "key":value pairs — split on
    // top-level `,"` boundaries (values contain no nested objects)
    fragment.stripPrefix(",").split(""",(?=")""").map { kv =>
      val i = kv.indexOf(':')
      kv.take(i).stripPrefix("\"").stripSuffix("\"") -> kv.drop(i + 1)
    }.toMap
  }

  test("a loaded container (drift > 1.5) emits drift_alert and a weather-pointing verdict") {
    // the r16 driver leg's shape: raw 125.95 over drift 2.215
    val json = Bench.gateVerdictJson(125.95, Some((2.215, 12, 1.1363, 4.9264)))
    val f = parse(json)
    assert(f("drift_alert") == "true")
    assert(f("raw_gate_ratio").toDouble === 125.95 / 42.9 +- 0.001)
    assert(f("norm_gate_ratio").toDouble === 125.95 / 2.215 / 42.9 +- 0.001)
    val verdict = f("bench_verdict")
    assert(verdict.contains("DRIFT ALERT"))
    assert(verdict.contains("2.94x") && verdict.contains("drift 2.215"))
    assert(verdict.contains("normalized 1.33x"))
    assert(verdict.contains("spread [1.14,4.93]"))
  }

  test("a calm leg does not alert; ratios still present; not partial") {
    // the r16d-2 best leg's shape: raw 53.61 over drift 0.924
    val f = parse(Bench.gateVerdictJson(53.61, Some((0.924, 12, 0.82, 1.00))))
    assert(f("drift_alert") == "false")
    assert(f("gate_partial") == "false")
    assert(!f("bench_verdict").contains("DRIFT ALERT"))
    assert(f("raw_gate_ratio").toDouble === 1.25 +- 0.005)
    assert(f("norm_gate_ratio").toDouble === 53.61 / 0.924 / 42.9 +- 0.001)
  }

  test("alert threshold is exclusive and SYMMETRIC: slow AND fast containers alert") {
    assert(parse(Bench.gateVerdictJson(60.0, Some((1.5, 12, 1.4, 1.6))))("drift_alert") == "false")
    assert(parse(Bench.gateVerdictJson(60.0, Some((1.501, 12, 1.4, 1.6))))("drift_alert") == "true")
    // a 2x-FAST container can hide a real code regression behind a
    // passing raw gate — the mirror image of the r16 weather breach
    assert(parse(Bench.gateVerdictJson(60.0, Some((0.667, 12, 0.6, 0.7))))("drift_alert") == "false")
    assert(parse(Bench.gateVerdictJson(60.0, Some((0.5, 12, 0.45, 0.55))))("drift_alert") == "true")
  }

  test("a partial battery is marked: failed queries or a dev subset never read as a gate pass") {
    val f = parse(Bench.gateVerdictJson(30.0, Some((1.0, 12, 0.9, 1.1))))
    assert(f("gate_partial") == "false")
    val fFail = parse(Bench.gateVerdictJson(30.0, Some((1.0, 12, 0.9, 1.1)), nFailed = 3))
    assert(fFail("gate_partial") == "true")
    assert(fFail("bench_verdict").contains("PARTIAL RUN (3 failed)"))
    assert(fFail("bench_verdict").contains("not a gate reading"))
    val fSub = parse(Bench.gateVerdictJson(30.0, None, subset = true))
    assert(fSub("gate_partial") == "true")
    assert(fSub("bench_verdict").contains("PARTIAL RUN (query subset)"))
  }

  test("anchors unavailable: raw-only fields, no spurious alert, verdict says so") {
    val f = parse(Bench.gateVerdictJson(60.0, None))
    assert(f("drift_alert") == "false")
    assert(!f.contains("norm_gate_ratio"))
    assert(f("bench_verdict").contains("anchors unavailable"))
    assert(f("raw_gate_ratio").toDouble === 60.0 / 42.9 +- 0.001)
  }

  // --- query_excursions (VERDICT r17 #3): single-query stall labels ---

  test("a stall is flagged with its drift-adjusted ratio; in-band queries are not") {
    // r17 leg 9's shape: board drift 0.993, p7_null_fill at 0.539s vs
    // its ~0.053s reference (10x class) while siblings sit in-band
    val refs = Map("p7_null_fill" -> 0.0525, "a10_pivot" -> 0.40, "x32_pagerank" -> 3.9)
    val timed = Map("p7_null_fill" -> 0.539, "a10_pivot" -> 0.43, "x32_pagerank" -> 4.2)
    val f = parse(Bench.excursionsJson(timed, refs, 0.993))
    assert(f("n_excursions") == "1")
    assert(f("query_excursions").contains("\"p7_null_fill\":10.3"))
    assert(!f("query_excursions").contains("a10_pivot") &&
      !f("query_excursions").contains("x32_pagerank"))
  }

  test("the absolute floor suppresses tiny-query noise even past the 3x factor") {
    // 20ms query reading 70ms is 3.5x but only 50ms of excess: noise
    val f = parse(Bench.excursionsJson(Map("q" -> 0.070), Map("q" -> 0.020), 1.0))
    assert(f("n_excursions") == "0" && f("query_excursions") == "{}")
    // same ratio at stall magnitude (0.5s excess) IS flagged
    val g = parse(Bench.excursionsJson(Map("q" -> 0.70), Map("q" -> 0.20), 1.0))
    assert(g("n_excursions") == "1")
  }

  test("excursion factor is exclusive and drift-adjusted: a loaded board absorbs raw elevation") {
    // raw 3.2x but board drift 1.2 => adjusted 2.67: the container is
    // slow, not the query — no flag
    assert(parse(Bench.excursionsJson(Map("q" -> 3.2), Map("q" -> 1.0), 1.2))("n_excursions") == "0")
    // exactly 3.0 adjusted does NOT flag (exclusive, like the gate)
    assert(parse(Bench.excursionsJson(Map("q" -> 3.0), Map("q" -> 1.0), 1.0))("n_excursions") == "0")
    assert(parse(Bench.excursionsJson(Map("q" -> 3.01), Map("q" -> 1.0), 1.0))("n_excursions") == "1")
  }

  test("missing refs / missing query / bad drift degrade to no field or no flag, never a crash") {
    // no reference data at all: the FIELD is absent (not evaluated)
    assert(Bench.excursionsJson(Map("q" -> 9.9), Map.empty, 1.0) == "")
    assert(Bench.excursionsJson(Map("q" -> 9.9), Map("q" -> 1.0), 0.0) == "")
    // a query without a reference is skipped, siblings still evaluated
    val f = parse(Bench.excursionsJson(
      Map("new_query" -> 9.9, "q" -> 9.9), Map("q" -> 1.0), 1.0))
    assert(f("n_excursions") == "1" && !f("query_excursions").contains("new_query"))
    // a zero/negative committed reference can never divide or flag
    assert(parse(Bench.excursionsJson(Map("q" -> 9.9), Map("q" -> 0.0), 1.0))("n_excursions") == "0")
  }

  test("a pathological leg lists only the worst offenders; the true count and cap are explicit") {
    // 12 queries all past the rule (a container pathology, not a
    // stall): the compact totals line must stay bounded, so only the
    // 8 worst ratios are listed — with the TRUE count and an explicit
    // truncation flag (no silent caps)
    val refs = (1 to 12).map(i => s"q$i" -> 1.0).toMap
    val timed = (1 to 12).map(i => s"q$i" -> (3.0 + i)).toMap // ratios 4..15
    val f = parse(Bench.excursionsJson(timed, refs, 1.0))
    assert(f("n_excursions") == "12")
    assert(f("excursions_truncated") == "true")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{\"x\":1" + Bench.excursionsJson(timed, refs, 1.0) + "}")
    val listed = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.get("query_excursions").fieldNames()).asScala.toSet
    assert(listed.size == 8)
    // the worst 8 by ratio are q5..q12 (ratios 8..15)
    assert(listed == (5 to 12).map(i => s"q$i").toSet)
    // an unflagged-cap leg carries no truncation field at all
    val g = Bench.excursionsJson(Map("q" -> 9.9), Map("q" -> 1.0), 1.0)
    assert(!g.contains("excursions_truncated"))
  }

  test("excursions fragment is valid JSON when wrapped; names sorted for diffability") {
    val frag = Bench.excursionsJson(
      Map("z_q" -> 9.0, "a_q" -> 9.0), Map("z_q" -> 1.0, "a_q" -> 1.0), 1.0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{\"value\":1" + frag + "}")
    assert(node.get("n_excursions").asInt() == 2)
    val names = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.get("query_excursions").fieldNames()).asScala.toSeq
    assert(names == Seq("a_q", "z_q"))
    assert(node.get("query_excursions").get("a_q").asDouble() === 9.0 +- 0.001)
  }

  test("the fragment is valid JSON when wrapped (escaping holds)") {
    val line = "{\"value\":125.95" +
      Bench.gateVerdictJson(125.95, Some((2.215, 12, 1.1363, 4.9264))) + "}"
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("drift_alert").asBoolean())
    assert(node.get("bench_verdict").asText().nonEmpty)
    assert(node.get("raw_gate_ratio").asDouble() > 2.9)
  }
}
