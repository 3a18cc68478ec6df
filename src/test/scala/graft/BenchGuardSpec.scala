package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression guardrail's pure parts: baseline parsing (both
  * the committed round-file shape and a raw bench line) and the
  * regression rule. The wiring is exercised by every driver bench run. */
class BenchGuardSpec extends AnyFunSuite {

  private val committed =
    """{
      |  "n": 6, "rc": 0, "cpus": 32, "sf": 0.1,
      |  "tail": "noise\n{\"metric\":\"total\",\"value\":9.9,\"queries\":{\"q_a\":0.5,\"q_b\":2.0},\"sf\":\"/root/testdata/sf0.1\"}\n",
      |  "parsed": {"metric": "total", "value": 9.9,
      |    "queries":{"q_a":0.5,"q_b":2.0,"q_c":0.05},
      |    "errors": {}, "sf": "/root/testdata/sf0.1"}
      |}""".stripMargin

  test("parseBaselineQueries reads the structured copy, not the escaped tail") {
    // the tail's escaped copy lacks q_c — only the parsed object has it
    assert(Bench.parseBaselineQueries(committed) ===
      Map("q_a" -> 0.5, "q_b" -> 2.0, "q_c" -> 0.05))
  }

  test("parseBaselineQueries reads a raw bench output line too") {
    val raw = """{"metric":"total","value":1.0,"queries":{"x":0.25,"y":7.5E-2},"sf":"/d/sf0.01"}"""
    assert(Bench.parseBaselineQueries(raw) === Map("x" -> 0.25, "y" -> 0.075))
  }

  test("baselineSf handles the numeric and the path-valued forms") {
    assert(Bench.baselineSf(committed) === Some("0.1"))
    assert(Bench.baselineSf("""{"queries":{},"sf":"/root/testdata/sf0.01"}""") === Some("0.01"))
    assert(Bench.baselineSf("no sf here") === None)
  }

  test("stdout summary stays under the driver's tail window at the LIVE registry size") {
    // The driver captures only the last ~2000 chars of stdout and sbt's
    // trailing [success] line eats ~75 of them. Rounds 7 AND 8 lost the
    // headline number to this window; the summary must stay bounded no
    // matter how many queries the registry grows to. Worst-case render:
    // every live query key timed at 4 digits.
    val worst = SparkEntry.queries.keys.map(_ -> 9999.999).toMap
    val line = Bench.renderSummary(worst, Map.empty, "/root/testdata/sf0.1")
    assert(line.length < 1800, s"summary line ${line.length} chars:\n$line")
    // and it must carry the count, not a per-query map
    assert(line.contains(s""""queries":${SparkEntry.queries.size},"""))
  }

  test("summary keeps the documented key shape (consumer rejects extra keys)") {
    val line = Bench.renderSummary(Map("a" -> 1.0), Map("b" -> "boom"), "/d/sf0.01")
    assert(line ===
      """{"metric":"total","value":1.000,"unit":"sec","queries":1,"errors":{"b":"boom"},"sf":"/d/sf0.01"}""")
  }

  test("summary stays bounded even under a MASS-failure errors map") {
    // r7/r8 lost the headline to an overlong line; a run where dozens
    // of queries throw must not reopen that hole through the errors
    // map (full messages live in BENCH_DETAIL.json + stderr)
    val errors = (1 to 40).map(i => s"query_with_a_long_name_$i" -> ("x" * 200)).toMap
    val line = Bench.renderSummary(Map("a" -> 1.0), errors, "/root/testdata/sf0.1")
    assert(line.length < 1800, s"summary ${line.length} chars under mass failure")
    assert(line.contains("_truncated"))
    assert(line.contains("37 more"))
  }

  test("detail line round-trips through the baseline parser") {
    val detail = Bench.renderDetail(
      scala.collection.immutable.ListMap("q_a" -> 0.5, "q_b" -> 2.0), Map.empty, "/d/sf0.1")
    assert(Bench.parseBaselineQueries(detail) === Map("q_a" -> 0.5, "q_b" -> 2.0))
    assert(Bench.baselineSf(detail) === Some("0.1"))
  }

  test("regression rule: ratio AND absolute floor must both trip") {
    val prev = Map("big" -> 2.0, "small" -> 0.1, "grown" -> 1.0, "new" -> 1.0)
    val cur = Map(
      "big" -> 3.5,    // 1.75x and +1.5s -> regression
      "small" -> 0.25, // 2.5x but +0.15s < floor -> jitter, not flagged
      "grown" -> 1.4,  // +0.4s but 1.4x < ratio -> not flagged
      "added" -> 9.0)  // no baseline -> not flagged
    assert(Bench.regressions(prev, cur) === Map("big" -> (2.0, 3.5)))
  }

  test("withRetries: a synthetic slow first run does NOT flag after re-measure") {
    // the r10/r11 host-noise shape: 2.7s baseline, 9.7s one-off spike,
    // warm re-measure lands back at 2.8s -> min-of-runs clears the guard
    val prev = Map("cc" -> 2.72, "ok" -> 1.0)
    val cur = Map("cc" -> 9.66, "ok" -> 1.1)
    var calls = List.empty[String]
    val updated = Bench.withRetries(prev, cur, { n => calls :+= n; 2.8 })
    assert(calls === List("cc"), "only the flagged query is re-measured")
    assert(updated === Map("cc" -> 2.8, "ok" -> 1.1))
    assert(Bench.regressions(prev, updated) === Map.empty)
  }

  test("withRetries: a REAL regression survives all retries and still flags") {
    val prev = Map("slow" -> 1.0)
    val cur = Map("slow" -> 4.0)
    var calls = 0
    val updated = Bench.withRetries(prev, cur, { _ => calls += 1; 3.9 })
    assert(calls === 2, "bounded at maxRetries even when never clearing")
    assert(updated === Map("slow" -> 3.9))
    assert(Bench.regressions(prev, updated) === Map("slow" -> (1.0, 3.9)))
  }

  test("withRetries: stops retrying as soon as the guard clears, keeps the min") {
    val prev = Map("q" -> 2.0)
    val cur = Map("q" -> 7.0)
    val measurements = Iterator(2.5, 99.0) // second retry must never run
    var calls = 0
    val updated = Bench.withRetries(prev, cur, { _ => calls += 1; measurements.next() })
    assert(calls === 1)
    assert(updated("q") === 2.5)
  }

  test("withRetries: a retry SLOWER than the flagged run cannot worsen the report") {
    val prev = Map("q" -> 1.0)
    val cur = Map("q" -> 3.0)
    val updated = Bench.withRetries(prev, cur, _ => 8.0)
    assert(updated("q") === 3.0, "min-of-runs keeps the best observation")
  }

  test("sentinel: fixed work is deterministic, timing is positive") {
    val (t1, acc1) = Bench.sentinelWork(1000000L)
    val (t2, acc2) = Bench.sentinelWork(1000000L)
    assert(acc1 === acc2, "pinned-iteration checksum must be pure")
    assert(t1 > 0 && t2 > 0)
  }

  test("sentinel: detail line carries start/end + normalized map, raw parser unaffected") {
    val detail = Bench.renderDetail(
      scala.collection.immutable.ListMap("q_a" -> 1.0, "q_b" -> 3.0),
      Map.empty, "/d/sf0.1", sentinel = Some((0.4, 0.6)))
    // the raw queries map is still what the guardrail parser reads
    assert(Bench.parseBaselineQueries(detail) === Map("q_a" -> 1.0, "q_b" -> 3.0))
    assert(Bench.parseSentinel(detail) === Some(0.5))
    // normalized = raw / mean-sentinel -> sentinel units
    assert(detail.contains(""""queries_norm":{"q_a":2.000,"q_b":6.000}"""))
    // a pre-r15 baseline without the field parses to None (no scaling)
    assert(Bench.parseSentinel("""{"queries":{"a":1.0},"sf":"/d/sf0.1"}""") === None)
  }

  test("sentinel guardrail: a uniformly slower host does not flag, a code regression still does") {
    val prev = Map("q" -> 2.0, "hot" -> 1.0)
    // host is 1.5x slower now (sentinel 0.5 -> 0.75): q at 3.1s is the
    // same code at load, hot at 4.6s is a real code regression on top
    val cur = Map("q" -> 3.1, "hot" -> 4.6)
    val scaled = Bench.normalizeBaseline(prev, Some(0.5), Some(0.75))
    assert(scaled === Map("q" -> 3.0, "hot" -> 1.5))
    assert(Bench.regressions(scaled, cur) === Map("hot" -> (1.5, 4.6)))
    // without sentinel data the un-scaled compare would have cried
    // wolf on q too
    assert(Bench.regressions(prev, cur).keySet === Set("q", "hot"))
  }

  test("sentinel guardrail: scaling clamps at 2x so a real slowdown cannot hide behind load") {
    val prev = Map("q" -> 1.0)
    // host claims 5x slower; a 4x query slowdown must still flag
    val scaled = Bench.normalizeBaseline(prev, Some(0.2), Some(1.0))
    assert(scaled === Map("q" -> 2.0), "clamped to 2x, not 5x")
    assert(Bench.regressions(scaled, Map("q" -> 4.0)) === Map("q" -> (2.0, 4.0)))
    // and missing data on either side is a no-op
    assert(Bench.normalizeBaseline(prev, None, Some(1.0)) === prev)
    assert(Bench.normalizeBaseline(prev, Some(0.5), None) === prev)
  }

  test("iter sentinel: detail line carries sentinel_iter + the iter-row-only normalized map") {
    // one iterative row, one scan row: queries_norm keeps BOTH on the
    // CPU clock (pre-r20 continuity), queries_norm_iter carries ONLY
    // the iterative row on the driver-latency clock
    assert(Bench.iterRows("dedup_clusters_star") && !Bench.iterRows("q_tpch_pricing"))
    val detail = Bench.renderDetail(
      scala.collection.immutable.ListMap(
        "dedup_clusters_star" -> 3.0, "q_tpch_pricing" -> 1.0),
      Map.empty, "/d/sf0.1",
      sentinel = Some((0.4, 0.6)), sentinelIter = Some((1.5, 2.5)))
    assert(Bench.parseSentinel(detail) === Some(0.5),
      "the iter field must not shadow the CPU sentinel parser")
    // MIN of start/end, not the mean: the warm sample is the clock
    // the mid-suite iterative rows actually ran under
    assert(Bench.parseSentinelIter(detail) === Some(1.5))
    assert(detail.contains(
      """"queries_norm":{"dedup_clusters_star":6.000,"q_tpch_pricing":2.000}"""))
    assert(detail.contains(""""queries_norm_iter":{"dedup_clusters_star":2.000}"""))
    // a pre-r20 baseline parses to None (iter rows fall back to CPU scaling)
    assert(Bench.parseSentinelIter(
      """{"queries":{"a":1.0},"sentinel":{"start":0.4,"end":0.6},"sf":"/d/sf0.1"}""") === None)
  }

  test("iter sentinel guardrail: iter rows follow the driver-latency clock, scan rows the CPU clock") {
    val prev = Map("dedup_clusters_star" -> 2.0, "q_tpch_pricing" -> 2.0)
    // CPU clock flat (1.0x), driver latency 1.6x slower: the iterative
    // row gets 1.6x headroom (r19's same-code 1.4-1.7x movers were
    // exactly this axis), the scan row gets none
    val scaled = Bench.normalizeBaseline(prev,
      Some(0.5), Some(0.5), Some(1.0), Some(1.6))
    assert(scaled === Map("dedup_clusters_star" -> 3.2, "q_tpch_pricing" -> 2.0))
    // a pre-r20 baseline (no iter sentinel) scales iter rows by the
    // CPU clock — the pre-r20 behavior, bit-for-bit
    val fallback = Bench.normalizeBaseline(prev,
      Some(0.5), Some(0.75), None, Some(1.6))
    assert(fallback === Map("dedup_clusters_star" -> 3.0, "q_tpch_pricing" -> 3.0))
    // iter clamp: same 2x ceiling as the CPU clock
    val clamped = Bench.normalizeBaseline(Map("bpe_train" -> 1.0),
      Some(0.5), Some(0.5), Some(0.2), Some(1.0))
    assert(clamped === Map("bpe_train" -> 2.0))
  }
}
