package graft

import org.scalatest.funsuite.AnyFunSuite

/** The perf regression gate: a real slowdown must fire, environmental
  * breathing room must not, a broken entry must not double-report, and
  * the baseline file handling must distinguish absent (vacuous) from
  * corrupt (fail) — plus the recall ratchet's stamp logic, which shares
  * the same loader.
  */
class PerfGateSpec extends AnyFunSuite {

  private val baseline = Map("q_big" -> 4.0, "q_small" -> 0.2)

  test("a deliberate slowdown past the band fires") {
    // band(4.0) = 4.0*1.6 + 0.5 = 6.9
    val v = PerfGate.violations(Map("q_big" -> 8.0), baseline)
    assert(v === Map("q_big" -> (4.0, 8.0)))
  }

  test("environmental breathing room inside the band passes") {
    assert(PerfGate.violations(Map("q_big" -> 6.8), baseline).isEmpty)
    // the absolute floor keeps sub-second entries from firing on a GC
    // pause: band(0.2) = 0.82
    assert(PerfGate.violations(Map("q_small" -> 0.8), baseline).isEmpty)
    assert(PerfGate.violations(Map("q_small" -> 0.9), baseline).nonEmpty)
  }

  test("broken (-1) and missing entries do not gate here") {
    assert(PerfGate.violations(Map("q_big" -> -1.0), baseline).isEmpty,
      "broken entries are the bench's `broken` count's job")
    assert(PerfGate.violations(Map.empty, baseline).isEmpty,
      "an allowlisted partial run must not gate unmeasured entries")
    assert(PerfGate.violations(Map("q_new" -> 99.0), baseline).isEmpty,
      "an entry new this round has no baseline yet")
  }

  test("renderJson: ok / fail / baseline-error statuses") {
    assert(PerfGate.renderJson(Map.empty, 2, 2).contains("\"status\":\"ok\""))
    assert(PerfGate.renderJson(Map("q" -> (1.0, 9.0)), 2, 2)
      .contains("\"status\":\"fail\""))
    val e = PerfGate.renderJson(Map.empty, 0, 2, Some("corrupt \"x\""))
    assert(e.contains("\"status\":\"fail\"") && e.contains("corrupt \\\"x\\\""))
  }

  test("the committed PERF_BASELINE.json parses and covers the bench surface") {
    val b = RecallGate.loadBaselineChecked("PERF_BASELINE.json")
    assert(b.isRight && b.exists(_.size > 150),
      s"committed perf baseline must parse with the full entry map: $b")
    assert(b.exists(_.get("q_dedup_best").contains(3.95)),
      "the r16 adjudicated re-pin must be in the committed baseline")
  }

  test("baseline loader: absent is vacuous, corrupt fails, strings never parse as entries") {
    assert(RecallGate.loadBaselineChecked("does_not_exist.json") ===
      Right(Map.empty))
    val dir = java.nio.file.Files.createTempDirectory("graft-gate")
    dir.toFile.deleteOnExit()
    val corrupt = dir.resolve("corrupt.json")
    java.nio.file.Files.write(corrupt, "{ not json at all".getBytes("UTF-8"))
    assert(RecallGate.loadBaselineChecked(corrupt.toString).isLeft,
      "present-but-unparsable must FAIL the gate, not silently disable it")
    // a number-looking fragment inside a string value must not become a
    // baseline entry (the _comment-leak class)
    val tricky = dir.resolve("tricky.json")
    java.nio.file.Files.write(tricky,
      """{
        |  "_comment": "flags any \"q_fake\": 0.99 style fragment",
        |  "_budget": "planes=4",
        |  "q_real": 0.5
        |}""".stripMargin.getBytes("UTF-8"))
    assert(RecallGate.loadBaselineChecked(tricky.toString) ===
      Right(Map("q_real" -> 0.5)))
  }

  test("renderJson reflects the band actually gated against, not the defaults") {
    val tuned = PerfGate.renderJson(Map.empty, 2, 2, None,
      factor = 2.5, absSec = 1.0)
    assert(tuned.contains("\"factor\":2.5") && tuned.contains("\"abs_sec\":1.0"),
      s"a tuned band must appear in the committed record: $tuned")
    val dflt = PerfGate.renderJson(Map.empty, 2, 2)
    assert(dflt.contains(s""""factor":${PerfGate.DefaultFactor}"""))
  }

  test("era ratchet: a slower write era fails as 'baseline stale', a faster one and an unstamped baseline do not") {
    // the x2.0 factor sits above the io sentinel's measured intra-era
    // breathing (0.81-1.63s warm samples, all adjudicated clean in
    // BENCH_ISOLATED_r16) while a genuine era shift still crosses it
    val stale = PerfGate.eraError(Some(0.4), 0.9)
    assert(stale.exists(_.contains("baseline stale")),
      s"io 0.9 vs stamped 0.4 (2.25x) must read stale: $stale")
    // inside the factor: breathing room (the observed ~2x weather
    // band), not drift
    assert(PerfGate.eraError(Some(0.4), 0.75).isEmpty)
    // FASTER era: band only loosens — never fails (regenerate-on-
    // adoption re-tightens it)
    assert(PerfGate.eraError(Some(0.4), 0.1).isEmpty)
    // pre-stamp baseline or broken sentinel: no era check
    assert(PerfGate.eraError(None, 0.9).isEmpty)
    assert(PerfGate.eraError(Some(0.4), -1.0).isEmpty)
  }

  test("era stamp: written as a string, read back, never parsed as a gated entry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-era")
    dir.toFile.deleteOnExit()
    val p = dir.resolve("PERF_BASELINE.json")
    java.nio.file.Files.write(p,
      """{
        |  "_comment": "era-stamped",
        |  "_io_era": "0.4231",
        |  "q_real": 1.5
        |}""".stripMargin.getBytes("UTF-8"))
    assert(PerfGate.readIoEra(p.toString) === Right(Some(0.4231)))
    // the numeric loader must skip the string-valued stamp
    assert(RecallGate.loadBaselineChecked(p.toString) ===
      Right(Map("q_real" -> 1.5)))
    // absent file / absent stamp: no era check, not an error
    assert(PerfGate.readIoEra("does_not_exist.json") === Right(None))
    // a PRESENT-but-broken stamp must FAIL the gate, not silently skip
    // the era check (the corrupt-baseline discipline)
    val broken = dir.resolve("broken.json")
    java.nio.file.Files.write(broken,
      """{ "_io_era": "0..95", "q_real": 1.5 }""".getBytes("UTF-8"))
    assert(PerfGate.readIoEra(broken.toString).isLeft)
  }

  test("recall ratchet: stamp round-trips; a budget retune reads as stale") {
    val stamp = RecallGate.budgetStamp(4, 4, 7, 16, 5)
    assert(stamp === "planes=4;lshT=4;lshMpT=7;nlist=16;nprobe=5")
    assert(RecallGate.readStamp("RECALL_BASELINE.json").contains(stamp),
      "the committed recall baseline must carry the live budget stamp")
    // a retuned budget produces a different stamp — the bench-side
    // comparison (fileStamp != liveStamp) is then stale by construction
    assert(RecallGate.budgetStamp(4, 4, 7, 16, 6) !== stamp)
  }
}
