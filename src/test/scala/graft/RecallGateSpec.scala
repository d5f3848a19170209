package graft

import org.scalatest.funsuite.AnyFunSuite

/** The recall regression gate: a deliberate drift must fire, a clean
  * sweep must pass, and the committed baseline file must parse — the
  * three properties that make the bench's `recall_gate` field a real
  * driver-visible gate rather than decoration.
  */
class RecallGateSpec extends AnyFunSuite {

  private val baseline = Map(
    "q_ann_ivf" -> 0.925, "q_ann_pq" -> 0.8, "q_ann_lsh_mp" -> 0.70)

  test("deliberate drift fires: a >0.05 drop is a violation") {
    val v = RecallGate.violations(
      Map("q_ann_ivf" -> 0.80, "q_ann_pq" -> 0.8, "q_ann_lsh_mp" -> 0.70),
      baseline)
    assert(v === Map("q_ann_ivf" -> (0.925, 0.80)))
  }

  test("within tolerance / at / above baseline passes") {
    assert(RecallGate.violations(
      Map("q_ann_ivf" -> 0.90, "q_ann_pq" -> 0.85, "q_ann_lsh_mp" -> 0.70),
      baseline).isEmpty)
  }

  test("a broken sweep (-1) fails the gate; a skipped entry does not") {
    // thrown sweeps record -1: that is a violation, not a free pass
    val broken = RecallGate.violations(Map("q_ann_ivf" -> -1.0), baseline)
    assert(broken === Map("q_ann_ivf" -> (0.925, -1.0)))
    // an allowlisted partial run that never measured an entry doesn't gate
    assert(RecallGate.violations(Map.empty, baseline).isEmpty)
  }

  test("the committed RECALL_BASELINE.json parses and covers every sweep entry") {
    val b = RecallGate.loadBaseline("RECALL_BASELINE.json")
    val expected = Set("q_ann_lsh", "q_ann_lsh_mp", "q_ann_ivf", "q_ann_pq",
      "ivfpq_probe", "q_semantic_dedup_planted")
    assert(expected.subsetOf(b.keySet),
      s"baseline missing ${expected.diff(b.keySet)}")
    assert(b.values.forall(v => v > 0.0 && v <= 1.0))
  }

  test("a missing baseline file reads empty (fresh clone never fails)") {
    assert(RecallGate.loadBaseline("/nonexistent/RECALL_BASELINE.json").isEmpty)
  }

  test("renderJson is well-formed for ok and fail") {
    val ok = RecallGate.renderJson(Map.empty, 6, 6)
    assert(ok.contains("\"status\":\"ok\"") && ok.contains("\"violations\":{}"))
    val fail = RecallGate.renderJson(Map("q_ann_ivf" -> (0.925, 0.8)), 6, 6)
    assert(fail.contains("\"status\":\"fail\""))
    assert(fail.contains("\"q_ann_ivf\":{\"baseline\":0.925,\"current\":0.8}"))
  }
}
