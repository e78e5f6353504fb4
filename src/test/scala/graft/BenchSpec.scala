package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's calm-reference eligibility rule — pure string-level
  * logic, testable without a session. */
class BenchSpec extends AnyFunSuite {

  private val base =
    """{"metric":"total","value":10.0,"unit":"sec","queries":{"q1_agg":0.2}"""

  test("records with errors or a failed floor gate are never references") {
    assert(Bench.calmEligible(base + ""","errors":{},"remeasured":{}}"""))
    assert(!Bench.calmEligible(base + ""","errors":{"q":"boom"},"remeasured":{}}"""))
    assert(!Bench.calmEligible(
      base + ""","errors":{},"remeasured":{},"floor_gate":{"applies":true,"passed":false}}"""))
    assert(Bench.calmEligible(
      base + ""","errors":{},"remeasured":{},"floor_gate":{"applies":true,"passed":true}}"""))
  }

  test("confirmed remeasures keep a record eligible; shrunken ones disqualify it") {
    // CONFIRMED: the remeasure reproduced the recorded sample (within
    // 80%) — the query's genuine cost moved past a dead-epoch ref, and
    // the record must be allowed to REFRESH that ref (the r12
    // stale-ref ratchet fix)
    val confirmed = base +
      ""","errors":{},"remeasured":{"events_rfm":{"recorded":0.82,"calm_ref":0.20,"value":0.81}}}"""
    assert(Bench.calmEligible(confirmed))
    // SHRANK: the remeasure came back well under the recorded sample —
    // the window was genuinely noisy, so the record stays out
    val shrank = base +
      ""","errors":{},"remeasured":{"ta_tfidf":{"recorded":8.1,"calm_ref":1.0,"value":1.1}}}"""
    assert(!Bench.calmEligible(shrank))
    // mixed: one shrunken entry poisons the record
    val mixed = base + ""","errors":{},"remeasured":{""" +
      """"events_rfm":{"recorded":0.82,"calm_ref":0.20,"value":0.81},""" +
      """"ta_tfidf":{"recorded":8.1,"calm_ref":1.0,"value":1.1}}}"""
    assert(!Bench.calmEligible(mixed))
  }

  test("records predating the errors/remeasured fields stay eligible") {
    assert(Bench.calmEligible(base + "}"))
  }
}
