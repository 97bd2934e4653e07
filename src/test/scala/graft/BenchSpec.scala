package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's cross-record noise check: the prior-record parser
  * must read the committed BENCH_FULL format exactly — a silent empty
  * parse would disable the >2.5× re-probe without any visible failure
  * (the check degrades to "no priors, nothing suspect").
  */
class BenchSpec extends AnyFunSuite {
  test("priorMins parses the committed record format") {
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":7.5,"unit":"sec","queries":{"q1":0.25,""" +
        """"q2_topk":1.5E-2,"api_get_case":0.031},"sf":"/x",""" +
        """"spread":{"q1":[0.25,0.3]},"loadavg":[1.0,2.0],""" +
        """"wide_spread_entries":0,"tainted":false}""" + "\n")
    val m = Bench.priorMins(f.toString)
    assert(m == Map("q1" -> 0.25, "q2_topk" -> 0.015, "api_get_case" -> 0.031))
  }

  test("priorMins parses the CURRENT committed BENCH_FULL.json") {
    // the real gate: if the record format drifts, this fails here, not
    // silently at the next driver bench
    val m = Bench.priorMins("BENCH_FULL.json")
    assert(m.size > 150, s"expected a full record, parsed ${m.size} entries")
    assert(m.values.forall(v => v > 0 && v < 600))
  }

  test("priorMins is empty (not a crash) on a missing or malformed file") {
    assert(Bench.priorMins("/nonexistent/x.json").isEmpty)
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(f, "not json at all")
    assert(Bench.priorMins(f.toString).isEmpty)
  }
}
