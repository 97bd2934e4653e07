package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's cross-record noise check: the prior-record parsers
  * must read the committed BENCH_FULL format exactly — a silent empty
  * parse would disable the >2.5× re-probe without any visible failure
  * (the check degrades to "no priors, nothing suspect").
  */
class BenchSpec extends AnyFunSuite {

  /** The committed record, resolved by walking up from the working
    * directory to the repo root (build.sbt marker) — not a bare
    * CWD-relative path, so the suite doesn't silently depend on sbt
    * running from the repo root. The record's EXISTENCE is asserted by
    * the format test below (a missing/renamed record must FAIL, not
    * cancel — an absent record silently disables the cross-record
    * re-probe, the exact failure mode this spec exists to prevent);
    * only the repo-root marker itself being absent (not a checkout)
    * cancels.
    */
  private def committedRecord: Option[java.nio.file.Path] = {
    var d = java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    Option(d).map(_.resolve("BENCH_FULL.json"))
  }

  test("priorMins parses the committed record format") {
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":7.5,"unit":"sec","queries":{"q1":0.25,""" +
        """"q2_topk":1.5E-2,"api_get_case":0.031},"sf":"/x",""" +
        """"spread":{"q1":[0.25,0.3]},"loadavg":[1.0,2.0],""" +
        """"wide_spread_entries":0,"tainted":false,""" +
        """"calibration":0.42,"load_factor":1.3}""" + "\n")
    val m = Bench.priorMins(f.toString)
    assert(m == Map("q1" -> 0.25, "q2_topk" -> 0.015, "api_get_case" -> 0.031))
    assert(Bench.priorCalibration(f.toString).contains(0.42))
  }

  test("priorMins + priorCalibration parse the CURRENT committed BENCH_FULL.json") {
    // the real gate: if the record format drifts, this fails here, not
    // silently at the next driver bench. Magnitude bounds are sanity
    // only (values positive, under an hour) — a slower machine's
    // legitimate record must not fail the suite.
    committedRecord match {
      case Some(p) =>
        assert(java.nio.file.Files.exists(p),
          s"committed bench record missing at $p — the cross-record " +
            "re-probe would silently degrade to 'no priors'")
        val m = Bench.priorMins(p.toString)
        assert(m.size > 150, s"expected a full record, parsed ${m.size} entries")
        assert(m.values.forall(v => v > 0 && v < 3600))
        // r9+ records must carry the calibration stamp
        val c = Bench.priorCalibration(p.toString)
        assert(c.exists(v => v > 0 && v < 3600),
          "committed record lacks a calibration stamp")
      case None => cancel("no repo root (build.sbt) above the working directory")
    }
  }

  test("prior parsers are empty (not a crash) on a missing or malformed file") {
    assert(Bench.priorMins("/nonexistent/x.json").isEmpty)
    assert(Bench.priorCalibration("/nonexistent/x.json").isEmpty)
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(f, "not json at all")
    assert(Bench.priorMins(f.toString).isEmpty)
    assert(Bench.priorCalibration(f.toString).isEmpty)
  }

  test("calibration spin runs and lands in a sane range") {
    // Deliberately NO stability assertion: this host has documented
    // 3-4× invisible neighbor-load swings, so asserting two runs agree
    // would reproduce the exact flakiness the calibration exists to
    // divide out. The range pin catches a broken spin (0s = dead code
    // elimination; minutes = a runaway loop); stability is the
    // record's job (load_factor is clamped to [0.5, 10] in Bench).
    // SMALL iteration count (ADVICE r9): the full 150M-per-thread spin
    // is a multi-second 32-core burst that perturbs concurrent
    // timing-sensitive tests — the unit test pins the MECHANISM, the
    // bench main keeps the full spin.
    val a = Bench.calibrationSecs(iters = 5000000)
    assert(a > 0.0005 && a < 60.0, s"calibration out of range: $a")
  }

  test("priorCalibration anchors on the LAST stamp; priorCores gates the " +
    "load factor across hardware changes") {
    // a query key containing the substring "calibration" must not
    // mis-parse as the record's top-level stamp (ADVICE r9)
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":1.0,"unit":"sec",""" +
        """"queries":{"q_recalibration_audit":0.25,"q2":0.5},"sf":"/x",""" +
        """"spread":{"q_recalibration_audit":[0.25,0.3]},""" +
        """"tainted":false,"calibration":0.42,"load_factor":1.0,"cores":32}""" + "\n")
    assert(Bench.priorCalibration(f.toString).contains(0.42))
    assert(Bench.priorCores(f.toString).contains(32))
    // records before r10 carry no cores stamp → None (factor stays
    // calibration-based, the pre-fingerprint behavior)
    val g = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(g,
      """{"queries":{"q1":0.1},"calibration":0.5,"load_factor":1.0}""")
    assert(Bench.priorCores(g.toString).isEmpty)
  }
}
