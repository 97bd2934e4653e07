package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency pins for the driver contract (SparkEntry).
  * The driver's correctness gate is only as strong as the registry:
  * a query without an oracle silently downgrades to a rows-only
  * check, an oracle without a query is dead weight that LOOKS like
  * coverage, and a name unusable as a directory breaks the Verify
  * dump for that entry without failing the run.
  */
class SparkEntrySpec extends AnyFunSuite {
  test("queries and oracleSql cover the same names, 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle (rows-only gate!): ${(q -- o).toList.sorted}")
    assert((o -- q).isEmpty,
      s"oracles without a query: ${(o -- q).toList.sorted}")
  }

  test("every entry name is a safe path segment") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe entry names: $bad")
  }

  test("flagship entry returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
