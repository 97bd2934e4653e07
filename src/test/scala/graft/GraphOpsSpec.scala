package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Connected components on hand-built graphs: paths (worst case for
  * plain label propagation — exercises the pointer compression),
  * cycles, stars, singletons, and a disconnected mix.
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponents(
      nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph collapses to its min vertex") {
    val got = cc(1L to 12L, (1L to 11L).map(i => (i, i + 1)))
    assert(got == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("disconnected mix: cycle, star, pair, singletons") {
    val edges = Seq(
      (2L, 4L), (4L, 6L), (6L, 2L), // cycle {2,4,6}
      (10L, 11L), (10L, 12L), (10L, 13L), // star {10..13}
      (20L, 21L)) // pair
    val nodes = Seq(1L, 2L, 4L, 6L, 10L, 11L, 12L, 13L, 20L, 21L, 30L)
    val got = cc(nodes, edges)
    assert(got(1L) == 1L && got(30L) == 30L, "singletons keep their id")
    assert(Seq(2L, 4L, 6L).forall(got(_) == 2L))
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
  }

  test("empty graph yields an empty result") {
    assert(cc(Seq.empty, Seq.empty).isEmpty)
  }

  test("edge orientation does not matter") {
    val a = cc(1L to 5L, Seq((5L, 4L), (3L, 4L), (1L, 2L), (2L, 3L)))
    assert(a.values.forall(_ == 1L))
  }
}
