package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions
import graft.plans.DotProductExpr

/** The optimizer rule must turn the declarative aggregate/zip_with
  * dot-product idiom into DotProductExpr — same results, fused plan.
  */
class DotRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("declarative fold is rewritten to graft_dot in the optimized plan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("q_emb"))
    val scored = emb.crossJoin(broadcast(q))
      .select(VectorFunctions.dotFoldHof(col("embedding"), col("q_emb")).as("sim"))
    val optimized = scored.queryExecution.optimizedPlan
    val found = optimized.expressions.flatMap(_.collect {
      case d: DotProductExpr => d
    })
    assert(found.nonEmpty, s"expected DotProductExpr in:\n$optimized")
  }

  test("spark.graft.rewrite.dotProduct=false disables the rewrite") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("q_emb"))
    spark.conf.set(graft.plans.DotProductRewrite.ConfKey, "false")
    try {
      val scored = emb.crossJoin(broadcast(q))
        .select(VectorFunctions.dotFoldHof(col("embedding"), col("q_emb")).as("sim"))
      val found = scored.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case d: DotProductExpr => d
      })
      assert(found.isEmpty, "rewrite fired despite the conf gate")
    } finally spark.conf.unset(graft.plans.DotProductRewrite.ConfKey)
  }

  test("rewritten plan computes the same values") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("q_emb"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorFunctions.dotFoldHof(col("embedding"), col("q_emb")).as("hof"),
        VectorFunctions.dotFold(col("embedding"), col("q_emb")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(both.count() == 0)
  }
}
