package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions, installed
  * via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (GraftSession sets it). Functions registered here are callable from
  * both the Column API (`call_function("graft_dot", ...)`) and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(_ => TopKRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes two array columns")
        DotProductExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_minhash(hashes, k) takes a hash array and a literal k")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
        }
        MinHashSigExpr(children(0), k)
      }))
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "graft_word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_word_shingles(text, w)")
        WordShinglesExpr(children(0), intLit(children(1), "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_shingles"),
      new ExpressionInfo(classOf[CharShinglesExpr].getName, "graft_char_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_char_shingles(text, n)")
        CharShinglesExpr(children(0), intLit(children(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_shingle_hashes(text, w)")
        ShingleHashesExpr(children(0), intLit(children(1), "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokensExpr].getName, "graft_tokens"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_tokens(text, minLen)")
        TokensExpr(children(0), intLit(children(1), "minLen"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "graft_lang_id"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_lang_id(text)")
        LangIdExpr(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quality_score"),
      new ExpressionInfo(classOf[QualityScoreExpr].getName,
        "graft_quality_score"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_quality_score(text)")
        QualityScoreExpr(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_inter_count"),
      new ExpressionInfo(classOf[SortedInterCountExpr].getName,
        "graft_sorted_inter_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_sorted_inter_count(sortedA, sortedB)")
        SortedInterCountExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_pairs"),
      new ExpressionInfo(classOf[SortedPairsExpr].getName, "graft_sorted_pairs"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_sorted_pairs(array<bigint>)")
        SortedPairsExpr(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cooc_pairs"),
      new ExpressionInfo(classOf[CoocPairsExpr].getName, "graft_cooc_pairs"),
      (children: Seq[Expression]) => {
        require(children.length == 5,
          "graft_cooc_pairs(text, win, minLen, canonical, dropSelf)")
        def boolLit(e: Expression, what: String): Boolean = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"$what must be a boolean literal, got $other")
        }
        CoocPairsExpr(children(0), intLit(children(1), "win"),
          intLit(children(2), "minLen"),
          boolLit(children(3), "canonical"), boolLit(children(4), "dropSelf"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_grams"),
      new ExpressionInfo(classOf[WordGramsExpr].getName, "graft_word_grams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_word_grams(text, n)")
        WordGramsExpr(children(0), intLit(children(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_60"),
      new ExpressionInfo(classOf[Md5Long60Expr].getName, "graft_md5_60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_md5_60(text)")
        Md5Long60Expr(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_posgrams"),
      new ExpressionInfo(classOf[PosGramHashesExpr].getName, "graft_posgrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_posgrams(text, n)")
        PosGramHashesExpr(children(0), intLit(children(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitterAgg].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_heavy_hitters(item, capacity) takes a string column and a literal capacity")
        HeavyHitterAgg(children(0), intLit(children(1), "capacity"))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32Expr].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash(hashes) takes one hash-array column")
        SimHash32Expr(children(0))
      }))
  }
}
