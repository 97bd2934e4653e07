package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Codegen'd MinHash signature: k minima of (h*a_i + b_i) mod P over a
  * pre-hashed shingle array, in ONE pass.
  *
  * Value-identical to the declarative form the DuckDB oracle mirrors
  * (`array((0 until k).map(i => array_min(transform(base, h =>
  * pmod(h*seedA(i)+seedB(i), P))))`) — same seeds (TextFunctions
  * .seedA/seedB), same modulus, same overflow-free range (inputs are
  * reduced mod P = 2^31-1 and seeds < 2^31, so products stay < 2^62).
  * The HOF form allocates k lambda frames per element interpreted;
  * this is a fused k×|s| long-arithmetic loop inside whole-stage
  * codegen. Assumes non-null, non-negative elements (baseHashes
  * guarantees both).
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  // containsNull: an empty input yields k null minima (mirroring
  // array_min-of-empty in the declarative form)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint>, got $other")
  }

  private def seedsA: Array[Long] = Array.tabulate(k)(TextFunctions.seedA)
  private def seedsB: Array[Long] = Array.tabulate(k)(TextFunctions.seedB)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sa = seedsA; val sb = seedsB
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * sa(i) + sb(i)) % TextFunctions.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    // empty input: array_min of empty yields null; mirror with nulls
    if (n == 0) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saRef = ctx.addReferenceObj("seedsA", seedsA, "long[]")
    val sbRef = ctx.addReferenceObj("seedsB", seedsB, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val boxed = ctx.freshName("boxed")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($h * $saRef[$i] + $sbRef[$i]) % ${TextFunctions.P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |if ($n == 0) {
         |  Object[] $boxed = new Object[$k];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Codegen'd 32-bit SimHash over a pre-hashed token array: bit b set
  * iff Σ_tokens (±1 per bit b of h) > 0 — one pass instead of 32
  * interpreted aggregate folds. Value-identical to
  * TextFunctions.simHashFromHashes (and the oracle's CASE/list_sum
  * form); duplicates count with multiplicity.
  */
case class SimHash32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](32)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 32) {
        sums(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $sums = new long[32];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $b = 0; $b < 32; $b++) {
         |    $sums[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($sums[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32Expr =
    copy(child = newChild)
}
