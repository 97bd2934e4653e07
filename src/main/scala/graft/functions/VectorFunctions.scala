package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives over `ArrayType(FloatType)` embedding
  * columns (similarity search, near-dup, hyperplane LSH bucketing).
  *
  * Dot products are strict left folds in array-index order
  * (`aggregate(zip_with(...))`), so the oracle can replicate the exact
  * IEEE result with `list_reduce(list_prepend(0.0, list_transform(
  * list_zip(a, b), ...)))` — bit-identical doubles, safe to
  * hash-compare. The test embeddings are unit-normalized (verified:
  * |v|=1 ± 2e-7), so dot ≡ cosine.
  *
  * Scale path: the HOF fold is columnar but not whole-stage-codegen
  * fused; `graft.plans.DotProduct` (custom Catalyst expression with
  * doGenCode) is the drop-in for the 100 TB hot path where oracle
  * parity is not needed.
  */
object VectorFunctions {

  /** Strict left-fold dot product of two float-array columns, in
    * doubles. Null if either side is null.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, x) => acc + x)

  /** L2 norm (for inputs that are not pre-normalized). */
  def l2Norm(a: Column): Column = sqrt(dotFold(a, a))

  /** Cosine similarity; assumes non-zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane p, dimension i → ((md5Long60("p_i") mod 2001) - 1000)/1000.
    * Derived entirely from md5 so the oracle computes the identical
    * planes — no shipped constants.
    */
  def planeComponent(p: Int, i: Column): Column =
    ((pmod(TextFunctions.md5Long60(concat(lit(p.toString), lit("_"), i.cast("string"))),
      lit(2001L)) - 1000L).cast("double")) / 1000.0d

  /** Random-hyperplane LSH signature: bit p of the result is 1 iff
    * dot(v, plane_p) > 0. With `planes` bits this buckets vectors into
    * 2^planes cells; cosine-similar vectors land in the same cell with
    * probability 1 - theta/pi per bit. Used as the IVF-style coarse
    * quantizer for ANN at scale: the probe only scans the query's cell.
    */
  def hyperplaneSignature(v: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
}
