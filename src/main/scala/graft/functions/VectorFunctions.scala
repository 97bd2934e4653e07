package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives over `ArrayType(FloatType)` embedding
  * columns (similarity search, near-dup, hyperplane LSH bucketing).
  *
  * Dot products use the codegen'd [[graft.plans.DotProductExpr]]
  * (registered as `graft_dot` by GraftExtensions): a fused
  * multiply-add loop inside whole-stage codegen, numerically identical
  * to the strict left fold `aggregate(zip_with(...))` the DuckDB
  * oracle mirrors (`list_reduce(list_prepend(0.0, ...))`) — same
  * element order, same double accumulator, bit-identical results. The
  * test embeddings are unit-normalized (verified: |v|=1 ± 2e-7), so
  * dot ≡ cosine.
  */
object VectorFunctions {

  /** Codegen'd dot product in doubles, index order. Null if either
    * side is null; assumes non-null elements.
    */
  def dotFold(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The declarative HOF fold (interpreted; kept as the reference
    * semantics dotFold must match — exercised in tests).
    */
  def dotFoldHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, x) => acc + x)

  /** L2 norm (for inputs that are not pre-normalized). */
  def l2Norm(a: Column): Column = sqrt(dotFold(a, a))

  /** Cosine similarity; assumes non-zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / (l2Norm(a) * l2Norm(b))

  /** 60-bit md5 hash computed driver-side — the exact value
    * TextFunctions.md5Long60 yields in an executor and the oracle's
    * `('0x' || substr(md5(x), 1, 15))::UBIGINT` yields in DuckDB.
    */
  def md5Long60Local(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane p, dimension i → ((md5Long60("p_i") mod 2001) - 1000)/1000.
    * Derived entirely from md5 so the oracle computes the identical
    * planes — no shipped constants.
    */
  def planeComponentLocal(p: Int, i: Int): Double =
    ((md5Long60Local(s"${p}_$i") % 2001L) - 1000L).toDouble / 1000.0d

  /** Random-hyperplane LSH signature: bit p of the result is 1 iff
    * dot(v, plane_p) > 0. With `planes` bits this buckets vectors into
    * 2^planes cells; cosine-similar vectors land in the same cell with
    * probability 1 - theta/pi per bit. Used as the IVF-style coarse
    * quantizer for ANN at scale: the probe only scans the query's cell.
    *
    * The plane vectors are materialized driver-side (they are pure
    * md5-derived constants) and ship as array literals — the executor
    * does `planes` codegen'd dot products per row instead of
    * re-deriving `planes × dim` md5 hashes per row, which is what made
    * the naive expression ~50× slower. `dim` is the embedding
    * dimensionality (64 in the test tables).
    */
  def hyperplaneSignature(v: Column, planes: Int, dim: Int = 64): Column =
    (0 until planes).map { p =>
      val plane = typedlit((0 until dim).map(i => planeComponentLocal(p, i)))
      when(dotFold(v, plane) > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Driver-side twin of [[hyperplaneSignature]] for probe vectors:
    * the query's cell is a pure function of md5-derived constants, so
    * computing it locally lets a search plan filter on the cell column
    * (partition-prunable when the table is laid out by cell).
    */
  def hyperplaneSignatureLocal(v: Array[Float], planes: Int): Long =
    (0 until planes).map { p =>
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * planeComponentLocal(p, i); i += 1 }
      if (acc > 0) 1L << p else 0L
    }.sum

  /** Multi-probe cell sequence for a query vector (driver-side, pure).
    *
    * The query's own cell first, then neighbor cells in order of how
    * cheaply they can be reached: flipping a signature bit whose
    * hyperplane margin |dot(q, plane_p)| is small barely moves the
    * boundary, so those cells are the likeliest homes of true
    * neighbors the quantizer split away (standard multi-probe LSH).
    * Returns the `probes` best cells, ranked by the summed |margin| of
    * flipped planes (ties by mask for determinism).
    *
    * This is the engine's analog of the reference's
    * `SET ivfflat.probes = N` (rag.py:179-180; API.md:239-243): one
    * knob trading recall for scan cost, and because cells are a layout
    * key, each probed cell is still a pruned partition read — never a
    * corpus scan.
    *
    * For wide signatures the subset enumeration is capped to the 12
    * lowest-|margin| planes (4096 candidate masks ≥ any sane probe
    * count); flipping a high-margin plane is never competitive.
    */
  def multiProbeCellsLocal(v: Array[Float], planes: Int, probes: Int): Seq[Long] = {
    require(probes >= 1, "probes must be >= 1")
    val margins = (0 until planes).map { p =>
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * planeComponentLocal(p, i); i += 1 }
      acc
    }
    val qCell = (0 until planes).map(p => if (margins(p) > 0) 1L << p else 0L).sum
    val flippable = margins.zipWithIndex.sortBy { case (m, p) => (math.abs(m), p) }
      .map(_._2).take(math.min(planes, 12))
    val masks = (0 until (1 << flippable.length)).map { bits =>
      var mask = 0L
      var cost = 0.0
      var j = 0
      while (j < flippable.length) {
        if ((bits >> j & 1) == 1) {
          mask |= 1L << flippable(j)
          cost += math.abs(margins(flippable(j)))
        }
        j += 1
      }
      (cost, mask)
    }
    masks.sortBy { case (cost, mask) => (cost, mask) }
      .take(math.min(probes, masks.length))
      .map { case (_, mask) => qCell ^ mask }
  }
}
