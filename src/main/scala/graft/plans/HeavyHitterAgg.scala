package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items state: at most `capacity` counters.
  *
  * Guarantee (single stream AND after arbitrary merges — Agarwal et
  * al., "Mergeable Summaries", PODS'12): every item with true
  * frequency > N/(capacity+1) holds a counter, and each estimate
  * undercounts by at most N/(capacity+1). That makes the sketch a
  * guaranteed SUPERSET generator for heavy hitters: follow it with an
  * exact count of just the candidates and the top-k is exact — two
  * scans, and only `capacity` rows per partition ever cross the
  * shuffle in the first one (vs every distinct token for a naive
  * groupBy count at 100 TB).
  */
final class FreqSketch(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < capacity => counts.update(item, 1L)
      case None =>
        // decrement-all: pairs one "charge" against every live counter;
        // amortized O(1) because each decrement cancels an increment
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  /** MG merge: sum counters, then if over capacity subtract the
    * (capacity+1)-th largest count from all and drop non-positives —
    * the error bounds of both inputs add, preserving the guarantee.
    */
  def merge(other: FreqSketch): FreqSketch = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
    this
  }
}

/** `graft_heavy_hitters(item, capacity)`: aggregate a string column
  * into at most `capacity` (token, est) candidates, est ≥ true count −
  * N/(capacity+1). Partial aggregation applies (TypedImperativeAggregate
  * serializes the sketch between map-side and final), so the shuffle
  * carries one sketch per partition, not the token stream.
  */
case class HeavyHitterAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitterAgg =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if capacity > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("capacity must be > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a string column, got $other")
  }

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(capacity)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch =
    buffer.merge(other)

  override def eval(buffer: FreqSketch): Any = {
    // deterministic order: est desc, token asc (ties at any cut line
    // resolve identically on every run and every partitioning)
    val rows = buffer.counts.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), c): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: FreqSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new FreqSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      sketch.counts.update(
        new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitterAgg =
    copy(inputAggBufferOffset = newOffset)
}
