package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.FreqSketch

/** Misra–Gries heavy hitters: the frequency guarantee (single-stream
  * and under merges) and the sketch-then-verify exactness q74 rests
  * on, end to end through the aggregate expression with real partial
  * aggregation (multiple input partitions → sketch merges).
  */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish stream: token i appears ~n/(i+1) times, shuffled. */
  private def zipfStream(n: Int, seed: Long): Seq[String] = {
    val items = (0 until 40).flatMap(i => Seq.fill(n / (i + 1))(s"tok$i"))
    new Random(seed).shuffle(items)
  }

  test("single-stream guarantee: freq > N/(m+1) items always survive") {
    val stream = zipfStream(500, seed = 1)
    val m = 8
    val sketch = new FreqSketch(m)
    stream.foreach(sketch.add)
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val threshold = stream.size.toDouble / (m + 1)
    exact.foreach { case (tok, c) =>
      if (c > threshold)
        assert(sketch.counts.contains(tok), s"$tok freq=$c > $threshold missing")
    }
    // and estimates undercount by at most the threshold
    sketch.counts.foreach { case (tok, est) =>
      assert(est <= exact(tok) && est >= exact(tok) - threshold - 1)
    }
  }

  test("merge preserves the guarantee across arbitrary splits") {
    val stream = zipfStream(600, seed = 2)
    val m = 8
    val merged = stream.grouped(97).map { chunk =>
      val s = new FreqSketch(m); chunk.foreach(s.add); s
    }.reduce(_ merge _)
    assert(merged.counts.size <= m)
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val threshold = stream.size.toDouble / (m + 1)
    exact.foreach { case (tok, c) =>
      if (c > threshold) assert(merged.counts.contains(tok))
    }
  }

  test("sketch-then-verify top-k is exact through the SQL aggregate") {
    import spark.implicits._
    val stream = zipfStream(400, seed = 3)
    // several partitions → map-side sketches really merge at the final
    val toks = stream.toDF("tok").repartition(7)
    val cands = toks
      .agg(call_function("graft_heavy_hitters", col("tok"), lit(16)).as("sk"))
      .select(explode(col("sk")).as("c")).select(col("c.token").as("tok"))
    val got = toks.join(broadcast(cands), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(5)
    assert(got == want)
  }

  test("null inputs are ignored and capacity bounds the output") {
    import spark.implicits._
    val df = (Seq.fill(50)(Some("a")) ++ Seq.fill(20)(Some("b")) ++
      Seq.fill(5)(Option.empty[String]) ++ Seq.fill(3)(Some("c")))
      .toDF("tok").repartition(3)
    val out = df
      .agg(call_function("graft_heavy_hitters", col("tok"), lit(2)).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.token"), col("c.est"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.length <= 2)
    assert(out.map(_._1).contains("a")) // 50 > 78/3: must survive
  }
}
