package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.TemporalQueries

/** Random-data pins for the generic statistical operators factored out
  * of q169/q176/q177: each distributed result must equal a driver-side
  * sequential reference on arbitrary inputs (not just the corpus), and
  * the estimators must satisfy their defining invariances — the
  * properties that made them worth implementing (Theil–Sen ignores a
  * level shift; CUSUM's statistic is translation-invariant; KM's curve
  * is a monotone non-increasing product).
  */
object StatProperties extends Properties("StatOps") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  // --- Kaplan–Meier ---------------------------------------------------

  private val kmGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    subs <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 12L)
      churn <- Gen.oneOf(0L, 1L)
    } yield (t, churn))
  } yield subs

  private def kmSequential(subs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Long)] = {
    val ladder = subs.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.length.toLong)
    }.sortBy(_._1)
    var atRisk = ladder.map(_._3).sum
    var s = 1000000L
    ladder.map { case (t, d, n) =>
      val row = { s = s * (atRisk - d) / atRisk; (t, atRisk, d, n - d, s) }
      atRisk -= n
      row
    }
  }

  property("kaplanMeier equals the sequential recurrence") =
    forAll(kmGen) { subs =>
      import spark.implicits._
      val got = TemporalQueries
        .kaplanMeier(subs.toDF("t", "churn"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      got == kmSequential(subs)
    }

  property("kaplanMeier survival is monotone non-increasing in [0, 1e6]") =
    forAll(kmGen) { subs =>
      val s = kmSequential(subs).map(_._5)
      s == s.sorted.reverse && s.forall(x => x >= 0L && x <= 1000000L)
    }

  // --- Theil–Sen ------------------------------------------------------

  private val seriesGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 20)
    is <- Gen.pick(n, 0L until 40L)
    ys <- Gen.listOfN(n, Gen.choose(0L, 1000L))
  } yield is.toSeq.sorted.zip(ys)

  private def theilSenSequential(pts: Seq[(Long, Long)]): Long = {
    val slopes = (for {
      a <- pts.indices; b <- (a + 1) until pts.length
    } yield 1000L * (pts(b)._2 - pts(a)._2) / (pts(b)._1 - pts(a)._1))
      .sorted
    slopes((slopes.length + 1) / 2 - 1)
  }

  property("theilSen equals the sequential pairwise median") =
    forAll(seriesGen) { pts =>
      import spark.implicits._
      val df = pts.map { case (i, y) => ("k", i, y) }.toDF("key", "i", "y")
      val (trend, nPairsGot) = TemporalQueries.theilSen(df).collect()
        .map(r => (r.getLong(1), r.getLong(2))).head
      val nPairs = pts.length.toLong * (pts.length - 1) / 2
      nPairsGot == nPairs && trend == theilSenSequential(pts)
    }

  property("theilSen is invariant under a level shift") =
    forAll(seriesGen, Gen.choose(-500L, 500L)) { (pts, c) =>
      theilSenSequential(pts) ==
        theilSenSequential(pts.map { case (i, y) => (i, y + c) })
    }

  // --- CUSUM ----------------------------------------------------------

  private def cusumSequential(pts: Seq[(Long, Long)]): (Long, Long) = {
    val n = pts.length.toLong
    val total = pts.map(_._2).sum
    var acc = 0L
    val cs = pts.map { case (i, y) => acc += n * y - total; (i, acc) }
    val (cp, peak) = cs.minBy { case (i, c) => (-math.abs(c), i) }
    (cp, math.abs(peak))
  }

  property("cusum equals the sequential argmax") =
    forAll(seriesGen) { pts =>
      import spark.implicits._
      val df = pts.map { case (i, y) => ("k", i, y) }.toDF("key", "i", "y")
      val got = TemporalQueries.cusum(df).collect()
        .map(r => (r.getLong(3), r.getLong(4))).head
      got == cusumSequential(pts)
    }

  property("cusum statistic is invariant under a level shift") =
    forAll(seriesGen, Gen.choose(-500L, 500L)) { (pts, c) =>
      // dev = n·y − Σy absorbs any constant added to every y
      cusumSequential(pts) ==
        cusumSequential(pts.map { case (i, y) => (i, y + c) })
    }

  // --- r8 de-globalization equivalences -------------------------------

  /** The q190/q157 histogram-median fold, verbatim: exact lower median
    * from a sorted (value, count) array in one aggregate expression.
    */
  property("histogram-median fold == lower median of the expanded multiset") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 40L))) { vals =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val got = vals.toDF("v").groupBy("v").agg(count(lit(1)).as("c"))
        .agg(sort_array(collect_list(struct(col("v"), col("c")))).as("hv"))
        .withColumn("tgt",
          expr("(aggregate(hv, 0L, (a, x) -> a + x.c) + 1) div 2"))
        .select(expr(
          "aggregate(hv, named_struct('cum', 0L, 'm', -1L), (acc, x) -> " +
            "IF(acc.m >= 0L, acc, named_struct('cum', acc.cum + x.c, " +
            "'m', IF(acc.cum + x.c >= tgt, x.v, -1L))), " +
            "acc -> acc.m)").as("m"))
        .collect()(0).getLong(0)
      got == vals.sorted.apply((vals.size + 1) / 2 - 1)
    }

  /** ScanOps.runningSums (q200's engine): the range-partitioned
    * two-phase scan must equal the sequential prefix sums over the
    * same total order on arbitrary inputs — including the partition-
    * boundary stitching, which 32 shuffle partitions over ~100-row
    * inputs exercises hard (most partitions hold 0-5 rows).
    */
  property("distributed runningSums == sequential prefix sums") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))) { vs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = graft.operators.ScanOps.runningSums(
          rows.toDF("id", "v"),
          Seq(col("v").desc, col("id").asc),
          Seq((lit(1L), "rn"), (col("v"), "cum")))
        .select("id", "rn", "cum")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._2)
      val want = rows.sortBy { case (id, v) => (-v, id) }
        .scanLeft((0L, 0L, 0L)) { case ((_, rn, cum), (id, v)) =>
          (id, rn + 1, cum + v)
        }.tail
      got.toSeq == want.map { case (id, rn, cum) => (id, rn, cum) }
    }

  /** Grouped form (q195's engine): per-group running sums must equal
    * per-group sequential prefix sums — groups deliberately FEW and
    * LARGE relative to the 32 range partitions, so most groups span
    * many partitions and the per-(group, pid) stitching is exercised.
    */
  property("grouped runningSums == per-group sequential prefix sums") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 2L),
        Gen.chooseNum(-50L, 50L)))) { gvs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val rows = gvs.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      val got = graft.operators.ScanOps.runningSums(
          rows.toDF("g", "id", "v"), Seq("g"),
          Seq(col("v").desc, col("id").asc),
          Seq((lit(1L), "rn"), (col("v"), "cum")))
        .select("g", "id", "rn", "cum")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
        xs.sortBy { case (_, id, v) => (-v, id) }
          .scanLeft((0L, 0L, 0L)) { case ((_, rn, cum), (_, id, v)) =>
            (id, rn + 1, cum + v)
          }.tail.map { case (id, rn, cum) => (g, id) -> (rn, cum) }
      }
      got == want
    }

  /** ScanOps.lagged (q156's engine): the boundary-handoff lag must
    * equal `lag(v) over (partition by g order by ...)` on arbitrary
    * inputs — groups FEW and LARGE vs the 32 range partitions so the
    * cell-tail carry (the new stitch) is what's actually exercised,
    * including group-first nulls and cells of size 1.
    */
  property("distributed lagged == per-group sequential lag") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 2L),
        Gen.chooseNum(-50L, 50L)))) { gvs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val rows = gvs.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      val got = graft.operators.ScanOps.lagged(
          rows.toDF("g", "id", "v"), Seq("g"),
          Seq(col("v").desc, col("id").asc),
          Seq((col("v"), "prev_v"), (col("id"), "prev_id")))
        .select("g", "id", "prev_v", "prev_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)),
           if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
        val sorted = xs.sortBy { case (_, id, v) => (-v, id) }
        sorted.zip(None +: sorted.map(Some(_))).map {
          case ((_, id, _), prev) =>
            (g, id) -> (prev.map(_._3), prev.map(_._2))
        }
      }
      got == want
    }

  /** Ungrouped lagged: one global total order — the carry frame is
    * plain |partitions| rows under an empty-partition window (bounded,
    * like runningSums' ungrouped offset cumsum).
    */
  property("ungrouped lagged == sequential lag over the total order") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))) { vs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = graft.operators.ScanOps.lagged(
          rows.toDF("id", "v"), Nil,
          Seq(col("v").asc, col("id").asc), Seq((col("v"), "prev_v")))
        .select("id", "prev_v")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val sorted = rows.sortBy { case (id, v) => (v, id) }
      val want = sorted.zip(None +: sorted.map(Some(_))).map {
        case ((id, _), prev) => id -> prev.map(_._2)
      }.toMap
      got == want
    }

  /** NULL group keys are REAL groups (r9 review finding): the windows
    * the scan/lag replace treat a NULL PARTITION BY key as its own
    * partition, so the stitch joins must be null-safe — a plain
    * equi-join silently drops every NULL-keyed row. Pins both
    * primitives against per-group sequential references where one
    * "group" is null.
    */
  property("scan and lag keep NULL group keys (window PARTITION BY semantics)") =
    forAll(Gen.nonEmptyListOf(Gen.zip(
        Gen.oneOf[String]("a", "b", null), Gen.chooseNum(-9L, 9L)))) { gvs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val rows = gvs.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      val df = rows.toDF("g", "id", "v")
      val gotScan = graft.operators.ScanOps.runningSums(
          df, Seq("g"), Seq(col("id").asc), Seq((col("v"), "cum")))
        .select("g", "id", "cum").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(2))
        .toMap
      val gotLag = graft.operators.ScanOps.lagged(
          df, Seq("g"), Seq(col("id").asc), Seq((col("v"), "pv")))
        .select("g", "id", "pv").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      val byG = rows.groupBy(r => Option(r._1))
      val wantScan = byG.flatMap { case (g, xs) =>
        xs.sortBy(_._2).scanLeft((0L, 0L)) { case ((_, c), (_, id, v)) =>
          (id, c + v)
        }.tail.map { case (id, c) => (g, id) -> c }
      }
      val wantLag = byG.flatMap { case (g, xs) =>
        val s = xs.sortBy(_._2)
        s.zip(None +: s.map(Some(_))).map { case ((_, id, _), prev) =>
          (g, id) -> prev.map(_._3)
        }
      }
      gotScan == wantScan && gotLag == wantLag
    }

  /** q133's ntile-as-arithmetic (the scan rewrite): the closed-form
    * bucket from (rn, n) must equal Spark's ntile(8) window on
    * arbitrary inputs — including n < 8, where the ELSE divisor is 0
    * but unreachable.
    */
  property("ntile formula on (rn, n) == ntile(8) window") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 99L))) { vs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val w = Window.orderBy(col("v"), col("id"))
      val got = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("want", ntile(8).over(w).cast("long"))
        .withColumn("gotb", expr(graft.operators.ProfileQueries.ntileExpr(8)))
        .filter(col("gotb") =!= col("want"))
        .count()
      got == 0L
    }

  /** The q173 two-level rank: per-value base off the value histogram
    * plus a within-value rank must equal the global (value, id) rank.
    */
  property("two-level rank == global (value, id) rank") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 25L))) { lens =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rows = lens.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("id", "v")
      val base = df.groupBy("v").agg(count(lit(1)).as("bc"))
        .withColumn("base", sum("bc").over(
          Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)) - col("bc"))
        .select("v", "base")
      val got = df
        .withColumn("rin", row_number().over(
          Window.partitionBy("v").orderBy("id")).cast("long"))
        .join(broadcast(base), Seq("v"))
        .select(col("id"), (col("base") + col("rin")).as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.sortBy(x => (x._2, x._1)).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      got == want
    }
}
