package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LayoutQueries

/** Z-order clustering (q90): the layout claim, measured on real files —
  * a z-sorted layout bounds BOTH dimensions per file, so a slice
  * predicate on the non-leading dimension prunes most files, where a
  * single-column sort prunes none.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fileBoxes(path: String): Array[(Long, Long)] = {
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("y").as("y_min"), max("y").as("y_max"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
  }

  test("z-sorted files prune a day-slice scan; custkey-sorted files cannot") {
    val keyed = spark.read
      .parquet("/root/testdata/sf0.01/orders.parquet")
      .select(pmod(col("o_custkey"), lit(65536L)).as("x"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          .cast("long").as("y"))
      .withColumn("z", LayoutQueries.zInterleave16(col("x"), col("y")))
    val dir = Files.createTempDirectory("graft-zorder").toString
    keyed.repartitionByRange(16, col("z")).write.parquet(s"$dir/zsorted")
    keyed.repartitionByRange(16, col("x")).write.parquet(s"$dir/xsorted")

    // a ~200-day slice out of ~2400 days
    def intersecting(boxes: Array[(Long, Long)]): Int =
      boxes.count { case (lo, hi) => hi >= 600 && lo < 800 }

    val zHit = intersecting(fileBoxes(s"$dir/zsorted"))
    val xHit = intersecting(fileBoxes(s"$dir/xsorted"))
    assert(xHit >= 14, s"x-sorted layout should be unprunable on y: $xHit/16")
    assert(zHit * 2 <= xHit,
      s"z-order should bound y per file: z=$zHit vs x=$xHit of 16")
    // and the z layout still bounds x: no file spans the full key range
    val xBoxes = spark.read.parquet(s"$dir/zsorted")
      .groupBy(input_file_name())
      .agg((max("x") - min("x")).as("span")).collect().map(_.getLong(1))
    assert(xBoxes.exists(_ < 1500 / 2),
      "z-order should also constrain x for some files")
  }
}
