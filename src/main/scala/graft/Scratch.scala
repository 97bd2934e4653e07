package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.Tables

/** Dev-only stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = 16; val bands = 8; val r = 2
    val t = Tables(spark, dir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  -> $x"); x
    }
    val postings = t.documents
      .select(col("doc_id"), explode(wordShingles(col("text"), 2)).as("g"))
      .withColumn("h", pmod(md5Long60(col("g")), lit(P)))
      .persist()
    time("postings rows")(postings.count())
    val minCols = (0 until k).map(i =>
      min(pmod(col("h") * seedA(i) + seedB(i), lit(P))).as(s"_m$i"))
    val sigs = postings.groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), minCols: _*).persist()
    time("sigs")(sigs.count())
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until r).map(j =>
            col(s"_m${b * r + j}").cast("string")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key")).persist()
    time("banded rows")(banded.count())
    val joined = banded.select(col("doc_id").as("a_id"), col("band"), col("key"))
      .join(banded.select(col("doc_id").as("b_id"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
    time("band-join pairs")(joined.count())
    val cand = joined.select("a_id", "b_id").distinct().persist()
    time("distinct cand")(cand.count())
    val verify = cand.join(postings.select(col("doc_id").as("a_id"), col("g")), Seq("a_id"))
      .join(postings.select(col("doc_id").as("b_id"), col("g")), Seq("b_id", "g"))
    time("verify matched rows")(verify.count())
    spark.stop()
  }
}
