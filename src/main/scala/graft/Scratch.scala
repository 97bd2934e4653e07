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
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); x
    }
    val docs = t.documents.select(col("doc_id"), wordShingles(col("text"), 2).as("s"))
    time("shingles+count")(docs.count())
    val sig = docs.withColumn("base", baseHashes(col("s")))
      .select(col("doc_id"), minHashFromBase(col("base"), k).as("sig"))
    time("signatures")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(col("sig"), b, r).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    time("banded")(banded.count())
    val joined = banded.select(col("doc_id").as("a_id"), col("band"), col("key"))
      .join(banded.select(col("doc_id").as("b_id"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
    time("band-join pairs")(joined.count())
    val cand = joined.select("a_id", "b_id").distinct()
    time("distinct cand")(cand.count())
    val postings = docs.select(col("doc_id"), size(col("s")).as("n_sh"),
      explode(col("s")).as("g"))
    time("postings")(postings.count())
    val exA = postings.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"), col("g"))
    val exB = postings.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"), col("g"))
    val verified = cand.join(exA, Seq("a_id")).join(exB, Seq("b_id", "g"))
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("n_inter"))
    time("verify join+agg")(verified.count())
    spark.stop()
  }
}
