package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.operators.{SamplingQueries, TextQueries}
import graft.functions.TextFunctions

/** Properties for the round-6 text/sampling operators, each pinned
  * against a brute-force Scala re-derivation on random inputs:
  *
  *  - q105's run-length folds over a sorted gram array must equal
  *    orthodox gram counting (the oracle checks this on the corpus;
  *    the property checks it on adversarial token streams — heavy
  *    repetition, single tokens, empty docs);
  *  - q107's surprisal is a true conditional (non-negative, zero for
  *    a deterministic continuation);
  *  - q104's priority sample is exactly the brute-force bottom-k and
  *    invariant to partitioning.
  */
object TextProperties extends Properties("TextOps") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  // small vocab with repeats — the interesting regime for repetition
  // metrics; lengths 0..2 exercise the shorter-than-n guards
  private val tokenGen: Gen[Seq[String]] = for {
    n <- Gen.frequency((1, Gen.choose(0, 2)), (5, Gen.choose(3, 40)))
    toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff"))
  } yield toks

  private def grams(toks: Seq[String], n: Int): Seq[String] =
    if (toks.size < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq

  /** Brute force: chars in the most common n-gram (count·len). */
  private def refTop(toks: Seq[String], n: Int): Long = {
    val gs = grams(toks, n)
    if (gs.isEmpty) 0L
    else gs.groupBy(identity).map { case (g, o) => o.size.toLong * g.length }.max
  }

  /** Brute force: chars across duplicated n-grams (count ≥ 2). */
  private def refDup(toks: Seq[String], n: Int): Long =
    grams(toks, n).groupBy(identity).collect {
      case (g, o) if o.size >= 2 => o.size.toLong * g.length
    }.sum

  property("q105 folds equal orthodox gram counting") = forAll(
    Gen.listOfN(5, tokenGen)) { docs =>
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tk")
    val got = df.select(col("id"),
      TextQueries.topGramChars(TextQueries.sortedGrams(col("tk"), 2)).as("t2"),
      TextQueries.dupGramChars(TextQueries.sortedGrams(col("tk"), 3)).as("d3"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.zipWithIndex.forall { case (toks, i) =>
      got(i.toLong) == (refTop(toks, 2), refDup(toks, 3))
    }
  }

  property("q105 empty/short docs fold to zero") = {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("only")),
      (3L, Seq("x", "y"))).toDF("id", "tk")
    val got = df.select(col("id"),
      TextQueries.topGramChars(TextQueries.sortedGrams(col("tk"), 2)).as("t2"),
      TextQueries.dupGramChars(TextQueries.sortedGrams(col("tk"), 3)).as("d3"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got(1L) == (0L, 0L) && got(2L) == (0L, 0L) &&
      got(3L) == (("x y".length.toLong), 0L)
  }

  property("q104 equals brute-force bottom-k, any partitioning") = forAll(
    Gen.listOfN(30, Gen.choose(1L, 500L)), Gen.choose(1, 8)) { (weights, parts) =>
    import spark.implicits._
    val rows = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = rows.toDF("doc_id", "w").repartition(parts)
    val k = 10
    val got = df
      .withColumn("u", TextFunctions.md5Long60(col("doc_id").cast("string")))
      .withColumn("r", expr("u div w"))
      .orderBy(col("r"), col("doc_id")).limit(k)
      .select("doc_id").as[Long].collect().toSeq
    // brute force with the same hash, same rank, same tie-break
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = rows.map { case (id, w) => (h(id.toString) / w, id) }
      .sorted.take(k).map(_._2)
    got == want
  }

  property("q107 surprisal is non-negative; deterministic continuation scores zero") = {
    import spark.implicits._
    // corpus where "p q" is the ONLY continuation of p → surp(p q)=0,
    // while "p" never... plus a mixed-prefix corpus for positivity
    val docs = Seq(
      (1L, "p q p q p q"), // only continuation of p is q
      (2L, "m n m o m n")) // continuations of m: n (2), o (1)
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("tk"))
    val bg = toks.select(col("doc_id"), explode(
      transform(sequence(lit(0), size(col("tk")) - 2),
        i => concat_ws(" ", element_at(col("tk"), i + 1),
          element_at(col("tk"), i + 2)))).as("bg"))
    val bgc = bg.groupBy("bg").agg(count(lit(1)).as("c"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val pfx = bgc.groupBy("w1").agg(sum("c").as("pc"))
    val surp = bgc.join(pfx, Seq("w1"))
      .select(col("bg"),
        (length(bin(col("pc"))) - length(bin(col("c")))).cast("long").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "p q" is p's only continuation → prefix count == bigram count →
    // surp exactly 0; "m o" (1 of m's 3) must out-surprise "m n" (2 of 3)
    surp.values.forall(_ >= 0L) &&
      surp("p q") == 0L &&
      surp("m o") > surp("m n")
  }
}
