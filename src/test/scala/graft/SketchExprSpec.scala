package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions, VectorFunctions}

/** Custom codegen'd expressions must be value-identical to the
  * declarative HOF forms the DuckDB oracle mirrors — these specs pin
  * that equivalence (and therefore oracle parity) over real corpus
  * data.
  */
class SketchExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("graft_minhash == declarative minhash over the corpus") {
    val base = docs
      .select(col("doc_id"), TextFunctions.wordShingles(col("text"), 2).as("s"))
      .withColumn("base", TextFunctions.baseHashes(col("s")))
    val diff = base
      .withColumn("fast", TextFunctions.minHashFromBase(col("base"), 16))
      .withColumn("slow", TextFunctions.minHashFromBaseHof(col("base"), 16))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("graft_simhash == declarative simhash over the corpus") {
    val hashed = docs
      .select(col("doc_id"),
        TextFunctions.tokenHashes(TextFunctions.tokens(col("text"))).as("th"))
    val diff = hashed
      .withColumn("fast", TextFunctions.simHashFromHashes(col("th")))
      .withColumn("slow", TextFunctions.simHashFromHashesHof(col("th")))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("graft_dot == declarative fold over the embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
    val q = emb.filter(col("vec_id") === 1)
      .select(col("embedding").as("q_emb"))
    val diff = emb.crossJoin(broadcast(q))
      .withColumn("fast", VectorFunctions.dotFold(col("embedding"), col("q_emb")))
      .withColumn("slow", VectorFunctions.dotFoldHof(col("embedding"), col("q_emb")))
      // exact bitwise equality: same fold order, same accumulator type
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("native shingle expressions == declarative forms over the corpus") {
    val diff = docs
      .withColumn("wf", TextFunctions.wordShingles(col("text"), 2))
      .withColumn("ws", TextFunctions.wordShinglesHof(col("text"), 2))
      .withColumn("cf", TextFunctions.charShingles(col("text"), 3))
      .withColumn("cs", TextFunctions.charShinglesHof(col("text"), 3))
      .filter(col("wf") =!= col("ws") || col("cf") =!= col("cs"))
    assert(diff.count() == 0)
  }

  test("native shingle expressions: edge cases match declarative forms") {
    import spark.implicits._
    val edge = Seq("", "a", "ab", "one", "one two", "  padded  ", "a\tb\nc")
      .toDF("text")
    val diff = edge
      .withColumn("wf", TextFunctions.wordShingles(col("text"), 2))
      .withColumn("ws", TextFunctions.wordShinglesHof(col("text"), 2))
      .withColumn("cf", TextFunctions.charShingles(col("text"), 3))
      .withColumn("cs", TextFunctions.charShinglesHof(col("text"), 3))
      .filter(col("wf") =!= col("ws") || col("cf") =!= col("cs"))
    assert(diff.count() == 0)
  }

  test("graft_posgrams == declarative positional-gram md5 hashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus + edge shapes: short of n, exactly n, whitespace runs
    val texts = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("text"))
      .unionByName(Seq("", "a", "a b c", "one two three four",
        "  padded   runs\tof \n ws  ", "x y x y x y x y x y")
        .toDF("text"))
    for (n <- Seq(2, 4, 8)) {
      val declarative = expr(
        s"""transform(sequence(0, size(ts) - $n),
           |  i -> cast(conv(substring(md5(array_join(slice(ts, i + 1, $n), ' ')),
           |    1, 15), 16, 10) as long))""".stripMargin)
      val diff = texts
        .withColumn("ts", TextFunctions.tokens(col("text")))
        .withColumn("fast", TextFunctions.posGramHashes(col("text"), n))
        .withColumn("slow",
          when(size(col("ts")) >= n, declarative)
            .otherwise(expr("cast(array() as array<bigint>)")))
        .filter(col("fast") =!= col("slow"))
      assert(diff.count() == 0, s"graft_posgrams diverged at n=$n")
    }
  }

  test("graft_word_grams == declarative positional-gram transform") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("text"))
      .unionByName(Seq("", "a", "a b c", "one two three four",
        "  padded   runs\tof \n ws  ", "x y x y x").toDF("text"))
    for (n <- Seq(1, 2, 3)) {
      val diff = texts
        .withColumn("fast", TextFunctions.wordGrams(col("text"), n))
        .withColumn("slow", TextFunctions.wordGramsHof(col("text"), n))
        .filter(col("fast") =!= col("slow"))
      assert(diff.count() == 0, s"graft_word_grams diverged at n=$n")
    }
  }

  test("graft_shingle_hashes == baseHashes(wordShingles) on corpus + edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("text"))
      .unionByName(Seq("", "a", "ab", "one two", "  padded  ", "a\tb\nc",
        "naïve déjà ✓ vu naïve déjà").toDF("text"))
    for (w <- Seq(2, 3)) {
      val diff = texts
        .withColumn("fast", TextFunctions.shingleHashes(col("text"), w))
        .withColumn("slow",
          TextFunctions.baseHashes(TextFunctions.wordShingles(col("text"), w)))
        .filter(col("fast") =!= col("slow"))
      assert(diff.count() == 0, s"graft_shingle_hashes diverged at w=$w")
    }
  }

  test("graft_cooc_pairs == declarative window-pair lambdas (q110/q113 forms)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("text"))
      .unionByName(Seq("", "a", "a b", "a a a", "ab cd ab cd",
        "wide words here again wide words", "  runs\tof \n ws x y  ")
        .toDF("text"))
    // q110's form: all tokens, canonical (least/greatest), self kept
    val tk0 = TextFunctions.tokens(col("text"))
    def q110Form(tk: org.apache.spark.sql.Column) =
      when(size(tk) < 2, array().cast("array<string>"))
        .otherwise(flatten(transform(sequence(lit(1), size(tk) - 1), i =>
          filter(transform(array(lit(1), lit(2)), d =>
            when(i + d <= size(tk),
              concat_ws(" ",
                least(element_at(tk, i), element_at(tk, i + d)),
                greatest(element_at(tk, i), element_at(tk, i + d))))),
            x => x.isNotNull))))
    // q113's form: length>=4 tokens, ordered, self-loops dropped
    def q113Form(tk: org.apache.spark.sql.Column) =
      when(size(tk) < 2, array().cast("array<string>"))
        .otherwise(flatten(transform(sequence(lit(1), size(tk) - 1), i =>
          filter(transform(array(lit(1), lit(2)), d =>
            when((i + d <= size(tk)) &&
              (element_at(tk, i) =!= element_at(tk, i + d)),
              concat_ws(" ", element_at(tk, i), element_at(tk, i + d)))),
            x => x.isNotNull))))
    val staged = texts
      .withColumn("tk", tk0)
      .withColumn("tk4", filter(col("tk"), w => length(w) >= 4))
    val diff = staged
      .withColumn("f110",
        TextFunctions.coocPairs(col("text"), 2, 0, canonical = true,
          dropSelf = false))
      .withColumn("s110", q110Form(col("tk")))
      .withColumn("f113",
        TextFunctions.coocPairs(col("text"), 2, 4, canonical = false,
          dropSelf = true))
      .withColumn("s113", q113Form(col("tk4")))
      .filter(col("f110") =!= col("s110") || col("f113") =!= col("s113"))
    assert(diff.count() == 0, "graft_cooc_pairs diverged from the lambdas")
  }

  test("graft_md5_60 == declarative conv(substring(md5)) on corpus + edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus text plus edge shapes: empty string, 1 char, multi-byte
    // UTF-8, long runs — the native fold must equal the hex-parse for
    // every byte pattern the engine hashes
    val texts = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("text"))
      .unionByName(Seq("", "a", "ab c", "naïve — déjà vu ✓",
        "\t\n  ", "0123456789" * 50).toDF("text"))
    val diff = texts
      .withColumn("fast", TextFunctions.md5Long60(col("text")))
      .withColumn("slow", TextFunctions.md5Long60Hof(col("text")))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "graft_md5_60 diverged from the hex parse")
  }

  test("graft_sorted_pairs == self-join pair set (packed, q120 form)") {
    import spark.implicits._
    // baskets with duplicates, singletons, empties, unsorted input —
    // the expression must emit exactly the DISTINCT x < y pairs the
    // capped self-join produced, packed s1 << 32 | s2
    val baskets = Seq(
      (1L, Seq(5L, 3L, 9L, 3L)), (2L, Seq(7L)), (3L, Seq.empty[Long]),
      (4L, Seq(2L, 1L, 2L, 8L, 4L))).toDF("cust", "supps")
    val fast = baskets
      .select(col("cust"), explode(TextFunctions.sortedPairs(col("supps"))).as("pk"))
      .select(col("cust"), shiftright(col("pk"), 32).as("s1"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("s2"))
    val flat = baskets.select(col("cust"), explode(col("supps")).as("supp")).distinct()
    val slow = flat.select(col("cust"), col("supp").as("s1"))
      .join(flat.select(col("cust"), col("supp").as("s2")), Seq("cust"))
      .filter(col("s1") < col("s2"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }

  test("graft_sorted_pairs rejects values outside [0, 2^31)") {
    import spark.implicits._
    val bad = Seq(Seq(1L, 1L << 31)).toDF("supps")
    val e = intercept[Exception] {
      bad.select(TextFunctions.sortedPairs(col("supps"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("graft_sorted_inter_count == size(array_intersect) on sorted arrays") {
    // corpus bigram shingles (the q32/q131/q135 verify input) plus
    // edge shapes: empty sides, no overlap, full overlap, duplicates
    import spark.implicits._
    val sh = docs.limit(200)
      .select(col("doc_id"), sort_array(
        TextFunctions.wordShingles(col("text"), 2)).as("s"))
    val pairs = sh.select(col("doc_id").as("a_id"), col("s").as("a_s"))
      .crossJoin(sh.select(col("doc_id").as("b_id"), col("s").as("b_s")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs
      .withColumn("fast", TextFunctions.sortedInterCount(col("a_s"), col("b_s")))
      .withColumn("slow", size(array_intersect(col("a_s"), col("b_s"))).cast("long"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "sorted merge diverged from array_intersect")
    val edges = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "b", "c"), Seq("b", "b", "c", "z")),
      (Seq("a", "a"), Seq("a", "a"))).toDF("a_s", "b_s")
    val ediff = edges
      .withColumn("fast", TextFunctions.sortedInterCount(col("a_s"), col("b_s")))
      .withColumn("slow", size(array_intersect(col("a_s"), col("b_s"))).cast("long"))
      .filter(col("fast") =!= col("slow"))
    assert(ediff.count() == 0)
    // long-array variant
    val ledges = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 2L, 5L), Seq(2L, 5L, 5L, 9L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a_s", "b_s")
    val ldiff = ledges
      .withColumn("fast", TextFunctions.sortedInterCount(col("a_s"), col("b_s")))
      .withColumn("slow", size(array_intersect(col("a_s"), col("b_s"))).cast("long"))
      .filter(col("fast") =!= col("slow"))
    assert(ldiff.count() == 0)
  }

  test("graft_tokens == filter(split) on corpus + edges (incl. minLen)") {
    import spark.implicits._
    val texts = docs.select(col("text"))
      .unionByName(Seq("", " ", "  a  ", "a\tb\nc\rd\fe", "a\u000Bb",
        "naïve — déjà vu ✓", "one", " lead", "trail ",
        "\u00A0nbsp is not \\s\u00A0separated").toDF("text"))
    val diff = texts
      .withColumn("fast", TextFunctions.tokens(col("text")))
      .withColumn("slow", TextFunctions.tokensHof(col("text")))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "graft_tokens diverged from filter(split)")
    val diffMin = texts
      .withColumn("fast", TextFunctions.tokensMinLen(col("text"), 4))
      .withColumn("slow", filter(TextFunctions.tokensHof(col("text")),
        t => length(t) >= 4))
      .filter(col("fast") =!= col("slow"))
    assert(diffMin.count() == 0, "minLen fusion diverged")
  }

  test("graft_lang_id == declarative CASE chain on corpus + edges") {
    import spark.implicits._
    val texts = docs.select(col("text"))
      .unionByName(Seq("", "   ", "the the der die le la el y de shi",
        "de de de", // zh and de share 'de'; fr/es share 'le'/'la'
        "le le la", "xyzzy plugh", "The A Of And TO In IS",
        "naïvedéjà\tvu\r\nthe of and", "und").toDF("text"))
    val diff = texts
      .withColumn("fast", TextFunctions.langId(col("text")))
      .withColumn("slow", TextFunctions.langIdHof(col("text")))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "graft_lang_id diverged from the CASE chain")
  }

  test("graft_quality_score == declarative form on corpus + edges (bitwise)") {
    import spark.implicits._
    val texts = docs.select(col("text"))
      .unionByName(Seq("", " \t\r\n", "a", "The of and is a short text.",
        "ALLCAPS 12345 !!!", "naïve — déjà vu ✓ the of",
        ("word " * 200).trim, "\f", "ß İ 0").toDF("text"))
    // bitwise double equality — same integer-derived inputs, same IEEE
    // operations in the same order
    val diff = texts
      .withColumn("fast", TextFunctions.qualityScore(col("text")))
      .withColumn("slow", TextFunctions.qualityScoreHof(col("text")))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "graft_quality_score diverged bitwise")
  }

  test("NULL text: native exprs return NULL, HOF twins an empty array") {
    // documented divergence (ADVICE r14): on NULL input the native
    // expressions are null-propagating (UnaryExpression nullSafeEval)
    // while the declarative twins build an empty array — harmless in
    // every consumer (all of them explode, which drops NULL and empty
    // alike), but pinned explicitly here because the corpus-equality
    // tests above compare with `=!=`, which silently skips null rows
    import spark.implicits._
    val nullText = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r = nullText.select(
      TextFunctions.wordGrams(col("text"), 2).as("native_grams"),
      TextFunctions.wordGramsHof(col("text"), 2).as("hof_grams"),
      TextFunctions.coocPairs(col("text"), 2, 1, canonical = true,
        dropSelf = true).as("native_pairs"),
      TextFunctions.md5Long60(col("text")).as("native_md5"))
      .collect()(0)
    assert(r.isNullAt(0), "native word_grams must be NULL on NULL text")
    assert(r.getSeq[String](1) == Seq.empty, "HOF twin yields empty array")
    assert(r.isNullAt(2), "native cooc_pairs must be NULL on NULL text")
    assert(r.isNullAt(3), "native md5_60 must be NULL on NULL text")
    // the consumer-level equivalence that makes the divergence benign
    val exploded = nullText.select(explode(
      TextFunctions.wordGrams(col("text"), 2)).as("g")).count()
    val explodedHof = nullText.select(explode(
      TextFunctions.wordGramsHof(col("text"), 2)).as("g")).count()
    assert(exploded == 0 && explodedHof == 0)
  }

  test("graft_minhash on empty shingle arrays mirrors array_min nulls") {
    import spark.implicits._
    val empty = Seq((1L, Seq.empty[Long])).toDF("id", "base")
    val r = empty.select(TextFunctions.minHashFromBase(col("base"), 4).as("sig"))
      .collect()(0).getSeq[Any](0)
    assert(r.size == 4 && r.forall(_ == null))
  }
}
