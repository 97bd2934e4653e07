package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.md5Long60Local

/** Sequential-reference pins for the round-7 curation operators
  * (q111 n-gram decontamination, q112 SemDeDup, q114 record linkage,
  * q115 k-means++ seeding, q116 filter cascade, q117 DSIR): each
  * query's distributed plan must reproduce, bit-for-bit, an
  * independent driver-side re-derivation of the same math over the
  * collected sf0.001 tables. The DuckDB oracle already gates these
  * cross-engine; this pins them cross-FORMULATION (a shuffle-order or
  * join-semantics bug that happened to fool both engines the same way
  * would still have to fool a third, sequential implementation).
  */
class CurationQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // --- local twins of the engine's deterministic primitives ---------

  /** Left-to-right double fold — DotProductExpr's exact semantics. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** Distinct word w-grams — TextFunctions.wordShingles semantics
    * (slice clamps; a short text yields its whole token run).
    */
  private def wordShingles(text: String, w: Int): Seq[String] = {
    val t = toks(text)
    (0 to math.max(t.length - w, 0))
      .map(i => t.slice(i, i + w).mkString(" ")).distinct
  }

  private def docs(): Array[(Long, String, String, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def vecs(): Array[(Long, Array[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def split(docId: Long): String = {
    val b = md5Long60Local(docId.toString) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  // --- q111 ----------------------------------------------------------

  test("q111 matches a sequential 8-gram overlap re-derivation") {
    val d = docs()
    val evalGrams = d.filter(x => split(x._1) == "test")
      .flatMap(x => wordShingles(x._2, 8)).toSet
    val expected = d.filter(x => split(x._1) == "train")
      .map { x =>
        val g = wordShingles(x._2, 8)
        val hits = g.count(evalGrams)
        (x._1, g.size.toLong, hits.toLong,
          if (hits > 0) 1000L * hits / g.size else 0L)
      }
      .filter(_._3 > 0)
      .sortBy { case (id, _, h, p) => (-p, -h, id) }
      .take(50).toSeq
    val got = operators.SamplingQueries
      .q111NgramDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  // --- q112 ----------------------------------------------------------

  test("q112 matches a sequential cluster-then-pair re-derivation") {
    val v = vecs()
    val seeds = v.filter(_._1 < 8).sortBy(_._1)
    def cluster(x: Array[Float]): Long =
      seeds.map { case (sid, s) => (sid, dot(x, s)) }
        .maxBy { case (sid, d) => (d, -sid) }._1 // ties -> lowest seed
    val assign = v.map { case (id, x) => (id, cluster(x)) }
    val byCluster = assign.groupBy(_._2)
    val expected = byCluster.toSeq.map { case (c, members) =>
      val ids = members.map(_._1).sorted
      val emb = v.toMap
      val pairs = for {
        i <- ids.indices; j <- (i + 1) until ids.length
        if dot(emb(ids(i)), emb(ids(j))) >= 0.4d
      } yield (ids(i), ids(j))
      val dropped = pairs.map(_._2).distinct.size.toLong
      (c, ids.length.toLong, pairs.size.toLong, dropped,
        ids.length.toLong - dropped)
    }.sortBy(_._1)
    val got = operators.DedupQueries.q112Semdedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // ledger invariants hold by construction in the reference; assert
    // them on the engine output directly too
    got.foreach { case (_, m, p, dr, k) =>
      assert(k + dr == m); assert(p >= dr)
    }
  }

  // --- q114 ----------------------------------------------------------

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q114 matches a sequential blocked-levenshtein linkage") {
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val canon = parts.map(_._2).distinct
      .map(n => (n.split(" ").last, n))
    val expected = parts.flatMap { case (pk, name) =>
      val dirty = name.substring(1)
      val blk = dirty.split(" ").last
      val cands = canon.filter(_._1 == blk)
        .map { case (_, cn) => (lev(dirty, cn), cn) }
        .filter(_._1 <= 2)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (d, cn) => (d, cn) }
        Some((pk, dirty, best._2, best._1.toLong))
      }
    }.sortBy(_._1).take(200).toSeq
    val got = operators.DedupQueries.q114RecordLinkage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q115 ----------------------------------------------------------

  test("q115 matches a sequential farthest-point reference, bit-for-bit") {
    val v = vecs().sortBy(_._1)
    val emb = v.toMap
    val ssq = v.map { case (id, x) => id -> dot(x, x) }.toMap
    def d2(id: Long, sid: Long): Double =
      ssq(id) + ssq(sid) - 2.0d * dot(emb(id), emb(sid))
    var mind = v.map { case (id, _) => id -> d2(id, 0L) }.toMap
    val expected = collection.mutable.ArrayBuffer[(Long, Long, Double)](
      (0L, 0L, 0.0d))
    for (r <- 1 until 8) {
      val (wid, wd) = mind.toSeq.maxBy { case (id, d) => (d, -id) }
      expected += ((r.toLong, wid, wd))
      if (r < 7)
        mind = mind.map { case (id, d) => id -> math.min(d, d2(id, wid)) }
    }
    val got = operators.VectorQueries.q115KmeansppSeed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected.toSeq)
  }

  // --- q116 ----------------------------------------------------------

  test("q116 matches a sequential cascade re-derivation") {
    val allStop = functions.TextFunctions.stopwords
      .flatMap(_._2).distinct.toSet
    val d = docs()
    def verdict(text: String, nChars: Long): String = {
      val t = toks(text)
      val ntok = t.length.toLong
      val sumlen = t.map(_.length.toLong).sum
      val stophits = toks(text.toLowerCase).count(allStop)
      val mwl10 = (10 * sumlen) / math.max(ntok, 1L)
      if (ntok < 20) "too_short"
      else if (nChars > 480) "too_long"
      else if (mwl10 < 41 || mwl10 > 48) "word_length"
      else if (stophits < 2) "few_stopwords"
      else "kept"
    }
    val expected = d.groupBy(_._3).toSeq.map { case (lang, ds) =>
      val vs = ds.map(x => verdict(x._2, x._4))
      (lang, vs.length.toLong,
        vs.count(_ == "too_short").toLong, vs.count(_ == "too_long").toLong,
        vs.count(_ == "word_length").toLong,
        vs.count(_ == "few_stopwords").toLong, vs.count(_ == "kept").toLong)
    }.sortBy(_._1)
    val got = operators.TextQueries.q116FilterCascade(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // the funnel property the cascade exists for: attribution partitions
    got.foreach { case (_, n, a, b, c, dd, k) => assert(a + b + c + dd + k == n) }
  }

  // --- q118 ----------------------------------------------------------

  test("q118 matches a sequential drift re-derivation") {
    val bkts = 512L
    val d = docs()
    val tok = d.flatMap { case (id, text, _, _) =>
      toks(text).map(w => (id % 2 == 0, w, md5Long60Local(w) % bkts))
    }
    val byTok = tok.groupBy(x => (x._3, x._2)).map { case ((b, w), xs) =>
      (b, w, xs.count(_._1).toLong, xs.count(!_._1).toLong)
    }
    val byBucket = byTok.groupBy(_._1).map { case (b, xs) =>
      val cRef = xs.map(_._3).sum
      val cCur = xs.map(_._4).sum
      val topRef = xs.maxBy(x => (x._3, x._2))._2
      val topCur = xs.maxBy(x => (x._4, x._2))._2
      (b, cRef, cCur, topRef, topCur)
    }.toSeq
    val nRef = byBucket.map(_._2).sum
    val nCur = byBucket.map(_._3).sum
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val expected = byBucket.map { case (b, cr, cc, tr, tc) =>
      (b, cr, cc, tr, tc,
        math.abs(bitlen((cr + 1) * (nCur + bkts)) -
          bitlen((cc + 1) * (nRef + bkts))))
    }.sortBy { case (b, _, cc, _, _, dc) => (-dc, -cc, b) }.take(20)
    val got = operators.TextQueries.q118DriftMonitor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  // --- q119 ----------------------------------------------------------

  test("q119 matches a sequential CMS and never underestimates") {
    val w = 256L
    val d = docs()
    val stream = d.flatMap(x => toks(x._2))
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val top = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    def bucket(i: Int, t: String): Long = md5Long60Local(s"$i:$t") % w
    val cms = stream.flatMap(t => (0 until 4).map(i => (i, bucket(i, t))))
      .groupBy(identity).map { case (ib, xs) => ib -> xs.length.toLong }
    val expected = top.map { case (t, c) =>
      val est = (0 until 4).map(i => cms((i, bucket(i, t)))).min
      (t, c, est, est - c)
    }
    val got = operators.SketchQueries.q119CmsEstimate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    got.foreach { case (_, _, _, over) =>
      assert(over >= 0, "CMS one-sided error violated")
    }
  }

  // --- q120 ----------------------------------------------------------

  test("q120 matches a sequential market-basket re-derivation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val baskets = li.flatMap { case (ok, sk) => ord.get(ok).map(c => (c, sk)) }
      .distinct
    val sizes = baskets.groupBy(_._1).map { case (c, xs) => c -> xs.length }
    val capped = baskets.filter { case (c, _) => sizes(c) <= 100 }
    val totals = capped.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val n = capped.map(_._1).distinct.length.toLong
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val co = capped.groupBy(_._1).values.flatMap { xs =>
      val ss = xs.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 5)
    val expected = co.toSeq.map { case ((a, b), nab) =>
      (a, b, nab, bitlen(nab * n) - bitlen(totals(a) * totals(b)))
    }.sortBy { case (a, b, nab, lc) => (-lc, -nab, a, b) }.take(50)
    val got = operators.GraphQueries.q120Copurchase(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q123 ----------------------------------------------------------

  test("q123 matches a sequential fixed-point quantization") {
    val data = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val fx = data.flatMap { case (lab, emb) =>
      emb.zipWithIndex.map { case (x, pos) =>
        (lab, pos, math.floor(x.toDouble * 1048576.0d).toLong)
      }
    }
    val calib = fx.groupBy(_._2).map { case (pos, xs) =>
      pos -> (xs.map(_._3).min, xs.map(_._3).max)
    }
    val expected = fx.map { case (lab, pos, xi) =>
      val (lo, hi) = calib(pos)
      val rng = math.max(hi - lo, 1L)
      val code = ((xi - lo) * 255) / rng
      val recon = lo + (code * rng) / 255
      (lab, math.abs(xi - recon))
    }.groupBy(_._1).toSeq.map { case (lab, xs) =>
      (lab, xs.length.toLong, xs.map(_._2).sum, xs.map(_._2).max)
    }.sortBy(_._1)
    val got = operators.VectorQueries.q123Int8Quantize(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  // --- q124 ----------------------------------------------------------

  test("q124 matches a sequential MinHash-band recall audit") {
    import functions.TextFunctions.{P, seedA, seedB}
    val d = docs().filter(_._1 < 300)
    def shingles(text: String): Seq[String] = wordShingles(text, 2)
    val sh = d.map(x => x._1 -> shingles(x._2).toSet).toMap
    val ids = d.map(_._1).sorted
    val truth = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sh(ids(i)); b = sh(ids(j))
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter).toDouble
      if jac >= 0.05d
    } yield (ids(i), ids(j), math.floor(jac * 10).toLong)
    def sig(s: Set[String]): IndexedSeq[Long] = {
      val hs = s.map(g => math.floorMod(md5Long60Local(g), P))
      (0 until 16).map(i => hs.map(h =>
        math.floorMod(h * seedA(i) + seedB(i), P)).min)
    }
    val sigs = d.map(x => x._1 -> sig(sh(x._1))).toMap
    def collide(a: Long, b: Long): Boolean =
      (0 until 8).exists(band => (0 until 2).forall(j =>
        sigs(a)(band * 2 + j) == sigs(b)(band * 2 + j)))
    val buckets = truth.groupBy(_._3)
    val expected = buckets.toSeq.map { case (bk, xs) =>
      val caught = xs.count(x => collide(x._1, x._2)).toLong
      (bk, xs.length.toLong, caught, 1000L * caught / xs.length)
    }.sortBy(_._1)
    val got = operators.DedupQueries.q124LshRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    got.foreach { case (_, nt, nc, rp) => assert(nc <= nt && rp <= 1000) }
  }

  // --- q126 ----------------------------------------------------------

  test("q126 matches a sequential ANN-recall audit") {
    import functions.VectorFunctions.hyperplaneSignatureLocal
    val v = vecs()
    val cells = v.map { case (id, x) => id -> hyperplaneSignatureLocal(x, 6) }
      .toMap
    val emb = v.toMap
    val expected = (0L until 8L).map { q =>
      val qe = emb(q)
      def top10(pool: Seq[Long]): Seq[Long] =
        pool.filter(_ != q)
          .map(id => (id, dot(emb(id), qe)))
          .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1)
      val truth = top10(v.map(_._1).toSeq)
      val inCell = v.map(_._1).filter(id => cells(id) == cells(q)).toSeq
      val approx = top10(inCell)
      val caught = truth.toSet.intersect(approx.toSet).size.toLong
      (q, approx.size.toLong, caught, 1000L * caught / 10L)
    }
    val got = operators.VectorQueries.q126AnnRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q121 ----------------------------------------------------------

  test("q121 matches a sequential transition-model re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val s = xs.sortBy(x => (x._3, x._2)).toSeq
      s.sliding(2).collect {
        case Seq(a, b)
          if b._3 / 1000000L - a._3 / 1000000L <= 1800L => (a._4, b._4)
      }
    }
    val m = trans.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val fromTot = m.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    val expected = m.toSeq.map { case ((f, t), c) =>
      (f, t, c, 1000L * c / fromTot(f))
    }.sortBy(x => (x._1, x._2))
    val got = operators.SearchQueries.q121MarkovTransitions(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // conditional distributions sum to ≤ 1000 (truncating division)
    got.groupBy(_._1).values.foreach(rs => assert(rs.map(_._4).sum <= 1000))
  }

  // --- q125 ----------------------------------------------------------

  test("q125 matches a sequential frequent-path re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val s = xs.sortBy(x => (x._3, x._2)).toSeq
      // split into gap sessions, then 3-grams per session
      val sessions = s.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          acc match {
            case cur :: rest
              if e._3 / 1000000L - cur.head._3 / 1000000L <= 1800L =>
              (e :: cur) :: rest // cur is reversed; head = previous event
            case _ => List(e) :: acc
          }
      }.map(_.reverse.map(_._4))
      sessions.flatMap(types =>
        types.sliding(3).filter(_.size == 3).map(_.mkString(">")))
    }
    val expected = paths.groupBy(identity)
      .map { case (p, xs) => (p, xs.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = operators.SearchQueries.q125FrequentPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  // --- q122 ----------------------------------------------------------

  test("q122 matches a sequential robust-anomaly re-derivation") {
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.size.toLong) }
      .toSeq
    def lowerMedian(xs: Seq[(Long, String)]): Long = {
      // rank by (value, day); lower median at rank (n+1)/2
      val s = xs.sortBy(identity)
      s((s.length + 1) / 2 - 1)._1
    }
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      val med = lowerMedian(xs.map(x => (x._3, x._2)))
      val mad = lowerMedian(xs.map(x => (math.abs(x._3 - med), x._2)))
      xs.filter(x => math.abs(x._3 - med) > 3 * mad)
        .map(x => (et, x._2, x._3, med, mad))
    }.sortBy(x => (x._1, x._2))
    val got = operators.TemporalQueries.q122VolumeAnomaly(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  // --- q117 ----------------------------------------------------------

  test("q117 matches a sequential DSIR re-derivation") {
    val bkts = 1024L
    val d = docs()
    def feats(text: String): Seq[Long] = {
      val t = toks(text)
      val grams = t.toSeq ++
        (if (t.length < 2) Seq.empty
         else (0 until t.length - 1).map(i => s"${t(i)} ${t(i + 1)}"))
      grams.map(g => md5Long60Local(g) % bkts)
    }
    val all = d.map(x => (x._1, x._3, feats(x._2)))
    val rawCnt = all.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val tgtCnt = all.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val rTot = rawCnt.values.sum
    val tTot = tgtCnt.values.sum
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val expected = all.map { case (id, lang, fs) =>
      val score = fs.map { b =>
        bitlen((tgtCnt.getOrElse(b, 0L) + 1) * (rTot + bkts)) -
          bitlen((rawCnt(b) + 1) * (tTot + bkts))
      }.sum
      (id, lang, fs.size.toLong, score)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(100).toSeq
    val got = operators.SamplingQueries.q117DsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q127 ----------------------------------------------------------

  test("q127 matches a sequential tf-idf re-derivation") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = rows.length.toLong
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    // (source, term) -> (tf total, docs-in-source containing term)
    val bySrcTerm: Map[(String, String), (Long, Long)] = rows
      .flatMap { case (id, src, text) =>
        toks(text.toLowerCase).groupBy(identity)
          .map { case (w, g) => ((id, src, w), g.length.toLong) }
      }
      .groupBy { case ((_, s, w), _) => (s, w) }
      .map { case (k, g) => k -> (g.map(_._2).sum, g.size.toLong) }
    val df: Map[String, Long] = bySrcTerm.groupBy(_._1._2)
      .map { case (w, g) => w -> g.map(_._2._2).sum }
    val expected = bySrcTerm.toSeq
      .map { case ((s, w), (tf, _)) =>
        val idf = bitlen(n / df(w))
        (s, w, tf, df(w), idf, bitlen(tf) * idf)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, terms) =>
        terms.sortBy { case (_, w, _, _, _, wt) => (-wt, w) }.take(10)
          .zipWithIndex.map { case ((s, w, tf, dfw, idf, wt), i) =>
            (s, (i + 1).toLong, w, tf, dfw, idf, wt)
          }
      }.sortBy(x => (x._1, x._2))
    val got = operators.SearchQueries.q127TfIdf(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  // --- q128 ----------------------------------------------------------

  test("q128 histogram quantiles land in the exact disc-quantile's bin") {
    val d = docs()
    val byLang = d.groupBy(_._3).map { case (l, xs) => l -> xs.map(_._4).sorted }
    // sequential re-derivation of the sketch itself
    val expected = byLang.toSeq.flatMap { case (lang, vals) =>
      val bins = vals.map(v => math.min(v / 8, 63L))
      Seq(500L, 900L, 990L).map { pm =>
        val est = bins.distinct.sorted
          .find(b => 1000L * bins.count(_ <= b) >= pm * vals.length).get
        (lang, pm, est, (est + 1) * 8, vals.length.toLong)
      }
    }.sortBy(x => (x._1, x._2))
    val got = operators.SketchQueries.q128HistogramQuantiles(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the bounded-error contract: est_bin IS the bin holding the exact
    // disc-quantile (min value whose rank crosses the target)
    got.foreach { case (lang, pm, estBin, _, n) =>
      val vals = byLang(lang)
      val exact = vals.find(v => 1000L * (vals.count(_ <= v)) >= pm * n).get
      assert(estBin == math.min(exact / 8, 63L),
        s"$lang p$pm: est_bin=$estBin exact=$exact")
    }
  }

  // --- q129 ----------------------------------------------------------

  test("q129 matches a sequential bloom re-derivation, zero false negatives") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bloomBits(g: String): Seq[Long] =
      (0 to 2).map(i => md5Long60Local(s"${i}_$g") % 65536L)
    val tagged = rows.map { case (id, src, text) =>
      (id, src, wordShingles(text, 8), split(id))
    }
    val evalGrams = tagged.filter(_._4 == "test").flatMap(_._3).toSet
    val setBits = evalGrams.flatMap(bloomBits)
    val perDoc = tagged.filter(_._4 == "train").map { case (id, src, grams, _) =>
      val cand = grams.filter(g => bloomBits(g).forall(setBits))
      val exact = cand.count(evalGrams) // verify candidates only
      (id, src, grams.size.toLong, cand.size.toLong, exact.toLong,
        // independent full-exact count: bloom must not have missed any
        grams.count(evalGrams).toLong)
    }
    perDoc.foreach { case (id, _, _, _, exactOfCand, exactFull) =>
      assert(exactOfCand == exactFull, s"doc $id: bloom dropped a true hit")
    }
    val expected = perDoc.groupBy(_._2).toSeq.map { case (src, ds) =>
      (src, ds.length.toLong, ds.map(_._3).sum, ds.map(_._4).sum,
        ds.map(_._5).sum, ds.map(_._4).sum - ds.map(_._5).sum,
        ds.count(_._4 > 0).toLong, ds.count(_._5 > 0).toLong)
    }.sortBy(_._1)
    val got = operators.SamplingQueries.q129BloomDecontaminate(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
  }

  // --- q130 ----------------------------------------------------------

  test("q130 matches a sequential k-anonymity re-derivation") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val classes = cust
      .groupBy { case (n, s, b) => (n, s, math.floor(b / 1000).toLong) }
      .map(_._2.length.toLong)
    def bucket(k: Long) =
      if (k == 1) "k=1" else if (k == 2) "k=2"
      else if (k <= 5) "k=3-5" else if (k <= 10) "k=6-10" else "k>10"
    val expected = classes.groupBy(bucket).toSeq.map { case (b, ks) =>
      (b, ks.size.toLong, ks.sum, ks.min, ks.max)
    }.sortBy(_._4)
    val got = operators.ProfileQueries.q130KAnonymity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  // --- q131 ----------------------------------------------------------

  test("q131 matches a sequential incremental-probe re-derivation") {
    import functions.TextFunctions.{P, seedA, seedB}
    val d = docs()
    val sh = d.map(x => x._1 -> wordShingles(x._2, 2).toSet).toMap
    def sig(s: Set[String]): IndexedSeq[Long] = {
      val hs = s.map(g => math.floorMod(md5Long60Local(g), P))
      (0 until 16).map(i => hs.map(h =>
        math.floorMod(h * seedA(i) + seedB(i), P)).min)
    }
    val sigs = d.map(x => x._1 -> sig(sh(x._1))).toMap
    def collide(b: Long, h: Long): Boolean =
      (0 until 8).exists(band => (0 until 2).forall(j =>
        sigs(b)(band * 2 + j) == sigs(h)(band * 2 + j)))
    val hist = d.map(_._1).filter(_ % 2 == 0)
    val batch = d.map(_._1).filter(_ % 2 == 1)
    val expected = batch.flatMap { b =>
      val matches = hist.filter(h => collide(b, h)).flatMap { h =>
        val (bs, hs) = (sh(b), sh(h))
        val inter = (bs & hs).size
        val jac = inter.toDouble / (bs.size + hs.size - inter).toDouble
        if (jac >= 0.05d) Some((h, jac)) else None
      }
      if (matches.isEmpty) None
      else {
        val best = matches.minBy { case (h, j) => (-j, h) }
        Some((b, matches.length.toLong, best._1, best._2))
      }
    }.sortBy(_._1).toSeq
    val got = operators.DedupQueries.q131IncrementalDedup(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // asymmetry contract: every reported pair is batch(odd) vs hist(even)
    got.foreach { case (b, _, h, _) => assert(b % 2 == 1 && h % 2 == 0) }
  }

  // --- q132 ----------------------------------------------------------

  test("q132 matches a sequential encoding audit, recovers the injection") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val scored = rows.map { case (id, src, text) =>
      val feed =
        if (id % 22 == 0)
          text.replace("a", "Ã¡").replace("e", "e\u0007")
        else if (id % 11 == 0) text.replace("a", "Ã¡")
        else text
      val moji = feed.count(_ == 'Ã').toLong
      val ctrl = feed.count(_ == '\u0007').toLong
      val verdict =
        if (moji > 0 && ctrl > 0) "both" else if (moji > 0) "mojibake"
        else if (ctrl > 0) "control" else "clean"
      (id, src, moji, ctrl, feed.length.toLong, verdict)
    }
    // detection exactly recovers the injected pattern (every doc has
    // at least one 'a' and one 'e' in this corpus, so no miss either)
    scored.foreach { case (id, _, moji, ctrl, _, _) =>
      assert((moji > 0) == (id % 11 == 0 && rows.find(_._1 == id).get._3.contains("a")))
      assert((ctrl > 0) == (id % 22 == 0 && rows.find(_._1 == id).get._3.contains("e")))
    }
    val expected = scored.groupBy(x => (x._2, x._6)).toSeq
      .map { case ((src, v), xs) =>
        (src, v, xs.length.toLong, xs.map(_._3).sum, xs.map(_._4).sum,
          1000L * (xs.map(_._3).sum + xs.map(_._4).sum) / xs.map(_._5).sum)
      }.sortBy(x => (x._1, x._2))
    val got = operators.TextQueries.q132EncodingAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  // --- q133 ----------------------------------------------------------

  test("q133 matches a sequential equi-depth re-derivation") {
    val d = docs()
    // independent ntile: first (n mod k) buckets take ceil(n/k) rows
    val expected = d.groupBy(_._3).toSeq.flatMap { case (lang, xs) =>
      val sorted = xs.sortBy(x => (x._4, x._1)).map(_._4)
      val n = sorted.length; val k = 8
      val cuts = (0 until k).scanLeft(0) { (acc, b) =>
        acc + n / k + (if (b < n % k) 1 else 0)
      }
      (0 until k).flatMap { b =>
        val slice = sorted.slice(cuts(b), cuts(b + 1))
        if (slice.isEmpty) None
        else Some((lang, (b + 1).toLong, slice.length.toLong,
          slice.min, slice.max))
      }
    }.sortBy(x => (x._1, x._2))
    val got = operators.ProfileQueries.q133EquiDepth(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // depth contract: bucket sizes within a lang differ by at most 1
    got.groupBy(_._1).foreach { case (_, bs) =>
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1)
    }
  }

  // --- q134 ----------------------------------------------------------

  test("q134 matches a sequential HRW re-derivation, minimal movement") {
    val d = docs()
    def shard(id: Long, n: Int): Long =
      (0 until n).map(s => (md5Long60Local(s"${s}_$id"), s.toLong))
        .max._2
    val perDoc = d.map(x => (shard(x._1, 8), shard(x._1, 9), x._4))
    // HRW invariant: adding a shard never moves a doc between OLD shards
    perDoc.foreach { case (s8, s9, _) => assert(s9 == s8 || s9 == 8) }
    val expected = perDoc.groupBy(_._1).toSeq.map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._3).sum,
        xs.count(_._2 == 8).toLong, 0L)
    }.sortBy(_._1)
    val got = operators.LayoutQueries.q134RendezvousShards(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // movement is ~1/9 of the corpus, not ~8/9 (the mod-n failure mode)
    val moved = got.map(_._4).sum
    assert(moved.toDouble / d.length < 0.3)
  }

  // --- q135 ----------------------------------------------------------

  test("q135 matches a sequential split-leakage re-derivation") {
    import functions.TextFunctions.{P, seedA, seedB}
    val d = docs()
    val sh = d.map(x => x._1 -> wordShingles(x._2, 2).toSet).toMap
    def sig(s: Set[String]): IndexedSeq[Long] = {
      val hs = s.map(g => math.floorMod(md5Long60Local(g), P))
      (0 until 16).map(i => hs.map(h =>
        math.floorMod(h * seedA(i) + seedB(i), P)).min)
    }
    val sigs = d.map(x => x._1 -> sig(sh(x._1))).toMap
    def collide(a: Long, b: Long): Boolean =
      (0 until 8).exists(band => (0 until 2).forall(j =>
        sigs(a)(band * 2 + j) == sigs(b)(band * 2 + j)))
    val ids = d.map(_._1).sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if collide(ids(i), ids(j))
      a = sh(ids(i)); b = sh(ids(j))
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter).toDouble
      if jac >= 0.05d
    } yield (ids(i), ids(j), jac)
    val expected = pairs
      .map { case (a, b, j) =>
        val (sa, sb) = (split(a), split(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa, j)
      }
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((lo, hi), xs) =>
        (lo, hi, xs.length.toLong, xs.map(_._3).max,
          xs.count(_._3 >= 0.5d).toLong)
      }.sortBy(x => (x._1, x._2))
    val got = operators.DedupQueries.q135SplitLeakage(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  // --- q136 ----------------------------------------------------------

  test("q136 matches a sequential vocabulary-growth re-derivation") {
    val d = docs()
    val nIds = d.map(_._1).max + 1
    def quart(id: Long): Long = math.min(4 * id / nIds, 3L)
    val occs = d.flatMap(x => toks(x._2).map(w => (x._1, w)))
    val occExp = occs.groupBy(x => quart(x._1)).map { case (q, xs) =>
      q -> xs.length.toLong
    }
    val byType = occs.groupBy(_._2).toSeq.map { case (_, xs) =>
      (xs.map(_._1).min, xs.length.toLong)
    }
    val typExp = byType.groupBy(x => quart(x._1)).map { case (q, xs) =>
      q -> (xs.size.toLong, xs.count(_._2 == 1L).toLong)
    }
    var cum = 0L
    val expected = occExp.keys.toSeq.sorted.map { q =>
      val (nt, hx) = typExp.getOrElse(q, (0L, 0L))
      cum += nt
      (q, occExp(q), nt, cum, hx)
    }
    val got = operators.TextQueries.q136VocabGrowth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // growth-ledger invariant: final cumulative vocab = distinct types
    assert(got.last._4 == occs.map(_._2).distinct.length.toLong)
  }

  // --- q137 ----------------------------------------------------------

  test("q137 matches a sequential calibration re-derivation") {
    val allStop = functions.TextFunctions.stopwords
      .flatMap(_._2).distinct.toSet
    def quality(text: String): Double = {
      val nChars = text.length.toDouble
      val t = toks(text)
      val nToks = t.length.toDouble
      val alpha = text.count(_.isLetter).toDouble
      val stopHits = toks(text.toLowerCase).count(allStop).toDouble
      val lenScore = math.min(nChars / 500.0, 1.0)
      val alphaScore = if (nChars > 0) alpha / nChars else 0.0
      val stopScore = if (nToks > 0) math.min(stopHits * 5.0 / nToks, 1.0) else 0.0
      val wordScore = math.min((if (nToks > 0) alpha / nToks else 0.0) / 8.0, 1.0)
      (lenScore + alphaScore + stopScore + wordScore) / 4.0
    }
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = rows.map { case (id, src, text) => (id, src, quality(text)) }
      .groupBy(_._2).toSeq.map { case (src, xs) =>
        val sorted = xs.sortBy(x => (x._3, x._1))
        val n = sorted.length.toLong
        val cal = sorted.zipWithIndex.count { case (_, i) =>
          i.toLong * 1000 / math.max(n - 1, 1L) >= 500
        }
        (src, n, xs.count(_._3 >= 0.55d).toLong, cal.toLong)
      }.sortBy(_._1)
    val got = operators.SamplingQueries.q137ScoreCalibrate(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the calibration property: every source passes ~half its docs
    got.foreach { case (_, n, _, cal) =>
      assert(math.abs(cal - n / 2) <= 1 + n / 10)
    }
  }

  // --- q138 ----------------------------------------------------------

  test("q138 matches a sequential point-in-time re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    // SCD2 versions per user: collapse runs, half-open intervals
    val hist = byUser.map { case (uid, xs) =>
      val s = xs.sortBy(x => (x._3, x._2)).toSeq
      val changes = s.head +: s.sliding(2).collect {
        case Seq(a, b) if a._4 != b._4 => b
      }.toSeq
      val versions = changes.zipWithIndex.map { case (c, i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._3) else None
        (c._4, c._3, to)
      }
      uid -> versions
    }
    val pitRows = ev.map { case (uid, _, us, _) =>
      val vs = hist(uid)
      val pit = vs.find(v => v._2 <= us && v._3.forall(us < _))
      assert(pit.isDefined, s"event at $us found no version") // exactly-one
      (uid, pit.get._1)
    }
    // count preservation: every event got exactly one PIT row
    assert(pitRows.length == ev.length)
    val cur = hist.map { case (uid, vs) => uid -> vs.last._1 }
    val expected = pitRows.map { case (uid, pa) => (pa, cur(uid)) }
      .groupBy(identity).toSeq
      .map { case ((pa, ca), xs) => (pa, ca, xs.length.toLong, pa != ca) }
      .sortBy(x => (x._1, x._2))
    val got = operators.TemporalQueries.q138PitJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == ev.length.toLong)
  }

  // --- q139 ----------------------------------------------------------

  test("q139 matches a sequential cross-lingual mining re-derivation") {
    import functions.VectorFunctions.planeComponentLocal
    val v = vecs()
    val langOf = docs().map(x => x._1 -> x._3).toMap
    def cell(x: Array[Float]): Long =
      (0 until 8).map { p =>
        val proj = x.indices.foldLeft(0.0d)((acc, i) =>
          acc + x(i).toDouble * planeComponentLocal(p, i))
        if (proj > 0) 1L << p else 0L
      }.sum
    val cells = v.map { case (id, x) => (id, x, cell(x)) }
    val pairs = for {
      i <- cells.indices; j <- (i + 1) until cells.length
      (a, ae, ca) = cells(i); (b, be, cb) = cells(j)
      if ca == cb
      cos = dot(ae, be)
      if cos >= 0.3d
      if langOf(a) != langOf(b)
    } yield (langOf(a), langOf(b), cos)
    val expected = pairs
      .map { case (la, lb, c) =>
        (if (la <= lb) la else lb, if (la <= lb) lb else la, c)
      }
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((lo, hi), xs) => (lo, hi, xs.length.toLong, xs.map(_._3).max) }
      .sortBy(x => (x._1, x._2))
    val got = operators.DedupQueries.q139CrossLingualPairs(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q140 ----------------------------------------------------------

  test("q140 matches a sequential negative-mining re-derivation") {
    val v = vecs()
    val emb = v.toMap
    val expected = v.filter(_._1 < 8).map(_._1).sorted.flatMap { qid =>
      val scored = v.filter(_._1 != qid)
        .map { case (id, x) => (id, dot(x, emb(qid))) }
      val hard = scored.filter(x => x._2 >= 0.2d && x._2 < 0.4d)
        .sortBy { case (id, c) => (-c, id) }.take(3).zipWithIndex
        .map { case ((id, c), i) => (qid, "hard", (i + 1).toLong, id, c) }
      val easy = scored.filter(_._2 < 0.0d)
        .sortBy { case (id, _) =>
          (md5Long60Local(s"${qid}_$id") % 1000000L, id)
        }.take(3).zipWithIndex
        .map { case ((id, c), i) => (qid, "easy", (i + 1).toLong, id, c) }
      (hard ++ easy).sortBy(x => (x._2, x._3))
    }.toSeq
    val got = operators.VectorQueries.q140NegativeMining(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // the mining band contract: no negative is a potential positive
    got.foreach { case (_, tier, _, _, c) =>
      assert(c < 0.4d)
      if (tier == "easy") assert(c < 0.0d)
    }
  }

  // --- q141 ----------------------------------------------------------

  test("q141 matches a sequential decayed-counter re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val maxUs = ev.map(_._2).max
    def w(us: Long): Long =
      1000000L >> math.min((maxUs - us) / 604800000000L, 30L).toInt
    val expected = ev.groupBy(_._1).toSeq.map { case (et, xs) =>
      val mass = xs.map(x => w(x._2)).sum
      (et, xs.length.toLong, mass, 1000L * mass / (xs.length.toLong * 1000000L))
    }.sortBy(_._1)
    val got = operators.TemporalQueries.q141DecayedCounts(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // decay contract: mass never exceeds raw count at full weight
    got.foreach { case (_, n, mass, fp) =>
      assert(mass <= n * 1000000L); assert(fp <= 1000L)
    }
  }

  // --- q142 ----------------------------------------------------------

  /** Independent ITERATIVE water-filling (the engine uses the closed
    * form): absorb every language at or below the current equal-share
    * level, recompute, repeat. Floors match the closed form's
    * integer-division semantics.
    */
  private def waterfill(ns: Seq[(String, Long)], b: Long): Map[String, Long] = {
    val alloc = collection.mutable.Map[String, Long]()
    var remaining = b
    var langs = ns.sortBy(x => (x._2, x._1))
    var done = false
    while (langs.nonEmpty && !done) {
      val level = remaining / langs.length
      val (below, above) = langs.partition(_._2 <= level)
      if (below.isEmpty) {
        above.foreach { case (l, _) => alloc(l) = level }
        done = true
      } else {
        below.foreach { case (l, n) => alloc(l) = n; remaining -= n }
        langs = above
      }
    }
    alloc.toMap
  }

  test("q142 matches an independent iterative waterfall") {
    val d = docs()
    val counts = d.groupBy(_._3).toSeq.map { case (l, xs) => (l, xs.length.toLong) }
    val nTotal = d.length.toLong
    val budget = nTotal * 2 / 5
    val ref = waterfill(counts, budget)
    val expected = counts.map { case (l, n) =>
      (l, n, ref(l), 1000L * n / nTotal, 1000L * ref(l) / budget)
    }.sortBy(_._1)
    val got = operators.SamplingQueries.q142UnimaxAllocation(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // budget invariants: never over budget; under by less than the
    // number of capped languages (integer-floor remainder)
    val total = got.map(_._3).sum
    val capped = got.count(x => x._3 < x._2)
    assert(total <= budget)
    assert(capped == 0 || budget - total < capped)
    // a skewed synthetic case exercises partial absorption
    val skew = waterfill(Seq(("a", 2L), ("b", 3L), ("c", 100L), ("d", 95L)), 60L)
    assert(skew == Map("a" -> 2L, "b" -> 3L, "c" -> 27L, "d" -> 27L))
  }

  // --- q143 ----------------------------------------------------------

  test("q143 matches a sequential Poisson-bootstrap re-derivation") {
    val d = docs()
    def w(b: Int, id: Long): Long = {
      val u = md5Long60Local(s"${b}_$id") % 1000L
      if (u < 368) 0L else if (u < 736) 1L else if (u < 920) 2L else 3L
    }
    val expected = d.groupBy(_._3).toSeq.map { case (lang, xs) =>
      val means = (0 until 32).map { b =>
        val ws = xs.map(x => (w(b, x._1), x._4))
        val tw = ws.map(_._1).sum
        ws.map(x => x._1 * x._2).sum / math.max(tw, 1L)
      }
      (lang, xs.length.toLong, xs.map(_._4).sum / xs.length,
        means.min, means.max, means.max - means.min)
    }.sortBy(_._1)
    val got = operators.SamplingQueries.q143BootstrapCi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the band brackets the point estimate (up to integer-floor slack)
    got.foreach { case (_, _, mean, lo, hi, _) =>
      assert(lo <= mean + 1 && mean <= hi + 1)
    }
  }

  // --- q144 ----------------------------------------------------------

  test("q144 matches a sequential A/B re-derivation; A/A bands overlap") {
    // sf0.01, not the suite's sf0.001: the overlap property needs a
    // readable population (150 users vs 15 — at n≈15 even an honest
    // A/A false-positives, which is the point the operator makes)
    val abDir = "/root/testdata/sf0.01"
    val ev = spark.read.parquet(s"$abDir/events.parquet")
      .select("user_id").collect().map(_.getLong(0))
    val perUser = ev.groupBy(identity).toSeq
      .map { case (uid, xs) => (uid, xs.length.toLong) }
    def arm(uid: Long): Long = md5Long60Local(uid.toString) % 2L
    def w(b: Int, uid: Long): Long = {
      val u = md5Long60Local(s"${b}_$uid") % 1000L
      if (u < 368) 0L else if (u < 736) 1L else if (u < 920) 2L else 3L
    }
    val expected = perUser.groupBy(x => arm(x._1)).toSeq.map { case (a, xs) =>
      val means = (0 until 32).map { b =>
        val ws = xs.map(x => (w(b, x._1), x._2))
        1000L * ws.map(x => x._1 * x._2).sum / math.max(ws.map(_._1).sum, 1L)
      }
      (a, xs.length.toLong, xs.map(_._2).sum,
        1000L * xs.map(_._2).sum / xs.length, means.min, means.max)
    }.sortBy(_._1)
    val got = operators.SamplingQueries.q144AbReadout(spark, abDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // A/A calibration: the arms differ only by the hash, so the
    // uncertainty bands MUST overlap — a "significant" A/A is a bug
    val Seq(a0, a1) = got.map(x => (x._5, x._6))
    assert(a0._1 <= a1._2 && a1._1 <= a0._2,
      s"A/A bands disjoint: $a0 vs $a1")
  }

  // --- q145 ----------------------------------------------------------

  test("q145 matches a sequential cohort re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minUs = ev.map(_._2).min
    val userWeeks = ev.map { case (u, us) =>
      (u, (us - minUs) / 604800000000L)
    }.distinct
    val cohort = userWeeks.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min
    }
    val sizes = cohort.values.groupBy(identity).map { case (c, xs) =>
      c -> xs.size.toLong
    }
    val expected = userWeeks
      .map { case (u, wk) => (cohort(u), wk - cohort(u)) }
      .groupBy(identity).toSeq
      .map { case ((c, age), xs) =>
        (c, age, xs.length.toLong, sizes(c),
          1000L * xs.length / sizes(c))
      }.sortBy(x => (x._1, x._2))
    val got = operators.TemporalQueries.q145RetentionCohorts(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // age 0 is full by construction: every user is active in their
    // cohort week
    got.filter(_._2 == 0L).foreach { case (_, _, a, s, rp) =>
      assert(a == s && rp == 1000L)
    }
  }

  // --- q146 ----------------------------------------------------------

  test("q146 matches a sequential Gini re-derivation") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val per = rows.groupBy(_._1).toSeq
      .map { case (s, xs) => (s, xs.map(_._2).sum) }
      .sortBy(x => (x._2, x._1))
    val k = per.length.toLong
    val s = per.map(_._2).sum
    val wsum = per.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val gini = 1000L * (2 * wsum - (k + 1) * s) / (k * s)
    val top1 = 1000L * per.last._2 / s
    val top3 = 1000L * per.takeRight(3).map(_._2).sum / s
    val got = operators.ProfileQueries.q146Concentration(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got == ((k, s, gini, top1, top3)))
    assert(got._3 >= 0 && got._3 < 1000)
  }

  // --- q147 / q148 ---------------------------------------------------

  test("q147 matches a sequential FD re-derivation") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val nat = spark.read.parquet(s"$dir/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .map(x => x._1 -> (x._2, x._3)).toMap
    val f = cust.toSeq.map { case (ck, nk, seg) =>
      (ck, nk, seg, nat(nk)._1, nat(nk)._2)
    }
    def check[A, B](name: String, lhs: ((Long, Int, String, String, Int)) => A,
        rhs: ((Long, Int, String, String, Int)) => B) = {
      val nl = f.map(lhs).distinct.length.toLong
      val np = f.map(x => (lhs(x), rhs(x))).distinct.length.toLong
      (name, nl, np, np == nl, np - nl)
    }
    val expected = Seq(
      check("c_custkey -> c_mktsegment", _._1, _._3),
      check("c_mktsegment -> c_nationkey", _._3, _._2),
      check("c_nationkey -> n_name", _._2, _._4),
      check("c_nationkey -> n_regionkey", _._2, _._5)).sortBy(_._1)
    val got = operators.ProfileQueries.q147FdAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // schema facts must hold; the key FD is trivially true
    val holds = got.map(x => x._1 -> x._4).toMap
    assert(holds("c_nationkey -> n_name") && holds("c_nationkey -> n_regionkey"))
    assert(holds("c_custkey -> c_mktsegment"))
  }

  test("q148 orphan set is exactly the injected dirty keys") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custKeys = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val injected = ev.filter(_._1 % 101 == 0)
    val got = operators.ProfileQueries.q148RiAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val byFk = got.map(x => x._1 -> x).toMap
    // clean edges: zero orphans
    Seq("customer.c_nationkey -> nation", "lineitem.l_orderkey -> orders",
      "orders.o_custkey -> customer").foreach { fk =>
      assert(byFk(fk)._3 == 0L && byFk(fk)._4 == 0L, fk)
    }
    // dirty edge: exactly the injected rows (every shifted key is out
    // of range by construction; unshifted rows all resolve)
    val dirty = byFk("events_dirty.user_id -> customer")
    assert(dirty._2 == ev.length.toLong)
    assert(dirty._3 == injected.length.toLong)
    assert(dirty._4 == injected.map(x => x._2 + 1000000L).distinct.length.toLong)
    assert(ev.filter(_._1 % 101 != 0).forall(x => custKeys(x._2)))
  }

  // --- q149 ----------------------------------------------------------

  test("q149 merge equals recompute on a sequential reference") {
    val d = docs()
    def postings(xs: Seq[(Long, String)]): Map[String, (Long, Long)] =
      xs.flatMap { case (id, text) => toks(text.toLowerCase).map(w => (w, id)) }
        .groupBy(_._1).map { case (w, g) =>
          w -> (g.map(_._2).distinct.length.toLong, g.length.toLong)
        }
    val all = d.toSeq.map(x => (x._1, x._2))
    val stored = postings(all.filter(_._1 % 2 == 0))
    val delta = postings(all.filter(_._1 % 2 == 1))
    val merged = (stored.keySet ++ delta.keySet).map { w =>
      val (da, ta) = stored.getOrElse(w, (0L, 0L))
      val (db, tb) = delta.getOrElse(w, (0L, 0L))
      w -> (da + db, ta + tb)
    }.toMap
    assert(merged == postings(all)) // the merge algebra itself
    val expected = merged.toSeq
      .map { case (w, (df, tf)) => (w, df, tf, true) }
      .sortBy { case (w, _, tf, _) => (-tf, w) }.take(20)
    val got = operators.SearchQueries.q149IndexMerge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q150 ----------------------------------------------------------

  test("q150 matches a sequential RRF re-derivation") {
    val d = docs()
    val v = vecs()
    val emb = v.toMap
    val terms = Set("vector", "merge", "batch")
    val n = d.length.toLong
    val perDocTf = d.toSeq.map { case (id, text, _, _) =>
      id -> toks(text.toLowerCase).filter(terms).groupBy(identity)
        .map { case (t, g) => t -> g.length.toLong }
    }.filter(_._2.nonEmpty)
    val df = terms.map(t =>
      t -> perDocTf.count(_._2.contains(t)).toLong).toMap
    val w = df.map { case (t, f) => t -> ((n - f) * 1000000L / f) }
    val kw = perDocTf.map { case (id, tfs) =>
      (id, tfs.map { case (t, tf) => tf * w(t) }.sum)
    }.sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val vec = v.filter(_._1 != 7)
      .map { case (id, x) => (id, dot(x, emb(7L))) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expected = (kw.keySet ++ vec.keySet).toSeq.map { id =>
      val rk = kw.getOrElse(id, 0L)
      val rv = vec.getOrElse(id, 0L)
      val rrf = (if (rk > 0) 1000000L / (60 + rk) else 0L) +
        (if (rv > 0) 1000000L / (60 + rv) else 0L)
      (id, rk, rv, rrf)
    }.sortBy(x => (-x._4, x._1)).take(10)
    val got = operators.SearchQueries.q150HybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q151 ----------------------------------------------------------

  test("q151 matches a sequential next-fit plan; overshoot bounded") {
    val target = 8192L
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val files = rows.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((s, l), xs) => (s, l, xs.map(_._3).sum) }
      .sortBy { case (s, l, sz) => (-sz, s, l) }
    val bins = files.scanLeft(0L)(_ + _._3).init // exclusive cumsum
      .map(_ / target).zip(files)
    val expected = bins.groupBy(_._1).toSeq.map { case (b, xs) =>
      val tot = xs.map(_._2._3).sum
      (b, xs.length.toLong, tot, xs.map(_._2._3).max, 1000L * tot / target)
    }.sortBy(_._1)
    val got = operators.LayoutQueries.q151CompactionPlan(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // next-fit bound: a bin overshoots the target by less than its
    // largest file
    got.foreach { case (_, _, tot, largest, _) =>
      assert(tot < target + largest)
    }
  }

  // --- q152 ----------------------------------------------------------

  test("q152 matches a sequential latency re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val lats = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val s = xs.sortBy(x => (x._3, x._2)).toSeq
      // gap sessionization on floor-second timestamps (ts cast to long)
      val sids = s.zip(s.scanLeft(Option.empty[Long])((_, e) => Some(e._3)).init)
        .scanLeft(0L) { case (sid, (e, prev)) =>
          if (prev.isEmpty || e._3 / 1000000L - prev.get / 1000000L > 1800L)
            sid + 1 else sid
        }.tail
      s.zip(sids).groupBy(_._2).values.flatMap { sess =>
        val es = sess.map(_._1)
        val fv = es.filter(_._4 == "view").map(_._3).minOption
        fv.flatMap { v =>
          es.filter(e => e._4 == "purchase" && e._3 >= v)
            .map(_._3).minOption.map(p => (p - v) / 1000000L)
        }
      }
    }
    val buckets = lats.map(_ / 600L).groupBy(identity).toSeq
      .map { case (b, xs) => (b, xs.length.toLong) }.sortBy(_._1)
    val total = buckets.map(_._2).sum
    var cum = 0L
    val expected = buckets.map { case (b, n) =>
      cum += n; (b, n, 1000L * cum / total)
    }
    val got = operators.SearchQueries.q152ConversionLatency(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.last._3 == 1000L) // the cumulative curve closes
  }

  // --- q153 ----------------------------------------------------------

  test("q153 matches a sequential range-frame re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).toSeq.map { case (uid, xs) =>
      val ss = xs.map(_._2).sorted
      // range frame: for each event, count events in [s-600, s] —
      // tie-insensitive by construction (value-based window)
      val counts = ss.map(s => ss.count(t => t >= s - 600 && t <= s).toLong)
      (uid, ss.length.toLong, counts.max, counts.count(_ >= 3).toLong)
    }.sortBy { case (uid, n, mx, nb) => (-mx, -nb, -n, uid) }.take(20)
    val got = operators.TemporalQueries.q153RateLimitAudit(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q154 ----------------------------------------------------------

  test("q154 matches a sequential kappa re-derivation") {
    val stop = functions.TextFunctions.stopwords
    def predict(text: String): String = {
      val ts = toks(text.toLowerCase)
      val hits = stop.map { case (l, ws) =>
        l -> ts.count(ws.toSet).toLong
      }
      val mx = hits.map(_._2).max
      if (mx <= 0) "und" else hits.find(_._2 == mx).get._1
    }
    val d = docs()
    val pairs = d.toSeq.map(x => (x._3, predict(x._2)))
    val n = pairs.length.toLong
    val diag = pairs.count(p => p._1 == p._2).toLong
    val rt = pairs.groupBy(_._1).map { case (l, xs) => l -> xs.length.toLong }
    val ct = pairs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val peNum = rt.keys.map(l => rt(l) * ct.getOrElse(l, 0L)).sum
    val perLang = rt.keys.toSeq.map { l =>
      val nc = pairs.count(p => p._1 == l && p._2 == l).toLong
      (l, rt(l), nc, 1000L * nc / rt(l), -1L)
    }
    val all = ("ALL", n, diag, 1000L * diag / n,
      1000L * (n * diag - peNum) / (n * n - peNum))
    val expected = (perLang :+ all).sortBy(_._1)
    val got = operators.TextQueries.q154LangIdAgreement(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the audit's verdict on this corpus is itself a pinned fact:
    // declared labels are decorative (all text is English-like), so
    // chance-corrected agreement sits at chance level
    val kappa = got.find(_._1 == "ALL").get._5
    assert(kappa > -100 && kappa < 100, s"kappa=$kappa")
  }

  // --- q155 ----------------------------------------------------------

  test("q155 matches a sequential source-cosine re-derivation") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vecs: Map[String, Map[String, Long]] = rows.groupBy(_._1)
      .map { case (s, xs) =>
        val cnt = xs.flatMap(x => toks(x._2.toLowerCase)).groupBy(identity)
          .map { case (t, g) => t -> g.length.toLong }
        val tot = cnt.values.sum
        s -> cnt.map { case (t, c) => t -> 1000L * c / tot }
          .filter(_._2 > 0)
      }
    val norms = vecs.map { case (s, v) => s -> v.values.map(c => c * c).sum }
    val srcs = vecs.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      dot = vecs(a).map { case (t, c) => c * vecs(b).getOrElse(t, 0L) }.sum
    } yield (a, b, dot, 1000L * dot * dot / (norms(a) * norms(b))))
      .sortBy { case (a, b, _, s2) => (-s2, a, b) }.take(10)
    val got = operators.SearchQueries.q155SourceSimilarity(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // Cauchy–Schwarz: squared cosine never exceeds 1
    got.foreach { case (_, _, _, s2) => assert(s2 <= 1000L) }
  }

  // --- q156 ----------------------------------------------------------

  test("q156 matches a sequential burstiness re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.map { case (et, xs) =>
      val ss = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val d = ss.sliding(2).map(p => p(1) - p(0)).toSeq
      val (n, sd, sd2) = (d.length.toLong, d.sum, d.map(x => x * x).sum)
      val cv2 = 1000L * n * sd2 / (sd * sd) - 1000L
      val verdict =
        if (cv2 > 1200) "bursty" else if (cv2 < 800) "regular"
        else "poisson-like"
      (et, n, sd / n, cv2, verdict)
    }.sortBy(_._1)
    val got = operators.TemporalQueries.q156Burstiness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == expected)
  }

  // --- q157 ----------------------------------------------------------

  test("q157 matches a sequential skew-profile re-derivation") {
    // sf0.01: at the suite's sf0.001 (15 users) even the injected hot
    // key only reaches ratio ~5 — below the salting bar, honestly
    val skewDir = "/root/testdata/sf0.01"
    val ev = spark.read.parquet(s"$skewDir/events.parquet")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def profile(name: String, keys: Seq[Long]) = {
      val cs = keys.groupBy(identity).toSeq
        .map { case (k, xs) => (k, xs.length.toLong) }
        .sortBy(x => (x._2, x._1)).map(_._2)
      val p50 = cs((cs.length + 1) / 2 - 1)
      val mx = cs.max
      (name, keys.length.toLong, cs.length.toLong, mx, p50,
        1000L * mx / keys.length, mx / p50,
        if (mx / p50 >= 10) "salt" else "ok")
    }
    val expected = Seq(
      profile("events.user_id", ev.map(_._2).toSeq),
      profile("events.user_id_hot",
        ev.map(x => if (x._1 % 5 == 0) 0L else x._2).toSeq)).sortBy(_._1)
    val got = operators.ProfileQueries.q157SkewAdvisor(spark, skewDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toSeq
    assert(got == expected)
    // the advisor's verdicts are themselves the contract
    assert(got.find(_._1 == "events.user_id").get._8 == "ok")
    assert(got.find(_._1 == "events.user_id_hot").get._8 == "salt")
  }

  // --- q158 ----------------------------------------------------------

  test("q158 matches a sequential surprisal re-derivation") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("s"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    // in-session transitions tagged with (user, sid)
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (uid, xs) =>
      val s = xs.sortBy(x => (x._3, x._2)).toSeq
      var sid = 0L
      s.zip(Option.empty[(Long, String)] +: s.map(e => Some((e._3, e._4))).init)
        .flatMap { case (e, prev) =>
          val newSess = prev.isEmpty || e._3 - prev.get._1 > 1800L
          if (newSess) sid += 1
          if (!newSess && prev.nonEmpty)
            Some(((uid, sid), (prev.get._2, e._4)))
          else None
        }
    }
    val counts = trans.map(_._2).groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }
    val fromTot = counts.groupBy(_._1._1).map { case (f, g) => f -> g.values.sum }
    val surprisal = counts.map { case ((f, t), c) =>
      (f, t) -> (10L - bitlen(math.max(1000L * c / fromTot(f), 1L)))
    }
    val expected = trans.groupBy(_._1).toSeq.map { case ((uid, sid), ts) =>
      val tot = ts.map(x => surprisal(x._2)).sum
      (uid, sid, ts.length.toLong, tot, tot / ts.length)
    }.sortBy { case (u, sd, n, tot, _) => (-tot, -n, u, sd) }.take(20)
    val got = operators.SearchQueries.q158SessionSurprisal(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  // --- q159 ----------------------------------------------------------

  test("q159 matches a sequential fixed-point centroid re-derivation") {
    val v = vecs()
    def fpMeans(xs: Seq[(Long, Array[Float])]): (Long, Array[Long]) = {
      val dims = xs.head._2.length
      val sums = Array.fill(dims)(0L)
      xs.foreach { case (_, x) =>
        var i = 0
        while (i < dims) {
          sums(i) += math.floor(x(i).toDouble * 1048576d).toLong; i += 1
        }
      }
      // both engines' integer division TRUNCATES toward zero (Spark
      // `div`, DuckDB `//`) — matters here because fp sums go negative
      (xs.length.toLong, sums.map(s => s / xs.length.toLong))
    }
    val (nr, ma) = fpMeans(v.filter(_._1 % 2 == 0).toSeq)
    val (nc, mb) = fpMeans(v.filter(_._1 % 2 == 1).toSeq)
    val dist2 = ma.zip(mb).map { case (a, b) => (a - b) * (a - b) }.sum
    val cls = java.lang.Long.toBinaryString(math.max(dist2, 1L)).length.toLong
    val got = operators.VectorQueries.q159CentroidDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).head
    assert(got == ((nr, nc, ma.length.toLong, dist2, cls)))
  }

  // --- q160 ----------------------------------------------------------

  test("q160 matches a sequential winsorized re-derivation") {
    val d = docs()
    val expected = d.groupBy(_._3).toSeq.map { case (lang, xs) =>
      val vals = xs.map(_._4).sorted
      val n = vals.length.toLong
      def q(pm: Long): Long = vals(((pm * n + 999) / 1000 - 1).toInt)
      val (p5, p95) = (q(50), q(950))
      val wvals = vals.map(v => math.max(math.min(v, p95), p5))
      (lang, n, vals.sum / n, wvals.sum / n,
        vals.count(v => v < p5 || v > p95).toLong)
    }.sortBy(_._1)
    val got = operators.ProfileQueries.q160WinsorizedMeans(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // winsorizing pulls toward the center and clips ≤ 10% of rows
    got.foreach { case (_, n, _, _, clipped) =>
      assert(clipped <= n / 10 + 2)
    }
  }

  // --- q161 ----------------------------------------------------------

  test("q161 matches a sequential coarsening; mass conserved") {
    def tbl(name: String, cols: String*) =
      spark.read.parquet(s"$dir/$name.parquet").select(cols.head, cols.tail: _*)
    val orders = tbl("orders", "o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val items = tbl("lineitem", "l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custN = tbl("customer", "c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val suppN = tbl("supplier", "s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val names = tbl("nation", "n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val byOrder = orders.toMap
    val fine = items.map { case (ok, sk) => (byOrder(ok), sk) }
    val coarse = fine.groupBy { case (ck, sk) => (custN(ck), suppN(sk)) }
      .toSeq.map { case ((cn, sn), xs) =>
        (names(cn), names(sn), xs.length.toLong,
          xs.map(_._1).distinct.length.toLong,
          xs.map(_._2).distinct.length.toLong)
      }
    // conservation over the FULL coarse matrix (before the top-50 cut)
    assert(coarse.map(_._3).sum == fine.length.toLong)
    val expected = coarse
      .sortBy { case (c, s, n, _, _) => (-n, c, s) }.take(50)
    val got = operators.GraphQueries.q161GraphCoarsen(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  // --- q162 ----------------------------------------------------------

  test("q162 matches a sequential l-diversity re-derivation") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    val classes = cust
      .groupBy(x => (x._1, math.floor(x._2 / 1000).toLong)).toSeq
      .map { case (_, xs) =>
        (xs.length.toLong, xs.map(_._3).distinct.length.toLong)
      }
    val expected = classes.groupBy(_._2).toSeq.map { case (l, xs) =>
      (l, xs.length.toLong, xs.map(_._1).sum,
        xs.count(_._1 >= 5).toLong,
        (if (l == 1) xs.count(_._1 >= 5).toLong else 0L))
    }.sortBy(_._1)
    val got = operators.ProfileQueries.q162LDiversity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // l never exceeds k
    classes.foreach { case (k, l) => assert(l <= k) }
  }

  // --- q163 ----------------------------------------------------------

  test("q163 matches a sequential leakage re-derivation; group split clean") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def split(x: Long): String =
      if (md5Long60Local(x.toString) % 100 < 80) "train" else "test"
    def audit(name: String, f: ((Long, Long)) => String) = {
      val perUser = ev.groupBy(_._2).toSeq
        .map { case (_, xs) => xs.map(f).distinct.length }
      val straddle = perUser.count(_ > 1).toLong
      (name, perUser.length.toLong, straddle,
        1000L * straddle / perUser.length)
    }
    val expected = Seq(
      audit("event_hash", x => split(x._1)),
      audit("user_hash", x => split(x._2))).sortBy(_._1)
    val got = operators.SamplingQueries.q163GroupLeakage(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // group split is leak-free BY CONSTRUCTION
    assert(got.find(_._1 == "user_hash").get._3 == 0L)
  }

  // --- q164 ----------------------------------------------------------

  test("q164 matches a sequential occupancy re-derivation") {
    import functions.VectorFunctions.planeComponentLocal
    val v = vecs()
    def cell(x: Array[Float]): Long =
      (0 until 8).map { p =>
        val proj = x.indices.foldLeft(0.0d)((acc, i) =>
          acc + x(i).toDouble * planeComponentLocal(p, i))
        if (proj > 0) 1L << p else 0L
      }.sum
    val counts = v.map(x => cell(x._2)).groupBy(identity).toSeq
      .map(_._2.length.toLong)
    val (nCells, nVecs, mx) = (counts.length.toLong, counts.sum, counts.max)
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val expected = counts.groupBy(bitlen).toSeq.map { case (cls, xs) =>
      (cls, xs.length.toLong, xs.sum, 1000L * nCells / 256L,
        1000L * mx * nCells / nVecs)
    }.sortBy(_._1)
    val got = operators.VectorQueries.q164CellOccupancy(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // population conservation across size classes
    assert(got.map(_._3).sum == v.length.toLong)
  }

  // --- q165 ----------------------------------------------------------

  test("q165 MMR selects the relevance argmax first and diversifies") {
    val v = vecs()
    val emb = v.toMap
    val rels = v.filter(_._1 != 7)
      .map { case (id, x) => (id, dot(x, emb(7L))) }
    val top20 = rels.sortBy { case (id, r) => (-r, id) }.take(20)
    val got = operators.VectorQueries.q165MmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._2).distinct.length == 5)
    // rank 1 is the unpenalized relevance argmax; its score is λ·rel
    // (the penalty term is zero, not the λ weighting)
    assert(got.head._2 == top20.head._1)
    assert(got.head._4 == 0.7d * got.head._3)
    // every selection comes from the candidate pool with its true rel
    val relOf = top20.toMap
    got.foreach { case (_, id, rel, mmr) =>
      assert(relOf(id) == rel)
      // maxSim ∈ [-1, 1] (unit vectors), so the penalty term is
      // bounded — and can be a BONUS for anti-correlated candidates
      assert(math.abs(mmr - 0.7d * rel) <= 0.3d + 1e-12)
    }
    // the point of MMR: the selected set is more diverse than the
    // naive top-5 (strictly lower mean pairwise similarity here)
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for {
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield dot(emb(ids(i)), emb(ids(j)))
      ps.sum / ps.length
    }
    val naive = top20.take(5).map(_._1)
    assert(meanPairSim(got.map(_._2)) < meanPairSim(naive) + 1e-12,
      "MMR set should not be less diverse than naive top-5")
  }

  // --- q166 ----------------------------------------------------------

  test("q166 matches a sequential OOV-curve re-derivation") {
    val d = docs()
    val counts = d.flatMap(x => toks(x._2)).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }.toSeq
    val ranked = counts.sortBy { case (w, c) => (-c, w) }
    val total = counts.map(_._2).sum
    val nTypes = counts.length.toLong
    val expected = Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L).map { v =>
      val covered = ranked.take(v.toInt).map(_._2).sum
      (v, math.min(v, nTypes), covered, total - covered,
        1000L * (total - covered) / total)
    }
    val got = operators.TextQueries.q166OovCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // coverage is monotone in vocab size; oov share lands in [0, 1000]
    assert(got.map(_._3) == got.map(_._3).sorted)
    got.foreach { case (_, _, _, _, pm) => assert(pm >= 0 && pm <= 1000) }
  }

  // --- q167 ----------------------------------------------------------

  test("q167 matches a sequential fertility re-derivation") {
    val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = d.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((lang, source), xs) =>
        val per = xs.map { case (_, _, text) =>
          (toks(text).length.toLong, bpeRe.findAllIn(text).length.toLong)
        }
        val (ws, bpe) = (per.map(_._1).sum, per.map(_._2).sum)
        val fpms = per.collect { case (w, b) if w > 0 => 1000L * b / w }
        (lang, source, xs.length.toLong, ws, bpe,
          if (ws > 0) 1000L * bpe / ws else -1L,
          fpms.max, fpms.count(_ >= 2000L).toLong)
      }.sortBy(x => (x._1, x._2))
    val got = operators.TextQueries.q167TokenizerFertility(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5),
        r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // fertility is ≥ 1000‰: a whitespace word is at least one subword
    got.foreach { case (_, _, _, _, _, f, _, _) => assert(f >= 1000L) }
  }

  // --- q168 ----------------------------------------------------------

  test("q168 matches a sequential silhouette re-derivation") {
    val v = vecs()
    val seeds = v.filter(_._1 < 8).sortBy(_._1)
    def ssq(x: Array[Float]): Double = dot(x, x)
    val perVec = v.map { case (_, x) =>
      val ds = seeds.map { case (sid, s) =>
        (ssq(x) + ssq(s) - 2.0d * dot(x, s), sid)
      }.sortBy(identity)
      val (a, own) = ds(0)
      val b = ds(1)._1
      val spm =
        if (math.max(a, b) > 0.0d)
          math.floor(1000.0d * (b - a) / math.max(a, b)).toLong
        else 0L
      (own, spm)
    }
    val expected = perVec.groupBy(_._1).toSeq.map { case (cid, xs) =>
      val s = xs.map(_._2)
      (cid, xs.length.toLong, s.sum / xs.length, s.min,
        s.count(_ < 0).toLong)
    }.sortBy(_._1)
    val got = operators.VectorQueries.q168Silhouette(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // per-mille silhouettes live in [-1000, 1000]; population conserved
    assert(got.map(_._2).sum == v.length.toLong)
    got.foreach { case (_, _, mean, mn, _) =>
      assert(mean >= -1000L && mean <= 1000L && mn >= -1000L)
    }
  }

  // --- q169 ----------------------------------------------------------

  test("q169 matches a sequential Kaplan-Meier re-derivation") {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val end = ev.map(_._2).max
    val users = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val (mn, mx) = (xs.map(_._2).min, xs.map(_._2).max)
      ((mx - mn) / 86400000000L,
        if (mx < end - 259200000000L) 1L else 0L)
    }
    val ladder = users.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.length.toLong)
    }.sortBy(_._1)
    var atRisk = ladder.map(_._3).sum
    var s = 1000000L
    val expected = ladder.map { case (t, d, n) =>
      val row = {
        s = s * (atRisk - d) / atRisk
        (t, atRisk, d, n - d, s)
      }
      atRisk -= n
      row
    }
    val got = operators.TemporalQueries.q169KaplanMeier(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the survival curve is monotone non-increasing from ≤ 1.0
    assert(got.map(_._5) == got.map(_._5).sorted.reverse)
    got.foreach { case (_, _, _, _, ppm) =>
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  // --- q170 ----------------------------------------------------------

  test("q170 matches a sequential Benford re-derivation") {
    val exp = Map(1L -> 301L, 2L -> 176L, 3L -> 125L, 4L -> 97L, 5L -> 79L,
      6L -> 67L, 7L -> 58L, 8L -> 51L, 9L -> 46L)
    def column(table: String, c: String): Seq[(String, Long, Long)] = {
      val vals = spark.read.parquet(s"$dir/$table.parquet")
        .select(c).collect().map(_.getDouble(0))
      val cents = vals.map(v => math.floor(math.abs(v) * 100.0d).toLong)
        .filter(_ > 0L)
      cents.groupBy(x => x.toString.head.asDigit.toLong).toSeq
        .map { case (d, xs) => (c, d, xs.length.toLong) }
    }
    val obs = column("orders", "o_totalprice") ++
      column("lineitem", "l_extendedprice") ++
      column("customer", "c_acctbal")
    val expected = obs.groupBy(_._1).toSeq.flatMap { case (cn, xs) =>
      val total = xs.map(_._3).sum
      val rows = xs.map { case (_, d, n) =>
        (cn, d, n, 1000L * n / total, exp(d))
      }
      val chi2 = rows.map { case (_, _, _, opm, epm) =>
        (opm - epm) * (opm - epm) / epm
      }.sum
      rows.map { case (c, d, n, opm, epm) => (c, d, n, opm, epm, chi2) }
    }.sortBy(x => (x._1, x._2))
    val got = operators.ProfileQueries.q170BenfordAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // per-column observed shares sum to ~1000‰ (truncation loses ≤ 9)
    got.groupBy(_._1).foreach { case (_, xs) =>
      val s = xs.map(_._4).sum
      assert(s >= 991L && s <= 1000L)
    }
  }

  // --- q171 ----------------------------------------------------------

  test("q171 matches a sequential cardinality-estimate re-derivation") {
    def keys(table: String, c: String): Array[Long] =
      spark.read.parquet(s"$dir/$table.parquet").select(col(c).cast("long"))
        .collect().map(_.getLong(0))
    val edges = Seq(
      ("customer_orders", keys("orders", "o_custkey"),
        keys("customer", "c_custkey")),
      ("lineitem_orders", keys("lineitem", "l_orderkey"),
        keys("orders", "o_orderkey")),
      ("lineitem_part", keys("lineitem", "l_partkey"),
        keys("part", "p_partkey")),
      ("lineitem_supplier", keys("lineitem", "l_suppkey"),
        keys("supplier", "s_suppkey")))
    val expected = edges.map { case (name, l, r) =>
      val (nl, ndl) = (l.length.toLong, l.distinct.length.toLong)
      val (nr, ndr) = (r.length.toLong, r.distinct.length.toLong)
      val rCounts = r.groupBy(identity).map { case (k, xs) =>
        k -> xs.length.toLong
      }
      val actual = l.map(k => rCounts.getOrElse(k, 0L)).sum
      val est = nl * nr / math.max(ndl, ndr)
      (name, nl, ndl, nr, ndr, est, actual,
        1000L * est / math.max(actual, 1L))
    }.sortBy(_._1)
    val got = operators.ProfileQueries.q171JoinCardinality(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // FK edges with no orphans and uniform fan-out estimate well:
    // every err_permille within 2x either way
    got.foreach { case (_, _, _, _, _, _, _, err) =>
      assert(err >= 500L && err <= 2000L)
    }
  }

  // --- q172 ----------------------------------------------------------

  test("q172 matches the keep-policy re-derived from q36's clusters") {
    // clustering is pinned by q36's own oracle + graph tests; this pins
    // the SELECTION policy (longest text wins, doc_id tie-break) and
    // the per-source ledger independently of the window formulation.
    val comp = operators.DedupQueries.q36DedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keptIds = d.groupBy(x => comp(x._1)).values.map { xs =>
      xs.minBy { case (id, _, nc) => (-nc, id) }._1
    }.toSet
    val expected = d.groupBy(_._2).toSeq.map { case (source, xs) =>
      val dropped = xs.filterNot(x => keptIds(x._1))
      (source, xs.length.toLong, (xs.length - dropped.length).toLong,
        dropped.length.toLong, 1000L * dropped.length / xs.length,
        dropped.map(_._3).sum)
    }.sortBy(_._1)
    val got = operators.DedupQueries.q172CanonicalSelect(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // exactly one keeper per cluster, population conserved
    assert(got.map(_._3).sum == comp.values.toSet.size.toLong)
    assert(got.map(_._2).sum == d.length.toLong)
  }

  // --- q173 ----------------------------------------------------------

  test("q173 matches a sequential interleaving re-derivation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = d.length.toLong
    val tiers = d.sortBy { case (id, nc) => (nc, id) }.zipWithIndex
      .map { case ((id, nc), i) => (id, nc, 4L * i / n) }
    val expected = tiers.groupBy(_._3).toSeq.flatMap { case (tier, xs) =>
      xs.sortBy { case (id, _, _) => (md5Long60Local(id.toString), id) }
        .zipWithIndex.map { case ((id, nc, _), rt) =>
          (rt.toLong * 4L + tier, tier, id, nc)
        }
    }.filter(_._1 < 48L).sortBy(_._1)
    val got = operators.SamplingQueries.q173CurriculumSchedule(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // every 4-slot window carries one document from each tier
    got.grouped(4).foreach { w =>
      if (w.length == 4) assert(w.map(_._2).toSet == Set(0L, 1L, 2L, 3L))
    }
  }

  // --- q174 ----------------------------------------------------------

  test("q174 matches a sequential chi-square re-derivation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = d.groupBy(identity).map { case ((s, l), xs) =>
      (s, l, xs.length.toLong)
    }.toSeq
    val rowT = cells.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._3).sum
    }
    val colT = cells.groupBy(_._2).map { case (l, xs) =>
      l -> xs.map(_._3).sum
    }
    val grand = d.length.toLong
    val scored = cells.map { case (s, l, n) =>
      val e = 1000L * rowT(s) * colT(l) / grand
      val c = (1000L * n - e) * (1000L * n - e) / (1000L * e)
      (s, l, n, e, c)
    }
    val chi2 = scored.map(_._5).sum
    val dof = (rowT.size - 1).toLong * (colT.size - 1).toLong
    val expected = scored.map { case (s, l, n, e, c) =>
      (s, l, n, e, c, chi2, dof)
    }.sortBy(x => (x._1, x._2))
    val got = operators.ProfileQueries.q174ChiSquare(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // expected masses reconstruct the grand total within truncation
    val eSum = got.map(_._4).sum / 1000L
    assert(math.abs(eSum - grand) <= got.length.toLong)
  }

  // --- q175 ----------------------------------------------------------

  test("q175 matches a sequential data-card re-derivation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))
    val expected = d.groupBy(_._2).toSeq.map { case (source, xs) =>
      val n = xs.length.toLong
      val chars = xs.map(_._4).sum
      val langs = xs.map(_._3).distinct.length.toLong
      val (topLang, topN) = xs.groupBy(_._3).toSeq
        .map { case (l, ys) => (l, ys.length.toLong) }
        .minBy { case (l, c) => (-c, l) }
      val distinctTexts = xs.map(_._5).distinct.length.toLong
      val buckets = xs.map(x => md5Long60Local(x._1.toString) % 100L)
      (source, n, chars, chars / n, langs, topLang, 1000L * topN / n,
        1000L * (n - distinctTexts) / n,
        1000L * buckets.count(_ < 80L) / n,
        1000L * buckets.count(b => b >= 80L && b < 90L) / n,
        1000L * buckets.count(_ >= 90L) / n)
    }.sortBy(_._1)
    val got = operators.ProfileQueries.q175DataCard(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10))).toSeq
    assert(got == expected)
    // split shares cover the corpus (truncation loses < 3‰ per source)
    got.foreach { case (_, _, _, _, _, _, _, _, tr, va, te) =>
      assert(tr + va + te >= 997L && tr + va + te <= 1000L)
    }
  }

  // --- q176 / q177 ----------------------------------------------------

  private def dailyByType(): Map[String, Seq[(Long, Long)]] = {
    val ev = Tables(spark, dir).events
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val mn = ev.map(_._2).min
    ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.groupBy(x => (x._2 - mn) / 86400000000L).toSeq
        .map { case (d, ys) => (d, ys.length.toLong) }.sortBy(_._1)
    }
  }

  test("q176 matches a sequential Theil-Sen re-derivation") {
    val expected = dailyByType().toSeq.map { case (t, days) =>
      val slopes = (for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield 1000L * (days(j)._2 - days(i)._2) / (days(j)._1 - days(i)._1))
        .sorted
      val med = slopes((slopes.length + 1) / 2 - 1)
      (t, med, slopes.length.toLong, slopes.min, slopes.max)
    }.sortBy(_._1)
    val got = operators.TemporalQueries.q176TheilSen(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the median trend always lies within the slope envelope
    got.foreach { case (_, med, _, mn, mx) =>
      assert(med >= mn && med <= mx)
    }
  }

  test("q177 matches a sequential CUSUM re-derivation") {
    val expected = dailyByType().toSeq.map { case (t, days) =>
      val nDays = days.length.toLong
      val total = days.map(_._2).sum
      var acc = 0L
      val cs = days.map { case (d, n) =>
        acc += nDays * n - total
        (d, acc)
      }
      val (cpDay, peak) = cs.minBy { case (d, c) => (-math.abs(c), d) }
      (t, nDays, total, cpDay, math.abs(peak))
    }.sortBy(_._1)
    val got = operators.TemporalQueries.q177CusumChangepoint(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // CUSUM telescopes to zero: the peak is a genuine interior extreme
    expected.foreach { case (_, n, _, cp, _) => assert(cp < n) }
  }

  // --- q178 ----------------------------------------------------------

  test("q178 matches a sequential Neyman-allocation re-derivation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = d.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(x => x._2 * x._2).sum
      val sd = math.floor(math.sqrt(
        ((n * sxx - sx * sx) / (n * n)).toDouble)).toLong
      (lang, n, sd)
    }.sortBy(_._1)
    val totW = strata.map(x => x._2 * x._3).sum
    val totN = strata.map(_._2).sum
    val expected = strata.map { case (lang, n, sd) =>
      val ney = 10000L * n * sd / totW
      val prop = 10000L * n / totN
      (lang, n, sd, ney, prop, 1000L * ney / math.max(prop, 1L))
    }
    val got = operators.SamplingQueries.q178NeymanAllocation(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // both designs spend at most the budget (truncation undershoots)
    assert(got.map(_._4).sum <= 10000L && got.map(_._5).sum <= 10000L)
  }

  // --- q179 ----------------------------------------------------------

  test("q179 matches a sequential cascade re-derivation") {
    def col2(t: String, a: String, b: String): Array[(Long, Long)] =
      spark.read.parquet(s"$dir/$t.parquet")
        .select(col(a).cast("long"), col(b).cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val orders = col2("orders", "o_orderkey", "o_custkey")
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long")).collect().map(_.getLong(0))
    val tomb = cust.filter(k => md5Long60Local(k.toString) % 100L < 5L).toSet
    val oHit = orders.filter(o => tomb(o._2)).map(_._1).toSet
    val lHit = items.count(oHit)
    val expected = Seq(
      ("customer", cust.length.toLong, tomb.size.toLong),
      ("lineitem", items.length.toLong, lHit.toLong),
      ("orders", orders.length.toLong, oHit.size.toLong))
      .map { case (t, n, del) => (t, n, del, 1000L * del / n) }
    val got = operators.ProfileQueries.q179DeletionCascade(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the hash slice lands near its 5% design point at this sf
    val custRow = got.find(_._1 == "customer").get
    assert(custRow._4 >= 10L && custRow._4 <= 120L)
  }

  // --- q180 ----------------------------------------------------------

  test("q180 matches a sequential decay-profile re-derivation") {
    val d = docs().map(_._4).filter(_ > 0L)
    val buckets = d.groupBy(x =>
      java.lang.Long.toBinaryString(x).length.toLong).toSeq
      .map { case (b, xs) => (b, xs.length.toLong) }.sortBy(_._1)
    val total = d.length.toLong
    val expected = buckets.zipWithIndex.map { case ((b, n), i) =>
      val ratio = if (i == 0) -1L else 1000L * n / buckets(i - 1)._2
      (b, n, 1000L * n / total, ratio)
    }
    val got = operators.TextQueries.q180LengthDecay(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == expected)
    // octaves are contiguous-ish and shares cover the corpus
    assert(got.map(_._3).sum >= 1000L - got.length && got.map(_._3).sum <= 1000L)
  }

  // --- q181 ----------------------------------------------------------

  test("q181 matches a sequential MRR/nDCG re-derivation") {
    import functions.VectorFunctions.planeComponentLocal
    val v = vecs()
    val emb = v.toMap
    def cell(x: Array[Float]): Long =
      (0 until 6).map { p =>
        val proj = x.indices.foldLeft(0.0d)((acc, i) =>
          acc + x(i).toDouble * planeComponentLocal(p, i))
        if (proj > 0) 1L << p else 0L
      }.sum
    val disc = Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L,
      333333L, 315464L, 301029L, 289064L)
    val idcg = disc.sum
    val expected = (0L until 8L).map { qid =>
      val qe = emb(qid)
      def ranked(pool: Seq[(Long, Array[Float])]) =
        pool.filter(_._1 != qid)
          .map { case (id, x) => (id, dot(x, qe)) }
          .sortBy { case (id, s) => (-s, id) }
      val truth = ranked(v.toSeq).take(10).map(_._1).toSet
      val qCell = cell(qe)
      val sys = ranked(v.toSeq.filter(x => cell(x._2) == qCell)).take(10)
        .map(_._1)
      val hits = sys.zipWithIndex.filter { case (id, _) => truth(id) }
      val dcg = hits.map { case (_, i) => disc(i) }.sum
      val rr = hits.headOption.map(h => 1000000L / (h._2 + 1)).getOrElse(0L)
      (qid, sys.length.toLong, hits.length.toLong, rr, dcg,
        1000L * dcg / idcg)
    }
    val got = operators.VectorQueries.q181RetrievalEval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // nDCG is bounded and zero exactly when nothing relevant surfaced
    got.foreach { case (_, _, h, rr, _, nd) =>
      assert(nd >= 0L && nd <= 1000L)
      assert((h == 0L) == (rr == 0L))
    }
  }

  // --- q182 ----------------------------------------------------------

  test("q182 matches a sequential kNN-vote re-derivation") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2).toLong))
    val emb = rows.map(x => x._1 -> x._2).toMap
    val lbl = rows.map(x => x._1 -> x._3).toMap
    val preds = (0L until 32L).map { qid =>
      val qe = emb(qid)
      val top5 = rows.filter(_._1 != qid)
        .map { case (id, x, _) => (id, dot(x, qe)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, _) => lbl(id) }
      val pred = top5.groupBy(identity).toSeq
        .map { case (l, xs) => (l, xs.length) }
        .minBy { case (l, c) => (-c, l) }._1
      (lbl(qid), pred)
    }
    val expected = preds.groupBy(_._1).toSeq.map { case (t, xs) =>
      val correct = xs.count(x => x._2 == x._1).toLong
      (t, xs.length.toLong, correct, 1000L * correct / xs.length)
    }.sortBy(_._1)
    val got = operators.VectorQueries.q182KnnLabelEval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the eval covers all 32 queries exactly once
    assert(got.map(_._2).sum == 32L)
  }

  // --- q183 ----------------------------------------------------------

  test("q183 matches a sequential dup-spectrum re-derivation") {
    val texts = docs().map(_._2)
    val sizes = texts.groupBy(identity).values.map(_.length.toLong).toSeq
    val total = texts.length.toLong
    val expected = sizes.groupBy(identity).toSeq.map { case (s, xs) =>
      (s, xs.length.toLong, s * xs.length, 1000L * s * xs.length / total)
    }.sortBy(_._1)
    val got = operators.DedupQueries.q183DupSpectrum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the spectrum partitions the corpus
    assert(got.map(_._3).sum == total)
  }

  // --- q184 ----------------------------------------------------------

  test("q184 matches a sequential readability re-derivation") {
    val sentRe = "[.!?]+".r
    val syllRe = "[aeiouyAEIOUY]+".r
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = d.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((lang, source), xs) =>
        val words = xs.map(x => toks(x._3).length.toLong).sum
        val sents = xs.map(x =>
          math.max(sentRe.findAllIn(x._3).length, 1).toLong).sum
        val sylls = xs.map(x => syllRe.findAllIn(x._3).length.toLong).sum
        val wps = 1000L * words / sents
        val spw = 1000L * sylls / math.max(words, 1L)
        (lang, source, xs.length.toLong, wps, spw,
          206835L - 1015L * wps / 1000L - 84600L * spw / 1000L)
      }.sortBy(x => (x._1, x._2))
    val got = operators.TextQueries.q184Readability(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  // --- q185 ----------------------------------------------------------

  test("q185 executes exactly the q178 quotas with a reproducible draw") {
    val quotas = operators.SamplingQueries.q178NeymanAllocation(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = d.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val coins = xs.map(x => md5Long60Local(x._2.toString) -> x._2)
        .sortBy { case (c, id) => (c, id) }
      val take = coins.take(math.min(quotas(lang), xs.length.toLong).toInt)
      (lang, quotas(lang), take.length.toLong,
        take.map(_._1).foldLeft(0L)(_ ^ _))
    }.sortBy(_._1)
    val got = operators.SamplingQueries.q185QuotaSample(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // --- q186 ----------------------------------------------------------

  test("q186 matches a sequential anisotropy re-derivation") {
    val v = vecs()
    val dims = v.head._2.length
    val stats = (0 until dims).map { d =>
      val fx = v.map(x => math.floor(x._2(d).toDouble * 1024.0d).toLong)
      val n = fx.length.toLong
      val sx = fx.sum
      val sxx = fx.map(x => x * x).sum
      (d.toLong, n, sx / n, (n * sxx - sx * sx) / (n * n))
    }
    val aniso = 1000L * stats.map(_._4).max /
      math.max(stats.map(_._4).min, 1L)
    val expected = stats.map { case (d, n, m, vv) => (d, n, m, vv, aniso) }
    val got = operators.VectorQueries.q186Anisotropy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // variances are nonnegative by Cauchy-Schwarz
    got.foreach { case (_, _, _, vv, _) => assert(vv >= 0L) }
  }

  // --- q187 ----------------------------------------------------------

  test("q187 matches a sequential weighted-percentile re-derivation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = d.groupBy(_._1).toSeq.map { case (source, xs) =>
      val sorted = xs.sortBy { case (_, id, nc) => (nc, id) }
      val tw = sorted.map(_._3).sum
      val cum = sorted.scanLeft(0L)(_ + _._3).tail
      def q(pm: Long): Long =
        sorted(cum.indexWhere(c => 1000L * c >= pm * tw))._3
      (source, xs.length.toLong, tw, q(500), q(900), q(990))
    }.sortBy(_._1)
    val got = operators.ProfileQueries.q187WeightedPercentiles(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // weighted percentiles are monotone and ≥ the unweighted median
    got.foreach { case (_, _, _, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  // --- q188 ----------------------------------------------------------

  test("q188 matches a sequential autocorrelation re-derivation") {
    val expected = dailyByType().toSeq.map { case (t, days) =>
      val nDays = days.length.toLong
      val total = days.map(_._2).sum
      val dev = days.map { case (d, n) => (d, nDays * n - total) }
      val den = dev.map(x => x._2 * x._2).sum
      def r(k: Int): Long = {
        val byDay = dev.toMap
        val num = dev.flatMap { case (d, v) =>
          byDay.get(d + k).map(v2 => v * v2)
        }.sum
        1000L * num / den
      }
      (t, nDays, r(1), r(2), r(7))
    }.sortBy(_._1)
    val got = operators.TemporalQueries.q188Autocorrelation(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // autocorrelations live in [-1000, 1000]
    got.foreach { case (_, _, r1, r2, r7) =>
      Seq(r1, r2, r7).foreach(r => assert(r >= -1000L && r <= 1000L))
    }
  }

  // --- q189 ----------------------------------------------------------

  test("q189 matches a sequential k-fold re-derivation") {
    val ev = Tables(spark, dir).events.select("user_id").collect()
      .map(_.getLong(0))
    val perUser = ev.groupBy(identity).toSeq.map { case (u, xs) =>
      (md5Long60Local(u.toString) % 5L, xs.length.toLong)
    }
    val folds = perUser.groupBy(_._1).toSeq.map { case (f, xs) =>
      (f, xs.length.toLong, xs.map(_._2).sum)
    }.sortBy(_._1)
    val (totU, totE) = (folds.map(_._2).sum, folds.map(_._3).sum)
    val shares = folds.map { case (f, nu, ne) =>
      (f, nu, ne, 1000L * nu / totU, 1000L * ne / totE)
    }
    val worst = shares.map { case (_, _, _, us, es) =>
      math.max(math.abs(us - 200L), math.abs(es - 200L))
    }.max
    val expected = shares.map { case (f, nu, ne, us, es) =>
      (f, nu, ne, us, es, worst)
    }
    val got = operators.SamplingQueries.q189KfoldAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // every user lands in exactly one fold: totals conserved
    assert(got.map(_._3).sum == ev.length.toLong)
  }

  // --- q190 ----------------------------------------------------------

  test("q190 matches a sequential bot-score re-derivation") {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (u, xs) =>
      val ss = xs.map(_._2).sorted
      val gaps = ss.zip(ss.drop(1)).map { case (a, b) => b - a }
      val maxRate = ss.map(s => ss.count(t => t >= s - 600 && t <= s)).max
      val (n, sd, sdd) =
        (gaps.length.toLong, gaps.sum, gaps.map(g => g * g).sum)
      val cv2 = if (n >= 2 && sd > 0)
        Some(1000L * (n * sdd - sd * sd) / (sd * sd)) else None
      (u, ss.length.toLong, maxRate.toLong, cv2)
    }
    val vols = perUser.map(_._2).sorted
    val median = vols((vols.length + 1) / 2 - 1)
    val masks = perUser.map { case (_, nEv, rate, cv2) =>
      val m = (if (rate >= 3L) 1L else 0L) +
        (if (cv2.exists(_ < 100L)) 2L else 0L) +
        (if (nEv > 4L * median) 4L else 0L)
      (m, nEv, rate)
    }
    val expected = masks.groupBy(_._1).toSeq.map { case (m, xs) =>
      (m, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).max)
    }.sortBy(_._1)
    val got = operators.TemporalQueries.q190BotScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the census covers every user exactly once
    assert(got.map(_._2).sum == perUser.length.toLong)
  }

  // --- q191 ----------------------------------------------------------

  test("q191 matches a sequential nprobe-curve re-derivation") {
    import functions.VectorFunctions.planeComponentLocal
    val v = vecs()
    val emb = v.toMap
    def proj(x: Array[Float], p: Int): Double =
      x.indices.foldLeft(0.0d)((acc, i) =>
        acc + x(i).toDouble * planeComponentLocal(p, i))
    def cell(x: Array[Float]): Long =
      (0 until 6).map(p => if (proj(x, p) > 0) 1L << p else 0L).sum
    val cellOf = v.map(x => x._1 -> cell(x._2)).toMap
    val nprobes = Seq(1L, 2L, 4L, 8L)
    val perQ = for (qid <- 0L until 8L; np <- nprobes) yield {
      val qe = emb(qid)
      val truth = v.filter(_._1 != qid)
        .map { case (id, x) => (id, dot(x, qe)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val ms = (0 until 6).map(p => proj(qe, p))
      val masks = (0L until 64L).map { m =>
        val c = (0 until 6).map(p =>
          if (((m >> p) & 1L) == 1L) math.abs(ms(p)) else 0.0d).sum
        (c, m)
      }.sortBy(identity).take(np.toInt)
        .map { case (_, m) => cellOf(qid) ^ m }.toSet
      val pool = v.filter(x => x._1 != qid && masks(cellOf(x._1)))
      val sys = pool.map { case (id, x) => (id, dot(x, qe)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      val hits = sys.count(truth).toLong
      (np, pool.length.toLong, 1000L * hits / 10L)
    }
    val expected = perQ.groupBy(_._1).toSeq.map { case (np, xs) =>
      (np, xs.length.toLong, xs.map(_._3).sum / xs.length,
        xs.map(_._2).sum / xs.length)
    }.sortBy(_._1)
    val got = operators.VectorQueries.q191NprobeCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // recall and pool are monotone non-decreasing in nprobe
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.map(_._4) == got.map(_._4).sorted)
  }

  // --- q192 ----------------------------------------------------------

  test("q192 matches a sequential OOV-drift re-derivation") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val histCounts = d.filter(_._1 % 10L != 0L)
      .flatMap(x => toks(x._3)).groupBy(identity).toSeq
      .map { case (w, xs) => (w, xs.length.toLong) }
    val vocab = histCounts.sortBy { case (w, c) => (-c, w) }
      .take(4000).map(_._1).toSet
    val expected = d.filter(_._1 % 10L == 0L)
      .flatMap(x => toks(x._3).map(w => (x._2, w)))
      .groupBy(_._1).toSeq.map { case (source, xs) =>
        val oov = xs.filterNot(x => vocab(x._2))
        (source, xs.length.toLong, oov.length.toLong,
          1000L * oov.length / xs.length,
          oov.map(_._2).distinct.length.toLong)
      }.sortBy(_._1)
    val got = operators.TextQueries.q192OovDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // OOV share stays a per-mille; new types never exceed OOV tokens
    got.foreach { case (_, _, oovT, pm, newT) =>
      assert(pm >= 0L && pm <= 1000L && newT <= oovT)
    }
  }

  // --- q193 ----------------------------------------------------------

  test("q193 matches a sequential seed-and-chain re-derivation") {
    val d = docs()
    val grams = d.flatMap { case (id, text, _, _) =>
      val t = toks(text)
      if (t.length < 8) Nil
      else (0 to t.length - 8).map(i => (t.slice(i, i + 8).mkString(" "), id, i))
    }
    val seeds = grams.groupBy(_._1).valuesIterator.flatMap { arr =>
      val xs = arr.toSeq
      for (a <- xs; b <- xs; if a._2 < b._2)
        yield (a._2, b._2, a._3, a._3 - b._3)
    }.toSeq
    val runs = seeds.groupBy(x => (x._1, x._2, x._4)).toSeq
      .flatMap { case ((a, b, dg), xs) =>
        val is = xs.map(_._3).sorted
        val islands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var start = is.head
        var prev = is.head
        for (i <- is.tail) {
          if (i != prev + 1) { islands += ((start, prev - start + 1)); start = i }
          prev = i
        }
        islands += ((start, prev - start + 1))
        islands.map { case (sa, len) => (a, b, len + 7, sa, sa - dg) }
      }
    val expected = runs.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((a, b), xs) =>
        val best = xs.maxBy(x => (x._3, -x._4, -x._5))
        (a, b, best._3.toLong, xs.count(_._3 >= 12).toLong, best._4, best._5)
      }
      .filter(_._3 >= 12L).sortBy(x => (-x._3, x._1, x._2)).take(50)
    val got = operators.DedupQueries.q193SubstringDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(got == expected)
    // a chained span is at least the seed length and fits both docs
    val nTok = d.map(x => (x._1, toks(x._2).length)).toMap
    got.foreach { case (a, b, span, nLong, sa, sb) =>
      assert(span >= 12L && nLong >= 1L)
      assert(sa + span <= nTok(a) && sb + span <= nTok(b))
    }
  }

  test("q193 df-gate: hot grams dropped before the self-join, cold spans " +
    "survive exactly (certified lower bound)") {
    import spark.implicits._
    // 80 docs share one 50-token boilerplate span (each of its 43
    // positional 8-grams has df = 80 > cap 64); docs 0 and 1 ALSO share
    // a 20-token rare span. The gate must kill every boilerplate seed
    // and keep every rare seed.
    val boiler = (1 to 50).map(i => s"bp$i").mkString(" ")
    val rare = (1 to 20).map(i => s"rare$i").mkString(" ")
    val rows = (0L until 80L).map { id =>
      val pad = (1 to 10).map(i => s"u${id}x$i").mkString(" ")
      val text = if (id <= 1) s"$pad $boiler $rare" else s"$pad $boiler"
      (id, text)
    }
    val docs = rows.toDF("doc_id", "text")
    val cap = operators.DedupQueries.Q193MaxSeedDf
    val ungated = operators.DedupQueries.q193Grams(docs, 0)
    val gated = operators.DedupQueries.q193Grams(docs, cap)
    val dfByHash = ungated.groupBy("h").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dfByHash.values.max >= 80L, "boilerplate grams must be hot")
    // the gate keeps exactly the df <= cap postings
    val keptHashes = gated.select("h").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(keptHashes == dfByHash.filter(_._2 <= cap).keySet)
    // per-key join density is bounded at cap² after the gate...
    def seeds(g: org.apache.spark.sql.DataFrame) = g.as("a")
      .join(g.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .count()
    val hotPairs = 43L * 80L * 79L / 2L // 43 boilerplate grams × C(80,2)
    assert(seeds(ungated) >= hotPairs, "ungated join is quadratic in df")
    assert(seeds(gated) < 43L * cap.toLong * cap.toLong,
      "gated join must stay under cap² per hot gram")
    // ...and the rare span still chains to its full length: the capped
    // pipeline is a LOWER BOUND that loses only ubiquitous-gram spans
    val g = gated
    val diag = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id", "b_id", "d").orderBy("i")
    val best = g.as("a").join(g.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.pos").as("i"), (col("a.pos") - col("b.pos")).as("d"))
      .withColumn("grp", col("i") - row_number().over(diag))
      .groupBy("a_id", "b_id", "d", "grp")
      .agg((count(lit(1)) + 7L).as("span"))
      .groupBy("a_id", "b_id").agg(max("span").as("max_span"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // docs 0-1: the rare 20-token span survives whole; the boilerplate
    // tail extends it only through grams that straddle into rare/pad
    // territory (df <= 2), so the reported span covers at least it
    assert(best.getOrElse((0L, 1L), 0L) >= 20L,
      s"rare span lost by the gate: $best")
    // no pair among boilerplate-only docs reports a span: every seed
    // covering the shared region is hot
    assert(!best.keySet.exists { case (a, b) => a > 1L && b > 1L },
      "boilerplate-only pairs must produce no seeds after the gate")
  }

  // --- q194 ----------------------------------------------------------

  /** Classic full-matrix edit distance — the naive reference the
    * PassJoin pigeonhole must reproduce exactly.
    */
  private def editDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var diag = dp(0)
      dp(0) = i
      for (j <- 1 to b.length) {
        val tmp = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = tmp
      }
    }
    dp(b.length)
  }

  // --- q199 ----------------------------------------------------------

  test("q199 matches a sequential power-iteration re-derivation") {
    val v = vecs().map(_._2)
    val d = v.head.length
    def matvec(x: Array[Double]): Array[Long] = {
      val y = new Array[Long](d)
      v.foreach { e =>
        var s = 0.0
        var i = 0
        while (i < d) { s += e(i).toDouble * x(i); i += 1 }
        var j = 0
        while (j < d) {
          y(j) += math.floor(e(j).toDouble * s * 1e12).toLong; j += 1
        }
      }
      y
    }
    def toX(y: Array[Long]): Array[Double] = {
      val m = y.map(math.abs).max
      y.map(_.toDouble / m.toDouble)
    }
    val y1 = matvec(Array.fill(d)(1.0))
    val x1 = toX(y1)
    val y2 = matvec(x1)
    val x2 = toX(y2)
    val y3 = matvec(x2)
    val x3 = toX(y3)
    val trace = v.map { e =>
      var s = 0.0
      e.foreach(f => s += f.toDouble * f.toDouble)
      math.floor(s * 1e12).toLong
    }.sum
    val num = x2.indices.foldLeft(0.0)((acc, j) =>
      acc + x2(j) * (y3(j).toDouble / 1e12))
    val den = x2.foldLeft(0.0)((acc, xj) => acc + xj * xj)
    val expected = (0 until d).map(j => (j.toLong, x3(j), y3(j))) :+
      (-1L, num / den, trace)
    val got = operators.VectorQueries.q199PowerIteration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expected.sortBy(_._1))
    // the eigenvalue estimate is positive and bounded by the trace
    val ray = got.head._2
    assert(ray > 0.0 && ray * 1e12 <= trace.toDouble)
  }

  // --- q198 ----------------------------------------------------------

  test("q198 matches a sequential KS re-derivation") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    val xs = rows.map(_._2).distinct.sorted
    val expected = rows.groupBy(_._1).toSeq.map { case (src, docs) =>
      val ns = docs.length.toLong
      val nr = n - ns
      val dmax = xs.map { x =>
        val cs = docs.count(_._2 <= x).toLong
        val ca = rows.count(_._2 <= x).toLong
        math.abs(cs * nr - (ca - cs) * ns)
      }.max
      val ks = 1000L * dmax / (ns * nr)
      val crit = math.floor(1358.0 *
        math.sqrt(n.toDouble / (ns.toDouble * nr.toDouble))).toLong
      (src, ns, ks, crit, if (ks > crit) 1L else 0L)
    }.sortBy(_._1)
    val got = operators.ProfileQueries.q198KsDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    got.foreach { case (_, _, ks, crit, _) =>
      assert(ks >= 0L && ks <= 1000L && crit > 0L)
    }
  }

  // --- q197 ----------------------------------------------------------

  test("q197 matches a sequential histogram-truncation re-derivation") {
    val allStop = functions.TextFunctions.stopwords
      .flatMap(_._2).distinct.toSet
    def quality(text: String): Double = {
      val nChars = text.length.toDouble
      val t = toks(text)
      val nToks = t.length.toDouble
      val alpha = text.count(_.isLetter).toDouble
      val stopHits = toks(text.toLowerCase).count(allStop).toDouble
      val lenScore = math.min(nChars / 500.0, 1.0)
      val alphaScore = if (nChars > 0) alpha / nChars else 0.0
      val stopScore = if (nToks > 0) math.min(stopHits * 5.0 / nToks, 1.0) else 0.0
      val wordScore = math.min((if (nToks > 0) alpha / nToks else 0.0) / 8.0, 1.0)
      (lenScore + alphaScore + stopScore + wordScore) / 4.0
    }
    val rows = docs().map { case (_, text, _, _) => text }
    val srcs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val scored = srcs.map { case (src, text) =>
      (src, toks(text).length.toLong, math.floor(quality(text) * 1000.0).toLong)
    }
    val budget = scored.map(_._2).sum / 10L
    val classes = scored.groupBy(_._3).toSeq
      .map { case (c, xs) => (c, xs.map(_._2).sum) }.sortBy(-_._1)
    val cums = classes.scanLeft(0L)(_ + _._2).tail
    val kept = classes.zip(cums).takeWhile(_._2 <= budget).map(_._1._1)
    assert(kept.nonEmpty && rows.nonEmpty)
    val cutoff = kept.min
    val sel = scored.filter(_._3 >= cutoff)
    val selTok = sel.map(_._2).sum
    val per = sel.groupBy(_._1).toSeq.map { case (src, xs) =>
      (src, xs.length.toLong, xs.map(_._2).sum, cutoff, budget)
    }
    val expected = (per.map { case (src, n, st, co, b) =>
      (src, n, st, 1000L * st / selTok, co, b)
    } :+ ("ALL", sel.length.toLong, selTok, 1000L, cutoff, budget))
      .sortBy(_._1)
    val got = operators.SamplingQueries.q197BudgetSelect(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // never over budget; shares sum close to 1000 (truncation slack)
    assert(selTok <= budget)
    val shareSum = got.filter(_._1 != "ALL").map(_._4).sum
    assert(shareSum <= 1000L && shareSum >= 1000L - got.length)
  }

  // --- q196 ----------------------------------------------------------

  test("q196 matches a sequential calibration re-derivation") {
    import graft.functions.TextFunctions.stopwords
    val d = docs()
    val scored = d.map { case (_, text, declared, _) =>
      val ts = toks(text.toLowerCase)
      val hits = stopwords.map { case (lang, ws) =>
        (lang, ts.count(ws.toSet)) }
      val mx = hits.map(_._2).max
      val predicted =
        if (mx <= 0) "und" else hits.find(_._2 == mx).map(_._1).get
      val total = hits.map(_._2).sum
      val conf = 1000L * (mx + 1) / (total + 5)
      (conf, if (predicted == declared) 1L else 0L)
    }
    val bins = scored.groupBy(_._1 / 100).toSeq.map { case (bin, xs) =>
      val n = xs.length.toLong
      val nc = xs.map(_._2).sum
      val sc = xs.map(_._1).sum
      val acc = 1000L * nc / n
      val mc = sc / n
      (bin, n, nc, sc, acc, mc, math.abs(acc - mc))
    }
    val nAll = bins.map(_._2).sum
    val allRow = (-1L, nAll, 1000L * bins.map(_._3).sum / nAll,
      bins.map(_._4).sum / nAll,
      bins.map(b => b._2 * b._7).sum / nAll)
    val expected = (bins.map(b => (b._1, b._2, b._5, b._6, b._7)) :+ allRow)
      .sortBy(_._1)
    val got = operators.TextQueries.q196Calibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    got.foreach { case (_, _, acc, conf, gap) =>
      assert(acc >= 0L && acc <= 1000L && conf >= 0L && conf <= 1000L &&
        gap <= 1000L)
    }
  }

  // --- q195 ----------------------------------------------------------

  test("q195 matches a sequential KNN-Shapley recurrence") {
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    val tests = v.filter(_._1 % 25 == 0)
    val train = v.filter(_._1 % 25 != 0)
    val n = train.length
    val scale = 1000000000L
    val perTest = tests.map { case (_, qe, ql) =>
      val ranked = train.map { case (id, e, l) => (id, dot(e, qe), l) }
        .sortBy { case (id, s, _) => (-s, id) }
      val ind = ranked.map { case (_, _, l) => if (l == ql) 1L else 0L }
      val contrib = (1 to n).map { j =>
        if (j == n) ind(j - 1) * (scale / n)
        else (ind(j - 1) - ind(j)) * (scale * math.min(5L, j) / (5L * j))
      }
      val suffix = contrib.scanRight(0L)(_ + _).init
      ranked.map(_._1).zip(suffix)
    }
    val totals = perTest.flatten.groupBy(_._1).map { case (id, xs) =>
      (id, xs.map(_._2).sum, xs.length.toLong)
    }.toSeq
    val labelOf = train.map(x => (x._1, x._3)).toMap
    val top = totals.sortBy(x => (-x._2, x._1)).take(20).map(_._1).toSet
    val bot = totals.sortBy(x => (x._2, x._1)).take(20).map(_._1).toSet
    val expected = totals
      .filter(x => top(x._1) || bot(x._1))
      .map { case (id, s, nt) =>
        (id, labelOf(id), s, nt, if (top(id)) "valuable" else "harmful")
      }.sortBy(x => (-x._3, x._1))
    val got = operators.VectorQueries.q195KnnShapley(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == expected)
    // efficiency sanity: every test's values sum to scale·(K-NN class
    // mass correctness), so any single |total| is bounded by scale·#tests
    got.foreach { case (_, _, s, nt, _) =>
      assert(math.abs(s) <= scale * nt)
    }
  }

  test("q194 matches a sequential naive edit-distance join") {
    val strs = docs().map(x => (x._1, x._2.take(40))).filter(_._2.nonEmpty)
    val expected = (for {
      a <- strs; b <- strs; if a._1 < b._1
      dist = editDist(a._2, b._2); if dist <= 2
    } yield (a._1, b._1, dist.toLong))
      .sortBy(x => (x._3, x._1, x._2)).toSeq
    val got = operators.DedupQueries.q194EditDistanceJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    got.foreach { case (a, b, dist) => assert(a < b && dist >= 0L) }
  }

  // --- q202 ----------------------------------------------------------

  test("q202 bloom gate has NO false negative: seen counts equal q201's " +
    "exact curve, and candidates bound matches from above") {
    // the contract that makes the bloom swap safe at 100 TB: every
    // eval gram is IN the bloom by construction, so a train gram equal
    // to an eval gram can never be filtered — q202's n_seen_grams must
    // be bit-identical to the exact join's, with FP >= 0 surfaced
    val exact = operators.SamplingQueries.q201NoveltyCurve(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bloom = operators.SamplingQueries.q202NoveltyBloom(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)))).toMap
    assert(bloom.keySet == exact.keySet)
    bloom.foreach { case (n, (nEval, nSeen, nCand, nFp)) =>
      assert((nEval, nSeen) == exact(n),
        s"n=$n: bloom curve diverged from the exact curve")
      assert(nFp >= 0L && nCand >= 0L)
      // matched DISTINCT candidates (cand − fp) are bounded by the
      // POSITIONAL seen count (each matched gram occurs ≥ once), and
      // zero matches ⟺ zero seen occurrences — a non-distinct cand
      // join double-counting matches fails here
      assert(nCand - nFp <= nSeen,
        s"n=$n: more matched candidates than seen occurrences")
      assert((nCand - nFp == 0L) == (nSeen == 0L),
        s"n=$n: matched/seen zero-states disagree")
    }
  }
}
