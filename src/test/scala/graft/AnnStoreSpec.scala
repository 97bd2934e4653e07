package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rag.AnnStore
import graft.store.SnapshotStore
import graft.streaming.StreamingAnn

/** The materialized ANN index: probe semantics against driver-side
  * Scala references, corpus-change invalidation, incremental
  * maintenance (LWW moves, touched-list stats, replay idempotence),
  * and the occupancy retrain trigger.
  */
class AnnStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side reference: exact top-k by cosine over a collected
    * id→vector map, restricted to `lists` when given — the algebra
    * denseSearch claims, independent of every Spark operator.
    */
  private def refTopK(vecs: Map[Long, Array[Float]], q: Array[Float],
      k: Int, keep: Long => Boolean): Seq[Long] =
    vecs.toSeq.filter(v => keep(v._1))
      .map { case (id, v) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i).toDouble * q(i).toDouble; i += 1 }
        (id, s)
      }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)

  test("exhaustive probe (nprobe = NumLists) equals exact brute-force " +
    "top-k — the IVF recall knob's upper end") {
    val all = AnnStore.assignments(spark, dir)
      .select("id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = AnnStore.vectorOf(spark, dir, 7L)
    val got = AnnStore.denseSearch(spark, dir, q, topK = 10,
      nprobe = AnnStore.NumLists, excludeId = Some(7L))
      .collect().map(_.getLong(0)).toSeq
    assert(got == refTopK(all, q, 10, _ != 7L))
  }

  test("narrow probe returns the exact top-k WITHIN the probed lists " +
    "(approximate overall, exact inside — the IVFFLAT contract)") {
    val cents = AnnStore.centroidsLocal(spark, dir)
    val q = AnnStore.vectorOf(spark, dir, 7L)
    val lists = AnnStore.probeListsOf(cents, q, 2).toSet
    val inLists = AnnStore.assignments(spark, dir)
      .filter(col("list_id").isin(lists.toSeq.map(_.asInstanceOf[Any]): _*))
      .select("id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = AnnStore.denseSearch(spark, dir, q, topK = 5, nprobe = 2,
      excludeId = Some(7L)).collect().map(_.getLong(0)).toSeq
    assert(got == refTopK(inLists, q, 5, _ != 7L))
  }

  test("filtered search: predicate composes with list pruning — exact " +
    "top-k among matching rows of the probed lists") {
    val all = AnnStore.assignments(spark, dir)
      .select("id", "embedding", "label", "list_id").collect()
    val byId = all.map(r => r.getLong(0) ->
      ((r.getSeq[Float](1).toArray, r.getInt(2),
        r.getAs[Number]("list_id").intValue))).toMap
    val q = AnnStore.vectorOf(spark, dir, 7L)
    val lists = AnnStore.probeListsOf(
      AnnStore.centroidsLocal(spark, dir), q, 8).toSet
    val got = AnnStore.denseSearch(spark, dir, q, topK = 10, nprobe = 8,
      excludeId = Some(7L), where = Some(col("label") === 3))
      .collect().map(_.getLong(0)).toSeq
    val expect = refTopK(
      byId.collect { case (id, (v, lbl, l))
        if lbl == 3 && lists.contains(l) => id -> v },
      q, 10, _ != 7L)
    assert(got == expect && got.nonEmpty)
    assert(got.forall(id => byId(id)._2 == 3))
  }

  test("stored assignments match a driver-side argmin against the " +
    "stored centroids (ties to lowest list)") {
    val cents = AnnStore.centroidsLocal(spark, dir)
    val rows = AnnStore.assignments(spark, dir)
      .select("id", "embedding", "list_id").collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val m = AnnStore.microLocal(r.getSeq[Float](1).toArray)
      val best = cents.map { case (i, c) => (AnnStore.scoreLocal(m, c), i) }
        .min._2
      assert(r.getAs[Number]("list_id").intValue == best,
        s"vector ${r.getLong(0)} stored in the wrong list")
    }
  }

  test("corpus fingerprint: changed embeddings invalidate, unchanged " +
    "reuse; the fingerprint records the list count") {
    val work = Files.createTempDirectory("graft-ann-fp")
    val src = Paths.get(dir, "embeddings.parquet")
    val dst = work.resolve("embeddings.parquet")
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      Files.list(src).forEach(p =>
        Files.copy(p, dst.resolve(p.getFileName.toString)))
    } else Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES)
    val s1 = AnnStore.ensure(spark, work.toString)
    val v1 = s1.currentVersion("ann_assignments").get
    assert(AnnStore.ensure(spark, work.toString)
      .currentVersion("ann_assignments").contains(v1))
    val root = Paths.get(sys.env.getOrElse("GRAFT_ANN_ROOT",
      Paths.get(sys.props("java.io.tmpdir"), "graft-ann").toString),
      work.toString.replaceAll("[^A-Za-z0-9._-]", "_"))
    val fp = Files.readString(root.resolve("_corpus_fingerprint")).trim
    assert(fp.contains(s":l${AnnStore.NumLists}:"),
      s"fingerprint '$fp' does not record the list count")
    val touch = if (Files.isDirectory(dst))
      Files.list(dst).findFirst().get() else dst
    Files.setLastModifiedTime(touch,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(touch).toMillis + 54321))
    assert(AnnStore.ensure(spark, work.toString)
      .currentVersion("ann_assignments").exists(_ > v1),
      "stale ANN index survived a corpus change")
  }

  /** Two tight clusters on the first axis — base all in cluster A so
    * both trained centroids land there; streamed cluster-B vectors
    * then pile into one list (skew) until retrain splits them.
    */
  private def clusteredFixture(): (SnapshotStore,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    def vec(x: Float) = Array.tabulate(4)(i => if (i == 0) x else 0.1f)
    val base = Seq(
      (0L, vec(1.00f).toSeq), (1L, vec(0.95f).toSeq),
      (2L, vec(0.90f).toSeq), (3L, vec(0.85f).toSeq))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val batch = (10L until 22L).map(i => (i, vec(-1.0f - (i - 10) * 0.01f).toSeq))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val tmp = Files.createTempDirectory("graft-ann-inc").toString
    val store = new SnapshotStore(spark, tmp)
    val cents = AnnStore.trainCentroids(base, "embedding", Seq(col("id")), 2)
    AnnStore.writeIndex(spark, store, base, cents)
    (store, base, batch)
  }

  test("incremental maintenance: LWW merge, moved vectors rewrite both " +
    "lists, touched-list stats stay exact, replay is a no-op") {
    import spark.implicits._
    val (store, _, batch) = clusteredFixture()
    StreamingAnn.processBatch(store, batch, 0L)
    // re-ingest id 10 MOVED to cluster A — its list must change and
    // both lists' counts must follow
    def vecRow(id: Long, x: Float) =
      Seq((id, Array.tabulate(4)(i => if (i == 0) x else 0.1f).toSeq))
        .toDF("id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    StreamingAnn.processBatch(store, vecRow(10L, 0.99f), 1L)
    val cents = AnnStore.centroidsOf(store.read("ann_centroids").get)
    val rows = store.read("ann_assignments").get
      .select("id", "embedding", "list_id").collect()
    assert(rows.length == 4 + 12, "LWW merge lost or duplicated ids")
    rows.foreach { r =>
      val m = AnnStore.microLocal(r.getSeq[Float](1).toArray)
      val best = cents.map { case (i, c) => (AnnStore.scoreLocal(m, c), i) }
        .min._2
      assert(r.getAs[Number]("list_id").intValue == best)
    }
    // per-list stats equal a recompute (including any zeroed list)
    val gotStats = store.read("ann_list_stats").get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = rows.groupBy(_.getAs[Number]("list_id").longValue)
      .map { case (l, rs) => l -> rs.length.toLong }
    assert(gotStats.filter(_._2 > 0) == expect)
    val st = store.read("ann_stats").get.collect()(0)
    assert(st.getAs[Long]("n_vectors") == 16L)
    // replay: every pointer stays put
    val vA = store.currentVersion("ann_assignments")
    val vS = store.currentVersion("ann_stats")
    StreamingAnn.processBatch(store, vecRow(10L, 0.99f), 1L)
    assert(store.currentVersion("ann_assignments") == vA &&
      store.currentVersion("ann_stats") == vS,
      "replayed batch mutated the index")
  }

  test("sidecar id map tracks assignments across batches (incl. a " +
    "move); the prior-list lookup partition-prunes to the keys' " +
    "buckets and never touches the assignments table") {
    import spark.implicits._
    val (store, _, batch) = clusteredFixture()
    StreamingAnn.processBatch(store, batch, 0L)
    def vecRow(id: Long, x: Float) =
      Seq((id, Array.tabulate(4)(i => if (i == 0) x else 0.1f).toSeq))
        .toDF("id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    StreamingAnn.processBatch(store, vecRow(10L, 0.99f), 1L) // a MOVE
    def pairs(t: String) = store.read(t).get.select("id", "list_id")
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).intValue)).toSet
    assert(pairs("ann_id_map") == pairs("ann_assignments"),
      "sidecar map diverged from the assignments after a moved vector")
    // the lookup plan: partition filter on id_bucket, and the ONLY
    // file scans are of the sidecar map — O(touched buckets), the
    // contract that keeps per-batch maintenance off the corpus table
    val probe = AnnStore.priorListRows(store, Seq(10L, 11L).toDF("id"))
    probe.collect() // finalize the adaptive plan
    def go(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          go(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          go(q.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    val scans = go(probe.queryExecution.executedPlan)
    assert(scans.nonEmpty && scans.forall(f =>
      f.relation.location.rootPaths.exists(_.toString.contains("ann_id_map"))),
      s"prior-list lookup reads beyond the sidecar map:\n" +
        s"${probe.queryExecution.executedPlan}")
    assert(scans.forall(_.partitionFilters.nonEmpty),
      s"prior-list lookup does not prune id buckets:\n" +
        s"${probe.queryExecution.executedPlan}")
  }

  test("ANN deletion: tombstoned vectors vanish from assignments + id " +
    "map; a fully drained list gets an explicit zero occupancy") {
    import spark.implicits._
    val (store, _, batch) = clusteredFixture()
    StreamingAnn.processBatch(store, batch, 0L) // 4 base + 12 streamed
    // tombstone EVERY member of the fuller list (drains it) plus one
    // vector of the other: the drained list must get an explicit 0
    val byList = store.read("ann_assignments").get
      .select("id", "list_id").collect()
      .groupBy(_.getAs[Number]("list_id").intValue)
      .map { case (l, rs) => l -> rs.map(_.getLong(0)).toSet }
    val (fullList, fullIds) = byList.maxBy(_._2.size)
    val otherIds = byList.removed(fullList).values.flatten.toSet
    val victims = (fullIds + otherIds.min).toSeq.sorted
    graft.streaming.IndexDeletes.deleteFromAnn(store,
      victims.toDF("id"))
    val left = store.read("ann_assignments").get
      .select("id").collect().map(_.getLong(0)).toSet
    assert(left == otherIds - otherIds.min, s"wrong survivors: $left")
    assert(store.read("ann_id_map").get
      .select("id").collect().map(_.getLong(0)).toSet == left)
    val nLeft = left.size.toLong
    val stats = store.read("ann_list_stats").get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats.values.sum == nLeft, s"list stats did not follow: $stats")
    assert(stats.get(fullList.toLong).contains(0L),
      s"the drained list kept a stale occupancy count: $stats")
    assert(store.read("ann_stats").get.collect()(0)
      .getAs[Long]("n_vectors") == nLeft)
    // re-delete: content-neutral
    graft.streaming.IndexDeletes.deleteFromAnn(store, victims.toDF("id"))
    assert(store.read("ann_assignments").get.count() == nLeft)
  }

  test("occupancy skew flags needs_retrain; retrain rewrites a " +
    "self-consistent index over the same vectors") {
    val (store, _, batch) = clusteredFixture()
    // both centroids sit in cluster A, so 12 cluster-B vectors land in
    // ONE list: max 12+? of 16 total → skew ≥ 12*2000/16 = 1500
    StreamingAnn.processBatch(store, batch, 0L, retrainSkewX1000 = 1400L)
    assert(StreamingAnn.needsRetrain(store),
      "lopsided occupancy did not flag a retrain")
    val vC = store.currentVersion("ann_centroids").get
    StreamingAnn.retrain(spark, store, lists = 2)
    assert(store.currentVersion("ann_centroids").exists(_ > vC))
    // rewritten index is audit-consistent: stored == argmin vs NEW
    // centroids, same vector set
    val cents = AnnStore.centroidsOf(store.read("ann_centroids").get)
    val rows = store.read("ann_assignments").get
      .select("id", "embedding", "list_id").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val m = AnnStore.microLocal(r.getSeq[Float](1).toArray)
      val best = cents.map { case (i, c) => (AnnStore.scoreLocal(m, c), i) }
        .min._2
      assert(r.getAs[Number]("list_id").intValue == best)
    }
    // the two tight clusters now split across the two lists, so the
    // retrained layout is balanced again (4 vs 12 of 16: skew 1500 →
    // the A/B split puts 12 B-vectors in one list and 4 A in the
    // other; with lists=2 the mean is 8, max 12 → 1500 exactly — use
    // the stats row recomputed by retrain's writeIndex)
    val skew = store.read("ann_stats").get.collect()(0)
      .getAs[Long]("skew_x1000")
    assert(skew == 1500L)
  }

  test("adaptive filtered probe widens until k survivors: exactly k " +
    "results whenever >= k matches exist corpus-wide, nprobe_used " +
    "records the rung — the fixed-width knob returns fewer") {
    val q = AnnStore.vectorOf(spark, dir, 7L)
    val cents = AnnStore.centroidsLocal(spark, dir)
    val firstList = AnnStore.probeListsOf(cents, q, 1).head
    // 5 target ids from 5 DIFFERENT lists, none in the query's nearest
    // list — a predicate selective enough that the start rung finds 0
    val byList = AnnStore.assignments(spark, dir)
      .select("id", "list_id").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue))
      .filter(_._1 != 7L)
      .groupBy(_._2).map { case (l, rs) => l -> rs.map(_._1).min }
    val targets = byList.filter(_._1 != firstList).values.toSeq.sorted.take(5)
    assert(targets.size == 5, "fixture needs 5 populated non-first lists")
    val pred = col("id").isin(targets: _*)
    val got = AnnStore.denseSearchAdaptive(spark, dir, q, topK = 5,
      startNprobe = 1, excludeId = Some(7L), where = Some(pred)).collect()
    assert(got.length == 5, "adaptive probe returned fewer than k matches")
    assert(got.map(_.getLong(0)).toSet == targets.toSet)
    assert(got.head.getLong(2) > 1L, "the loop never widened")
    val fixed = AnnStore.denseSearch(spark, dir, q, topK = 5, nprobe = 1,
      excludeId = Some(7L), where = Some(pred)).count()
    assert(fixed < 5, "fixture predicate is not selective at the start rung")
    // hybrid twin: both legs widen together until the fused frame
    // holds k docs (the dense leg's exhaustive rung covers the corpus)
    val hybrid = graft.search.HybridSearch.hybridSearchAdaptive(spark, dir,
      Seq("vector"), q, topK = 5, legK = 5, nprobe = 1,
      excludeId = Some(7L), where = Some(pred)).collect()
    assert(hybrid.length == 5,
      "adaptive hybrid returned fewer than k fused matches")
    assert(hybrid.map(_.getLong(0)).toSet == targets.toSet)
  }

  test("interleaved maintenance/deletion fuzz: after any seeded mix of " +
    "vector upserts and tombstone deletes, the stored ANN index equals " +
    "the mirrored survivor state (assignments, id map, stats)") {
    import spark.implicits._
    for (seed <- Seq(3, 11, 59)) {
      val rng = new scala.util.Random(seed)
      val (store, _, _) = clusteredFixture()
      // mirror of live vectors (id → first component; others fixed)
      val mirror = scala.collection.mutable.Map.empty[Long, Float]
      def vecsDf(rows: Seq[(Long, Float)]) = rows
        .map { case (id, x) =>
          (id, Array.tabulate(4)(i => if (i == 0) x else 0.1f).toSeq) }
        .toDF("id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      var batchId = 5000L + seed * 100L
      for (_ <- 1 to 6) {
        if (rng.nextInt(3) < 2 || mirror.isEmpty) {
          // upsert 1-4 vectors over a small id space: re-ingests and
          // cross-list MOVES occur across rounds (x flips sign)
          val batch = Seq.fill(1 + rng.nextInt(4))(
            (rng.nextInt(6).toLong + 30L,
              (rng.nextFloat() * 2f - 1f))).distinctBy(_._1)
          StreamingAnn.processBatch(store, vecsDf(batch), batchId)
          batchId += 1
          batch.foreach { case (id, x) => mirror(id) = x }
        } else {
          val victims = mirror.keys.toSeq.sorted.filter(_ => rng.nextBoolean())
          graft.streaming.IndexDeletes.deleteFromAnn(store,
            victims.toDF("id"))
          victims.foreach(mirror.remove)
        }
      }
      val cents = AnnStore.centroidsOf(store.read("ann_centroids").get)
      def argmin(x: Float) = {
        val m = AnnStore.microLocal(
          Array.tabulate(4)(i => if (i == 0) x else 0.1f))
        cents.map { case (i, c) => (AnnStore.scoreLocal(m, c), i) }.min._2
      }
      // the fixture's 4 base vectors (ids 0-3) are never touched
      val expect = mirror.toMap.map { case (id, x) => id -> argmin(x) } ++
        Map(0L -> argmin(1.00f), 1L -> argmin(0.95f),
          2L -> argmin(0.90f), 3L -> argmin(0.85f))
      def pairs(t: String) = store.read(t).get.select("id", "list_id")
        .collect().map(r => (r.getLong(0), r.getAs[Number](1).intValue)).toMap
      assert(pairs("ann_assignments") == expect,
        s"seed $seed: assignments diverged from the mirror")
      assert(pairs("ann_id_map") == expect,
        s"seed $seed: id map diverged from the assignments")
      // stats: totals equal the mirror; per-list counts equal a recount
      assert(store.read("ann_stats").get.collect()(0)
        .getAs[Long]("n_vectors") == expect.size.toLong,
        s"seed $seed: n_vectors diverged")
      val counted = expect.values.groupBy(identity)
        .map { case (l, vs) => l.toLong -> vs.size.toLong }
      val stored = store.read("ann_list_stats").get.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap.filter(_._2 > 0)
      assert(stored == counted, s"seed $seed: list stats diverged")
    }
  }

  test("compaction cadence bounds the file piles a long-lived " +
    "maintenance stream leaves in hot list partitions") {
    import spark.implicits._
    // a WIDE batch (many rows landing in the same hot list): every
    // writer task with rows for a touched hive partition writes its
    // own file there — the realistic multi-executor merge shape. AQE's
    // partition coalescing hides the effect at test row counts (it
    // packs the tiny batch into 1-2 tasks), so pin it off for the
    // duration — at production batch sizes the tasks are real.
    def wideBatch(b: Long) = (10L until 22L).map(i =>
      (i, Array.tabulate(4)(j =>
        if (j == 0) -1.0f - (i - 10) * 0.01f - b * 0.001f else 0.1f).toSeq))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    def filesPerPart(store: SnapshotStore, t: String): Map[String, Int] =
      store.read(t).get.inputFiles.toSeq
        .groupBy(_.split("/").takeRight(2).head)
        .map { case (p, fs) => p -> fs.length }
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      // control: NO cadence — the hot list dir holds a file per writer
      // task (this is the pile the cadence exists to bound)
      val (plain, _, _) = clusteredFixture()
      (0L to 5L).foreach(b => StreamingAnn.processBatch(plain, wideBatch(b), b))
      assert(filesPerPart(plain, "ann_assignments").values.max > 4,
        "fixture no longer piles files — the cadence test lost its teeth")
      // cadence on: every partition is at/under the compaction threshold
      // right after a cadence batch, for BOTH probed tables
      val (store, _, _) = clusteredFixture()
      (0L to 5L).foreach(b =>
        StreamingAnn.processBatch(store, wideBatch(b), b, compactEvery = 2))
      Seq("ann_assignments", "ann_id_map").foreach { t =>
        assert(filesPerPart(store, t).values.max <= 4,
          s"$t kept an over-threshold file pile despite the cadence")
      }
      // content untouched: same rows as the uncompacted control
      def rows(s: SnapshotStore) = s.read("ann_assignments").get
        .select("id", "list_id").collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).intValue)).toSet
      assert(rows(store) == rows(plain))
    } finally spark.conf.set(coalesceKey, prevCoalesce)
  }

  test("memo caches evict superseded versions on access and the vector " +
    "memo is size-capped — a long-lived serving loop holds heap flat") {
    val q = AnnStore.vectorOf(spark, dir, 7L)
    assert(q.nonEmpty)
    val (root, curV, _) = AnnStore.vectorCache.keysIterator
      .find(_._3 == 7L).get
    // strand a fake superseded-version entry; the next access evicts it
    AnnStore.vectorCache.put((root, curV - 1, 999L), Array(0f))
    AnnStore.vectorOf(spark, dir, 8L)
    assert(!AnnStore.vectorCache.keysIterator.exists(
      k => k._1 == root && k._2 != curV),
      "superseded-version vector memo entries survived an access")
    // same contract for the centroid memo
    val cents = AnnStore.centroidsLocal(spark, dir)
    val cKey = AnnStore.centroidCache.keysIterator.find(_._1 == root).get
    AnnStore.centroidCache.put((root, cKey._2 - 1), cents)
    AnnStore.centroidsLocal(spark, dir)
    assert(!AnnStore.centroidCache.keysIterator.exists(
      k => k._1 == root && k._2 != cKey._2),
      "superseded-version centroid memo entries survived an access")
    // size cap: overfill within the CURRENT version, next access resets
    (0 until AnnStore.MaxVectorCacheEntries)
      .foreach(i => AnnStore.vectorCache.put((root, curV, 100000L + i), Array(0f)))
    AnnStore.vectorOf(spark, dir, 9L)
    assert(AnnStore.vectorCache.size < AnnStore.MaxVectorCacheEntries,
      "vector memo grew past its cap")
  }
}
