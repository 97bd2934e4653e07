package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.SnapshotStore
import graft.streaming.{CdcIndexMaintenance, IndexDeletes, StreamingAnn}

/** The ANN SEGMENT maintenance path (StreamingAnn.processBatchAppend +
  * servingAssignments + foldAnn) — the r13 postings protocol applied to
  * vectors (VERDICT r13 item 1): same replacement semantics as the LWW
  * path at O(batch) write cost, pinned by running the same batch
  * history through both protocols and comparing the serving rows, the
  * occupancy stats, and probe results; plus the fold (full and
  * incremental), the crash window, erasure through every generation,
  * the follower, and retrain-over-generations.
  */
class AnnSegmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newStore(manifest: Boolean = false) =
    new SnapshotStore(spark, Files.createTempDirectory("graft-annseg").toString,
      manifestCommits = manifest)

  private def vec(x: Float) = Array.tabulate(4)(i => if (i == 0) x else 0.1f).toSeq

  private def vecsDf(rows: (Long, Float)*) = rows.toSeq
    .map { case (id, x) => (id, vec(x)) }.toDF("id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  /** Base corpus: ids 1-6 split across the two trained lists. */
  private val base = vecsDf(1L -> 1.0f, 2L -> 0.95f, 3L -> 0.9f,
    4L -> -1.0f, 5L -> -0.95f, 6L -> -0.9f)

  private def bootstrap(store: SnapshotStore): Unit = {
    val cents = graft.rag.AnnStore.trainCentroids(base, "embedding",
      Seq(col("id")), 2)
    graft.rag.AnnStore.writeIndex(spark, store, base, cents)
  }

  /** The batch history every protocol test replays: an insert batch, a
    * cross-list MOVE (vector 2 flips sign), and a move BACK (vector 10
    * returns — two dead generations of one id).
    */
  private val history = Seq(
    vecsDf(10L -> -0.8f, 11L -> 0.85f),
    vecsDf(2L -> -0.9f),
    vecsDf(10L -> 0.8f))

  private def servingRows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "list_id").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue)).toSet

  private def listStats(store: SnapshotStore) =
    store.read("ann_list_stats").get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap.filter(_._2 > 0)

  private def probeTop(store: SnapshotStore, x: Float, k: Int = 3) = {
    val cents = graft.rag.AnnStore.centroidsOf(store.read("ann_centroids").get)
    val qv = vec(x).toArray.map(_.toFloat)
    val lists = graft.rag.AnnStore.probeListsOf(cents, qv, 1)
    StreamingAnn.servingAssignments(store)
      .filter(col("list_id").isin(lists: _*))
      .withColumn("cosine", graft.functions.VectorFunctions
        .dotFold(col("embedding"), typedlit(qv.toSeq)))
      .orderBy(desc("cosine"), asc("id")).limit(k)
      .select("id").collect().map(_.getLong(0)).toSeq
  }

  for (manifest <- Seq(false, true))
  test(s"ANN segment protocol equals the LWW protocol on the same " +
    s"batch history (manifestCommits=$manifest): serving rows, " +
    "occupancy, and probe results all match; dead generations persist " +
    "in the raw table") {
    val lww = newStore()
    val seg = newStore(manifest)
    bootstrap(lww); bootstrap(seg)
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingAnn.processBatch(lww, b, i.toLong)
      StreamingAnn.processBatchAppend(seg, b, i.toLong)
    }
    val view = StreamingAnn.servingAssignments(seg)
    assert(servingRows(view) == servingRows(lww.read("ann_assignments").get),
      "segment serving view diverged from the LWW snapshot")
    // vector 2 moved lists, vector 10 moved and moved back — their old
    // generations are still physically present (nothing was rewritten)
    assert(seg.read("ann_assignments").get.count() > view.count(),
      "no dead generations present — did the append path rewrite?")
    assert(listStats(seg) == listStats(lww),
      "occupancy subtotals diverged (dead generations counted?)")
    val sL = lww.read("ann_stats").get.collect().head
    val sS = seg.read("ann_stats").get.collect().head
    assert(sL.getLong(0) == sS.getLong(0) && sL.getLong(2) == sS.getLong(2),
      "global stats diverged")
    assert(probeTop(seg, 1.0f) == probeTop(lww, 1.0f) &&
      probeTop(seg, -1.0f) == probeTop(lww, -1.0f),
      "probe results diverged between the protocols")
    // replay of a committed batch is a no-op (ledger marker)
    val rowsBefore = seg.read("ann_assignments").get.count()
    StreamingAnn.processBatchAppend(seg, history.head, 0L)
    assert(seg.read("ann_assignments").get.count() == rowsBefore)
  }

  test("foldAnn drops dead generations and spends the tombstones; " +
    "serving rows unchanged; incremental folds (maxLists = 1) converge " +
    "to the same fixed point with bounded rounds") {
    val seg = newStore()
    bootstrap(seg)
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingAnn.processBatchAppend(seg, b, i.toLong)
    }
    val before = servingRows(StreamingAnn.servingAssignments(seg))
    // a second store folds INCREMENTALLY, one list per round
    val seg2 = newStore()
    bootstrap(seg2)
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingAnn.processBatchAppend(seg2, b, i.toLong)
    }
    // full fold
    assert(StreamingAnn.foldAnn(seg).isDefined)
    assert(servingRows(seg.read("ann_assignments").get) == before,
      "full fold changed the visible rows")
    assert(seg.read("ann_tombstones").get.isEmpty)
    assert(StreamingAnn.foldAnn(seg).isEmpty, "no-op fold wrote")
    // incremental: every round rewrites at most its budget of lists,
    // the union of rounds reaches the full fold's fixed point
    var rounds = 0
    while (StreamingAnn.foldAnn(seg2, maxLists = 1).isDefined && rounds < 10)
      rounds += 1
    assert(rounds > 0 && rounds < 10, s"incremental fold ran $rounds rounds")
    assert(seg2.read("ann_tombstones").get.isEmpty,
      "incremental folds left tombstones behind")
    assert(servingRows(seg2.read("ann_assignments").get) == before,
      "incremental fold fixed point diverged from the full fold")
    assert(seg2.read("ann_assignments").get.count() == before.size,
      "a dead generation survived the incremental folds")
    // the folded table keeps working as a segment base
    StreamingAnn.processBatchAppend(seg2, vecsDf(11L -> -0.7f), 9L)
    val v2 = servingRows(StreamingAnn.servingAssignments(seg2))
    assert(v2.count(_._1 == 11L) == 1, "post-fold append lost LWW semantics")
  }

  test("crash between tombstone and segment append: the ids are " +
    "transiently absent and the mandated replay converges") {
    val seg = newStore()
    bootstrap(seg)
    StreamingAnn.processBatchAppend(seg, history.head, 0L)
    seg.beforeSwap = (table, _) =>
      if (table == "ann_assignments") sys.error("crash mid-batch")
    intercept[Exception] {
      StreamingAnn.processBatchAppend(seg, history(1), 1L)
    }
    seg.beforeSwap = (_, _) => ()
    val mid = servingRows(StreamingAnn.servingAssignments(seg))
    assert(!mid.exists(_._1 == 2L), "tombstoned id still visible")
    StreamingAnn.processBatchAppend(seg, history(1), 1L)
    val after = servingRows(StreamingAnn.servingAssignments(seg))
    assert(after.count(_._1 == 2L) == 1,
      "replay duplicated or lost the re-ingested vector")
  }

  test("erasure on a segment store: deleteFromAnn physically drops the " +
    "victim's rows in EVERY generation (old lists included), its id-map " +
    "row, and its tombstone row; occupancy recomputes live") {
    val seg = newStore()
    bootstrap(seg)
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingAnn.processBatchAppend(seg, b, i.toLong)
    }
    // vector 2's generations span BOTH lists (it moved) — erasure must
    // reach the old list's dead generation too
    IndexDeletes.deleteFromAnn(seg, Seq(2L).toDF("id"))
    assert(seg.read("ann_assignments").get.filter(col("id") === 2L).isEmpty,
      "a dead generation of the victim survived the erasure")
    assert(seg.read("ann_id_map").get.filter(col("id") === 2L).isEmpty)
    assert(seg.read("ann_tombstones").get.filter(col("id") === 2L).isEmpty,
      "the victim's tombstone row survived the erasure")
    val live = servingRows(StreamingAnn.servingAssignments(seg))
    assert(live.exists(_._1 == 10L) && live.exists(_._1 == 11L),
      "a survivor was lost")
    assert(listStats(seg).values.sum == live.size,
      "occupancy diverged from the live rows after the erasure")
  }

  test("the ANN follower in segment mode tracks the same state as LWW " +
    "mode (moves and deletes included) and the fold cadence spends the " +
    "tombstones") {
    val lww = newStore()
    val seg = newStore()
    def writeBoth(rows: (Long, Float)*): Unit = {
      lww.write("vecs", vecsDf(rows: _*)); seg.write("vecs", vecsDf(rows: _*)); ()
    }
    // ≥ NumLists vectors: the follower's bootstrap trains the
    // default-width quantizer
    val filler = (100L until 120L).map(i => i -> (1.0f - (i - 100L) * 0.05f))
    writeBoth(filler ++ Seq(1L -> 1.0f, 2L -> 0.95f, 3L -> -1.0f,
      4L -> -0.95f): _*)
    CdcIndexMaintenance.followAnn(lww, segment = false)
    CdcIndexMaintenance.followAnn(seg, segment = true, foldEvery = 2)
    writeBoth(filler ++ Seq(1L -> 1.0f, 2L -> -0.9f, 5L -> 0.9f,
      4L -> -0.95f): _*)                                     // move 2, +5, -3
    writeBoth(filler ++ Seq(2L -> -0.9f, 5L -> 0.9f, 4L -> -0.95f): _*) // -1
    assert(CdcIndexMaintenance.followAnn(lww, segment = false).steps == 2)
    assert(CdcIndexMaintenance
      .followAnn(seg, segment = true, foldEvery = 2).steps == 2)
    assert(servingRows(StreamingAnn.servingAssignments(seg)) ==
      servingRows(lww.read("ann_assignments").get),
      "segment follower diverged from the LWW follower")
    assert(listStats(seg) == listStats(lww))
  }

  test("retrain on a segment store trains on the SERVING view (no dead " +
    "generations, no duplicate ids) and clears the spent tombstones") {
    val seg = newStore()
    bootstrap(seg)
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingAnn.processBatchAppend(seg, b, i.toLong)
    }
    val before = servingRows(StreamingAnn.servingAssignments(seg))
      .map(_._1)
    StreamingAnn.retrain(spark, seg, lists = 2)
    val rows = seg.read("ann_assignments").get.select("id").collect()
      .map(_.getLong(0)).toSeq
    assert(rows.distinct.sorted == rows.sorted, "retrain wrote duplicate ids")
    assert(rows.toSet == before, "retrain lost or resurrected a vector")
    assert(seg.read("ann_tombstones").get.isEmpty,
      "retrain left spent tombstones to re-kill the rewritten rows")
  }
}
