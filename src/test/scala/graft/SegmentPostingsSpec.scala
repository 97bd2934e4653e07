package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.SnapshotStore
import graft.streaming.{IndexDeletes, StreamingPostings}

/** The SEGMENT maintenance path (processBatchAppend + servingPostings +
  * foldPostings): same replacement semantics as the LWW path at
  * O(batch) write cost — pinned by running the same batch history
  * through both protocols and comparing the probe-facing rows, the
  * stats, and the BM25 results; plus the fold, the crash window, and
  * the appendFiles commit mode itself.
  */
class SegmentPostingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newStore(manifest: Boolean = false) =
    new SnapshotStore(spark, Files.createTempDirectory("graft-seg").toString,
      manifestCommits = manifest)

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  /** The batch history every protocol test replays: inserts, an
    * update that shrinks a doc, a token-less re-ingest (doc must
    * vanish), and one more insert.
    */
  private val history = Seq(
    docs(1L -> "alpha beta gamma", 2L -> "delta epsilon", 3L -> "zeta eta"),
    docs(2L -> "delta", 4L -> "theta iota kappa"),
    docs(3L -> ""),
    docs(5L -> "lambda mu alpha"))

  private def viewRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "term", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def bm25(posts: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame) =
    graft.search.PostingsIndex.bm25SearchFrames(posts, stats,
      Seq("alpha", "delta", "theta"), topK = 10,
      numBuckets = graft.search.PostingsIndex.numBucketsOf(stats))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for (manifest <- Seq(false, true))
  test(s"segment protocol equals the LWW protocol on the same batch " +
    s"history (manifestCommits=$manifest): serving rows, stats, and " +
    "BM25 results all match") {
    val lww = newStore()
    val seg = newStore(manifest)
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingPostings.processBatch(lww, b, i.toLong)
      StreamingPostings.processBatchAppend(seg, b, i.toLong)
    }
    val view = StreamingPostings.servingPostings(seg)
    assert(viewRows(view) == viewRows(lww.read("postings").get),
      "segment serving view diverged from the LWW snapshot")
    // the RAW segment table still holds dead generations (that is the
    // point — nothing was rewritten)...
    assert(seg.read("postings").get.count() > view.count(),
      "no dead generations present — did the append path rewrite?")
    // ...and stats are identical (registry choreography is shared)
    val sL = lww.read("postings_stats").get.collect().head
    val sS = seg.read("postings_stats").get.collect().head
    assert(sL.getLong(0) == sS.getLong(0) && sL.getLong(1) == sS.getLong(1))
    assert(bm25(view, seg.read("postings_stats").get) ==
      bm25(lww.read("postings").get, lww.read("postings_stats").get),
      "probe results diverged between the protocols")
    // replay of a committed batch is a no-op (ledger marker)
    val rowsBefore = seg.read("postings").get.count()
    StreamingPostings.processBatchAppend(seg, history.head, 0L)
    assert(seg.read("postings").get.count() == rowsBefore)
    // time travel + fold + erasure all hold in this commit mode too
    assert(seg.readVersion("postings", 0L).isDefined)
    assert(StreamingPostings.foldPostings(seg).isDefined)
    assert(viewRows(seg.read("postings").get.drop("seq")) ==
      viewRows(lww.read("postings").get), "post-fold rows diverged")
    IndexDeletes.deleteFromPostings(seg, Seq(5L).toDF("doc_id"))
    assert(seg.read("postings").get.filter(col("doc_id") === 5L).isEmpty)
  }

  test("foldPostings drops dead generations and spends the " +
    "tombstones; serving rows and probes are unchanged; a second " +
    "fold is a no-op") {
    val seg = newStore()
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingPostings.processBatchAppend(seg, b, i.toLong)
    }
    val before = viewRows(StreamingPostings.servingPostings(seg))
    assert(StreamingPostings.foldPostings(seg).isDefined)
    assert(viewRows(seg.read("postings").get.drop("seq")) == before,
      "fold changed the visible rows")
    assert(seg.read("postings_tombstones").get.isEmpty,
      "fold left spent tombstones behind")
    assert(viewRows(StreamingPostings.servingPostings(seg)) == before)
    assert(StreamingPostings.foldPostings(seg).isEmpty, "no-op fold wrote")
    // the folded table keeps working as a segment base
    StreamingPostings.processBatchAppend(seg, docs(1L -> "nu xi"), 9L)
    val v2 = viewRows(StreamingPostings.servingPostings(seg))
    assert(v2.contains((1L, "nu", 1L)) && !v2.exists(r => r._1 == 1L && r._2 == "alpha"),
      "post-fold append lost replacement semantics")
  }

  test("incremental foldPostings (bounded maxBuckets) converges to the " +
    "full fold's fixed point over rounds, clearing only the folded " +
    "docs' tombstones each round") {
    val seg = newStore()
    val full = newStore()
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingPostings.processBatchAppend(seg, b, i.toLong)
      StreamingPostings.processBatchAppend(full, b, i.toLong)
    }
    val before = viewRows(StreamingPostings.servingPostings(seg))
    StreamingPostings.foldPostings(full) // the fixed point
    var rounds = 0
    var lastTs = Long.MaxValue
    while (StreamingPostings.foldPostings(seg, maxBuckets = 2).isDefined &&
        rounds < 20) {
      rounds += 1
      val ts = seg.read("postings_tombstones").get.count()
      assert(ts < lastTs, "a round cleared no tombstones — no progress")
      lastTs = ts
      // every intermediate state still serves correctly
      assert(viewRows(StreamingPostings.servingPostings(seg)) == before,
        s"round $rounds changed the visible rows")
    }
    assert(rounds > 0 && rounds < 20, s"incremental fold ran $rounds rounds")
    assert(seg.read("postings_tombstones").get.isEmpty,
      "incremental folds left tombstones behind")
    assert(viewRows(seg.read("postings").get.drop("seq")) ==
      viewRows(full.read("postings").get.drop("seq")),
      "incremental fixed point diverged from the full fold")
    assert(seg.read("postings").get.count() ==
      full.read("postings").get.count(),
      "a dead generation survived the incremental folds")
  }

  test("crash between tombstone and segment append: the docs are " +
    "transiently absent, and the mandated replay converges with no " +
    "double-counted term") {
    val seg = newStore()
    StreamingPostings.processBatchAppend(seg, history.head, 0L)
    // crash the SEGMENT commit of batch 1 (tombstones land first)
    seg.beforeSwap = (table, _) =>
      if (table == "postings") sys.error("crash mid-batch")
    intercept[Exception] {
      StreamingPostings.processBatchAppend(seg, history(1), 1L)
    }
    seg.beforeSwap = (_, _) => ()
    // half-applied: doc 2 is tombstoned but its new rows never landed
    val mid = viewRows(StreamingPostings.servingPostings(seg))
    assert(!mid.exists(_._1 == 2L), "tombstoned doc still visible")
    // the replay (foreachBatch/cdc contract) re-runs the whole batch
    StreamingPostings.processBatchAppend(seg, history(1), 1L)
    val after = viewRows(StreamingPostings.servingPostings(seg))
    assert(after.count(r => r._1 == 2L && r._2 == "delta") == 1,
      "replay double-counted or lost the re-ingested doc")
    assert(after.exists(_._1 == 4L))
  }

  test("erasure on a segment store: deleteFromPostings physically " +
    "drops the victim's rows in every generation AND its tombstone row") {
    val seg = newStore()
    history.zipWithIndex.foreach { case (b, i) =>
      StreamingPostings.processBatchAppend(seg, b, i.toLong)
    }
    IndexDeletes.deleteFromPostings(seg, Seq(2L).toDF("doc_id"))
    assert(seg.read("postings").get.filter(col("doc_id") === 2L).isEmpty,
      "a dead generation of the victim survived the erasure")
    assert(seg.read("postings_tombstones").get
      .filter(col("doc_id") === 2L).isEmpty,
      "the victim's tombstone row survived the erasure")
    assert(viewRows(StreamingPostings.servingPostings(seg))
      .exists(_._1 == 5L), "a survivor was lost")
  }

  test("the CDC follower in segment mode tracks the same table state " +
    "as LWW mode, and the fold cadence spends the tombstones") {
    import graft.streaming.CdcIndexMaintenance
    val lww = newStore()
    val seg = newStore()
    def writeBoth(rows: (Long, String)*): Unit = {
      lww.write("docs", docs(rows: _*)); seg.write("docs", docs(rows: _*)); ()
    }
    writeBoth(1L -> "alpha beta", 2L -> "gamma delta")
    CdcIndexMaintenance.followPostings(lww, segment = false)
    CdcIndexMaintenance.followPostings(seg, segment = true, foldEvery = 2)
    writeBoth(1L -> "alpha revised", 3L -> "epsilon zeta")   // v1
    writeBoth(3L -> "epsilon zeta")                          // v2: drop 1,2
    assert(CdcIndexMaintenance.followPostings(lww, segment = false).steps == 2)
    assert(CdcIndexMaintenance
      .followPostings(seg, segment = true, foldEvery = 2).steps == 2)
    assert(viewRows(StreamingPostings.servingPostings(seg)) ==
      viewRows(lww.read("postings").get),
      "segment follower diverged from the LWW follower")
    val sL = lww.read("postings_stats").get.collect().head
    val sS = seg.read("postings_stats").get.collect().head
    assert(sL.getLong(0) == sS.getLong(0) && sL.getLong(1) == sS.getLong(1))
  }

  for (manifest <- Seq(false, true))
  test(s"appendFiles (manifestCommits=$manifest): new files add to " +
    "touched partitions, prior rows survive unrewritten, time travel " +
    "and vacuum hold, schema evolution composes") {
    val s = newStore(manifest)
    s.appendFiles("t", Seq((1L, 0, "a"), (2L, 1, "b")).toDF("k", "bucket", "v"),
      partitionCols = Seq("bucket"))
    s.appendFiles("t", Seq((3L, 0, "c")).toDF("k", "bucket", "v"),
      partitionCols = Seq("bucket"))
    assert(s.read("t").get.count() == 3L)
    assert(s.readVersion("t", 0L).get.count() == 2L, "time travel broke")
    // schema evolution across segments: a new column reads null on
    // prior files (the seq mechanism)
    s.appendFiles("t", Seq((4L, 1, "d", 7L)).toDF("k", "bucket", "v", "g"),
      partitionCols = Seq("bucket"))
    val got = s.read("t").get.select("k", "g").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> None, 4L -> Some(7L)))
    s.vacuum("t", keepLast = 1)
    assert(s.read("t").get.count() == 4L,
      "vacuum broke shared links / referenced generations")
    // compaction folds the multi-generation partitions back to one
    // dir and keeps every row
    s.compact("t", maxFilesPerPartition = 1)
    assert(s.read("t").get.count() == 4L, "compaction lost a generation")
  }

  test("appendFiles guards the sidecar schema: an omitted column " +
    "errors under the strict default (and null-fills under evolution), " +
    "a non-promotable retype errors always, a widened column widens " +
    "the table") {
    val s = newStore()
    s.appendFiles("t", Seq((1L, 0, "a", 5)).toDF("k", "bucket", "v", "n"),
      partitionCols = Seq("bucket"))
    // omission: strict store errors — the sidecar would otherwise
    // silently null `v` on every prior row
    intercept[IllegalArgumentException] {
      s.appendFiles("t", Seq((2L, 1, 6)).toDF("k", "bucket", "n"),
        partitionCols = Seq("bucket"))
    }
    // non-promotable retype: errors in both modes
    intercept[IllegalArgumentException] {
      s.appendFiles("t", Seq((2L, 1, "b", "oops")).toDF("k", "bucket", "v", "n"),
        partitionCols = Seq("bucket"))
    }
    // widening: an int→long batch widens the table, prior files read
    // up-cast under the merged sidecar
    s.appendFiles("t", Seq((2L, 1, "b", 7L)).toDF("k", "bucket", "v", "n"),
      partitionCols = Seq("bucket"))
    val gotW = s.read("t").get.select("k", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotW == Map(1L -> 5L, 2L -> 7L))
    // evolution store: the omission null-fills the batch's rows and
    // the sidecar keeps the full merged schema
    val e = new SnapshotStore(spark,
      Files.createTempDirectory("graft-seg-evo").toString,
      allowSchemaEvolution = true)
    e.appendFiles("t", Seq((1L, 0, "a")).toDF("k", "bucket", "v"),
      partitionCols = Seq("bucket"))
    e.appendFiles("t", Seq((2L, 1)).toDF("k", "bucket"),
      partitionCols = Seq("bucket"))
    val gotE = e.read("t").get.select("k", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotE == Map(1L -> Some("a"), 2L -> None))
  }
}
