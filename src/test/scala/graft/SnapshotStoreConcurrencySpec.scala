package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.SnapshotStore

/** Multi-writer commit safety (VERDICT r12 item 1). The reference gets
  * this from Postgres transactions (ingest.py:613-644 upserts run
  * under MVCC); the snapshot store builds it from an O_EXCL version
  * claim: concurrent merges serialize on the claim, a lost race
  * re-reads the winner's snapshot as prior, and the final table equals
  * the serialized result — no lost rows, no clobbered version dirs.
  */
class SnapshotStoreConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    Files.createTempDirectory("graft-concurrent").toString

  /** Run `n` tasks concurrently (all released together), propagating
    * the first failure.
    */
  private def inParallel(n: Int)(task: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val futures = (0 until n).map(i => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { gate.await(); task(i) }
      }))
      gate.countDown()
      futures.foreach(_.get(600, TimeUnit.SECONDS))
    } finally { pool.shutdownNow(); () }
  }

  test("two writers interleaving appends lose nothing: final snapshot " +
    "equals the serialized result, versions stay contiguous") {
    val root = newRoot()
    val s = new SnapshotStore(spark, root)
    val perWriter = 6
    inParallel(2) { w =>
      (0 until perWriter).foreach { i =>
        s.append("t", Seq((w * 1000 + i, s"w$w-$i")).toDF("k", "v"))
      }
    }
    val rows = s.read("t").get.collect().map(_.getInt(0)).toSet
    val expect = (for (w <- 0 until 2; i <- 0 until perWriter)
      yield w * 1000 + i).toSet
    assert(rows == expect, "a concurrent append was lost")
    // every commit claimed its own version: 12 merges = versions 0..11
    assert(s.currentVersion("t").contains((2 * perWriter - 1).toLong))
    assert(s.versions("t") == (0L until 2L * perWriter).toSeq)
    // every claim released: none left behind to stall a later writer
    val leftover = Files.list(Paths.get(root, "t"))
    try assert(!leftover.iterator().asScala
      .exists(_.getFileName.toString.startsWith("_claim.")),
      "a commit leaked its claim file")
    finally leftover.close()
  }

  test("interleaved mergeLastWriteWins from two writers: both writers' " +
    "keys survive, shared key resolves to ONE of the two writes") {
    val s = new SnapshotStore(spark, newRoot())
    s.write("t", Seq((0, "base")).toDF("k", "v"))
    inParallel(2) { w =>
      (0 until 4).foreach { i =>
        s.mergeLastWriteWins("t",
          Seq((w * 100 + i, s"own$w"), (999, s"shared-$w-$i")).toDF("k", "v"),
          Seq("k"))
      }
    }
    val got = s.read("t").get.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val ownKeys = (for (w <- 0 until 2; i <- 0 until 4) yield w * 100 + i).toSet
    assert(got.keySet == ownKeys + 0 + 999,
      "a concurrent upsert's keys were lost")
    // the contended key holds exactly one writer's LAST value — the
    // serialized outcome of SOME interleaving (each merge read a
    // committed prior), never a torn/duplicated row
    assert(got(999).matches("shared-[01]-3"),
      s"contended key held ${got(999)} — not any serialization's tail write")
  }

  test("additive counters under two writers: increments serialize, " +
    "final count is the exact total (the lost-update litmus)") {
    val s = new SnapshotStore(spark, newRoot())
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    s.write("c", Seq((1L, 1L, ts, ts)).toDF("k", "n", "first", "last"))
    val perWriter = 5
    inParallel(2) { _ =>
      (0 until perWriter).foreach { _ =>
        s.mergeAdditive("c", Seq((1L, 1L, ts, ts)).toDF("k", "n", "first", "last"),
          Seq("k"), Seq("n"), Seq("first"), Seq("last"))
      }
    }
    val n = s.read("c").get.select("n").collect().head.getLong(0)
    assert(n == 1L + 2 * perWriter,
      s"counter read $n — a concurrent increment was lost (read-modify-write race)")
  }

  test("two SEPARATE store instances on one root (the follow-daemon-" +
    "beside-ingest shape) serialize through the shared claim files") {
    val root = newRoot()
    val a = new SnapshotStore(spark, root)
    val b = new SnapshotStore(spark, root)
    inParallel(2) { w =>
      val s = if (w == 0) a else b
      (0 until 5).foreach { i =>
        s.mergeInsertIfAbsent("dims", Seq((w * 10 + i, s"w$w")).toDF("k", "v"), Seq("k"))
      }
    }
    assert(a.read("dims").get.count() == 10L, "cross-instance merge lost rows")
    assert(a.currentVersion("dims").contains(9L))
  }

  test("a follow daemon running BESIDE an ingest loop (the r12 " +
    "workload that motivated the claim protocol): interleaved real " +
    "writers converge to the serialized end state") {
    import graft.streaming.CdcIndexMaintenance
    val root = newRoot()
    val ingestStore = new SnapshotStore(spark, root)
    val followStore = new SnapshotStore(spark, root) // separate instance
    val emb = graft.rag.HashingEmbedder(16)
    val batches = (0 until 4).map(b =>
      Seq((s"K-$b", s"docket body $b revision"), ("K-shared", s"shared rev $b"))
        .toDF("case_number", "docket_text"))
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    inParallel(2) {
      case 0 =>
        try batches.foreach { b =>
          ingestStore.mergeLastWriteWins("cases", b, Seq("case_number"))
        } finally done.set(true)
      case _ =>
        // the daemon polls concurrently; every pass must land a clean
        // cursor/serving state whatever half-way point it observes
        while (!done.get()) {
          CdcIndexMaintenance.followRag(followStore, embedder = emb); ()
        }
    }
    // one final catch-up, then the serving table must equal a fresh
    // pipeline run over the final snapshot
    CdcIndexMaintenance.followRag(followStore, embedder = emb)
    val served = followStore.read("case_chunk_embeddings").get
      .select("case_number", "chunk_id", "chunk_text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val expect = graft.rag.RagPipeline.embedChunks(
      graft.rag.RagPipeline.chunkCases(
        ingestStore.read("cases").get), emb)
      .select("case_number", "chunk_id", "chunk_text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(served == expect,
      "concurrent follow daemon diverged from the final snapshot")
    // the ingest writer lost nothing to the concurrent committer
    assert(ingestStore.read("cases").get.count() == 5L)
  }

  test("a stale claim (crashed writer) is stolen after the timeout; " +
    "a fresh claim blocks the commit until released") {
    val root = newRoot()
    val s = new SnapshotStore(spark, root, claimTimeoutMs = 300L)
    s.write("t", Seq((1, "a")).toDF("k", "v"))
    // plant a crashed writer's claim on the next version, already aged
    val stale = Paths.get(root, "t", "_claim.v1")
    Files.writeString(stale,
      s"dead-writer ${System.currentTimeMillis() - 10000L}")
    val t0 = System.currentTimeMillis()
    s.append("t", Seq((2, "b")).toDF("k", "v"))
    assert(s.read("t").get.count() == 2L, "steal path lost the commit")
    assert(System.currentTimeMillis() - t0 < 60000L)
    // fresh claim: the writer waits. Hold v2's claim (a just-stamped
    // one — a live writer's), release it from another thread after a
    // beat, and assert the commit then lands.
    val fresh = Paths.get(root, "t", "_claim.v2")
    val released = new java.util.concurrent.atomic.AtomicLong(0L)
    val releaser = new Thread(() => {
      // keep the claim alive past its 300ms timeout the way a live
      // writer's heartbeat would, then release it
      (0 until 6).foreach { _ =>
        Thread.sleep(120)
        Files.writeString(fresh, s"live-writer ${System.currentTimeMillis()}")
      }
      Files.deleteIfExists(fresh)
      released.set(System.currentTimeMillis())
    })
    Files.writeString(fresh, s"live-writer ${System.currentTimeMillis()}")
    releaser.start()
    s.append("t", Seq((3, "c")).toDF("k", "v"))
    releaser.join()
    assert(released.get() > 0L, "the commit raced past a live claim")
    assert(s.read("t").get.count() == 3L)
    assert(s.currentVersion("t").contains(2L))
  }

  test("a FUTURE-stamped claim (cross-process clock skew) ages out as " +
    "stale instead of blocking every waiter forever") {
    val root = newRoot()
    val s = new SnapshotStore(spark, root, claimTimeoutMs = 300L)
    s.write("t", Seq((1, "a")).toDF("k", "v"))
    Files.writeString(Paths.get(root, "t", "_claim.v1"),
      s"skewed-writer ${System.currentTimeMillis() + 3600000L}")
    val t0 = System.currentTimeMillis()
    s.append("t", Seq((2, "b")).toDF("k", "v"))
    assert(s.read("t").get.count() == 2L)
    assert(System.currentTimeMillis() - t0 < 60000L,
      "future-stamped claim was honored instead of judged stale")
  }

  test("a mid-write claim steal is detected at the pointer swap: the " +
    "victim aborts into a clean retry, the thief's commit survives, " +
    "and the final state is the serialized result") {
    val root = newRoot()
    val s = new SnapshotStore(spark, root)
    s.write("t", Seq((1, "a")).toDF("k", "v"))
    // simulate a steal landing while the victim writes: at the swap
    // the claim no longer carries the victim's nonce. The victim must
    // retry (the loop re-reads the pointer) rather than publish.
    var stolen = false
    s.beforeSwap = (table, version) =>
      if (table == "t" && version == 1L && !stolen) {
        stolen = true
        // the thief replaces the claim and commits v1 itself
        val claim = Paths.get(root, "t", "_claim.v1")
        Files.writeString(claim, s"thief ${System.currentTimeMillis()}")
        val thief = new SnapshotStore(spark, root)
        // the thief holds the claim, so it commits by writing the dir
        // and swapping directly (mirroring a stolen-claim winner)
        thief.read("t").get.unionByName(Seq((2, "thief")).toDF("k", "v"))
          .write.mode("overwrite")
          .parquet(Paths.get(root, "t", "v1").toString)
        Files.writeString(Paths.get(root, "t", "_current"), "1")
      }
    s.mergeLastWriteWins("t", Seq((3, "victim")).toDF("k", "v"), Seq("k"))
    s.beforeSwap = (_, _) => ()
    val got = s.read("t").get.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "thief", 3 -> "victim"),
      s"steal-at-swap lost a write: $got")
    assert(s.currentVersion("t").contains(2L),
      "the victim's retry did not land on top of the thief's commit")
  }

  test("crash between version write and pointer swap releases the " +
    "claim; the next writer overwrites the orphan dir (both modes)") {
    for (manifest <- Seq(false, true)) {
      val s = new SnapshotStore(spark, newRoot(), manifestCommits = manifest)
      s.write("t", Seq((1, "a")).toDF("k", "v"))
      s.beforeSwap = (_, _) => sys.error("crash before swap")
      intercept[Exception] {
        s.mergeLastWriteWins("t", Seq((2, "b")).toDF("k", "v"), Seq("k"))
      }
      s.beforeSwap = (_, _) => ()
      // the claim must NOT linger (it released on the failure path) —
      // this retry would otherwise stall for the full claim timeout
      val t0 = System.currentTimeMillis()
      s.mergeLastWriteWins("t", Seq((2, "b2")).toDF("k", "v"), Seq("k"))
      assert(System.currentTimeMillis() - t0 < 30000L,
        s"manifest=$manifest: crashed commit leaked its claim")
      val got = s.read("t").get.collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got == Map(1 -> "a", 2 -> "b2"))
      assert(s.currentVersion("t").contains(1L))
    }
  }

  test("an in-flight (claimed, unswapped) version dir is not a " +
    "readable version: versions() and time travel ignore it") {
    val s = new SnapshotStore(spark, newRoot())
    s.write("t", Seq((1, "a")).toDF("k", "v"))
    s.beforeSwap = (_, _) => sys.error("crash before swap")
    intercept[Exception] { s.append("t", Seq((2, "b")).toDF("k", "v")) }
    s.beforeSwap = (_, _) => ()
    assert(s.versions("t") == Seq(0L), "orphan dir listed as a version")
  }
}
