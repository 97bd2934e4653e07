package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.SnapshotStore

/** Seeded multi-writer fuzz for the commit-claim protocol: three
  * writers issue random mixes of COMMUTATIVE store operations —
  * appends of writer-tagged rows, additive increments on shared keys,
  * last-write-wins upserts on writer-owned keys — so every
  * serialization of the interleaving has ONE correct final state,
  * checked exactly. Any lost update (two claims on one version, a
  * clobbered dir, a stale-prior merge) shows up as a missing row or a
  * short counter. Partitioned and unpartitioned layouts, both commit
  * modes.
  */
class ConcurrencyProperties extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def inParallel(n: Int)(task: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val fs = (0 until n).map(i => pool.submit(
        new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { gate.await(); task(i) }
        }))
      gate.countDown()
      fs.foreach(_.get(900, TimeUnit.SECONDS))
    } finally { pool.shutdownNow(); () }
  }

  for (manifest <- Seq(false, true))
    test(s"seeded 3-writer op mix (manifest=$manifest): the final state " +
      "equals the commutative expectation — no op lost to any interleaving") {
      val seed = 1337 + (if (manifest) 1 else 0)
      val root = Files.createTempDirectory("graft-fuzz-mw").toString
      val writers = 3
      val opsPer = 6
      // each writer gets its own store instance — the cross-process shape
      val stores = (0 until writers).map(_ =>
        new SnapshotStore(spark, root, manifestCommits = manifest))
      // scripts precomputed from the seed so the expectation is exact
      val rng = new scala.util.Random(seed)
      val scripts: Seq[Seq[(String, Int)]] = (0 until writers).map(w =>
        (0 until opsPer).map(i => (rng.nextInt(3) match {
          case 0 => "append"
          case 1 => "add"
          case 2 => "upsert"
        }, i)))
      inParallel(writers) { w =>
        val s = stores(w)
        scripts(w).foreach {
          case ("append", i) =>
            s.append("led", Seq((w * 100 + i, (w * 100 + i) % 4, s"w$w"))
              .toDF("k", "bucket", "v"), partitionCols = Seq("bucket"))
          case ("add", _) =>
            s.mergeAdditive("cnt", Seq((1L, 1L)).toDF("k", "n"),
              Seq("k"), Seq("n"), Nil, Nil)
          case ("upsert", i) =>
            s.mergeLastWriteWins("own",
              Seq((s"w$w", i)).toDF("k", "last"), Seq("k"))
          case _ => ()
        }
      }
      val s = stores.head
      // appends: every writer-tagged row present exactly once
      val appended = scripts.zipWithIndex.flatMap { case (ops, w) =>
        ops.collect { case ("append", i) => w * 100 + i } }.toSet
      if (appended.nonEmpty) {
        val rows = s.read("led").get.select("k").collect().map(_.getInt(0))
        assert(rows.length == appended.size && rows.toSet == appended,
          s"manifest=$manifest seed=$seed: appends lost or duplicated")
      }
      // additive: the shared counter holds the exact increment total
      val addTotal = scripts.flatten.count(_._1 == "add").toLong
      if (addTotal > 0)
        assert(s.read("cnt").get.select("n").collect().head.getLong(0)
          == addTotal, s"manifest=$manifest seed=$seed: increments lost")
      // upserts on writer-owned keys: each key holds ITS writer's last op
      val lastUpsert = scripts.zipWithIndex.flatMap { case (ops, w) =>
        ops.collect { case ("upsert", i) => (s"w$w", i) }
          .lastOption.toSeq }.toMap
      if (lastUpsert.nonEmpty) {
        val got = s.read("own").get.collect()
          .map(r => r.getString(0) -> r.getInt(1)).toMap
        assert(got == lastUpsert,
          s"manifest=$manifest seed=$seed: upsert state diverged")
      }
      // the version line is dense: every commit claimed its own version
      val commits = scripts.flatten.size
      val tableCommits = Seq("led", "cnt", "own")
        .flatMap(t => s.currentVersion(t).map(_ + 1)).sum
      assert(tableCommits == commits.toLong,
        s"manifest=$manifest seed=$seed: version line has gaps or overlaps " +
          s"($tableCommits committed versions for $commits ops)")
    }
}
