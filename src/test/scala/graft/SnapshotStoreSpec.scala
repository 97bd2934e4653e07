package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.SnapshotStore

/** Snapshot-merge semantics (SURVEY §7.4.1): versioning, last-write-
  * wins, insert-if-absent, additive counters (with the associativity
  * property the cross-run ledgers rely on), append.
  */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newStore() =
    new SnapshotStore(spark, Files.createTempDirectory("graft-store").toString)

  test("write/read round-trip with version bump") {
    val s = newStore()
    assert(s.read("t").isEmpty)
    val v0 = s.write("t", Seq((1, "a")).toDF("k", "v"))
    assert(v0 == 0 && s.currentVersion("t").contains(0L))
    val v1 = s.write("t", Seq((2, "b")).toDF("k", "v"))
    assert(v1 == 1)
    assert(s.read("t").get.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("mergeLastWriteWins: batch replaces prior rows on the key") {
    val s = newStore()
    s.write("cases", Seq((1, "old"), (2, "keep")).toDF("k", "v"))
    s.mergeLastWriteWins("cases", Seq((1, "new"), (3, "ins")).toDF("k", "v"), Seq("k"))
    val got = s.read("cases").get.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "new", 2 -> "keep", 3 -> "ins"))
  }

  test("mergeInsertIfAbsent: prior rows win (DO NOTHING semantics)") {
    val s = newStore()
    s.write("dims", Seq((1, "first")).toDF("k", "v"))
    s.mergeInsertIfAbsent("dims", Seq((1, "second"), (2, "new")).toDF("k", "v"), Seq("k"))
    val got = s.read("dims").get.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "first", 2 -> "new"))
  }

  test("mergeAdditive: counts add, first/last seen take extremes") {
    val s = newStore()
    s.write("var", Seq((1, 2L, 10L, 10L), (2, 1L, 5L, 5L))
      .toDF("k", "seen_count", "first_seen", "last_seen"))
    s.mergeAdditive("var", Seq((1, 3L, 8L, 20L), (3, 1L, 1L, 1L))
      .toDF("k", "seen_count", "first_seen", "last_seen"),
      Seq("k"), Seq("seen_count"), Seq("first_seen"), Seq("last_seen"))
    val got = s.read("var").get.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1 -> ((5L, 8L, 20L)), 2 -> ((1L, 5L, 5L)), 3 -> ((1L, 1L, 1L))))
  }

  test("mergeAdditive residual columns: batch wins when present, else prior") {
    val s = newStore()
    s.write("var", Seq((1, 1L, "old-label"), (2, 1L, "keep-me"), (3, 1L, null))
      .toDF("k", "seen_count", "label"))
    s.mergeAdditive("var",
      Seq((1, 1L, "new-label"), (2, 1L, null), (3, 1L, "filled"), (4, 1L, null))
        .toDF("k", "seen_count", "label"),
      Seq("k"), Seq("seen_count"), Seq.empty, Seq.empty)
    val got = s.read("var").get.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      1 -> ((2L, Some("new-label"))),  // batch overrides
      2 -> ((2L, Some("keep-me"))),    // batch null → prior survives
      3 -> ((2L, Some("filled"))),     // prior null → batch fills
      4 -> ((1L, None))))              // batch-only, null stays null
  }

  test("mergeAdditive associativity: split batch == one batch (G9 property)") {
    val full = Seq((1, 4L, 2L, 9L), (2, 2L, 1L, 3L))
      .toDF("k", "seen_count", "first_seen", "last_seen")
    val part1 = Seq((1, 1L, 5L, 9L), (2, 2L, 1L, 3L))
      .toDF("k", "seen_count", "first_seen", "last_seen")
    val part2 = Seq((1, 3L, 2L, 7L))
      .toDF("k", "seen_count", "first_seen", "last_seen")
    val sOne = newStore(); val sTwo = newStore()
    sOne.mergeAdditive("v", full, Seq("k"), Seq("seen_count"), Seq("first_seen"), Seq("last_seen"))
    sTwo.mergeAdditive("v", part1, Seq("k"), Seq("seen_count"), Seq("first_seen"), Seq("last_seen"))
    sTwo.mergeAdditive("v", part2, Seq("k"), Seq("seen_count"), Seq("first_seen"), Seq("last_seen"))
    def snap(s: SnapshotStore) = s.read("v").get.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(snap(sOne) == snap(sTwo))
  }

  test("append accumulates") {
    val s = newStore()
    s.append("ledger", Seq((1, "r1")).toDF("run_id", "x"))
    s.append("ledger", Seq((2, "r2")).toDF("run_id", "x"))
    assert(s.read("ledger").get.count() == 2)
  }

  private def partFiles(dir: java.nio.file.Path): Set[String] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
    } finally s.close()
  }

  test("partition-scoped merge rewrites only the touched partition dir") {
    val root = Files.createTempDirectory("graft-store")
    val s = new SnapshotStore(spark, root.toString)
    s.write("cases",
      Seq((1, 2019, "a"), (2, 2020, "b"), (3, 2021, "c"))
        .toDF("k", "filed_year", "v"), Seq("filed_year"))
    s.mergeLastWriteWins("cases",
      Seq((2, 2020, "b2"), (4, 2020, "d")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    val v0 = root.resolve("cases").resolve("v0")
    val v1 = root.resolve("cases").resolve("v1")
    // untouched years carry v0's data files forward unchanged (hardlink
    // = manifest reuse); ONLY the touched year got new files
    assert(partFiles(v1.resolve("filed_year=2019")) ==
      partFiles(v0.resolve("filed_year=2019")))
    assert(partFiles(v1.resolve("filed_year=2021")) ==
      partFiles(v0.resolve("filed_year=2021")))
    assert(partFiles(v1.resolve("filed_year=2020"))
      .intersect(partFiles(v0.resolve("filed_year=2020"))).isEmpty)
    val got = s.read("cases").get.collect()
      .map(r => r.getAs[Int]("k") -> ((r.getAs[Int]("filed_year"), r.getAs[String]("v")))).toMap
    assert(got == Map(1 -> ((2019, "a")), 2 -> ((2020, "b2")),
      3 -> ((2021, "c")), 4 -> ((2020, "d"))))
  }

  test("partition-scoped merge: key moving partitions rewrites both") {
    val s = newStore()
    // case 1 originally filed_year=2019; re-ingest corrects it to 2020 —
    // the stale 2019 row must NOT survive behind the partition scope
    s.write("cases", Seq((1, 2019, "orig"), (2, 2019, "stay"), (3, 2021, "far"))
      .toDF("k", "filed_year", "v"), Seq("filed_year"))
    s.mergeLastWriteWins("cases",
      Seq((1, 2020, "moved")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    val got = s.read("cases").get.collect()
      .map(r => r.getAs[Int]("k") -> ((r.getAs[Int]("filed_year"), r.getAs[String]("v")))).toMap
    assert(got == Map(1 -> ((2020, "moved")), 2 -> ((2019, "stay")),
      3 -> ((2021, "far"))))
  }

  test("collide hint: an exact hint reproduces the probed merge (moved " +
    "key included); a superset hint is harmless") {
    // contract: a caller that already knows the collide partitions (a
    // pruned sidecar lookup, StreamingAnn) may hand them over and the
    // merge skips its full-table key probe — results must be
    // indistinguishable from the probed path
    def run(hint: Option[Seq[Any]]) = {
      val s = newStore()
      s.write("cases", Seq((1, 2019, "orig"), (2, 2019, "stay"), (3, 2021, "far"))
        .toDF("k", "filed_year", "v"), Seq("filed_year"))
      s.mergeLastWriteWins("cases",
        Seq((1, 2020, "moved")).toDF("k", "filed_year", "v"),
        Seq("k"), partitionCols = Seq("filed_year"), collideHint = hint)
      s.read("cases").get.collect()
        .map(r => (r.getAs[Int]("k"), r.getAs[Int]("filed_year"),
          r.getAs[String]("v"))).toSet
    }
    val probed = run(None)
    assert(run(Some(Seq(2019))) == probed,
      "exact collide hint diverged from the probed merge")
    assert(run(Some(Seq(2019, 2021))) == probed,
      "superset collide hint diverged from the probed merge")
  }

  test("partition-scoped insert-if-absent and additive keep semantics") {
    val s = newStore()
    s.write("dims", Seq((1, 2019, "first")).toDF("k", "y", "v"), Seq("y"))
    s.mergeInsertIfAbsent("dims",
      Seq((1, 2020, "second"), (2, 2020, "new")).toDF("k", "y", "v"),
      Seq("k"), partitionCols = Seq("y"))
    val dims = s.read("dims").get.collect()
      .map(r => r.getAs[Int]("k") -> ((r.getAs[Int]("y"), r.getAs[String]("v")))).toMap
    assert(dims == Map(1 -> ((2019, "first")), 2 -> ((2020, "new"))))

    val t = newStore()
    t.write("var", Seq((1, 2019, 2L), (2, 2020, 1L)).toDF("k", "y", "n"), Seq("y"))
    t.mergeAdditive("var", Seq((1, 2019, 3L)).toDF("k", "y", "n"),
      Seq("k"), Seq("n"), Nil, Nil, partitionCols = Seq("y"))
    val vars = t.read("var").get.collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("n")).toMap
    assert(vars == Map(1 -> 5L, 2 -> 1L))
  }

  test("vacuum after scoped merge: linked data survives old-version delete") {
    val s = newStore()
    s.write("cases", Seq((1, 2019, "a"), (2, 2020, "b")).toDF("k", "filed_year", "v"),
      Seq("filed_year"))
    s.mergeLastWriteWins("cases", Seq((2, 2020, "b2")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    // v1's filed_year=2019 files are hard links into v0; vacuuming v0
    // drops one link, not the data
    assert(s.vacuum("cases", keepLast = 1) == Seq(0L))
    val got = s.read("cases").get.collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(got == Map(1 -> "a", 2 -> "b2"))
  }

  test("vacuum vs time travel: a held old-version frame breaks, current survives") {
    // Pins the documented single-writer assumption (vacuum deletes files
    // a concurrent reader of an OLD version could still hold open): a
    // DataFrame bound to a vacuumed version fails at scan time, while
    // readers of the CURRENT version are untouched. Operationally:
    // never vacuum below any version an external reader time-travels to.
    val s = newStore()
    s.write("t", Seq((1, "a")).toDF("k", "v"))           // v0
    s.write("t", Seq((1, "b")).toDF("k", "v"))           // v1
    val held = s.readVersion("t", 0).get                 // reader holds v0
    assert(held.count() == 1, "old version readable before vacuum")
    val current = s.read("t").get
    assert(s.vacuum("t", keepLast = 1) == Seq(0L))
    intercept[Exception](held.collect())                 // v0 files are gone
    assert(current.collect().map(_.getString(1)).toSeq == Seq("b"),
      "current-version reader unaffected by vacuum")
  }

  test("time travel + vacuum: old versions readable until reclaimed") {
    val s = newStore()
    s.write("t", Seq((1, "a")).toDF("k", "v"))            // v0
    s.write("t", Seq((1, "b"), (2, "c")).toDF("k", "v"))  // v1
    s.write("t", Seq((3, "d")).toDF("k", "v"))            // v2
    assert(s.versions("t") == Seq(0L, 1L, 2L))
    assert(s.readVersion("t", 0).get.count() == 1)
    assert(s.readVersion("t", 1).get.count() == 2)
    assert(s.read("t").get.collect().map(_.getInt(0)).toSeq == Seq(3))

    val dropped = s.vacuum("t", keepLast = 2)
    assert(dropped == Seq(0L))
    assert(s.readVersion("t", 0).isEmpty)
    assert(s.readVersion("t", 1).isDefined, "kept versions still readable")
    assert(s.read("t").get.count() == 1, "current snapshot unaffected")

    assert(s.vacuum("t", keepLast = 1) == Seq(1L))
    assert(s.versions("t") == Seq(2L))
    intercept[IllegalArgumentException](s.vacuum("t", keepLast = 0))
  }

  test("readChanges: insert/update/delete diff between versions; compaction is CDC-silent") {
    val s = newStore()
    s.write("t", Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "v", "w")) // v0
    s.write("t", Seq((1, "a", 10), (2, "B", 20), (4, "d", 40)).toDF("k", "v", "w")) // v1
    val ch = s.readChanges("t", 0, 1, Seq("k")).get.collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[String]("op")).toMap
    // k=1 identical -> absent; k=2 value changed; k=3 gone; k=4 new
    assert(ch == Map(2 -> "update", 3 -> "delete", 4 -> "insert"))
    val upd = s.readChanges("t", 0, 1, Seq("k")).get
      .filter(col("op") === "update").collect()(0)
    assert(upd.getAs[org.apache.spark.sql.Row]("before").getAs[String]("v") == "b")
    assert(upd.getAs[org.apache.spark.sql.Row]("after").getAs[String]("v") == "B")
    // a pure rewrite (here: identical content re-written as v2) emits nothing
    s.write("t", s.readVersion("t", 1).get)
    assert(s.readChanges("t", 1, 2, Seq("k")).get.isEmpty)
    assert(s.readChanges("t", 0, 99, Seq("k")).isEmpty, "unknown version -> None")
  }

  test("compact: rewrites only over-threshold partitions, links the rest") {
    val s = newStore()
    val root = {
      // write an initial two-partition table, then pile small files
      // onto year 2023 only via repeated 3-file appends
      s.write("cases",
        Seq((1, 2022, "a"), (2, 2023, "b")).toDF("k", "filed_year", "v"),
        partitionCols = Seq("filed_year"))
      for (i <- 3 to 11 by 3)
        s.append("cases",
          Seq((i, 2023, "x"), (i + 1, 2023, "y"), (i + 2, 2023, "z"))
            .toDF("k", "filed_year", "v").repartition(3),
          partitionCols = Seq("filed_year"))
      java.nio.file.Paths.get(s.read("cases").get.inputFiles.head
        .stripPrefix("file:")).getParent.getParent
    }
    import scala.jdk.CollectionConverters._
    def files(ver: Long, part: String) = {
      val d = root.getParent.resolve(s"v$ver").resolve(part)
      val l = Files.list(d)
      try l.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally l.close()
    }
    val cur = s.currentVersion("cases").get
    val before = s.read("cases").get.collect().map(r =>
      (r.getAs[Int]("k"), r.getAs[String]("v"))).toSet
    assert(files(cur, "filed_year=2023").size > 4, "setup piled small files")
    val coldBefore = files(cur, "filed_year=2022")

    val v = s.compact("cases", maxFilesPerPartition = 4)
    assert(v.contains(cur + 1))
    assert(files(v.get, "filed_year=2023").size == 1, "hot partition compacted")
    // the cold partition was hard-linked, not rewritten: same inode
    val coldAfter = files(v.get, "filed_year=2022")
    assert(coldAfter.map(_.getFileName.toString).toSet ==
      coldBefore.map(_.getFileName.toString).toSet)
    assert(Files.isSameFile(coldBefore.head, coldAfter.head),
      "cold partition files must be the same inode (linked)")
    // content identical, old version still time-travelable
    val after = s.read("cases").get.collect().map(r =>
      (r.getAs[Int]("k"), r.getAs[String]("v"))).toSet
    assert(after == before, "compaction must not change rows")
    assert(s.readVersion("cases", cur).get.count() == before.size)
    // everything under threshold now -> no-op, no new version
    assert(s.compact("cases", maxFilesPerPartition = 4).isEmpty)
  }

  // --- manifest commit mode (the object-store path: no hard links) ---

  private def caseMap(s: SnapshotStore) = s.read("cases").get.collect()
    .map(r => r.getAs[Int]("k") ->
      ((r.getAs[Int]("filed_year"), r.getAs[String]("v")))).toMap

  test("manifest merge writes ONLY touched-partition files; retained " +
      "partitions are resolved references") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-store")
    val s = new SnapshotStore(spark, root.toString, manifestCommits = true)
    s.write("cases",
      Seq((1, 2019, "a"), (2, 2020, "b"), (3, 2021, "c"))
        .toDF("k", "filed_year", "v"), Seq("filed_year"))
    s.mergeLastWriteWins("cases",
      Seq((2, 2020, "b2"), (4, 2020, "d")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    val v1 = root.resolve("cases").resolve("v1")
    // physically, v1 holds only the touched year
    assert(Files.isDirectory(v1.resolve("filed_year=2020")))
    assert(!Files.exists(v1.resolve("filed_year=2019")))
    assert(!Files.exists(v1.resolve("filed_year=2021")))
    assert(Files.readAllLines(v1.resolve("_manifest")).asScala.toSet ==
      Set("v0/filed_year=2019", "v0/filed_year=2021"))
    assert(caseMap(s) == Map(1 -> ((2019, "a")), 2 -> ((2020, "b2")),
      3 -> ((2021, "c")), 4 -> ((2020, "d"))))
    // a second merge must re-reference v0's untouched year RESOLVED
    // (manifests never chain through v1's manifest)
    s.mergeLastWriteWins("cases",
      Seq((3, 2021, "c2")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    val v2 = root.resolve("cases").resolve("v2")
    assert(Files.readAllLines(v2.resolve("_manifest")).asScala.toSet ==
      Set("v0/filed_year=2019", "v1/filed_year=2020"))
    assert(caseMap(s) == Map(1 -> ((2019, "a")), 2 -> ((2020, "b2")),
      3 -> ((2021, "c2")), 4 -> ((2020, "d"))))
    // CDC across manifest versions
    val ch = s.readChanges("cases", 1, 2, Seq("k")).get.collect()
    assert(ch.map(r => (r.getAs[Int]("k"), r.getAs[String]("op"))).toSet ==
      Set((3, "update")))
  }

  test("manifest vacuum reference-counts: dirs a retained manifest " +
      "lists survive the drop") {
    val root = Files.createTempDirectory("graft-store")
    val s = new SnapshotStore(spark, root.toString, manifestCommits = true)
    s.write("cases",
      Seq((1, 2019, "a"), (2, 2020, "b"), (3, 2021, "c"))
        .toDF("k", "filed_year", "v"), Seq("filed_year"))
    s.mergeLastWriteWins("cases",
      Seq((2, 2020, "b2")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    s.mergeLastWriteWins("cases",
      Seq((3, 2021, "c2")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    val before = caseMap(s)
    assert(s.vacuum("cases") == Seq(0, 1))
    // v0 survives as storage (v2 references its 2019) but is no
    // longer a readable version; v1's 2020 likewise
    val cases = root.resolve("cases")
    assert(Files.isDirectory(cases.resolve("v0").resolve("filed_year=2019")))
    assert(Files.isDirectory(cases.resolve("v1").resolve("filed_year=2020")))
    // v0's superseded partitions were reclaimed
    assert(!Files.exists(cases.resolve("v0").resolve("filed_year=2020")))
    assert(!Files.exists(cases.resolve("v0").resolve("filed_year=2021")))
    assert(s.readVersion("cases", 0).isEmpty)
    assert(s.readVersion("cases", 1).isEmpty)
    assert(s.versions("cases") == Seq(2))
    assert(caseMap(s) == before, "current version must survive vacuum intact")
    assert(s.vacuum("cases").isEmpty, "vacuum is idempotent")
  }

  test("manifest compact rewrites only the over-threshold partition") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-store")
    val s = new SnapshotStore(spark, root.toString, manifestCommits = true)
    s.write("cases",
      Seq((1, 2022, "a"), (2, 2023, "b")).toDF("k", "filed_year", "v"),
      partitionCols = Seq("filed_year"))
    for (i <- 3 to 11 by 3)
      s.append("cases",
        Seq((i, 2023, "x"), (i + 1, 2023, "y"), (i + 2, 2023, "z"))
          .toDF("k", "filed_year", "v").repartition(3),
        partitionCols = Seq("filed_year"))
    val before = caseMap(s)
    val cur = s.currentVersion("cases").get
    val v = s.compact("cases", maxFilesPerPartition = 4)
    assert(v.contains(cur + 1))
    val vDir = root.resolve("cases").resolve(s"v${v.get}")
    def nFiles(d: java.nio.file.Path) = {
      val l = Files.list(d)
      try l.iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      finally l.close()
    }
    assert(nFiles(vDir.resolve("filed_year=2023")) == 1, "hot partition compacted")
    // the cold partition stayed where it was: a manifest line, no dir
    assert(!Files.exists(vDir.resolve("filed_year=2022")))
    assert(Files.readAllLines(vDir.resolve("_manifest")).asScala.toSet ==
      Set("v0/filed_year=2022"))
    assert(caseMap(s) == before, "compaction must not change rows")
    assert(s.compact("cases", maxFilesPerPartition = 4).isEmpty)
  }

  test("manifest commit crash between version write and pointer swap: " +
      "old version stays live, re-run converges") {
    val root = Files.createTempDirectory("graft-store")
    val s = new SnapshotStore(spark, root.toString, manifestCommits = true)
    s.write("cases",
      Seq((1, 2019, "a"), (2, 2020, "b"), (3, 2021, "c"))
        .toDF("k", "filed_year", "v"), Seq("filed_year"))
    val before = caseMap(s)
    val batch = Seq((2, 2020, "b2"), (4, 2020, "d"))
      .toDF("k", "filed_year", "v")
    // crash AFTER v1 (data + manifest) is fully on disk, BEFORE the
    // pointer swap — the exact window the protocol claims is safe
    s.beforeSwap = (_, _) => throw new RuntimeException("crash before swap")
    intercept[RuntimeException] {
      s.mergeLastWriteWins("cases", batch, Seq("k"),
        partitionCols = Seq("filed_year"))
    }
    // the orphaned v1 exists on disk but is invisible: pointer, read(),
    // and time travel all still serve v0
    assert(Files.isDirectory(root.resolve("cases").resolve("v1")))
    assert(s.currentVersion("cases").contains(0L))
    assert(caseMap(s) == before, "reader after the crash must see v0")
    // a second store instance (the restarted writer) re-runs the same
    // merge: it re-derives next = 1, overwrites the orphan, and commits
    val s2 = new SnapshotStore(spark, root.toString, manifestCommits = true)
    val v = s2.mergeLastWriteWins("cases", batch, Seq("k"),
      partitionCols = Seq("filed_year"))
    assert(v == 1L && s2.currentVersion("cases").contains(1L))
    assert(caseMap(s2) == Map(1 -> ((2019, "a")), 2 -> ((2020, "b2")),
      3 -> ((2021, "c")), 4 -> ((2020, "d"))))
    assert(s2.readVersion("cases", 0).isDefined, "time travel to v0 intact")
  }

  test("manifest mode: a reader holding the current snapshot survives " +
      "a concurrent vacuum") {
    val root = Files.createTempDirectory("graft-store")
    val s = new SnapshotStore(spark, root.toString, manifestCommits = true)
    s.write("cases",
      Seq((1, 2019, "a"), (2, 2020, "b"), (3, 2021, "c"))
        .toDF("k", "filed_year", "v"), Seq("filed_year"))
    s.mergeLastWriteWins("cases",
      Seq((2, 2020, "b2")).toDF("k", "filed_year", "v"),
      Seq("k"), partitionCols = Seq("filed_year"))
    // the reader binds to v1 BEFORE vacuum; v1's manifest references
    // v0's physical dirs, which the vacuum's reference counting must
    // keep while it reclaims the rest of v0
    val held = s.read("cases").get
    assert(s.vacuum("cases", keepLast = 1) == Seq(0L))
    val got = held.collect()
      .map(r => r.getAs[Int]("k") ->
        ((r.getAs[Int]("filed_year"), r.getAs[String]("v")))).toMap
    assert(got == Map(1 -> ((2019, "a")), 2 -> ((2020, "b2")),
      3 -> ((2021, "c"))), "mid-flight reader broken by vacuum")
  }

  test("clustered writes stay sorted AT SCALE: the writer's implicit " +
    "partition-cols sort must never scramble sortCols (r11 regression)") {
    // FileFormatWriter injects an UNSTABLE sort by the partition
    // columns when its input isn't already ordered by them — at sf10
    // it scrambled a 788k-row bucket that small fixtures left intact
    // (the pre-fix spec passed spuriously at sf0.001). This pins the
    // invariant at a row count where the instability actually bites:
    // every written file must be sorted by the cluster key, for both
    // the fresh-write path and the partition-scoped merge path.
    import org.apache.spark.sql.functions._
    val store = newStore()
    val big = spark.range(400000L)
      .select((col("id") % 2).cast("int").as("bucket"),
        concat(lit("k"), ((col("id") * 48271L) % 1000003L)).as("key"),
        col("id").as("payload"))
    store.mergeLastWriteWins("t", big, Seq("key"),
      partitionCols = Seq("bucket"), sortCols = Seq("key"))
    val batch = spark.range(50L)
      .select(lit(0).cast("int").as("bucket"),
        concat(lit("k"), col("id")).as("key"), lit(-1L).as("payload"))
    store.mergeLastWriteWins("t", batch, Seq("key"),
      partitionCols = Seq("bucket"), sortCols = Seq("key"))
    val root = java.nio.file.Paths.get(store.read("t").get.inputFiles(0))
      .getParent.getParent.getParent
    val files = store.read("t").get.inputFiles
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = spark.read.parquet(f).select("key")
        .collect().map(_.getString(0)).toSeq
      assert(keys == keys.sorted,
        s"file $f lost its cluster sort (root $root) — the writer's " +
          "partition-cols sort scrambled it")
    }
  }

  test("additive schema evolution (opt-in): a new column backfills null " +
    "on retained partitions, a missing column fills null on the batch, " +
    "compaction crosses the mixed-schema dirs — strict stores still reject") {
    import org.apache.spark.sql.functions.col
    // strict (default) store keeps today's error on a widened batch
    val strict = newStore()
    strict.mergeLastWriteWins("t", Seq((1L, 0, "a")).toDF("k", "bucket", "v"),
      Seq("k"), partitionCols = Seq("bucket"))
    intercept[Exception] {
      strict.mergeLastWriteWins("t",
        Seq((2L, 1, "b", 9L)).toDF("k", "bucket", "v", "score"),
        Seq("k"), partitionCols = Seq("bucket"))
    }
    for (manifest <- Seq(false, true)) {
      val s = new SnapshotStore(spark,
        Files.createTempDirectory("graft-evolve").toString,
        manifestCommits = manifest, allowSchemaEvolution = true)
      s.mergeLastWriteWins("t", Seq((1L, 0, "a"), (2L, 1, "b"))
        .toDF("k", "bucket", "v"), Seq("k"), partitionCols = Seq("bucket"))
      // widened batch touches ONLY bucket 1; bucket 0's file is
      // RETAINED (hard link / manifest ref) and predates the column
      s.mergeLastWriteWins("t",
        Seq((2L, 1, "b2", 9L)).toDF("k", "bucket", "v", "score"),
        Seq("k"), partitionCols = Seq("bucket"))
      val out = s.read("t").get
      assert(out.columns.toSet == Set("k", "bucket", "v", "score"),
        s"manifest=$manifest: table schema did not widen")
      def byK(df: org.apache.spark.sql.DataFrame) = df
        .select("k", "v", "score").collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(byK(out) == Map(
        1L -> (Some("a"), None), 2L -> (Some("b2"), Some(9L))),
        s"manifest=$manifest: retained rows misread under the new schema")
      // a NARROW batch (missing v) fills null on its own rows only
      s.mergeLastWriteWins("t", Seq((3L, 0, 7L)).toDF("k", "bucket", "score"),
        Seq("k"), partitionCols = Seq("bucket"))
      assert(byK(s.read("t").get) == Map(
        1L -> (Some("a"), None), 2L -> (Some("b2"), Some(9L)),
        3L -> (None, Some(7L))),
        s"manifest=$manifest: narrow batch misaligned")
      // compaction reads across the mixed-schema dirs and keeps rows
      s.compact("t", maxFilesPerPartition = 1)
      assert(byK(s.read("t").get).size == 3,
        s"manifest=$manifest: compaction lost rows across schema versions")
      // time travel: the pre-evolution version still reads with ITS schema
      assert(s.readVersion("t", 0L).get.columns.toSet ==
        Set("k", "bucket", "v"),
        s"manifest=$manifest: old version's schema drifted")
    }
  }

  test("type-widening schema evolution (opt-in): int→long and " +
    "float→double widen the table, narrow late batches up-cast, " +
    "retained narrow-typed files read under the wide sidecar schema, " +
    "compaction crosses mixed-width dirs") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DoubleType, LongType}
    for (manifest <- Seq(false, true)) {
      val s = new SnapshotStore(spark,
        Files.createTempDirectory("graft-widen").toString,
        manifestCommits = manifest, allowSchemaEvolution = true)
      s.mergeLastWriteWins("t",
        Seq((1L, 0, 5, 1.5f), (2L, 1, 6, 2.5f)).toDF("k", "bucket", "n", "x"),
        Seq("k"), partitionCols = Seq("bucket"))
      // wide batch touches ONLY bucket 1; bucket 0's file is RETAINED
      // (hard link / manifest ref) and still holds int32/float pages
      s.mergeLastWriteWins("t",
        Seq((2L, 1, 9L, 9.5d)).toDF("k", "bucket", "n", "x"),
        Seq("k"), partitionCols = Seq("bucket"))
      val out = s.read("t").get
      assert(out.schema("n").dataType == LongType &&
        out.schema("x").dataType == DoubleType,
        s"manifest=$manifest: table types did not widen")
      def byK = s.read("t").get.select("k", "n", "x").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(byK == Map(1L -> ((5L, 1.5d)), 2L -> ((9L, 9.5d))),
        s"manifest=$manifest: retained narrow files misread under wide schema")
      // a LATE NARROW writer (still int/float) up-casts to the table's
      // established wide type instead of erroring
      s.mergeLastWriteWins("t",
        Seq((3L, 0, 7, 3.5f)).toDF("k", "bucket", "n", "x"),
        Seq("k"), partitionCols = Seq("bucket"))
      assert(byK == Map(1L -> ((5L, 1.5d)), 2L -> ((9L, 9.5d)),
        3L -> ((7L, 3.5d))),
        s"manifest=$manifest: narrow late batch misaligned")
      // compaction reads across mixed-width dirs and keeps values
      s.compact("t", maxFilesPerPartition = 1)
      assert(byK.size == 3,
        s"manifest=$manifest: compaction lost rows across width versions")
      // time travel: the pre-widening version reads with ITS narrow schema
      assert(s.readVersion("t", 0L).get.schema("n").dataType ==
        org.apache.spark.sql.types.IntegerType,
        s"manifest=$manifest: old version's narrow schema drifted")
    }
  }

  test("readChanges is partition-restricted: a feed step reads ONLY " +
    "the partitions whose physical dirs changed (both commit modes) — " +
    "what keeps a follow step O(changed partitions), not O(corpus)") {
    import org.apache.spark.sql.functions.col
    for (manifest <- Seq(false, true)) {
      val s = new SnapshotStore(spark,
        Files.createTempDirectory("graft-cdc-pruned").toString,
        manifestCommits = manifest)
      val v0 = (0L until 32L).map(k => (k, (k % 8).toInt, s"v$k"))
        .toDF("k", "bucket", "v")
      s.mergeLastWriteWins("t", v0, Seq("k"), partitionCols = Seq("bucket"))
      // touch ONLY bucket 3: one update, one insert
      s.mergeLastWriteWins("t",
        Seq((3L, 3, "updated"), (103L, 3, "new")).toDF("k", "bucket", "v"),
        Seq("k"), partitionCols = Seq("bucket"))
      val d = s.readChanges("t", 0L, 1L, Seq("k")).get
      val got = d.select("k", "op").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(3L -> "update", 103L -> "insert"),
        s"manifest=$manifest: restricted diff lost or invented changes")
      // the diff's scans must touch no untouched bucket's files
      val buckets = d.inputFiles.flatMap(
        "bucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).toSet
      assert(buckets == Set(3),
        s"manifest=$manifest: diff read buckets $buckets — not just the touched one")
      // a no-op transition (pure compaction rewrite) stays CDC-silent
      // and a fully-retained feed step reads nothing at all
      s.mergeLastWriteWins("t",
        Seq((200L, 5, "x")).toDF("k", "bucket", "v"), Seq("k"),
        partitionCols = Seq("bucket"))
      val d2 = s.readChanges("t", 1L, 2L, Seq("k")).get
      assert(d2.inputFiles.forall(_.contains("bucket=5")),
        s"manifest=$manifest: second step read beyond its touched bucket")
      assert(d2.collect().map(_.getLong(0)).toSeq == Seq(200L))
    }
  }

  test("readChanges across a schema-evolution boundary: the follower " +
    "sees null-filled/up-cast before structs instead of an analysis error") {
    val s = new SnapshotStore(spark,
      Files.createTempDirectory("graft-cdc-evolve").toString,
      allowSchemaEvolution = true)
    s.write("t", Seq((1L, 5), (2L, 6)).toDF("k", "n"))             // v0
    s.mergeLastWriteWins("t",
      Seq((2L, 60L, "new")).toDF("k", "n", "tag"), Seq("k"))        // v1: +tag, n→long
    val ch = s.readChanges("t", 0L, 1L, Seq("k")).get
      .orderBy("k").collect()
    assert(ch.length == 1, "only k=2 changed")
    val r = ch.head
    assert(r.getLong(0) == 2L && r.getString(1) == "update")
    val before = r.getStruct(2)
    val after = r.getStruct(3)
    assert(before.getLong(before.fieldIndex("n")) == 6L &&
      before.isNullAt(before.fieldIndex("tag")),
      "before struct not aligned to the union schema")
    assert(after.getLong(after.fieldIndex("n")) == 60L &&
      after.getString(after.fieldIndex("tag")) == "new")
  }

  test("a fully-drained partitioned table stays readable (both commit " +
    "modes) and refills through the layout-change path") {
    // Spark writes NO data files for an empty partitionBy commit (just
    // _SUCCESS), so a keyScope merge that deletes every remaining row —
    // a total erasure — used to leave an uninferrable version. The
    // empty commit now lands unpartitioned with its full schema.
    import org.apache.spark.sql.functions._
    for (manifest <- Seq(false, true)) {
      val s = new SnapshotStore(spark,
        Files.createTempDirectory("graft-drain").toString,
        manifestCommits = manifest)
      val rows = Seq((1L, 0, "a"), (2L, 1, "b")).toDF("k", "bucket", "v")
      s.mergeLastWriteWins("t", rows, Seq("k"), partitionCols = Seq("bucket"))
      // drain EVERYTHING: empty batch, keyScope = all live keys
      s.mergeLastWriteWins("t", rows.filter(lit(false)), Seq("k"),
        partitionCols = Seq("bucket"),
        keyScope = Some(rows.select("k")))
      val drained = s.read("t").get
      assert(drained.isEmpty, s"manifest=$manifest: drain left rows")
      assert(drained.columns.toSet == Set("k", "bucket", "v"),
        s"manifest=$manifest: drained table lost its schema")
      // refill: the next merge takes the layout-change full-rewrite
      // path and re-establishes the hive layout
      s.mergeLastWriteWins("t", Seq((3L, 0, "c")).toDF("k", "bucket", "v"),
        Seq("k"), partitionCols = Seq("bucket"))
      assert(s.read("t").get.collect().map(_.getLong(0)).toSeq == Seq(3L))
      // vacuum across the drained version stays safe
      s.vacuum("t", keepLast = 1)
      assert(s.read("t").get.count() == 1L)
    }
  }
}
