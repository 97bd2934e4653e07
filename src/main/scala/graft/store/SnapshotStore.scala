package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mutable-store emulation over immutable Parquet (SURVEY §7.4.1).
  *
  * The reference gets row-level upserts from Postgres (`ON CONFLICT`,
  * `RETURNING`, ingest.py:613-644); Spark tables are immutable, so
  * each logical table is a directory of versioned snapshots plus a
  * `_current` pointer written via atomic rename. A merge job reads
  * snapshot vN and the batch delta, writes vN+1, and swaps the
  * pointer — readers see either vN or vN+1, never a partial write.
  * On a cluster the pointer swap would be a metastore/lakehouse
  * commit; the protocol is identical.
  *
  * Merge flavors cover every reference write path:
  *   - [[mergeLastWriteWins]]  → `cases` upsert (S4)
  *   - [[mergeInsertIfAbsent]] → dims + `case_parties` DO NOTHING
  *     (S5/S6)
  *   - [[mergeAdditive]]       → variation `seen_count` accumulation
  *     (G9) and error `retry_count` (G11): counts add, first_seen
  *     takes least, last_seen takes greatest — associative, so
  *     splitting a batch and merging twice equals one merge
  *     (property-tested).
  *   - [[append]]              → run ledger / quarantine (S3/S7)
  *
  * Two COMMIT MODES for the partition-scoped paths, chosen at
  * construction:
  *   - link (default): untouched partition dirs of the prior snapshot
  *     hard-link into the new version (one filesystem, zero data
  *     movement; `linkTree` degrades to copies where links are
  *     unsupported).
  *   - manifest (`manifestCommits = true`): the new version carries a
  *     `_manifest` file listing the PHYSICAL partition dirs it retains
  *     from older versions — the Delta/Iceberg commit model, and the
  *     only one that stays O(touched partitions) on S3-like stores
  *     with no hard links. Manifests always point at physical dirs
  *     (references resolve before writing), so reads never chase
  *     chains, and [[vacuum]] reference-counts: a dropped version's
  *     dirs survive while any retained version's manifest lists them.
  */
/** @param allowSchemaEvolution opt-in schema evolution (the
  *   reference's `ALTER TABLE` moment): a merge batch may carry
  *   columns the table lacks (they backfill null on prior rows),
  *   omit columns it has (they fill null on the batch), or carry a
  *   shared column at a WIDER numeric type (int→long, float→double —
  *   the table's column widens; the reverse narrows the BATCH up to
  *   the table's wider type, so a late narrow writer still merges).
  *   Off by default — silent column alignment would also swallow
  *   typos, so a store keeps today's strict-schema error unless
  *   evolution is asked for. Works WITH partition-scoped commits:
  *   every version records its schema in a `_schema` sidecar and
  *   reads apply it explicitly, so retained (hard-linked /
  *   manifest-referenced) partitions whose files predate a new column
  *   read it as null, and files written at the narrow type read under
  *   the widened sidecar schema (Spark 4's parquet readers up-cast
  *   int32→int64 / float→double pages — spec-pinned across both
  *   commit modes, compaction, and time travel).
  */
/** @param claimTimeoutMs how long another writer's version claim is
  *   honored WITHOUT a heartbeat refresh before it is presumed crashed
  *   and stolen (see [[CommitGuard]]). A live writer's claim is
  *   refreshed every claimTimeoutMs/4 for as long as its commit runs,
  *   so arbitrarily long commits (folds, compactions, corpus rewrites)
  *   are never stolen from a healthy process — the timeout only has to
  *   outlive a heartbeat gap, not a whole commit.
  */
object SnapshotStore {
  /** Broadcast-hint a batch-derived key frame when it is ACTUALLY
    * small — decided by counting it, not by the planner's estimate.
    * Plans flowing out of the change feed carry a join's worst-case
    * size estimate (no column stats → the planner multiplies input
    * sizes), and `localCheckpoint` preserves that origin estimate, so
    * every downstream anti/semi join against a corpus-sized table
    * silently demotes to a sort-merge join that shuffles the big side
    * — measured on the CDC chain: a 50-key feed step shuffled the
    * entire postings table (479 MB) where the directly-read twin
    * shuffled 0.4 MB. The count is one cheap job over the (eagerly
    * checkpointed, so counted-once-then-reused) key frame; frames
    * above the threshold keep the planner's choice so a genuinely
    * corpus-sized key set (a resync delete) can never OOM the driver.
    */
  private[graft] def broadcastIfSmall(df: DataFrame,
      maxRows: Long = 2000000L): DataFrame = {
    val m = df.localCheckpoint(true)
    if (m.count() <= maxRows) broadcast(m) else m
  }

  /** Thrown (and caught inside [[SnapshotStore]]'s commit loop) when a
    * writer discovers, immediately before its pointer swap, that its
    * version claim was stolen — the commit aborts and retries on top of
    * whatever the thief committed instead of racing it for the pointer.
    */
  private[graft] final class ClaimLostException(table: String, version: Long)
    extends RuntimeException(
      s"claim on $table v$version lost to another writer — retrying")

  /** One JVM-wide daemon thread drives every in-flight commit's claim
    * heartbeat (tasks are scheduled per commit and cancelled when it
    * finishes — a heartbeat is a sub-millisecond stat+rename, so one
    * thread serves any realistic number of concurrent commits).
    */
  private lazy val heartbeatExec =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "snapshot-store-claim-heartbeat")
        t.setDaemon(true)
        t
      })
}

/** The commit-serialization primitive a [[SnapshotStore]] builds its
  * optimistic version-claim CAS from — abstracted so the POSIX file
  * implementation ([[FileCommitGuard]]) can be swapped for an
  * object-store equivalent without touching the commit protocol:
  *   - S3: a conditional `PutObject` with `If-None-Match: *` on the
  *     claim key (or, pre-2024, the external commit/locking service the
  *     Delta S3 LogStore uses — DynamoDB conditional writes);
  *   - GCS: `x-goog-if-generation-match: 0`;
  *   - Azure ADLS/ABFS: blob lease acquisition, or an ETag-conditional
  *     create.
  * The heartbeat maps to refreshing the claim object's payload (or
  * renewing the lease); `stillHeld` to a read-back of the nonce. The
  * contract is claim-per-(table, version): `tryClaim` is an atomic
  * create-if-absent, a claim not refreshed within the timeout may be
  * stolen, and a holder must re-verify with [[stillHeld]] immediately
  * before publishing its commit.
  */
trait CommitGuard {
  /** One CAS attempt: true = this guard instance now owns the claim.
    * A stale claim (older than the timeout, unreadable, or stamped in
    * the far future by a skewed clock) is removed and the attempt
    * reports false — the caller's retry loop re-reads the pointer
    * before trying again.
    */
  def tryClaim(table: String, version: Long): Boolean

  /** Refresh the claim's liveness stamp so a LONG commit (a fold, a
    * compaction, a full rewrite at corpus scale) is not mistaken for a
    * crashed writer and stolen mid-write. No-op if the claim is no
    * longer this guard's (never resurrects a stolen claim).
    */
  def heartbeat(table: String, version: Long): Unit

  /** Does the claim still carry THIS guard's nonce? Checked immediately
    * before the pointer swap: false means a steal happened (the
    * heartbeat bounds that to pathological stalls) and the commit must
    * abort rather than race the thief for the pointer.
    */
  def stillHeld(table: String, version: Long): Boolean

  /** Release the claim (only if still this guard's — an unconditional
    * delete could remove a thief's fresh claim).
    */
  def release(table: String, version: Long): Unit
}

/** The POSIX implementation: an O_EXCL claim file per (table, version)
  * under the store root, body = `<nonce> <millis>`. See [[CommitGuard]]
  * for the object-store mappings of each primitive.
  */
final class FileCommitGuard(root: String, claimTimeoutMs: Long)
    extends CommitGuard {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private val writerNonce = java.util.UUID.randomUUID().toString

  private def claimFile(table: String, version: Long) =
    Paths.get(root, table).resolve(s"_claim.v$version")

  def tryClaim(table: String, version: Long): Boolean = {
    val f = claimFile(table, version)
    try {
      Files.createDirectories(Paths.get(root, table))
      Files.writeString(f, s"$writerNonce ${System.currentTimeMillis()}",
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val txt = try Files.readString(f)
          catch { case _: java.io.IOException => return false }
        // unparsable claim = no live owner to honor — treat as stale;
        // |age| catches a FUTURE-stamped claim too (cross-process clock
        // skew), which would otherwise never age out and spin every
        // waiter forever
        val age = txt.split(' ').lift(1).flatMap(_.toLongOption)
          .map(System.currentTimeMillis() - _).getOrElse(Long.MaxValue)
        if (age > claimTimeoutMs || age < -claimTimeoutMs) {
          try { if (Files.readString(f) == txt) Files.delete(f) }
          catch { case _: java.io.IOException => () }
        }
        false
    }
  }

  def heartbeat(table: String, version: Long): Unit = {
    val f = claimFile(table, version)
    try {
      if (Files.readString(f).startsWith(s"$writerNonce ")) {
        // atomic replace via tmp+move so a concurrent staleness read
        // never sees a torn body
        val tmp = f.resolveSibling(f.getFileName.toString + s".hb.$writerNonce")
        Files.writeString(tmp, s"$writerNonce ${System.currentTimeMillis()}")
        Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    } catch { case _: java.io.IOException => () }
  }

  def stillHeld(table: String, version: Long): Boolean =
    try Files.readString(claimFile(table, version))
      .startsWith(s"$writerNonce ")
    catch { case _: java.io.IOException => false }

  def release(table: String, version: Long): Unit = {
    val f = claimFile(table, version)
    try { if (Files.readString(f).startsWith(s"$writerNonce ")) Files.delete(f) }
    catch { case _: java.io.IOException => () }
  }
}

/** @param commitGuard the claim primitive (see [[CommitGuard]]) —
  *   defaults to the POSIX O_EXCL file implementation; an object-store
  *   deployment swaps in its conditional-put equivalent here without
  *   touching the commit protocol.
  */
final class SnapshotStore(spark: SparkSession, root: String,
    manifestCommits: Boolean = false,
    allowSchemaEvolution: Boolean = false,
    claimTimeoutMs: Long = 600000L,
    commitGuard: Option[CommitGuard] = None) {

  private def tableDir(table: String) = Paths.get(root, table)
  private def pointer(table: String) = tableDir(table).resolve("_current")

  def currentVersion(table: String): Option[Long] = {
    val p = pointer(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  def read(table: String): Option[DataFrame] =
    currentVersion(table).flatMap(readVersion(table, _))

  private def manifestFile(dir: java.nio.file.Path) = dir.resolve("_manifest")
  private def vacuumedMark(dir: java.nio.file.Path) = dir.resolve("_vacuumed")
  private def schemaFile(dir: java.nio.file.Path) = dir.resolve("_schema")

  /** The logical schema a version was committed with (None for
    * versions written before the sidecar existed — those fall back to
    * parquet inference, today's behavior). Applying it explicitly at
    * read time is what makes ADDITIVE evolution work with retained
    * partitions: files that predate a column read it as null, with no
    * mergeSchema footer sweep.
    */
  private def storedSchema(table: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] = {
    val f = schemaFile(tableDir(table).resolve(s"v$version"))
    if (!Files.exists(f)) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(Files.readString(f))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** The PHYSICAL hive partition dirs backing a version: its own dirs
    * plus, for a manifest version, the older-version dirs its manifest
    * retains (physical by construction — manifests are written
    * resolved, never chained). MULTI-PATH: a partition name may map to
    * SEVERAL physical dirs — the segment-append commit
    * ([[appendFiles]]) adds a new generation dir per append while the
    * manifest keeps referencing the prior generations' dirs, so a
    * partition's rows are the UNION of its dirs. Merge commits write
    * one own dir per touched partition and reference untouched
    * partitions only (never both for one name), so their reads are
    * unchanged by the union semantics.
    */
  private def physicalParts(table: String,
      version: Long): Map[String, Seq[java.nio.file.Path]] = {
    val dir = tableDir(table).resolve(s"v$version")
    if (!Files.isDirectory(dir)) return Map.empty
    val own: Seq[(String, java.nio.file.Path)] = {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.contains("="))
        .map(p => p.getFileName.toString -> p).toSeq
      finally s.close()
    }
    val mf = manifestFile(dir)
    val refs: Seq[(String, java.nio.file.Path)] =
      if (!Files.exists(mf)) Nil
      else Files.readAllLines(mf).asScala.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('/')
        line.substring(i + 1) ->
          tableDir(table).resolve(line.substring(0, i)).resolve(line.substring(i + 1))
      }.toSeq
    (refs ++ own).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sortBy(_.toString)).toMap
  }

  /** Read a set of physical partition dirs as one frame, grouping by
    * containing version dir so each read's `basePath` recovers the
    * hive partition column. `schema`, when given, applies to every
    * read (see [[storedSchema]] — evolution across retained dirs).
    */
  private def readParts(paths: Iterable[java.nio.file.Path],
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    paths.groupBy(_.getParent).toSeq.sortBy(_._1.toString)
      .map { case (vdir, ps) =>
        val r = spark.read.option("basePath", vdir.toString)
        schema.fold(r)(r.schema)
          .parquet(ps.map(_.toString).toSeq.sorted: _*)
      }.reduce(_ unionByName _)

  /** Time travel: read a specific retained snapshot version (None if
    * that version was never written or has been vacuumed).
    */
  def readVersion(table: String, version: Long): Option[DataFrame] = {
    val dir = tableDir(table).resolve(s"v$version")
    if (!Files.isDirectory(dir) || Files.exists(vacuumedMark(dir))) None
    else {
      val schema = storedSchema(table, version)
      def plainRead = schema
        .fold(spark.read)(spark.read.schema)
        .parquet(dir.toString)
      if (Files.exists(manifestFile(dir))) {
        val parts = physicalParts(table, version)
        // a manifest with no partitions (a drained commit) reads the
        // version dir itself — the empty schema-bearing rewrite
        if (parts.isEmpty) Some(plainRead)
        else Some(readParts(parts.values.flatten, schema))
      } else Some(plainRead)
    }
  }

  /** Versions currently readable for a table, ascending (vacuumed
    * version dirs that persist only as storage for newer manifests are
    * excluded).
    */
  def versions(table: String): Seq[Long] = {
    val dir = tableDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      // a dir NEWER than the pointer is an in-flight (claimed, not yet
      // swapped) or orphaned commit — not a readable version
      val cur = currentVersion(table).getOrElse(-1L)
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+") &&
          !Files.exists(vacuumedMark(p)))
        .map(_.getFileName.toString.drop(1).toLong)
        .filter(_ <= cur).toSeq.sorted
      finally s.close()
    }
  }

  /** Drop all but the newest `keepLast` versions of a table (never the
    * current pointer's target). The reclamation pass every versioned
    * store needs — old snapshots otherwise accumulate one full table
    * copy per merge. Readers of the CURRENT version are unaffected:
    * only strictly older directories are removed.
    */
  def vacuum(table: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current version")
    val cur = currentVersion(table).getOrElse(return Seq.empty)
    val all = versions(table)
    val drop = all.filter(_ <= cur).dropRight(keepLast)
      .filterNot(_ == cur)
    // physical dirs any RETAINED version's manifest still references —
    // those survive the drop (manifest-mode reference counting; in
    // link mode the set is empty and whole dirs delete, link counts
    // keeping shared file data alive)
    val referenced: Set[java.nio.file.Path] = all.diff(drop)
      .flatMap(v => physicalParts(table, v).values.flatten)
      .map(_.toAbsolutePath.normalize).toSet
    drop.foreach { v =>
      val dir = tableDir(table).resolve(s"v$v")
      val keep = referenced.filter(_.getParent ==
        dir.toAbsolutePath.normalize)
      def deleteTree(p: java.nio.file.Path): Unit = {
        val s = Files.walk(p)
        // deleteIfExists: two concurrent vacuums may race on the same
        // reclaimable dirs — losing that race is success, not an error
        try s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists)
        finally s.close()
      }
      if (keep.isEmpty) deleteTree(dir)
      else {
        // partially reclaimed: this dir is now pure storage for newer
        // manifests — no longer a readable version
        val s = Files.list(dir)
        try s.iterator().asScala.toSeq
          .filterNot(p => keep.contains(p.toAbsolutePath.normalize))
          .foreach(deleteTree)
        finally s.close()
        Files.writeString(vacuumedMark(dir), "")
      }
    }
    drop
  }

  // ---- optimistic concurrency: the version-claim CAS -------------------
  //
  // The reference gets multi-writer safety from Postgres transactions
  // (ingest.py:613-644 upserts run under MVCC; commit batching
  // ingest.py:716-722); a snapshot store must build it from filesystem
  // primitives. Without it, two writers both read currentVersion=N,
  // both write vN+1 (the second `mode("overwrite")` clobbers the
  // first's dir), and both swap — one merge silently vanishes. The
  // colliding workloads are real: the CLI `follow` daemon, streaming
  // index maintainers, and batch ingest are all designed to run
  // against one store.
  //
  // Protocol (the lakehouse optimistic-commit model, e.g. Delta's
  // PutIfAbsent log entry, expressed as an O_EXCL claim file):
  //   1. read currentVersion = N; the candidate is N+1
  //   2. CAS: create `_claim.vN+1` with CREATE_NEW (atomic on POSIX) —
  //      failure means another writer owns that version: back off and
  //      retry from step 1 (their swap will advance N)
  //   3. after winning the claim, re-check the pointer still reads N —
  //      the claim's owner releases AFTER swapping, so a claim won on
  //      an already-committed version is detectable and retried
  //   4. write the version dir, RE-VERIFY the claim, swap the pointer,
  //      release the claim
  // A crashed writer's claim (JVM death between 2 and 4) is stolen
  // once it ages past `claimTimeoutMs` with no heartbeat: the steal
  // re-reads the claim body and deletes only the exact bytes it judged
  // stale, so a fresh claim re-created in the window survives. The
  // orphaned vN+1 dir is invisible (the pointer never moved) and the
  // next writer of that version overwrites it — the same crash-window
  // safety the single-writer protocol already pinned ([[beforeSwap]]).
  //
  // Two live-writer protections (a steal must only ever hit CRASHED
  // writers): (a) a HEARTBEAT daemon refreshes the claim stamp every
  // claimTimeoutMs/4 for as long as the body runs, so a legitimately
  // long commit (a fold, a compaction, a corpus-scale rewrite) never
  // looks stale; (b) the pointer swap RE-VERIFIES the claim still
  // carries this writer's nonce and aborts into a clean retry if not —
  // so even a steal that wins every race ends with one committed writer
  // and one retried writer, never two writers publishing one version.

  private val guard: CommitGuard =
    commitGuard.getOrElse(new FileCommitGuard(root, claimTimeoutMs))

  /** Serialize one commit against concurrent writers (same JVM or
    * another process on the store root — the claim is a file, not a
    * lock object). `body` receives the prior version (frozen while
    * the claim is held: any other writer must first claim prior+1,
    * which this writer owns) and the claimed version to write. On a
    * lost race — or a mid-write claim steal detected at swap time —
    * the loop re-reads the NEW current version and re-runs `body`,
    * which re-reads its prior from the store, so the retried merge
    * applies on top of the winner's commit instead of losing it.
    */
  private def committed[A](table: String)(body: (Option[Long], Long) => A): A = {
    var backoffMs = 5L
    while (true) {
      val cur = currentVersion(table)
      val next = cur.getOrElse(-1L) + 1
      if (guard.tryClaim(table, next)) {
        val interval = math.max(claimTimeoutMs / 4, 25L)
        val hb = SnapshotStore.heartbeatExec.scheduleWithFixedDelay(
          () => guard.heartbeat(table, next),
          interval, interval, java.util.concurrent.TimeUnit.MILLISECONDS)
        try {
          // step 3: a release-then-claim interleave can hand us a claim
          // on a version that already committed — detect via the pointer
          if (currentVersion(table) == cur) {
            try return body(cur, next)
            catch { case _: SnapshotStore.ClaimLostException => () } // retry
          }
        } finally {
          hb.cancel(false)
          guard.release(table, next)
        }
      }
      Thread.sleep(backoffMs)
      backoffMs = math.min(backoffMs * 2, 200L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write a new snapshot version and atomically swap the pointer.
    * `partitionCols` lays the snapshot out hive-partitioned (e.g.
    * `cases` by filing year) so partition pruning replaces the
    * reference's date index at scale (SURVEY §4: P6/P8 year and
    * date-range filters prune whole directories). Whole-table
    * REPLACEMENT semantics: under concurrent writers the claim keeps
    * version dirs exclusive, and the last replacement wins — callers
    * whose frame derives from the prior snapshot want the merge
    * flavors instead (their combine re-applies on a lost race).
    */
  def write(table: String, df: DataFrame, partitionCols: Seq[String] = Nil): Long =
    committed(table) { (_, next) => commitAt(table, next, df, partitionCols) }

  /** The unclaimed single-version commit every committed body ends
    * with: dir, readability guard, pointer swap. Callers must hold
    * the claim on `next`.
    */
  private def commitAt(table: String, next: Long, df: DataFrame,
      partitionCols: Seq[String]): Long = {
    writeVersionDir(table, next, df, partitionCols)
    ensureReadableVersion(table, next, df)
    swapPointer(table, next)
    next
  }

  /** A fully-DRAINED partitioned commit (every row deleted, nothing
    * retained) emits NO data files — Spark writes only `_SUCCESS` for
    * an empty partitionBy write — leaving a version whose schema can't
    * be inferred back. Reachable in production: an erasure that
    * tombstones every remaining key. Rewrite the empty frame
    * UNPARTITIONED so the full schema (partition column included)
    * survives on disk; the next partition-scoped merge sees no
    * partition dirs and takes its layout-change full-rewrite path,
    * re-establishing the hive layout as soon as rows exist again.
    */
  private def ensureReadableVersion(table: String, version: Long,
      df: DataFrame): Unit = {
    val dir = tableDir(table).resolve(s"v$version")
    val hasData = {
      val s = Files.walk(dir)
      try s.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    if (!hasData) {
      val mf = manifestFile(dir)
      val hasRefs = Files.exists(mf) &&
        Files.readAllLines(mf).asScala.exists(_.nonEmpty)
      if (!hasRefs) {
        if (Files.exists(mf)) Files.delete(mf)
        df.limit(0).write.mode("overwrite").parquet(dir.toString)
        Files.writeString(schemaFile(dir), df.schema.json) // overwritten above
      }
    }
  }

  private def writeVersionDir(table: String, version: Long, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    Files.createDirectories(tableDir(table))
    val writer = df.write.mode("overwrite")
    val dir = tableDir(table).resolve(s"v$version")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dir.toString)
    // the version's logical schema rides as a sidecar so reads apply
    // it explicitly — what lets retained partitions predating a new
    // column still read (null-filled) under schema evolution
    Files.writeString(schemaFile(dir), df.schema.json)
    ()
  }

  /** Test hook, invoked once the new version directory (data files
    * plus its manifest / retained links) is fully on disk and
    * immediately before the `_current` pointer swap — throwing from it
    * simulates a crash between the two commit steps, the window whose
    * safety the protocol claims: the orphaned version dir is invisible
    * (the pointer still names the old version) and the next write of
    * the same version number overwrites it. No-op in production.
    */
  private[graft] var beforeSwap: (String, Long) => Unit = (_, _) => ()

  private def swapPointer(table: String, version: Long): Unit = {
    beforeSwap(table, version)
    // the final claim re-verify: if a (pathological, heartbeat-stalled)
    // steal took the claim mid-write, abort into the commit loop's
    // retry instead of publishing a version dir the thief may be
    // overwriting right now
    if (!guard.stillHeld(table, version))
      throw new SnapshotStore.ClaimLostException(table, version)
    val tmp = tableDir(table).resolve("_current.tmp")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Spark's hive-style directory name for one partition value (null →
    * `__HIVE_DEFAULT_PARTITION__`, special chars escaped the same way
    * Spark's writer escapes them).
    */
  private def partitionDirName(colName: String, value: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val s = value match {
      case null => ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      case v => ExternalCatalogUtils.escapePathName(String.valueOf(v))
    }
    s"$colName=$s"
  }

  /** Partition-scoped merge: rewrite ONLY the hive partitions the
    * batch touches; every untouched partition directory of the prior
    * snapshot is hard-linked into the new version unchanged. This is
    * the lakehouse commit model (a new snapshot re-references the old
    * data files it didn't change — Delta/Iceberg do it via manifests;
    * on one filesystem a hardlink is the same thing), and it turns the
    * per-micro-batch merge cost from O(full table) to O(touched
    * partitions) — the reference's row-level `ON CONFLICT`
    * (ingest.py:613-644) costs O(batch), and at 100 TB a whole-table
    * rewrite per batch is the difference between a pipeline and a
    * bonfire.
    *
    * Correctness subtlety: a batch key may collide with a prior row in
    * a DIFFERENT partition (a case's `filed_year` changes on
    * re-ingest). Touched = batch's partitions ∪ partitions holding
    * colliding prior keys, found by a column-pruned key probe (reads
    * only key + partition columns — at cluster scale this is the
    * manifest/bloom-filter lookup every lakehouse MERGE does). All
    * prior rows sharing a batch key are therefore inside
    * `priorTouched`, so every combine flavor (last-write-wins /
    * insert-if-absent / additive) sees exactly the rows it needs.
    *
    * `vacuum` stays safe: deleting an old version's files only drops
    * one hard link; the data lives while any newer version links it.
    */
  private def mergedPartitionScoped(table: String, cur: Long, next: Long,
      batch: DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame,
      partitionCols: Seq[String], probeKeys: Seq[String],
      collideHint: Option[Seq[Any]],
      probeFrame: Option[DataFrame]): Long = {
    import org.apache.spark.storage.StorageLevel
    val pc = partitionCols.head
    val priorPartDirs: Map[String, Seq[java.nio.file.Path]] =
      physicalParts(table, cur).filter(_._1.startsWith(s"$pc="))
    // prior layout isn't partitioned on pc (layout change) → full rewrite
    if (priorPartDirs.isEmpty)
      return commitAt(table, next,
        combine(readVersion(table, cur).get, batch), partitionCols)
    batch.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val prior = readVersion(table, cur).get
      val batchVals = batch.select(col(pc)).distinct().collect().map(_.get(0))
      val collideVals: Array[Any] = collideHint match {
        // the caller already knows which partitions hold prior rows
        // with batch keys (a pruned sidecar lookup, or the partition
        // value is a function of the key) — skip the full-table probe.
        // MUST be a superset of the true collide set: a missed
        // partition would leave stale prior rows alive.
        case Some(vals) => vals.toArray
        case None =>
          if (probeKeys.isEmpty) Array.empty
          else prior.select((probeKeys :+ pc).distinct.map(col): _*)
            .join(probeFrame.getOrElse(batch)
              .select(probeKeys.map(col): _*).distinct(), probeKeys, "left_semi")
            .select(col(pc)).distinct().collect().map(_.get(0))
      }
      val touchedVals = (batchVals ++ collideVals).toSet
      val touchedDirs = touchedVals.map(partitionDirName(pc, _))
      val nonNull = touchedVals.filter(_ != null).toSeq
      val touchedPred = {
        val in = if (nonNull.nonEmpty) col(pc).isin(nonNull: _*) else lit(false)
        if (touchedVals.contains(null)) in || col(pc).isNull else in
      }
      val priorTouched = prior.filter(touchedPred)
      val combined = combine(priorTouched, batch)
      writeVersionDir(table, next, combined, partitionCols)
      val nextDir = tableDir(table).resolve(s"v$next")
      retainParts(table, nextDir,
        priorPartDirs.filterNot(p => touchedDirs.contains(p._1)))
      ensureReadableVersion(table, next, combined)
      swapPointer(table, next) // only after retained parts are wired:
      next                     // readers of v_next always see a complete table
    } finally { batch.unpersist(); () }
  }

  /** ADD the batch's rows to a table as NEW FILES without rewriting
    * any prior row — the segment-append commit (Lucene's new-segment
    * write; a lakehouse AddFile-only commit): the new version's
    * partition dirs hold the batch's files PLUS hard links to every
    * prior file of the same partition, so the write cost is O(batch)
    * regardless of how much prior data shares the touched partitions.
    * This is what a partition-scoped [[append]] merge cannot give when
    * the batch's keys hash across every partition (postings: one doc's
    * terms touch all term buckets — the merge's touched-partition
    * rewrite degenerates to the whole table); consumers that need
    * replacement semantics layer tombstones over the appended rows and
    * FOLD on a cadence (see StreamingPostings.processBatchAppend).
    *
    * Works in BOTH commit modes: link mode hard-links every prior file
    * into the new version's partition dirs; manifest mode writes
    * MULTI-PATH manifests (a partition name maps to a LIST of physical
    * dirs — the batch's own generation dir plus every retained prior
    * generation), so the object-store commit model gets the same
    * O(batch) write cost. Manifest mode needs a partitioned layout
    * (root files cannot be manifest-referenced).
    *
    * Schema evolution composes, with a MERGED sidecar: the version's
    * `_schema` is the union of the stored schema and the batch's —
    * a batch adding a column (a segment `seq`) reads null on the prior
    * files with no rewrite, a column both carry at promotable numeric
    * widths widens, and — the guard rail — a batch that OMITS a stored
    * column errors unless `allowSchemaEvolution` is on (a
    * verbatim-batch sidecar would silently null that column on every
    * prior row), while a non-promotable retype errors in both modes.
    */
  def appendFiles(table: String, batch: DataFrame,
      partitionCols: Seq[String] = Nil, sortCols: Seq[String] = Nil): Long = {
    require(!manifestCommits || partitionCols.nonEmpty,
      "manifest-mode appendFiles needs a partitioned layout — version-" +
        "root data files cannot be manifest-referenced")
    val b = if (sortCols.isEmpty) batch
      else batch.sortWithinPartitions(
        (partitionCols ++ sortCols).distinct.map(col): _*)
    committed(table) { (curOpt, next) =>
      val priorSchema = curOpt.flatMap(cv => storedSchema(table, cv)
        .orElse(readVersion(table, cv).map(_.schema)))
      val aligned = priorSchema.fold(b)(appendAligned(_, b))
      writeVersionDir(table, next, aligned, partitionCols)
      curOpt.foreach { cur =>
        val nextDir = tableDir(table).resolve(s"v$next")
        val curDir = tableDir(table).resolve(s"v$cur")
        val parts = physicalParts(table, cur)
        if (parts.nonEmpty) retainParts(table, nextDir, parts)
        else {
          require(!manifestCommits,
            "manifest-mode appendFiles onto an unpartitioned prior " +
              "layout is not representable — rewrite the table " +
              "partitioned first")
          parquetFiles(curDir).foreach { f =>
            // unpartitioned table: prior root files ride alongside
            try Files.createLink(nextDir.resolve(f.getFileName.toString), f)
            catch { case _: UnsupportedOperationException =>
              Files.copy(f, nextDir.resolve(f.getFileName.toString)); () }
          }
        }
      }
      ensureReadableVersion(table, next, aligned)
      swapPointer(table, next)
      next
    }
  }

  /** Align an [[appendFiles]] batch with the table's stored schema so
    * the written sidecar is the MERGED schema, never the batch's
    * verbatim (every prior hard-linked/manifest-referenced file is
    * read under the sidecar — a batch that misspelled, omitted, or
    * retyped a column would otherwise silently null/drop it for the
    * whole table). Additions always align (the segment `seq`
    * mechanism); omissions null-fill only under `allowSchemaEvolution`
    * and error otherwise; promotable numeric retypes widen; anything
    * else errors.
    */
  /** Structural type equality ignoring nullability flags (a rebuilt
    * batch's `array<int>` may differ from the stored sidecar's only in
    * `containsNull` — not a retype).
    */
  private def sameTypeIgnoreNull(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (ArrayType(ea, _), ArrayType(eb, _)) => sameTypeIgnoreNull(ea, eb)
      case (MapType(ka, va, _), MapType(kb, vb, _)) =>
        sameTypeIgnoreNull(ka, kb) && sameTypeIgnoreNull(va, vb)
      case (StructType(fa), StructType(fb)) =>
        fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
          x.name == y.name && sameTypeIgnoreNull(x.dataType, y.dataType) }
      case _ => a == b
    }
  }

  private def appendAligned(prior: org.apache.spark.sql.types.StructType,
      batch: DataFrame): DataFrame = {
    val bByName = batch.schema.fields.map(f => f.name -> f).toMap
    val mergedFields = prior.fields.map { pf =>
      bByName.get(pf.name) match {
        case None =>
          if (!allowSchemaEvolution)
            throw new IllegalArgumentException(
              s"appendFiles batch omits stored column '${pf.name}' — " +
                "a verbatim-batch sidecar would silently null it on " +
                "every prior row; enable allowSchemaEvolution to align " +
                "omissions (null-filled on the batch's rows), or fix " +
                "the batch")
          pf
        case Some(bf) if sameTypeIgnoreNull(bf.dataType, pf.dataType) => pf
        case Some(bf) =>
          widenedType(pf.dataType, bf.dataType) match {
            case Some(w) => pf.copy(dataType = w)
            case None => throw new IllegalArgumentException(
              s"appendFiles batch retypes column '${pf.name}' from " +
                s"${pf.dataType.simpleString} to " +
                s"${bf.dataType.simpleString} — not a lossless " +
                "widening, so prior files cannot read under it")
          }
      }
    } ++ batch.schema.fields.filterNot(f => prior.fieldNames.contains(f.name))
    batch.select(mergedFields.toSeq.map { f =>
      (if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
  }

  /** Wire the untouched partitions of the prior snapshot into a new
    * version dir: hard links in link mode, `_manifest` lines
    * (`v<src>/<partDir>`, physical locations) in manifest mode. A
    * multi-path partition (segment generations) retains one line /
    * link pass per physical dir; in link mode the generations' files
    * merge into one target dir (part-file names are UUID-unique).
    */
  private def retainParts(table: String, nextDir: java.nio.file.Path,
      retained: Map[String, Seq[java.nio.file.Path]]): Unit =
    if (manifestCommits) {
      val lines = retained.toSeq.flatMap { case (name, paths) =>
        paths.map(p => s"${p.getParent.getFileName}/$name")
      }.sorted
      Files.write(manifestFile(nextDir), lines.asJava)
      ()
    } else retained.foreach { case (name, paths) =>
      paths.foreach(linkTree(_, nextDir.resolve(name)))
    }

  /** Recursively hard-link `src` into `dst` (fallback: copy, for
    * filesystems without link support).
    */
  private def linkTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val s = Files.walk(src)
    try s.iterator().asScala.foreach { p =>
      val target = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else try Files.createLink(target, p)
      catch { case _: UnsupportedOperationException =>
        Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING) }
    } finally s.close()
  }

  /** The widened numeric type of a safely-promotable pair — the
    * lakehouse type-widening matrix (int→long, float→double, and the
    * smaller integrals up to either): every promotion is lossless, so
    * prior rows rewritten at the wide type carry identical values.
    * (Union-based merge flavors get width coercion from unionByName's
    * native type resolution even without the evolution flag; the
    * explicit cast here is what aligns the NON-union paths — the
    * additive groupBy, keyScope joins, and [[readChanges]]'s
    * version-straddling structs.) Renames and any other type change
    * are NOT evolution — they stay the strict analysis error,
    * evolution flag or not.
    */
  private def widenedType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    def rank(t: DataType): Option[Int] = t match {
      case ByteType => Some(0); case ShortType => Some(1)
      case IntegerType => Some(2); case LongType => Some(3)
      case _ => None
    }
    (a, b) match {
      case _ if a == b => None
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case _ => for { ra <- rank(a); rb <- rank(b) }
        yield (if (ra > rb) a else b)
    }
  }

  /** Align two frames for an evolving merge (only reached when
    * `allowSchemaEvolution` is on). ADDITIVE: a batch's new column
    * backfills null on prior rows, a batch missing a table column
    * fills null. WIDENING: a column both sides carry at different but
    * promotable numeric widths casts BOTH sides to the wider type —
    * a wide batch widens the table (the reference's `ALTER TABLE ...
    * TYPE bigint` moment), and a still-narrow late writer's batch
    * up-casts to the table's established wide type rather than
    * erroring. Any other type conflict stays untouched and fails in
    * unionByName exactly as without evolution.
    */
  private def alignSchemas(prior: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val pCols = prior.columns.toSet
    val bCols = batch.columns.toSet
    val pTypes = prior.schema.fields.map(f => f.name -> f.dataType).toMap
    val widen = batch.schema.fields.flatMap(f => pTypes.get(f.name)
      .flatMap(pt => widenedType(pt, f.dataType)).map(f.name -> _)).toMap
    def widenCols(df: DataFrame) = widen.foldLeft(df) { case (d, (n, t)) =>
      d.withColumn(n, col(n).cast(t)) }
    val p2 = batch.schema.fields.filterNot(f => pCols.contains(f.name))
      .foldLeft(widenCols(prior))((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
    val b2 = prior.schema.fields.filterNot(f => bCols.contains(f.name))
      .foldLeft(widenCols(batch))((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
    (p2, b2)
  }

  private def merged(table: String, batch: DataFrame,
      combine0: (DataFrame, DataFrame) => DataFrame,
      partitionCols: Seq[String] = Nil,
      probeKeys: Seq[String] = Nil,
      sortCols: Seq[String] = Nil,
      collideHint: Option[Seq[Any]] = None,
      probeFrame: Option[DataFrame] = None): Long = {
    val combine: (DataFrame, DataFrame) => DataFrame =
      if (!allowSchemaEvolution) combine0
      else (p, b) => { val (p2, b2) = alignSchemas(p, b); combine0(p2, b2) }
    // cluster each written file on sortCols so point/equality
    // predicates prune Parquet row groups inside a hive partition
    // (e.g. postings buckets cluster on `term`). The sort key MUST
    // lead with the partition columns: FileFormatWriter requires its
    // input ordered by them and silently injects its own
    // partition-cols-only sort otherwise — an UNSTABLE sort that
    // scrambles the clustering it was meant to protect (measured:
    // r11's row-group probe caught exactly this).
    val effSort = if (sortCols.isEmpty) Nil
      else (partitionCols ++ sortCols).distinct
    val c: (DataFrame, DataFrame) => DataFrame =
      if (effSort.isEmpty) combine
      else (p, b) => combine(p, b).sortWithinPartitions(effSort.map(col): _*)
    // the whole merge — prior read, combine, version write, swap —
    // runs inside one claim window: a lost race re-enters here with
    // the WINNER's version as prior, so concurrent merges serialize
    // instead of losing updates
    committed(table) { (curOpt, next) =>
      curOpt match {
        case Some(cur) if partitionCols.nonEmpty =>
          mergedPartitionScoped(table, cur, next, batch, c, partitionCols,
            probeKeys, collideHint, probeFrame)
        case Some(cur) => commitAt(table, next,
          c(readVersion(table, cur).get, batch), partitionCols)
        case None => commitAt(table, next,
          if (effSort.isEmpty) batch
          else batch.sortWithinPartitions(effSort.map(col): _*), partitionCols)
      }
    }
  }

  /** Upsert: batch rows replace prior rows sharing the key (S4).
    * `partitionCols` keeps the merged snapshot hive-partitioned (e.g.
    * cases by `filed_year`) AND scopes the merge I/O to the touched
    * partitions (see [[mergedPartitionScoped]]); `sortCols` clusters
    * each written file for row-group pruning.
    */
  /** @param collideHint when the caller already knows the partition
    *   values holding prior rows with batch keys (from a pruned
    *   sidecar lookup like AnnStore's id map, or because the partition
    *   value is a pure function of the key), passing them skips the
    *   internal column-pruned full-table key probe — the per-batch
    *   merge then touches NO unpruned scan of the table at all. The
    *   hint must be a SUPERSET of the true collide set (extra values
    *   only rewrite identical partitions; a missing one would leave
    *   stale rows alive).
    */
  /** @param keyScope widens the REPLACEMENT set beyond the batch's own
    *   keys: every prior row whose key appears in `keyScope` is
    *   dropped, whether or not the batch carries rows for it — "the
    *   batch is the complete new state of these keys". This is how a
    *   row-EXPLODED table (postings: one doc → many term rows) deletes
    *   a re-ingested doc whose new content produces ZERO rows; without
    *   it the LWW anti-join only sees keys the batch happens to emit
    *   and the emptied doc's stale rows would survive. Defaults to the
    *   batch frame (plain upsert semantics).
    */
  def mergeLastWriteWins(table: String, batch: DataFrame, keys: Seq[String],
      partitionCols: Seq[String] = Nil, sortCols: Seq[String] = Nil,
      collideHint: Option[Seq[Any]] = None,
      keyScope: Option[DataFrame] = None): Long = {
    // the replacement-key frame drives an anti join against the
    // (possibly corpus-sized) prior — hint it by MEASURED size, not
    // the planner's estimate (see [[SnapshotStore.broadcastIfSmall]])
    val keysDf = SnapshotStore.broadcastIfSmall(
      keyScope.getOrElse(batch).select(keys.map(col): _*).distinct())
    merged(table, batch, (prior, b) =>
      prior.join(keysDf, keys, "left_anti")
        .unionByName(b), partitionCols, probeKeys = keys, sortCols = sortCols,
      collideHint = collideHint, probeFrame = Some(keysDf))
  }

  /** Insert-if-absent: prior rows win, new keys append (S5/S6).
    * `collideHint` as in [[mergeLastWriteWins]] — with a partition
    * value that is a pure function of the key, pass the batch's own
    * partition values and the full-table key probe is skipped.
    */
  def mergeInsertIfAbsent(table: String, batch: DataFrame, keys: Seq[String],
      partitionCols: Seq[String] = Nil,
      collideHint: Option[Seq[Any]] = None): Long =
    merged(table, batch, (prior, b) =>
      prior.unionByName(
        b.join(prior.select(keys.map(col): _*).distinct(), keys, "left_anti")),
      partitionCols, probeKeys = keys, collideHint = collideHint)

  /** Additive counter merge (G9/G11): `countCols` sum, `minCols` take
    * least, `maxCols` take greatest, any other column takes the
    * batch's value when present else the prior's — resolved with
    * `max_by` over an explicit source flag (batch=1 > prior=0), not
    * `last(ignoreNulls)`, whose result depends on partition order.
    */
  def mergeAdditive(table: String, batch: DataFrame, keys: Seq[String],
      countCols: Seq[String], minCols: Seq[String], maxCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      collideHint: Option[Seq[Any]] = None): Long =
    merged(table, batch, (prior, b) => {
      val all = prior.withColumn("_src", lit(0))
        .unionByName(b.withColumn("_src", lit(1)))
      val out = prior.columns.toSeq
      val others = out.diff(keys ++ countCols ++ minCols ++ maxCols)
      val aggs =
        countCols.map(c => sum(col(c)).as(c)) ++
          minCols.map(c => min(col(c)).as(c)) ++
          maxCols.map(c => max(col(c)).as(c)) ++
          // max_by skips null ordering keys, so nulling the flag under a
          // null value gives "batch when present else prior" exactly
          others.map(c =>
            max_by(col(c), when(col(c).isNotNull, col("_src"))).as(c))
      all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .select(out.map(col): _*)
    }, partitionCols, probeKeys = keys, collideHint = collideHint)

  /** Append-only ledger (S3/S7). Partition-scoped when partitioned:
    * no key collisions exist by definition, so touched = the batch's
    * own partitions (probeKeys empty).
    */
  def append(table: String, batch: DataFrame, partitionCols: Seq[String] = Nil): Long =
    merged(table, batch, (prior, b) => prior.unionByName(b), partitionCols)

  /** Do two partition dir SETS hold the SAME physical bytes — the same
    * file names across all generations, each pair resolving to one
    * physical file (one path in manifest mode, a shared inode in
    * hard-link mode)? True means the partition was RETAINED by the
    * commit between the two versions, so its rows are byte-identical
    * and it can contribute nothing to a row-level diff. A duplicate
    * file name within one side (cannot happen with Spark's UUID part
    * names) degrades to "changed" — a safe over-read, never a miss.
    */
  private def samePhysicalTree(as: Seq[java.nio.file.Path],
      bs: Seq[java.nio.file.Path]): Boolean = {
    if (as == bs) return true
    def files(ds: Seq[java.nio.file.Path]): Option[Map[String, java.nio.file.Path]] = {
      val all = ds.flatMap { d =>
        val s = Files.list(d)
        try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally s.close()
      }
      val m = all.map(p => p.getFileName.toString -> p).toMap
      if (m.size != all.size) None else Some(m)
    }
    (files(as), files(bs)) match {
      case (Some(fa), Some(fb)) =>
        fa.keySet == fb.keySet && fa.forall { case (n, p) =>
          try Files.isSameFile(p, fb(n))
          catch { case _: java.io.IOException => false }
        }
      case _ => false
    }
  }

  /** Change data feed: the row-level diff between two retained
    * versions, keyed on `keys` — `op` ∈ insert/update/delete (updates
    * only where a non-key column actually changed; a rewritten file
    * with identical rows produces NO change rows, so compaction is
    * CDC-silent). This is what lets a downstream consumer (a search
    * index, an embedding backfill, a replica) follow a 100 TB table by
    * processing deltas instead of re-reading snapshots — the lakehouse
    * CDF surface on the same version directories time travel reads.
    *
    * Plan shape: one full-outer join on the keys — restricted, for
    * hive-partitioned tables, to the partitions whose PHYSICAL dirs
    * differ between the two versions. A retained partition (the same
    * manifest-referenced dir, or a dir of hard links to the same
    * inodes) is byte-identical on both sides, so its keys can appear
    * on neither side of the diff (the store's merges keep keys unique
    * per snapshot); skipping it makes a follow step cost O(changed
    * partitions), never O(corpus) — the property that lets an index
    * follow a 100 TB table batch by batch.
    */
  def readChanges(table: String, fromVersion: Long, toVersion: Long,
      keys: Seq[String]): Option[DataFrame] = {
    if (readVersion(table, fromVersion).isEmpty ||
      readVersion(table, toVersion).isEmpty) return None
    def side(version: Long, other: Long): DataFrame = {
      val mine = physicalParts(table, version)
      val theirs = physicalParts(table, other)
      val full = readVersion(table, version).get
      if (mine.isEmpty || theirs.isEmpty) full // not both hive-layout
      else {
        val changed = mine.filterNot { case (name, dirs) =>
          theirs.get(name).exists(samePhysicalTree(dirs, _)) }
        if (changed.isEmpty) full.filter(lit(false))
        else readParts(changed.values.flatten, storedSchema(table, version))
      }
    }
    val oldRaw = side(fromVersion, toVersion)
    val newRaw = side(toVersion, fromVersion)
    // the two versions may straddle a schema-evolution boundary (a
    // column added, a numeric width grown) — align them the same way
    // evolving merges do, so a follower stepping over the evolution
    // version sees null-filled/widened before structs instead of an
    // unresolved-column error
    val (oldDf, newDf) = alignSchemas(oldRaw, newRaw)
    val valueCols = newDf.columns.toSeq.diff(keys)
    val o = oldDf.select(
      keys.map(col) :+ struct(valueCols.map(col): _*).as("_old"): _*)
    val n = newDf.select(
      keys.map(col) :+ struct(valueCols.map(col): _*).as("_new"): _*)
    Some(o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(col("_old") =!= col("_new"), lit("update")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) :+ col("op") :+
        col("_old").as("before") :+ col("_new").as("after"): _*))
  }

  private def parquetFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
    finally s.close()
  }

  /** Small-file compaction: streaming micro-batch merges leave each
    * touched partition with one more file pile per version, and at
    * some point the read cost is task-scheduling, not I/O (the classic
    * lakehouse OPTIMIZE problem). Rewrites ONLY partitions holding
    * more than `maxFilesPerPartition` data files — coalesced to one
    * file per hive partition via a repartition on the partition column
    * (at cluster scale the same job would `repartitionByRange` to a
    * target file size instead of one file) — and hard-links every
    * already-compact partition into the new version unchanged, exactly
    * like [[mergedPartitionScoped]]. Row content is untouched; old
    * versions stay readable (time travel) and vacuum-safe.
    *
    * Returns the new version, or None when every partition is already
    * under the threshold (no version is created).
    */
  def compact(table: String, maxFilesPerPartition: Int = 4,
      sortCols: Seq[String] = Nil): Option[Long] = {
    require(maxFilesPerPartition >= 1, "threshold must be at least 1 file")
    if (currentVersion(table).isEmpty) return None
    // a compaction is a commit like any other — it claims its version,
    // so a concurrent merge can neither clobber its dir nor vice versa
    committed(table) { (curOpt, next) =>
      val cur = curOpt.get
      val curDir = tableDir(table).resolve(s"v$cur")
      val parts = physicalParts(table, cur)
      val nextDir = tableDir(table).resolve(s"v$next")
      // lead with the partition column — see merged()'s effSort note
      def clustered(df: DataFrame): DataFrame =
        if (sortCols.isEmpty) df
        else df.sortWithinPartitions(
          ((if (parts.isEmpty) Nil
            else Seq(parts.head._1.split("=")(0))) ++ sortCols)
            .distinct.map(col): _*)
      if (parts.isEmpty) {
        // unpartitioned table: one flat pile of files
        if (parquetFiles(curDir).size <= maxFilesPerPartition) None
        else {
          writeVersionDir(table, next,
            clustered(storedSchema(table, cur).fold(spark.read)(spark.read.schema)
              .parquet(curDir.toString).coalesce(1)), Nil)
          swapPointer(table, next)
          Some(next)
        }
      } else {
        val pc = parts.head._1.split("=")(0)
        // a multi-path partition counts files across its generations —
        // compacting it also folds the generation dirs back to one
        val needy = parts.filter(
          p => p._2.map(parquetFiles(_).size).sum > maxFilesPerPartition)
        if (needy.isEmpty) None
        else {
          val rows = readParts(needy.values.flatten, storedSchema(table, cur))
          writeVersionDir(table, next, clustered(rows.repartition(col(pc))), Seq(pc))
          retainParts(table, nextDir, parts -- needy.keys)
          swapPointer(table, next)
          Some(next)
        }
      }
    }
  }

  /** Every table currently in the store. */
  def tables(): Seq[String] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => Files.exists(p.resolve("_current")))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Register every stored table as a temp view so ad-hoc SQL works
    * against the current snapshots — the engine's psql-equivalent
    * surface (`spark.sql("SELECT ... FROM cases JOIN courts ...")`).
    * Views bind to the snapshot CURRENT AT registration; re-register
    * after merges to see newer versions.
    */
  def registerViews(prefix: String = ""): Seq[String] =
    tables().map { t =>
      read(t).get.createOrReplaceTempView(prefix + t)
      prefix + t
    }
}
