package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProfileQueries

/** q93's explicit scratch-root parameter: the audit must run its
  * export under the given root (a shared-store URI on a cluster) and
  * delete its scratch subdirectory afterwards — the delete-after-audit
  * lifecycle the driver-local default already has, exercised here
  * through the Hadoop FileSystem path instead of java.nio.
  */
class ProfileQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("explicit scratch root: audit passes and scratch is cleaned up") {
    val root = java.nio.file.Files.createTempDirectory("graft-q93-root")
    val row = ProfileQueries
      .q93FormatRoundtrip(spark, sfDir, Some(root.toUri.toString))
      .collect().head
    assert(row.getAs[Long]("n_rows") > 0)
    assert(row.getAs[Boolean]("csv_roundtrip_ok"))
    assert(row.getAs[Boolean]("json_roundtrip_ok"))
    assert(row.getAs[Boolean]("orc_roundtrip_ok"))
    val leftover = java.nio.file.Files.list(root)
    try assert(!leftover.iterator().hasNext,
      "scratch subdirectory survived the audit")
    finally leftover.close()
    java.nio.file.Files.delete(root)
  }

  test("scratch cleanup runs even when the audit fails mid-flight") {
    val root = java.nio.file.Files.createTempDirectory("graft-q93-root")
    // a nonexistent scale dir makes the export itself throw
    intercept[Throwable] {
      ProfileQueries.q93FormatRoundtrip(spark, "/nonexistent-sf-dir",
        Some(root.toUri.toString)).collect()
    }
    val leftover = java.nio.file.Files.list(root)
    try assert(!leftover.iterator().hasNext,
      "scratch subdirectory survived a failed audit")
    finally leftover.close()
    java.nio.file.Files.delete(root)
  }
}
