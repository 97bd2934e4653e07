package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Row-group pruning mechanism demo (SCALING.md r11): the term-sorted
  * bucket write only pays off once a bucket file holds MULTIPLE row
  * groups (Parquet prunes at row-group granularity via min/max
  * stats; a 1-2 MB bucket file at harness scale is a single group,
  * so sorted and unsorted read identical bytes). This tool writes the
  * SAME postings twice with a small `parquet.block.size` — the
  * many-row-groups-per-file regime a 100 TB bucket actually lives in
  * — once term-sorted, once shuffle-ordered, probes both with the
  * identical term filter, and prints bytes read. args: <corpusDir>
  * [blockBytes].
  */
object RowGroupProbe {

  private final class InputAgg extends SparkListener {
    val bytes = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null)
        bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val block = if (args.length > 1) args(1).toInt else 64 * 1024
    // pruning is a SELECTIVITY effect: a stopword-grade term sits in
    // every row group and nothing can be skipped (measured — see
    // SCALING.md r11); tail terms are where the sort pays
    val terms = if (args.length > 2) args.drop(2).toSeq
      else Seq("vector", "merge", "batch")
    val spark = GraftSession.get()
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", block)
    val out = java.nio.file.Files.createTempDirectory("graft-rgprobe").toString
    val posts = graft.search.PostingsIndex.buildPostings(
      Tables(spark, dir).documents.select("doc_id", "text"))
      .repartition(graft.search.PostingsIndex.NumBuckets, col("term_bucket"))
      .localCheckpoint(true)
    // lead with the partition column or FileFormatWriter injects its
    // own UNSTABLE partition-cols sort and scrambles the clustering —
    // the bug this tool caught in the store build itself (r11)
    posts.sortWithinPartitions("term_bucket", "term")
      .write.partitionBy("term_bucket").mode("overwrite")
      .parquet(s"$out/sorted")
    posts
      .write.partitionBy("term_bucket").mode("overwrite")
      .parquet(s"$out/unsorted")
    for (variant <- Seq("sorted", "unsorted")) {
      val agg = new InputAgg
      spark.sparkContext.addSparkListener(agg)
      val n = graft.search.PostingsIndex.probeOf(
        spark.read.parquet(s"$out/$variant"), terms).count()
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(agg)
      println(s"""{"variant": "$variant", "block": $block, """ +
        s""""terms": "${terms.mkString(" ")}", """ +
        s""""rows": $n, "input_mb": ${agg.bytes.get / 1e6}}""")
    }
    spark.stop()
  }
}
