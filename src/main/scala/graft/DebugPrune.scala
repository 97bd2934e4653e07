package graft
import org.apache.spark.sql.functions._
object DebugPrune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val ingest = graft.ingest.IngestJob.run(spark,
      graft.ingest.IngestJob.readRaw(spark, "/root/reference/data/raw_dockets.json"),
      1, "raw_dockets.json", "ref", ts)
    val root = java.nio.file.Files.createTempDirectory("dbg-store").toString
    val store = new graft.store.SnapshotStore(spark, root)
    store.write("cases", ingest.cases, partitionCols = Seq("filed_year"))
    val snap = store.read("cases").get
    println("distinct years: " + snap.select("filed_year").distinct().collect().mkString(","))
    val api = new graft.api.GraftApi(spark, snap, ingest.judges, ingest.courts,
      ingest.caseTypes, ingest.parties, ingest.caseParties)
    val ds = api.listCases(judge = None, year = Some(2023))
    val scans = ds.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scans.foreach { f =>
      println(s"scan: partitionCount=${f.selectedPartitions.partitionCount} filters=${f.partitionFilters}")
    }
    spark.stop()
  }
}
