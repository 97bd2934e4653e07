package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (same config as the
  * driver-facing mains — GraftSession is the single source of truth).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // honors SPARK_GRAFT_MASTER like the mains, so the whole suite can
    // replay under local-cluster (real executor JVM boundaries)
    val s = GraftSession
      .withMasterOverride(GraftSession.builder("4").appName("graft-test"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
