package graft

/** Dev-only profiler: time (and optionally explain) named queries from
  * SparkEntry against a scale-factor dir. Not part of the driver
  * contract — Bench/Verify are.
  *
  * Usage: runMain graft.Probe <sfDir> [--explain] [--show] q1 q2 ...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val show = args.contains("--show")
    val names = args.drop(1).filterNot(a => a == "--explain" || a == "--show")
    val spark = GraftSession.get()
    val targets =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    targets.foreach { name =>
      // time construction + action together: some queries (q36's CC
      // loop) run jobs eagerly while BUILDING the frame, and Bench's
      // timer covers both — Probe must match or it under-reports
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (explain) { println(s"=== $name"); df.explain("formatted") }
      if (show) df.show(50, truncate = false)
      println(f"[probe] $name%-28s $sec%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
