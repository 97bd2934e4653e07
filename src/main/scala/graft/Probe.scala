package graft

/** Dev-only profiler: time (and optionally explain) named queries from
  * SparkEntry against a scale-factor dir. Not part of the driver
  * contract — Bench/Verify are.
  *
  * Usage: runMain graft.Probe <sfDir> [--explain] [--show] [--metrics]
  *          [--stages] [--set=key:value ...] [--reps N] q1 q2 ...
  *
  * --metrics attaches a task-end listener per run and prints job/task
  * counts, summed task time, shuffle-write and input bytes — the
  * guide-§1 empirical loop (where does the wall go: scheduling, scan,
  * shuffle?) without leaving the terminal, since the sandbox has no UI.
  */
object Probe {
  private final class Agg extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new AtomicLong
    val inputRead = new AtomicLong
    val sumTaskMs = new AtomicLong
    val maxTaskMs = new AtomicLong
    val nTasks = new AtomicLong
    val nJobs = new AtomicLong
    val nStages = new AtomicLong
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputRead.addAndGet(m.inputMetrics.bytesRead)
      }
      if (e.taskInfo != null) {
        val d = e.taskInfo.duration
        maxTaskMs.accumulateAndGet(d, (a: Long, b: Long) => math.max(a, b))
        sumTaskMs.addAndGet(d)
        nTasks.incrementAndGet()
      }
    }
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      nJobs.incrementAndGet(); ()
    }
    override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
      nStages.incrementAndGet(); ()
    }
    // per-stage rollup (printed with --stages): where the task time goes
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Long)]()
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val tm = si.taskMetrics
      if (tm != null) stageAgg.put(si.stageId,
        (si.name.takeWhile(_ != '\n').take(90), tm.executorRunTime,
          tm.shuffleWriteMetrics.bytesWritten, si.numTasks.toLong))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val show = args.contains("--show")
    val metrics = args.contains("--metrics")
    val stages = args.contains("--stages")
    val repsIdx = args.indexOf("--reps")
    val reps = if (repsIdx >= 0) args(repsIdx + 1).toInt else 1
    val names = args.drop(1).zipWithIndex.filterNot { case (a, i) =>
      a == "--explain" || a == "--show" || a == "--metrics" ||
        a == "--stages" || a == "--reps" || a.startsWith("--set") ||
        (repsIdx >= 0 && i + 1 == repsIdx + 1)
    }.map(_._1)
    val spark = GraftSession.get()
    // dev A/B: --set=key:value applies session confs before the runs
    args.filter(_.startsWith("--set")).foreach { a =>
      val kv = a.stripPrefix("--set").stripPrefix("=")
      kv.split(":", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k, v)
        case _ => sys.error(
          s"bad --set argument '$a': use the single-token form --set=key:value")
      }
    }
    val targets =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    targets.foreach { name =>
      (1 to reps).foreach { rep =>
        val agg = new Agg
        if (metrics) spark.sparkContext.addSparkListener(agg)
        // time construction + action together: some queries (q36's CC
        // loop) run jobs eagerly while BUILDING the frame, and Bench's
        // timer covers both — Probe must match or it under-reports
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val n = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (metrics) {
          // drain the async listener bus: poll until the counters stop
          // moving (a fixed sleep under-reported task/shuffle counts on
          // a loaded bus — ADVICE r14); bounded at 3s, best-effort
          var last = -1L
          var waited = 0
          while (waited < 3000 &&
              last != agg.nTasks.get + agg.nJobs.get + agg.shuffleWrite.get) {
            last = agg.nTasks.get + agg.nJobs.get + agg.shuffleWrite.get
            Thread.sleep(150)
            waited += 150
          }
          spark.sparkContext.removeSparkListener(agg)
        }
        if (explain && rep == 1) { println(s"=== $name"); df.explain("formatted") }
        if (show && rep == 1) df.show(50, truncate = false)
        print(f"[probe] $name%-28s rep$rep $sec%8.3f s  rows=$n")
        if (metrics) print(
          f"  jobs=${agg.nJobs.get}%d stages=${agg.nStages.get}%d " +
            f"tasks=${agg.nTasks.get}%d taskSum=${agg.sumTaskMs.get / 1000.0}%.1fs " +
            f"taskMax=${agg.maxTaskMs.get}%dms " +
            f"shufW=${agg.shuffleWrite.get / 1e6}%.1fMB in=${agg.inputRead.get / 1e6}%.1fMB")
        println()
        if (stages && metrics && rep == reps) {
          import scala.jdk.CollectionConverters._
          agg.stageAgg.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
            case (id, (nm, runMs, shw, nt)) =>
              println(f"  [stage $id%4d] run=${runMs / 1000.0}%7.2fs " +
                f"tasks=$nt%4d shufW=${shw / 1e6}%8.1fMB  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
