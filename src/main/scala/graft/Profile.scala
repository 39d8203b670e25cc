package graft

/** Dev-loop phase profiler: splits one registered query's wall time into
  * CONSTRUCTION (the query closure — store builds, eager checkpoint
  * counts, fixture writes) and EXECUTION (the returned frame's count),
  * then repeats execution to show the warm-plan cost
  * (`runMain graft.Profile <query> [sfDir] [reps]`). The same
  * decomposition Bench's timed body measures as one number — knowing
  * which half dominates decides whether to optimize the publish path or
  * the serving plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query>[,query...] [sfDir] [reps]")
    val names = args(0).split(',').map(_.trim).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown query '$n'"))
    val spark = Sessions.local()
    // GRAFT_PROF_VERBOSE=1: per-job durations with stage names/details —
    // the local stand-in for the Spark UI's job table (UI is disabled in
    // the gate sessions).
    if (sys.env.contains("GRAFT_PROF_VERBOSE")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = j.stageInfos
              .map(s => s"${s.name.takeWhile(_ != '$')}#${s.numTasks}t")
              .mkString("|")
            starts.put(j.jobId, (System.nanoTime(), site))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            if (s != null)
              println(f"[job] ${(System.nanoTime() - s._1) / 1e9}%6.3fs  ${s._2.take(140)}")
          }
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val dt = (for { a <- si.completionTime; b <- si.submissionTime }
              yield (a - b) / 1e3).getOrElse(-1.0)
            if (dt > 0.3)
              println(f"[stage] ${dt}%6.3fs tasks=${si.numTasks} " +
                si.details.linesIterator.take(3).mkString(" <- ").take(200))
          }
        })
    }
    // absorb session bring-up / codegen like Bench's untimed warmup
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"[profile] $name rep$r construct=${(t1 - t0) / 1e9}%.2fs " +
          f"firstCount=${(t2 - t1) / 1e9}%.2fs recount=${(t3 - t2) / 1e9}%.2fs " +
          f"total=${(t2 - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
