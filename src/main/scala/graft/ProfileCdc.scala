package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Merge
import graft.streaming.Livestream

/** Dev-loop decomposition of the q_cdc_join rehearsal's construction
  * cost: times each store publish and each IVM step separately, with a
  * job counter so per-publish Spark-job fan-out is visible.
  * (`runMain graft.ProfileCdc [sfDir]`) */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val verbose = sys.env.contains("GRAFT_PROF_VERBOSE")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val site = j.stageInfos.map(_.name).mkString(" | ")
          starts.put(j.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (verbose && s != null)
            println(f"[job] ${(System.nanoTime() - s._1) / 1e9}%6.3fs  ${s._2.take(160)}")
        }
      })
    SparkEntry.queries("q1_agg")(spark, dir).count()   // warmup
    def phase[A](name: String)(body: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cdcprof] $name%-28s ${dt}%6.2fs jobs=${jobs.get() - j0}")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val tmp = java.nio.file.Files.createTempDirectory("graft_profcdc")
      val facts = new Livestream.UpsertTable(spark, tmp.resolve("f").toString,
        Merge.comments, TimesearchQueries.oldComments(spark, dir).limit(0),
        outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      phase("facts.seed")(facts.seed(TimesearchQueries.oldComments(spark, dir)))
      val nc = TimesearchQueries.newComments(spark, dir)
      phase("facts.merge v1")(facts.merge(nc.filter(col("idint") % 4 === 0),
        "_seq", storeEdits = Some(false)))
      phase("facts.merge v2")(facts.merge(nc.filter(col("idint") % 4 =!= 0),
        "_seq", storeEdits = Some(false)))
      def dimUsers(batch: Int): DataFrame = {
        val base = Tables.load(spark, dir, "events")
          .select(col("user_id")).distinct()
        val keep = batch match {
          case 0 => col("user_id") % 3 === 0
          case 1 => col("user_id") % 3 === 1 || col("user_id") % 5 === 0
          case _ => (col("user_id") % 3 === 2 && col("user_id") % 11 =!= 0) ||
            col("user_id") % 7 === 0
        }
        base.filter(keep).select(
          concat(lit("u"), col("user_id")).as("idstr"),
          lit(null).cast("string").as("author"),
          lit(null).cast("string").as("body"),
          concat(lit("t"), (col("user_id") + lit(batch)) % 4).as("tier"),
          (col("user_id") % 10 + lit(batch * 100)).cast("long").as("region_c"),
          col("user_id").cast("long").as("_seq"))
      }
      val dimEntity = Merge.Entity(textCol = "body",
        editTextCol = "previous_body",
        updatable = Seq("tier", "region_c"), frozen = Seq("author"))
      val dim = new Livestream.UpsertTable(spark, tmp.resolve("d").toString,
        dimEntity, dimUsers(0).drop("_seq").limit(0),
        outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      phase("dim.seed")(dim.seed(dimUsers(0).drop("_seq")))
      phase("dim.merge v1")(dim.merge(dimUsers(1), "_seq",
        storeEdits = Some(false)))
      phase("dim.merge v2")(dim.merge(dimUsers(2), "_seq",
        storeEdits = Some(false)))
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"),
          col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = phase("cdcBaseJoin (lazy)")(
        graft.operators.Scd.cdcBaseJoin(factsAt(0), dimAt(0),
          "idstr", "author", fCols, dCols))
      val v1 = phase("apply step 1")(
        graft.operators.Scd.cdcApplyJoin(base,
          facts.changes(0L, 1L), dimCh(0L, 1L), factsAt(1), dimAt(1),
          "idstr", "author", fCols, dCols))
      val v2 = phase("apply step 2")(
        graft.operators.Scd.cdcApplyJoin(v1,
          facts.changes(1L, 2L), dimCh(1L, 2L), factsAt(2), dimAt(2),
          "idstr", "author", fCols, dCols))
      phase("final count")(v2.orderBy("idstr").count())
    }
    spark.stop()
  }
}
