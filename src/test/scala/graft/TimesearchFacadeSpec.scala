package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class TimesearchFacadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("verb surface: ingest_jsonfile, breakdown, index, offline_reading, merge_db") {
    val a = Timesearch.openArchive(spark, tmp("arch_a"), outputPartitions = Some(2))
    Timesearch.ingestJsonFile(spark, a, TestSpark.fixture("pushshift_fixture.ndjson"))
    val nSubs = a.submissions.current.count()
    val nComs = a.comments.current.count()
    assert(nSubs > 0 && nComs > 0)

    val bd = Timesearch.breakdown(a, "total").collect()
    assert(bd.map(_.getAs[Long]("total")).sum === nSubs + nComs)

    assert(Timesearch.index(a, threshold = 0, sort = "date").count() === nSubs)
    assert(Timesearch.incrementalLowerBound(a).count() === 1)

    val htmlDir = tmp("arch_html")
    Timesearch.offlineReading(a, htmlDir)
    val files = Files.list(java.nio.file.Paths.get(htmlDir))
    val n = try files.count() finally files.close()
    assert(n === nSubs)

    // merge_db: an empty archive absorbs a's rows; a is unchanged
    val b = Timesearch.openArchive(spark, tmp("arch_b"), outputPartitions = Some(2))
    Timesearch.mergeDb(spark, b, a)
    assert(b.submissions.current.count() === nSubs)
    assert(b.comments.current.count() === nComs)
    assert(a.submissions.current.count() === nSubs)
  }

  test("bucketed archive: same verb surface on the partitioned layout, reopen pinned") {
    val root = tmp("arch_bk")
    val a = Timesearch.openArchive(spark, root, keyBuckets = Some(4))
    Timesearch.ingestJsonFile(spark, a, TestSpark.fixture("pushshift_fixture.ndjson"))
    val nSubs = a.submissions.current.count()
    assert(nSubs > 0 && a.comments.current.count() > 0)
    assert(Timesearch.index(a, threshold = 0, sort = "date").count() === nSubs)
    // same-layout reopen works; mismatched reopen fails fast on read
    val same = Timesearch.openArchive(spark, root, keyBuckets = Some(4))
    assert(same.submissions.current.count() === nSubs)
    val wrong = Timesearch.openArchive(spark, root, keyBuckets = Some(8))
    intercept[IllegalArgumentException](wrong.submissions.current)
    val flat = Timesearch.openArchive(spark, root)
    intercept[IllegalArgumentException](flat.submissions.current)
  }

  test("openSubmissionArchive: per-thread slice, bucket-pruned on the keyBucket layout") {
    val a = Timesearch.openArchive(spark, tmp("arch_sub"), keyBuckets = Some(4))
    Timesearch.ingestJsonFile(spark, a, TestSpark.fixture("pushshift_fixture.ndjson"))
    val someSub = a.submissions.current.select("idstr")
      .orderBy("idstr").head().getString(0)
    val sa = Timesearch.openSubmissionArchive(spark, a, someSub)
    // exactly the one submission row, and only ITS comments
    val subRows = sa.submission.collect()
    assert(subRows.length === 1 && subRows.head.getAs[String]("idstr") === someSub)
    val expected = a.comments.current
      .filter(org.apache.spark.sql.functions.col("submission") === someSub).count()
    assert(sa.comments.count() === expected)
    // the submission read is bucket-pruned: its scan lists ONE partition's
    // files, not the table (partition() path — a missing key in another
    // bucket is invisible to it)
    val scanned = sa.submission.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!scanned.contains("pt=") || scanned.split("pt=").length <= 2)
    // flat layout: same slice through the filter path
    val f = Timesearch.openArchive(spark, tmp("arch_sub_flat"))
    Timesearch.ingestJsonFile(spark, f, TestSpark.fixture("pushshift_fixture.ndjson"))
    val sf = Timesearch.openSubmissionArchive(spark, f, someSub)
    assert(sf.submission.count() === 1)
  }

  test("verb surface: livestream and wiki/styles page sinks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = Timesearch.openArchive(spark, tmp("arch_ls"), outputPartitions = Some(2))
    val mem = MemoryStream[C]
    val q = Timesearch.livestream(mem.toDF(), a, tmp("ls_ckp"),
      Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(C(1, "t1_1", 1L, "u1", "t3_r", "t3_r", "hello", 1L, "s", null, 5L))
      q.processAllAvailable()
      assert(a.comments.current.count() === 1)
    } finally q.stop()
    val pagesDir = tmp("wiki")
    Timesearch.writePages(Seq(("index", "# wiki"), ("faq", "# faq")).toDS(),
      pagesDir, ".md")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(pagesDir, "index.md")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(pagesDir, "faq.md")))
  }
}
