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
    // the bucket hash is evaluated driver-side: opening the slice must not
    // launch any Spark job (the point-lookup path exists to be cheap)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val sa =
      try {
        val opened = Timesearch.openSubmissionArchive(spark, a, someSub)
        Thread.sleep(1000)   // listener events post asynchronously
        assert(jobs.get() === 0, "openSubmissionArchive launched a Spark job")
        opened
      } finally spark.sparkContext.removeSparkListener(listener)
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

  test("duplicated id in one dump: last-in-file-order wins under ANY split plan") {
    import org.apache.spark.sql.functions.col
    // v1 at the top of the file, filler in the middle (so a tiny
    // maxPartitionBytes actually splits the file), v2 at the very end —
    // the reference's sequential replay stores v2 and archives v1 as an
    // edit (tsdb.py:389-461)
    def subLine(id: String, text: String) =
      s"""{"id":"$id","name":"t3_$id","created_utc":1000,"author":"u","title":"T","is_self":true,"selftext":"$text","subreddit":"s","score":1}"""
    def comLine(i: Int) =
      s"""{"id":"c$i","name":"t1_c$i","created_utc":${1000 + i},"author":"u","parent_id":"t3_aaa","link_id":"t3_aaa","body":"filler $i","subreddit":"s","score":1}"""
    val lines = (subLine("aaa", "version one") +:
      (1 to 400).map(comLine)) :+ subLine("aaa", "version two")
    val dump = java.nio.file.Paths.get(tmp("dupdump"), "dump.ndjson")
    Files.write(dump, String.join("\n", lines: _*).getBytes("UTF-8"))

    def ingestWith(maxPartitionBytes: Option[String]): (String, Long) = {
      val saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val savedCost = spark.conf.get("spark.sql.files.openCostInBytes")
      maxPartitionBytes.foreach { b =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", b)
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
      }
      try {
        // the tiny-split config must actually split the read, or the test
        // proves nothing
        val nParts = graft.sources.Ndjson.read(spark, dump.toString)
          .rdd.getNumPartitions
        if (maxPartitionBytes.isDefined) assert(nParts > 4)
        else assert(nParts >= 1)
        val a = Timesearch.openArchive(spark, tmp("arch_dup"))
        Timesearch.ingestJsonFile(spark, a, dump.toString)
        val text = a.submissions.current.filter(col("idstr") === "t3_aaa")
          .head().getAs[String]("selftext")
        val editCount = a.submissions.edits
          .filter(col("idstr") === "t3_aaa").count()
        (text, editCount)
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
        spark.conf.set("spark.sql.files.openCostInBytes", savedCost)
      }
    }
    val (textOnePart, editsOnePart) = ingestWith(None)
    val (textSplit, editsSplit) = ingestWith(Some("2048"))
    // same winner and same CDC regardless of the physical split plan
    assert(textOnePart === "version two")
    assert(textSplit === "version two")
    // the superseded v1 text is archived as an edit in both plans
    assert(editsOnePart === 1L && editsSplit === 1L)
  }

  test("mixed id spellings that normalize to ONE idstr still order deterministically") {
    import org.apache.spark.sql.functions.col
    // line 1 carries name "t3_mix"; line 2 carries only bare id "mix" —
    // both normalize to idstr t3_mix. The _seq window must key on the
    // merge key (stripped coalesce(name, id)), or these would tie at
    // _seq=1 and the winner would depend on the physical plan.
    val l1 = """{"id":"mix","name":"t3_mix","created_utc":1000,"author":"u","title":"T","is_self":true,"selftext":"spelled with name","subreddit":"s","score":1}"""
    val l2 = """{"id":"mix","created_utc":1001,"author":"u","title":"T","is_self":true,"over_18":false,"selftext":"spelled bare","subreddit":"s","score":1}"""
    val dump = java.nio.file.Paths.get(tmp("mixdump"), "d.ndjson")
    Files.write(dump, (l1 + "\n" + l2).getBytes("UTF-8"))
    val a = Timesearch.openArchive(spark, tmp("arch_mix"))
    Timesearch.ingestJsonFile(spark, a, dump.toString)
    val rows = a.submissions.current.filter(col("idstr") === "t3_mix").collect()
    assert(rows.length === 1)
    // last in file order wins, deterministically
    assert(rows.head.getAs[String]("selftext") === "spelled bare")
  }

  test("cross-file precedence: one glob ingest == sequential per-file ingests") {
    import org.apache.spark.sql.functions.col
    // v1 lives in the lexicographically-FIRST file, v2 in the second —
    // the reference replays files one by one (last ingest wins); a glob
    // read must resolve identically via the file-name order in _seq
    def subLine(id: String, text: String) =
      s"""{"id":"$id","name":"t3_$id","created_utc":1000,"author":"u","title":"T","is_self":true,"selftext":"$text","subreddit":"s","score":1}"""
    val dir = java.nio.file.Paths.get(tmp("xfile"))
    val f1 = dir.resolve("0_first.ndjson"); val f2 = dir.resolve("1_second.ndjson")
    Files.write(f1, subLine("xx", "from file one").getBytes("UTF-8"))
    Files.write(f2, subLine("xx", "from file two").getBytes("UTF-8"))

    val glob = Timesearch.openArchive(spark, tmp("arch_glob"))
    Timesearch.ingestJsonFile(spark, glob, dir.toString)   // both files, one batch
    val seq = Timesearch.openArchive(spark, tmp("arch_seq"))
    Timesearch.ingestJsonFile(spark, seq, f1.toString)     // reference shape:
    Timesearch.ingestJsonFile(spark, seq, f2.toString)     // one file at a time
    def state(a: Timesearch.Archive) = (
      a.submissions.current.filter(col("idstr") === "t3_xx")
        .head().getAs[String]("selftext"),
      a.submissions.edits.filter(col("idstr") === "t3_xx").count())
    assert(state(glob) === (("from file two", 1L)))
    assert(state(seq) === (("from file two", 1L)))
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
