package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Merge, Normalize}
import graft.render.OfflineReading
import graft.sources.Ndjson
import graft.streaming.Livestream

/** End-to-end lifecycle (SURVEY §3 E1-E3): one NDJSON dump through
  * discriminate → normalize → versioned upsert (with CDC) → analytics →
  * render — the whole reference workflow as one connected pipeline run.
  */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E1→E2→E3: dump → store → breakdown/index/render") {
    val raw = Ndjson.read(spark, TestSpark.fixture("pushshift_fixture.ndjson"))

    // E1: discriminate + normalize + upsert into fresh versioned tables
    val subs = Normalize.submissions(Ndjson.submissionsRaw(raw))
      .withColumn("_seq", monotonically_increasing_id())
    val coms = Normalize.comments(Ndjson.commentsRaw(raw))
      .withColumn("_seq", monotonically_increasing_id())
    val subTable = new Livestream.UpsertTable(spark,
      Files.createTempDirectory("lc_subs").toString, Merge.submissions,
      subs.drop("_edited", "_seq").limit(0))
    val comTable = new Livestream.UpsertTable(spark,
      Files.createTempDirectory("lc_coms").toString, Merge.comments,
      coms.drop("_edited", "_seq").limit(0))
    subTable.merge(subs, "_seq")
    comTable.merge(coms, "_seq")
    val storedSubs = subTable.current
    val storedComs = comTable.current
    assert(storedSubs.count() > 0 && storedComs.count() > 0)
    // idstr unique after upsert (S3/J2 dedupe semantics)
    assert(storedSubs.select("idstr").distinct().count() === storedSubs.count())

    // E2: breakdown + index listing over the stored tables
    val bd = Analytics.breakdownSorted(
      Analytics.breakdown(storedSubs, storedComs, "author"), "total").collect()
    assert(bd.nonEmpty)
    val subCount = storedSubs.count(); val comCount = storedComs.count()
    assert(bd.map(_.getAs[Long]("total")).sum === subCount + comCount)
    val listing = Analytics.indexListing(storedSubs, 0L, "date").collect()
    assert(listing.length === subCount)

    // E3: per-thread HTML render from the same stored tables
    val pages = OfflineReading.fromFrames(
      storedSubs, storedComs).collect().toMap
    assert(pages.nonEmpty)
    // every rendered page is a full document
    pages.values.foreach { html =>
      assert(html.startsWith("<html>") && html.endsWith("</html>"))
    }
    // a comment of a known thread lands inside its submission's page
    val aThread = storedComs.select("submission").head().getString(0)
    if (pages.contains(aThread)) {
      val cid = storedComs.filter($"submission" === aThread)
        .select("idstr").head().getString(0)
      assert(pages(aThread).contains(s"""id="$cid""""))
    }
  }
}
