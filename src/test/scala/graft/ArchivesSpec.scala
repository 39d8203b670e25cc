package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Guard
import graft.sources.Archives

/** Archive ingestion: roundtrip exactness, and the decompression-bomb
  * containment contract — a hostile payload costs at most the cap,
  * degrades to a loud `ok = false` row with an observe() receipt, and
  * never throws or blows the heap. */
class ArchivesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("zip/gzip roundtrip: exact member names, order, bytes") {
    val rng = new scala.util.Random(13)
    val members = (1 to 7).map { i =>
      s"dir/m$i.bin" -> Array.fill(rng.nextInt(5000) + 1)(rng.nextInt(256).toByte)
    }
    val z = Archives.zip(members)
    val back = Archives.zipMembers(z)
    assert(back.isDefined)
    assert(back.get.map(_._1) === members.map(_._1))
    for ((got, want) <- back.get.zip(members))
      assert(got._2.toSeq === want._2.toSeq)
    val payload = Array.fill(20000)(rng.nextInt(256).toByte)
    assert(Archives.gunzip(Archives.gzip(payload)).get.toSeq === payload.toSeq)
  }

  test("bomb containment: caps are enforced DURING inflation, malformed degrades") {
    // a classic flat bomb: 8 MB of zeros deflates to ~8 KB. With a
    // 64 KB member cap the walk must refuse it — and the refusal must
    // not have materialized the 8 MB first (readCapped checks per 8 KB
    // buffer, so peak allocation is the cap, asserted indirectly by the
    // cap itself: a post-hoc check would OOM long before 8 GB-scale
    // bombs, this one returns None in milliseconds).
    val zeros = new Array[Byte](8 * 1024 * 1024)
    val bomb = Archives.zip(Seq("zeros.bin" -> zeros))
    assert(bomb.length < 20000, s"fixture should compress hard: ${bomb.length}")
    assert(Archives.zipMembers(bomb, memberBytesCap = 64 * 1024) === None)
    assert(Archives.gunzip(Archives.gzip(zeros), maxOut = 64 * 1024) === None)
    // within caps the same payload extracts fine
    assert(Archives.zipMembers(bomb).get.head._2.length === zeros.length)
    // member-count cap
    val many = Archives.zip((1 to 50).map(i => s"m$i" -> Array[Byte](1, 2)))
    assert(Archives.zipMembers(many, memberCap = 10) === None)
    assert(Archives.zipMembers(many, memberCap = 50).get.size === 50)
    // total cap across members
    val pair = Archives.zip(Seq("a" -> new Array[Byte](40000),
      "b" -> new Array[Byte](40000)))
    assert(Archives.zipMembers(pair, totalBytesCap = 60000) === None)
    // malformed: random bytes, truncated zip, empty
    val rng = new scala.util.Random(17)
    assert(Archives.zipMembers(Array.fill(500)(rng.nextInt(256).toByte)) === None)
    assert(Archives.zipMembers(bomb.take(bomb.length / 2),
      memberBytesCap = 1L << 30) === None)
    assert(Archives.zipMembers(Array.emptyByteArray) === None)
    assert(Archives.gunzip(Array.fill(100)(7.toByte)) === None)
  }

  test("explodeZip: member rows exact, shed archives loud with observe receipts") {
    import spark.implicits._
    val good1 = Archives.zip(Seq("a.txt" -> "hello".getBytes,
      "b.txt" -> "world!".getBytes))
    val good2 = Archives.zip(Seq("only.txt" -> "xyz".getBytes))
    val bomb = Archives.zip(Seq("z" -> new Array[Byte](1 << 20)))
    val junk = Array.fill(64)(9.toByte)
    val df = Seq((1L, good1), (2L, good2), (3L, bomb), (4L, junk))
      .toDF("doc_id", "payload")
    val out = Archives.explodeZip(df, "doc_id", "payload",
      memberBytesCap = 1024)
    val rows = out.collect().sortBy(r => (r.doc_id, r.idx))
    assert(rows.map(r => (r.doc_id, r.ok, r.member, r.len)).toSeq === Seq(
      (1L, true, "a.txt", 5L), (1L, true, "b.txt", 6L),
      (2L, true, "only.txt", 3L),
      (3L, false, null, 0L), (4L, false, null, 0L)))
    assert(new String(rows(0).bytes) === "hello")
    // runtime receipt: exactly the two shed archives, visible via the
    // graft_shed_ prefix on this dataset's own execution
    val ms = out.queryExecution.observedMetrics.collect {
      case (k, row) if k.startsWith(Guard.ShedMetricPrefix + "zipArchives") => row
    }
    assert(ms.size === 1)
    assert(ms.head.getAs[Long]("shed_archives") === 2L)
  }
}
