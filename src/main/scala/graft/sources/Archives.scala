package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, ZipInputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Compressed-ARCHIVE ingestion: gzip payloads and zip containers as
  * binary columns, exploded to member rows partition-locally — the
  * shape a web/document crawl actually arrives in (WARC-adjacent .gz
  * bodies, zip bundles of documents), using only `java.util.zip`.
  *
  * The 100 TB safety story is DECOMPRESSION-BOMB CONTAINMENT: deflate
  * expands up to ~1032:1, so a 100 KB hostile payload can command
  * 100 MB of heap per row. Every decode here streams through a bounded
  * loop with three caps — bytes per member, members per archive, total
  * bytes per archive — checked DURING inflation (never after), so a
  * bomb costs at most the cap, not the blowup. A payload that is
  * malformed OR breaches a cap degrades to one `ok = false` row per
  * archive (the poison-row contract: nothing throws, nothing hangs, a
  * scan survives), and [[explodeZip]] rides an observe() counter under
  * the `graft_shed_` prefix so sheds are visible at runtime, not
  * silent.
  */
object Archives {

  /** Max members surfaced per zip archive. */
  val MemberCap = 4096
  /** Max decompressed bytes per member / per gzip payload (64 MB). */
  val MemberBytesCap: Long = 1L << 26
  /** Max total decompressed bytes per archive (256 MB). */
  val TotalBytesCap: Long = 1L << 28

  /** One exploded archive member. `ok = false` marks the single row a
    * malformed or cap-breaching archive degrades to (member null). */
  final case class Member(doc_id: Long, ok: Boolean, member: String,
      idx: Int, len: Long, bytes: Array[Byte])

  private def readCapped(in: java.io.InputStream, cap: Long): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (out.size.toLong + n > cap) return None   // bomb wall: checked DURING inflation
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    Some(out.toByteArray)
  }

  /** Decompress one gzip payload with a hard output cap. None on
    * malformed bytes or a cap breach — never throws. */
  def gunzip(b: Array[Byte], maxOut: Long = MemberBytesCap): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(b))
      try readCapped(in, maxOut) finally in.close()
    } catch { case _: Exception => None }

  /** Walk one zip payload to its member list under all three caps.
    * None on malformed bytes or ANY cap breach (partial results from a
    * hostile archive are worse than a loud shed). Directory entries are
    * skipped. */
  def zipMembers(b: Array[Byte], memberCap: Int = MemberCap,
      memberBytesCap: Long = MemberBytesCap,
      totalBytesCap: Long = TotalBytesCap): Option[Seq[(String, Array[Byte])]] =
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(b))
      try {
        val out = Seq.newBuilder[(String, Array[Byte])]
        var count = 0
        var total = 0L
        var e = zin.getNextEntry
        if (e == null) return None                   // not a zip / empty
        while (e != null) {
          if (!e.isDirectory) {
            if (count + 1 > memberCap) return None
            readCapped(zin, math.min(memberBytesCap, totalBytesCap - total)) match {
              case None => return None
              case Some(bytes) =>
                total += bytes.length
                out += ((e.getName, bytes))
                count += 1
            }
          }
          zin.closeEntry()
          e = zin.getNextEntry
        }
        Some(out.result())
      } finally zin.close()
    } catch { case _: Exception => None }

  /** Explode a zip-payload column to member rows, partition-locally
    * (iterator-to-iterator — one archive inflates at a time per task,
    * so peak heap is one capped archive, not a partition's worth).
    * Shed archives surface as `ok = false` rows AND as a runtime
    * observe() counter. */
  def explodeZip(df: DataFrame, id: String, payload: String,
      memberCap: Int = MemberCap, memberBytesCap: Long = MemberBytesCap,
      totalBytesCap: Long = TotalBytesCap): Dataset[Member] = {
    import df.sparkSession.implicits._
    df.select(col(id).cast("long"), col(payload)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (doc, b) =>
          val bytes = if (b == null) Array.emptyByteArray else b
          zipMembers(bytes, memberCap, memberBytesCap, totalBytesCap) match {
            case Some(ms) => ms.iterator.zipWithIndex.map { case ((name, mb), i) =>
              Member(doc, ok = true, name, i, mb.length.toLong, mb)
            }
            case None => Iterator.single(
              Member(doc, ok = false, null, -1, 0L, Array.emptyByteArray))
          }
        }
      }
      .observe(graft.operators.Guard.shedMetricName("zipArchives"),
        sum(when(col("ok") === false, 1L).otherwise(0L)).as("shed_archives"))
      .as[Member]
  }

  /** Mint a zip payload (deflated members) — fixture minting for the
    * oracle queries and specs. */
  def zip(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    members.foreach { case (name, bytes) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(bytes)
      zout.closeEntry()
    }
    zout.close()
    bos.toByteArray
  }

  /** Mint a gzip payload. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }
}
