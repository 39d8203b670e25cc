package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500, the web-archive format crawls actually ship in:
  * Common Crawl, Heritrix, wget --warc) — pure-JVM record walk over a
  * binary payload column, partition-local, under the Archives bomb
  * caps. Handles both bare `.warc` bytes and `.warc.gz` (each record a
  * separate gzip member, concatenated — `GZIPInputStream` consumes
  * consecutive members, so one capped gunzip yields the whole file).
  *
  * Per record: the WARC header block (version line + `Name: value`
  * headers to the blank line), `Content-Length`-delimited block, and —
  * for records whose block is an HTTP message — the HTTP status line,
  * `Content-Type`, and body split at the header/body boundary. A
  * malformed or cap-breaching payload degrades to one `ok = false` row
  * (the Archives contract) with a `graft_shed_` observe() receipt.
  */
object Warc {

  /** Max records surfaced per WARC payload. */
  val RecordCap = 4096

  /** One parsed record. HTTP fields null for non-HTTP blocks; a
    * malformed payload yields a single `ok = false` row. */
  final case class Record(doc_id: Long, ok: Boolean, idx: Int,
      warc_type: String, target_uri: String, http_status: Int,
      http_content_type: String, body_len: Long, body: Array[Byte])

  private def ascii(b: Array[Byte], o: Int, len: Int): String =
    new String(b, o, len, "ISO-8859-1")

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    while (i + 3 < limit) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Parse the record sequence of a (decompressed) WARC byte stream.
    * None on malformed framing or any cap breach. */
  def parseRecords(b: Array[Byte], recordCap: Int = RecordCap,
      bodyCap: Long = Archives.MemberBytesCap,
      totalCap: Long = Archives.TotalBytesCap)
      : Option[Seq[(String, String, Int, String, Array[Byte])]] = {
    val out = Seq.newBuilder[(String, String, Int, String, Array[Byte])]
    var i = 0
    var count = 0
    var total = 0L
    if (b.length < 5 || ascii(b, 0, 5) != "WARC/") return None
    while (i < b.length) {
      // skip inter-record CRLFs
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i >= b.length) return Some(out.result())
      if (i + 5 > b.length || ascii(b, i, 5) != "WARC/") return None
      val he = indexOfCrlfCrlf(b, i, b.length)
      if (he < 0) return None
      val headers = ascii(b, i, he - i).split("\r\n").drop(1)
        .flatMap { line =>
          val c = line.indexOf(':')
          if (c < 0) None else Some(line.take(c).trim.toLowerCase -> line.drop(c + 1).trim)
        }.toMap
      val len = headers.get("content-length").flatMap(v =>
        scala.util.Try(v.toLong).toOption).getOrElse(-1L)
      if (len < 0 || len > bodyCap) return None
      total += len
      if (total > totalCap) return None
      count += 1
      if (count > recordCap) return None
      val blockStart = he + 4
      if (blockStart.toLong + len > b.length) return None     // torn block
      val block = java.util.Arrays.copyOfRange(b, blockStart, blockStart + len.toInt)
      val wtype = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", null)
      // HTTP message block? split status/headers/body
      val (status, ctype, body) =
        if (block.length >= 5 && ascii(block, 0, 5) == "HTTP/") {
          val hhe = indexOfCrlfCrlf(block, 0, block.length)
          if (hhe < 0) (-1, null, block)
          else {
            val lines = ascii(block, 0, hhe).split("\r\n")
            val st = lines.head.split(" ").drop(1).headOption
              .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(-1)
            val ct = lines.tail.flatMap { l =>
              val c = l.indexOf(':')
              if (c >= 0 && l.take(c).trim.equalsIgnoreCase("Content-Type"))
                Some(l.drop(c + 1).trim) else None
            }.headOption.orNull
            (st, ct, java.util.Arrays.copyOfRange(block, hhe + 4, block.length))
          }
        } else (-1, null, block)
      out += ((wtype, uri, status, ctype, body))
      i = blockStart + len.toInt
    }
    Some(out.result())
  }

  /** Explode a warc/warc.gz payload column to record rows. Gzip is
    * sniffed by magic (1f 8b) and decompressed under the Archives cap
    * first. Shed payloads surface as `ok = false` rows + a runtime
    * observe() receipt. */
  def explode(df: DataFrame, id: String, payload: String,
      recordCap: Int = RecordCap,
      bodyCap: Long = Archives.MemberBytesCap,
      totalCap: Long = Archives.TotalBytesCap): Dataset[Record] = {
    import df.sparkSession.implicits._
    df.select(col(id).cast("long"), col(payload)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (doc, p0) =>
          val p = if (p0 == null) Array.emptyByteArray else p0
          val raw =
            if (p.length >= 2 && (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
              Archives.gunzip(p, totalCap)
            else Some(p)
          raw.flatMap(parseRecords(_, recordCap, bodyCap, totalCap)) match {
            case Some(rs) => rs.iterator.zipWithIndex.map {
              case ((t, uri, st, ct, body), i) =>
                Record(doc, ok = true, i, t, uri, st, ct, body.length.toLong, body)
            }
            case None => Iterator.single(Record(doc, ok = false, -1,
              null, null, -1, null, 0L, Array.emptyByteArray))
          }
        }
      }
      .observe(graft.operators.Guard.shedMetricName("warcPayloads"),
        sum(when(col("ok") === false, 1L).otherwise(0L)).as("shed_payloads"))
      .as[Record]
  }

  /** Mint a WARC file: one HTTP-response record per (uri, contentType,
    * body); `gzipPerRecord` emits the standard one-gzip-member-per-
    * record .warc.gz layout. */
  def mint(records: Seq[(String, String, Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val parts = records.zipWithIndex.map { case ((uri, ctype, body), i) =>
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
      if (gzipPerRecord) Archives.gzip(rec) else rec
    }
    parts.flatten.toArray
  }
}
