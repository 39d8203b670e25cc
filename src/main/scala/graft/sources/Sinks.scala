package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** File sinks (SURVEY §2.1 S8): the reference writes index listings
  * (txt/html), per-thread HTML, breakdown JSON, wiki markdown/html, CSS
  * and binary images (index.py:111-167, breakdown.py:90-101,
  * get_wiki.py:18-26, get_styles.py:16-29). Engine mapping:
  *
  *  - one-file-per-KEY (thread html, wiki page, image): distributed
  *    foreachPartition write — executors write their own rows, no driver
  *    collect ([[writeFilesPerRow]] / [[writeBinaryPerRow]]);
  *  - one-file-per-DATASET (a listing, breakdown JSON): `coalesce(1)`
  *    through the standard text/json writer — a listing is one output
  *    stream by definition, and the filter/agg before it bounds size.
  */
object Sinks {

  /** One text file per row: `<dir>/<key><ext>`. */
  def writeFilesPerRow(rows: Dataset[(String, String)], dir: String,
      ext: String = ""): Unit = {
    Files.createDirectories(Paths.get(dir))
    rows.foreachPartition { it: Iterator[(String, String)] =>
      it.foreach { case (key, payload) =>
        Files.write(Paths.get(dir, key + ext),
          payload.getBytes(StandardCharsets.UTF_8))
      }
    }
  }

  /** One binary file per row (images, media payloads). */
  def writeBinaryPerRow(rows: Dataset[(String, Array[Byte])], dir: String,
      ext: String = ""): Unit = {
    Files.createDirectories(Paths.get(dir))
    rows.foreachPartition { it: Iterator[(String, Array[Byte])] =>
      it.foreach { case (key, payload) =>
        Files.write(Paths.get(dir, key + ext), payload)
      }
    }
  }

  /** Single-file text listing (index.py sink): rows already ordered by
    * the caller; lines written as-is. */
  def writeListing(lines: DataFrame, lineCol: String, path: String): Unit =
    lines.select(col(lineCol)).coalesce(1).write.mode("overwrite").text(path)

  /** Single-file JSON export (breakdown.py:90-101). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)
}
