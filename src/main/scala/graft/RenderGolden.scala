package graft

/** Dev tool: freeze `q_render_html`'s output as the committed golden
  * parquet the DuckDB oracle reads (`runMain graft.RenderGolden <sfDir>
  * [goldenDir]`).
  *
  * Rendered HTML is not SQL-expressible, so the driver row was rows-only
  * for seven rounds. The verification story now has two layers:
  * RenderSpec pins construct-level semantics (per-markdown-construct
  * golden HTML, escape rules, tree order, flood hardening) against the
  * reference's offline_reading.py behavior, and the committed golden
  * pins the FULL-corpus (idstr, html_len, html_md5) output so any
  * rendering regression flips the driver's hash gate. Regenerating the
  * golden is an explicit, reviewed act (rerun this tool + commit),
  * never something a code change can do silently. */
object RenderGolden {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RenderGolden <sfDir> [goldenDir]")
    val sfDir = args(0)
    val goldenDir = if (args.length > 1) args(1) else "src/test/resources/golden"
    val sfName = new java.io.File(sfDir).getName
    val spark = Sessions.local()
    val tmp = java.nio.file.Files.createTempDirectory("render_golden").toString
    SparkEntry.queries("q_render_html")(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = java.nio.file.Paths.get(goldenDir, s"render_$sfName.parquet")
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"[golden] wrote $dest")
    spark.stop()
  }
}
