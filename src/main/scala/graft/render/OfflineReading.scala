package graft.render

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.MarkdownLite

/** Thread reconstruction + HTML render (SURVEY §3 E3, §2.3 J5, §2.6 O9,
  * §2.1 S8; reference offline_reading.py:180-390).
  *
  * The reference iterates submissions on the driver, point-fetching each
  * thread's comments and rendering recursively. Here the whole corpus
  * renders in ONE distributed pass: submissions and comments are
  * cogrouped on the thread key, each task assembles its threads' HTML
  * with an explicit-stack post-order walk (unbounded depth, no driver
  * involvement), and the grouping exchange is the only shuffle. A thread
  * is the unit of parallelism (SURVEY §7.4.3).
  *
  * Templates mirror offline_reading.py:9-98 (header/comment/submission/
  * footer); render sibling order is score-desc (html_from_database sorts
  * by `score * -1`, offline_reading.py:211) with an idstr tiebreak for
  * determinism. Divergence: `>` escapes as `&gt;`, not the reference's
  * `&rt;` typo (SURVEY §7.4.5).
  */
object OfflineReading {

  final case class SubRow(idstr: String, title: String, author: String,
      created: Long, score: Long, subreddit: String,
      url: Option[String], selftext: Option[String])

  final case class ComRow(idstr: String, submission: String, parent: String,
      author: String, created: Long, score: Long, body: String)

  // -- scalar helpers (reference offline_reading.py:248-283) ---------------

  private val humanFmt =
    DateTimeFormatter.ofPattern("MMM dd yyyy HH:mm:ss", Locale.US)
      .withZone(ZoneOffset.UTC)

  /** F3 `human` (common.py:94-97). */
  def human(epoch: Long): String = humanFmt.format(Instant.ofEpochSecond(epoch))

  private def stripType(id: String): String =
    if (id.matches("^t[0-9]_.*")) id.substring(3) else id

  /** html_helper_permalink (offline_reading.py:250-257). */
  def permalinkSubmission(subreddit: String, idstr: String): String =
    s"https://old.reddit.com/r/$subreddit/comments/${stripType(idstr)}"
  def permalinkComment(subreddit: String, submission: String, idstr: String): String =
    s"https://old.reddit.com/r/$subreddit/comments/${stripType(submission)}/_/${stripType(idstr)}"

  /** html_helper_userlink (offline_reading.py:272-283). */
  def userlink(author: String): String =
    if (author == null || author.equalsIgnoreCase("[deleted]")) "[deleted]"
    else s"""<a href="https://old.reddit.com/u/$author">$author</a>"""

  /** html_helper_urlortext (offline_reading.py:259-270). */
  def urlOrText(url: Option[String], selftext: Option[String]): String =
    url.filter(_.nonEmpty)
      .map(u => s"""<a href="$u">$u</a>""")
      .orElse(selftext.filter(_.nonEmpty).map(MarkdownLite.render))
      .getOrElse("")

  // -- templates (offline_reading.py:9-98) ---------------------------------

  private def headerHtml(title: String): String =
    s"""<html>
       |<head>
       |<title>$title</title>
       |<meta charset="UTF-8">
       |<meta name="viewport" content="width=device-width, initial-scale=1.0"/>
       |
       |<style>
       |.submission, .comment
       |{
       |    padding-left: 20px;
       |    padding-right: 4px;
       |}
       |.comment
       |{
       |    margin-top: 4px;
       |    margin-bottom: 4px;
       |    border: 1px solid black;
       |}
       |.submission
       |{
       |    border: 2px solid blue;
       |}
       |.hidden
       |{
       |    display: none;
       |}
       |</style>
       |</head>
       |<body>""".stripMargin

  private val footerHtml: String =
    """</body>
      |
      |<script>
      |function toggle_collapse(comment_div)
      |{
      |    var button = comment_div.getElementsByClassName("toggle_hide_button")[0];
      |    var collapsible = comment_div.getElementsByClassName("collapsible")[0];
      |    if (collapsible.classList.contains("hidden"))
      |    {
      |        collapsible.classList.remove("hidden");
      |        button.innerText = "[-]";
      |    }
      |    else
      |    {
      |        collapsible.classList.add("hidden");
      |        button.innerText = "[+]";
      |    }
      |}
      |</script>
      |</html>""".stripMargin

  private def commentHtml(c: ComRow, subreddit: String, children: String): String =
    s"""<div class="comment" id="${c.idstr}">
       |    <p class="userinfo">
       |        <a
       |        class="toggle_hide_button"
       |        href="javascript:void(0)"
       |        onclick="toggle_collapse(this.parentElement.parentElement)">[-]
       |        </a>
       |        ${userlink(c.author)}
       |        |
       |        <span class="score">${c.score} points</span>
       |        |
       |        <a class="timestamp" href="${permalinkComment(subreddit, c.submission, c.idstr)}">${human(c.created)}</a>
       |    </p>
       |    <div class="collapsible">
       |        ${MarkdownLite.render(c.body)}
       |        $children
       |    </div>
       |</div>""".stripMargin

  private def submissionHtml(s: SubRow, children: String): String =
    s"""<div class="submission" id="${s.idstr}">
       |    <p class="userinfo">
       |        ${userlink(s.author)}
       |        |
       |        <span class="score">${s.score} points</span>
       |        |
       |        <a class="timestamp" href="${permalinkSubmission(s.subreddit, s.idstr)}">${human(s.created)}</a>
       |    </p>
       |    <strong>${s.title}</strong>
       |    <p>${urlOrText(s.url, s.selftext)}</p>
       |</div>
       |$children""".stripMargin

  // -- thread assembly ------------------------------------------------------

  /** One thread → one HTML page. Siblings score-desc with idstr tiebreak;
    * orphaned parents promote their subtree to root level (the reference's
    * placeholder semantics, offline_reading.py:346-366). Post-order with an
    * explicit stack: child HTML is assembled before its parent embeds it,
    * any depth. */
  def renderThread(sub: SubRow, comments: Array[ComRow]): String = {
    val ids = comments.iterator.map(_.idstr).toSet
    val byParent = mutable.HashMap.empty[String, mutable.ArrayBuffer[ComRow]]
    val roots = mutable.ArrayBuffer.empty[ComRow]
    comments.foreach { c =>
      if (c.parent != null && ids.contains(c.parent))
        byParent.getOrElseUpdate(c.parent, mutable.ArrayBuffer.empty) += c
      else roots += c
    }
    def ordered(b: mutable.ArrayBuffer[ComRow]): Array[ComRow] =
      b.toArray.sortBy(c => (-c.score, c.idstr))

    val htmlOf = mutable.HashMap.empty[String, String]
    def assemble(root: ComRow): Unit = {
      val stack = mutable.Stack[(ComRow, Boolean)]((root, false))
      while (stack.nonEmpty) {
        val (n, expanded) = stack.pop()
        val kids = byParent.get(n.idstr)
        if (!expanded) {
          stack.push((n, true))
          kids.foreach(b => ordered(b).foreach(k => stack.push((k, false))))
        } else {
          val children = kids match {
            case Some(b) => ordered(b).map(k => htmlOf(k.idstr)).mkString("\n\n")
            case None => ""
          }
          htmlOf(n.idstr) = commentHtml(n, sub.subreddit, children)
        }
      }
    }
    ordered(roots).foreach(assemble)
    val rootHtml = ordered(roots).map(r => htmlOf(r.idstr)).mkString("\n\n")
    headerHtml(sub.title) + "\n" + submissionHtml(sub, rootHtml) + "\n" + footerHtml
  }

  /** All threads → (submission idstr, html). Cogroup = one exchange per
    * side on the thread key; everything after is task-local. */
  def htmlForThreads(subs: Dataset[SubRow], comments: Dataset[ComRow]): Dataset[(String, String)] = {
    val spark = subs.sparkSession
    import spark.implicits._
    subs.groupByKey(_.idstr).cogroup(comments.groupByKey(_.submission)) {
      (_, sIt, cIt) =>
        sIt.buffered.headOption match {
          case None => Iterator.empty // orphan comments without a submission
          case Some(sub) => Iterator((sub.idstr, renderThread(sub, cIt.toArray)))
        }
    }.toDF("idstr", "html").as[(String, String)]
  }

  /** S8 sink: one HTML file per submission (reference writes
    * `<idstr>.html` per thread, offline_reading.py:384-390). Distributed
    * foreachPartition write — no driver collect. */
  def writeHtmlFiles(pages: Dataset[(String, String)], outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    pages.foreachPartition { it: Iterator[(String, String)] =>
      it.foreach { case (idstr, html) =>
        Files.write(Paths.get(outDir, s"$idstr.html"),
          html.getBytes(StandardCharsets.UTF_8))
      }
    }
  }

  /** Untyped adapter from canonical store frames. */
  def fromFrames(submissions: org.apache.spark.sql.DataFrame,
      comments: org.apache.spark.sql.DataFrame): Dataset[(String, String)] = {
    val spark = submissions.sparkSession
    import spark.implicits._
    val subs = submissions.select("idstr", "title", "author", "created",
      "score", "subreddit", "url", "selftext").as[SubRow]
    val coms = comments.select("idstr", "submission", "parent", "author",
      "created", "score", "body").as[ComRow]
    htmlForThreads(subs, coms)
  }
}
