package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Comment-tree reconstruction (SURVEY §2.3 J5, §2.6 O9, §3 E3;
  * offline_reading.py:101-176, 331-367).
  *
  * Threads are adjacency lists (`parent` → parent node or group root). The
  * reference builds a Python TreeNode graph per submission; here each whole
  * thread is grouped into ONE task via `groupByKey(group)` and materialized
  * with an explicit-stack DFS — no recursion limits, no cross-row shuffling
  * beyond the single grouping exchange, no driver involvement.
  *
  * Scale note (SURVEY §7.4.3): a thread is the unit of parallelism; the
  * largest real threads (~10^5 nodes) fit a task comfortably. A pathological
  * single group is a skew unit AQE cannot split — documented limit.
  */
object Trees {

  /** Input row: node `id`, its `parent` id (null/absent parent ⇒ root), the
    * `group` (thread) key, and a sibling sort key. */
  final case class Node(group: Long, id: Long, parent: Option[Long], sortKey: Long)

  /** Output row: preorder rank within the group, depth from root, and the
    * materialized root-to-node `path` ("/1/5/12"). */
  final case class TreeRow(group: Long, id: Long, depth: Int, path: String, rank: Int)

  /** Reconstruct every tree. Siblings ordered by (sortKey, id) — the
    * reference's default identifier order; score-desc render order is the
    * same operator with a negated sortKey (offline_reading.py:145-151). */
  def build(nodes: Dataset[Node]): Dataset[TreeRow] = {
    import nodes.sparkSession.implicits._
    nodes.groupByKey(_.group).flatMapGroups { (g, it) =>
      val rows = it.toArray
      val byParent = mutable.LongMap.empty[mutable.ArrayBuffer[Node]]
      val ids = mutable.LongMap.empty[Node]
      rows.foreach(n => ids(n.id) = n)
      val roots = mutable.ArrayBuffer.empty[Node]
      rows.foreach { n =>
        n.parent match {
          case Some(p) if ids.contains(p) =>
            byParent.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += n
          case _ => roots += n   // true root, or orphan promoted to root
        }                        // (reference's placeholder semantics)
      }
      def ordered(b: mutable.ArrayBuffer[Node]): Array[Node] =
        b.toArray.sortBy(n => (n.sortKey, n.id))
      var rank = 0
      val out = mutable.ArrayBuffer.empty[TreeRow]
      // explicit stack: (node, depth, path) — handles unbounded depth
      val stack = mutable.Stack.empty[(Node, Int, String)]
      ordered(roots).reverseIterator.foreach(n => stack.push((n, 0, s"/${n.id}")))
      while (stack.nonEmpty) {
        val (n, d, p) = stack.pop()
        out += TreeRow(g, n.id, d, p, rank)
        rank += 1
        byParent.get(n.id).foreach { kids =>
          ordered(kids).reverseIterator.foreach(k => stack.push((k, d + 1, s"$p/${k.id}")))
        }
      }
      out.iterator
    }
  }

  /** Untyped adapter: (groupCol, idCol, parentCol, sortCol) → TreeRow frame. */
  def buildFrame(df: DataFrame, group: String, id: String, parent: String,
      sortKey: String): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(
      col(group).cast("long").as("group"),
      col(id).cast("long").as("id"),
      col(parent).cast("long").as("parent"),
      col(sortKey).cast("long").as("sortKey"))
      .as[(Long, Long, Option[Long], Long)]
      .map { case (g, i, p, s) => Node(g, i, p, s) }
    build(ds).toDF()
  }
}
