package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Trees
import graft.operators.Trees.Node

class TreesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("J5/O9 tree build: depth, path, preorder rank, sibling order") {
    import spark.implicits._
    //   1
    //   ├─ 2 ── 4
    //   └─ 3
    val nodes = Seq(
      Node(10L, 1L, None, 0L),
      Node(10L, 3L, Some(1L), 2L),
      Node(10L, 2L, Some(1L), 1L),
      Node(10L, 4L, Some(2L), 1L)).toDS()
    val got = Trees.build(nodes).collect().sortBy(_.rank)
    assert(got.map(_.id).toSeq === Seq(1L, 2L, 4L, 3L))
    assert(got.map(_.depth).toSeq === Seq(0, 1, 2, 1))
    assert(got.find(_.id == 4L).get.path === "/1/2/4")
  }

  test("orphan parents promoted to roots (offline_reading.py:346-366 placeholders)") {
    import spark.implicits._
    val nodes = Seq(
      Node(10L, 5L, Some(99L), 0L), // parent 99 not in group
      Node(10L, 6L, Some(5L), 0L)).toDS()
    val got = Trees.build(nodes).collect().sortBy(_.rank)
    assert(got.map(_.id).toSeq === Seq(5L, 6L))
    assert(got.map(_.depth).toSeq === Seq(0, 1))
  }

  test("deep chain (1000 levels) does not overflow the stack") {
    import spark.implicits._
    val nodes = (1L to 1000L).map(i =>
      Node(1L, i, if (i == 1) None else Some(i - 1), 0L)).toDS()
    val got = Trees.build(nodes).collect()
    assert(got.length === 1000)
    assert(got.maxBy(_.depth).depth === 999)
  }

  test("multiple groups stay independent (one thread per task group)") {
    import spark.implicits._
    val nodes = Seq(
      Node(1L, 1L, None, 0L), Node(1L, 2L, Some(1L), 0L),
      Node(2L, 1L, None, 0L)).toDS()
    val got = Trees.build(nodes).collect()
    assert(got.count(_.group == 1L) === 2)
    assert(got.count(_.group == 2L) === 1)
  }
}
