package graft

import org.apache.spark.sql.functions._

/** Dev-loop decomposition of q_triangles' phases.
  * (`runMain graft.ProfileTri [sfDir]`) */
object ProfileTri {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    SparkEntry.queries("q1_agg")(spark, dir).count()
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[triprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      val e = phase("denseEdges ckpt+count") {
        val c = edges.localCheckpoint(false)
        println("edges=" + c.count()); c
      }
      val deg = e.select(col("u").as("p")).unionByName(e.select(col("v").as("p")))
        .groupBy("p").agg(count(lit(1)).as("deg"))
      val withK = e
        .join(deg.select(col("p").as("u"),
          (col("deg") * 4294967296L + col("p")).as("ku")), "u")
        .join(deg.select(col("p").as("v"),
          (col("deg") * 4294967296L + col("p")).as("kv")), "v")
      val oriented = phase("oriented ckpt+count") {
        val o = withK.select(
            when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
            when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
            when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kdst"))
          .localCheckpoint(false)
        println("oriented=" + o.count()); o
      }
      val w1 = oriented.select(col("src"), col("dst").as("b"), col("kdst").as("kb"))
      val w2 = oriented.select(col("src"), col("dst").as("c"), col("kdst").as("kc"))
      val wedges = w1.join(w2, Seq("src")).filter(col("kb") < col("kc"))
        .select(col("src"), col("b"), col("c"))
      val close = oriented.select(col("src").as("b"), col("dst").as("c"))
      phase("wedge count (no close)")(println("wedges=" + wedges.count()))
      val tri = phase("wedges+broadcast close") {
        val t = wedges.join(broadcast(close), Seq("b", "c"))
          .select(col("src").as("a"), col("b"), col("c")).localCheckpoint(false)
        println("tri=" + t.count()); t
      }
      phase("per-node top-20") {
        tri.select(col("a").as("p"))
          .unionByName(tri.select(col("b").as("p")))
          .unionByName(tri.select(col("c").as("p")))
          .groupBy("p").agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("p").asc)
          .limit(20).count()
      }
    }
    spark.stop()
  }
}
