package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-loop decomposition of q_dedup_eval's phases.
  * (`runMain graft.ProfileDedup [sfDir]`) */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    SparkEntry.queries("q1_agg")(spark, dir).count()
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dedupprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      // corpusWithDups equivalent (PipelineQueries private): documents +
      // planted duplicates
      val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
      val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
      println("docs=" + corpus.count())
      val found = phase("snm found (build+count)") {
        val f = Dedup.sortedNeighborhood(corpus, "doc_id", "text",
          window = 8, thresholdBp = 8000L)
        println("found pairs=" + f.count()); f
      }
      val truth = phase("snm truth (build+count)") {
        val t = Dedup.snmTruthPairs(corpus, "doc_id", "text",
          thresholdBp = 8000L)
        println("truth pairs=" + t.count()); t
      }
      phase("pairSetEval")(Dedup.pairSetEval(found, truth).count())
    }
    spark.stop()
  }
}
