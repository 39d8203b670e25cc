package graft

import org.apache.spark.sql.execution.ExplainMode

/** Batch plan capture for the round's plan-diff deliverables: executes
  * each named query (so AQE's final plan is what prints) and writes
  * `<outDir>/<query><suffix>.txt` with the formatted executed plan plus
  * the PlanAudit counters line.
  * (`runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]`) */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,..> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    new java.io.File(outDir).mkdirs()
    val spark = Sessions.local()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      df.collect()
      val c = PlanAudit.counters(df)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")) +
        s"\n[plan-audit] exchanges=${c.exchanges} reused=${c.reused} " +
        s"broadcasts=${c.broadcasts} scans=${c.scans} wholestage=${c.wholestage}\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
        txt.getBytes)
      println(s"[plandump] wrote $name$suffix")
    }
    spark.stop()
  }
}
