package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * r18 plan-evidence artifact generator (`plans/r18/<query>_{before,after}.txt`).
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] [query ...]`
  * (default sfDir sf0.1, default queries = all registered). Runs with the
  * plan-audit bypass so the formatted plan shows the working pipeline the
  * answer checkpoint materializes, not a truncated Scan ExistingRDD.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [sfDir] [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length >= 3) args(2) else "/root/testdata/sf0.1"
    val names = if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(n: String): String = graft.SparkEntry.queries(n)(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (n <- names) {
      try {
        // two sections: the plan AS CONSTRUCTED (post-r18 this ends at the
        // answer checkpoint's RDD scan — the proof the final sort reads
        // materialized rows), and the WORKING PIPELINE the checkpoint
        // materializes (via the audit bypass) where the operator/kernel
        // claims are checkable. Pre-r18 the two sections are identical.
        graft.operators.Answer.planAuditBypass = false
        val asConstructed = fmt(n)
        graft.operators.Answer.planAuditBypass = true
        val pipeline = fmt(n)
        graft.operators.Answer.planAuditBypass = false
        val txt = s"== AS CONSTRUCTED (what the bench executes) ==\n" +
          asConstructed +
          (if (pipeline == asConstructed) ""
           else s"\n== WORKING PIPELINE (materialized by the pre-sort checkpoint; " +
             s"plan-audit bypass) ==\n" + pipeline)
        java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
        println(s"[plandump] wrote ${n}_$suffix.txt")
      } catch { case e: Throwable =>
        graft.operators.Answer.planAuditBypass = false
        System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
