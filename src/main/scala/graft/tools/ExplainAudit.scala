package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * plus quick red-flag checks (missing parquet pushdown, full-schema
  * reads, non-broadcast dimension joins, codegen gaps).
  *
  *   runMain graft.tools.ExplainAudit [sfDir] [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE wraps everything in AdaptiveSparkPlan and defers codegen to
      // runtime stages; disable it here so static codegen coverage shows
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // audit the working pipeline, not the post-checkpoint Scan ExistingRDD
    // (and keep this tool plan-only — the checkpoint is eager)
    graft.operators.Answer.planAuditBypass = true
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString()
      val codegenPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      val nCodegen = "Found (\\d+) WholeStageCodegen".r
        .findFirstMatchIn(codegenPlan).map(_.group(1)).getOrElse("?")
      val flags = scala.collection.mutable.ArrayBuffer.empty[String]
      if (plan.contains("PushedFilters: []") && plan.contains("Filter")) flags += "NO-PUSHDOWN?"
      if (nCodegen == "0") flags += "NO-CODEGEN"
      flags += s"codegen-stages=$nCodegen"
      val scans = "ReadSchema: [^\n]+".r.findAllIn(plan).toSeq
      println(s"===== $n ${if (flags.nonEmpty) flags.mkString(" [", ",", "]") else "[ok]"}")
      scans.foreach(s => println(s"  $s"))
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
        .findAllIn(plan).toSeq.groupBy(identity).foreach { case (k, v) =>
          println(s"  join: $k x${v.size}")
        }
      if (sys.env.contains("AUDIT_FULL")) { println(codegenPlan.linesIterator.take(3).mkString("\n")); println(plan) }
    }
    spark.stop()
  }
}
