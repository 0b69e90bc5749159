package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan inspector: run registered queries at a given sfDir and
  * dump each FINAL (post-AQE) plan's exchange/join skeleton — the quick
  * check that exchange reuse / join strategies / partition pruning hold
  * in the plan that actually ran, which `ExplainAudit`'s static view
  * cannot see (AQE re-plans at runtime; ReusedExchange in particular
  * only appears once stages materialize).
  *
  * Usage: `runMain graft.tools.PlanProbe [sfDir] [queryName ...]`
  * (default: the sign-LSH embedding path that motivated it). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q34_lsh_embedding_pairs")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // inspect the working pipeline, not the post-checkpoint RDD scan
    graft.operators.Answer.planAuditBypass = true
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $n")
      println("  Exchange: " +
        "Exchange hashpartitioning".r.findAllIn(plan).length +
        "  ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).length +
        "  dynamicpruning: " + "dynamicpruning".r.findAllIn(plan).length)
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    }
    spark.stop()
  }
}
