package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan-inspection main: run a named registered query (or a
  * hard-wired probe) at a given sfDir, execute it, and dump the FINAL
  * AQE plan's exchange/join skeleton — the quick check that exchange
  * reuse / join strategies hold in the executed (not just static) plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Dedup.embeddingCosinePairsLsh(spark, sfDir,
      nBits = 4, nTables = 6)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("=== Exchange count: " +
      "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("=== ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
