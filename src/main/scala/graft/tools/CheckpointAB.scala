package graft.tools

import org.apache.spark.sql.SparkSession

/** r19 settlement probe (VERDICT r18 "Next round" #1): same-session A/B
  * of the eager answer-mass checkpoint (operators.Answer.sorted) per
  * funnel query at the caller's core count. Arm "on" is the production
  * plan; arm "off" flips Answer.planAuditBypass so `sorted` degrades to a
  * plain orderBy (the pre-r18 plan shape). Trials alternate arms so
  * sandbox load drift hits both arms equally; storage is flushed between
  * trials exactly like the bench harness. Tooling only — never a query
  * path.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CheckpointAB [sfDir] [q1,q2,...]
  */
object CheckpointAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q22_lsh_match_score", "q22_lsh_match_score_auto",
        "q31_capped_ngram_jaccard", "q31_dedup_ngram_jaccard",
        "q33_dedup_simhash", "q34_lsh_embedding_pairs",
        "q34_lsh_auto_embedding_pairs", "q52_dedup_corpus",
        "q12_string_norm")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def clearStorage(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.execute().count()
    // warmup: footers + codegen, like the bench
    try graft.SparkEntry.queries("q02_filter_project")(spark, sfDir).count()
    catch { case _: Throwable => () }

    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    for (name <- queries) {
      val fn = graft.SparkEntry.queries(name)
      val trials = 3
      // alternate off/on within each trial round
      val times = collection.mutable.Map("on" -> List.empty[Double],
        "off" -> List.empty[Double])
      for (t <- 1 to trials; arm <- Seq("off", "on")) {
        graft.operators.Answer.planAuditBypass = (arm == "off")
        clearStorage()
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[ab] $name $arm FAILED: $e") }
        val sec = (System.nanoTime() - t0) / 1e9
        times(arm) = times(arm) :+ sec
        println(f"[ab] $name%-32s $arm%-4s trial$t ${sec}%8.3f s  load=${loadAvg}%5.2f")
      }
      graft.operators.Answer.planAuditBypass = false
      def med(xs: List[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[ab] MEDIAN $name%-32s on=${med(times("on"))}%8.3f  off=${med(times("off"))}%8.3f  ratio_on_over_off=${med(times("on")) / med(times("off"))}%6.3f")
    }
    spark.stop()
  }
}
