package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object Bench {
  /** Accumulates per-stage executor metrics between resets so each query's
    * JSON row carries its spill/shuffle/peak-memory profile — added after
    * the round-5 q31/q32 bench variance (5x run-to-run swing) was
    * suspected to be storage-pressure-driven but undiagnosable from wall
    * times alone. */
  private class MetricsListener extends SparkListener {
    @volatile var spillMem = 0L
    @volatile var spillDisk = 0L
    @volatile var shuffleWrite = 0L
    @volatile var peakExecMem = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        spillMem += m.memoryBytesSpilled
        spillDisk += m.diskBytesSpilled
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        peakExecMem = math.max(peakExecMem, m.peakExecutionMemory)
      }
    }
    def reset(): Unit = { spillMem = 0L; spillDisk = 0L; shuffleWrite = 0L; peakExecMem = 0L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    // Warmup outside the timed region: one trivial count per input table
    // plus one small query, so parquet footers, filesystem metadata, and
    // the first round of JIT/codegen compilation don't land on whichever
    // query happens to run first (measured ~3 s on q01 as the alphabetical
    // leader). Per-query work is NOT pre-run — only session-level state.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.Tables.table(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    // a known-cheap query (Map order is hash-arbitrary, .head could pick
    // an expensive one) to warm the SQL/codegen pipeline itself
    try SparkEntry.queries("q02_filter_project")(spark, sfDir).count()
    catch { case _: Throwable => () }
    spark.sharedState.cacheManager.clearCache()
    // deterministic name order + a cache flush per query: Map iteration is
    // hash-ordered and several operators cache()/checkpoint intermediates,
    // so without this a query's wall time depends on which queries ran
    // before it (measured: q21 5.4 s cold vs 13.7 s late in a hash-ordered
    // run with accumulated storage).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.sharedState.cacheManager.clearCache()
      listener.reset()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // stage events arrive async; attribute them to THIS query's window
      org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
      // cached bytes still resident at query end (before the next clear):
      // the query's own cache()/localCheckpoint footprint
      val cached = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
      (name, sec, Map(
        "spill_mem" -> listener.spillMem, "spill_disk" -> listener.spillDisk,
        "shuffle_write" -> listener.shuffleWrite,
        "peak_exec_mem" -> listener.peakExecMem, "cached_bytes" -> cached))
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ms = results.map { case (k, _, m) =>
      s"\"" + k + "\":" + m.toSeq.sortBy(_._1)
        .map { case (mk, mv) => s"\"$mk\":$mv" }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the composed corpus-curation pipeline, timed like a query (cold
    // cache) but reported separately: it is a multi-query program, not a
    // SparkEntry oracle row
    spark.sharedState.cacheManager.clearCache()
    val tp = System.nanoTime()
    val pipelineSec =
      try {
        graft.operators.DocumentPipeline.curate(spark, sfDir).count()
        (System.nanoTime() - tp) / 1e9
      } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"metrics":$ms,"pipeline_sec":$pipelineSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
