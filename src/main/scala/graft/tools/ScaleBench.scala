package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Scaling-point measurement for the production dedup/match chain.
  *
  * The plan audits (ExplainAuditSpec, per-round verdicts) argue every
  * registered production path is linear-ish in the corpus; this harness
  * MEASURES one scaling point instead of asserting it: generate a
  * seed-fixed synthetic corpus at 1x (the sf0.1 shape: 5 k documents,
  * 2 k embeddings, 20 k part records) and at 10x, run the chain at both
  * scales, and emit wall-times + spill so the growth factor is a
  * committed artifact (`SCALE.json`).
  *
  * Generators mirror the driver testdata's distributions (small word
  * vocabulary, ~5% near-duplicate documents with light edits, Gaussian
  * cluster structure in the embeddings, TPC-H-ish part columns) so the
  * candidate-pair mass grows the way a real corpus's would.
  *
  *   runMain graft.tools.ScaleBench [factors...]   (default: 1 10)
  */
object ScaleBench {

  private val Adjectives = Vector("large", "hot", "blue", "old", "cold",
    "small", "dark", "light", "new", "fast")
  private val Nouns = Vector("ring", "bolt", "plate", "gear", "wheel", "pin")
  private val DocWords = Vector("batch", "part", "spark", "line", "column",
    "order", "small", "sort", "vector", "scan", "fast", "query", "agg",
    "slow", "value", "filter", "customer", "string", "join", "shuffle",
    "key", "row", "group", "hash", "read", "write", "merge", "cache",
    "disk", "plan", "stage", "task")

  def genDocuments(spark: SparkSession, n: Int, seed: Long = 7L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val docs = new scala.collection.mutable.ArrayBuffer[Array[String]](n)
    val rows = (0 until n).map { i =>
      val toks: Array[String] =
        if (i > 20 && rnd.nextDouble() < 0.05) {
          // near-duplicate of an earlier doc: copy + a couple of edits —
          // the corpus mass q31/q32/q42/q50/q52 exists to find
          val base = docs(rnd.nextInt(docs.length)).clone()
          val edits = 1 + rnd.nextInt(2)
          (0 until edits).foreach { _ =>
            base(rnd.nextInt(base.length)) = DocWords(rnd.nextInt(DocWords.length))
          }
          base
        } else {
          Array.fill(15 + rnd.nextInt(70))(DocWords(rnd.nextInt(DocWords.length)))
        }
      docs += toks
      val text = toks.mkString(" ")
      Row(i.toLong, text, if (rnd.nextInt(10) == 0) "de" else "en",
        s"src${i % 5}", text.length.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
  }

  def genEmbeddings(spark: SparkSession, n: Int, dim: Int = 64,
      seed: Long = 11L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // topic count scales with the corpus (constant expected cluster
    // size): with k FIXED, the number of genuinely-similar pairs grows
    // ~n^2/k and ANY pair-enumerating operator's OUTPUT is quadratic —
    // the first artifact run measured exactly that (11.9 M true pairs at
    // 10x, a 42x time ratio that was answer mass, not operator shape)
    val k = math.max(16, n / 125)
    val centers = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until n).map { i =>
      val c = centers(rnd.nextInt(k))
      val v = Array.tabulate(dim)(d => (c(d) + 0.6 * rnd.nextGaussian()).toFloat)
      Row(i.toLong, v.toSeq, (i % k).toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", LongType))))
  }

  def genPart(spark: SparkSession, n: Int, seed: Long = 13L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val types = Vector("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    // the record key space must scale with n (a real catalog's does): a
    // fixed 60-name vocabulary makes exact-duplicate records — and hence
    // the fuzzy-match ANSWER — grow quadratically with the corpus
    val lots = math.max(50, n / 40)
    val rows = (0 until n).map { i =>
      Row(i.toLong,
        s"${Adjectives(rnd.nextInt(Adjectives.length))} ${Nouns(rnd.nextInt(Nouns.length))} lot${rnd.nextInt(lots)}",
        s"Brand#${1 + rnd.nextInt(25)}", types(rnd.nextInt(types.length)),
        1L + rnd.nextInt(50))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8),
      StructType(Seq(StructField("p_partkey", LongType), StructField("p_name", StringType),
        StructField("p_brand", StringType), StructField("p_type", StringType),
        StructField("p_size", LongType))))
  }

  private class MetricsListener extends SparkListener {
    @volatile var spillDisk = 0L
    @volatile var shuffleWrite = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        spillDisk += m.diskBytesSpilled
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = { spillDisk = 0L; shuffleWrite = 0L }
  }

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    import graft.operators.{Dedup, DocumentPipeline, TextQueries}
    // the production chain: LSH text dedup, capped n-gram pairs, cluster
    // assembly + corpus decision, incremental batch dedup, embedding LSH
    // twins, sqrt(n) semantic dedup, LSH-fronted fuzzy match, composed
    // pipeline — every registered scale path that the plan audit grades
    val chain: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q32_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
      "q31_capped_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d, dfCap = 50)),
      "q42_neardup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
      "q52_dedup_corpus" -> ((s, d) => Dedup.dedupCorpus(s, d)),
      "q50_incremental_dedup" -> ((s, d) => Dedup.incrementalDedupPairs(s, d)),
      "q34_lsh_embedding_pairs" -> ((s, d) => Dedup.embeddingCosinePairsLsh(s, d)),
      "q34_lsh_auto_embedding_pairs" -> ((s, d) => Dedup.embeddingCosinePairsLshAuto(s, d)),
      "q45_lsh_embedding_clusters" -> ((s, d) => Dedup.embeddingClustersLsh(s, d)),
      "q57_sqrtn_semantic_dedup" -> ((s, d) => Dedup.semanticDedupSqrtN(s, d)),
      "q22_lsh_match_score" -> ((s, d) => TextQueries.q22LshMatchScore(s, d)),
      "pipeline" -> ((s, d) => DocumentPipeline.curate(s, d)))

    def clearStorage(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    val out = new StringBuilder
    out ++= s"""{"metric":"scale_bench","cpus":$cpus,"scales":{"""
    val perScale = factors.map { f =>
      val dir = s"/tmp/graft_scale/x$f"
      genDocuments(spark, 5000 * f).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      genEmbeddings(spark, 2000 * f).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      genPart(spark, 20000 * f).write.mode("overwrite")
        .parquet(s"$dir/part.parquet")
      val rows = chain.map { case (name, fn) =>
        clearStorage()
        listener.reset()
        val t0 = System.nanoTime()
        val n = try fn(spark, dir).count() catch { case e: Throwable =>
          System.err.println(s"[scale] $name at x$f failed: $e"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
        (name, sec, n, listener.spillDisk, listener.shuffleWrite)
      }
      f -> rows
    }
    out ++= perScale.map { case (f, rows) =>
      s""""x$f":{""" + rows.map { case (name, sec, n, spill, sw) =>
        s""""$name":{"sec":$sec,"rows":$n,"spill_disk":$spill,"shuffle_write":$sw}"""
      }.mkString(",") + "}"
    }.mkString(",")
    out ++= "},"
    // growth factors between the first and last scale
    val first = perScale.head._2.map(r => r._1 -> r._2).toMap
    val last = perScale.last._2.map(r => r._1 -> r._2).toMap
    val dataRatio = factors.last.toDouble / factors.head
    out ++= s""""data_ratio":$dataRatio,"time_ratio":{"""
    out ++= chain.map(_._1).map { name =>
      val r = if (first(name) > 0) last(name) / first(name) else -1.0
      s""""$name":${math.round(r * 100) / 100.0}"""
    }.mkString(",")
    out ++= "}}"
    println(out.toString)
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE.json")).toAbsolutePath
    try {
      java.nio.file.Files.writeString(outPath, out.toString + "\n")
      System.err.println(s"[scale] artifact written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[scale] artifact write to $outPath FAILED: $e") }
    spark.stop()
  }
}
