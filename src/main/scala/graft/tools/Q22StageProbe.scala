// operators package for private[operators] funnel internals
package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 q22 funnel stage decomposition at the session core count: q22 is
  * the bench's most expensive query post-wave-1 (4.7 s at quiet
  * local[32]); this attributes its seconds to sets-build vs banded
  * signature+checkpoint vs band join+dedup vs jaccard verify vs the
  * score join, so the next fix targets the real stage. Tooling only. */
object Q22StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q22] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def mat(df: DataFrame): Long = df.queryExecution.executedPlan.execute().count()
    try graft.SparkEntry.queries("q02_filter_project")(spark, sfDir).count()
    catch { case _: Throwable => () }

    for (trial <- 1 to 2) {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val m = TextQueries.biblioMeta(spark, sfDir).cache()
      val record = concat_ws(" ", $"title", $"family", $"given", $"issn",
        concat(lit("y"), $"year"), concat(lit("v"), $"volume"),
        concat(lit("i"), $"issue"), concat(lit("sp"), $"start_page"),
        concat(lit("ep"), $"end_page"))
      val sets = timed(s"t$trial sets build+cache+count") {
        val s0 = Dedup.fanOutSmallScan(m)
          .select($"p_partkey".cast("long").as("doc_id"),
            Dedup.shingleHashes(record, 2).as("hv"))
          .filter(size($"hv") > 0)
          .cache()
        s0.count()
        s0
      }
      val nRecords = sets.count()
      val (bands, rows) = Dedup.lshAutoParams(nRecords, threshold = 0.5)
      println(s"[q22] t$trial params bands=$bands rows=$rows nRecords=$nRecords banded=${nRecords * bands}")
      // stage: banded signatures (mirrors Dedup.bandedSignatures incl.
      // the load-bearing localCheckpoint — eager, so timing is the build)
      val banded = timed(s"t$trial bandedSignatures (sig+explode+ckpt)") {
        sets.select($"doc_id",
            Dedup.minhashSignature(Dedup.shingleBaseHashes($"hv"), bands, rows).as("sig"))
          .select($"doc_id",
            posexplode(Dedup.bandKeys($"sig", bands, rows)).as(Seq("band", "bh")))
          .localCheckpoint()
      }
      // stage: band self-join + post-exchange dedup, no refine (mirrors
      // the sub-envelope branch of lshCandidatePairsSliced)
      timed(s"t$trial band join + dedup (no refine)") {
        val nBanded = nRecords * bands
        val parts = math.max(spark.sparkContext.defaultParallelism,
          math.min(4096, (nBanded / 1500000L).toInt + 1))
        val keyed = banded.repartition(parts, $"band", $"bh")
        mat(keyed.as("a").hint("shuffle_hash").join(keyed.as("b"),
            $"a.band" === $"b.band" && $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .repartition(parts, $"d1", $"d2").distinct())
      }
      // variant v2: bh-only banded rows (band key folded into the salted
      // hash) + checkpoint — narrower checkpoint + single-word join key
      val bandedV2 = timed(s"t$trial v2 banded bh-only (sig+explode+ckpt)") {
        sets.select($"doc_id",
            Dedup.minhashSignature(Dedup.shingleBaseHashes($"hv"), bands, rows).as("sig"))
          .select($"doc_id", explode(Dedup.bandKeys($"sig", bands, rows)).as("bh"))
          .localCheckpoint()
      }
      timed(s"t$trial v2 band join + dedup (bh-only)") {
        val parts = math.max(spark.sparkContext.defaultParallelism,
          math.min(4096, (nRecords * bands / 1500000L).toInt + 1))
        val keyed = bandedV2.repartition(parts, $"bh")
        mat(keyed.as("a").hint("shuffle_hash").join(keyed.as("b"),
            $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .repartition(parts, $"d1", $"d2").distinct())
      }
      // variant v3: bh-only, NO checkpoint — signature subtree computes
      // once per join side off the cached sets frame
      timed(s"t$trial v3 join + dedup (no ckpt, double compute)") {
        val parts = math.max(spark.sparkContext.defaultParallelism,
          math.min(4096, (nRecords * bands / 1500000L).toInt + 1))
        val bandedNoCk = sets.select($"doc_id",
            Dedup.minhashSignature(Dedup.shingleBaseHashes($"hv"), bands, rows).as("sig"))
          .select($"doc_id", explode(Dedup.bandKeys($"sig", bands, rows)).as("bh"))
        val keyed = bandedNoCk.repartition(parts, $"bh")
        mat(keyed.as("a").hint("shuffle_hash").join(keyed.as("b"),
            $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .repartition(parts, $"d1", $"d2").distinct())
      }
      // variant v4: checkpoint (doc_id, array<bh>) — nDocs rows instead of
      // nDocs*bands (row overhead dominates tiny-row checkpoints); each
      // join side explodes after the checkpoint read
      val bandedV4 = timed(s"t$trial v4 banded packed (sig+ckpt, no explode)") {
        sets.select($"doc_id",
            Dedup.minhashSignature(Dedup.shingleBaseHashes($"hv"), bands, rows).as("sig"))
          .select($"doc_id", Dedup.bandKeys($"sig", bands, rows).as("bhs"))
          .localCheckpoint()
      }
      timed(s"t$trial v4 explode+join+dedup (packed ckpt)") {
        val parts = math.max(spark.sparkContext.defaultParallelism,
          math.min(4096, (nRecords * bands / 1500000L).toInt + 1))
        val keyed = bandedV4.select($"doc_id", explode($"bhs").as("bh"))
          .repartition(parts, $"bh")
        mat(keyed.as("a").hint("shuffle_hash").join(keyed.as("b"),
            $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .repartition(parts, $"d1", $"d2").distinct())
      }
      // stage: candidates + jaccard refine (the production funnel shape)
      timed(s"t$trial candidates+refine (production)") {
        mat(Dedup.lshCandidatePairsRefined(sets, bands, rows,
          c => Dedup.jaccardVerify(c, sets, 0.5, nRecords, sorted = false),
          nDocsKnown = nRecords))
      }
      // stage: the full registered query (adds meta fetch + score + sort)
      timed(s"t$trial full q22 (score join + sort on top)") {
        mat(graft.SparkEntry.queries("q22_lsh_match_score")(spark, sfDir))
      }
      m.unpersist(); sets.unpersist()
    }
    spark.stop()
  }
}
