package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic over the fuzzy-match LSH frame: per-band bucket
  * skew, raw pair-emission mass, and chained-suppression effectiveness,
  * measured on a real corpus BEFORE running the full sliced join. Used
  * to size the q22_auto 100x rung (the r13 ENOSPC/latency post-mortems);
  * kept as a tool because "what does one band of this corpus emit" is
  * the question every LSH capacity decision starts from.
  *
  * Usage: runMain graft.operators.LshDiag <sfDir> [nBands]
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val nBands = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("lsh-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val m = TextQueries.biblioMeta(spark, dir)
    val record = concat_ws(" ", $"title", $"family", $"given", $"issn",
      concat(lit("y"), $"year"), concat(lit("v"), $"volume"),
      concat(lit("i"), $"issue"), concat(lit("sp"), $"start_page"),
      concat(lit("ep"), $"end_page"))
    val sets = Dedup.fanOutSmallScan(m)
      .select($"p_partkey".cast("long").as("doc_id"),
        Dedup.shingleHashes(record, 2).as("hv"))
      .filter(size($"hv") > 0)
      .cache()
    val n = sets.count()
    val (bands, rows) = Dedup.lshAutoParams(n, threshold = 0.5)
    println(s"[diag] n=$n auto bands=$bands rows=$rows; measuring first $nBands bands")

    val sig = Dedup.minhashSignature(Dedup.shingleBaseHashes($"hv"), bands, rows)
    val banded = sets.select($"doc_id", sig.as("sig"))
      .select($"doc_id", posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => xxhash64(slice($"sig", b * lit(rows) + lit(1), lit(rows)), b)))
        .as(Seq("band", "bh")))
      .cache()
    banded.count()

    val buckets = banded.groupBy($"band", $"bh").agg(count(lit(1)).as("k"))
      .filter($"k" >= 2).cache()
    val emissions = buckets.select($"band", ($"k" * ($"k" - 1) / 2).as("p"))
      .groupBy($"band").agg(sum($"p").as("raw_pairs"), max($"p").as("max_bucket_pairs"),
        count(lit(1)).as("n_buckets"))
      .orderBy($"band")
    println("[diag] per-band: raw pair emissions, biggest single bucket, buckets>=2")
    emissions.collect().foreach(r => println(s"[diag]   band=${r.get(0)} raw=${r.get(1)} maxBucket=${r.get(2)} buckets=${r.get(3)}"))
    println("[diag] top bucket sizes overall:")
    buckets.orderBy(desc("k")).limit(10).collect()
      .foreach(r => println(s"[diag]   band=${r.get(0)} k=${r.get(2)}"))

    // chained suppression effectiveness between bands 0 and 1: pairs
    // colliding at band 1 that ALSO collide at band 0 are suppressed
    val b0 = banded.filter($"band" === 0).select($"doc_id", $"bh".as("h0"))
    val b1 = banded.filter($"band" === 1).select($"doc_id", $"bh".as("h1"))
    val j = b0.join(b1, "doc_id")
    val pairs1 = j.as("a").join(j.as("b"),
        $"a.h1" === $"b.h1" && $"a.doc_id" < $"b.doc_id")
      .select(($"a.h0" === $"b.h0").cast("long").as("supp"))
      .agg(sum($"supp").as("suppressed"), count(lit(1)).as("total"))
    println("[diag] band-1 emissions: " + pairs1.collect().head)

    // mini-slice wall-time probe: band join + in-pipeline jaccard verify
    // + pair-key dedup over the measured bands, the exact per-slice shape
    // of the sliced generator — extrapolates a slice's wall time before
    // committing a multi-hour run to it
    val parts = math.max(spark.sparkContext.defaultParallelism,
      (n * nBands / 1500000L).toInt + 1)
    val keyed = banded.repartition(parts, $"band", $"bh")
    val t0 = System.nanoTime()
    val verified = Dedup.jaccardVerify(
      keyed.as("a").hint("shuffle_hash").join(keyed.as("b"),
          $"a.band" === $"b.band" && $"a.bh" === $"b.bh" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2")),
      sets, 0.5, n, sorted = false)
    val distinctPairs = verified.repartition(parts, $"d1", $"d2").distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"[diag] mini-slice ($nBands bands): verify+dedup ${sec}s, distinct jac-pairs=$distinctPairs")
    spark.stop()
  }
}

/** Identical-shingle-set group histogram: how much of the corpus
  * collapses under exact-set dedup before LSH. */
object SetGroupDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val m = TextQueries.biblioMeta(spark, dir)
    val record = concat_ws(" ", $"title", $"family", $"given", $"issn",
      concat(lit("y"), $"year"), concat(lit("v"), $"volume"),
      concat(lit("i"), $"issue"), concat(lit("sp"), $"start_page"),
      concat(lit("ep"), $"end_page"))
    val sets = Dedup.fanOutSmallScan(m)
      .select($"p_partkey".cast("long").as("doc_id"),
        Dedup.shingleHashes(record, 2).as("hv"))
      .filter(size($"hv") > 0)
    val g = sets.select($"doc_id", xxhash64($"hv").as("gh"))
      .groupBy($"gh").agg(count(lit(1)).as("k")).cache()
    val n = g.agg(sum($"k")).collect()(0).getLong(0)
    val reps = g.count()
    val dupMass = g.filter($"k" >= 2).agg(sum($"k" * ($"k" - 1) / 2)).collect()(0)
    println(s"[diag] docs=$n distinct-set groups=$reps (collapse ${n.toDouble / reps})")
    println(s"[diag] within-group pairs (jac=1 answer core): $dupMass")
    println("[diag] top group sizes:")
    g.orderBy(desc("k")).limit(12).collect().foreach(r => println(s"[diag]   k=${r.get(1)}"))
    spark.stop()
  }
}
