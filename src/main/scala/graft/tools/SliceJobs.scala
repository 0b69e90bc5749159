package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-process certification of the band-slice independence claim.
  *
  * SCALE.json asserts the sliced LSH loop's slices are "independent
  * cluster jobs": any partition of the band range into slices, computed
  * with NO shared state, unions (distinct) to the sequential result.
  * OperatorsSpec certifies that in ONE SparkSession; this tool closes
  * the remaining gap by running each slice in its OWN JVM/SparkSession
  * — the literal cluster-concurrency shape, where the only thing two
  * jobs share is the input parquet and the band-range assignment.
  *
  *   runMain graft.tools.SliceJobs slice  <corpusDir> <outDir> <bands> <rows> <lo> <hi>
  *   runMain graft.tools.SliceJobs verify <corpusDir> <sliceOut1,sliceOut2,...> <bands> <rows> <receiptPath>
  *
  * `slice` builds the shingle-set frame from `documents.parquet`
  * (deterministic projection — both processes derive identical sets),
  * computes [[graft.operators.Dedup.sliceCandidatePairsOnce]] for
  * global band range [lo, hi), writes the distinct pair parquet and a
  * `job.json` stamp (pid, host, commit, rows, wall time). `verify`
  * reads every slice output, takes the union-distinct, recomputes the
  * UNSLICED pair set in-process, and writes a receipt asserting
  * set equality (both directions: union size, intersection size,
  * symmetric difference 0).
  */
object SliceJobs {

  private def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** The q32-shaped shingle-set frame — the SAME deterministic
    * projection in every process (doc_id, 5-token shingle hashes). */
  private def sets(spark: SparkSession, corpusDir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Dedup.fanOutSmallScan(
      spark.read.parquet(s"$corpusDir/documents.parquet"))
      .select($"doc_id".cast("long").as("doc_id"),
        graft.operators.Dedup.shingleHashes($"text", 5).as("hv"))
      .filter(size($"hv") > 0)
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "slice" :: corpusDir :: outDir :: bands :: rows :: lo :: hi :: Nil =>
      val spark = session(s"graft-slice-job-$lo-$hi")
      spark.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.sliceCandidatePairsOnce(
        sets(spark, corpusDir).cache(), bands.toInt, rows.toInt,
        lo.toInt, hi.toInt, parts = spark.sparkContext.defaultParallelism)
      pairs.write.mode("overwrite").parquet(s"$outDir/pairs.parquet")
      val n = spark.read.parquet(s"$outDir/pairs.parquet").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val stamp = s"""{"pid":${ProcessHandle.current().pid()},""" +
        s""""host":"${java.net.InetAddress.getLocalHost.getHostName}",""" +
        s""""commit":"${sys.env.getOrElse("GRAFT_COMMIT", "unknown")}",""" +
        s""""bands":[${lo.toInt},${hi.toInt}],"of":${bands.toInt},""" +
        s""""rows_emitted":$n,"sec":$sec}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "job.json"), stamp + "\n")
      println(stamp)
      spark.stop()

    case "verify" :: corpusDir :: sliceOuts :: bands :: rows :: receipt :: Nil =>
      val spark = session("graft-slice-verify")
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val dirs = sliceOuts.split(",").toSeq
      val union = dirs.map(d => spark.read.parquet(s"$d/pairs.parquet"))
        .reduce(_ unionByName _).select($"d1", $"d2").distinct()
        .localCheckpoint()
      // the UNSLICED single-piece pair set, computed fresh in THIS
      // process — the ground truth the union must equal
      val whole = graft.operators.Dedup.lshCandidatePairsSliced(
        sets(spark, corpusDir).cache(), bands.toInt, rows.toInt,
        maxBandedRows = Long.MaxValue)
        .select($"d1", $"d2").localCheckpoint()
      val nUnion = union.count()
      val nWhole = whole.count()
      val missing = whole.join(union, Seq("d1", "d2"), "left_anti").count()
      val spurious = union.join(whole, Seq("d1", "d2"), "left_anti").count()
      val stamps = dirs.map { d =>
        try java.nio.file.Files.readString(
          java.nio.file.Paths.get(d, "job.json")).trim
        catch { case _: Exception => "{}" }
      }
      val pass = nUnion == nWhole && missing == 0L && spurious == 0L
      val out = s"""{"metric":"slice_jobs","corpus":"$corpusDir",""" +
        s""""bands":${bands.toInt},"rows":${rows.toInt},""" +
        s""""verifier_pid":${ProcessHandle.current().pid()},""" +
        s""""jobs":[${stamps.mkString(",")}],""" +
        s""""union_distinct_rows":$nUnion,"sequential_rows":$nWhole,""" +
        s""""missing_from_union":$missing,"spurious_in_union":$spurious,""" +
        s""""pass":$pass,""" +
        """"_note":"Each jobs[] entry is a SEPARATE JVM (distinct pid) that computed its global band range standalone via Dedup.sliceCandidatePairsOnce over the shared corpus parquet — no shared SparkSession, no seen-set, no coordination. pass requires union-distinct of the per-process outputs to equal the sequential single-piece pair set in both directions. This is the two-process closure of the in-JVM OperatorsSpec independence law (r15 verdict item 3)."}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(receipt).toAbsolutePath, out + "\n")
      println(out)
      spark.stop()
      if (!pass) sys.exit(1)

    case other =>
      System.err.println(
        s"usage: SliceJobs slice <corpus> <out> <bands> <rows> <lo> <hi> | " +
          s"verify <corpus> <out1,out2,...> <bands> <rows> <receipt> (got: $other)")
      sys.exit(2)
  }
}
