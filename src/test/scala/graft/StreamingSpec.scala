package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Structured Streaming specs: incremental file curation with exactly-once
  * per-file semantics, watermarked windows, stateful sessionization. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("incremental curate: file stream processes backlog exactly once and resumes") {
    val in = Files.createTempDirectory("graft_in").toString
    val out = Files.createTempDirectory("graft_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    // batch 1: two files from the reference input split
    val src = scala.io.Source.fromFile("/root/reference/example_metadata.csv", "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    Files.write(java.nio.file.Paths.get(s"$in/a.csv"),
      (lines.head +: lines.slice(1, 5)).mkString("\n").getBytes)
    val q1 = EventStreams.incrementalCurate(spark, in, out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(s"$out/curated").count()
    assert(n1 == 4)
    // batch 2: a new file arrives; only IT is processed on restart
    Files.write(java.nio.file.Paths.get(s"$in/b.csv"),
      (lines.head +: lines.slice(5, 8)).mkString("\n").getBytes)
    val q2 = EventStreams.incrementalCurate(spark, in, out, ckpt)
    q2.awaitTermination()
    val n2 = spark.read.parquet(s"$out/curated").count()
    assert(n2 == 7, s"expected 4 + 3 rows, got $n2 (file reprocessed or skipped)")
  }

  test("windowed counts groups events into correct event-time windows") {
    import spark.implicits._
    val t0 = 1700000000000L // on a minute boundary? not necessarily; windows align to epoch
    val df = Seq(
      (1L, new java.sql.Timestamp(t0), "click", 1.0),
      (2L, new java.sql.Timestamp(t0 + 60 * 1000), "click", 2.0),
      (3L, new java.sql.Timestamp(t0 + 6 * 60 * 1000), "click", 4.0),
      (4L, new java.sql.Timestamp(t0 + 6 * 60 * 1000), "view", 8.0),
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventStreams.windowedCounts(df, "5 minutes", "10 minutes")
      .select($"event_type", $"n", $"total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // first 5-min window holds events 1+2 (clicks), the next holds 3 and 4
    assert(out == Set(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))
  }

  test("streaming dedup drops re-arrivals within the watermark, state expires after") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = EventStreams.dedupDocuments(
      in.toDF().toDF("doc_id", "text", "ingest_ts"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      // batch 1: duplicate text inside one batch -> one survivor
      in.addData((1L, "hello world", ts(t0)), (2L, "hello world", ts(t0 + 1000)),
        (3L, "unique text", ts(t0 + 2000)))
      q.processAllAvailable()
      // batch 2: same text re-arrives within the horizon -> dropped;
      // also push the watermark far past t0 to expire the state
      in.addData((4L, "hello world", ts(t0 + 60 * 1000)),
        (5L, "advance", ts(t0 + 60 * 60 * 1000)))
      q.processAllAvailable()
      // batch 3: same text long after expiry -> kept again
      in.addData((6L, "hello world", ts(t0 + 61 * 60 * 1000)))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 5L, 6L),
        s"expected first-occurrence set {1,3,5,6}, got $got")
    } finally q.stop()
  }

  test("streaming near-dup gate flags bucket collisions within the horizon only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val dup = (1 to 30).map(i => s"tok$i").mkString(" ") // >= 5 tokens, fixed
    val other = (1 to 30).map(i => s"zzz$i").mkString(" ")
    val horizon = 10L * 60 * 1000
    val out = EventStreams.nearDupCandidates(
      in.toDF().toDF("doc_id", "text", "ingest_ts"),
      watermark = "10 minutes", horizonMs = horizon)
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      // batch 1: identical texts one minute apart -> all 32 bands collide;
      // an unrelated text shares no bucket
      in.addData((1L, dup, ts(t0)), (2L, dup, ts(t0 + 60 * 1000)),
        (3L, other, ts(t0 + 1000)))
      q.processAllAvailable()
      val first = spark.table("neardup_out").as[EventStreams.CandidatePair].collect()
      assert(first.map(p => (p.d1, p.d2)).distinct.toSeq == Seq((1L, 2L)))
      assert(first.length == 32, "identical docs collide in every band")
      // batch 2: the same text far past the horizon -> old state expired,
      // no pair against docs 1/2
      in.addData((4L, dup, ts(t0 + 100 * 60 * 1000)))
      q.processAllAvailable()
      in.addData((5L, other, ts(t0 + 200 * 60 * 1000))) // advance watermark
      q.processAllAvailable()
      val later = spark.table("neardup_out").as[EventStreams.CandidatePair].collect()
        .filter(p => p.d2 == 4L)
      assert(later.isEmpty, s"horizon-expired state must not pair: ${later.toSeq}")
    } finally q.stop()
  }

  test("streaming embedding near-dup gate: Hamming-verified pairs, horizon-bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val rnd = new scala.util.Random(99)
    val v = Seq.fill(64)(rnd.nextGaussian())
    val anti = v.map(-_) // cos = -1: every sign bit flips -> ham = 1024 >> cutoff
    val horizon = 10L * 60 * 1000
    val out = EventStreams.embeddingNearDupPairs(
      in.toDF().toDF("vec_id", "embedding", "ingest_ts"),
      watermark = "10 minutes", horizonMs = horizon)
    val q = out.writeStream.format("memory").queryName("embdup_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      in.addData((1L, v, ts(t0)), (2L, v, ts(t0 + 60 * 1000)),
        (3L, anti, ts(t0 + 1000)))
      q.processAllAvailable()
      val first = spark.table("embdup_out").as[EventStreams.VerifiedPair].collect()
      assert(first.map(p => (p.v1, p.v2)).distinct.toSeq == Seq((1L, 2L)),
        s"only the identical pair may pass the Hamming verify: ${first.toSeq}")
      // identical vectors share the bucket in EVERY table and measure ham=0
      assert(first.length == 8, s"expected one emission per table, got ${first.length}")
      assert(first.forall(_.ham == 0))
      assert(first.map(_.table).sorted.toSeq == (0 until 8))
      // past the horizon: expired state must not pair
      in.addData((4L, v, ts(t0 + 100 * 60 * 1000)))
      q.processAllAvailable()
      in.addData((5L, anti, ts(t0 + 200 * 60 * 1000))) // advance watermark
      q.processAllAvailable()
      val later = spark.table("embdup_out").as[EventStreams.VerifiedPair].collect()
        .filter(_.v2 == 4L)
      assert(later.isEmpty, s"horizon-expired state must not pair: ${later.toSeq}")
    } finally q.stop()
  }

  test("distinct embedding gate emits exactly one row per pair") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val rnd = new scala.util.Random(99)
    val v = Seq.fill(64)(rnd.nextGaussian())
    val out = EventStreams.embeddingNearDupPairsDistinct(
      in.toDF().toDF("vec_id", "embedding", "ingest_ts"),
      watermark = "10 minutes", horizonMs = 10L * 60 * 1000)
    // the gate's emissions are never late to the dedup (see the
    // operator's scaladoc) — the static chained-stateful-op check is
    // pessimistic here and documented as a requirement of this operator
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val q = out.writeStream.format("memory").queryName("embdup_distinct_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      in.addData((1L, v, ts(t0)), (2L, v, ts(t0 + 60 * 1000)))
      q.processAllAvailable()
      // identical vectors collide in all 8 tables — the raw gate emits 8
      // rows (asserted above); the distinct wrapper must emit exactly 1
      val rows = spark.table("embdup_distinct_out")
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 2L)),
        s"expected exactly one (1,2) emission, got ${rows.toSeq}")
    } finally {
      q.stop()
      spark.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    }
  }

  test("embedding gate state is horizon-bounded: expired buckets evict") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val rnd = new scala.util.Random(7)
    val nTables = 8
    def vec() = Seq.fill(64)(rnd.nextGaussian())
    val out = EventStreams.embeddingNearDupPairs(
      in.toDF().toDF("vec_id", "embedding", "ingest_ts"),
      nTables = nTables, watermark = "10 minutes", horizonMs = 10L * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("embdup_state_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      // wave 1: 10 vectors inside one horizon
      in.addData((0 until 10).map(i => (100L + i, vec(), ts(t0 + i * 1000L))): _*)
      q.processAllAvailable()
      def stateRows: Long = {
        val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
        if (ps.isEmpty) 0L else ps.last.stateOperators.map(_.numRowsTotal).sum
      }
      val wave1Rows = stateRows
      assert(wave1Rows > 0 && wave1Rows <= 10L * nTables,
        s"state rows must be bounded by docs x tables, got $wave1Rows")
      // wave 2 far past the horizon: watermark advances, wave-1 buckets
      // time out — total state must NOT accumulate across horizons
      in.addData((0 until 10).map(i => (200L + i, vec(), ts(t0 + 100L * 60 * 1000 + i * 1000L))): _*)
      q.processAllAvailable()
      in.addData((999L, vec(), ts(t0 + 200L * 60 * 1000))) // advance watermark again
      q.processAllAvailable()
      val finalRows = stateRows
      assert(finalRows <= 11L * nTables,
        s"expired buckets must evict (O(rate x horizon x tables) bound): " +
        s"wave1=$wave1Rows final=$finalRows")
    } finally q.stop()
  }

  test("stateful sessionize closes sessions on gap") {
    import spark.implicits._
    val t0 = 1700000000000L
    val evs = Seq(
      EventStreams.Event(1, new java.sql.Timestamp(t0), 1.0),
      EventStreams.Event(1, new java.sql.Timestamp(t0 + 60000), 2.0),
      EventStreams.Event(1, new java.sql.Timestamp(t0 + 100 * 60000), 3.0),
      EventStreams.Event(2, new java.sql.Timestamp(t0), 5.0),
    ).toDS()
    val out = EventStreams.sessionize(evs, gapMs = 30 * 60000).collect()
    // user 1's first session (2 events) closed by the 100-minute gap;
    // open sessions are retained in state, not emitted
    assert(out.length == 1)
    assert(out.head.user_id == 1 && out.head.nEvents == 2 && out.head.total == 3.0)
  }
}
