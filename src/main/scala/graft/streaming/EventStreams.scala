package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming operators.
  *
  * The reference has no stream processors (SURVEY §2.9) — its incremental
  * unit is "new CSV file in a directory + done-cache" (`run/meta_process
  * .py:181-193,692-712`). `incrementalCurate` reproduces exactly that with
  * a file stream + `Trigger.AvailableNow` + checkpointed progress, with
  * the curation batch pipeline inside `foreachBatch`. The windowed /
  * stateful operators cover the training-pipeline streaming needs the
  * engine adds on top (event-time windows + watermark, session state via
  * flatMapGroupsWithState).
  */
object EventStreams {

  /** Incremental curation driver: watches `inputDir` for new CSV batches,
    * curates each new file exactly once (checkpoint = the done-cache), and
    * appends curated parquet to `outDir`. `Trigger.AvailableNow` processes
    * the backlog and stops — the reference's batch-by-file semantics. */
  def incrementalCurate(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(
      graft.curation.Validation.InputColumns.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType, true)))
    spark.readStream
      .option("header", "true")
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .csv(inputDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val cleaned = batch.select(graft.curation.Validation.InputColumns.map(c =>
            coalesce(col(c), lit("")).as(c)): _*)
          val curated = graft.curation.Curator.curateFresh(cleaned)
          curated.rows.write.mode("append").parquet(s"$outDir/curated")
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Event-time windowed aggregation with watermark: events per
    * (window, event_type) with 10-minute lateness tolerance. `ts` is a
    * proper timestamp column here (streaming sources deliver typed rows).
    */
  def windowedCounts(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
  }

  /** Streaming exact dedup — the ingest-time analog of
    * `Dedup.exactDupGroups` (q30): keep the FIRST occurrence of each
    * content hash, drop re-arrivals whose event time falls within the
    * watermark horizon. State is keyed by `md5(text)` and expired by the
    * watermark, so memory is bounded by (ingest rate x horizon) instead of
    * all history — the only shape that survives a 100 TB/day feed; global
    * historical dedup belongs to the batch operator downstream. Works on
    * any frame with (text, ingest_ts). */
  def dedupDocuments(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  final case class BandRow(doc_id: Long, ingest_ts: java.sql.Timestamp,
    band: Int, bh: Long)
  final case class BucketState(docs: List[(Long, Long)]) // (doc_id, ingestMs)
  final case class CandidatePair(d1: Long, d2: Long, band: Int)

  /** Streaming NEAR-dup candidate gate — the ingest-time analog of
    * `Dedup.incrementalDedupPairs` (q50): each arriving document is
    * minhash-banded with the same kernels as the batch path, and every
    * band bucket keeps the documents seen within the watermark horizon as
    * `flatMapGroupsWithState` state. A new arrival sharing a bucket with a
    * stored document emits a (d1, d2, band) candidate immediately — the
    * exact-Jaccard confirm is the downstream batch join (`jaccardVerify`),
    * exactly as `dedupDocuments` defers historical dedup to the batch
    * operator. Pairs colliding in several bands are emitted once per band
    * (distinct downstream), matching the batch candidate stage before its
    * `.distinct()`.
    *
    * State is bounded the only way that survives a 100 TB/day feed: per
    * bucket, (doc_id, ingestMs) pairs only — no shingle sets, no
    * signatures — pruned to the horizon on every update and expired whole
    * via event-time timeout, so memory is O(ingest rate x horizon x
    * bands), independent of history. */
  def nearDupCandidates(docs: DataFrame, bands: Int = 32, rows: Int = 4,
      n: Int = 5, watermark: String = "1 hour",
      horizonMs: Long = 60L * 60 * 1000): org.apache.spark.sql.Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    import graft.operators.Dedup
    val banded = docs
      .withColumn("hv", Dedup.shingleHashes(col("text"), n))
      .filter(size(col("hv")) > 0)
      .withColumn("sig", Dedup.minhashSignature(
        Dedup.shingleBaseHashes(col("hv")), bands, rows))
      .select(col("doc_id").cast("long").as("doc_id"), col("ingest_ts"),
        posexplode(Dedup.bandKeys(col("sig"), bands, rows)).as(Seq("band", "bh")))
      .withWatermark("ingest_ts", watermark)
      .as[BandRow]
    banded.groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), rowsIt: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rowsIt.toSeq.sortBy(r => (r.ingest_ts.getTime, r.doc_id))
            var docs = state.getOption.map(_.docs).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
            // seed from the true stored max, not the list head: a late
            // (within-watermark) arrival prepends an old timestamp, and a
            // head-seeded max would move the timeout BACKWARD on the next
            // batch, expiring the bucket early and losing pairs
            var maxMs = if (docs.isEmpty) 0L else docs.map(_._2).max
            for (a <- arrivals; ms = a.ingest_ts.getTime) {
              maxMs = math.max(maxMs, ms)
              if (!docs.exists(_._1 == a.doc_id)) {
                for ((d, dm) <- docs if dm >= ms - horizonMs)
                  out += CandidatePair(math.min(d, a.doc_id),
                    math.max(d, a.doc_id), a.band)
                docs = (a.doc_id, ms) :: docs
              }
            }
            docs = docs.filter(_._2 >= maxMs - horizonMs)
            state.update(BucketState(docs))
            // a bucket fed only late events could compute a timeout at or
            // behind the watermark, which Spark rejects
            state.setTimeoutTimestamp(
              math.max(maxMs + horizonMs, state.getCurrentWatermarkMs + 1))
            out.iterator
          }
      }
  }

  final case class EmbRow(vec_id: Long, ingest_ts: java.sql.Timestamp,
    bucket: Long, sg: Seq[Long])
  final case class EmbBucketState(docs: List[(Long, Seq[Long], Long)]) // (vec_id, sg, ingestMs)
  /** `ingest_ts` = the LATER vector's event time (the pair forms when it
    * arrives) — a valid watermark basis for downstream dedup/joins. */
  final case class VerifiedPair(v1: Long, v2: Long, table: Int, ham: Int,
    ingest_ts: java.sql.Timestamp)

  /** Streaming embedding near-dup gate — the sign-LSH twin of
    * [[nearDupCandidates]], with the r11 staged-verify discipline carried
    * into state: each arrival stores its 1024-bit packed sign signature
    * (16 longs, ~128 B) next to its id, and a candidate pair is emitted
    * ONLY if the XOR-popcount Hamming distance clears the
    * [[graft.operators.Dedup.hammingCutoff]] at `threshold` — so the
    * stream emits verified-by-measurement near-dups, not raw bucket
    * collisions, and the downstream exact-cosine check (if any) is
    * answer-mass-sized. State stays bounded exactly like the MinHash
    * gate: per bucket, (id, signature, ingestMs) pruned to the horizon
    * and expired whole by event-time timeout — O(rate x horizon x
    * tables) memory, independent of history. A pair colliding in
    * several tables is emitted per table (arrival order differs per
    * bucket, so the batch path's first-colliding-table trick does not
    * apply); `table`/`ham` columns let downstream dedupe or rank.
    * NOTE for counting/joining consumers: use
    * [[embeddingNearDupPairsDistinct]] — it bounds the dedup state by
    * the fact that ALL of a pair's duplicate emissions share one
    * micro-batch (the later vector's arrival feeds every table's bucket
    * in the same batch), so a within-watermark key dedup is complete. */
  def embeddingNearDupPairs(docs: DataFrame, dim: Int = 64,
      nBits: Int = 4, nTables: Int = 8, threshold: Double = 0.45,
      watermark: String = "1 hour",
      horizonMs: Long = 60L * 60 * 1000): org.apache.spark.sql.Dataset[VerifiedPair] = {
    import docs.sparkSession.implicits._
    import graft.operators.{Dedup, Similarity}
    val planes = Similarity.signaturePlanes(dim, Dedup.SignSigBits)
    val cut = Dedup.hammingCutoff(Dedup.SignSigBits, threshold)
    val banded = docs
      .withColumn("nv", Similarity.normalized(col("embedding")))
      .withColumn("sg", graft.plans.VectorExpressions.signPack(col("nv"), planes, dim))
      .select(col("vec_id").cast("long").as("vec_id"), col("ingest_ts"),
        explode(Similarity.lshBucketsArray(col("nv"), dim, nBits, nTables)).as("bucket"),
        col("sg"))
      .withWatermark("ingest_ts", watermark)
      .as[EmbRow]
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[EmbBucketState, VerifiedPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long, rowsIt: Iterator[EmbRow], state: GroupState[EmbBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rowsIt.toSeq.sortBy(r => (r.ingest_ts.getTime, r.vec_id))
            var docs = state.getOption.map(_.docs).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[VerifiedPair]
            val table = (bucket >>> 32).toInt
            // same max-seeding rule as the MinHash gate (late arrivals
            // must not move the timeout backward)
            var maxMs = if (docs.isEmpty) 0L else docs.map(_._3).max
            for (a <- arrivals; ms = a.ingest_ts.getTime) {
              maxMs = math.max(maxMs, ms)
              if (!docs.exists(_._1 == a.vec_id)) {
                val asg = a.sg
                for ((d, dsg, dm) <- docs if dm >= ms - horizonMs) {
                  var ham = 0
                  val n = math.min(asg.length, dsg.length)
                  var i = 0
                  while (i < n) {
                    ham += java.lang.Long.bitCount(asg(i) ^ dsg(i)); i += 1
                  }
                  if (ham <= cut)
                    out += VerifiedPair(math.min(d, a.vec_id),
                      math.max(d, a.vec_id), table, ham, a.ingest_ts)
                }
                docs = (a.vec_id, asg, ms) :: docs
              }
            }
            docs = docs.filter(_._3 >= maxMs - horizonMs)
            state.update(EmbBucketState(docs))
            state.setTimeoutTimestamp(
              math.max(maxMs + horizonMs, state.getCurrentWatermarkMs + 1))
            out.iterator
          }
      }
  }

  /** [[embeddingNearDupPairs]] with exactly-once pair emission: the
    * per-table duplicates are collapsed by a watermark-bounded key dedup
    * on (v1, v2). Correct AND bounded because every duplicate emission
    * of a pair lands in ONE micro-batch — the later vector's arrival is
    * exploded to all nTables buckets inside the same batch, and a pair
    * can never re-form later (both ids are then in state, and in-state
    * ids are not re-paired) — so `dropDuplicatesWithinWatermark` holds a
    * pair key only until the watermark passes its `ingest_ts`:
    * O(pair rate x watermark) state, not all-history. The surviving
    * row's `table`/`ham` are whichever duplicate won; rank-sensitive
    * consumers should use the raw per-table stream.
    *
    * REQUIRES `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false` for the query: Spark's static checker rejects any
    * stateful op downstream of flatMapGroupsWithState because fMGWS MAY
    * emit rows older than the watermark. This gate cannot: every
    * emission carries the CURRENT arrival's `ingest_ts`, and that
    * arrival already passed the upstream watermark filter — so no
    * emission is ever late to the dedup and the check is pessimistic
    * here. */
  def embeddingNearDupPairsDistinct(docs: DataFrame, dim: Int = 64,
      nBits: Int = 4, nTables: Int = 8, threshold: Double = 0.45,
      watermark: String = "1 hour",
      horizonMs: Long = 60L * 60 * 1000): DataFrame =
    embeddingNearDupPairs(docs, dim, nBits, nTables, threshold, watermark,
      horizonMs)
      .toDF()
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("v1", "v2")

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, total: Double)
  final case class SessionOut(user_id: Long, startMs: Long, endMs: Long, nEvents: Long, total: Double)

  /** Custom session state via flatMapGroupsWithState: a session closes
    * after `gapMs` of inactivity per user; closed sessions are emitted
    * (Append mode). The stateful analog of TextAnalysis.q40Sessionize. */
  def sessionize(events: org.apache.spark.sql.Dataset[Event], gapMs: Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastSeen <= gapMs =>
                cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1, total = s.total + e.value))
              case Some(s) =>
                closed += SessionOut(userId, s.start, s.lastSeen, s.nEvents, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }
}
