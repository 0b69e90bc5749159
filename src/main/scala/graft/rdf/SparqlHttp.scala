package graft.rdf

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTTP SPARQL UPDATE push (SURVEY §2.1 S5 — the half of the reference's
  * update path that speaks to a live endpoint: `run/meta_process.py:45-86`
  * posts each generated update file at the data and provenance
  * triplestores, retries transient failures, records permanently-failed
  * queries in a failed-queries file, and applies every delete batch
  * before any insert batch).
  *
  * Spark-first shape: the input is the (kind, update) frame
  * [[SparqlUpdate.updateStrings]] emits (or a read-back of its file
  * output), and the push is a `mapPartitions` over executors — one
  * keep-alive HTTP client per partition, N partitions posting in
  * parallel, which is the reference's process-parallel uploader
  * generalized from 2 processes to the cluster. Each update's outcome
  * is a ROW (attempts, http code, error), not a side effect: the caller
  * decides whether failures abort the run (the reference raises) or
  * land in a failed-queries report (the reference's `failed_file`) —
  * both are one filter away.
  *
  * Ordering contract, same as the reference's two-phase upload: ALL
  * "delete" updates complete before ANY "insert" update is attempted
  * (each phase is its own eagerly-executed job; the insert job is not
  * even planned until the delete job returned). WITHIN a phase batches
  * are unordered and idempotent-by-content (`INSERT DATA`/`DELETE DATA`
  * are idempotent), so Spark task retries — which can re-post a
  * partition's updates after a mid-partition failure — are safe for the
  * same reason the reference can re-run an interrupted upload folder.
  *
  * Retry policy: transient outcomes (connect/IO error, HTTP 429/5xx)
  * back off exponentially from `backoffMs` and retry up to `maxRetries`
  * times; definitive rejections (other 4xx) fail immediately — a
  * malformed update does not become well-formed by resending it.
  */
object SparqlHttp {

  /** One update's outcome. `updateHash` identifies the update string
    * (64-bit content hash) so a failed row can be joined back to the
    * emitted batch without carrying the whole string twice. */
  case class PushResult(kind: String, updateHash: Long, attempts: Int,
      code: Int, ok: Boolean, error: String)

  private[graft] def contentHash(s: String): Long = {
    // FNV-1a 64 over chars — stable across JVMs (String.hashCode is 32
    // bit; MurmurHash3 seeds differ across Scala versions)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** POST one update as `application/sparql-update`; returns
    * (attempts, lastCode, ok, error). `lastCode` is -1 when the failure
    * never produced an HTTP status (connect refused, timeout). */
  private[rdf] def postOne(endpoint: java.net.URI, update: String,
      maxRetries: Int, backoffMs: Long,
      client: java.net.http.HttpClient): (Int, Int, Boolean, String) = {
    val req = java.net.http.HttpRequest.newBuilder(endpoint)
      .header("Content-Type", "application/sparql-update; charset=utf-8")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(update))
      .build()
    var attempt = 0
    var lastCode = -1
    var lastErr = ""
    while (attempt <= maxRetries) {
      if (attempt > 0)
        Thread.sleep(backoffMs << math.min(attempt - 1, 16)) // 1x,2x,4x,...
      attempt += 1
      try {
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        lastCode = resp.statusCode()
        if (lastCode / 100 == 2) return (attempt, lastCode, true, "")
        lastErr = s"HTTP $lastCode"
        val transient = lastCode == 429 || lastCode / 100 == 5
        if (!transient) return (attempt, lastCode, false, lastErr)
      } catch {
        case e: java.io.IOException => lastErr = e.toString; lastCode = -1
        case e: InterruptedException => throw e
      }
    }
    (attempt, lastCode, false, lastErr)
  }

  /** Push every update in `updates` (schema: kind, update — the
    * [[SparqlUpdate.updateStrings]] frame) at `endpoint`. Returns the
    * per-update outcome frame, already executed: when this method
    * returns, every post has happened (deletes first), so callers can
    * filter `ok = false` into their failed-queries report without
    * re-triggering the upload. */
  def push(updates: DataFrame, endpoint: String, maxRetries: Int = 3,
      backoffMs: Long = 200L): Dataset[PushResult] = {
    val spark = updates.sparkSession
    import spark.implicits._
    val uri = java.net.URI.create(endpoint) // fail fast on a bad endpoint
    require(uri.getScheme != null, s"endpoint must be an absolute URI: $endpoint")
    def phase(kind: String): Dataset[PushResult] = {
      val ds = updates.filter($"kind" === kind)
        .select($"update").as[String]
        .mapPartitions { it =>
          // one client per partition — keep-alive reuse across the
          // partition's posts, like the reference's per-process session
          val client = java.net.http.HttpClient.newBuilder()
            .connectTimeout(java.time.Duration.ofSeconds(30)).build()
          it.map { u =>
            val (attempts, code, ok, err) =
              postOne(uri, u, maxRetries, backoffMs, client)
            PushResult(kind, contentHash(u), attempts, code, ok, err)
          }
        }
      // the phase EXECUTES here (and its lineage is cut, so downstream
      // reuse of the result cannot re-post) — the barrier that keeps
      // every delete ahead of every insert
      ds.localCheckpoint()
    }
    phase("delete").unionByName(phase("insert"))
  }

  /** [[push]] over a directory written by [[SparqlUpdate.writeUpdates]]
    * (`outDir/kind=delete|insert/part-*`) — the reference's replay of a
    * previously-emitted `to_be_uploaded` folder. Update bodies span
    * lines, so files are read whole and reassembled: inside a body the
    * only line shapes are the `... DATA { GRAPH <g> {` header, N-Triples
    * lines (which always start with `<` and end with ` .`; literals
    * escape embedded newlines — [[Serialization]] escapeLiteral), and
    * the exact terminator line `} }` — so accumulating until a
    * terminator LINE is an exact parse, immune to "} }" appearing inside
    * a quoted literal mid-line. */
  def pushDirectory(spark: org.apache.spark.sql.SparkSession, dir: String,
      endpoint: String, maxRetries: Int = 3,
      backoffMs: Long = 200L): Dataset[PushResult] = {
    import spark.implicits._
    val files = spark.sparkContext
      .wholeTextFiles(s"$dir/kind=*/part-*", spark.sparkContext.defaultParallelism)
    val rows = files.flatMap { case (path, body) =>
      val kind = if (path.contains("kind=delete")) "delete" else "insert"
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val cur = new StringBuilder
      body.linesIterator.foreach { line =>
        if (cur.nonEmpty) cur += '\n'
        cur ++= line
        if (line == "} }") { out += ((kind, cur.toString)); cur.clear() }
      }
      out.iterator
    }.toDF("kind", "update")
    push(rows, endpoint, maxRetries, backoffMs)
  }
}
