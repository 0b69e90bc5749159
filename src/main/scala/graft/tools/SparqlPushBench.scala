package graft.tools

import java.net.InetSocketAddress
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.rdf.{SparqlHttp, SparqlUpdate, Vocab}

/** S5 at volume — the SPARQL UPDATE push shape the wire-contract spec
  * (SparqlHttpSpec) cannot show: ~100k update batches posted from
  * executor partitions in parallel at a local recording endpoint with
  * injected 429/503 bursts. Emits `SPARQL_PUSH.json`:
  *
  *  - throughput (updates/sec, triples/sec) for the healthy run and the
  *    burst run,
  *  - retry accounting (injected failures vs observed extra attempts —
  *    they must match exactly: every injected transient is retried,
  *    nothing else is),
  *  - the delete-phase barrier OBSERVED UNDER CONCURRENCY: the stub
  *    flags any DELETE arriving after the first INSERT (violations must
  *    be 0 — the reference's two-phase upload invariant, held here by
  *    `SparqlHttp.push`'s per-phase eager execution, not by luck),
  *  - zero-loss accounting: distinct bodies received == update batches
  *    sent, in both runs.
  *
  * The endpoint is in-process loopback, so the numbers measure the
  * ENGINE side (update rendering, partition fan-out, HTTP client reuse,
  * retry discipline) — a real triplestore would bound throughput from
  * its side; the reference's own benchmark scenario treats the store the
  * same way (meta_process.py's uploader is gated by Virtuoso, not by the
  * generator).
  *
  *   runMain graft.tools.SparqlPushBench [nTriples] [batchTriples]
  */
object SparqlPushBench {

  /** Recording endpoint: counts arrivals per kind, detects barrier
    * violations (a DELETE after any INSERT), injects one 429 or 503 on
    * the FIRST attempt of every `failEvery`-th distinct body. */
  private final class Stub(failEvery: Int) {
    val deletes = new AtomicInteger(0)
    val inserts = new AtomicInteger(0)
    val barrierViolations = new AtomicInteger(0)
    val injected429 = new AtomicInteger(0)
    val injected503 = new AtomicInteger(0)
    val bytes = new AtomicLong(0L)
    private val insertSeen = new AtomicBoolean(false)
    private val seen =
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]
    val distinctOk =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      bytes.addAndGet(body.length.toLong)
      val h = SparqlHttp.contentHash(body)
      val isDelete = body.startsWith("DELETE DATA")
      if (isDelete) {
        deletes.incrementAndGet()
        if (insertSeen.get()) barrierViolations.incrementAndGet()
      } else {
        inserts.incrementAndGet()
        insertSeen.set(true)
      }
      val firstSight = seen.putIfAbsent(h, true) == null
      val code =
        if (failEvery > 0 && firstSight &&
            math.floorMod(h, failEvery.toLong) == 0L) {
          // alternate the two transient families the retry policy covers.
          // NOT the parity bit: FNV-1a parity is the xor of the body's
          // char low bits, and bodies whose variable digits appear an
          // even number of times (subject echoed in the object) all hash
          // to one parity — bit 7 carries real mixing.
          if (((h >>> 7) & 1L) == 0L) {
            injected429.incrementAndGet(); 429
          } else { injected503.incrementAndGet(); 503 }
        } else 200
      if (code == 200) distinctOk.add(h)
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    private val exec = java.util.concurrent.Executors.newFixedThreadPool(32)
    server.setExecutor(exec)
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
    // shut the pool down too — HttpServer.stop leaves a custom executor's
    // non-daemon threads alive, pinning the JVM open at exit
    def stop(): Unit = { server.stop(0); exec.shutdown() }
  }

  def main(args: Array[String]): Unit = {
    val nTriples = if (args.length > 0) args(0).toInt else 1000000
    val batchTriples = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sparql-push-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic delta: half adds, half dels — through the REAL renderer,
    // so batch composition/sorting costs are in the measurement
    def triplesFrame(n: Int, tag: String) = spark.range(n.toLong)
      .select(
        concat(lit(s"${Vocab.BaseIri}/br/$tag"), $"id").as("s"),
        lit(Vocab.Title).as("p"),
        concat(lit(s"Work $tag "), $"id").as("o"),
        lit(Vocab.XsdString).as("o_datatype"))
    val adds = triplesFrame(nTriples / 2, "a")
    val dels = triplesFrame(nTriples / 2, "d")
    val updates = SparqlUpdate
      .updateStrings(adds, dels, Vocab.BaseIri + "/", batchTriples)
      .repartition(cpus.toInt) // N concurrent posting partitions
      .localCheckpoint()       // render once; both runs post identical bodies
    val nUpdates = updates.count()

    def run(failEvery: Int): (Stub, Double, Long, Long) = {
      val stub = new Stub(failEvery)
      val t0 = System.nanoTime()
      val res = SparqlHttp.push(updates, stub.endpoint,
        maxRetries = 3, backoffMs = 1L).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      stub.stop()
      val failedRows = res.count(!_.ok)
      val extraAttempts = res.map(_.attempts - 1L).sum
      (stub, sec, failedRows.toLong, extraAttempts)
    }

    val (healthy, healthySec, healthyFailed, healthyExtra) = run(0)
    val (burst, burstSec, burstFailed, burstExtra) = run(97)

    val injected = burst.injected429.get() + burst.injected503.get()
    val ok =
      healthyFailed == 0 && burstFailed == 0 &&
        healthy.barrierViolations.get() == 0 &&
        burst.barrierViolations.get() == 0 &&
        healthy.distinctOk.size() == nUpdates &&
        burst.distinctOk.size() == nUpdates &&
        healthyExtra == 0 && burstExtra == injected.toLong
    val json =
      s"""{"metric":"sparql_push_bench","n_triples":$nTriples,""" +
        s""""batch_triples":$batchTriples,"n_updates":$nUpdates,""" +
        s""""posting_partitions":$cpus,""" +
        s""""healthy":{"sec":${math.round(healthySec * 1000) / 1000.0},""" +
        s""""updates_per_sec":${math.round(nUpdates / healthySec)},""" +
        s""""triples_per_sec":${math.round(nTriples / healthySec)},""" +
        s""""deletes":${healthy.deletes.get()},"inserts":${healthy.inserts.get()},""" +
        s""""barrier_violations":${healthy.barrierViolations.get()},""" +
        s""""distinct_applied":${healthy.distinctOk.size()},""" +
        s""""extra_attempts":$healthyExtra,"failed":$healthyFailed,""" +
        s""""bytes":${healthy.bytes.get()}},""" +
        s""""burst_429_503":{"sec":${math.round(burstSec * 1000) / 1000.0},""" +
        s""""updates_per_sec":${math.round(nUpdates / burstSec)},""" +
        s""""injected_429":${burst.injected429.get()},""" +
        s""""injected_503":${burst.injected503.get()},""" +
        s""""extra_attempts":$burstExtra,""" +
        s""""deletes_received":${burst.deletes.get()},""" +
        s""""inserts_received":${burst.inserts.get()},""" +
        s""""barrier_violations":${burst.barrierViolations.get()},""" +
        s""""distinct_applied":${burst.distinctOk.size()},"failed":$burstFailed},""" +
        s""""laws":{"barrier":"0 DELETE-after-INSERT arrivals in both runs",""" +
        s""""retries":"extra attempts == injected transients exactly",""" +
        s""""loss":"distinct applied bodies == update batches in both runs"},""" +
        s""""all_pass":$ok,""" +
        s""""env":{"host_cores":${Runtime.getRuntime.availableProcessors},""" +
        s""""endpoint":"in-process loopback stub (32-thread executor)"}}"""
    println(json)
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PUSH_OUT", "SPARQL_PUSH.json")).toAbsolutePath
    try {
      java.nio.file.Files.writeString(outPath, json + "\n")
      System.err.println(s"[push-bench] artifact written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[push-bench] artifact write FAILED: $e") }
    spark.stop()
    // explicit: executor-side java.net.http clients keep non-daemon
    // selector threads alive until GC — don't let them pin the process
    sys.exit(if (ok) 0 else 1)
  }
}
