package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.{SparqlHttp, SparqlUpdate, Vocab}

/** S5 HTTP SPARQL UPDATE push against a recording stub endpoint (the
  * reference's own tests use a live triplestore; a stub suffices to pin
  * the wire contract: method, content type, batch bodies, delete-before-
  * insert ordering, retry on transient failure, no retry on rejection). */
class SparqlHttpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Recording endpoint: keeps (global arrival index, content type,
    * body) per request; `failFirst` bodies get one 503 before a 200;
    * `alwaysCode` (if > 0) short-circuits every request. */
  private class StubStore(failFirstContaining: String = null,
      alwaysCode: Int = 0) {
    val seq = new AtomicInteger(0)
    val requests =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String)]
    private val fails =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val ct = ex.getRequestHeaders.getFirst("Content-Type")
      requests.add((seq.getAndIncrement(), ct, body))
      val code =
        if (alwaysCode > 0) alwaysCode
        else if (ex.getRequestMethod != "POST") 405
        else if (failFirstContaining != null &&
            body.contains(failFirstContaining) &&
            fails.putIfAbsent(body, true) == null) 503
        else 200
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    server.setExecutor(null)
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
    def stop(): Unit = server.stop(0)
  }

  private def sampleUpdates = {
    import spark.implicits._
    val adds = Seq(
      ("u:a", Vocab.Title, "Title with \"quotes\"", Vocab.XsdString),
      ("u:a", Vocab.PartOf, "u:b", null),
      ("u:b", Vocab.PartOf, "u:c", null),
      ("u:c", Vocab.Title, "Another } } title", Vocab.XsdString)
    ).toDF("s", "p", "o", "o_datatype")
    val dels = Seq(
      ("u:a", Vocab.PartOf, "u:old", null),
      ("u:b", Vocab.PartOf, "u:old", null)
    ).toDF("s", "p", "o", "o_datatype")
    SparqlUpdate.updateStrings(adds, dels, "g:main", batchTriples = 2)
  }

  test("push posts every batch as application/sparql-update, deletes strictly first") {
    val store = new StubStore()
    try {
      val updates = sampleUpdates.cache()
      val expected = updates.collect()
        .map(r => (r.getAs[String]("kind"), r.getAs[String]("update"))).toSet
      assert(expected.map(_._1) == Set("delete", "insert"))
      val res = SparqlHttp.push(updates, store.endpoint).collect()
      assert(res.length == expected.size && res.forall(_.ok))
      assert(res.forall(_.attempts == 1))
      val seen = store.requests.toArray(Array.empty[(Int, String, String)])
      assert(seen.forall(_._2.startsWith("application/sparql-update")))
      // exact bodies arrive — batch composition survives the wire
      val byBody = seen.map(_._3).toSet
      assert(byBody == expected.map(_._2))
      // phase barrier: every delete's arrival index precedes every insert's
      val arrival = seen.map { case (i, _, body) => body -> i }.toMap
      val delMax = expected.collect { case ("delete", u) => arrival(u) }.max
      val insMin = expected.collect { case ("insert", u) => arrival(u) }.min
      assert(delMax < insMin,
        "all DELETE DATA batches must be applied before any INSERT DATA batch")
      updates.unpersist()
    } finally store.stop()
  }

  test("transient 503 is retried with backoff and succeeds; outcome records attempts") {
    val store = new StubStore(failFirstContaining = "INSERT DATA")
    try {
      val res = SparqlHttp.push(sampleUpdates, store.endpoint,
        maxRetries = 3, backoffMs = 1L).collect()
      assert(res.forall(_.ok))
      val inserts = res.filter(_.kind == "insert")
      assert(inserts.nonEmpty && inserts.forall(_.attempts == 2),
        s"each insert should fail once (injected 503) then succeed, got " +
          inserts.map(_.attempts).mkString(","))
      assert(res.filter(_.kind == "delete").forall(_.attempts == 1))
    } finally store.stop()
  }

  test("permanent 503 exhausts retries without throwing; 400 fails fast without retry") {
    val down = new StubStore(alwaysCode = 503)
    try {
      val res = SparqlHttp.push(sampleUpdates, down.endpoint,
        maxRetries = 2, backoffMs = 1L).collect()
      assert(res.forall(r => !r.ok && r.attempts == 3 && r.code == 503))
    } finally down.stop()
    val reject = new StubStore(alwaysCode = 400)
    try {
      val res = SparqlHttp.push(sampleUpdates, reject.endpoint,
        maxRetries = 2, backoffMs = 1L).collect()
      // a definitive rejection is not resent — malformed stays malformed
      assert(res.forall(r => !r.ok && r.attempts == 1 && r.code == 400))
    } finally reject.stop()
  }

  test("pushDirectory replays a writeUpdates folder byte-for-byte") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sparql-dir-")
    val store = new StubStore()
    try {
      val adds = Seq(
        ("u:a", Vocab.Title, "multi\nline \"t\" with } } inside", Vocab.XsdString),
        ("u:a", Vocab.PartOf, "u:b", null)
      ).toDF("s", "p", "o", "o_datatype")
      val dels = Seq(("u:a", Vocab.PartOf, "u:old", null))
        .toDF("s", "p", "o", "o_datatype")
      SparqlUpdate.writeUpdates(adds, dels, "g:main", dir.toString,
        batchTriples = 1)
      val expected = SparqlUpdate.updateStrings(adds, dels, "g:main",
        batchTriples = 1).collect().map(_.getAs[String]("update")).toSet
      val res = SparqlHttp.pushDirectory(spark, dir.toString, store.endpoint)
        .collect()
      assert(res.length == expected.size && res.forall(_.ok))
      val bodies = store.requests.toArray(Array.empty[(Int, String, String)])
        .map(_._3).toSet
      assert(bodies == expected,
        "directory replay must reassemble the exact update bodies")
    } finally {
      store.stop()
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }
}
