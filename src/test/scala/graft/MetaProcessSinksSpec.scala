package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.MetaProcess
import graft.rdf.{Serialization, Vocab}

/** The reference's `store_data_and_prov` lifecycle composed into the
  * per-file loop (`meta_process.py:399-461`): per batch, JSON-LD files
  * for the data and prov graphs, SPARQL update files, and an HTTP push
  * to the data and provenance endpoints. This spec drives a 2-batch
  * MetaProcess run with every sink enabled against recording stub
  * endpoints and asserts the artifacts on disk, the per-batch wire
  * ordering, and that everything emitted is batch-scoped (never a
  * re-emission of the whole store). */
class MetaProcessSinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val T0 = "2026-08-13T00:00:00Z"
  val f1 = "/root/reference/example_metadata.csv"

  // batch 2, as in MetaProcessSpec: the first file's DOI enriched with a
  // NEW pmid (graph change -> modified snapshot) plus one brand-new work
  lazy val f2: String = {
    val dir = Files.createTempDirectory("graft_mps")
    val p = dir.resolve("zbatch2.csv")
    Files.writeString(p,
      "\"id\",\"title\",\"author\",\"pub_date\",\"venue\",\"volume\",\"issue\",\"page\",\"type\",\"publisher\",\"editor\"\n" +
      "\"doi:10.1007/978-3-662-07918-8_3 pmid:99999999\",\"Influence of Dielectric Properties, State, and Electrodes on Electric Strength\",\"Ushakov, Vasily Y.\",\"2004\",,,,,\"book chapter\",,\n" +
      "\"doi:10.9999/new-entry\",\"A Brand New Work\",\"Doe, Jane\",\"2024\",,,,\"11-22\",\"journal article\",,\n")
    p.toString
  }

  /** Recording endpoint — (global arrival index, body) per request. */
  private class StubStore {
    val seq = new AtomicInteger(0)
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val ct = ex.getRequestHeaders.getFirst("Content-Type")
      val code =
        if (ex.getRequestMethod == "POST" &&
          ct != null && ct.startsWith("application/sparql-update")) 200
        else 400
      requests.add((seq.getAndIncrement(), body))
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    server.setExecutor(null)
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
    def stop(): Unit = server.stop(0)
    def bodies: Seq[(Int, String)] =
      requests.toArray(Array.empty[(Int, String)]).toSeq.sortBy(_._1)
  }

  test("store_data_and_prov sinks: per-batch JSON-LD + update files + ordered HTTP push") {
    import spark.implicits._
    val rdfDir = Files.createTempDirectory("graft_sink_rdf").toString
    val updDir = Files.createTempDirectory("graft_sink_upd").toString
    val data = new StubStore
    val prov = new StubStore
    try {
      val sinks = Some(MetaProcess.Sinks(
        rdfDir = Some(rdfDir), updatesDir = Some(updDir),
        endpoint = Some(data.endpoint), provEndpoint = Some(prov.endpoint),
        batchTriples = 50))
      // two invocations = an exact per-batch arrival boundary on the wire
      // (and the resume path: the second call skips the done f1)
      val st1 = MetaProcess.run(spark, Seq(f1), T0, sinks = sinks)
      val dataB1End = data.seq.get()
      val st = MetaProcess.run(spark, Seq(f1, f2), T0, state = st1,
        sinks = sinks)
      assert(st.done == Set(f1, f2))
      val stems = Seq("example_metadata", "zbatch2")

      // ---- JSON-LD artifacts: per batch, data + prov, readable back ----
      for (stem <- stems) {
        val dataBack = Serialization.readJsonLd(spark, s"$rdfDir/$stem/data")
        assert(dataBack.count() > 0, s"$stem: empty data JSON-LD")
        // every data subject emitted for the batch is in the final store
        val storeSubjects = st.triples.get.select("s").distinct()
        assert(dataBack.select("s").distinct()
          .join(storeSubjects, Seq("s"), "left_anti").count() == 0,
          s"$stem: JSON-LD data contains subjects missing from the store")
        val provBack = Serialization.readJsonLd(spark, s"$rdfDir/$stem/prov")
        assert(provBack.filter($"p" === Vocab.RdfType &&
          $"o" === Vocab.ProvEntity).count() > 0, s"$stem: no prov entities")
        assert(provBack.filter($"p" === Vocab.SpecializationOf).count() > 0)
      }
      // batch 2's prov JSON-LD carries BOTH the new br/0601 snapshot 2 and
      // the RECLOSED snapshot 1 (its invalidatedAtTime now set) — the
      // SCD2 "changed rows" scope, not the whole prov store
      val prov2 = Serialization.readJsonLd(spark, s"$rdfDir/zbatch2/prov")
      val se = (n: Int) => s"${Vocab.BaseIri}/br/0601/prov/se/$n"
      assert(prov2.filter($"s" === se(2) && $"p" === Vocab.RdfType).count() == 1)
      assert(prov2.filter($"s" === se(1) &&
        $"p" === Vocab.InvalidatedAtTime && $"o" === T0).count() == 1)
      // batch-scoped, not store-scoped: batch 1's untouched entities do
      // not reappear in batch 2's prov output
      assert(prov2.filter($"s".contains("/br/0602/")).count() == 0,
        "batch 2 prov JSON-LD re-emitted an untouched entity's snapshots")

      // ---- update files: insert batches per batch dir -------------------
      for (stem <- stems) {
        val ins = spark.read.text(s"$updDir/$stem/data/kind=insert/part-*")
        assert(ins.count() > 0, s"$stem: no insert update files")
      }

      // ---- wire: batch order, phase order, batch-scoped deltas ----------
      val dataBodies = data.bodies
      assert(dataBodies.nonEmpty && dataBodies.forall(b =>
        b._2.startsWith("INSERT DATA") || b._2.startsWith("DELETE DATA")))
      val (b1Bodies, b2Bodies) = dataBodies.partition(_._1 < dataB1End)
      assert(b1Bodies.nonEmpty && b2Bodies.nonEmpty)
      // batch 1 is a fresh world: insert-only
      assert(b1Bodies.forall(_._2.startsWith("INSERT DATA")))
      // per-batch phase barrier: every DELETE arrival precedes every
      // INSERT arrival within the batch's request window (exercised for
      // real whenever the batch retracts triples; SparqlHttpSpec pins the
      // same barrier with guaranteed deletes)
      for (reqs <- Seq(b1Bodies, b2Bodies)) {
        val dels = reqs.filter(_._2.startsWith("DELETE DATA")).map(_._1)
        val inss = reqs.filter(_._2.startsWith("INSERT DATA")).map(_._1)
        if (dels.nonEmpty && inss.nonEmpty)
          assert(dels.max < inss.min, "deletes must precede inserts per batch")
      }
      // batch 2's data push is the DELTA: it carries the new pmid triple
      // but NOT batch 1's untouched second work
      assert(b2Bodies.exists(_._2.contains("99999999")))
      assert(!b2Bodies.exists(_._2.contains("10.1016/0021-9991(73)90147-2")),
        "batch 2 push re-emitted an untouched batch-1 graph")

      // ---- prov wire: SCD2 add-only, closing triple is an INSERT --------
      val provBodies = prov.bodies
      assert(provBodies.nonEmpty &&
        provBodies.forall(_._2.startsWith("INSERT DATA")),
        "prov deltas are add-only (SCD2): closing a snapshot INSERTS its invalidatedAtTime")
      assert(provBodies.exists(b => b._2.contains(se(1)) &&
        b._2.contains(Vocab.InvalidatedAtTime) && b._2.contains(T0)),
        "the reclosed snapshot's invalidatedAtTime must reach the prov endpoint")
      assert(provBodies.exists(_._2.contains(se(2))))
    } finally {
      data.stop(); prov.stop()
    }
  }

  test("crash AFTER a batch's push, BEFORE its done-set append: resume converges with zero re-push (r18)") {
    import spark.implicits._
    // The composed loop's crash window (VERDICT r17 #3): MetaProcess
    // pushes per batch and appends the done-set AFTER — the same window
    // the reference's cache.txt has. Kill between the two and the resume
    // REPROCESSES the pushed file against the PERSISTED (pre-batch)
    // store, exactly like the reference re-running an un-cached file: the
    // push is at-least-once BY DESIGN. The law is idempotent EFFECTS, not
    // zero replay traffic: (a) the replay's update requests are the SAME
    // triples as the first attempt's (deterministic replay, no divergent
    // delta, no newly minted OMIDs); (b) RDF graphs are sets, so applying
    // every request in arrival order — first attempt AND replay —
    // converges to exactly the uninterrupted run's store; (c) the
    // resumed pipeline state equals the clean run's. (The receipt replays
    // with the run's pinned generatedAt, as a MetaProcessJob resume given
    // the same timestamp argument would.)
    def tset(df: org.apache.spark.sql.DataFrame) =
      df.select("s", "p", "o").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // triple lines per kind, from the raw wire bodies
    // ("VERB { GRAPH <g> {\n<lines>\n} }") — chunking-independent
    def wireLines(bodies: Seq[(Int, String)]): Map[String, Map[String, Int]] =
      bodies.groupBy(_._2.takeWhile(_ != ' '))
        .view.mapValues(_.flatMap(_._2.split("\n").drop(1).dropRight(1))
          .groupBy(identity).view.mapValues(_.size).toMap).toMap
    // set-semantics store: apply bodies in arrival order
    def applied(bodies: Seq[(Int, String)]): Set[String] =
      bodies.sortBy(_._1).foldLeft(Set.empty[String]) { case (st, (_, body)) =>
        val lines = body.split("\n").drop(1).dropRight(1).toSet
        if (body.startsWith("DELETE")) st -- lines else st ++ lines
      }

    val rdfDir = Files.createTempDirectory("graft_crash_rdf").toString
    val updDir = Files.createTempDirectory("graft_crash_upd").toString
    val data = new StubStore; val prov = new StubStore
    val dataClean = new StubStore; val provClean = new StubStore
    try {
      val sinks = Some(MetaProcess.Sinks(
        rdfDir = Some(rdfDir), updatesDir = Some(updDir),
        endpoint = Some(data.endpoint), provEndpoint = Some(prov.endpoint)))
      val cleanSinks = Some(MetaProcess.Sinks(
        endpoint = Some(dataClean.endpoint),
        provEndpoint = Some(provClean.endpoint)))
      // the uninterrupted reference run
      val clean = MetaProcess.run(spark, Seq(f1, f2), T0, sinks = cleanSinks)

      // crashed run: f1 completes and persists; f2 curates AND pushes but
      // the advanced state never lands (the returned state is discarded
      // and persistTo is off for the second call = the injected kill)
      val work = Files.createTempDirectory("graft_crash_work").toString
      val s1 = MetaProcess.run(spark, Seq(f1), T0,
        persistTo = Some(work), sinks = sinks)
      val dataF1End = data.seq.get()
      val provF1End = prov.seq.get()
      MetaProcess.run(spark, Seq(f1, f2), T0, state = s1, sinks = sinks)
      val dataAtCrash = data.seq.get()
      val provAtCrash = prov.seq.get()
      assert(dataAtCrash > 0 && provAtCrash > 0, "f2 must have pushed before the kill")

      // resume from the persisted state: done-set still says only f1
      val loaded = MetaProcess.loadState(spark, work)
      assert(loaded.done == Set(f1))
      val resumed = MetaProcess.run(spark, Seq(f1, f2), T0, state = loaded,
        persistTo = Some(work), sinks = sinks)

      // 1. the replay is a DETERMINISTIC re-push: the requests after the
      //    kill carry exactly the first attempt's triples per kind (the
      //    f2 window of the crashed run = requests after f1's push)
      val dataF2First = data.bodies.filter(b =>
        b._1 >= dataF1End && b._1 < dataAtCrash)
      val dataReplay = data.bodies.filter(_._1 >= dataAtCrash)
      assert(dataReplay.nonEmpty, "the resume must reprocess the undone file")
      assert(wireLines(dataReplay) == wireLines(dataF2First),
        "replayed data push diverged from the first attempt")
      val provReplay = prov.bodies.filter(_._1 >= provAtCrash)
      assert(wireLines(provReplay) ==
        wireLines(prov.bodies.filter(_._1 < provAtCrash)
          .filter(b => provF1End <= b._1)),
        "replayed prov push diverged from the first attempt")

      // 2. final state converged to the clean run's (no double-minting,
      //    no doubled counters, no doubled snapshots)
      assert(tset(resumed.triples.get) == tset(clean.triples.get))
      assert(resumed.counters == clean.counters)
      assert(resumed.prov.get.collect().toSet == clean.prov.get.collect().toSet)

      // 3. set-semantics application of EVERY request in arrival order —
      //    first attempt and replay — lands on exactly the clean run's
      //    applied store (at-least-once delivery + set semantics =
      //    exactly-once effects)
      assert(applied(data.bodies) == applied(dataClean.bodies),
        "cumulative data-endpoint effect diverged from the clean run")
      assert(applied(prov.bodies) == applied(provClean.bodies),
        "cumulative prov-endpoint effect diverged from the clean run")

      // 4. the replayed batch's data JSON-LD is re-emitted replay-accurate:
      //    the same full touched-subject graphs (adoption re-emits full
      //    store state), still readable and inside the final store
      val dataBack = Serialization.readJsonLd(spark, s"$rdfDir/zbatch2/data")
      assert(dataBack.count() > 0)
      assert(dataBack.select("s", "p", "o").exceptAll(
        resumed.triples.get.select("s", "p", "o")).count() == 0)
    } finally {
      data.stop(); prov.stop(); dataClean.stop(); provClean.stop()
    }
  }

  test("sinks disabled is the default: run() unchanged and no push attempted") {
    // Sinks with nothing set is inert even when passed explicitly
    val st = MetaProcess.run(spark, Seq(f1), T0,
      sinks = Some(MetaProcess.Sinks()))
    assert(st.done == Set(f1) && st.triples.get.count() > 0)
  }
}
