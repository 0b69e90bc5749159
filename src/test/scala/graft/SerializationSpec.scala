package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator
import graft.rdf.{Serialization, TriplesEmitter}

/** S7/S9/S10 specs: N-Triples and JSON-LD round-trips over a real emitted
  * graph, plus loading a reference .nt triplestore seed. */
class SerializationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val triples = TriplesEmitter.emit(Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv")))
    .localCheckpoint()

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("s", "p", "o", "o_datatype").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), Option(r.getString(3))))
      .toSet

  test("S10: N-Quads round-trip preserves every triple") {
    val out = Files.createTempDirectory("graft_nq").toString + "/nq"
    Serialization.writeNQuads(triples, "https://w3id.org/oc/meta/graph", out)
    val back = Serialization.readNTriples(spark, out)
    assert(asSet(back) == asSet(triples))
  }

  test("S10: pathological literal escapes round-trip (backslash-n, quotes, tabs)") {
    import spark.implicits._
    val nasty = Seq(
      ("https://w3id.org/oc/meta/br/0601", "http://purl.org/dc/terms/title",
        "back\\nslash-n literal", graft.rdf.Vocab.XsdString),       // \ + n chars
      ("https://w3id.org/oc/meta/br/0602", "http://purl.org/dc/terms/title",
        "real\nnewline \"quoted\" and \\\\ double", graft.rdf.Vocab.XsdString),
      ("https://w3id.org/oc/meta/br/0603", "http://purl.org/dc/terms/title",
        "carriage\rreturn and\ttab", graft.rdf.Vocab.XsdString))
      .toDF("s", "p", "o", "o_datatype")
    val out = Files.createTempDirectory("graft_nasty").toString + "/nq"
    Serialization.writeNQuads(nasty, "https://w3id.org/oc/meta/graph", out)
    val back = Serialization.readNTriples(spark, out)
    assert(asSet(back) == asSet(nasty),
      "escaped-backslash-followed-by-n must not decode as newline; raw \\r must not split the line")
  }

  test("S10: malformed \\u escapes are tolerated, not fatal") {
    import spark.implicits._
    val lines = Seq(
      // malformed hex after \u: kept verbatim, line still parses
      "<http://x/s> <http://x/p> \"bad\\uZZZZescape\" .",
      // out-of-range \U code point: kept verbatim
      "<http://x/s2> <http://x/p> \"huge\\UFFFFFFFFcp\" .",
      // valid \u for comparison
      "<http://x/s3> <http://x/p> \"ok\\u0041\" .").toDF("value")
    val parsed = Serialization.fromNTriples(lines).collect()
    assert(parsed.length == 3, "no line may crash the read job")
    val byS = parsed.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(byS("http://x/s") == "bad\\uZZZZescape")
    assert(byS("http://x/s2") == "huge\\UFFFFFFFFcp")
    assert(byS("http://x/s3") == "okA")
  }

  test("S10: language-tagged literals round-trip on BOTH the .nt and .nq paths") {
    import spark.implicits._
    val tagged = Seq(
      ("http://x/s1", "http://purl.org/dc/terms/title", "ciao",
        graft.rdf.Vocab.LangStringPrefix + "it"),
      ("http://x/s2", "http://purl.org/dc/terms/title", "hello world",
        graft.rdf.Vocab.LangStringPrefix + "en-US"),
      ("http://x/s3", "http://purl.org/dc/terms/title", "plain",
        graft.rdf.Vocab.XsdString))
      .toDF("s", "p", "o", "o_datatype")
    // triple path: toNTriples must emit "x"@tag, not a bogus
    // ^^<...#langString@tag> datatype IRI (ADVICE r7)
    val ntLines = Serialization.toNTriples(tagged).as[String].collect()
    assert(ntLines.exists(_.contains("\"ciao\"@it")))
    assert(ntLines.exists(_.contains("\"hello world\"@en-US")))
    assert(!ntLines.exists(_.contains("langString@")))
    assert(asSet(Serialization.fromNTriples(ntLines.toSeq.toDF("value"))) == asSet(tagged))
    // quad path (writeNQuads → readNTriples covers the gzip sink too)
    val out = Files.createTempDirectory("graft_lang").toString + "/nq"
    Serialization.writeNQuads(tagged, "https://w3id.org/oc/meta/graph", out)
    assert(asSet(Serialization.readNTriples(spark, out)) == asSet(tagged))
    val quads = tagged.withColumn("g",
      org.apache.spark.sql.functions.lit("http://x/g"))
    val back = Serialization.fromNQuads(Serialization.toNQuads(quads))
    assert(asSet(back) == asSet(tagged))
  }

  test("S10: illegal literal suffixes are dropped as malformed, not coerced") {
    import spark.implicits._
    val lines = Seq(
      // both ^^<dt> and @lang: illegal per the grammar → dropped
      "<http://x/bad1> <http://x/p> \"x\"^^<http://www.w3.org/2001/XMLSchema#string>@en .",
      // illegal tags → dropped
      "<http://x/bad2> <http://x/p> \"x\"@9 .",
      "<http://x/bad3> <http://x/p> \"x\"@-en .",
      // legal: subtags may carry digits after the first alpha run
      "<http://x/ok1> <http://x/p> \"x\"@pt-BR .",
      "<http://x/ok2> <http://x/p> \"x\"@en-US-2 .",
      "<http://x/ok3> <http://x/p> \"x\"^^<http://www.w3.org/2001/XMLSchema#integer> .")
      .toDF("value")
    for (parsed <- Seq(Serialization.fromNTriples(lines),
        Serialization.fromNQuads(lines).drop("g"))) {
      val byS = parsed.collect().map(r => r.getString(0) -> r.getString(3)).toMap
      assert(byS.keySet == Set("http://x/ok1", "http://x/ok2", "http://x/ok3"),
        s"malformed suffix lines must be dropped, got ${byS.keySet}")
      assert(byS("http://x/ok1") == graft.rdf.Vocab.LangStringPrefix + "pt-BR")
      assert(byS("http://x/ok2") == graft.rdf.Vocab.LangStringPrefix + "en-US-2")
      assert(byS("http://x/ok3") == "http://www.w3.org/2001/XMLSchema#integer")
    }
  }

  test("S7/S9: JSON-LD dir-split round-trip preserves every triple") {
    val out = Files.createTempDirectory("graft_jsonld").toString + "/ld"
    Serialization.writeJsonLd(triples, out, dirSplit = 10000, itemsPerFile = 100)
    val back = Serialization.readJsonLd(spark, out)
    assert(asSet(back) == asSet(triples))
  }

  test("S10: reference .nt triplestore seed loads") {
    val seed = Serialization.readNTriples(spark,
      "/root/reference/test/testcases/ts/synthetic_data.nt")
    assert(seed.count() == spark.read.text("/root/reference/test/testcases/ts/synthetic_data.nt").filter(org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.trim(org.apache.spark.sql.functions.col("value"))) > 0).count())
    assert(seed.count() == 36) // every line of the 36-triple seed parses
    import spark.implicits._
    // sanity: subjects are OCDM meta URIs and literals carry datatypes
    assert(seed.filter($"s".startsWith("https://w3id.org/oc/meta/")).count() > 0)
    assert(seed.filter($"o_datatype".isNotNull).count() > 0)
  }

  test("golden: update against the reference's triplestore seed adopts its entities") {
    import spark.implicits._
    // D2(5) single-match adoption: doi:10.1234/test belongs to br/0601 in
    // the seed graph. doi:10.1234/duplicate is attached to BOTH br/0602
    // and br/0603 -> id_worker keeps the FIRST match and unions the ids
    // (curator.py:1270-1297; the conflict branch is commented out there,
    // and curator_test.py testcase 13.3 accepts either pick) — here the
    // deterministic first pick is the lowest store meta, br/0602.
    val seed = Serialization.readNTriples(spark,
      "/root/reference/test/testcases/ts/synthetic_data.nt")
    val store = graft.rdf.StoreViews.fromTriples(seed, "060")
    val input = Seq(
      ("doi:10.1234/test", "Seed Known Work", "Smith, John", "2020", "", "", "", "", "journal article", "", ""),
      ("doi:10.1234/duplicate", "Conflicted Work", "Doe, Jane", "2021", "", "", "", "", "journal article", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val upd = graft.curation.StoreCurator.curateWithStore(input, store)
    val rows = upd.batch.rows.orderBy("first_row").collect()
    assert(rows(0).getAs[String]("br_meta") == "br/0601")
    val conflicted = rows(1).getAs[String]("br_meta")
    assert(conflicted == "br/0602",
      s"shared id must adopt the first store match, got $conflicted")
    assert(upd.preexisting.as[String].collect().toSet.contains("br/0601"))
  }

  test("migration: N-Quads dump ⇄ dir-split JSON-LD tree round-trips data and prov") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = graft.rdf.Vocab.BaseIri
    val provNs = "http://www.w3.org/ns/prov#"
    // reference-shaped dump: data triples in their kind graphs, prov
    // snapshots in their entity's /prov/ graph
    val kindGraph = concat(lit(base + "/"),
      regexp_extract($"s",
        "^" + java.util.regex.Pattern.quote(base) + "/([a-z]+)/", 1), lit("/"))
    val dataQuads = triples.withColumn("g", kindGraph).localCheckpoint()
    val provQuads = Seq(
      (s"$base/br/0601/prov/se/1", provNs + "specializationOf", s"$base/br/0601",
        null.asInstanceOf[String]),
      (s"$base/br/0601/prov/se/1", provNs + "generatedAtTime",
        "2026-01-01T00:00:00Z", graft.rdf.Vocab.XsdString),
      (s"$base/br/0601/prov/se/2", provNs + "specializationOf", s"$base/br/0601",
        null.asInstanceOf[String]),
      (s"$base/ra/0603/prov/se/1", provNs + "specializationOf", s"$base/ra/0603",
        null.asInstanceOf[String]))
      .toDF("s", "p", "o", "o_datatype")
      .withColumn("g", concat(regexp_extract($"s", "^(.*)/prov/se/\\d+$", 1),
        lit("/prov/")))
      .localCheckpoint()
    val dump = Files.createTempDirectory("graft_dump").toString + "/export.nq"
    Serialization.toNQuads(dataQuads.unionByName(provQuads))
      .write.text(dump)
    val tree = Files.createTempDirectory("graft_tree").toString + "/rdf"
    Serialization.migrateNQuadsToTree(spark, dump, tree, itemsPerFile = 100)

    def asQuadSet(df: org.apache.spark.sql.DataFrame) =
      df.select("s", "p", "o", "o_datatype", "g").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          Option(r.getString(3)), r.getString(4))).toSet
    // full round-trip: every quad back, graphs reconstructed per layout
    val back = Serialization.fromNQuads(Serialization.treeToNQuads(spark, tree))
    assert(asQuadSet(back) == asQuadSet(dataQuads.unionByName(provQuads)))
    // mode filters mirror stream_nquads --mode
    val dataOnly = Serialization.fromNQuads(
      Serialization.treeToNQuads(spark, tree, mode = "data"))
    assert(asQuadSet(dataOnly) == asQuadSet(dataQuads))
    val provOnly = Serialization.fromNQuads(
      Serialization.treeToNQuads(spark, tree, mode = "prov"))
    assert(asQuadSet(provOnly) == asQuadSet(provQuads))
    // find_paths behavior: a prov snapshot lands in its OWNING entity's
    // bucket, not the snapshot-number bucket
    val provFiles = new java.io.File(tree + "/prov").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(provFiles.exists(_.startsWith("dir_bucket=10000")),
      s"prov bucketed by entity number 0601/0603 -> dir 10000, got $provFiles")
  }
}
