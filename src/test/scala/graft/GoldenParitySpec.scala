package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.{Curator, Validation}

/** Golden end-to-end parity against the reference's curator fixtures
  * (`test/curator_test.py` TestTestcase01-16): each testcase slices rows
  * from `test/manual_data.csv`, curates them against an empty store, and
  * compares curated rows + all four index tables + the VVI tree
  * cell-for-cell with the expected outputs in
  * `test/testcases/testcase_data/`.
  *
  * Comparison rules mirror `prepare_to_test` (curator_test.py:93-140):
  * id cells compare as sorted token sets, bracketed id lists inside
  * author/venue/publisher/editor cells are sorted in place
  * (test_utils.normalize_row_ids), index tables sort by their key column,
  * the VVI tree compares as a nested map.
  */
class GoldenParitySpec extends AnyFunSuite {

  private val RefTest = "/root/reference/test"
  private val TcData = s"$RefTest/testcases/testcase_data"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // ---- minimal RFC-4180 reader (order-preserving, driver-side) ----------
  private def parseCsv(path: String): Vector[Map[String, String]] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val rows = Vector.newBuilder[Vector[String]]
    val field = new StringBuilder
    var cur = Vector.newBuilder[String]
    var inQ = false
    var i = 0
    def endField(): Unit = { cur += field.toString; field.clear() }
    def endRow(): Unit = { endField(); val r = cur.result(); if (r.exists(_.nonEmpty)) rows += r; cur = Vector.newBuilder[String] }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQ = false
        } else field.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => endField()
        case '\r' =>
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    if (field.nonEmpty || cur.result().nonEmpty) endRow()
    val all = rows.result()
    val header = all.head
    all.tail.map(r => header.zip(r.padTo(header.length, "")).toMap)
  }

  private lazy val manualData = parseCsv(s"$RefTest/manual_data.csv")

  // ---- normalization (test_utils.normalize_row_ids) ---------------------
  private def sortBracketIds(s: String): String =
    "\\[([^\\]]+)\\]".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        "[" + m.group(1).trim.split("\\s+").sorted.mkString(" ") + "]"))

  private def normRow(row: Map[String, String]): Map[String, Any] =
    row.map {
      case ("id", v) => "id" -> v.split("\\s+").filter(_.nonEmpty).sorted.toVector
      case (k @ ("author" | "venue" | "publisher" | "editor"), v) => k -> sortBracketIds(v)
      case (k, v) => k -> v
    }

  private def dfRows(df: DataFrame, cols: Seq[String]): Vector[Map[String, String]] =
    df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toVector
      .map(r => cols.map(c => c -> Option(r.getAs[String](c)).getOrElse("")).toMap)

  // ---- VVI tree reconstruction ------------------------------------------
  /** Nested map matching the reference's VolIss JSON:
    * {venue: {"volume": {seq: {"id": m, "issue": {seq: {"id": m}}}},
    *          "issue": {seq: {"id": m}}}} */
  private def vviTree(batch: Curator.CuratedBatch): Map[String, Any] = {
    val rows = batch.vviIndex.collect()
    def s(r: Row, c: String) = Option(r.getAs[String](c))
    val venueCells = batch.rows.collect().toVector
      .flatMap(r => "omid:(br/\\d+)".r.findFirstMatchIn(
        Option(r.getAs[String]("venue")).getOrElse("")).map(_.group(1)))
    val venues = (rows.map(_.getAs[String]("venue_meta")) ++ venueCells).distinct
    venues.map { v =>
      val mine = rows.filter(_.getAs[String]("venue_meta") == v)
      val vols = mine.filter(r => s(r, "iss_seq").isEmpty)
      val topIss = mine.filter(r => s(r, "iss_seq").isDefined && s(r, "vol_seq").forall(_.isEmpty))
      val volMap: Map[String, Any] = vols.map { vr =>
        val vSeq = vr.getAs[String]("vol_seq")
        val nested = mine.filter(r => s(r, "iss_seq").isDefined && s(r, "vol_seq").contains(vSeq))
          .map(ir => ir.getAs[String]("iss_seq") -> Map("id" -> ir.getAs[String]("meta"))).toMap
        vSeq -> Map("id" -> vr.getAs[String]("meta"), "issue" -> nested)
      }.toMap
      // issues whose volume seq exists only as a grouping key (no volume
      // entity row) still nest under that volume — collect leftovers
      val leftoverIss = mine.filter(r => s(r, "iss_seq").isDefined &&
        s(r, "vol_seq").exists(vs => vs.nonEmpty && !volMap.contains(vs)))
      val volMap2 = volMap ++ leftoverIss.groupBy(_.getAs[String]("vol_seq")).map {
        case (vs, irs) => vs -> Map(
          "issue" -> irs.map(ir => ir.getAs[String]("iss_seq") -> Map("id" -> ir.getAs[String]("meta"))).toMap)
      }
      v -> Map("volume" -> volMap2,
        "issue" -> topIss.map(ir => ir.getAs[String]("iss_seq") -> Map("id" -> ir.getAs[String]("meta"))).toMap)
    }.toMap
  }

  private def parseGoldenVi(path: String): Map[String, Any] = {
    import org.json4s._
    def conv(j: JValue): Any = j match {
      case JObject(fs) => fs.map { case (k, v) => k -> conv(v) }.toMap
      case JString(v) => v
      case other => other.values
    }
    conv(org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")))
      .asInstanceOf[Map[String, Any]]
  }

  // ---- testcase runner ---------------------------------------------------
  private def inputDf(rows: Seq[Map[String, String]]): DataFrame = {
    val data = rows.map(r => Row.fromSeq(Validation.InputColumns.map(c => r.getOrElse(c, ""))))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1),
      org.apache.spark.sql.types.StructType(Validation.InputColumns.map(
        org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType, true))))
  }

  private def indexKey(cols: Seq[String]): String =
    if (cols.contains("id")) "id" else if (cols.contains("meta")) "meta" else "br"

  private def compareIndex(name: String, got: DataFrame, goldenPath: String): Unit = {
    val golden = parseCsv(goldenPath)
    val cols = if (golden.isEmpty) got.columns.toSeq else golden.head.keys.toSeq.sorted
    val key = indexKey(cols)
    val g = dfRows(got, cols).sortBy(_(key))
    val w = golden.map(r => cols.map(c => c -> r.getOrElse(c, "")).toMap).sortBy(_(key))
    assert(g == w, s"\n[$name] index mismatch\n got: ${g.mkString("\n      ")}\nwant: ${w.mkString("\n      ")}")
  }

  private def compareBatch(name: String, batch: Curator.CuratedBatch): Unit = {
    val gotRows = dfRows(batch.rows.orderBy("first_row"), Validation.InputColumns).map(normRow)
    val wantRows = parseCsv(s"$TcData/testcase_${name}_data.csv").map(normRow)
    assert(gotRows.size == wantRows.size,
      s"\n[$name] row count ${gotRows.size} != ${wantRows.size}\n got: ${gotRows.mkString("\n      ")}\nwant: ${wantRows.mkString("\n      ")}")
    gotRows.zip(wantRows).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"\n[$name] row $i mismatch\n got: $g\nwant: $w\ndiff: ${g.keySet.filter(k => g(k) != w(k)).map(k => s"$k: ${g(k)} VS ${w(k)}").mkString("; ")}")
    }
    compareIndex(s"$name/id_br", batch.indexIdBr, s"$TcData/indices/$name/index_id_br_$name.csv")
    compareIndex(s"$name/id_ra", batch.indexIdRa, s"$TcData/indices/$name/index_id_ra_$name.csv")
    compareIndex(s"$name/ar", batch.arIndex, s"$TcData/indices/$name/index_ar_$name.csv")
    compareIndex(s"$name/re", batch.reIndex, s"$TcData/indices/$name/index_re_$name.csv")
    val gotVi = vviTree(batch)
    val wantVi = parseGoldenVi(s"$TcData/indices/$name/index_vi_$name.json")
    assert(gotVi == wantVi, s"\n[$name] vvi mismatch\n got: $gotVi\nwant: $wantVi")
  }

  private def runTestcase(name: String, slice: Seq[Map[String, String]]): Unit =
    compareBatch(name, Curator.curateFresh(inputDf(slice), normalizeTitles = true))

  // ---- seeded-store testcases (curator_test.py: name > 12 seeds
  // testcase_ts-13.ttl into the store before curating) -------------------
  private lazy val seededStore = {
    val triples = graft.rdf.Serialization.readTurtle(spark,
      s"$RefTest/testcases/ts/testcase_ts-13.ttl").localCheckpoint()
    graft.rdf.StoreViews.fromTriples(triples, "060")
  }

  private def runStoreTestcase(name: String, slice: Seq[Map[String, String]]): Unit = {
    val upd = graft.curation.StoreCurator.curateWithStore(
      inputDf(slice), seededStore, normalizeTitles = true,
      counterOffsets = Some(Map.empty))
    compareBatch(name, upd.batch)
  }

  private def rowsAt(idx: Int*): Seq[Map[String, String]] = idx.map(manualData)

  test("testcase 01: two issues of the same venue (no volume)") {
    runTestcase("01", rowsAt(0, 5))
  }
  test("testcase 02: two volumes of the same venue (no issue)") {
    runTestcase("02", rowsAt(1, 3))
  }
  test("testcase 03: two issues of the same volume") {
    runTestcase("03", rowsAt(2, 4))
  }
  test("testcase 04: two new ids and yyyy-mm / yyyy-mm-dd dates") {
    runTestcase("04", rowsAt(6, 7))
  }
  test("testcase 05: no-id scenario") {
    runTestcase("05", rowsAt(8))
  }
  test("testcase 06: all types") {
    runTestcase("06", manualData.slice(9, 33))
  }
  test("testcase 07: journal types with editor") {
    runTestcase("07", manualData.slice(34, 40))
  }
  test("testcase 08: book types with editor") {
    runTestcase("08", manualData.slice(40, 43))
  }
  test("testcase 09: proceedings types with editor") {
    runTestcase("09", manualData.slice(43, 45))
  }
  test("testcase 10: book in series and in set") {
    runTestcase("10", manualData.slice(45, 49))
  }
  test("testcase 11: real-time entity update") {
    runTestcase("11", manualData.slice(49, 52))
  }
  test("testcase 12: clean name, title, ids") {
    runTestcase("12", manualData.slice(52, 53))
  }

  // ---- R1 triples-level parity (creator_test.py:51-99: Creator over the
  // curated testcase data must be graph-isomorphic to testcase_NN.ttl).
  // The engine equivalent: TriplesEmitter over the curated batch (whose
  // CSV-level parity the battery above proves) compared as (s,p,o,dt)
  // SETS against the parsed expected graph. ----------------------------
  private def runRdfTestcase(name: String, slice: Seq[Map[String, String]]): Unit = {
    import org.apache.spark.sql.functions.coalesce
    import org.apache.spark.sql.functions.lit
    val batch = Curator.curateFresh(inputDf(slice), normalizeTitles = true)
    def canon(df: DataFrame): Set[(String, String, String, String)] =
      df.select(org.apache.spark.sql.functions.col("s"),
          org.apache.spark.sql.functions.col("p"),
          org.apache.spark.sql.functions.col("o"),
          coalesce(org.apache.spark.sql.functions.col("o_datatype"), lit("")).as("dt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
    val got = canon(graft.rdf.TriplesEmitter.emit(batch))
    val want = canon(graft.rdf.Serialization.readTurtle(spark,
      s"$RefTest/testcases/testcase_$name.ttl"))
    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty && extra.isEmpty,
      s"\n[$name] RDF mismatch\n missing (${missing.size}): ${missing.take(8).mkString("\n   ")}" +
        s"\n extra (${extra.size}): ${extra.take(8).mkString("\n   ")}")
  }

  test("testcase 01 RDF: emitted triples match the expected graph") {
    runRdfTestcase("01", rowsAt(0, 5))
  }
  test("testcase 02 RDF: emitted triples match the expected graph") {
    runRdfTestcase("02", rowsAt(1, 3))
  }
  test("testcase 03 RDF: emitted triples match the expected graph") {
    runRdfTestcase("03", rowsAt(2, 4))
  }
  test("testcase 04 RDF: emitted triples match the expected graph") {
    runRdfTestcase("04", rowsAt(6, 7))
  }
  test("testcase 05 RDF: emitted triples match the expected graph") {
    runRdfTestcase("05", rowsAt(8))
  }
  test("testcase 06 RDF: emitted triples match the expected graph") {
    runRdfTestcase("06", manualData.slice(9, 33))
  }
  test("testcase 07 RDF: emitted triples match the expected graph") {
    runRdfTestcase("07", manualData.slice(34, 40))
  }
  test("testcase 08 RDF: emitted triples match the expected graph") {
    runRdfTestcase("08", manualData.slice(40, 43))
  }
  test("testcase 09 RDF: emitted triples match the expected graph") {
    runRdfTestcase("09", manualData.slice(43, 45))
  }
  test("testcase 10 RDF: emitted triples match the expected graph") {
    runRdfTestcase("10", manualData.slice(45, 49))
  }

  test("turtle seed loads with the expected shape") {
    val t = graft.rdf.Serialization.readTurtle(spark,
      s"$RefTest/testcases/ts/testcase_ts-13.ttl")
    import spark.implicits._
    assert(t.count() > 50)
    assert(t.filter($"p" === graft.rdf.Vocab.RdfType).count() > 10)
    assert(t.filter($"o_datatype".isNotNull).count() > 10)
    assert(seededStore.entities.filter($"meta" === "br/060101").count() == 1)
  }

  test("testcase 13.1: meta-specified br + wannabe chain") {
    runStoreTestcase("13.1", manualData.slice(53, 56))
  }
  test("testcase 13.2: conflict with META precedence") {
    runStoreTestcase("13.2", manualData.slice(56, 57))
  }
  test("testcase 13.3: br id shared with two metas (either pick is valid)") {
    // curator_test.py test3 accepts EITHER golden (testcase_13.3 or
    // _13.31): the reference's pick between the two conflicting store
    // metas is dict-order dependent; this engine's pick is the
    // deterministic min, which must equal one of the two
    val batch = graft.curation.StoreCurator.curateWithStore(
      inputDf(manualData.slice(57, 58)), seededStore, normalizeTitles = true,
      counterOffsets = Some(Map.empty)).batch
    try compareBatch("13.3", batch)
    catch { case _: org.scalatest.exceptions.TestFailedException =>
      compareBatch("13.31", batch) }
  }
  test("testcase 14.1: update existing sequence (surname+name match)") {
    runStoreTestcase("14.1", manualData.slice(58, 59))
  }
  test("testcase 14.2: same sequence different order, new ids") {
    runStoreTestcase("14.2", manualData.slice(59, 60))
  }
  test("testcase 14.3: author with two different ids") {
    runStoreTestcase("14.3", manualData.slice(60, 61))
  }
  test("testcase 14.4: meta-specified ra + wannabe ra chain") {
    runStoreTestcase("14.4", manualData.slice(61, 64))
  }
  test("testcase 15.1: venue volume issue already in ts") {
    runStoreTestcase("15.1", manualData.slice(64, 65))
  }
  test("testcase 15.2: venue conflict") {
    runStoreTestcase("15.2", manualData.slice(65, 66))
  }
  test("testcase 15.3: venue in ts is now the br") {
    runStoreTestcase("15.3", manualData.slice(66, 67))
  }
  test("testcase 15.4: br in ts is now the venue") {
    runStoreTestcase("15.4", manualData.slice(67, 68))
  }
  test("testcase 15.5: volume in ts is now the br") {
    runStoreTestcase("15.5", manualData.slice(71, 72))
  }
  test("testcase 15.6: br is a volume") {
    runStoreTestcase("15.6", manualData.slice(72, 73))
  }
  test("testcase 15.7: issue in ts is now the br") {
    runStoreTestcase("15.7", manualData.slice(73, 74))
  }
  test("testcase 15.8: br is an issue") {
    runStoreTestcase("15.8", manualData.slice(74, 75))
  }
  test("testcase 16.1: wrong date 2019-02-29") {
    runStoreTestcase("16.1", manualData.slice(75, 76))
  }
  test("testcase 16.2: existing re") {
    runStoreTestcase("16.2", manualData.slice(76, 77))
  }
  test("testcase 16.3: given name fills family-only RA in ts") {
    runStoreTestcase("16.3", manualData.slice(77, 78))
  }

  // ---- real_data.csv: the reference's real-world fixture ----------------
  // No golden CSV ships with the reference, so the expected cells are
  // derived from its semantics and verified against `test/curator_test.py`
  // TestIdWorkerWithReset (which asserts br/0601 + id/0601 + the cleaned
  // title for row 1 after curating this exact file): clean_title
  // capitalizes every word without an internal capital (cleaner.py:162-180,
  // "GDP"/"OECD" survive), an id-less venue mints a NEW entity per row —
  // no name merge (curator.py:510-519), id-less same-name authors on
  // different rows stay separate (D5 adoption is per attach entity), and
  // the publisher merges across rows through crossref:1963.
  test("real_data.csv: full-file golden (empty store)") {
    val batch = Curator.curateFresh(
      Curator.readInput(spark, s"$RefTest/real_data.csv"), normalizeTitles = true)
    val got = dfRows(batch.rows.orderBy("first_row"), Validation.InputColumns).map(normRow)
    // "other" is NOT in VALID_ENTITY_TYPES (constants.py:69-108) -> type
    // clears to ""; clean_name lowercases the all-caps org "OECD" before
    // title-casing (cleaner.py:173-178 via clean_name) -> "Oecd"; the
    // venue string keeps "OECD" because the full venue title is not
    // entirely uppercase, so the word's internal capitals protect it.
    val want = Vector(
      Map(
        "id" -> "doi:10.1787/eco_outlook-v2011-2-graph138-en omid:br/0601",
        "title" -> "Money Growth, Interest Rates, Inflation And Raw Materials Prices: China",
        "author" -> "Peroni, Silvio [omid:ra/0601]",
        "pub_date" -> "2011-11-28",
        "venue" -> "OECD Economic Outlook, Volume 2011 Issue 2 [omid:br/0604]",
        "volume" -> "", "issue" -> "", "page" -> "",
        "type" -> "",
        "publisher" -> "Oecd [crossref:1963 omid:ra/0602]",
        "editor" -> ""),
      Map(
        "id" -> "doi:10.1787/eco_outlook-v2011-2-graph150-en omid:br/0602",
        "title" -> "Contributions To GDP Growth And Inflation: South Africa",
        "author" -> "Peroni, Silvio [omid:ra/0603]",
        "pub_date" -> "2011-11-28",
        "venue" -> "OECD Economic Outlook, Volume 2011 Issue 2 [omid:br/0605]",
        "volume" -> "", "issue" -> "", "page" -> "",
        "type" -> "",
        "publisher" -> "Oecd [crossref:1963 omid:ra/0602]",
        "editor" -> ""),
      Map(
        "id" -> "doi:10.1787/eco_outlook-v2011-2-graph18-en omid:br/0603",
        "title" -> "Official Loans To The Governments Of Greece, Ireland And Portugal",
        "author" -> "Peroni, Silvio [omid:ra/0604]",
        "pub_date" -> "2011-11-28",
        "venue" -> "OECD Economic Outlook, Volume 2011 Issue 2 [omid:br/0606]",
        "volume" -> "", "issue" -> "", "page" -> "",
        "type" -> "",
        "publisher" -> "Oecd [crossref:1963 omid:ra/0602]",
        "editor" -> "")).map(normRow)
    assert(got.size == want.size, s"rows ${got.size} != ${want.size}\n$got")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"\n[real_data] row $i mismatch\n got: $g\nwant: $w\ndiff: ${g.keySet.filter(k => g(k) != w(k)).map(k => s"$k: ${g(k)} VS ${w(k)}").mkString("; ")}")
    }
    val idBr = dfRows(batch.indexIdBr, Seq("id", "meta")).sortBy(_("id"))
    assert(idBr == Vector(
      Map("id" -> "doi:10.1787/eco_outlook-v2011-2-graph138-en", "meta" -> "id/0601"),
      Map("id" -> "doi:10.1787/eco_outlook-v2011-2-graph150-en", "meta" -> "id/0602"),
      Map("id" -> "doi:10.1787/eco_outlook-v2011-2-graph18-en", "meta" -> "id/0603")), idBr.toString)
    val idRa = dfRows(batch.indexIdRa, Seq("id", "meta"))
    assert(idRa == Vector(Map("id" -> "crossref:1963", "meta" -> "id/0604")), idRa.toString)
    val ar = dfRows(batch.arIndex, Seq("meta", "author", "editor", "publisher")).sortBy(_("meta"))
    assert(ar == Vector(
      Map("meta" -> "br/0601", "author" -> "ar/0601, ra/0601", "editor" -> "",
        "publisher" -> "ar/0602, ra/0602"),
      Map("meta" -> "br/0602", "author" -> "ar/0603, ra/0603", "editor" -> "",
        "publisher" -> "ar/0604, ra/0602"),
      Map("meta" -> "br/0603", "author" -> "ar/0605, ra/0604", "editor" -> "",
        "publisher" -> "ar/0606, ra/0602")), ar.toString)
    assert(batch.reIndex.isEmpty)
    val vi = vviTree(batch)
    assert(vi == Map(
      "br/0604" -> Map("volume" -> Map(), "issue" -> Map()),
      "br/0605" -> Map("volume" -> Map(), "issue" -> Map()),
      "br/0606" -> Map("volume" -> Map(), "issue" -> Map())), vi.toString)
  }
}
