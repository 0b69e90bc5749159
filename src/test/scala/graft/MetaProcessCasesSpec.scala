package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.{Curator, StoreCurator, Validation}
import graft.rdf.{StoreViews, TriplesEmitter, Vocab}

/** Ports of the reference `test/meta_process_test.py` end-to-end corners
  * not already carried by MetaProcessSpec / StoreCuratorSpec /
  * GoldenParitySpec, plus the per-case adjudication of all 18 reference
  * tests (extending the CuratorBranchesSpec adjudication-note pattern).
  *
  * ADJUDICATION NOTE — `meta_process_test.py` has 18 tests:
  *  1. test_run_meta_process — full queue over the meta_process fixtures,
  *     curated-CSV compare. Same code path as CurationSpec
  *     (example_metadata, 7 asserts) + GoldenParitySpec real_data full-file
  *     golden; the queue/resume loop itself is MetaProcessSpec.
  *  2. test_run_meta_process_ids_only — nameless agents ("[orcid:... ]")
  *     keep id-only cells; CleaningSpec "clean_ra_list: ids-only entries"
  *     covers the parser branch, goldens cover the cell round-trip.
  *  3. test_provenance — run A, run B (enrichment), run A again: se/2
  *     carries the update query; the THIRD run adds NO snapshots. The
  *     enrichment snapshots are MetaProcessSpec's first test; the
  *     no-change-reprocess-adds-no-snapshot corner is ported HERE
  *     ("no-op reprocess adds no provenance snapshots").
  *  4. test_run_meta_process_thread_safe — a second full run over the same
  *     input leaves the graph unchanged; MetaProcessSpec's crash-resume
  *     test asserts exactly that (triples set equality + counters + no
  *     double-minted ids after reprocessing an already-applied file).
  *  5/6. test_silencer_on/off — StoreCuratorSpec D6 (silencer keeps store
  *     role sequences; unsilenced run re-resolves) covers both arms.
  *  7. test_omid_in_input_data — StoreCuratorSpec D2(1)/(2) tests (explicit
  *     omid adopts / unknown omid discarded) + GoldenParitySpec 13.1/13.2.
  *  8. test_publishers_sequence — publisher AR ordering on the shared
  *     venue; CurationSpec "ar_index has author+publisher pairs" + the
  *     roles/hasNext round-trip in StoreCuratorSpec test 1.
  *  9. test_duplicate_omids_with_datatype — ported HERE ("store id match
  *     is datatype-insensitive").
  * 10. test_duplicate_omids_with_venue_datatype — ported HERE (same test:
  *     the two ISSNs sit on two previously-unconnected store entities the
  *     row bridges; no id re-mint either way).
  * 11. test_doi_with_multiple_slashes — ported HERE ("doi with multiple
  *     slashes and colons survives as one id").
  * 12. test_volume_issue_deduplication — GoldenParitySpec 01-03 (two
  *     issues/volumes of one venue resolve to shared VVI entities).
  * 13. test_volume_issue_deduplication_with_triplestore — the store
  *     already containing DUPLICATE volume/issue entities (typed and
  *     untyped seq literals) is the new corner — ported HERE.
  * 14. test_temporary_identifiers — ported HERE ("temp ids mint an omid
  *     but are never persisted to RDF").
  * 15. test_temporary_identifiers_deduplication — ported HERE ("rows
  *     sharing a temp id curate to one entity").
  * 16. test_rdf_files_only — output-mode flag (skip triplestore upload);
  *     the engine always materializes file outputs and the HTTP push is
  *     descoped (SURVEY §2.1 S5), so the flag's semantics are the
  *     engine's only mode. No port needed.
  * 17. test_parallel_collect_identifiers — parallel == sequential results;
  *     the engine is parallel BY CONSTRUCTION and determinism under
  *     partitioning is asserted by MetaProcessSpec's resume-equivalence
  *     and the goldens running at local[4]. No separate port.
  * 18. test_id_only_alignment_preserves_existing_data — ported HERE
  *     ("id-only row aligns new ids onto the store entity, preserves
  *     metadata").
  */
class MetaProcessCasesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def inputDf(rows: Seq[(String, String, String, String, String, String,
      String, String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF(Validation.InputColumns: _*)
  }

  private val M = Vocab.BaseIri + "/"

  private def triplesDf(rows: Seq[(String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("s", "p", "o", "o_datatype")
  }

  // --- tests 14/15: temporary identifiers --------------------------------

  test("rows sharing a temp id curate to one entity (test 15)") {
    val batch = Curator.curateFresh(inputDf(Seq(
      ("temp:789", "Test Article 1", "Smith, John [orcid:0000-0002-1234-5678]",
        "2020", "", "", "", "", "journal article", "", ""),
      ("temp:789", "Test Article 1", "Smith, John [orcid:0000-0002-1234-5678]",
        "2020", "", "", "", "", "journal article", "", ""))))
    val rows = batch.rows.collect()
    assert(rows.length == 1, "same temp id must deduplicate to one entity")
    val idCell = rows.head.getAs[String]("id")
    // the reference's enrich() writes entity_store.get_ids verbatim, temp
    // included (curator.py:990), and indexer carries it with its minted
    // id number (curator.py:1122-1130)
    assert(idCell.contains("temp:789") && idCell.contains("omid:br/0601"), idCell)
    import spark.implicits._
    assert(batch.indexIdBr.filter($"id" === "temp:789").count() == 1,
      "temp id consumes an id number and appears in the id index")
  }

  test("temp ids mint an omid but are never persisted to RDF (test 14)") {
    import spark.implicits._
    val batch = Curator.curateFresh(inputDf(Seq(
      ("temp:567", "Test Article", "", "2023", "", "", "", "", "journal article", "", ""),
      ("temp:5 doi:10.1/mixed", "Mixed Ids", "", "2023", "", "", "", "", "journal article", "", ""))))
    assert(batch.rows.count() == 2)
    // creator.py:629-631: id_creator skips temp — no id entity, no
    // hasIdentifier link for the temp-only row; the mixed row keeps ONLY
    // its doi
    val persisted = batch.entityIds.select($"scheme").as[String].collect()
    assert(!persisted.contains("temp"), s"temp persisted: ${persisted.toSeq}")
    assert(persisted.count(_ == "doi") == 1)
    val triples = TriplesEmitter.emit(batch)
    assert(triples.filter($"o".startsWith("temp") || $"o" === "567").isEmpty,
      "no temp literal may reach the graph")
    // both rows still minted brs and the temp-only one has no id link
    val tempOnlyBr = batch.rows.orderBy("first_row").collect()(0).getAs[String]("br_meta")
    assert(triples.filter($"s" === s"$M$tempOnlyBr" &&
      $"p" === Vocab.HasIdentifier).isEmpty)
  }

  // --- tests 9/10: datatype-insensitive store id matching ----------------

  test("store id match is datatype-insensitive, bridged ids are not re-minted (tests 9/10)") {
    import spark.implicits._
    // the production corner verbatim: two store journals, one ISSN each,
    // one literal PLAIN ("2078-7685") and one TYPED — the reference
    // matches on the lexical form either way
    val store = StoreViews.fromTriples(triplesDf(Seq(
      (s"${M}br/0601", Vocab.RdfType, "http://purl.org/spar/fabio/Journal", null),
      (s"${M}br/0601", Vocab.HasIdentifier, s"${M}id/0601", null),
      (s"${M}br/0602", Vocab.RdfType, "http://purl.org/spar/fabio/Journal", null),
      (s"${M}br/0602", Vocab.HasIdentifier, s"${M}id/0602", null),
      (s"${M}id/0601", Vocab.HasLiteralValue, "2078-7685", null),
      (s"${M}id/0601", Vocab.UsesIdentifierScheme, s"${Vocab.Datacite}issn", null),
      (s"${M}id/0602", Vocab.HasLiteralValue, "2543-3288", Vocab.XsdString),
      (s"${M}id/0602", Vocab.UsesIdentifierScheme, s"${Vocab.Datacite}issn", null))), "060")
    val upd = StoreCurator.curateWithStore(inputDf(Seq(
      ("issn:2543-3288 issn:2078-7685", "Journal of Diabetology", "", "", "",
        "", "", "", "journal", "Medknow [crossref:2581]", ""))), store)
    // each ISSN still maps to exactly ONE id entity, and both are the
    // STORE's (no re-mint): the row bridged two previously-unconnected
    // entities and adopted into one of them
    val ids = upd.batch.entityIds.filter($"scheme" === "issn")
      .select($"value", $"id_meta").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(ids.keySet == Set("2078-7685", "2543-3288"), ids.toString)
    ids.foreach { case (v, metas) =>
      assert(metas.size == 1, s"ISSN $v owned by multiple id entities: $metas")
      assert(Set("id/0601", "id/0602").contains(metas.head),
        s"ISSN $v re-minted as ${metas.head} instead of adopting the store id")
    }
    val row = upd.batch.rows.collect().head
    assert(Set("br/0601", "br/0602").contains(row.getAs[String]("br_meta")),
      "row must adopt one of the bridged store entities")
  }

  // --- test 13: VVI dedup against a store with duplicate volumes/issues --

  test("article adopts an existing store volume/issue even when the store holds duplicates (test 13)") {
    import spark.implicits._
    val jv = "http://purl.org/spar/fabio/JournalVolume"
    val ji = "http://purl.org/spar/fabio/JournalIssue"
    val store = StoreViews.fromTriples(triplesDf(Seq(
      (s"${M}br/0601", Vocab.RdfType, "http://purl.org/spar/fabio/Journal", null),
      (s"${M}br/0601", Vocab.Title, "Test Journal", null),
      (s"${M}br/0601", Vocab.HasIdentifier, s"${M}id/0601", null),
      (s"${M}id/0601", Vocab.HasLiteralValue, "1756-1833", null),
      (s"${M}id/0601", Vocab.UsesIdentifierScheme, s"${Vocab.Datacite}issn", null),
      // volume "1" twice: plain and typed sequence literals
      (s"${M}br/0602", Vocab.RdfType, jv, null),
      (s"${M}br/0602", Vocab.PartOf, s"${M}br/0601", null),
      (s"${M}br/0602", Vocab.HasSequenceIdentifier, "1", null),
      (s"${M}br/0604", Vocab.RdfType, jv, null),
      (s"${M}br/0604", Vocab.PartOf, s"${M}br/0601", null),
      (s"${M}br/0604", Vocab.HasSequenceIdentifier, "1", Vocab.XsdString),
      // issue "1" twice, one under each volume twin
      (s"${M}br/0603", Vocab.RdfType, ji, null),
      (s"${M}br/0603", Vocab.PartOf, s"${M}br/0602", null),
      (s"${M}br/0603", Vocab.HasSequenceIdentifier, "1", null),
      (s"${M}br/0605", Vocab.RdfType, ji, null),
      (s"${M}br/0605", Vocab.PartOf, s"${M}br/0604", null),
      (s"${M}br/0605", Vocab.HasSequenceIdentifier, "1", Vocab.XsdString))), "060")
    val upd = StoreCurator.curateWithStore(inputDf(Seq(
      ("doi:10.1234/test.1", "Test Article", "", "2023",
        "Test Journal [issn:1756-1833]", "1", "1", "1-10", "journal article", "", ""))), store)
    val row = upd.batch.rows.collect().head
    val art = row.getAs[String]("br_meta")
    assert(row.getAs[String]("venue").contains("omid:br/0601"),
      "venue must adopt the store journal")
    // the article's partOf parent must be ONE existing issue twin — and no
    // NEW JournalVolume/JournalIssue entity may be minted
    val parents = upd.batch.partOf.filter($"child_meta" === art)
      .select($"parent_meta").as[String].collect().toSet
    assert(parents.size == 1 &&
      Set("br/0603", "br/0605").contains(parents.head),
      s"article parent $parents must be an existing issue twin")
    val freshVvi = upd.batch.entities.filter(
      $"type_label".isin("journal volume", "journal issue") &&
        !$"meta".isin("br/0602", "br/0603", "br/0604", "br/0605")).count()
    assert(freshVvi == 0, "no new volume/issue entity may be minted")
  }

  // --- test 11: doi with multiple slashes --------------------------------

  test("doi with multiple slashes and colons survives as one id (test 11)") {
    import spark.implicits._
    val batch = Curator.curateFresh(inputDf(Seq(
      ("doi:10.1093/acprof:oso/9780199230723.001.0001", "Test Book", "", "",
        "", "", "", "", "book", "", ""))))
    val rows = batch.rows.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("id") ==
      "doi:10.1093/acprof:oso/9780199230723.001.0001 omid:br/0601")
    val ids = batch.entityIds.collect()
    assert(ids.length == 1 && ids.head.getAs[String]("scheme") == "doi" &&
      ids.head.getAs[String]("value") == "10.1093/acprof:oso/9780199230723.001.0001")
  }

  // --- test 18: id-only alignment ----------------------------------------

  test("id-only row aligns new ids onto the store entity, preserves metadata (test 18)") {
    import spark.implicits._
    val batch1 = Curator.curateFresh(inputDf(Seq(
      ("doi:10.1234/test.one", "First Article Title",
        "Smith, John [orcid:0000-0001-1234-5678]", "2020-01-15",
        "Test Journal [issn:1234-5678]", "10", "2", "100-110",
        "journal article", "Test Publisher [crossref:999]", ""),
      ("doi:10.1234/test.two", "Second Article Title",
        "Doe, Jane [orcid:0000-0002-9876-5432]", "2021-06-01",
        "Test Journal [issn:1234-5678]", "11", "1", "200-220",
        "journal article", "Test Publisher [crossref:999]", ""))))
    val store = StoreViews.fromTriples(TriplesEmitter.emit(batch1), "060")
    val br1 = batch1.rows.orderBy("first_row").collect()(0).getAs[String]("br_meta")
    val br2 = batch1.rows.orderBy("first_row").collect()(1).getAs[String]("br_meta")
    val storeArs = store.roles.filter($"br_meta" === br1).count()
    assert(storeArs >= 1)

    val upd = StoreCurator.curateWithStore(inputDf(Seq(
      (s"omid:$br1 openalex:W111111111", "", "", "", "", "", "", "", "", "", ""),
      (s"omid:$br2 openalex:W222222222", "", "", "", "", "", "", "", "", "", ""))), store)
    // new openalex ids attach to the RIGHT store entities
    val oa = upd.batch.entityIds.filter($"scheme" === "openalex")
      .select($"value", $"owner_meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(oa == Map("W111111111" -> br1, "W222222222" -> br2), oa.toString)
    // existing metadata preserved in the equalized output rows
    val rows = upd.batch.rows.orderBy("first_row").collect()
    assert(rows(0).getAs[String]("title") == "First Article Title")
    assert(rows(0).getAs[String]("id").contains("doi:10.1234/test.one"),
      "existing doi must remain on the entity")
    assert(rows(0).getAs[String]("author").contains("Smith"),
      "existing authors must be preserved")
    assert(rows(0).getAs[String]("venue").contains("Test Journal"))
  }

  // --- test 3 corner: reprocessing unchanged data mints no snapshots -----

  test("no-op reprocess adds no provenance snapshots (test 3 third-run corner)") {
    import java.nio.file.Files
    import graft.curation.MetaProcess
    val T0 = "2026-08-13T00:00:00Z"
    val f1 = "/root/reference/example_metadata.csv"
    val s1 = MetaProcess.run(spark, Seq(f1), T0)
    val before = s1.prov.get.localCheckpoint()
    // force a REPROCESS of the same file content (fresh path string, same
    // rows) against the store that already contains it — the reference's
    // third run over the same input dir
    val dir = Files.createTempDirectory("graft_mpnoop")
    val copy = dir.resolve("again.csv")
    Files.copy(java.nio.file.Paths.get(f1), copy)
    val s2 = MetaProcess.run(spark, Seq(copy.toString), T0, state = s1)
    val after = s2.prov.get
    import spark.implicits._
    val beforeCount = before.groupBy($"entity").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val afterCount = after.groupBy($"entity").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every entity that EXISTED keeps its snapshot count: reprocessing
    // identical data must not open an "Entity modified" snapshot anywhere
    beforeCount.foreach { case (e, n) =>
      assert(afterCount.get(e).contains(n),
        s"unchanged entity $e got a new snapshot on reprocess ($n -> ${afterCount.get(e)})")
    }
    // the reference re-mints entities for NO-ID rows on every run (no id
    // to adopt by; clean_metadata_without_id only normalizes fields, it
    // does not metadata-match) — example_metadata has two such rows, so
    // new entities are allowed but must all be single-snapshot creations
    val newEntities = afterCount.keySet -- beforeCount.keySet
    newEntities.foreach { e =>
      assert(afterCount(e) == 1, s"re-minted entity $e must have one creation snapshot")
    }
    val newBrs = newEntities.count(_.startsWith("br/"))
    assert(newBrs == 2,
      s"exactly the two no-id rows may re-mint ($newBrs new brs: " +
        s"${newEntities.filter(_.startsWith("br/"))})")
  }
}
