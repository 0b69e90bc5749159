package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tools
import graft.rdf.{Checkers, Editor, GraphDiff, Provenance, Vocab}

/** Per-case adjudication of the reference's `test/editor_test.py`
  * (10 cases) and `test/entity_merger_test.py` (15 cases) — the merge/edit
  * tooling cross-check round 11 flagged as missing (same pattern as
  * CuratorBranchesSpec / MetaProcessCasesSpec / ResourceFinderCasesSpec).
  *
  * Engine counterparts: [[Editor]] (batched update/delete with SCD2
  * provenance), [[Tools.applyMerges]] (D10 — upgraded this round to the
  * reference-exact observable contract these very tests pin),
  * [[Provenance.mergeProvenance]], [[Checkers.mergeAudit]].
  *
  * editor_test.py:
  *  - E1  test_update_property (hasNext rewiring)      -> PORTED
  *  - E2  test_delete_property (+ DELETE DATA payload) -> PORTED (rendering
  *        divergence: engine renders per-triple DELETE/INSERT DATA without
  *        the GRAPH <.../kind/> wrapper — graph is derivable from the
  *        subject kind; triple CONTENT asserted, as the reference's own
  *        check_sparql_query_content does)
  *  - E3  test_delete_entity (purge + inbound cleanup) -> PORTED
  *  - E4  test_merge (editor-level merge)              -> PORTED (via M7/M12
  *        below — the editor delegates to the same merge semantics)
  *  - E5  test_delete_entity_with_inferred_type        -> EXEMPT: pins
  *        oc_ocdm's type inference when LOADING an entity whose rdf:type
  *        is absent from the store; the engine never loads/infers — the
  *        triples frame carries types end-to-end
  *  - E6  test_rdf_files_only                          -> EXEMPT: persistence-
  *        target config of the Python tool (skip triplestore, write files
  *        only); engine sinks are the caller's choice by construction
  *  - E7  test_merge_caches_entities                   -> EXEMPT: in-process
  *        entity-cache reuse across merges; engine merges are stateless
  *        joins, nothing to cache
  *  - E8  TestEntityCache.test_add_and_is_cached       -> EXEMPT (same)
  *  - E9  TestEntityCache.test_clear                   -> EXEMPT (same)
  *  - E10 (setup fixture)                              -> n/a (infrastructure)
  *
  * entity_merger_test.py:
  *  - M1  test_get_entity_type                         -> PORTED (kind rule)
  *  - M2  test_read_write_csv                          -> EXEMPT: CSV IO
  *        plumbing — S1/S2 are spec'd in CurationSpec/CurateJob
  *  - M3  test_count_csv_rows                          -> EXEMPT (trivial IO)
  *  - M4  test_process_file_with_stop_file             -> EXEMPT: stop-file
  *        polling of the worker loop; engine = Spark job cancellation
  *  - M5  test_process_folder                          -> EXEMPT: process-pool
  *        scheduling; engine runs ALL merge rows as one distributed job
  *        ([[Tools.groupMergeRows]] provides the conflict grouping)
  *  - M6  test_process_folder_with_worker_limit        -> EXEMPT (same)
  *  - M7  test_merge_authors_with_real_data            -> PORTED
  *  - M8  test_merge_with_invalid_entity_type          -> EXEMPT: the tool's
  *        kind whitelist guards its CSV driver; the engine operator is
  *        kind-agnostic by design and [[Checkers.mergeAudit]] gates output
  *        shape per kind
  *  - M9  test_merge_with_nonexistent_entities         -> PORTED (fails fast
  *        = mergeAudit violation row, engine form of the raised ValueError)
  *  - M10 test_merge_multiple_entities                 -> PORTED
  *  - M11 test_merge_with_conflicting_data             -> PORTED
  *  - M12 test_merge_bibliographic_resources           -> PORTED
  *  - M13 test_fetch_related_entities_batch            -> EXEMPT: SPARQL
  *        batching of the relationship prefetch; engine = one join
  *        (J11 Tools.relatedEntityClosure, ToolsSpec)
  *  - M14 test_merge_bibliographic_resources_with_multiple_identifiers
  *                                                     -> PORTED
  *  - M15 (setup fixture)                              -> n/a
  */
class EditorMergerCasesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val B = Vocab.BaseIri

  private def triples(ts: Seq[(String, String, String)]): DataFrame = {
    val rows = ts.map { case (s, p, o) =>
      Row(s, p, o, if (o.startsWith("http")) null else Vocab.XsdString)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("s", StringType), StructField("p", StringType),
        StructField("o", StringType), StructField("o_datatype", StringType))))
  }

  private def pairsDf(ps: (String, String, Long)*): DataFrame = {
    import spark.implicits._
    ps.toSeq.toDF("surviving", "merged", "ord")
  }

  private def id(meta: String, scheme: String, value: String): Seq[(String, String, String)] = Seq(
    (s"$B/$meta", Vocab.RdfType, Vocab.IdentifierClass),
    (s"$B/$meta", Vocab.UsesIdentifierScheme, Vocab.Datacite + scheme),
    (s"$B/$meta", Vocab.HasLiteralValue, value))

  private def ra(meta: String, name: String): Seq[(String, String, String)] = Seq(
    (s"$B/$meta", Vocab.RdfType, Vocab.FoafAgent),
    (s"$B/$meta", Vocab.FoafName, name))

  private def triple(df: DataFrame): Set[(String, String, String)] =
    df.select("s", "p", "o").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  // ---- M1: entity kind --------------------------------------------------

  test("M1 get_entity_type: kind is the penultimate URI segment") {
    import spark.implicits._
    val kinds = Seq(
      s"$B/ra/06107", s"$B/br/0601", s"$B/id/0999").toDF("uri")
      .select(regexp_extract($"uri", "/([a-z]+)/[0-9]+$", 1).as("kind"))
      .collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("ra", "br", "id"))
  }

  // ---- M7: author merge with "real data" shapes -------------------------

  private def authorWorld: DataFrame = triples(
    ra("ra/0601", "John Smith") ++ ra("ra/0602", "J. Smith") ++
    Seq(
      (s"$B/ra/0601", Vocab.HasIdentifier, s"$B/id/0601"),
      (s"$B/ra/0602", Vocab.HasIdentifier, s"$B/id/0602"),
      // roles held by both authors on one publication
      (s"$B/br/0601", Vocab.IsDocumentContextFor, s"$B/ar/0601"),
      (s"$B/ar/0601", Vocab.WithRole, Vocab.Pro + "author"),
      (s"$B/ar/0601", Vocab.IsHeldBy, s"$B/ra/0601"),
      (s"$B/br/0601", Vocab.IsDocumentContextFor, s"$B/ar/0602"),
      (s"$B/ar/0602", Vocab.WithRole, Vocab.Pro + "author"),
      (s"$B/ar/0602", Vocab.IsHeldBy, s"$B/ra/0602")) ++
    id("id/0601", "orcid", "0000-0001-0000-0001") ++
    id("id/0602", "viaf", "123"))

  test("M7 merge_authors: ids union, merged's name wins, roles rewired") {
    val before = authorWorld
    val after = Tools.applyMerges(before,
      pairsDf((s"$B/ra/0601", s"$B/ra/0602", 1L))).localCheckpoint()
    val t = triple(after)
    // both identifiers on the survivor (entity_merger_test.py:373-381)
    assert(t((s"$B/ra/0601", Vocab.HasIdentifier, s"$B/id/0601")))
    assert(t((s"$B/ra/0601", Vocab.HasIdentifier, s"$B/id/0602")))
    // name took the MERGED entity's value (test:383-388 + prov delete/insert)
    assert(t((s"$B/ra/0601", Vocab.FoafName, "J. Smith")))
    assert(!t.exists { case (s, p, o) => s == s"$B/ra/0601" && p == Vocab.FoafName && o == "John Smith" })
    // merged entity no longer exists (test:389-391)
    assert(!t.exists(_._1 == s"$B/ra/0602"))
    assert(!t.exists(_._3 == s"$B/ra/0602"))
    // all roles point at the survivor (test:393-402)
    assert(t((s"$B/ar/0602", Vocab.IsHeldBy, s"$B/ra/0601")))
    assert(t((s"$B/ar/0601", Vocab.IsHeldBy, s"$B/ra/0601")))
    // the hasUpdateQuery payload content (test:404-417): delete the old
    // name, insert the moved id edge + the new name
    val adds = triple(after.except(before.select(col("s"), col("p"), col("o"), col("o_datatype"))))
    val dels = triple(before.select(col("s"), col("p"), col("o"), col("o_datatype")).except(after))
      .filter(_._1 == s"$B/ra/0601")
    assert(adds((s"$B/ra/0601", Vocab.HasIdentifier, s"$B/id/0602")))
    assert(adds((s"$B/ra/0601", Vocab.FoafName, "J. Smith")))
    assert(dels == Set((s"$B/ra/0601", Vocab.FoafName, "John Smith")))
  }

  // ---- M9: nonexistent entities fail fast as audit violations ----------

  test("M9 merging a nonexistent entity surfaces surviving_entity_missing") {
    val world = triples(ra("ra/0601", "X"))
    val pairs = pairsDf((s"$B/ra/9999", s"$B/ra/9998", 1L))
    val after = Tools.applyMerges(world, pairs)
    import spark.implicits._
    val prov = Seq(("ra/0601", 1L, "t0", null.asInstanceOf[String],
      Seq.empty[String], "Entity created", "a")).toDF(
      "entity", "snapshot_n", "generated_at", "invalidated_at",
      "derived_from", "description", "attributed_to")
    val fired = Checkers.mergeAudit(pairs, after, prov)
      .select("check").distinct().collect().map(_.getString(0)).toSet
    assert(fired.contains("surviving_entity_missing"))
  }

  // ---- M10: multiple merged entities, last name wins --------------------

  test("M10 merge_multiple_entities: 4 ids, LAST merged name wins") {
    val world = authorWorld
      .unionByName(triples(
        ra("ra/0603", "John A. Smith") ++ ra("ra/0604", "J A Smith") ++
        Seq(
          (s"$B/ra/0603", Vocab.HasIdentifier, s"$B/id/0603"),
          (s"$B/ra/0604", Vocab.HasIdentifier, s"$B/id/0604")) ++
        id("id/0603", "viaf", "123456789") ++
        id("id/0604", "wikidata", "Q12345")))
    val after = Tools.applyMerges(world, pairsDf(
      (s"$B/ra/0601", s"$B/ra/0602", 1L),
      (s"$B/ra/0601", s"$B/ra/0603", 2L),
      (s"$B/ra/0601", s"$B/ra/0604", 3L))).localCheckpoint()
    val t = triple(after)
    val ids = t.collect { case (s, p, o) if s == s"$B/ra/0601" && p == Vocab.HasIdentifier => o }
    assert(ids == Set(s"$B/id/0601", s"$B/id/0602", s"$B/id/0603", s"$B/id/0604"))
    // "should take the last merged name" (entity_merger_test.py:616-620)
    val names = t.collect { case (s, p, o) if s == s"$B/ra/0601" && p == Vocab.FoafName => o }
    assert(names == Set("J A Smith"))
    assert(!t.exists(x => x._1.contains("ra/0602") || x._1.contains("ra/0603") || x._1.contains("ra/0604")))
    // provenance: ONE merge snapshot naming all merged + a deletion
    // snapshot per merged entity (test:643-726)
    import spark.implicits._
    val baseProv = Seq("ra/0601", "ra/0602", "ra/0603", "ra/0604").toDF("entity")
      .select($"entity", lit(1L).as("snapshot_n"), lit("t0").as("generated_at"),
        lit(null).cast("string").as("invalidated_at"),
        array().cast("array<string>").as("derived_from"),
        lit("Entity created").as("description"), lit("a").as("attributed_to"))
    val metaPairs = pairsDf(("ra/0601", "ra/0602", 1L), ("ra/0601", "ra/0603", 2L),
      ("ra/0601", "ra/0604", 3L))
    val prov2 = Provenance.mergeProvenance(baseProv, metaPairs, "2026-08-15T00:00:00Z")
    val survSnaps = prov2.filter(col("entity") === "ra/0601" &&
      col("description").contains("merged")).collect()
    assert(survSnaps.length == 1)
    val desc = survSnaps.head.getAs[String]("description")
    assert(desc.contains("ra/0602") && desc.contains("ra/0603") && desc.contains("ra/0604"))
    val deleted = prov2.filter(col("description") === "Entity deleted")
      .select("entity").collect().map(_.getString(0)).toSet
    assert(deleted == Set("ra/0602", "ra/0603", "ra/0604"))
  }

  // ---- M11: conflicting data -> content-level id dedup -------------------

  test("M11 conflicting data: same-value ids collapse, merged's literals win") {
    val world = triples(
      ra("ra/0605", "John Smith") ++ ra("ra/0606", "Johnny Smith") ++
      Seq(
        (s"$B/ra/0605", Vocab.FoafGivenName, "John"),
        (s"$B/ra/0605", Vocab.FoafFamilyName, "Smith"),
        (s"$B/ra/0606", Vocab.FoafGivenName, "Johnny"),
        (s"$B/ra/0606", Vocab.FoafFamilyName, "Smith"),
        (s"$B/ra/0605", Vocab.HasIdentifier, s"$B/id/0605"),
        (s"$B/ra/0606", Vocab.HasIdentifier, s"$B/id/0606")) ++
      id("id/0605", "orcid", "0000-0002-1234-5678") ++
      id("id/0606", "orcid", "0000-0002-1234-5678")) // SAME scheme+value
    val after = Tools.applyMerges(world,
      pairsDf((s"$B/ra/0605", s"$B/ra/0606", 1L))).localCheckpoint()
    val t = triple(after)
    // exactly one identifier survives (entity_merger_test.py:830-838)
    val ids = t.collect { case (s, p, o) if s == s"$B/ra/0605" && p == Vocab.HasIdentifier => o }
    assert(ids.size == 1 && (ids(s"$B/id/0605") || ids(s"$B/id/0606")))
    // the orphaned duplicate id entity is purged with its triples
    val gone = if (ids(s"$B/id/0605")) s"$B/id/0606" else s"$B/id/0605"
    assert(!t.exists(_._1 == gone))
    // merged's literals replace the survivor's (test:840-852 + 903-916)
    assert(t((s"$B/ra/0605", Vocab.FoafName, "Johnny Smith")))
    assert(t((s"$B/ra/0605", Vocab.FoafGivenName, "Johnny")))
    assert(t((s"$B/ra/0605", Vocab.FoafFamilyName, "Smith")))
    assert(!t.exists(x => x._1 == s"$B/ra/0605" && x._2 == Vocab.FoafGivenName && x._3 == "John"))
  }

  // ---- M12/M14/E4: BR merge (prefer-self + container adoption) ----------

  test("M12 merge_bibliographic_resources: prefer-self, partOf adopted") {
    val world = triples(Seq(
      // survivor br/0603: title/subtitle/date, issue container, re, doi
      (s"$B/br/0603", Vocab.RdfType, Vocab.Expression),
      (s"$B/br/0603", Vocab.Title, "Data Integration Methods"),
      (s"$B/br/0603", Vocab.PublicationDate, "2023"),
      (s"$B/br/0603", Vocab.PartOf, s"$B/br/0605"),
      (s"$B/br/0603", Vocab.Embodiment, s"$B/re/0603"),
      (s"$B/br/0603", Vocab.HasIdentifier, s"$B/id/0603"),
      (s"$B/br/0605", Vocab.RdfType, Vocab.Fabio + "JournalIssue"),
      (s"$B/br/0605", Vocab.HasSequenceIdentifier, "4"),
      (s"$B/re/0603", Vocab.StartingPage, "1"),
      (s"$B/re/0603", Vocab.EndingPage, "20"),
      // merged br/0604: same title/date, volume container, its own re, isbn
      (s"$B/br/0604", Vocab.RdfType, Vocab.Expression),
      (s"$B/br/0604", Vocab.Title, "Data Integration Methods"),
      (s"$B/br/0604", Vocab.PublicationDate, "2023"),
      (s"$B/br/0604", Vocab.PartOf, s"$B/br/0606"),
      (s"$B/br/0604", Vocab.Embodiment, s"$B/re/0604"),
      (s"$B/br/0604", Vocab.HasIdentifier, s"$B/id/0604"),
      (s"$B/br/0606", Vocab.RdfType, Vocab.Fabio + "JournalVolume"),
      (s"$B/br/0606", Vocab.HasSequenceIdentifier, "15"),
      (s"$B/re/0604", Vocab.StartingPage, "100"),
      (s"$B/re/0604", Vocab.EndingPage, "120"),
      // roles: one author each
      (s"$B/br/0603", Vocab.IsDocumentContextFor, s"$B/ar/0605"),
      (s"$B/ar/0605", Vocab.WithRole, Vocab.Pro + "author"),
      (s"$B/ar/0605", Vocab.IsHeldBy, s"$B/ra/0605"),
      (s"$B/br/0604", Vocab.IsDocumentContextFor, s"$B/ar/0606"),
      (s"$B/ar/0606", Vocab.WithRole, Vocab.Pro + "author"),
      (s"$B/ar/0606", Vocab.IsHeldBy, s"$B/ra/0606")) ++
      id("id/0603", "doi", "10.1000/example.doi.1") ++
      id("id/0604", "isbn", "978-0-123456-47-2") ++
      ra("ra/0605", "Jane Doe") ++ ra("ra/0606", "John Smith"))
    val after = Tools.applyMerges(world,
      pairsDf((s"$B/br/0603", s"$B/br/0604", 1L))).localCheckpoint()
    val t = triple(after)
    // survivor keeps ITS title/date (prefer_self — editor.py:266-276)
    assert(t((s"$B/br/0603", Vocab.Title, "Data Integration Methods")))
    assert(t((s"$B/br/0603", Vocab.PublicationDate, "2023")))
    // partOf: the MERGED side's volume replaces the survivor's issue
    // (entity_merger_test.py:1124-1130)
    val parts = t.collect { case (s, p, o) if s == s"$B/br/0603" && p == Vocab.PartOf => o }
    assert(parts == Set(s"$B/br/0606"))
    // embodiment stays the survivor's (test:1132-1140)
    val embs = t.collect { case (s, p, o) if s == s"$B/br/0603" && p == Vocab.Embodiment => o }
    assert(embs == Set(s"$B/re/0603"))
    // both res still exist with their pages (test:1175-1199)
    assert(t((s"$B/re/0604", Vocab.StartingPage, "100")))
    assert(t((s"$B/re/0603", Vocab.EndingPage, "20")))
    // ids union (test:1142-1149)
    val ids = t.collect { case (s, p, o) if s == s"$B/br/0603" && p == Vocab.HasIdentifier => o }
    assert(ids == Set(s"$B/id/0603", s"$B/id/0604"))
    // containers keep their metadata (test:1151-1173)
    assert(t((s"$B/br/0605", Vocab.HasSequenceIdentifier, "4")))
    assert(t((s"$B/br/0606", Vocab.HasSequenceIdentifier, "15")))
    // merged's contributor moved, roles intact (test:1201-1214)
    assert(t((s"$B/br/0603", Vocab.IsDocumentContextFor, s"$B/ar/0606")))
    assert(t((s"$B/ar/0605", Vocab.IsHeldBy, s"$B/ra/0605")))
    // merged BR gone
    assert(!t.exists(_._1 == s"$B/br/0604"))
  }

  test("M14 BR merge unions multiple identifiers without content dupes") {
    val world = triples(Seq(
      (s"$B/br/0701", Vocab.RdfType, Vocab.Expression),
      (s"$B/br/0701", Vocab.Title, "T"),
      (s"$B/br/0701", Vocab.HasIdentifier, s"$B/id/0701"),
      (s"$B/br/0702", Vocab.RdfType, Vocab.Expression),
      (s"$B/br/0702", Vocab.Title, "T"),
      (s"$B/br/0702", Vocab.HasIdentifier, s"$B/id/0702"),
      (s"$B/br/0702", Vocab.HasIdentifier, s"$B/id/0703")) ++
      id("id/0701", "doi", "10.1/a") ++
      id("id/0702", "isbn", "978-1") ++
      id("id/0703", "doi", "10.1/a")) // duplicates the survivor's doi
    val after = Tools.applyMerges(world,
      pairsDf((s"$B/br/0701", s"$B/br/0702", 1L)))
    val t = triple(after)
    val ids = t.collect { case (s, p, o) if s == s"$B/br/0701" && p == Vocab.HasIdentifier => o }
    assert(ids == Set(s"$B/id/0701", s"$B/id/0702"))
    assert(!t.exists(_._1 == s"$B/id/0703")) // orphaned duplicate purged
  }

  // ---- E1–E3 for real: editor operations over a seeded world -----------

  private def freshProvFor(entities: Seq[String]): DataFrame = {
    import spark.implicits._
    entities.toDF("entity")
      .select(col("entity"), lit(1L).as("snapshot_n"), lit("t0").as("generated_at"),
        lit(null).cast("string").as("invalidated_at"),
        array().cast("array<string>").as("derived_from"),
        lit("Entity created").as("description"), lit("a").as("attributed_to"))
  }

  test("E1 update_property rewires hasNext (functional replacement)") {
    import spark.implicits._
    val before = triples(Seq(
      (s"$B/ar/0601", Vocab.HasNext, s"$B/ar/0602"),
      (s"$B/ar/0602", Vocab.HasNext, s"$B/ar/0603"),
      (s"$B/ar/0603", Vocab.HasNext, s"$B/ar/0604"),
      (s"$B/ar/0604", Vocab.HasNext, s"$B/ar/0605")))
    val updates = Seq(
      (s"$B/ar/0601", Vocab.HasNext, s"$B/ar/0604"),
      (s"$B/ar/0604", Vocab.HasNext, s"$B/ar/0603"),
      (s"$B/ar/0603", Vocab.HasNext, s"$B/ar/0602"),
      (s"$B/ar/0602", Vocab.HasNext, s"$B/ar/0605"))
      .toDF("s", "p", "o").withColumn("o_datatype", lit(null).cast("string"))
    val r = Editor.updateProperty(before,
      freshProvFor(Seq("ar/0601", "ar/0602", "ar/0603", "ar/0604")),
      updates, "2026-08-15T00:00:00Z")
    val t = triple(r.triples)
    assert(t == Set(
      (s"$B/ar/0601", Vocab.HasNext, s"$B/ar/0604"),
      (s"$B/ar/0604", Vocab.HasNext, s"$B/ar/0603"),
      (s"$B/ar/0603", Vocab.HasNext, s"$B/ar/0602"),
      (s"$B/ar/0602", Vocab.HasNext, s"$B/ar/0605")))
  }

  test("E2 delete_property removes the title and renders DELETE DATA") {
    import spark.implicits._
    val title = "A Review Of Hemolytic Uremic Syndrome In Patients Treated With Gemcitabine Therapy"
    val before = triples(Seq(
      (s"$B/br/0601", Vocab.RdfType, Vocab.Expression),
      (s"$B/br/0601", Vocab.Title, title)))
    val dels = Seq((s"$B/br/0601", Vocab.Title))
      .toDF("s", "p").withColumn("o", lit(null).cast("string"))
    val r = Editor.deleteProperty(before,
      freshProvFor(Seq("br/0601")), dels, "2026-08-15T00:00:00Z")
    assert(!triple(r.triples).exists(_._2 == Vocab.Title))
    // payload content parity (editor_test.py:294-296; engine renders
    // per-triple DELETE DATA without the GRAPH wrapper — content asserted)
    val q = r.updateQueries.filter(col("s") === s"$B/br/0601")
      .select("update_query").collect().head.getString(0)
    assert(q.contains("DELETE DATA"))
    assert(q.contains(s"<$B/br/0601> <${Vocab.Title}> " +
      "\"" + title + "\"^^<" + Vocab.XsdString + ">"))
    // SCD2: br/0601 got a "modified" snapshot 2 derived from snapshot 1
    val snap2 = r.prov.filter(col("entity") === "br/0601" && col("snapshot_n") === 2L)
      .collect()
    assert(snap2.length == 1 && snap2.head.getAs[String]("description") == "Entity modified")
  }

  test("E3 delete_entity purges the id and cleans the owner's link") {
    import spark.implicits._
    val value = "10.1002/(sici)1097-0142(19990501)85:9<2023::aid-cncr21>3.0.co;2-2"
    val before = triples(Seq(
      (s"$B/br/0601", Vocab.RdfType, Vocab.Expression),
      (s"$B/br/0601", Vocab.HasIdentifier, s"$B/id/0601")) ++
      id("id/0601", "doi", value))
    val ents = Seq(s"$B/id/0601").toDF("s")
    val r = Editor.deleteEntities(before,
      freshProvFor(Seq("br/0601", "id/0601")), ents, "2026-08-15T00:00:00Z")
    val t = triple(r.triples)
    assert(!t.exists(_._1 == s"$B/id/0601"))
    assert(!t.exists(_._3 == s"$B/id/0601"))
    // deletion payload carries all three id triples (editor_test.py:335-345)
    val delTriples = triple(r.delta.deletions).filter(_._1 == s"$B/id/0601")
    assert(delTriples == Set(
      (s"$B/id/0601", Vocab.RdfType, Vocab.IdentifierClass),
      (s"$B/id/0601", Vocab.UsesIdentifierScheme, Vocab.Datacite + "doi"),
      (s"$B/id/0601", Vocab.HasLiteralValue, value)))
    // owner's modified snapshot payload carries the dropped link (test:349-363)
    assert(triple(r.delta.deletions)((s"$B/br/0601", Vocab.HasIdentifier, s"$B/id/0601")))
    // id got a closed "deleted" snapshot, owner an open "modified" one
    val idSnap = r.prov.filter(col("entity") === "id/0601" && col("snapshot_n") === 2L).collect().head
    assert(idSnap.getAs[String]("description") == "Entity deleted")
    assert(idSnap.getAs[String]("invalidated_at") != null)
    val brSnap = r.prov.filter(col("entity") === "br/0601" && col("snapshot_n") === 2L).collect().head
    assert(brSnap.getAs[String]("description") == "Entity modified")
    assert(brSnap.getAs[String]("invalidated_at") == null)
  }
}
