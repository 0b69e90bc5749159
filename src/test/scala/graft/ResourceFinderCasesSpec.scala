package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.{ArChains, StoreViews, Vocab}

/** Per-case adjudication of the reference's `test/ResourceFinder_test.py`
  * (40 tests — the largest reference suite without one until this spec;
  * same pattern as CuratorBranchesSpec / MetaProcessCasesSpec).
  *
  * The reference's ResourceFinder prefetches a subgraph over SPARQL and
  * answers lookups from a local in-memory graph; the engine's counterpart
  * is [[StoreViews]] (finder lookups as joins over the `triples` frame)
  * plus [[ArChains]] (the `retrieve_ra_sequence_from_br_meta` chain walk).
  * The fixture `real_data.nt` the first 14 tests load is NOT in the
  * reference checkout, so those cases are ported by seeding the exact
  * store their expected outputs determine (titles/ids/names/chains are
  * all pinned by the asserted tuples).
  *
  * Case map (RF# = file order):
  *  - RF1  retrieve_br_from_id                         -> PORTED (entityIds + entities)
  *  - RF2  retrieve_br_from_id_multiple_ids            -> PORTED
  *  - RF3  retrieve_br_from_meta                       -> PORTED
  *  - RF4  retrieve_br_from_meta_multiple_ids          -> PORTED
  *  - RF5  retrieve_metaid_from_id                     -> PORTED
  *  - RF6  retrieve_ra_from_meta                       -> PORTED (raNames)
  *  - RF7  retrieve_ra_from_meta_with_orcid            -> PORTED
  *  - RF8  retrieve_ra_from_meta_if_publisher          -> PORTED
  *  - RF9  retrieve_ra_from_id                         -> PORTED
  *  - RF10 retrieve_ra_from_id_if_publisher            -> PORTED
  *  - RF11 retrieve_ra_sequence_from_br_meta           -> PORTED (roles view order)
  *  - RF12 ..._over_10000_roles                        -> PORTED (10 001-AR chain, one pass)
  *  - RF13 retrieve_re_from_br_meta                    -> PORTED (pages view)
  *  - RF14 retrieve_br_info_from_meta                  -> PORTED (views composite)
  *  - RF15 ra_sequence_with_loop                       -> PORTED (resolveGroup)
  *  - RF16 ra_sequence_with_self_reference             -> PORTED
  *  - RF17 ra_sequence_with_invalid_next               -> PORTED
  *  - RF18 ra_sequence_with_missing_is_held_by         -> PORTED (Spark-level)
  *  - RF19 ra_sequence_with_multiple_next_values       -> PORTED (deterministic min-next
  *         divergence documented at ArChains; reference pins "no crash" only)
  *  - RF20 ra_sequence_no_ars_for_role                 -> PORTED
  *  - RF21 ra_sequence_single_ar_no_chain              -> PORTED
  *  - RF22 ra_sequence_two_independent_chains          -> PORTED (longest wins)
  *  - RF23 ra_sequence_equal_length_chains_tiebreaker  -> PORTED (lowest start wins)
  *  - RF24 ra_sequence_editor_role                     -> PORTED
  *  - RF25 ra_sequence_publisher_role                  -> PORTED
  *  - RF26 ra_sequence_three_node_loop                 -> PORTED
  *  - RF27 ra_sequence_duplicate_ra                    -> PORTED
  *  - RF28 retrieve_venue_from_local_graph             -> PORTED (partOf + entities views)
  *  - RF29 vvi_queries_only_search_correct_venues      -> PORTED (the engine's VVI
  *         subtree is an equi-join KEYED by venue_meta — StoreCurator.scala
  *         2f — so cross-venue leakage is structurally impossible; asserted
  *         over the test's own two-venue store)
  *  - RF30 construct_full_name only_given              -> PORTED (ArChains.finderFullName)
  *  - RF31 re only_starting_page                       -> PORTED ("p-p" rule)
  *  - RF32 re only_ending_page                         -> PORTED
  *  - RF33 get_subgraph_not_found                      -> PORTED (subject filter empty)
  *  - RF34 get_subgraph_reconstructs_uris              -> EXEMPT: RDFTerm/local-graph
  *         plumbing of the Python finder; the engine's triples frame IS
  *         (s, p, o, o_datatype) — no reconstruction step exists to test.
  *         Serialization round-trips are gated in SerializationSpec.
  *  - RF35 get_subgraph_reconstructs_typed_literals    -> EXEMPT (same; datatype
  *         column carries xsd types end-to-end, SerializationSpec)
  *  - RF36 get_subgraph_reconstructs_plain_literals    -> EXEMPT (same)
  *  - RF37 get_subgraph_accepts_string                 -> EXEMPT (Python API
  *         str-vs-URIRef coercion; no engine counterpart)
  *  - RF38 venue issue_directly_in_venue               -> PORTED
  *  - RF39 retrieve_publisher_two_levels_deep          -> PORTED (roles + partOf climb)
  *  - RF40 retrieve_ra_returns_all_ids                 -> PORTED
  */
class ResourceFinderCasesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val B = Vocab.BaseIri

  /** finder.add_triple semantics: object starting with "http" is an IRI
    * (o_datatype null), anything else an xsd:string literal. */
  private def triples(ts: Seq[(String, String, String)]): DataFrame = {
    val rows = ts.map { case (s, p, o) =>
      Row(s, p, o, if (o.startsWith("http")) null else Vocab.XsdString)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("s", StringType), StructField("p", StringType),
        StructField("o", StringType), StructField("o_datatype", StringType))))
  }

  private def id(meta: String, scheme: String, value: String): Seq[(String, String, String)] = Seq(
    (s"$B/$meta", Vocab.RdfType, Vocab.IdentifierClass),
    (s"$B/$meta", Vocab.UsesIdentifierScheme, Vocab.Datacite + scheme),
    (s"$B/$meta", Vocab.HasLiteralValue, value))

  private def person(meta: String, family: String, given: String): Seq[(String, String, String)] = Seq(
    (s"$B/$meta", Vocab.RdfType, Vocab.FoafAgent),
    (s"$B/$meta", Vocab.FoafFamilyName, family),
    (s"$B/$meta", Vocab.FoafGivenName, given))

  private def ar(br: String, arM: String, role: String, ra: String,
      next: Option[String] = None): Seq[(String, String, String)] =
    Seq(
      (s"$B/$br", Vocab.IsDocumentContextFor, s"$B/$arM"),
      (s"$B/$arM", Vocab.WithRole, Vocab.Pro + role),
      (s"$B/$arM", Vocab.IsHeldBy, s"$B/$ra")) ++
      next.map(n => (s"$B/$arM", Vocab.HasNext, s"$B/$n"))

  /** The store the expected outputs of RF1–RF14 determine (the reference's
    * lost `real_data.nt` slice those assertions exercise). */
  private lazy val realStore: StoreViews.Store = {
    val ts =
      // br/2373 — one doi, pages, issue 4 / volume 166 / venue br/4387
      Seq(
        (s"$B/br/2373", Vocab.RdfType, Vocab.Expression),
        (s"$B/br/2373", Vocab.RdfType, Vocab.Fabio + "JournalArticle"),
        (s"$B/br/2373", Vocab.Title,
          "Treatment Of Excessive Anticoagulation With Phytonadione (Vitamin K): A Meta-analysis"),
        (s"$B/br/2373", Vocab.PublicationDate, "2006-02-27"),
        (s"$B/br/2373", Vocab.HasIdentifier, s"$B/id/2239"),
        (s"$B/br/2373", Vocab.Embodiment, s"$B/re/2011"),
        (s"$B/re/2011", Vocab.StartingPage, "391"),
        (s"$B/re/2011", Vocab.EndingPage, "397"),
        (s"$B/br/2373", Vocab.PartOf, s"$B/br/4712"),
        (s"$B/br/4712", Vocab.RdfType, Vocab.Fabio + "JournalIssue"),
        (s"$B/br/4712", Vocab.HasSequenceIdentifier, "4"),
        (s"$B/br/4712", Vocab.PartOf, s"$B/br/4713"),
        (s"$B/br/4713", Vocab.RdfType, Vocab.Fabio + "JournalVolume"),
        (s"$B/br/4713", Vocab.HasSequenceIdentifier, "166"),
        (s"$B/br/4713", Vocab.PartOf, s"$B/br/4387"),
        (s"$B/br/4387", Vocab.RdfType, Vocab.Fabio + "Journal"),
        (s"$B/br/4387", Vocab.Title, "Archives Of Internal Medicine"),
        (s"$B/br/4387", Vocab.HasIdentifier, s"$B/id/4390")) ++
      id("id/2239", "doi", "10.1001/.391") ++
      id("id/4390", "issn", "0003-9926") ++
      // br/2374 — two dois
      Seq(
        (s"$B/br/2374", Vocab.RdfType, Vocab.Expression),
        (s"$B/br/2374", Vocab.Title,
          "Neutropenia In Human Immunodeficiency Virus Infection: Data From The Women's Interagency HIV Study"),
        (s"$B/br/2374", Vocab.HasIdentifier, s"$B/id/2240"),
        (s"$B/br/2374", Vocab.HasIdentifier, s"$B/id/5000")) ++
      id("id/2240", "doi", "10.1001/.405") ++
      id("id/5000", "doi", "10.1001/.406") ++
      // br/2380 — the 4-author hasNext chain
      Seq((s"$B/br/2380", Vocab.RdfType, Vocab.Expression)) ++
      ar("br/2380", "ar/5343", "author", "ra/3316", Some("ar/5344")) ++
      ar("br/2380", "ar/5344", "author", "ra/3317", Some("ar/5345")) ++
      ar("br/2380", "ar/5345", "author", "ra/3318", Some("ar/5346")) ++
      ar("br/2380", "ar/5346", "author", "ra/3319") ++
      person("ra/3316", "Hodge", "James G.") ++
      person("ra/3317", "Anderson", "Evan D.") ++
      person("ra/3318", "Kirsch", "Thomas D.") ++
      person("ra/3319", "Kelen", "Gabor D.") ++
      Seq((s"$B/ra/3319", Vocab.HasIdentifier, s"$B/id/4278")) ++
      id("id/4278", "orcid", "0000-0002-3236-8286") ++
      // ras for the name/id lookups
      person("ra/3308", "Dezee", "K. J.") ++
      person("ra/4940", "Alarcon", "Louis H.") ++
      person("ra/1000000", "Alarcon", "Louis H.") ++
      Seq(
        (s"$B/ra/4940", Vocab.HasIdentifier, s"$B/id/4475"),
        (s"$B/ra/1000000", Vocab.HasIdentifier, s"$B/id/4475"),
        (s"$B/ra/3309", Vocab.RdfType, Vocab.FoafAgent),
        (s"$B/ra/3309", Vocab.FoafName, "American Medical Association (ama)"),
        (s"$B/ra/3309", Vocab.HasIdentifier, s"$B/id/4274")) ++
      id("id/4475", "orcid", "0000-0001-6994-8412") ++
      id("id/4274", "crossref", "10")
    StoreViews.fromTriples(triples(ts), "060")
  }

  private def idsOf(owner: String): Set[(String, String)] =
    realStore.entityIds.filter(col("owner_meta") === owner)
      .select("id_meta", "literal").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  // ---- RF1–RF5: br lookups --------------------------------------------

  test("RF1 retrieve_br_from_id: doi resolves to br/2373 with title and id") {
    val rows = realStore.entityIds
      .filter(col("literal") === "doi:10.1001/.391" && col("owner_meta").startsWith("br/"))
      .collect()
    assert(rows.map(_.getAs[String]("owner_meta")).toSeq == Seq("br/2373"))
    assert(rows.head.getAs[String]("id_meta") == "id/2239")
    val title = realStore.entities.filter(col("meta") === "br/2373")
      .select("title").collect().head.getString(0)
    assert(title == "Treatment Of Excessive Anticoagulation With Phytonadione (Vitamin K): A Meta-analysis")
  }

  test("RF2 retrieve_br_from_id_multiple_ids: br/2374 carries both dois") {
    val owners = realStore.entityIds.filter(col("literal") === "doi:10.1001/.405")
      .select("owner_meta").collect().map(_.getString(0)).toSet
    assert(owners == Set("br/2374"))
    assert(idsOf("br/2374") ==
      Set(("id/2240", "doi:10.1001/.405"), ("id/5000", "doi:10.1001/.406")))
  }

  test("RF3/RF4 retrieve_br_from_meta: title + full id list by meta id") {
    val e = realStore.entities.filter(col("meta") === "br/2374").collect()
    assert(e.length == 1) // found == True
    assert(e.head.getAs[String]("title").startsWith("Neutropenia In Human"))
    assert(idsOf("br/2373") == Set(("id/2239", "doi:10.1001/.391")))
  }

  test("RF5 retrieve_metaid_from_id: id meta of doi:10.1001/.391 is id/2239") {
    val metas = realStore.entityIds.filter(col("literal") === "doi:10.1001/.391")
      .select("id_meta").distinct().collect().map(_.getString(0)).toSeq
    assert(metas == Seq("id/2239"))
  }

  // ---- RF6–RF10, RF40: ra lookups -------------------------------------

  private def nameOf(ra: String): String =
    realStore.raNames.filter(col("ra_meta") === ra)
      .select("name").collect().head.getString(0)

  test("RF6 retrieve_ra_from_meta: family+given compose 'Dezee, K. J.'") {
    assert(nameOf("ra/3308") == "Dezee, K. J.")
    assert(idsOf("ra/3308").isEmpty)
  }

  test("RF7 retrieve_ra_from_meta_with_orcid") {
    assert(nameOf("ra/4940") == "Alarcon, Louis H.")
    assert(idsOf("ra/4940") == Set(("id/4475", "orcid:0000-0001-6994-8412")))
  }

  test("RF8 retrieve_ra_from_meta_if_publisher: foaf:name org form") {
    assert(nameOf("ra/3309") == "American Medical Association (ama)")
    assert(idsOf("ra/3309") == Set(("id/4274", "crossref:10")))
  }

  test("RF9 retrieve_ra_from_id: one orcid owned by two ras") {
    val owners = realStore.entityIds
      .filter(col("literal") === "orcid:0000-0001-6994-8412")
      .select("owner_meta").collect().map(_.getString(0)).sorted.toSeq
    assert(owners == Seq("ra/1000000", "ra/4940"))
    assert(nameOf("ra/1000000") == "Alarcon, Louis H.")
  }

  test("RF10 retrieve_ra_from_id_if_publisher: crossref:10 -> ra/3309") {
    val owners = realStore.entityIds.filter(col("literal") === "crossref:10")
      .select("owner_meta").collect().map(_.getString(0)).toSeq
    assert(owners == Seq("ra/3309"))
  }

  test("RF40 retrieve_ra_returns_all_ids: every id of the matched ra") {
    val st = StoreViews.fromTriples(triples(
      person("ra/7001", "", "") ++ // name set below
      Seq(
        (s"$B/ra/7001", Vocab.FoafName, "Multi ID Author"),
        (s"$B/ra/7001", Vocab.HasIdentifier, s"$B/id/7001"),
        (s"$B/ra/7001", Vocab.HasIdentifier, s"$B/id/7002")) ++
      id("id/7001", "orcid", "0000-0001-1234-5678") ++
      id("id/7002", "viaf", "12345")), "060")
    val lits = st.entityIds.filter(col("owner_meta") === "ra/7001")
      .select("literal").collect().map(_.getString(0)).toSet
    assert(lits == Set("orcid:0000-0001-1234-5678", "viaf:12345"))
  }

  // ---- RF11–RF13: chains / pages over the seeded store ----------------

  test("RF11 retrieve_ra_sequence_from_br_meta: hasNext order, ras, ids") {
    val seq = realStore.roles
      .filter(col("br_meta") === "br/2380" && col("role") === "author")
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("ar_meta"), r.getAs[String]("ra_meta")))
    assert(seq.toSeq == Seq(
      (1L, "ar/5343", "ra/3316"), (2L, "ar/5344", "ra/3317"),
      (3L, "ar/5345", "ra/3318"), (4L, "ar/5346", "ra/3319")))
    assert(nameOf("ra/3316") == "Hodge, James G.")
    assert(idsOf("ra/3319") == Set(("id/4278", "orcid:0000-0002-3236-8286")))
  }

  test("RF12 over_10000_roles: a 10 001-AR chain resolves in one pass") {
    val n = 10001
    val ts = (1 to n).flatMap { i =>
      ar("br/8888", s"ar/${880000 + i}", "author", s"ra/${990000 + i}",
        if (i < n) Some(s"ar/${880000 + i + 1}") else None) ++
        Seq((s"$B/ra/${990000 + i}", Vocab.FoafName, s"Author $i"))
    }
    val st = StoreViews.fromTriples(triples(ts), "060")
    val rows = st.roles.filter(col("br_meta") === "br/8888").orderBy("pos")
      .select("pos", "ar_meta").collect()
    assert(rows.length == n)
    assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "ar/880001")
    assert(rows.last.getLong(0) == n.toLong && rows.last.getString(1) == s"ar/${880000 + n}")
    // positions are exactly 1..n (the former head-BFS capped at 100 hops)
    assert(rows.map(_.getLong(0)).toSeq == (1 to n).map(_.toLong))
  }

  test("RF13 retrieve_re_from_br_meta: (re/2011, '391-397')") {
    val p = realStore.pages.filter(col("br_meta") === "br/2373").collect()
    assert(p.map(r => (r.getAs[String]("re_meta"), r.getAs[String]("page"))).toSeq ==
      Seq(("re/2011", "391-397")))
  }

  test("RF14 retrieve_br_info_from_meta: date/type/page/issue/volume/venue") {
    val e = realStore.entities.filter(col("meta") === "br/2373").collect().head
    assert(e.getAs[String]("date") == "2006-02-27")
    assert(e.getAs[String]("type_label") == "journal article")
    // partOf climb: br -> issue(seq 4) -> volume(seq 166) -> venue
    val po = realStore.partOf.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(po("br/2373") == "br/4712" && po("br/4712") == "br/4713" &&
      po("br/4713") == "br/4387")
    def entity(m: String) = realStore.entities.filter(col("meta") === m).collect().head
    assert(entity("br/4712").getAs[String]("type_label") == "journal issue")
    assert(entity("br/4712").getAs[String]("seq_id") == "4")
    assert(entity("br/4713").getAs[String]("type_label") == "journal volume")
    assert(entity("br/4713").getAs[String]("seq_id") == "166")
    // venue cell, finder format: "Title [omid:... other-ids]"
    val venueIds = idsOf("br/4387").map(_._2)
    val cell = entity("br/4387").getAs[String]("title") +
      " [omid:br/4387 " + venueIds.toSeq.sorted.mkString(" ") + "]"
    assert(cell == "Archives Of Internal Medicine [omid:br/4387 issn:0003-9926]")
  }

  // ---- RF15–RF27: chain-walk semantics (resolveGroup is the walk) ------

  private def g(ms: (String, String, String)*): Seq[(String, String, Long)] =
    ArChains.resolveGroup(ms.map { case (a, r, n) =>
      (s"$B/ar/$a", s"$B/ra/$r", if (n == null) null else s"$B/ar/$n")
    }).map { case (a, r, p) =>
      (a.stripPrefix(s"$B/"), r.stripPrefix(s"$B/"), p)
    }

  test("RF15 loop with no head: start from the lowest AR number") {
    // 9992 -> 9991 -> 9992: chain must begin at ar/9991
    assert(g(("9992", "9981", "9991"), ("9991", "9982", "9992")) == Seq(
      ("ar/9991", "ra/9982", 1L), ("ar/9992", "ra/9981", 2L)))
  }

  test("RF16 self-referencing AR yields exactly itself") {
    assert(g(("9981", "9971", "9981")) == Seq(("ar/9981", "ra/9971", 1L)))
  }

  test("RF17 dangling next: equal-length chains tie-break to lowest start") {
    // 9971 -> 9999 (absent), 9972 isolated: both chains length 1 -> 9971
    assert(g(("9971", "9961", "9999"), ("9972", "9962", null)) ==
      Seq(("ar/9971", "ra/9961", 1L)))
  }

  test("RF18 missing isHeldBy: the AR is not a chain member (Spark-level)") {
    val ts = Seq(
      (s"$B/br/9996", Vocab.IsDocumentContextFor, s"$B/ar/9961"),
      (s"$B/ar/9961", Vocab.WithRole, Vocab.Pro + "author"))
    val st = StoreViews.fromTriples(triples(ts), "060")
    assert(st.roles.filter(col("br_meta") === "br/9996").isEmpty)
  }

  test("RF19 multiple next values resolve deterministically (min next)") {
    // reference pins only "no crash" (storage-order [0]); engine: min
    assert(g(("9951", "9941", "9952"), ("9951", "9941", "9953"),
      ("9952", "9942", null), ("9953", "9943", null)) == Seq(
      ("ar/9951", "ra/9941", 1L), ("ar/9952", "ra/9942", 2L)))
  }

  test("RF20 no ARs for the requested role: empty") {
    val st = StoreViews.fromTriples(
      triples(ar("br/9994", "ar/9941", "editor", "ra/9931")), "060")
    assert(st.roles.filter(col("br_meta") === "br/9994" &&
      col("role") === "author").isEmpty)
    assert(st.roles.filter(col("role") === "editor").count() == 1)
  }

  test("RF21 single AR without next") {
    assert(g(("9931", "9921", null)) == Seq(("ar/9931", "ra/9921", 1L)))
  }

  test("RF22 two independent chains: the longest wins, the rest drop") {
    assert(g(("9921", "9911", "9922"), ("9922", "9912", null),
      ("9923", "9913", null)) == Seq(
      ("ar/9921", "ra/9911", 1L), ("ar/9922", "ra/9912", 2L)))
  }

  test("RF23 equal-length chains: lowest-numbered start wins") {
    assert(g(("9935", "9925", "9936"), ("9936", "9926", null),
      ("9933", "9923", "9934"), ("9934", "9924", null)) == Seq(
      ("ar/9933", "ra/9923", 1L), ("ar/9934", "ra/9924", 2L)))
  }

  test("RF24/RF25 editor and publisher roles resolve like author") {
    val st = StoreViews.fromTriples(triples(
      ar("br/9991", "ar/9911", "editor", "ra/9901") ++
      ar("br/9990", "ar/9901", "publisher", "ra/9891")), "060")
    val e = st.roles.filter(col("br_meta") === "br/9991").collect()
    assert(e.length == 1 && e.head.getAs[String]("role") == "editor" &&
      e.head.getAs[String]("ar_meta") == "ar/9911")
    val p = st.roles.filter(col("br_meta") === "br/9990").collect()
    assert(p.length == 1 && p.head.getAs[String]("role") == "publisher")
  }

  test("RF26 three-node loop returns all three, from the lowest") {
    assert(g(("9891", "9881", "9892"), ("9892", "9882", "9893"),
      ("9893", "9883", "9891")).map(_._1) ==
      Seq("ar/9891", "ar/9892", "ar/9893"))
  }

  test("RF27 two ARs sharing one RA both stay in the chain") {
    assert(g(("9881", "9871", "9882"), ("9882", "9871", null)).map(_._2) ==
      Seq("ra/9871", "ra/9871"))
  }

  // ---- RF28/RF38: venue VVI structure; RF29: venue isolation -----------

  test("RF28 venue structure: volume 5 under venue, issue 3 under volume") {
    val st = StoreViews.fromTriples(triples(Seq(
      (s"$B/br/8002", Vocab.RdfType, Vocab.Fabio + "JournalVolume"),
      (s"$B/br/8002", Vocab.PartOf, s"$B/br/8001"),
      (s"$B/br/8002", Vocab.HasSequenceIdentifier, "5"),
      (s"$B/br/8003", Vocab.RdfType, Vocab.Fabio + "JournalIssue"),
      (s"$B/br/8003", Vocab.PartOf, s"$B/br/8002"),
      (s"$B/br/8003", Vocab.HasSequenceIdentifier, "3"))), "060")
    val vol = st.partOf.filter(col("parent_meta") === "br/8001")
      .join(st.entities.filter(col("type_label") === "journal volume" &&
        col("seq_id") === "5"), col("child_meta") === col("meta")).collect()
    assert(vol.map(_.getAs[String]("child_meta")).toSeq == Seq("br/8002"))
    val iss = st.partOf.filter(col("parent_meta") === "br/8002")
      .join(st.entities.filter(col("type_label") === "journal issue" &&
        col("seq_id") === "3"), col("child_meta") === col("meta")).collect()
    assert(iss.map(_.getAs[String]("child_meta")).toSeq == Seq("br/8003"))
  }

  test("RF38 issue directly in venue (no volume level)") {
    val st = StoreViews.fromTriples(triples(Seq(
      (s"$B/br/8103", Vocab.RdfType, Vocab.Fabio + "JournalIssue"),
      (s"$B/br/8103", Vocab.PartOf, s"$B/br/8101"),
      (s"$B/br/8103", Vocab.HasSequenceIdentifier, "5"))), "060")
    val iss = st.partOf.join(st.entities.filter(
      col("type_label") === "journal issue" && col("seq_id") === "5"),
      col("child_meta") === col("meta")).collect()
    assert(iss.map(r => (r.getAs[String]("parent_meta"), r.getAs[String]("child_meta"))).toSeq ==
      Seq(("br/8101", "br/8103")))
  }

  test("RF29 VVI lookups are keyed by venue: no cross-venue leakage") {
    // the reference test's two-venue store (ResourceFinder_test.py:607-635)
    val st = StoreViews.fromTriples(triples(Seq(
      (s"$B/br/9001", Vocab.RdfType, Vocab.Fabio + "Journal"),
      (s"$B/br/9001", Vocab.HasIdentifier, s"$B/id/9001"),
      (s"$B/br/9002", Vocab.RdfType, Vocab.Fabio + "JournalVolume"),
      (s"$B/br/9002", Vocab.PartOf, s"$B/br/9001"),
      (s"$B/br/9002", Vocab.HasSequenceIdentifier, "10"),
      (s"$B/br/9003", Vocab.RdfType, Vocab.Fabio + "Journal"),
      (s"$B/br/9003", Vocab.HasIdentifier, s"$B/id/9002"),
      (s"$B/br/9004", Vocab.RdfType, Vocab.Fabio + "JournalVolume"),
      (s"$B/br/9004", Vocab.PartOf, s"$B/br/9003"),
      (s"$B/br/9004", Vocab.HasSequenceIdentifier, "20")) ++
      id("id/9001", "issn", "1111-1111") ++
      id("id/9002", "issn", "2222-2222")), "060")
    // the engine's VVI subtree (StoreCurator 2f shape): equi-join keyed
    // by venue_meta — a (venue, vol_seq) pair addresses ONE subtree
    val subtree = st.partOf
      .join(st.entities.filter(col("type_label") === "journal volume")
        .select(col("meta").as("child_meta"), col("seq_id").as("vol_seq")), Seq("child_meta"))
      .select(col("parent_meta").as("venue_meta"), col("vol_seq"),
        col("child_meta").as("vvi_meta"))
    val venueByIssn = st.entityIds.select(col("owner_meta").as("venue_meta"), col("literal"))
    def lookup(issn: String, vol: String): Seq[String] =
      venueByIssn.filter(col("literal") === s"issn:$issn")
        .join(subtree, Seq("venue_meta"))
        .filter(col("vol_seq") === vol)
        .select("vvi_meta").collect().map(_.getString(0)).toSeq
    assert(lookup("1111-1111", "10") == Seq("br/9002"))
    assert(lookup("2222-2222", "20") == Seq("br/9004"))
    // the bug the reference test pins: volume 10 must NOT surface under
    // venue B (and vice versa)
    assert(lookup("2222-2222", "10").isEmpty)
    assert(lookup("1111-1111", "20").isEmpty)
  }

  // ---- RF30–RF33, RF39: the rest --------------------------------------

  test("RF30 _construct_full_name: only given name -> ', John'") {
    import spark.implicits._
    val out = Seq(("", "", "John")).toDF("n", "f", "g")
      .select(ArChains.finderFullName($"n", $"f", $"g")).collect().head.getString(0)
    assert(out == ", John")
  }

  test("RF31/RF32 single-page embodiments double into 'p-p'") {
    val st = StoreViews.fromTriples(triples(Seq(
      (s"$B/br/7101", Vocab.Embodiment, s"$B/re/7101"),
      (s"$B/re/7101", Vocab.StartingPage, "100"),
      (s"$B/br/7102", Vocab.Embodiment, s"$B/re/7102"),
      (s"$B/re/7102", Vocab.EndingPage, "200"))), "060")
    val pages = st.pages.collect()
      .map(r => r.getAs[String]("br_meta") -> r.getAs[String]("page")).toMap
    assert(pages("br/7101") == "100-100")
    assert(pages("br/7102") == "200-200")
  }

  test("RF33 subgraph of an unknown subject is empty") {
    val t = triples(Seq((s"$B/br/1", Vocab.RdfType, Vocab.Expression)))
    assert(t.filter(col("s") === s"$B/br/nonexistent").isEmpty)
  }

  test("RF39 publisher two container levels up (br -> issue -> volume)") {
    val st = StoreViews.fromTriples(triples(Seq(
      (s"$B/br/7201", Vocab.PartOf, s"$B/br/7202"),
      (s"$B/br/7202", Vocab.PartOf, s"$B/br/7203"),
      (s"$B/ra/7291", Vocab.FoafName, "Deep Publisher")) ++
      ar("br/7203", "ar/7281", "publisher", "ra/7291")), "060")
    // finder.py:560-574 climbs partOf twice collecting publisher ARs
    val up1 = st.partOf.select(col("child_meta").as("br"), col("parent_meta").as("c"))
    val up2 = up1.join(
      st.partOf.select(col("parent_meta").as("c2"), col("child_meta").as("c")), Seq("c"))
      .select(col("br"), col("c2").as("c"))
    val containers = st.roles.select(col("br_meta").as("c"), col("role"), col("ra_meta"))
    val pubs = up1.unionByName(up2).join(containers, Seq("c"))
      .filter(col("role") === "publisher" && col("br") === "br/7201")
      .join(st.raNames.withColumnRenamed("ra_meta", "ra_meta2"),
        col("ra_meta") === col("ra_meta2"))
      .select("name").collect().map(_.getString(0)).toSeq
    assert(pubs == Seq("Deep Publisher"))
  }
}
