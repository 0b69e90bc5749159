package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.Curator
import graft.rdf.{ChainAnomalies, Checkers, Fixers, Provenance, TriplesEmitter, Vocab}

/** Detect -> fix compositions (the reference's `run/patches` tools): each fixer
  * runs against a deliberately corrupted curated store; the matching
  * checker must be red before and green after.
  */
class FixersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val T0 = "2026-08-12T00:00:00Z"
  val T1 = "2026-08-13T00:00:00Z"

  lazy val batch = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv")).checkpointed
  lazy val rows = batch.rows.localCheckpoint()
  lazy val triples = TriplesEmitter.emit(batch).localCheckpoint()
  lazy val prov = Provenance.freshSnapshots(batch, T0).localCheckpoint()

  def fired(report: org.apache.spark.sql.DataFrame): Set[String] = {
    import spark.implicits._
    report.select($"check").distinct().as[String].collect().toSet
  }

  test("fixLiteralDatatypes repairs bad date types and untyped literals") {
    import spark.implicits._
    val br = Vocab.uri("br/0601")
    // a date stored as xsd:string and an untyped (IRI-slot) literal
    val corrupted = triples
      .filter(!($"s" === br && $"p" === Vocab.PublicationDate))
      .unionByName(Seq(
        (br, Vocab.PublicationDate, "2020-02-15", Vocab.XsdString),
        (br, Vocab.Title + "Alt", "some untyped note", null.asInstanceOf[String]))
        .toDF("s", "p", "o", "o_datatype"))
      .localCheckpoint()
    assert(fired(Checkers.invalidDatatypes(corrupted)) == Set("invalid_iri_object"))
    val r = Fixers.fixLiteralDatatypes(corrupted, prov, T1)
    assert(Checkers.invalidDatatypes(r.triples).isEmpty)
    val fixedDate = r.triples.filter($"s" === br && $"p" === Vocab.PublicationDate).head()
    assert(fixedDate.getString(2) == "2020-02-15" &&
      fixedDate.getString(3) == Vocab.XsdDate)
    val fixedNote = r.triples.filter($"p" === Vocab.Title + "Alt").head()
    assert(fixedNote.getString(3) == Vocab.XsdString)
    // year-shaped value gets gYear
    val yearOnly = Seq((br, Vocab.PublicationDate, "2019", Vocab.XsdString))
      .toDF("s", "p", "o", "o_datatype")
    val r2 = Fixers.fixLiteralDatatypes(yearOnly, prov, T1)
    assert(r2.triples.head().getString(3) == Vocab.XsdGYear)
    // provenance: the touched entity got a new open snapshot
    assert(r.prov.filter($"entity" === "br/0601" && $"invalidated_at".isNull &&
      $"description" === "Entity modified").count() == 1)
  }

  test("fixOmidMismatches merges the actual owner into the CSV's entity") {
    import spark.implicits._
    // detach one id from its br and re-attach it to a different br: the
    // CSV now claims an owner the store disagrees with
    val link = triples.filter($"p" === Vocab.HasIdentifier && $"s".contains("/br/"))
      .orderBy($"s", $"o").limit(1).collect().head
    val victim = link.getString(0)
    val idUri = link.getString(2)
    // the bogus owner is an id-less BR (a genuine-duplicate scenario: the
    // merge must not orphan any OTHER id's CSV expectation)
    val brsWithIds = triples.filter($"p" === Vocab.HasIdentifier && $"s".contains("/br/"))
      .select($"s").distinct()
    val otherBr = triples.filter($"p" === Vocab.RdfType && $"s".contains("/br/"))
      .join(brsWithIds, Seq("s"), "left_anti")
      .orderBy($"s").limit(1).collect().head.getString(0)
    val corrupted = triples
      .filter(!($"s" === victim && $"p" === Vocab.HasIdentifier && $"o" === idUri))
      .unionByName(Seq((otherBr, Vocab.HasIdentifier, idUri, null.asInstanceOf[String]))
        .toDF("s", "p", "o", "o_datatype"))
      .localCheckpoint()
    assert(fired(Checkers.omidMismatch(rows, corrupted)).contains("omid_mismatch"))
    val r = Fixers.fixOmidMismatches(rows, corrupted, prov, T1)
    assert(Checkers.omidMismatch(rows, r.triples).isEmpty)
    // the bogus owner was merged away into the CSV's entity
    val pairs = r.mergePairs.collect().map(x => (x.getString(0), x.getString(1)))
    assert(pairs.exists { case (surv, merged) => surv == victim && merged == otherBr })
    assert(r.triples.filter($"s" === otherBr).count() == 0)
    // and the merge batch passes the merge audit
    val audit = Checkers.mergeAudit(r.mergePairs, r.triples, r.prov)
    assert(audit.isEmpty, audit.collect().take(10).mkString("\n"))
  }

  test("fixDuplicatePartOf keeps one container when venues agree, defers otherwise") {
    import spark.implicits._
    // find a br whose partOf target itself has a parent (article -> issue
    // -> volume/venue chain): adding the grandparent as a second partOf is
    // a same-venue duplicate
    val po = triples.filter($"p" === Vocab.PartOf).select($"s", $"o").localCheckpoint()
    val chained = po.as("a").join(po.as("b"), $"a.o" === $"b.s")
      .select($"a.s".as("br"), $"a.o".as("parent"), $"b.o".as("grandparent"))
      .orderBy($"br").limit(1).collect().head
    val (br, parent, grandparent) =
      (chained.getString(0), chained.getString(1), chained.getString(2))
    // and a manual-review case: a second partOf to an unrelated root
    val other = po.filter($"s" =!= br && $"o" =!= parent && $"o" =!= grandparent)
      .orderBy($"s").limit(1).collect().head
    val br2 = other.getString(0)
    val unrelated = triples
      .filter($"p" === Vocab.RdfType && $"s".contains("/br/") &&
        $"s" =!= other.getString(1) && !$"s".isin(br, br2))
      .orderBy($"s").limit(1).collect().head.getString(0)
    val corrupted = triples.unionByName(Seq(
      (br, Vocab.PartOf, grandparent, null.asInstanceOf[String]),
      (br2, Vocab.PartOf, unrelated, null.asInstanceOf[String]))
      .toDF("s", "p", "o", "o_datatype"))
      .localCheckpoint()
    val r = Fixers.fixDuplicatePartOf(corrupted, prov, T1)
    val after = r.edit.triples.localCheckpoint()
    // same-venue case: exactly one partOf again, the lexicographically first
    val kept = after.filter($"s" === br && $"p" === Vocab.PartOf)
      .select($"o").as[String].collect()
    assert(kept.toSeq == Seq(Seq(parent, grandparent).min))
    // manual case untouched and reported
    assert(after.filter($"s" === br2 && $"p" === Vocab.PartOf).count() == 2)
    val manual = r.manualReview.select($"br").as[String].collect()
    assert(manual.toSeq == Seq(br2))
  }

  test("fixMisplacedEditorArs moves editors to the container and dedups by ra/id/name") {
    import spark.implicits._
    val u = Vocab.uri _
    val nil = null.asInstanceOf[String]
    val str = Vocab.XsdString
    val book = "http://purl.org/spar/fabio/Book"
    val chapter = "http://purl.org/spar/fabio/BookChapter"
    val orcidScheme = "http://purl.org/spar/datacite/orcid"
    // container book with one existing editor (ra/0611, orcid O1, "smith,
    // john"); two chapters carrying four misplaced editor ARs: one genuinely
    // new (move), one with the container's RA (skip_duplicate_ra), one with
    // a different RA sharing orcid O1 (skip_duplicate_id), one sharing only
    // the normalized name (skip_duplicate_name)
    val t = Seq(
      (u("br/06100"), Vocab.RdfType, book, nil),
      (u("br/06101"), Vocab.RdfType, chapter, nil),
      (u("br/06101"), Vocab.PartOf, u("br/06100"), nil),
      (u("br/06102"), Vocab.RdfType, chapter, nil),
      (u("br/06102"), Vocab.PartOf, u("br/06100"), nil),
      // container's own editor
      (u("br/06100"), Vocab.IsDocumentContextFor, u("ar/06100"), nil),
      (u("ar/06100"), Vocab.RdfType, Vocab.RoleInTime, nil),
      (u("ar/06100"), Vocab.WithRole, Vocab.Pro + "editor", nil),
      (u("ar/06100"), Vocab.IsHeldBy, u("ra/0611"), nil),
      // chapter 1: move + duplicate-RA, chained to exercise hasNext removal
      (u("br/06101"), Vocab.IsDocumentContextFor, u("ar/06111"), nil),
      (u("br/06101"), Vocab.IsDocumentContextFor, u("ar/06112"), nil),
      (u("ar/06111"), Vocab.RdfType, Vocab.RoleInTime, nil),
      (u("ar/06111"), Vocab.WithRole, Vocab.Pro + "editor", nil),
      (u("ar/06111"), Vocab.IsHeldBy, u("ra/0612"), nil),
      (u("ar/06111"), Vocab.HasNext, u("ar/06112"), nil),
      (u("ar/06112"), Vocab.RdfType, Vocab.RoleInTime, nil),
      (u("ar/06112"), Vocab.WithRole, Vocab.Pro + "editor", nil),
      (u("ar/06112"), Vocab.IsHeldBy, u("ra/0611"), nil),
      // chapter 2: duplicate-id + duplicate-name
      (u("br/06102"), Vocab.IsDocumentContextFor, u("ar/06121"), nil),
      (u("br/06102"), Vocab.IsDocumentContextFor, u("ar/06122"), nil),
      (u("ar/06121"), Vocab.RdfType, Vocab.RoleInTime, nil),
      (u("ar/06121"), Vocab.WithRole, Vocab.Pro + "editor", nil),
      (u("ar/06121"), Vocab.IsHeldBy, u("ra/0614"), nil),
      (u("ar/06122"), Vocab.RdfType, Vocab.RoleInTime, nil),
      (u("ar/06122"), Vocab.WithRole, Vocab.Pro + "editor", nil),
      (u("ar/06122"), Vocab.IsHeldBy, u("ra/0615"), nil),
      // responsible agents
      (u("ra/0611"), Vocab.RdfType, Vocab.FoafAgent, nil),
      (u("ra/0611"), Vocab.FoafFamilyName, "Smith", str),
      (u("ra/0611"), Vocab.FoafGivenName, "John", str),
      (u("ra/0611"), Vocab.HasIdentifier, u("id/0611"), nil),
      (u("ra/0612"), Vocab.RdfType, Vocab.FoafAgent, nil),
      (u("ra/0612"), Vocab.FoafFamilyName, "Doe", str),
      (u("ra/0612"), Vocab.FoafGivenName, "Jane", str),
      (u("ra/0612"), Vocab.HasIdentifier, u("id/0612"), nil),
      (u("ra/0614"), Vocab.RdfType, Vocab.FoafAgent, nil),
      (u("ra/0614"), Vocab.FoafFamilyName, "Schmidt", str),
      (u("ra/0614"), Vocab.HasIdentifier, u("id/0614"), nil),
      (u("ra/0615"), Vocab.RdfType, Vocab.FoafAgent, nil),
      (u("ra/0615"), Vocab.FoafFamilyName, "Smith", str),
      (u("ra/0615"), Vocab.FoafGivenName, "John", str),
      // identifier entities: id/0611 and id/0614 carry the SAME orcid
      (u("id/0611"), Vocab.RdfType, Vocab.IdentifierClass, nil),
      (u("id/0611"), Vocab.UsesIdentifierScheme, orcidScheme, nil),
      (u("id/0611"), Vocab.HasLiteralValue, "0000-0001-5000-0007", str),
      (u("id/0612"), Vocab.RdfType, Vocab.IdentifierClass, nil),
      (u("id/0612"), Vocab.UsesIdentifierScheme, orcidScheme, nil),
      (u("id/0612"), Vocab.HasLiteralValue, "0000-0002-1825-0097", str),
      (u("id/0614"), Vocab.RdfType, Vocab.IdentifierClass, nil),
      (u("id/0614"), Vocab.UsesIdentifierScheme, orcidScheme, nil),
      (u("id/0614"), Vocab.HasLiteralValue, "0000-0001-5000-0007", str),
    ).toDF("s", "p", "o", "o_datatype").localCheckpoint()
    val prefix = Vocab.BaseIri + "/"
    val seedProv = t
      .select(expr(s"substring(s, ${prefix.length + 1})").as("entity")).distinct()
      .select($"entity", lit(1L).as("snapshot_n"), lit(T0).as("generated_at"),
        lit(nil).as("invalidated_at"),
        array().cast("array<string>").as("derived_from"),
        lit("Entity created").as("description"),
        lit("https://w3id.org/oc/meta/prov/pa/1").as("attributed_to"))
      .localCheckpoint()
    val emptyRows = Seq.empty[(String, String, String, String, String)]
      .toDF("id", "author", "editor", "publisher", "venue")

    assert(fired(Checkers.misplacedEditorArs(t)) == Set("misplaced_editor_ar"))
    assert(Checkers.misplacedEditorArs(t).count() == 4)
    val r = Fixers.fixMisplacedEditorArs(t, seedProv, T1)
    val after = r.triples.localCheckpoint()

    // classification matches the reference's action set
    val actions = r.cases.select($"ar", $"action", $"match_reason")
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(actions == Set(
      (u("ar/06111"), "move", null),
      (u("ar/06112"), "skip_duplicate_ra", u("ra/0611")),
      (u("ar/06121"), "skip_duplicate_id", "orcid:0000-0001-5000-0007"),
      (u("ar/06122"), "skip_duplicate_name", "smith, john")))
    // moved AR now hangs on the container, appended to the existing chain
    val containerArsAfter = after
      .filter($"s" === u("br/06100") && $"p" === Vocab.IsDocumentContextFor)
      .select($"o").as[String].collect().toSet
    assert(containerArsAfter == Set(u("ar/06100"), u("ar/06111")))
    assert(after.filter($"s" === u("ar/06100") && $"p" === Vocab.HasNext)
      .select($"o").as[String].collect().toSeq == Seq(u("ar/06111")))
    // contents carry no ARs any more; duplicate ARs are purged entirely
    assert(after.filter($"p" === Vocab.IsDocumentContextFor &&
      $"s".isin(u("br/06101"), u("br/06102"))).count() == 0)
    assert(after.filter($"s".isin(u("ar/06112"), u("ar/06121"), u("ar/06122")))
      .count() == 0)
    // the whole store passes the full audit afterwards
    assert(Checkers.misplacedEditorArs(after).isEmpty)
    val report = Checkers.checkAll(emptyRows, after, r.prov)
    assert(report.isEmpty, report.collect().take(10).mkString("\n"))
    // purged ARs got closed deletion snapshots, moved entities open ones
    assert(r.prov.filter($"entity" === "ar/06112" &&
      $"description" === "Entity deleted" && $"invalidated_at".isNotNull).count() == 1)
    assert(r.prov.filter($"entity" === "br/06100" && $"invalidated_at".isNull &&
      $"description" === "Entity modified").count() == 1)
  }

  test("fixCorruptedDois merges SICI-truncated duplicates, defers low scores") {
    import spark.implicits._
    val u = Vocab.uri _
    val nil = null.asInstanceOf[String]
    val str = Vocab.XsdString
    val article = "http://purl.org/spar/fabio/JournalArticle"
    val doiScheme = Vocab.Datacite + "doi"
    val trunc1 = "10.1175/1520-0469(1992)049<0608:tiotws>2.0.co;2-"
    val trunc2 = "10.1175/1520-0450(1995)034<0209:other>2.0.co;2-"
    def idEnt(id: String, value: String) = Seq(
      (u(id), Vocab.RdfType, Vocab.IdentifierClass, nil),
      (u(id), Vocab.UsesIdentifierScheme, doiScheme, nil),
      (u(id), Vocab.HasLiteralValue, value, str))
    def author(br: String, ar: String, ra: String, fam: String, giv: String) = Seq(
      (u(br), Vocab.IsDocumentContextFor, u(ar), nil),
      (u(ar), Vocab.WithRole, Vocab.Pro + "author", nil),
      (u(ar), Vocab.IsHeldBy, u(ra), nil),
      (u(ra), Vocab.FoafFamilyName, fam, str),
      (u(ra), Vocab.FoafGivenName, giv, str))
    // E = the CSV's entity (owns the corrected "#" DOI); D = the duplicate
    // holding the truncated DOI, near-identical metadata -> merge
    val t = (Seq(
      (u("br/06201"), Vocab.RdfType, Vocab.Expression, nil),
      (u("br/06202"), Vocab.RdfType, Vocab.Expression, nil),
      (u("br/06203"), Vocab.RdfType, Vocab.Expression, nil),
      (u("br/06205"), Vocab.RdfType, Vocab.Expression, nil),
      (u("br/06201"), Vocab.RdfType, article, nil),
      (u("br/06201"), Vocab.Title, "Tropical influences on winter storms", str),
      (u("br/06201"), Vocab.PublicationDate, "1992-03", Vocab.XsdGYearMonth),
      (u("br/06201"), Vocab.Embodiment, u("re/06201"), nil),
      (u("re/06201"), Vocab.StartingPage, "608", str),
      (u("re/06201"), Vocab.EndingPage, "627", str),
      (u("br/06201"), Vocab.HasIdentifier, u("id/06201"), nil),
      (u("br/06202"), Vocab.RdfType, article, nil),
      (u("br/06202"), Vocab.Title, "Tropical influences on winter storms", str),
      (u("br/06202"), Vocab.PublicationDate, "1992-03", Vocab.XsdGYearMonth),
      (u("br/06202"), Vocab.Embodiment, u("re/06202"), nil),
      (u("re/06202"), Vocab.StartingPage, "608", str),
      (u("re/06202"), Vocab.EndingPage, "627", str),
      (u("br/06202"), Vocab.HasIdentifier, u("id/06202"), nil),
      // manual-review pair: unrelated metadata
      (u("br/06203"), Vocab.RdfType, article, nil),
      (u("br/06203"), Vocab.Title, "Completely unrelated treatise", str),
      (u("br/06203"), Vocab.HasIdentifier, u("id/06203"), nil),
      (u("br/06205"), Vocab.RdfType, article, nil),
      (u("br/06205"), Vocab.Title, "Another distinct monograph", str))
      ++ idEnt("id/06201", trunc1 + "#") ++ idEnt("id/06202", trunc1)
      ++ idEnt("id/06203", trunc2)
      ++ author("br/06201", "ar/06201", "ra/06201", "Hoskins", "Brian")
      ++ author("br/06202", "ar/06202", "ra/06202", "Hoskins", "B"))
      .toDF("s", "p", "o", "o_datatype").localCheckpoint()
    val prefix = Vocab.BaseIri + "/"
    val seedProv = t
      .select(expr(s"substring(s, ${prefix.length + 1})").as("entity")).distinct()
      .filter(!$"entity".startsWith("http"))
      .select($"entity", lit(1L).as("snapshot_n"), lit(T0).as("generated_at"),
        lit(nil).as("invalidated_at"),
        array().cast("array<string>").as("derived_from"),
        lit("Entity created").as("description"),
        lit("https://w3id.org/oc/meta/prov/pa/1").as("attributed_to"))
      .localCheckpoint()
    val csv = Seq(
      (s"doi:$trunc1 omid:br/06201", "", "", "", ""),
      (s"doi:$trunc2 omid:br/06205", "", "", "", ""))
      .toDF("id", "author", "editor", "publisher", "venue")

    val r = Fixers.fixCorruptedDois(csv, t, seedProv, T1)
    val cases = r.cases.collect().map(x => (x.getAs[String]("duplicate_entity"),
      x.getAs[String]("surviving_entity"), x.getAs[String]("action"),
      x.getAs[String]("correct_doi"))).toSet
    assert(cases == Set(
      ("br/06202", "br/06201", "merge", trunc1 + "#"),
      ("br/06203", "br/06205", "manual_review", trunc2 + "#")))
    val after = r.triples.localCheckpoint()
    // the duplicate was merged away; the truncated id entity is gone, the
    // corrected "#" DOI survives on the CSV's entity
    assert(after.filter($"s" === u("br/06202")).count() == 0)
    assert(after.filter($"s" === u("id/06202")).count() == 0)
    assert(after.filter($"s" === u("br/06201") && $"p" === Vocab.HasIdentifier &&
      $"o" === u("id/06201")).count() == 1)
    // only the manual-review value still mismatches — by design unfixed
    val remaining = Checkers.omidMismatch(csv, after)
      .select($"entity").as[String].collect().toSet
    assert(remaining == Set(s"doi:$trunc2"))
    // the manual-review pair is untouched
    assert(after.filter($"s" === u("br/06203") && $"p" === Vocab.HasIdentifier)
      .count() == 1)
    // and the merge batch passes the audit
    val audit = Checkers.mergeAudit(r.mergePairs, after, r.prov)
    assert(audit.isEmpty, audit.collect().take(10).mkString("\n"))
  }

  test("addMissingProvenance backfills creation snapshots for uncovered entities") {
    import spark.implicits._
    // drop all provenance for two entities, and leave a third with only a
    // later snapshot (no snapshot 1) to exercise the pre-invalidated arm
    val victims = prov.orderBy($"entity").limit(2).select($"entity")
      .as[String].collect().toSeq
    val weird = prov.orderBy($"entity".desc).limit(1).collect().head
    val corruptedProv = prov
      .filter(!$"entity".isin(victims: _*))
      .withColumn("snapshot_n",
        when($"entity" === weird.getString(0), lit(2L)).otherwise($"snapshot_n"))
      .localCheckpoint()
    val red = Checkers.missingProvenance(triples, corruptedProv)
    assert(fired(red) == Set("missing_provenance"))
    assert(red.count() == 3)
    val r = Fixers.addMissingProvenance(triples, corruptedProv, T1)
    assert(Checkers.missingProvenance(triples, r.prov).isEmpty)
    assert(r.created.count() == 3)
    // fully-uncovered entities got an OPEN creation snapshot stamped T1
    val back = r.prov.filter($"entity" === victims.head && $"snapshot_n" === 1L)
      .collect().head
    assert(back.getAs[String]("generated_at") == T1 &&
      back.getAs[String]("invalidated_at") == null &&
      back.getAs[String]("description") == "Entity created")
    // the has-later-snapshots entity got a PRE-INVALIDATED snapshot 1, so
    // the open-snapshot invariant still holds store-wide
    val wback = r.prov.filter($"entity" === weird.getString(0) && $"snapshot_n" === 1L)
      .collect().head
    assert(wback.getAs[String]("invalidated_at") != null)
    assert(Checkers.openSnapshotInvariant(r.prov).isEmpty)
    // idempotent: a second run backfills nothing
    assert(Fixers.addMissingProvenance(triples, r.prov, T1).created.isEmpty)
  }

  test("fixHasNextChains repairs corrupted chains and leaves healthy ones") {
    import spark.implicits._
    // corrupt one chain: drop a real edge, add a self-loop
    val edge = triples.filter($"p" === Vocab.HasNext).orderBy($"s").limit(1)
      .collect().head
    val (from, to) = (edge.getString(0), edge.getString(2))
    val corrupted = triples
      .filter(!($"s" === from && $"p" === Vocab.HasNext))
      .unionByName(Seq((from, Vocab.HasNext, from, null.asInstanceOf[String]))
        .toDF("s", "p", "o", "o_datatype"))
      .localCheckpoint()
    assert(!ChainAnomalies.anomalies(corrupted).isEmpty)
    val r = Fixers.fixHasNextChains(corrupted, prov, T1)
    assert(ChainAnomalies.anomalies(r.triples).isEmpty,
      ChainAnomalies.anomalies(r.triples).collect().take(5).mkString("\n"))
    // the healthy remainder of the store is untouched
    assert(r.triples.filter($"p" =!= Vocab.HasNext).count() ==
      corrupted.filter($"p" =!= Vocab.HasNext).count())
  }
}
