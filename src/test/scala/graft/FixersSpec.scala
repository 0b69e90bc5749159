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
