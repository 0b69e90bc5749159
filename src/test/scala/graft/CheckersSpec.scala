package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.Curator
import graft.rdf.{Checkers, Provenance, TriplesEmitter, Vocab}

/** R6 — verification-suite specs (reference `run/meta/check_results.py`):
  * green on a curated batch, red on each injected violation class.
  */
class CheckersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val batch = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv")).checkpointed
  lazy val rows = batch.rows.localCheckpoint()
  lazy val triples = TriplesEmitter.emit(batch).localCheckpoint()
  lazy val prov = Provenance.freshSnapshots(batch, "2026-08-12T00:00:00Z").localCheckpoint()

  def checksFired(report: org.apache.spark.sql.DataFrame): Set[String] = {
    import spark.implicits._
    report.select($"check").distinct().as[String].collect().toSet
  }

  test("curated output passes every check") {
    val report = Checkers.checkAll(rows, triples, prov)
    assert(report.isEmpty, report.collect().take(10).mkString("\n"))
  }

  test("identifier_not_in_triplestore fires when an id entity vanishes") {
    import spark.implicits._
    val someId = triples.filter($"p" === Vocab.HasLiteralValue).limit(1)
      .collect().head.getString(0)
    val mutilated = triples.filter($"s" =!= someId)
    val fired = checksFired(Checkers.idsWithoutOmid(rows, mutilated))
    assert(fired == Set("identifier_not_in_triplestore"))
  }

  test("omid_mismatch fires when an id is re-attached to another entity") {
    import spark.implicits._
    val link = triples.filter($"p" === Vocab.HasIdentifier &&
      $"s".contains("/br/")).limit(1).collect().head
    val otherBr = triples.filter($"p" === Vocab.HasIdentifier &&
      $"s".contains("/br/") && $"s" =!= link.getString(0)).limit(1)
      .collect().headOption.map(_.getString(0))
      .getOrElse(Vocab.uri("br/0699"))
    val mutated = triples
      .filter(!($"p" === Vocab.HasIdentifier && $"s" === link.getString(0) && $"o" === link.getString(2)))
      .unionByName(Seq((otherBr, Vocab.HasIdentifier, link.getString(2),
        null.asInstanceOf[String])).toDF("s", "p", "o", "o_datatype"))
    val fired = checksFired(Checkers.omidMismatch(rows, mutated))
    assert(fired == Set("omid_mismatch"))
  }

  test("entity_not_in_triplestore fires when a curated entity has no triples") {
    import spark.implicits._
    val someBr = triples.filter($"s".contains("/br/")).limit(1)
      .collect().head.getString(0)
    val gone = triples.filter($"s" =!= someBr)
    val report = Checkers.missingEntities(rows, gone)
    assert(checksFired(report) == Set("entity_not_in_triplestore"))
    assert(report.filter($"entity" === someBr.stripPrefix(Vocab.BaseIri + "/")).count() == 1)
  }

  test("missing_provenance fires when snapshot 1 is absent") {
    import spark.implicits._
    val victim = prov.limit(1).collect().head.getString(0)
    val gappy = prov.filter($"entity" =!= victim)
    val report = Checkers.missingProvenance(triples, gappy)
    assert(checksFired(report) == Set("missing_provenance"))
    assert(report.filter($"entity" === victim).count() == 1)
  }

  test("open_snapshot_violation fires on double-open and all-closed entities") {
    import spark.implicits._
    val e = prov.limit(2).collect().map(_.getString(0))
    // double open for e(0); close the only snapshot of e(1) without a delete
    val corrupted = prov
      .withColumn("invalidated_at",
        when($"entity" === e(1), lit("2026-08-12T01:00:00Z")).otherwise($"invalidated_at"))
      .unionByName(prov.filter($"entity" === e(0))
        .withColumn("snapshot_n", $"snapshot_n" + 1))
    val report = Checkers.openSnapshotInvariant(corrupted)
    assert(checksFired(report) == Set("open_snapshot_violation"))
    assert(report.count() == 2)
    // a properly deleted entity (closed snapshots, last one says so) is legal
    val deleted = prov
      .withColumn("invalidated_at",
        when($"entity" === e(0), lit("2026-08-12T01:00:00Z")).otherwise($"invalidated_at"))
      .unionByName(prov.filter($"entity" === e(0))
        .withColumn("snapshot_n", $"snapshot_n" + 1)
        .withColumn("description", lit("Entity deleted"))
        .withColumn("invalidated_at", lit("2026-08-12T01:00:00Z")))
    assert(Checkers.openSnapshotInvariant(deleted).filter($"entity" === e(0)).isEmpty)
  }

  test("invalid datatype checks fire on corrupt literals and non-IRI objects") {
    import spark.implicits._
    val junk = Seq(
      (Vocab.uri("br/0601"), Vocab.PublicationDate, "2019-13-45", Vocab.XsdDate),
      (Vocab.uri("br/0601"), Vocab.PublicationDate, "019", Vocab.XsdGYear),
      (Vocab.uri("br/0601"), Vocab.PartOf, "not a uri", null.asInstanceOf[String]))
      .toDF("s", "p", "o", "o_datatype")
    val report = Checkers.invalidDatatypes(triples.unionByName(junk))
    assert(checksFired(report) == Set("invalid_date_literal", "invalid_iri_object"))
    assert(report.count() == 3)
  }

  // ==== post-merge audit (check_merged_{brs,ids,ras}_results.py) ========

  /** Two BR entities that both carry identifiers — a legal merge pair. */
  lazy val mergeMetas: (String, String) = {
    import spark.implicits._
    val withIds = triples.filter($"p" === Vocab.HasIdentifier && $"s".contains("/br/"))
      .select($"s").distinct().orderBy($"s").limit(2).as[String].collect()
    (withIds(0), withIds(1))
  }

  test("a correctly applied merge passes the merge audit") {
    import spark.implicits._
    val (a, b) = mergeMetas
    val pairs = Seq((a, b)).toDF("surviving", "merged").localCheckpoint()
    val prefix = Vocab.BaseIri + "/"
    val metaPairs = pairs.select(
      expr(s"substring(surviving, ${prefix.length + 1})").as("surviving"),
      expr(s"substring(merged, ${prefix.length + 1})").as("merged"))
    val mergedTriples = graft.operators.Tools.applyMerges(triples, pairs).localCheckpoint()
    val mergedProv = Provenance.mergeProvenance(prov, metaPairs, "2026-08-13T00:00:00Z")
      .localCheckpoint()
    val report = Checkers.mergeAudit(pairs, mergedTriples, mergedProv)
    assert(report.isEmpty, report.collect().take(10).mkString("\n"))
  }

  test("merge audit fires when the merge was never applied") {
    import spark.implicits._
    val (a, b) = mergeMetas
    val pairs = Seq((a, b)).toDF("surviving", "merged")
    val fired = checksFired(Checkers.mergeAudit(pairs, triples, prov))
    assert(Set("merged_entity_still_exists", "prov_less_than_two_snapshots",
      "prov_missing_invalidation_time").subsetOf(fired), fired.toString)
  }

  test("merge audit fires on surviving-entity shape violations") {
    import spark.implicits._
    val (a, b) = mergeMetas
    val pairs = Seq((a, b)).toDF("surviving", "merged").localCheckpoint()
    val merged = graft.operators.Tools.applyMerges(triples, pairs)
    // strip the survivor's identifiers and graft a second title + a bogus
    // sequence identifier onto it
    val corrupted = merged
      .filter(!($"s" === a && $"p" === Vocab.HasIdentifier))
      .unionByName(Seq(
        (a, Vocab.Title, "A Second Title", Vocab.XsdString),
        (a, Vocab.HasSequenceIdentifier, "7", Vocab.XsdString))
        .toDF("s", "p", "o", "o_datatype"))
    val fired = checksFired(Checkers.survivingConstraints(pairs, corrupted))
    assert(fired == Set("br_no_identifier", "br_multiple_titles", "br_seq_id_wrong_type"),
      fired.toString)
  }
}
