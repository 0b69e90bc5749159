package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator
import graft.rdf.{Editor, Provenance, TriplesEmitter, Vocab}

/** MetaEditor-equivalent specs (reference `core/editor.py:90-188`):
  * batched update_property / delete(property[, object]) / entity purge with
  * inbound-reference cleanup, each with SCD2 provenance asserted.
  */
class EditorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val T0 = "2026-08-12T00:00:00Z"
  val T1 = "2026-08-13T00:00:00Z"

  lazy val batch = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv")).checkpointed
  lazy val triples = TriplesEmitter.emit(batch).localCheckpoint()
  lazy val prov = Provenance.freshSnapshots(batch, T0).localCheckpoint()

  def uri(meta: String): String = Vocab.uri(meta)

  test("updateProperty replaces the existing value and snapshots the entity") {
    import spark.implicits._
    val target = triples.filter($"p" === Vocab.Title).limit(1).collect().head
    val s = target.getString(0)
    val meta = s.stripPrefix(Vocab.BaseIri + "/")
    val updates = Seq((s, Vocab.Title, "A Fixed Title", Vocab.XsdString))
      .toDF("s", "p", "o", "o_datatype")
    val r = Editor.updateProperty(triples, prov, updates, T1)

    val titles = r.triples.filter($"s" === s && $"p" === Vocab.Title).collect()
    assert(titles.length == 1 && titles.head.getString(2) == "A Fixed Title")
    // old value deleted, new added — both visible in the delta
    assert(r.delta.deletions.count() == 1 && r.delta.additions.count() == 1)
    val snaps = r.prov.filter($"entity" === meta).orderBy($"snapshot_n").collect()
    assert(snaps.length == 2)
    assert(snaps(0).getAs[String]("invalidated_at") == T1)
    assert(snaps(1).getAs[String]("description") == "Entity modified")
    assert(snaps(1).getSeq[String](snaps(1).fieldIndex("derived_from")) == Seq(uri(meta) + "/prov/se/1"))
    // untouched entities keep exactly one open snapshot and no extra rows
    assert(r.prov.count() == prov.count() + 1)
    // idempotent update (same value again) is a no-op: empty delta
    val again = Editor.updateProperty(r.triples, r.prov, updates, T1)
    assert(again.delta.additions.isEmpty && again.delta.deletions.isEmpty)
    assert(again.prov.count() == r.prov.count())
  }

  test("updateProperty renders the SPARQL update payload") {
    import spark.implicits._
    val target = triples.filter($"p" === Vocab.Title).limit(1).collect().head
    val updates = Seq((target.getString(0), Vocab.Title, "T2", Vocab.XsdString))
      .toDF("s", "p", "o", "o_datatype")
    val q = Editor.updateProperty(triples, prov, updates, T1).updateQueries.collect()
    assert(q.length == 1)
    val text = q.head.getAs[String]("update_query")
    assert(text.contains("INSERT DATA") && text.contains("DELETE DATA"))
    assert(text.contains("\"T2\"^^<" + Vocab.XsdString + ">"))
  }

  test("deleteProperty removes one object or all values of (s, p)") {
    import spark.implicits._
    // one specific identifier link + a whole-property delete of a date
    val idLink = triples.filter($"p" === Vocab.HasIdentifier).limit(1).collect().head
    val dated = triples.filter($"p" === Vocab.PublicationDate).limit(1).collect().head
    val deletes = Seq(
      (idLink.getString(0), Vocab.HasIdentifier, idLink.getString(2)),
      (dated.getString(0), Vocab.PublicationDate, null.asInstanceOf[String]))
      .toDF("s", "p", "o")
    val r = Editor.deleteProperty(triples, prov, deletes, T1)
    assert(r.triples.filter($"s" === idLink.getString(0) && $"p" === Vocab.HasIdentifier &&
      $"o" === idLink.getString(2)).isEmpty)
    assert(r.triples.filter($"s" === dated.getString(0) && $"p" === Vocab.PublicationDate).isEmpty)
    assert(r.delta.additions.isEmpty)
    // both subjects snapshotted as modified
    val modified = r.prov.filter($"description" === "Entity modified")
      .select($"entity").as[String].collect().toSet
    assert(modified == Set(idLink.getString(0), dated.getString(0))
      .map(_.stripPrefix(Vocab.BaseIri + "/")))
  }

  test("deleteEntities purges outgoing triples and inbound references") {
    import spark.implicits._
    // purge an identifier entity: its owner's hasIdentifier link must go too
    val idLink = triples.filter($"p" === Vocab.HasIdentifier).limit(1).collect().head
    val owner = idLink.getString(0)
    val idUri = idLink.getString(2)
    val idMeta = idUri.stripPrefix(Vocab.BaseIri + "/")
    val r = Editor.deleteEntities(triples, prov, Seq(idUri).toDF("s"), T1)

    assert(r.triples.filter($"s" === idUri).isEmpty, "outgoing triples purged")
    assert(r.triples.filter($"o" === idUri && $"o_datatype".isNull).isEmpty,
      "inbound references cleaned up")
    // literal objects that merely collide with the URI text are untouched
    assert(r.delta.additions.isEmpty)

    val deleted = r.prov.filter($"entity" === idMeta).orderBy($"snapshot_n").collect()
    assert(deleted.length == 2)
    assert(deleted(1).getAs[String]("description") == "Entity deleted")
    assert(deleted(1).getAs[String]("invalidated_at") == T1,
      "deletion snapshot is closed at creation")
    val ownerSnaps = r.prov.filter($"entity" === owner.stripPrefix(Vocab.BaseIri + "/"))
      .orderBy($"snapshot_n").collect()
    assert(ownerSnaps.length == 2 &&
      ownerSnaps(1).getAs[String]("description") == "Entity modified",
      "referencing entity gets a modification snapshot, not a deletion")
  }
}
