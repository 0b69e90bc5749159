package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.{Curator, StoreCurator}
import graft.rdf.{StoreViews, TriplesEmitter}

/** Update-scenario specs (the reference benchmark's second phase): batch 1
  * fresh-loads and becomes the store; batch 2 re-processes overlapping
  * rows against it. D2 store adoption, J5 equalizer precedence, D9
  * preexisting tracking, counter continuity. */
class StoreCuratorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val batch1 = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv"))
  lazy val store = StoreViews.fromTriples(TriplesEmitter.emit(batch1), "060")

  // batch 2: same first row's DOI with changed metadata + one new row
  lazy val batch2Input = {
    import spark.implicits._
    Seq(
      ("doi:10.1007/978-3-662-07918-8_3", "A Different Title Someone Typed", "Ushakov, Vasily Y.",
        "2005", "", "", "", "", "book chapter", "", ""),
      ("doi:10.9999/new-entry", "A Brand New Work", "Doe, Jane [orcid:0000-0002-1825-0097]",
        "2024", "", "", "", "11-22", "journal article", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
  }
  lazy val update = StoreCurator.curateWithStore(batch2Input, store)

  test("store views reconstruct entities, ids, ordered roles from triples") {
    import spark.implicits._
    assert(store.entities.filter($"meta".startsWith("br/")).count() ==
      batch1.entities.count())
    assert(store.entityIds.count() > 0)
    // hasNext order round-trips: multi-author BR keeps positions 1..n
    val multi = store.roles.filter($"role" === "author")
      .groupBy($"br_meta").agg(count(lit(1)).as("n"), collect_set($"pos").as("ps"))
      .filter($"n" > 1).collect()
    assert(multi.nonEmpty)
    multi.foreach { r =>
      val ps = r.getAs[scala.collection.Seq[Long]]("ps").sorted
      assert(ps == (1L to r.getAs[Long]("n")).toSeq, s"${r}")
    }
    val counters = store.counters.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(counters("br") == batch1.entities.count())
  }

  test("update: overlapping row adopts the store OMID, store facts win (J5)") {
    val rows = update.batch.rows.orderBy("first_row").collect()
    assert(rows.length == 2)
    val known = rows(0)
    assert(known.getAs[String]("br_meta") == "br/0601", "DOI match must adopt store omid")
    // equalizer: store title and date win over the changed batch values
    assert(known.getAs[String]("title") ==
      "Influence of Dielectric Properties, State, and Electrodes on Electric Strength")
    assert(known.getAs[String]("pub_date") == "2004")
    // store page wins (27-82 from batch 1)
    assert(known.getAs[String]("page") == "27-82")
  }

  test("update: new entities numbered from store counters, no collisions") {
    import spark.implicits._
    val storeMax = store.counters.filter($"kind" === "br").collect().head.getLong(2)
    val newRow = update.batch.rows.orderBy("first_row").collect()(1)
    val n = newRow.getAs[String]("br_meta").stripPrefix("br/060").toLong
    assert(n == storeMax + 1, s"new br number $n should be ${storeMax + 1}")
    // no meta appears in both store and new-entity space except adoptions
    val updMetas = graft.rdf.Provenance.allEntities(update.batch)
      .select($"meta").as[String].collect().toSet
    val adopted = update.preexisting.as[String].collect().toSet
    val storeMetas = store.entities.select($"meta").as[String].collect().toSet
    assert((updMetas -- adopted).intersect(storeMetas).isEmpty)
  }

  test("update: silencer keeps store role sequences for silenced roles (D6)") {
    import spark.implicits._
    val silenced = StoreCurator.curateWithStore(batch2Input, store,
      silencedRoles = Set("author"))
    val known = silenced.batch.rows.orderBy("first_row").collect()(0)
    // batch-1 author cell for br/0601 was "Ushakov, Vasily Y. [omid:ra/0601]"
    assert(known.getAs[String]("author").contains("Ushakov"))
    assert(known.getAs[String]("author").contains("omid:ra/0601"))
    // roles frame for the adopted BR uses the STORE sequence
    val roles = silenced.batch.roles
      .filter($"br_meta" === "br/0601" && $"role" === "author").collect()
    assert(roles.length == 1 && roles.head.getAs[String]("ra_meta") == "ra/0601")
    // unsilenced run: the new-batch author resolves independently but the
    // cell still names Ushakov (same person re-parsed)
    val unsilenced = update.batch.rows.orderBy("first_row").collect()(0)
    assert(unsilenced.getAs[String]("author").contains("Ushakov"))
  }

  test("update: explicit omid adopts the store entity; unknown omid is discarded, row continues (D2(1)/(2))") {
    import spark.implicits._
    val input = Seq(
      ("omid:br/0602 doi:10.555/fresh-doi", "Explicitly Pointed Work", "Poe, Edgar", "1845",
        "", "", "", "", "journal article", "", ""),
      ("omid:br/99999 doi:10.555/ghost", "Ghost Row", "Nobody, At All", "1900",
        "", "", "", "", "journal article", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val upd = StoreCurator.curateWithStore(input, store)
    val rows = upd.batch.rows.orderBy("first_row").collect()
    // curator.py:1196-1205: an unresolvable omid is discarded (metaval='')
    // and the row resolves via its remaining ids — here the ghost DOI is
    // new, so the row becomes a NEW entity, never dropped.
    assert(rows.length == 2, "unknown explicit omid must not drop the row")
    assert(rows(0).getAs[String]("br_meta") == "br/0602")
    assert(rows(0).getAs[String]("id").contains("omid:br/0602"))
    val ghost = rows(1)
    val storeMax = store.counters.filter($"kind" === "br").collect().head.getLong(2)
    val n = ghost.getAs[String]("br_meta").stripPrefix("br/060").toLong
    assert(n > storeMax, "ghost row must mint a fresh store-numbered entity")
    assert(!ghost.getAs[String]("id").contains("br/99999"),
      "the unknown omid token must not survive into the output id cell")
    assert(ghost.getAs[String]("id").contains("doi:10.555/ghost"))
  }

  test("update: unknown omid resolves via remaining known ids after discard (D2(2) fall-through)") {
    import spark.implicits._
    // br/0601's DOI from batch 1 + a dead omid: the omid is discarded and
    // the DOI adopts the store entity (curator.py:1290-1292 local match).
    val input = Seq(
      ("omid:br/88888 doi:10.1007/978-3-662-07918-8_3", "Fallback Title", "Ushakov, Vasily Y.",
        "2004", "", "", "", "", "book chapter", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val upd = StoreCurator.curateWithStore(input, store)
    val rows = upd.batch.rows.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("br_meta") == "br/0601",
      "after omid discard the DOI must adopt the store entity")
  }

  test("update: dead omid resolves to its merge successor via provenance (D2 merged-history hop)") {
    import spark.implicits._
    // prov history: br/0999 (long dead, absent from the store) was merged
    // into br/0601; br/0998 was merged into br/0999 (chain of two hops).
    def se(meta: String, n: Int) = s"https://w3id.org/oc/meta/$meta/prov/se/$n"
    val prov = spark.createDataFrame(Seq(
      ("br/0601", 2L, "2025-01-01T00:00:00Z", null.asInstanceOf[String],
        Seq(se("br/0601", 1), se("br/0999", 1)), "Entity merged with br/0999", "pa/1"),
      ("br/0999", 2L, "2024-01-01T00:00:00Z", null.asInstanceOf[String],
        Seq(se("br/0999", 1), se("br/0998", 1)), "Entity merged with br/0998", "pa/1")))
      .toDF("entity", "snapshot_n", "generated_at", "invalidated_at",
        "derived_from", "description", "attributed_to")
    val input = Seq(
      ("omid:br/0999 doi:10.555/hop-one", "One Hop", "Poe, Edgar", "1845",
        "", "", "", "", "journal article", "", ""),
      ("omid:br/0998 doi:10.555/hop-two", "Two Hops", "Poe, Edgar", "1846",
        "", "", "", "", "journal article", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val upd = StoreCurator.curateWithStore(input, store, prov = Some(prov))
    val rows = upd.batch.rows.orderBy("first_row").collect()
    // both rows land on br/0601 and — like the reference's `{id: row}`
    // keep-last dedupe (curator.py:333) — collapse into ONE output row
    // whose id cell unions both rows' ids.
    assert(rows.length == 1,
      "rows adopting the same store entity must collapse to one output row")
    assert(rows(0).getAs[String]("br_meta") == "br/0601",
      "dead omid must hop to its surviving successor")
    val idCell = rows(0).getAs[String]("id")
    assert(idCell.contains("doi:10.555/hop-one") && idCell.contains("doi:10.555/hop-two"),
      s"id cell must union both rows' ids, got: $idCell")
    assert(rows(0).getAs[String]("title") ==
      "Influence of Dielectric Properties, State, and Electrodes on Electric Strength",
      "equalizer: store title still wins on the collapsed row")
    // without prov the same omids are simply discarded -> new entities
    val noProv = StoreCurator.curateWithStore(input, store)
    val storeMax = store.counters.filter($"kind" === "br").collect().head.getLong(2)
    noProv.batch.rows.collect().foreach { r =>
      assert(r.getAs[String]("br_meta").stripPrefix("br/060").toLong > storeMax)
    }
  }

  test("update: preexisting tracking flags adopted entities (D9)") {
    import spark.implicits._
    val pre = update.preexisting.as[String].collect().toSet
    assert(pre.contains("br/0601"))
    // Ushakov (no ids) on the ADOPTED br/0601 name-matches the store's
    // AR sequence (clean_ra, curator.py:697-703): the store (ar, ra) pair
    // is reused, so both are preexisting; the orcid author of the new row
    // stays new.
    assert(pre.contains("ra/0601") && pre.contains("ar/0601"))
    val newRoles = update.batch.roles.filter($"br_meta" === "br/0601" && $"role" === "author").collect()
    assert(newRoles.length == 1 && newRoles.head.getAs[String]("ra_meta") == "ra/0601",
      "matched batch author must reuse the store sequence element, not mint a new AR")
  }

  test("J6: only resolved donor rows propagate; wannabe rows receive but never donate") {
    import spark.implicits._
    // merge_duplicate_entities (curator.py:1361-1389): a row donates its
    // fields to related rows only when its OWN id resolved to a real
    // meta; rows merged in via shared batch-only ids stay wannabe and
    // never donate. Store entities here carry NO pub_date so the
    // equalizer's store precedence can't mask the propagation order.
    val seedInput = Seq(
      ("doi:10.1234/j6", "Stored Work", "", "", "", "", "", "", "journal article", "", ""),
      ("doi:10.1234/j6b", "Stored Work B", "", "", "", "", "", "", "journal article", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val st = StoreViews.fromTriples(
      TriplesEmitter.emit(Curator.curateFresh(seedInput)), "060")
    val batch = Seq(
      // component 1: non-donor row FIRST with a conflicting non-empty
      // date; the later store-resolving (donor) row's value must win
      ("doi:10.1234/xshared", "Stored Work", "", "2019", "", "", "", "", "journal article", "", ""),
      ("doi:10.1234/j6 doi:10.1234/xshared", "Stored Work", "", "2021", "", "", "", "", "journal article", "", ""),
      // component 2: the donor's date is EMPTY → no donor propagation;
      // the final dedupe keeps the LAST row's own (empty) value, not the
      // earlier wannabe row's 2018
      ("doi:10.1234/yshared", "Stored Work B", "", "2018", "", "", "", "", "journal article", "", ""),
      ("doi:10.1234/j6b doi:10.1234/yshared", "Stored Work B", "", "", "", "", "", "", "journal article", "", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val upd = StoreCurator.curateWithStore(batch, st)
    val rows = upd.batch.rows.orderBy("first_row").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("br_meta") == "br/0601")
    assert(rows(0).getAs[String]("pub_date") == "2021",
      "donor row's date must override the earlier wannabe row's value")
    assert(rows(1).getAs[String]("br_meta") == "br/0602")
    assert(rows(1).getAs[String]("pub_date") == "",
      "empty donor column falls back to the last row's own value, not the wannabe's")
  }

  // r9 D5 re-key guard: the alignment joins must be keyed by
  // (store_br, role, literal|name), so a single high-author (BR, role)
  // key emits O(matches) join rows, never |batch agents| x |store seq|.
  private def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allPlanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allPlanNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: allPlanNodes(r.child)
    case other => p +: other.children.flatMap(allPlanNodes)
  }

  test("D5 alignment joins emit O(matches) rows on a high-author key") {
    import spark.implicits._
    val n = 400
    val batchSeqRoles = (0 until n).map(i =>
      ("br/0601", "author", f"ar/0601$i%04d", f"ra/0601$i%04d"))
      .toDF("store_br", "role", "temp_ar", "temp_ra")
    val storeSeq = (0 until n).map(i =>
      ("br/0601", "author", (i + 1).toLong, f"ar/0609$i%04d", f"ra/0609$i%04d"))
      .toDF("store_br", "role", "st_pos", "st_ar", "st_ra")
    val batchRaIds = (0 until n).map(i => (f"ra/0601$i%04d", s"orcid:$i"))
      .toDF("temp_ra", "literal")
    val storeRaIds = (0 until n).map(i => (f"ra/0609$i%04d", s"orcid:$i"))
      .toDF("st_ra", "literal")
    val batchRaNames = (0 until n).map(i => (f"ra/0601$i%04d", f"Author_$i%04d, Test"))
      .toDF("ra_meta", "name")
    val storeRaNames = (0 until n).map(i => (f"ra/0609$i%04d", f"Author_$i%04d, Test"))
      .toDF("ra_meta", "name")
    val m = StoreCurator.alignArSequences(batchSeqRoles, storeSeq,
      batchRaIds, storeRaIds, batchRaNames, storeRaNames)
    val rows = m.collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val suffix = r.getAs[String]("temp_ra").stripPrefix("ra/0601")
      assert(r.getAs[String]("st_ra") == s"ra/0609$suffix")
      assert(r.getAs[String]("st_ar") == s"ar/0609$suffix")
    }
    // the round-8 (store_br, role)-keyed shape would emit n^2 = 160k rows
    // from its candidate join here; the equality-keyed joins emit at most
    // the match count per join (id-side n, name-side n)
    val joins = allPlanNodes(m.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, "expected join nodes in the alignment plan")
    joins.foreach { j =>
      val out = j.metrics("numOutputRows").value
      assert(out <= 10L * n,
        s"join ${j.nodeName} emitted $out rows — O(matches) bound is ${10L * n}")
    }
  }
}
