package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator

/** Fresh-load curation pipeline specs over the reference's own inputs
  * (`/root/reference/example_metadata.csv`, `test/manual_data.csv`). */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val example = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv"))

  test("example_metadata: all rows valid, one curated row each, sequential OMIDs") {
    val rows = example.rows.collect()
    assert(rows.length == 13)
    val metas = rows.map(_.getAs[String]("br_meta"))
    // row BRs numbered first, in row order
    assert(metas.toSeq == (1 to 13).map(n => s"br/060$n"))
    // every id cell ends with the row's omid and keeps the original doi
    val first = rows.head
    assert(first.getAs[String]("id") == "doi:10.1007/978-3-662-07918-8_3 omid:br/0601")
    assert(first.getAs[String]("title").nonEmpty)
  }

  test("example_metadata: venues dedup by issn, publishers dedup by crossref id") {
    val rows = example.rows.collect()
    val venueCells = rows.map(_.getAs[String]("venue"))
    // rows 3 and 4 are IEEE journals with DIFFERENT issns -> different venues
    // 4 IEEE rows over 3 distinct journals (Plasma Science appears twice)
    val ieee = venueCells.filter(_.contains("IEEE"))
    assert(ieee.length == 4)
    assert(ieee.distinct.length == 3)
    // rows 3,4,5 share publisher crossref:263 -> same RA omid in all three cells
    val pubCells = rows.map(_.getAs[String]("publisher")).filter(_.contains("crossref:263"))
    assert(pubCells.length == 4)
    val raOmids = pubCells.map(c => "omid:ra/\\d+".r.findFirstIn(c).get)
    assert(raOmids.distinct.length == 1)
  }

  test("example_metadata: venue BRs numbered after row BRs, vvi index built") {
    val vvi = example.vviIndex.collect()
    // journal articles with volume+issue: each journal venue gets its
    // volume + issue entities
    assert(vvi.nonEmpty)
    val venueMetas = vvi.map(_.getAs[String]("venue_meta")).distinct
    assert(venueMetas.forall(_.matches("br/060\\d+")))
    // vvi entity numbers are all > 13 (created in P3 after the 13 row BRs)
    val entNums = vvi.map(_.getAs[String]("meta").stripPrefix("br/060").toInt)
    assert(entNums.forall(_ > 13))
  }

  test("example_metadata: id entities number row ids first, then venue/ra ids") {
    val idBr = example.indexIdBr.collect().map(r => (r.getString(0), r.getString(1))).toMap
    // the first row's doi is the first id entity
    assert(idBr("doi:10.1007/978-3-662-07918-8_3") == "id/0601")
    // br ids of later rows come before any venue isbn
    val doiN = idBr("doi:10.1088/0022-3727/13/1/002").stripPrefix("id/060").toInt
    val isbnN = idBr("isbn:9783642058530").stripPrefix("id/060").toInt
    assert(doiN < isbnN, s"row dois ($doiN) must precede venue isbns ($isbnN)")
    val idRa = example.indexIdRa.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(idRa.contains("crossref:263"))
  }

  test("example_metadata: ar_index has author+publisher pairs, re_index covers paged rows") {
    val ar = example.arIndex.collect()
    assert(ar.nonEmpty)
    val withAuthors = ar.filter(_.getAs[String]("author").nonEmpty)
    assert(withAuthors.forall(_.getAs[String]("author").matches("(ar/\\d+, ra/\\d+)(; ar/\\d+, ra/\\d+)*")))
    val re = example.reIndex.collect()
    assert(re.length == 12) // every row except the id-only book has pages
  }

  test("manual_data: shared ids across rows merge into one entity") {
    val batch = Curator.curateFresh(
      Curator.readInput(spark, "/root/reference/test/manual_data.csv"))
    val out = batch.rows.collect()
    val in = Curator.readInput(spark, "/root/reference/test/manual_data.csv").count()
    assert(out.length < in, "adversarial input should trigger merges")
    // id cells each contain exactly one omid and it is unique
    val omids = out.map(r => "omid:br/\\d+".r.findAllIn(r.getAs[String]("id")).toSeq)
    assert(omids.forall(_.length == 1))
    assert(omids.flatten.distinct.length == out.length)
  }

  test("overlapping surnames mint six distinct agents, orcid attaches to its own author") {
    // curator_test.py test_clean_ra_overlapping_surnames: one author's
    // surname is a substring of another's ("M," inside "Malek,") — name
    // resolution is EXACT equality, so all six agents stay distinct and
    // the orcid belongs only to the author that carried it
    import spark.implicits._
    val input = Seq((
      "doi:10.1615/intjmedmushrooms.v18.i9.60",
      "Giant Oyster Mushroom Pleurotus giganteus (Agaricomycetes) Enhances Adipocyte Differentiation",
      "Paravamsivam, Puvaneswari; Heng, Chua Kek; " +
        "Malek, Sri Nurestri Abdul [orcid:0000-0001-6278-8559]; " +
        "Sabaratnam, Vikineswary; M, Ravishankar Ram; Kuppusamy, Umah Rani",
      "2016", "International Journal of Medicinal Mushrooms [issn:1521-9437]",
      "18", "9", "821-831", "journal article", "Begell House [crossref:613]", ""))
      .toDF(curation.Validation.InputColumns: _*)
    val b = Curator.curateFresh(input)
    val authors = b.roles.filter($"role" === "author").orderBy($"pos").collect()
    assert(authors.length == 6)
    assert(authors.map(_.getAs[String]("ra_meta")).distinct.length == 6)
    val orcidRows = b.entityIds.filter($"scheme" === "orcid").collect()
    assert(orcidRows.length == 1)
    val ownerRa = orcidRows.head.getAs[String]("owner_meta")
    val ownerName = b.raNames.filter($"ra_meta" === ownerRa).collect()
      .map(_.getAs[String]("name"))
    assert(ownerName.toSeq == Seq("Malek, Sri Nurestri Abdul"))
  }
}
