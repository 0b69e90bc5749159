package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curator
import graft.rdf.{CsvExporter, TriplesEmitter, Vocab}

/** R1/R4/R5 specs: triples emission from a curated batch, golden-shape
  * checks against testcase_01.ttl's patterns, and the CSV round-trip. */
class RdfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val batch = Curator.curateFresh(
    Curator.readInput(spark, "/root/reference/example_metadata.csv"))
  lazy val triples = TriplesEmitter.emit(batch).cache()

  test("triples: every entity kind appears with its OCDM class") {
    import spark.implicits._
    val types = triples.filter($"p" === Vocab.RdfType)
      .select($"o").distinct().as[String].collect().toSet
    assert(types.contains(Vocab.Expression))
    assert(types.contains(Vocab.IdentifierClass))
    assert(types.contains(Vocab.RoleInTime))
    assert(types.contains(Vocab.FoafAgent))
    assert(types.contains(Vocab.Manifestation))
    assert(types.contains(Vocab.Fabio + "JournalArticle"))
    assert(types.contains(Vocab.Fabio + "BookChapter"))
  }

  test("triples: date literals carry precision-correct datatypes") {
    import spark.implicits._
    val dates = triples.filter($"p" === Vocab.PublicationDate)
      .select($"o", $"o_datatype").as[(String, String)].collect()
    assert(dates.nonEmpty)
    dates.foreach { case (v, dt) =>
      val expected = v.length match {
        case 4 => Vocab.XsdGYear
        case 7 => Vocab.XsdGYearMonth
        case _ => Vocab.XsdDate
      }
      assert(dt == expected, s"date $v has datatype $dt")
    }
  }

  test("triples: hasNext chains are linear and complete per multi-author BR") {
    import spark.implicits._
    val nexts = triples.filter($"p" === Vocab.HasNext).count()
    val ars = triples.filter($"p" === Vocab.RdfType && $"o" === Vocab.RoleInTime).count()
    // every (br, role) sequence of length k contributes k-1 hasNext edges
    val seqCount = batch.roles.select("br_meta", "role").distinct().count()
    assert(nexts == ars - seqCount)
  }

  test("round-trip: curate -> triples -> export reproduces the curated rows") {
    import spark.implicits._
    // the exporter also emits venue BRs as their own rows (the reference
    // exports every br/ entity except volumes/issues); compare the work
    // rows by omid
    val origOmids = batch.rows.collect()
      .map(r => "omid:br/\\d+".r.findFirstIn(r.getAs[String]("id")).get).toSet
    val exported = CsvExporter.export(triples)
      .filter(org.apache.spark.sql.functions.udf((id: String) =>
        "omid:br/\\d+".r.findFirstIn(id).exists(origOmids)).apply($"id"))
    val orig = batch.rows
    assert(exported.count() == orig.count())
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"title", $"pub_date", $"volume", $"issue", $"page", $"type")
      .collect()
      .map(r => (r.getString(0).split(" ").sorted.mkString(" "), r.getString(1),
        r.getString(2), r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
      .toSet
    assert(key(exported) == key(orig))
    // author cells: same names in same order (ids spot-checked via orcid row)
    val authorsBy = exported.select($"id", $"author").collect()
      .map(r => (r.getString(0).split(" ").sorted.mkString(" "), r.getString(1))).toMap
    val origAuthors = orig.select($"id", $"author").collect()
      .map(r => (r.getString(0).split(" ").sorted.mkString(" "), r.getString(1))).toMap
    assert(authorsBy == origAuthors)
  }
}
