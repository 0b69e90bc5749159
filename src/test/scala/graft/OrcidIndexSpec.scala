package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrcidIndex

/** ORCID DOI-index specs (reference `run/orcid_process.py` semantics over
  * synthetic summary XMLs written to a temp dir).
  */
class OrcidIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def extId(idType: String, rel: String, value: String): String =
    s"""<common:external-id>
       |  <common:external-id-type>$idType</common:external-id-type>
       |  <common:external-id-value>$value</common:external-id-value>
       |  <common:external-id-relationship>$rel</common:external-id-relationship>
       |</common:external-id>""".stripMargin

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("orcid_sum").toFile
    def write(name: String, body: String): Unit = {
      val f = new java.io.File(d, name)
      java.nio.file.Files.writeString(f.toPath,
        s"""<record:record xmlns:record="http://www.orcid.org/ns/record">$body</record:record>""")
    }
    write("0000-0002-8420-0696.xml",
      """<personal-details:family-name>Peroni</personal-details:family-name>
        |<personal-details:given-names>Silvio</personal-details:given-names>
        |""".stripMargin +
        extId("doi", "self", "https://doi.org/10.1787/ECO_outlook-v2011-2-graph138-en") +
        extId("doi", "part-of", "10.9999/ignored-not-self") +
        extId("pmid", "self", "123456") +
        extId("doi", "self", "doi:10.1007/s11192-021-03940-z"))
    write("0000-0001-5506-523X.xml",
      "<personal-details:family-name>Massari</personal-details:family-name>" +
        extId("doi", "self", "not a doi at all"))
    write("no-orcid-here.txt", "<junk/>")
    d.getAbsolutePath
  }

  test("summaries parse: orcid from filename, name parts, doi filter + normalise") {
    import spark.implicits._
    val s = OrcidIndex.readSummaries(spark, dir + "/*.xml")
      .orderBy($"orcid").collect()
    assert(s.length == 2)
    val m = s(0)
    assert(m.getString(0) == "0000-0001-5506-523X" && m.getString(1) == "Massari")
    assert(m.getSeq[String](2).isEmpty, "invalid doi must be dropped")
    val p = s(1)
    assert(p.getString(0) == "0000-0002-8420-0696" && p.getString(1) == "Peroni, Silvio")
    // resolver prefix stripped + lowercased; part-of / pmid / junk excluded
    assert(p.getSeq[String](2).toSet ==
      Set("10.1787/eco_outlook-v2011-2-graph138-en", "10.1007/s11192-021-03940-z"))
  }

  test("doi index: CSVManager rows incl. the None bucket") {
    import spark.implicits._
    val ix = OrcidIndex.doiIndex(OrcidIndex.readSummaries(spark, dir + "/*.xml"))
      .as[(String, String)].collect().toSet
    assert(ix == Set(
      ("10.1787/eco_outlook-v2011-2-graph138-en", "Peroni, Silvio [0000-0002-8420-0696]"),
      ("10.1007/s11192-021-03940-z", "Peroni, Silvio [0000-0002-8420-0696]"),
      ("None", "Massari [0000-0001-5506-523X]")))
  }

  test("enrichment: family + given-initial match attaches the orcid") {
    import spark.implicits._
    val ix = OrcidIndex.doiIndex(OrcidIndex.readSummaries(spark, dir + "/*.xml"))
    val authors = Seq(
      ("10.1787/eco_outlook-v2011-2-graph138-en", "Peroni, S."),   // initial match
      ("10.1787/eco_outlook-v2011-2-graph138-en", "Peroni, Anna"), // initial mismatch
      ("10.1787/eco_outlook-v2011-2-graph138-en", "Other, Silvio"),// family mismatch
      ("10.1007/s11192-021-03940-z", "PERONI"),                    // family-only matches
      ("10.9999/unknown", "Peroni, Silvio"))                       // doi not indexed
      .toDF("doi", "author_name")
    val got = OrcidIndex.enrichAuthors(authors, ix)
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("10.1787/eco_outlook-v2011-2-graph138-en", "Peroni, S.", "0000-0002-8420-0696"),
      ("10.1007/s11192-021-03940-z", "PERONI", "0000-0002-8420-0696")))
  }
}
