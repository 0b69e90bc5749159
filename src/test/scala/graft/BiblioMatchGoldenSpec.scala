package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.StoreMatch
import graft.sources.CrossrefMeta

/** Golden parity for the J12/D11 fuzzy-match chain against the
  * reference's OWN fixtures (`test/bibliographic_matching_test.py`):
  *
  *  - `StoreMatch.brMetadata` over `massari_publications.nt` must
  *    reproduce the QSS_META dict the reference's SPARQL probe
  *    (`fetch_triplestore_metadata`) returns for br/06901 — field for
  *    field, including the lowercase/trim rules and the hasNext-head
  *    first-author pick.
  *  - `CrossrefMeta.fromApiJson` over the two recorded API responses must
  *    extract what `fetch_crossref_metadata` extracts, pinned by the
  *    test's EXACT score assertions: the matching fixture scores 40.0
  *    (a perfect score: every component at its weight), the mismatching
  *    one 7.8925858951175405 — bit-identical IEEE 754, which also pins
  *    the Myers Levenshtein kernel and the column arithmetic's
  *    association order against rapidfuzz + CPython float evaluation.
  */
class BiblioMatchGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val RefTest = "/root/reference/test"
  private val ArticleUri = "https://w3id.org/oc/meta/br/06901"

  // the reference test's QSS_META expectation (bibliographic_matching_test.py:25-36)
  private val QssMeta = Map(
    "title" -> "opencitations meta",
    "family" -> "massari",
    "given" -> "Arcangelo",
    "year" -> "2024",
    "venue" -> "quantitative science studies",
    "issn" -> "2641-3337",
    "volume" -> "5",
    "issue" -> "1",
    "start_page" -> "50",
    "end_page" -> "75")

  private lazy val tsMeta: Map[String, String] = {
    val triples = graft.rdf.Serialization.readNTriples(spark,
      s"$RefTest/testcases/ts/massari_publications.nt")
    val rows = StoreMatch.brMetadata(triples)
      .filter(col("br") === ArticleUri).collect()
    assert(rows.length == 1, s"expected one br row, got ${rows.length}")
    val r = rows.head
    QssMeta.keys.map(k => k -> r.getAs[String](k)).toMap
  }

  test("StoreMatch over massari_publications.nt == the reference's QSS_META") {
    assert(tsMeta == QssMeta,
      s"\ndiff: ${QssMeta.keySet.filter(k => tsMeta(k) != QssMeta(k))
        .map(k => s"$k: '${tsMeta(k)}' VS '${QssMeta(k)}'").mkString("; ")}")
  }

  private def scoreAgainst(fixture: String): Double = {
    val cr = CrossrefMeta.fromApiJson(spark,
      s"$RefTest/testcases/crossref/$fixture")
    assert(cr.count() == 1)
    val ts = tsMeta
    def l(k: String) = lit(ts(k))
    cr.select(graft.functions.BiblioMatch.matchingScore(
        l("family"), col("family"), l("given"), col("given"),
        l("title"), col("title"),
        l("venue"), col("venue"), l("issn"), col("issn"),
        l("year"), col("year"), l("volume"), col("volume"),
        l("issue"), col("issue"), l("start_page"), col("start_page"),
        l("end_page"), col("end_page")).as("score"))
      .collect().head.getDouble(0)
  }

  test("matching fixture scores exactly 40.0 (>= threshold)") {
    val score = scoreAgainst("qss_a_00292.json")
    assert(score == 40.0, s"got $score")
    assert(score >= graft.functions.BiblioMatch.MatchingThreshold)
  }

  test("mismatching fixture scores exactly 7.8925858951175405 (< threshold)") {
    val score = scoreAgainst("s11192-022-04367-w.json")
    assert(score == 7.8925858951175405, s"got $score")
    assert(score < graft.functions.BiblioMatch.MatchingThreshold)
  }

  test("CrossrefMeta edge cases follow fetch_crossref_metadata's rules") {
    // absent arrays/fields -> "", family-less author, first-hyphen-only
    // page split, first-ISSN pick, given trimmed but case kept
    val dir = java.nio.file.Files.createTempDirectory("crmeta").toFile
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      w.write(body); w.close()
    }
    write("edge1.json",
      """{"status":"ok","message":{"DOI":"10.1/x","title":[],"author":[],
        |"container-title":[],"ISSN":[]}}""".stripMargin)
    write("edge2.json",
      """{"status":"ok","message":{"DOI":"10.1/y","title":["  MiXeD Case  "],
        |"author":[{"given":" Ada "}],"issued":{"date-parts":[[1999,1]]},
        |"page":"e100-5-2","container-title":["J"],
        |"ISSN":["1234-5678","9999-0000"],"volume":"7"}}""".stripMargin)
    val rows = CrossrefMeta.fromApiJson(spark, dir.getAbsolutePath)
      .collect().map(r => r.getAs[String]("doi") -> r).toMap
    val e1 = rows("10.1/x")
    for (c <- Seq("title", "family", "given", "year", "venue", "issn",
        "volume", "issue", "start_page", "end_page"))
      assert(e1.getAs[String](c) == "", s"edge1.$c should be empty, got '${e1.getAs[String](c)}'")
    val e2 = rows("10.1/y")
    assert(e2.getAs[String]("title") == "mixed case")
    assert(e2.getAs[String]("family") == "")
    assert(e2.getAs[String]("given") == "Ada")
    assert(e2.getAs[String]("year") == "1999")
    assert(e2.getAs[String]("venue") == "j")
    assert(e2.getAs[String]("issn") == "1234-5678")
    assert(e2.getAs[String]("volume") == "7")
    assert(e2.getAs[String]("issue") == "")
    // page.split("-", 1): first hyphen only
    assert(e2.getAs[String]("start_page") == "e100")
    assert(e2.getAs[String]("end_page") == "5-2")
  }
}
