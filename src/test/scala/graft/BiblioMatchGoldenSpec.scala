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
}
