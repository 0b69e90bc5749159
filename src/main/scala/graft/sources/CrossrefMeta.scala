package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossref works-API response → bibliographic match metadata — the
  * parsing half of the reference's `fetch_crossref_metadata`
  * (`lib/bibliographic_matching.py:51-84`; the HTTP half is out of scope
  * per SURVEY §2.1 S5's network rule). One row per response document,
  * with exactly the ten fields [[graft.functions.BiblioMatch]] scores,
  * extracted by the reference's rules:
  *
  *  - title     = lower(trim(title[0])), "" when absent
  *  - family    = lower(trim(author[0].family)); given = trim(author[0]
  *    .given) — given keeps its case (only its INITIAL is compared,
  *    case-insensitively, in `_score_first_author`)
  *  - year      = str(issued.date-parts[0][0]), "" when absent
  *  - venue     = lower(trim(container-title[0])); issn = ISSN[0] verbatim
  *  - volume / issue verbatim
  *  - page split ONCE on "-" (`page.split("-", 1)`): start = trim(left),
  *    end = trim(remainder) — "50-75" → (50, 75), "e100-5-2" → (e100, 5-2)
  *
  * All extraction is column arithmetic over `spark.read.json` — the
  * schema-on-read scan prunes to the seven message fields touched, so a
  * 100 TB dump scan reads a sliver of each response. `multiLine` handles
  * pretty-printed per-work files (the API's one-object-per-file shape);
  * JSON-lines dumps read with the same extraction via [[fromMessages]]. */
object CrossrefMeta {

  /** Read one-object-per-file API responses (optionally many paths). */
  def fromApiJson(spark: SparkSession, paths: String*): DataFrame =
    fromMessages(spark.read.option("multiLine", "true").json(paths: _*)
      .select(col("message")))

  /** Extraction over a frame with a Crossref `message` struct column.
    * Field access is schema-defensive: a dump where some field is absent
    * in EVERY response (so schema-on-read never infers it) extracts ""
    * instead of failing analysis — the same `msg.get(key, default)`
    * behavior as the reference. */
  def fromMessages(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val m = col("message")
    val msgSchema = df.schema("message").dataType match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"message column must be a struct, got $other")
    }
    def field(parent: org.apache.spark.sql.Column, schema: StructType,
        name: String): org.apache.spark.sql.Column =
      if (schema.fieldNames.contains(name)) parent.getField(name)
      else lit(null)
    def mf(name: String) = field(m, msgSchema, name)
    def sub(name: String, inner: String): org.apache.spark.sql.Column =
      msgSchema.find(_.name == name).map(_.dataType) match {
        case Some(st: StructType) if st.fieldNames.contains(inner) =>
          m.getField(name).getField(inner)
        case _ => lit(null)
      }
    def authorField(name: String): org.apache.spark.sql.Column =
      msgSchema.find(_.name == "author").map(_.dataType) match {
        case Some(org.apache.spark.sql.types.ArrayType(st: StructType, _))
            if st.fieldNames.contains(name) =>
          get(m.getField("author"), lit(0)).getField(name)
        case _ => lit(null)
      }
    def lowTrim(c: org.apache.spark.sql.Column) = lower(trim(c))
    def s(c: org.apache.spark.sql.Column) = coalesce(c, lit(""))
    // get() (0-based) instead of element_at: null on absent/empty arrays
    // rather than an ANSI out-of-bounds error
    def first(c: org.apache.spark.sql.Column) = get(c, lit(0))
    // page.split("-", 1): split at the FIRST hyphen only
    val page = s(mf("page"))
    val dash = instr(page, "-")
    df.select(
      s(mf("DOI")).as("doi"),
      s(lowTrim(first(mf("title")))).as("title"),
      s(lowTrim(authorField("family"))).as("family"),
      s(trim(authorField("given"))).as("given"),
      s(first(first(sub("issued", "date-parts"))).cast("string")).as("year"),
      s(lowTrim(first(mf("container-title")))).as("venue"),
      s(first(mf("ISSN"))).as("issn"),
      s(mf("volume").cast("string")).as("volume"),
      s(mf("issue").cast("string")).as("issue"),
      when(length(page) === 0, lit(""))
        .otherwise(trim(substring_index(page, "-", 1))).as("start_page"),
      when(dash === 0, lit(""))
        .otherwise(trim(page.substr(dash + 1, length(page)))).as("end_page"))
  }
}
