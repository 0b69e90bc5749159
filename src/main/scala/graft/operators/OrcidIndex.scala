package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORCID DOI-index builder — the reference's `run/orcid_process.py:19-110`
  * (IndexOrcidDoi over ORCID XML summary dumps) as a distributed scan:
  * one row per summary file (`wholetext` read, so a 100 TB dump is just
  * many file-splits across executors), regex field extraction instead of
  * a per-file BeautifulSoup parse, and the same `CSVManager` "id","value"
  * sink the downstream converter pipelines read.
  *
  * Record semantics mirrored from the reference:
  *  - the ORCID comes from the FILE NAME (`orcid_pattern`,
  *    master_of_regex.py:75);
  *  - author display = "Family, Given [orcid]" with the name parts
  *    optional (`_extract_name`, orcid_process.py:103-112);
  *  - only `common:external-id` blocks with type `doi` and relationship
  *    `self` count (orcid_process.py:85-98);
  *  - DOIs are normalised (strip resolver prefixes / doi: scheme,
  *    lowercase, must look like `10.X/Y`) — the offline arm of
  *    `DOIManager.normalise`;
  *  - a summary with no valid DOI still lands in the index under the
  *    literal id "None" (orcid_process.py:99-100).
  */
object OrcidIndex {

  private val OrcidPattern = "([0-9]{4}-){3}[0-9]{3}[0-9X]"

  /** Offline DOI normalisation: resolver/scheme prefixes off, lowercase,
    * `10.<registrant>/<suffix>` shape required. */
  def normalizeDoi(c: Column): Column = {
    val stripped = lower(trim(regexp_replace(c,
      "(?i)^\\s*(https?://(dx\\.)?doi\\.org/|doi:\\s*)", "")))
    when(stripped.rlike("^10\\.[0-9]{4,}[^\\s/]*/\\S+$"), stripped)
      .otherwise(lit(null).cast("string"))
  }

  /** One row per summary XML: (orcid, name, dois array). `path` accepts
    * Hadoop globs (recursive dir walk, S8). */
  def readSummaries(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").textFile(path).toDF("xml")
      .withColumn("file", input_file_name())
    val fam = regexp_extract($"xml",
      "(?s)<personal-details:family-name>(.*?)</personal-details:family-name>", 1)
    val giv = regexp_extract($"xml",
      "(?s)<personal-details:given-names>(.*?)</personal-details:given-names>", 1)
    raw
      .withColumn("orcid", regexp_extract($"file", OrcidPattern, 0))
      .filter(length($"orcid") > 0)
      .withColumn("family", fam).withColumn("given", giv)
      .withColumn("name",
        when(length($"family") > 0 && length($"given") > 0,
          concat($"family", lit(", "), $"given"))
          .when(length($"family") > 0, $"family")
          .when(length($"given") > 0, $"given")
          .otherwise(lit(null).cast("string")))
      .withColumn("blocks", expr(
        "regexp_extract_all(xml, '(?s)<common:external-id>(.*?)</common:external-id>', 1)"))
      .withColumn("dois", array_distinct(filter(transform(
        filter($"blocks", b =>
          regexp_extract(b, "(?s)<common:external-id-type>\\s*(.*?)\\s*</common:external-id-type>", 1) === "doi" &&
          regexp_extract(b, "(?s)<common:external-id-relationship>\\s*(.*?)\\s*</common:external-id-relationship>", 1) === "self"),
        b => normalizeDoi(regexp_extract(b,
          "(?s)<common:external-id-value>\\s*(.*?)\\s*</common:external-id-value>", 1))),
        d => d.isNotNull)))
      .select($"orcid", $"name", $"dois")
  }

  /** The CSVManager index frame: (id, value) — id = normalised DOI (or
    * "None" for DOI-less summaries), value = "Name [orcid]" / "[orcid]".
    * Distinct like `CSVManager.add_value`'s per-id value set. */
  def doiIndex(summaries: DataFrame): DataFrame = {
    import summaries.sparkSession.implicits._
    val author = when($"name".isNotNull,
      concat($"name", lit(" ["), $"orcid", lit("]")))
      .otherwise(concat(lit("["), $"orcid", lit("]")))
    summaries
      .select(explode(when(size($"dois") > 0, $"dois")
        .otherwise(array(lit("None")))).as("id"), author.as("value"))
      .distinct()
  }

  /** The `CSVManager` sink: "id","value" CSV chunks. */
  def writeIndex(index: DataFrame, outDir: String): Unit =
    index.orderBy("id", "value").write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").csv(outDir)

  /** Enrichment consumer (the reference feeds this index to its converter
    * pipelines): curated author mentions that carry a DOI but no ORCID
    * adopt the index author's ORCID when the family name matches
    * case-insensitively and, if both sides have a given name, the given
    * initials agree — the conservative subset of the converter's
    * name-similarity match. `authors` = (doi, author_name) with
    * author_name "Family, Given". Returns (doi, author_name, orcid). */
  def enrichAuthors(authors: DataFrame, index: DataFrame): DataFrame = {
    import authors.sparkSession.implicits._
    val parsed = index
      .filter($"id" =!= "None")
      .select($"id".as("doi"),
        regexp_extract($"value", "^(.*?)\\s*\\[", 1).as("ix_name"),
        regexp_extract($"value", OrcidPattern, 0).as("orcid"))
      .filter(length($"ix_name") > 0)
    def famOf(c: Column) = lower(trim(substring_index(c, ",", 1)))
    def givOf(c: Column) = lower(trim(when(c.contains(","),
      expr(s"substring(${c.toString()}, instr(${c.toString()}, ',') + 1)")).otherwise(lit(""))))
    authors.join(parsed, Seq("doi"))
      .filter(famOf($"author_name") === famOf($"ix_name") &&
        (givOf($"author_name") === "" || givOf($"ix_name") === "" ||
          substring(givOf($"author_name"), 1, 1) === substring(givOf($"ix_name"), 1, 1)))
      .select($"doi", $"author_name", $"orcid")
  }
}
