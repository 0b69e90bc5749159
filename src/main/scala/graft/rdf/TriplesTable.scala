package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the persisted `triples` table (SURVEY §7.1/§4).
  *
  * The store is written partitioned by predicate: every curation-time
  * lookup joins on a fixed predicate set (hasIdentifier, hasLiteralValue,
  * partOf, ...), so predicate partitioning turns the reference's
  * hand-built reverse PO->S index for hot predicates (finder.py:87-98)
  * into ordinary partition pruning — a `p = <pred>` filter reads exactly
  * one directory. Within a partition, files are sorted by `o` so
  * object-side lookups benefit from parquet min/max row-group skipping
  * (the "bucketed by (p,o) copy" of SURVEY §1.1 without a second copy).
  *
  * Predicates are directory-encoded by a short stable name; unknown
  * predicates fall into a hashed bucket to bound partition count at any
  * scale.
  */
object TriplesTable {

  private val KnownPredicates: Map[String, String] = Map(
    Vocab.RdfType -> "type",
    Vocab.HasIdentifier -> "has_id",
    Vocab.UsesIdentifierScheme -> "id_scheme",
    Vocab.HasLiteralValue -> "id_value",
    Vocab.Title -> "title",
    Vocab.PublicationDate -> "pub_date",
    Vocab.IsDocumentContextFor -> "doc_ctx",
    Vocab.WithRole -> "with_role",
    Vocab.IsHeldBy -> "held_by",
    Vocab.HasNext -> "has_next",
    Vocab.PartOf -> "part_of",
    Vocab.Embodiment -> "embodiment",
    Vocab.StartingPage -> "start_page",
    Vocab.EndingPage -> "end_page",
    Vocab.HasSequenceIdentifier -> "seq_id",
    Vocab.FoafName -> "name",
    Vocab.FoafFamilyName -> "family_name",
    Vocab.FoafGivenName -> "given_name",
  )

  private def bucketCol = {
    val m = typedLit(KnownPredicates)
    coalesce(m(col("p")), concat(lit("x"), pmod(xxhash64(col("p")), lit(16))))
  }

  def write(triples: DataFrame, path: String): Unit =
    triples
      .withColumn("p_bucket", bucketCol)
      .repartition(col("p_bucket"))
      .sortWithinPartitions(col("o"))
      .write.mode("overwrite")
      .partitionBy("p_bucket")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("p_bucket")

  /** Predicate-restricted scan: filtering through the bucket column keeps
    * partition pruning visible to the file index (a filter on `p` alone
    * would scan every directory). */
  def scanPredicate(spark: SparkSession, path: String, predicate: String): DataFrame = {
    // Unknown predicates must land on the SAME bucket write() used —
    // compute it with the identical Spark expression on a one-row frame
    // (driver-local, no reimplementation drift vs xxhash64).
    val bucket = KnownPredicates.getOrElse(predicate, {
      import spark.implicits._
      Seq(predicate).toDF("p")
        .select(concat(lit("x"), pmod(xxhash64(col("p")), lit(16))).as("b"))
        .head().getString(0)
    })
    spark.read.parquet(path)
      .filter(col("p_bucket") === bucket && col("p") === predicate)
      .drop("p_bucket")
  }
}
