package graft.curation

import org.apache.spark.sql.SparkSession

/** CLI entry point for the fresh-load curation slice (SURVEY §7.5):
  *
  *   runMain graft.curation.CurateJob <input.csv> <outDir> [prefix]
  *
  * Writes `<outDir>/curated/` (11-column curated CSV), plus the index
  * tables `index_id_br/`, `index_id_ra/`, `index_ar/`, `index_re/`,
  * `index_vi/` — the same artifacts the reference's `Curator.indexer`
  * emits (curator.py:1045-1101).
  */
object CurateJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateJob <input.csv> <outDir> [prefix]")
    val Array(input, outDir) = args.take(2)
    val prefix = if (args.length > 2) args(2) else "060"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batch = Curator.curateFresh(Curator.readInput(spark, input), prefix)
    def writeCsv(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .option("quoteAll", "true").csv(s"$outDir/$name")

    writeCsv(batch.rows.select("id", "title", "author", "pub_date", "venue",
      "volume", "issue", "page", "type", "publisher", "editor"), "curated")
    writeCsv(batch.indexIdBr, "index_id_br")
    writeCsv(batch.indexIdRa, "index_id_ra")
    writeCsv(batch.arIndex, "index_ar")
    writeCsv(batch.reIndex, "index_re")
    writeCsv(batch.vviIndex.na.fill(""), "index_vi")
    println(s"[curate] wrote ${batch.rows.count()} curated rows to $outDir")
    spark.stop()
  }
}
