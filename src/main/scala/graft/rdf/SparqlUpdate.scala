package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SPARQL UPDATE emission (SURVEY §2.1 S5).
  *
  * The reference pushes INSERT/DELETE batches at a triplestore endpoint
  * (`run/meta_process.py:346-397`); the Spark-native equivalent keeps the
  * store as the managed `triples` table (GraphDiff MERGE) and, for
  * interop with an external endpoint, EMITS the same batched update
  * strings as files — the reference's own file-emission option — instead
  * of speaking HTTP from executors. A loader replays the files in
  * (delete, insert) order; batch composition carries no semantics in
  * either engine (every batch is applied), so batches are formed by a
  * hash of the subject — a narrow, skew-free shuffle — rather than a
  * global row_number, which would funnel the whole delta through one
  * window task at corpus scale.
  */
object SparqlUpdate {

  /** Render an (adds, dels) triple delta as SPARQL UPDATE strings.
    *
    * @return one row per (kind, batch): kind "delete" rows are
    *         `DELETE DATA { GRAPH <g> { ... } }`, kind "insert" rows
    *         `INSERT DATA { ... }`, ~`batchTriples` triples each.
    */
  def updateStrings(adds: DataFrame, dels: DataFrame, graph: String,
      batchTriples: Int = 100): DataFrame = {
    val spark = adds.sparkSession
    import spark.implicits._
    def render(df: DataFrame, kind: String, verb: String): DataFrame = {
      val n = df.count()
      val nBatches = math.max(1L, (n + batchTriples - 1) / batchTriples)
      Serialization.toNTriples(df)
        .select(lit(kind).as("kind"),
          pmod(xxhash64($"value"), lit(nBatches)).as("batch"), $"value")
        .groupBy($"kind", $"batch")
        .agg(concat(lit(s"$verb { GRAPH <$graph> {\n"),
          concat_ws("\n", sort_array(collect_list($"value"))),
          lit("\n} }")).as("update"))
    }
    render(dels, "delete", "DELETE DATA")
      .unionByName(render(adds, "insert", "INSERT DATA"))
      .orderBy($"kind", $"batch")
  }

  /** Write the update strings as one text file per (kind, batch) under
    * `outDir/kind=.../` — deletes and inserts separated so a replayer can
    * apply all deletes first, like the reference's two-phase upload. */
  def writeUpdates(adds: DataFrame, dels: DataFrame, graph: String,
      outDir: String, batchTriples: Int = 100): Unit =
    writeStrings(updateStrings(adds, dels, graph, batchTriples), outDir)

  /** [[writeUpdates]] for an already-rendered [[updateStrings]] frame —
    * callers that also push the same strings over HTTP render once. */
  def writeStrings(updates: DataFrame, outDir: String): Unit =
    updates
      .select($("kind"), $("update").as("value"))
      .write.mode("overwrite").partitionBy("kind").text(outDir)

  private def $(c: String) = col(c)
}
