package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF serialization sources/sinks (SURVEY §2.1 S7/S9/S10).
  *
  *  - N-Triples/N-Quads: line-oriented text render + parser — the
  *    reference's migration tooling (`run/migration/rdf_to_nquads.py`,
  *    `stream_nquads.py`) as `df.write.text` with an optional gzip codec
  *    and a regex scan on read. The parser also loads the reference's
  *    `.nt` triplestore seed fixtures.
  *  - JSON-LD: the OCDM dump layout — entities routed to
  *    `{n/dirSplit}/{n/itemsPerFile}` buckets (`lib/file_manager.py:31-44`
  *    dir-split arithmetic) via `partitionBy`, one JSON-LD node document
  *    per line ('@id', '@type', predicate -> [{'@id'} | {'@value','@type'}]).
  */
object Serialization {

  // ---- N-Triples / N-Quads (S10) ----------------------------------------

  private def escapeLiteral(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(c,
      "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n")

  /** Render (s,p,o,o_datatype) as N-Triples lines (or N-Quads when a graph
    * IRI is supplied). */
  def toNTriples(triples: DataFrame, graph: Option[String] = None): DataFrame = {
    import triples.sparkSession.implicits._
    val obj = when($"o_datatype".isNull, concat(lit("<"), $"o", lit(">")))
      .otherwise(concat(lit("\""), escapeLiteral($"o"), lit("\"^^<"), $"o_datatype", lit(">")))
    val g = graph.map(gu => concat(lit(" <"), lit(gu), lit(">"))).getOrElse(lit(""))
    triples.select(concat(
      lit("<"), $"s", lit("> <"), $"p", lit("> "), obj, g, lit(" .")).as("value"))
  }

  /** Single left-to-right pass over N-Triples string escapes — chained
    * global replaces corrupt literals like `\\n` (escaped backslash
    * followed by 'n'), which must round-trip as backslash+n, not newline. */
  private[rdf] def unescapeLiteral(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't'  => sb.append('\t'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case '"'  => sb.append('"');  i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 6 <= s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' if i + 10 <= s.length =>
            sb.append(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val NtLine = ("^<([^>]+)>\\s+<([^>]+)>\\s+" +
    "(?:<([^>]+)>|\"((?:[^\"\\\\]|\\\\.)*)\"(?:\\^\\^<([^>]+)>)?(?:@[A-Za-z-]+)?)" +
    "\\s*(?:<[^>]+>\\s*)?\\.\\s*$").r

  /** Parse N-Triples/N-Quads text into (s,p,o,o_datatype). Lines that are
    * comments/blank/unparseable are dropped (the reference's converters
    * skip malformed lines the same way). Plain literals get xsd:string. */
  def fromNTriples(lines: DataFrame): DataFrame = {
    import lines.sparkSession.implicits._
    val parsed = lines.select(col(lines.columns.head).as("line"))
      .as[String]
      .flatMap {
        case NtLine(s, p, iri, lit_, dt) =>
          if (iri != null) Some((s, p, iri, null.asInstanceOf[String]))
          else Some((s, p, unescapeLiteral(lit_),
            if (dt != null) dt else Vocab.XsdString))
        case _ => None
      }
    parsed.toDF("s", "p", "o", "o_datatype")
  }

  /** Read .nt/.nq files (optionally gzipped — Hadoop codecs handle the
    * extension) into the triples frame. */
  def readNTriples(spark: SparkSession, path: String): DataFrame =
    fromNTriples(spark.read.text(path))

  /** Write N-Quads text with gzip (the migration tool's output shape). */
  def writeNQuads(triples: DataFrame, graph: String, outDir: String): Unit =
    toNTriples(triples, Some(graph)).write.mode("overwrite")
      .option("compression", "gzip").text(outDir)

  // ---- JSON-LD (S7 read / S9 write) -------------------------------------

  /** One JSON-LD node document per entity, partitioned by the reference's
    * dir-split buckets. */
  def writeJsonLd(triples: DataFrame, outDir: String,
      dirSplit: Long = 10000, itemsPerFile: Long = 1000): Unit = {
    import triples.sparkSession.implicits._
    val obj = when($"o_datatype".isNull,
      to_json(struct($"o".as("@id"))))
      .otherwise(to_json(struct($"o".as("@value"), $"o_datatype".as("@type"))))
    val perPred = triples
      .withColumn("ov", obj)
      .groupBy($"s", $"p").agg(concat_ws(",", sort_array(collect_list($"ov"))).as("vals"))
      .select($"s", concat(lit("\""), $"p", lit("\":["), $"vals", lit("]")).as("pv"))
    val docs = perPred.groupBy($"s")
      .agg(concat_ws(",", sort_array(collect_list($"pv"))).as("body"))
      .withColumn("doc", concat(lit("{\"@id\":\""), $"s", lit("\","), $"body", lit("}")))
    val n = regexp_extract($"s", "(\\d+)$", 1).cast("long")
    docs
      .withColumn("dir_bucket", (n / dirSplit).cast("long") * dirSplit + dirSplit)
      .withColumn("file_bucket", (n / itemsPerFile).cast("long") * itemsPerFile + itemsPerFile)
      .select($"dir_bucket", $"file_bucket", $"doc")
      .write.mode("overwrite")
      .partitionBy("dir_bucket", "file_bucket")
      .text(outDir)
  }

  /** Read JSON-LD node documents back into (s,p,o,o_datatype). Parsed
    * with json4s (on Spark's classpath) because predicate keys are
    * dynamic and value shapes heterogeneous ('@id' refs vs typed
    * literals) — no static from_json schema fits. */
  def readJsonLd(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.text(s"$path/*/*").as[String]
    raw.flatMap { line =>
      import org.json4s._
      org.json4s.jackson.JsonMethods.parseOpt(line).toSeq.flatMap {
        case JObject(fields) =>
          val id = fields.collectFirst { case ("@id", JString(v)) => v }.getOrElse("")
          fields.collect {
            case (p, JArray(vals)) if p != "@id" =>
              vals.collect {
                case JObject(vf) =>
                  val ref = vf.collectFirst { case ("@id", JString(v)) => v }
                  val value = vf.collectFirst { case ("@value", JString(v)) => v }
                  val dt = vf.collectFirst { case ("@type", JString(v)) => v }
                  (id, p, ref.orElse(value).getOrElse(""),
                    if (ref.isDefined) null else dt.getOrElse(Vocab.XsdString))
              }
          }.flatten
        case _ => Seq.empty
      }
    }.toDF("s", "p", "o", "o_datatype")
  }
}
