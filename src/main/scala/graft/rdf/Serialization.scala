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

  private def escapeLiteral(c: org.apache.spark.sql.Column) = {
    // \r and \t must be escaped symmetrically with unescapeLiteral: a raw
    // carriage return would be split by Hadoop's line reader on re-read,
    // silently losing the triple.
    val esc = Seq("\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"",
      "\n" -> "\\\\n", "\r" -> "\\\\r", "\t" -> "\\\\t")
    esc.foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }
  }

  /** Render (s,p,o,o_datatype) as N-Triples lines (or N-Quads when a graph
    * IRI is supplied). */
  def toNTriples(triples: DataFrame, graph: Option[String] = None): DataFrame = {
    import triples.sparkSession.implicits._
    val obj = when($"o_datatype".isNull, concat(lit("<"), $"o", lit(">")))
      .when($"o_datatype".startsWith(Vocab.LangStringPrefix),
        concat(lit("\""), escapeLiteral($"o"), lit("\"@"),
          substring_index($"o_datatype", "@", -1)))
      .otherwise(concat(lit("\""), escapeLiteral($"o"), lit("\"^^<"), $"o_datatype", lit(">")))
    val g = graph.map(gu => concat(lit(" <"), lit(gu), lit(">"))).getOrElse(lit(""))
    triples.select(concat(
      lit("<"), $"s", lit("> <"), $"p", lit("> "), obj, g, lit(" .")).as("value"))
  }

  private def isHex(s: String, from: Int, n: Int): Boolean = {
    var i = from
    while (i < from + n) {
      if (Character.digit(s.charAt(i), 16) < 0) return false
      i += 1
    }
    true
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
          case 'u' if i + 6 <= s.length && isHex(s, i + 2, 4) =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' if i + 10 <= s.length && isHex(s, i + 2, 8) &&
              Character.isValidCodePoint(java.lang.Long.parseLong(s.substring(i + 2, i + 10), 16).toInt) =>
            sb.append(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val NtLine = ("^<([^>]+)>\\s+<([^>]+)>\\s+" +
    "(?:<([^>]+)>|\"((?:[^\"\\\\]|\\\\.)*)\"" +
    "(?:\\^\\^<([^>]+)>|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))?)" +
    "\\s*(?:<[^>]+>\\s*)?\\.\\s*$").r

  /** Parse N-Triples/N-Quads text into (s,p,o,o_datatype). Lines that are
    * comments/blank/unparseable are dropped (the reference's converters
    * skip malformed lines the same way); `^^<dt>` and `@lang` are
    * mutually exclusive per the N-Triples grammar, so a line carrying
    * both is malformed and dropped. Plain literals get xsd:string;
    * language-tagged ones `rdf:langString@tag` (mirrors [[fromNQuads]]). */
  def fromNTriples(lines: DataFrame): DataFrame = {
    import lines.sparkSession.implicits._
    val parsed = lines.select(col(lines.columns.head).as("line"))
      .as[String]
      .flatMap {
        case NtLine(s, p, iri, lit_, dt, lang) =>
          if (iri != null) Some((s, p, iri, null.asInstanceOf[String]))
          else Some((s, p, unescapeLiteral(lit_),
            if (lang != null) Vocab.LangStringPrefix + lang
            else if (dt != null) dt
            else Vocab.XsdString))
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

  // ---- Turtle subset reader (S10 companion; loads .ttl seed fixtures) ---

  /** Parse the Turtle subset used by the reference's testcase seeds
    * (`test/testcases/ts/` .ttl fixtures): @prefix declarations,
    * `a`, `;`/`,` lists, IRIs, prefixed names, plain and `^^`-typed string
    * literals. Driver-side (seeds are KB-sized fixtures); returns
    * (s, p, o, o_datatype) rows — plain literals get xsd:string. */
  def parseTurtle(text: String): Seq[(String, String, String, String)] = {
    // tokenizer
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && text.charAt(i) != '\n') i += 1 }
      else if (c == '<') { val j = text.indexOf('>', i); toks += text.substring(i, j + 1); i = j + 1 }
      else if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < n && text.charAt(i) != '"') {
          if (text.charAt(i) == '\\' && i + 1 < n) { sb.append(text.charAt(i)).append(text.charAt(i + 1)); i += 2 }
          else { sb.append(text.charAt(i)); i += 1 }
        }
        sb.append('"'); i += 1
        // optional ^^datatype suffix glued to the literal token
        if (i + 1 < n && text.charAt(i) == '^' && text.charAt(i + 1) == '^') {
          sb.append("^^"); i += 2
          if (i < n && text.charAt(i) == '<') { val j = text.indexOf('>', i); sb.append(text.substring(i, j + 1)); i = j + 1 }
          else { while (i < n && !text.charAt(i).isWhitespace && !";,.".contains(text.charAt(i))) { sb.append(text.charAt(i)); i += 1 } }
        }
        toks += sb.toString
      }
      else if (c == ';' || c == ',') { toks += c.toString; i += 1 }
      else if (c == '.' && (i + 1 >= n || text.charAt(i + 1).isWhitespace)) { toks += "."; i += 1 }
      else {
        val sb = new StringBuilder
        while (i < n && !text.charAt(i).isWhitespace && !";,".contains(text.charAt(i)) &&
            !(text.charAt(i) == '.' && (i + 1 >= n || text.charAt(i + 1).isWhitespace))) {
          sb.append(text.charAt(i)); i += 1
        }
        toks += sb.toString
      }
    }
    // parser
    val prefixes = scala.collection.mutable.Map.empty[String, String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
    def resolve(t: String): String =
      if (t.startsWith("<")) t.substring(1, t.length - 1)
      else if (t == "a") Vocab.RdfType
      else {
        val ci = t.indexOf(':')
        prefixes.getOrElse(t.substring(0, ci + 1), "") + t.substring(ci + 1)
      }
    var k = 0
    while (k < toks.length) {
      if (toks(k) == "@prefix") {
        prefixes(toks(k + 1)) = toks(k + 2).substring(1, toks(k + 2).length - 1)
        k += 4 // @prefix ns: <iri> .
      } else {
        val s = resolve(toks(k)); k += 1
        var stop = false
        while (!stop) {
          val p = resolve(toks(k)); k += 1
          var more = true
          while (more) {
            val ot = toks(k); k += 1
            if (ot.startsWith("\"")) {
              val endQ = ot.lastIndexOf('"')
              val lit = unescapeLiteral(ot.substring(1, endQ))
              val dt = if (endQ + 3 <= ot.length && ot.startsWith("^^", endQ + 1)) {
                val d = ot.substring(endQ + 3)
                if (d.startsWith("<")) d.substring(1, d.length - 1) else resolve(d)
              } else Vocab.XsdString
              out += ((s, p, lit, dt))
            } else out += ((s, p, resolve(ot), null))
            if (k < toks.length && toks(k) == ",") { k += 1 } else more = false
          }
          if (k < toks.length && toks(k) == ";") {
            k += 1
            if (k < toks.length && toks(k) == ".") { k += 1; stop = true } // trailing ;.
          } else { if (k < toks.length && toks(k) == ".") k += 1; stop = true }
        }
      }
    }
    out.toSeq
  }

  /** Read a .ttl fixture into the triples frame. */
  def readTurtle(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    parseTurtle(text).toDF("s", "p", "o", "o_datatype")
  }

  // ---- JSON-LD (S7 read / S9 write) -------------------------------------

  /** One JSON-LD node document per entity, partitioned by the reference's
    * dir-split buckets. */
  def writeJsonLd(triples: DataFrame, outDir: String,
      dirSplit: Long = 10000, itemsPerFile: Long = 1000,
      numberPattern: String = "(\\d+)$"): Unit = {
    import triples.sparkSession.implicits._
    val obj = when($"o_datatype".isNull,
      to_json(struct($"o".as("@id"))))
      .when($"o_datatype".startsWith(Vocab.LangStringPrefix),
        to_json(struct($"o".as("@value"),
          substring_index($"o_datatype", "@", -1).as("@language"))))
      .otherwise(to_json(struct($"o".as("@value"), $"o_datatype".as("@type"))))
    val perPred = triples
      .withColumn("ov", obj)
      .groupBy($"s", $"p").agg(concat_ws(",", sort_array(collect_list($"ov"))).as("vals"))
      .select($"s", concat(lit("\""), $"p", lit("\":["), $"vals", lit("]")).as("pv"))
    val docs = perPred.groupBy($"s")
      .agg(concat_ws(",", sort_array(collect_list($"pv"))).as("body"))
      .withColumn("doc", concat(lit("{\"@id\":\""), $"s", lit("\","), $"body", lit("}")))
    // when(rlike) guard: under ANSI mode a bare cast throws on the empty
    // string regexp_extract yields for a subject with no number; such
    // subjects land in bucket 0 instead of failing the whole write
    val n = coalesce(when($"s".rlike(numberPattern),
      regexp_extract($"s", numberPattern, 1).cast("long")), lit(0L))
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
                  val lang = vf.collectFirst { case ("@language", JString(v)) => v }
                  (id, p, ref.orElse(value).getOrElse(""),
                    if (ref.isDefined) null
                    else lang.map(Vocab.LangStringPrefix + _)
                      .orElse(dt).getOrElse(Vocab.XsdString))
              }
          }.flatten
        case _ => Seq.empty
      }
    }.toDF("s", "p", "o", "o_datatype")
  }

  // ---- N-Quads export ⇄ dir-split JSON-LD tree (S10 compose) ------------
  // The reference's migration pair: `run/migration/rdf_from_export.py`
  // (N-Quads dump -> per-entity dir-split JSON-LD files, provenance
  // bucketed with its OWNING entity via find_paths) and
  // `run/migration/stream_nquads.py` (the tree back to one N-Quads
  // stream, data/prov/all modes). Both reference tools are per-file
  // multiprocess loops over rdflib graphs; here each direction is ONE
  // distributed plan over the triples frame.

  // ^^<dt> and @lang are mutually exclusive alternatives (N-Quads
  // grammar); the tag follows BCP-47 shape [A-Za-z]+(-[A-Za-z0-9]+)* —
  // a line carrying both, or an illegal tag like @9/@-en, is malformed
  // and dropped rather than silently coerced.
  private val NqLine = ("^<([^>]+)>\\s+<([^>]+)>\\s+" +
    "(?:<([^>]+)>|\"((?:[^\"\\\\]|\\\\.)*)\"" +
    "(?:\\^\\^<([^>]+)>|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))?)" +
    "\\s*(?:<([^>]+)>\\s*)?\\.\\s*$").r

  /** Graph-aware N-Quads parse: (s,p,o,o_datatype,g); triple lines with
    * no graph term get a null g. Language-tagged literals (`"x"@en`)
    * keep their tag as `rdf:langString@en` in o_datatype
    * ([[Vocab.LangStringPrefix]]) so [[toNQuads]] round-trips them like
    * the reference's rdflib pipeline. Malformed lines are dropped like
    * [[fromNTriples]]. */
  def fromNQuads(lines: DataFrame): DataFrame = {
    import lines.sparkSession.implicits._
    lines.select(col(lines.columns.head).as("line"))
      .as[String]
      .flatMap {
        case NqLine(s, p, iri, lit_, dt, lang, g) =>
          if (iri != null) Some((s, p, iri, null.asInstanceOf[String], g))
          else {
            val datatype =
              if (lang != null) Vocab.LangStringPrefix + lang
              else if (dt != null) dt
              else Vocab.XsdString
            Some((s, p, unescapeLiteral(lit_), datatype, g))
          }
        case _ => None
      }
      .toDF("s", "p", "o", "o_datatype", "g")
  }

  /** Render (s,p,o,o_datatype,g) as N-Quads lines with the per-row graph
    * (null g -> plain triple line); `langString@tag` datatypes re-emit
    * as `"lit"@tag`. */
  def toNQuads(quads: DataFrame): DataFrame = {
    import quads.sparkSession.implicits._
    val obj = when($"o_datatype".isNull, concat(lit("<"), $"o", lit(">")))
      .when($"o_datatype".startsWith(Vocab.LangStringPrefix),
        concat(lit("\""), escapeLiteral($"o"), lit("\"@"),
          substring_index($"o_datatype", "@", -1)))
      .otherwise(concat(lit("\""), escapeLiteral($"o"), lit("\"^^<"), $"o_datatype", lit(">")))
    val g = when($"g".isNull, lit("")).otherwise(concat(lit(" <"), $"g", lit(">")))
    quads.select(concat(
      lit("<"), $"s", lit("> <"), $"p", lit("> "), obj, g, lit(" .")).as("value"))
  }

  private val ProvSnapshotRe = "/prov/se/\\d+$"

  /** `rdf_from_export.py`: an N-Quads export (plain or .gz — Hadoop
    * codecs) becomes the dir-split JSON-LD tree: entity documents under
    * `data/`, provenance snapshots under `prov/` bucketed by the OWNING
    * entity's number (the reference's find_paths puts `se` files inside
    * the entity's bucket dir). */
  def migrateNQuadsToTree(spark: SparkSession, nqPath: String, outDir: String,
      dirSplit: Long = 10000, itemsPerFile: Long = 1000): Unit = {
    import spark.implicits._
    val quads = fromNQuads(spark.read.text(nqPath)).localCheckpoint()
    val isProv = $"s".rlike(ProvSnapshotRe)
    writeJsonLd(quads.filter(!isProv).drop("g"), s"$outDir/data",
      dirSplit, itemsPerFile)
    writeJsonLd(quads.filter(isProv).drop("g"), s"$outDir/prov",
      dirSplit, itemsPerFile, numberPattern = "(\\d+)/prov/se/\\d+$")
  }

  /** `stream_nquads.py`: the dir-split tree back to one N-Quads frame.
    * `mode` mirrors the tool's `--mode all|data|prov`. Graph names follow
    * the OCDM layout the reference dumps use: data rows live in the
    * entity-kind graph `{base}/{kind}/`, provenance rows in their
    * entity's `{entity}/prov/` graph. */
  def treeToNQuads(spark: SparkSession, treeDir: String,
      mode: String = "all"): DataFrame = {
    import spark.implicits._
    val kindGraph = concat(lit(Vocab.BaseIri + "/"),
      regexp_extract($"s",
        "^" + java.util.regex.Pattern.quote(Vocab.BaseIri) + "/([a-z]+)/", 1),
      lit("/"))
    lazy val data = readJsonLd(spark, s"$treeDir/data").withColumn("g", kindGraph)
    lazy val prov = readJsonLd(spark, s"$treeDir/prov")
      .withColumn("g", concat(
        regexp_extract($"s", "^(.*)/prov/se/\\d+$", 1), lit("/prov/")))
    val quads = mode match {
      case "data" => data
      case "prov" => prov
      case _      => data.unionByName(prov)
    }
    toNQuads(quads)
  }
}
