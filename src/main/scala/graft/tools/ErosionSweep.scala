package graft.tools

import java.nio.file.{Files, Path}
import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.curation.MetaProcess
import graft.rdf.Checkers

/** Randomized adopted-entity SUPERSET law — closing the r17 graph-erosion
  * bug CLASS, not just its two instances (VERDICT r17, next-round #1).
  *
  * bff1187 fixed entityIds and partOf erosion because those were the two
  * families one sinks receipt happened to expose: an enrichment row with
  * an omitted cell produced a store update that RETRACTED the adopted
  * entity's store triples for that family. The reference can never do
  * that by construction — it loads the existing entity (finder prefetch +
  * the creator's preexisting-graph overlay, `core/creator.py:216-225`)
  * and updates it, so an omitted field is KEPT. The general law for an
  * additive enrichment batch is therefore:
  *
  *   post-batch store graph  ⊇  pre-batch store graph
  *
  * across ALL predicate families (types, titles, dates, identifiers,
  * AR role chains + hasNext, RA names, pages/re, partOf spines, seq ids)
  * — at the triple level there are NO permitted retractions: even the
  * given-name fill (name_check) only ADDS a foaf:givenName triple next
  * to the kept familyName, and store-wins equalizer precedence means a
  * conflicting batch value is discarded, never swapped in.
  *
  * This harness generates a rich fixed base corpus (journals with
  * volume/issue spines, books that double as venues, chapters with
  * container editors, shared authors, family-only names, id-less agents)
  * plus SEEDED RANDOM enrichment batches: each row adopts a base entity
  * by one of its external ids and independently omits/restates/conflicts
  * every other cell (title, authors as subsets/appends/given-name fills,
  * date, venue variants, volume/issue, pages, type, publisher, editor),
  * runs the production MetaProcess update leg, and asserts zero eroded
  * triples plus the provenance invariants. A sequential chain re-checks
  * the law against an EVOLVED store (adoption-created structures as the
  * next batch's store side).
  *
  * Spec twin: MetaProcessSpec runs a fixed-seed subset in the suite;
  * this main sweeps >= 100 batches and commits EROSION_SWEEP.json.
  *
  *   runMain graft.tools.ErosionSweep [nBatches]
  */
object ErosionSweep {

  val T0 = "2026-08-13T00:00:00Z"
  val T1 = "2026-08-14T00:00:00Z"

  // ---- checksum-valid identifier mints ---------------------------------
  // The cleaners validate ORCID (ISO 7064 11-2), ISSN and ISBN-13 check
  // digits (E9) — a generated id must pass or the row silently loses it
  // and the adoption the law depends on never happens.

  private[graft] def mintOrcid(rnd: Random): String = {
    val ds = Array.fill(15)(rnd.nextInt(10))
    var total = 0
    ds.foreach(d => total = (total + d) * 2)
    val rem = total % 11
    val check = (12 - rem) % 11
    val s = ds.mkString
    s"${s.substring(0, 4)}-${s.substring(4, 8)}-${s.substring(8, 12)}-${s.substring(12)}${if (check == 10) "X" else check.toString}"
  }

  private[graft] def mintIssn(rnd: Random): String = {
    val ds = Array.fill(7)(rnd.nextInt(10))
    val sum = ds.zipWithIndex.map { case (d, i) => d * (8 - i) }.sum
    val rem = sum % 11
    val check = if (rem == 0) "0" else if (11 - rem == 10) "X" else (11 - rem).toString
    s"${ds.take(4).mkString}-${ds.drop(4).mkString}$check"
  }

  private[graft] def mintIsbn13(rnd: Random): String = {
    val ds = Array(9, 7, 8) ++ Array.fill(9)(rnd.nextInt(10))
    val sum = ds.zipWithIndex.map { case (d, i) => d * (if (i % 2 == 0) 1 else 3) }.sum
    val check = (10 - sum % 10) % 10
    ds.mkString + check
  }

  // ---- the fixed base corpus -------------------------------------------

  final case class Agent(name: String, orcid: Option[String]) {
    def cell: String = orcid.map(o => s"$name [orcid:$o]").getOrElse(name)
  }

  final case class BaseRec(
      doi: String, title: String, authors: Seq[Agent], date: String,
      venueName: String, venueIds: Seq[String], volume: String, issue: String,
      page: String, typ: String, publisher: String, editors: Seq[Agent]) {
    def venueCell: String =
      if (venueName.isEmpty && venueIds.isEmpty) ""
      else if (venueIds.isEmpty) venueName
      else s"$venueName [${venueIds.mkString(" ")}]"
    def authorCell: String = authors.map(_.cell).mkString("; ")
    def editorCell: String = editors.map(_.cell).mkString("; ")
  }

  /** Deterministic rich base: 2 journals (vol/issue spines), 2 books that
    * double as venues, a name-only proceedings venue, 12 works, shared
    * authors (id and name matched), family-only names (given-name-fill
    * targets), id-less agents, container and direct editors. */
  private[graft] lazy val (baseRecords: Seq[BaseRec], basePool) = {
    val rnd = new Random(0xE05)
    val issnJ1 = s"issn:${mintIssn(rnd)}"
    val issnJ2 = s"issn:${mintIssn(rnd)}"
    val isbnB1 = s"isbn:${mintIsbn13(rnd)}"
    val isbnB2 = s"isbn:${mintIsbn13(rnd)}"
    def oa(name: String) = Agent(name, Some(mintOrcid(rnd)))
    val a1 = oa("Rossi, Marco"); val a2 = oa("Bianchi, Anna")
    val a3 = oa("Verdi, ") // family-only with id -> fill target
    val a4 = Agent("Smith, John", None)
    val a5 = oa("Tanaka, Yuki")
    val a6 = oa("Okafor, ") // second fill target
    val a7 = oa("Müller, Hans")
    val a8 = Agent("Da Silva, Maria", None)
    val a9 = oa("Chen, Wei"); val a10 = oa("Kovacs, Istvan")
    val e1 = oa("Editor, Erin"); val e2 = Agent("Curator, Carl", None)
    val springer = "Springer Science and Business Media LLC [crossref:297]"
    val elsevier = "Elsevier BV [crossref:78]"
    val acm = "Association for Computing Machinery [crossref:320]"
    val j1 = ("Journal of Electric Curation", Seq(issnJ1))
    val j2 = ("Annals of Spark Studies", Seq(issnJ2))
    val b1 = ("Handbook of Graph Stores", Seq(isbnB1))
    val b2 = ("Foundations of Dedup", Seq(isbnB2))
    val recs = Seq(
      BaseRec("doi:10.9901/base.1", "Streamer Corona Under Load", Seq(a1, a2, a3),
        "2004-07", j1._1, j1._2, "12", "3", "100-115", "journal article", springer, Nil),
      BaseRec("doi:10.9901/base.2", "Flux Transport in Sorted Streams", Seq(a4, a5),
        "1998", j1._1, j1._2, "12", "4", "116-130", "journal article", springer, Nil),
      BaseRec("doi:10.9901/base.3", "On the Equalization of Stores", Seq(a2, a6),
        "2011-02-14", j2._1, j2._2, "3", "1", "1-20", "journal article", elsevier, Nil),
      BaseRec("doi:10.9901/base.4", "Adoptive Numbering at Scale", Seq(a7),
        "2015", j2._1, j2._2, "3", "2", "21-44", "journal article", elsevier, Nil),
      BaseRec("doi:10.9901/base.5", "Chapter on Prefetch Overlays", Seq(a8, a9),
        "2006", b1._1, b1._2, "", "", "27-82", "book chapter", springer, Seq(e1)),
      BaseRec("doi:10.9901/base.6", "Chapter on Provenance Chains", Seq(a3, a10),
        "2007-09", b1._1, b1._2, "", "", "83-120", "book chapter", springer, Seq(e1)),
      BaseRec("doi:10.9901/base.7", "Chapter on Page Ranges", Seq(a5),
        "2018", b2._1, b2._2, "", "", "5-30", "book chapter", elsevier, Seq(e2)),
      // the book ITSELF: shares B1's isbn, so the work entity IS the venue
      // entity of records 5/6 (id-CC unification) — its title/date/type
      // then live on a br that is also a partOf parent
      BaseRec("doi:10.9901/base.8", b1._1, Seq(a9),
        "2005", "", Nil, "", "", "", "book", springer, Nil),
      BaseRec("doi:10.9901/base.9", "Columnar Shuffles Considered", Seq(a1, a9),
        "2019-06", "Proceedings of the Parquet Symposium", Nil, "", "", "200-210",
        "proceedings article", acm, Nil),
      BaseRec("doi:10.9901/base.10", "Volumes Without Issues", Seq(a10),
        "2021", j1._1, j1._2, "13", "", "50-60", "journal article", springer, Nil),
      BaseRec("doi:10.9901/base.11", "Articles Without Spines", Seq(a4),
        "2003-12", j2._1, j2._2, "", "", "", "journal article", elsevier, Nil),
      BaseRec("doi:10.9901/base.12", "Editors of the Article Itself", Seq(a6, a7, a9),
        "2020-01-01", j1._1, j1._2, "13", "1", "61-75", "journal article", springer, Seq(e2)))
    (recs, (Seq(a1, a2, a3, a4, a5, a6, a7, a8, a9, a10), Seq(e1, e2)))
  }

  private def q(cell: String): String = "\"" + cell.replace("\"", "\"\"") + "\""

  private def csvOf(rows: Seq[Seq[String]]): String =
    ("\"id\",\"title\",\"author\",\"pub_date\",\"venue\",\"volume\",\"issue\"," +
      "\"page\",\"type\",\"publisher\",\"editor\"\n") +
      rows.map(_.map(q).mkString(",")).mkString("", "\n", "\n")

  private[graft] def baseCsv: String = csvOf(baseRecords.map(r => Seq(
    r.doi, r.title, r.authorCell, r.date, r.venueCell, r.volume, r.issue,
    r.page, r.typ, r.publisher, r.editorCell)))

  // ---- random enrichment batches ---------------------------------------

  /** One enrichment batch: 2-5 rows, each adopting a base record by its
    * doi, every other cell independently omitted / restated / conflicted /
    * enriched; plus (p=0.5) one brand-new work. */
  private[graft] def enrichmentRows(seed: Long): Seq[Seq[String]] = {
    val rnd = new Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val targets = rnd.shuffle(baseRecords).take(2 + rnd.nextInt(4))
    val rows = targets.zipWithIndex.map { case (r, i) =>
      val id = r.doi +
        (if (rnd.nextDouble() < 0.4) s" pmid:9${seed % 100000}${i}0" else "")
      val title = rnd.nextDouble() match {
        case d if d < 0.5 => ""
        case d if d < 0.8 => r.title
        case _            => s"Enriched Title $seed-$i"
      }
      val author = rnd.nextDouble() match {
        case d if d < 0.35 => ""
        case d if d < 0.55 => r.authorCell // full restatement
        case d if d < 0.70 => // prefix subset (sequence-alignment stress)
          r.authors.take(1 + rnd.nextInt(math.max(1, r.authors.length))).map(_.cell).mkString("; ")
        case d if d < 0.80 => // append a new agent after the store prefix
          (r.authors.map(_.cell) :+ s"Appended, Agent$seed$i [orcid:${mintOrcid(rnd)}]").mkString("; ")
        case d if d < 0.90 => // given-name fill: id-matched, completed name
          r.authors.map { a =>
            if (a.name.endsWith(", ") && a.orcid.nonEmpty)
              Agent(a.name + s"Given$i", a.orcid).cell
            else a.cell
          }.mkString("; ")
        case _ => // names only, ids stripped (name-match adoption path)
          r.authors.map(_.name).mkString("; ")
      }
      val date = rnd.nextDouble() match {
        case d if d < 0.5 => ""
        case d if d < 0.8 => r.date
        case _            => pick(Seq("2022", "2022-05", "2019-03-02"))
      }
      val venue = rnd.nextDouble() match {
        case d if d < 0.40 => ""
        case d if d < 0.60 => r.venueCell // full restatement
        case d if d < 0.70 => r.venueName // name only, no ids
        case d if d < 0.80 => // same ids, conflicting display name
          if (r.venueIds.nonEmpty) s"Renamed Venue $seed [${r.venueIds.mkString(" ")}]"
          else r.venueCell
        case _ => // disjoint new venue (store venue must win wholesale)
          s"Fresh Venue $seed-$i [issn:${mintIssn(rnd)}]"
      }
      // volume/issue only mean anything with a venue and a journal type;
      // conflicting values exercise the store-wins equalizer, new values
      // on spine-less records exercise VVI creation under an adopted venue
      def vi(base: String): String =
        if (venue.isEmpty || r.typ != "journal article") ""
        else rnd.nextDouble() match {
          case d if d < 0.5 => ""
          case d if d < 0.8 => base
          case _            => (40 + rnd.nextInt(9)).toString
        }
      val volume = vi(r.volume)
      val issue = vi(r.issue)
      val page = rnd.nextDouble() match {
        case d if d < 0.5 => ""
        case d if d < 0.8 => r.page
        case _            => s"${300 + i}-${320 + i}"
      }
      val typ = rnd.nextDouble() match {
        case d if d < 0.7  => r.typ
        case d if d < 0.9  => ""
        case _ if r.typ == "journal article" => "journal article"
        case _             => "book section" // conflicting but same family
      }
      val publisher = rnd.nextDouble() match {
        case d if d < 0.5 => ""
        case d if d < 0.8 => r.publisher
        case _            => s"New Press $seed [crossref:${1000 + rnd.nextInt(9000)}]"
      }
      val editor = rnd.nextDouble() match {
        case d if d < 0.6 => ""
        case d if d < 0.85 => r.editorCell
        case _            => s"Fresh, Editor$seed$i [orcid:${mintOrcid(rnd)}]"
      }
      Seq(id, title, author, date, venue, volume, issue, page, typ, publisher, editor)
    }
    val extra = if (rnd.nextDouble() < 0.5) Seq(Seq(
      s"doi:10.9902/new.$seed", s"A Brand New Work $seed",
      s"Novel, Author$seed [orcid:${mintOrcid(rnd)}]",
      "2024", "", "", "", s"${10 + rnd.nextInt(80)}-99", "journal article", "", ""))
    else Nil
    rows ++ extra
  }

  // ---- the law ----------------------------------------------------------

  final case class BatchOutcome(seed: Long, nRows: Int, added: Long,
      eroded: Seq[(String, String, String)], provOk: Boolean) {
    def pass: Boolean = eroded.isEmpty && provOk
  }

  private def tset(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.select("s", "p", "o").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def writeBatch(dir: Path, name: String, rows: Seq[Seq[String]]): String = {
    val p = dir.resolve(name)
    Files.writeString(p, csvOf(rows))
    p.toString
  }

  /** Curate the fixed base corpus into a fresh store. */
  private[graft] def baseState(spark: SparkSession, dir: Path): MetaProcess.PipelineState = {
    val f = writeBatch(dir, "abase.csv", baseRecords.map(r => Seq(
      r.doi, r.title, r.authorCell, r.date, r.venueCell, r.volume, r.issue,
      r.page, r.typ, r.publisher, r.editorCell)))
    MetaProcess.run(spark, Seq(f), T0)
  }

  /** Apply one enrichment batch against `state` and evaluate the law.
    * Unpersists the batch's own checkpoint residue so a long sweep's
    * storage footprint stays one store, not one per seed. */
  private[graft] def checkBatch(spark: SparkSession,
      state: MetaProcess.PipelineState, before: Set[(String, String, String)],
      dir: Path, seed: Long,
      keep: Boolean = false): (BatchOutcome, MetaProcess.PipelineState) = {
    val rows = enrichmentRows(seed)
    val f = writeBatch(dir, s"zenrich_$seed.csv", rows)
    val held = spark.sparkContext.getPersistentRDDs.keySet
    val st = MetaProcess.run(spark, Seq(f), T1, state = state)
    val after = tset(st.triples.get)
    val eroded = (before -- after).toSeq.sorted
    val provOk = Checkers.missingProvenance(st.triples.get, st.prov.get).isEmpty &&
      Checkers.openSnapshotInvariant(st.prov.get).isEmpty
    if (!keep) {
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !held.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    (BatchOutcome(seed, rows.size, (after -- before).size.toLong, eroded, provOk),
      if (keep) st else state)
  }

  /** Independent batches (each vs the fixed base store) + one sequential
    * chain (each vs the evolved store — adoption-created structures become
    * the next batch's store side). */
  private[graft] def sweep(spark: SparkSession, seeds: Seq[Long],
      chainSeeds: Seq[Long]): (Seq[BatchOutcome], Seq[BatchOutcome]) = {
    val dir = Files.createTempDirectory("graft_erosion")
    val s1 = baseState(spark, dir)
    val before = tset(s1.triples.get)
    val independent = seeds.map { seed =>
      checkBatch(spark, s1, before, dir, seed)._1
    }
    var st = s1
    var pre = before
    val chained = chainSeeds.map { seed =>
      val (out, next) = checkBatch(spark, st, pre, dir, seed, keep = true)
      st = next
      pre = tset(st.triples.get)
      out
    }
    (independent, chained)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    require(cpus.nonEmpty && cpus.length <= 4 && cpus.forall(_.isDigit) && cpus.toInt > 0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-erosion-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (independent, chained) = sweep(spark, (1L to n.toLong).toSeq,
      (1001L to 1010L).toSeq)
    val sec = (System.nanoTime() - t0) / 1e9
    val all = independent ++ chained
    val failed = all.filterNot(_.pass)
    def row(o: BatchOutcome): String =
      s"""{"seed":${o.seed},"rows":${o.nRows},"added":${o.added},""" +
        s""""eroded":${o.eroded.size},"prov_ok":${o.provOk},"pass":${o.pass}}"""
    val erodedSamples = failed.flatMap(_.eroded.take(3)).take(10)
      .map { case (s, p, o) => s"""{"s":"$s","p":"$p","o":"${o.replace("\"", "'")}"}""" }
    val out =
      s"""{"metric":"erosion_sweep","batches_independent":${independent.size},""" +
        s""""batches_chained":${chained.size},""" +
        s""""rows_total":${all.map(_.nRows).sum},""" +
        s""""adds_total":${all.map(_.added).sum},""" +
        s""""eroded_total":${all.map(_.eroded.size).sum},""" +
        s""""failed_seeds":[${failed.map(_.seed).mkString(",")}],""" +
        s""""eroded_samples":[${erodedSamples.mkString(",")}],""" +
        s""""sec":$sec,"all_pass":${failed.isEmpty},""" +
        s""""per_batch":[${all.map(row).mkString(",")}],""" +
        """"_note":"Adopted-entity superset law (VERDICT r17 #1): seeded random enrichment batches against the fixed rich base store (and a 10-batch sequential chain against the evolving store), each row adopting a base entity by external id with every other cell independently omitted/restated/conflicted/enriched (author subsets+appends+given-name fills+id-stripped names, venue renames/new-issn conflicts, vol-issue conflicts, page/type/publisher/editor variants). Law: post-batch store triples are a SUPERSET of pre-batch triples across ALL predicate families (zero permitted retractions at the triple level - store-wins equalizer discards conflicts, name_check fill only ADDS givenName), plus missingProvenance/openSnapshotInvariant clean. MetaProcessSpec runs the fixed-seed subset in the suite."}"""
    println(out)
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_EROSION_OUT", "EROSION_SWEEP.json")).toAbsolutePath
    try {
      java.nio.file.Files.writeString(outPath, out + "\n")
      System.err.println(s"[erosion] artifact written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[erosion] artifact write FAILED: $e") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
