package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.embeddings

/** Persisted IVF-Flat ANN index — the build-once / probe-many production
  * form of [[Similarity.ivfTopK]] (which documents this layout in prose;
  * this is the layout, materialized).
  *
  * The classic FAISS IVF-Flat structure re-expressed Spark-native:
  *
  *  - '''build''' — ONE full-corpus pass assigns every vector to its
  *    nearest coarse centroid and writes the corpus
  *    `partitionBy("cluster")`: each inverted list IS a partition
  *    directory, and the tiny (nlist x dim) centroid table rides next to
  *    it. At 100 TB this is the only full-corpus shuffle the index ever
  *    costs; it amortizes over every later query batch.
  *  - '''probe''' — a query batch computes its `nprobe` nearest centroids
  *    driver-side-free (centroid table is collected — nlist rows, index
  *    metadata by construction), then equi-joins the partitioned corpus on
  *    `cluster` with the probe list broadcast. Catalyst's dynamic
  *    partition pruning turns the broadcast side into a partition filter,
  *    so the scan reads ONLY the probed inverted lists — the
  *    O(N*nprobe/nlist) cost model of IVF, enforced by the storage layout
  *    instead of a runtime filter.
  *
  * With `deterministicSeeds` the quantizer is the q43_exact rule (seeds =
  * first nlist vectors by vec_id, rounded argmax, index tie-break), so the
  * whole build+probe chain replays in the DuckDB oracle
  * ([[Similarity.q43ExactSql]]) and is hash-gated — a persisted-index ANN
  * with an exact cross-engine oracle. Production builds flip to k-means
  * centroids ([[Similarity.trainCentroids]]) with the same layout. */
object IvfIndex {

  /** Build the index under `indexDir` (`corpus/` partitioned by cluster,
    * `centroids/` as (c, cv) rows). Overwrites — rebuilds are idempotent. */
  def build(s: SparkSession, sfDir: String, indexDir: String, nlist: Int = 8,
      deterministicSeeds: Boolean = true, iters: Int = 3): Unit = {
    import s.implicits._
    val e = embeddings(s, sfDir)
      .select($"vec_id".cast("long").as("vec_id"),
        Similarity.normalized($"embedding").as("nv"))
      .localCheckpoint()
    val cents: Array[Array[Double]] =
      if (deterministicSeeds)
        e.orderBy($"vec_id").limit(nlist)
          .select($"nv").as[Seq[Double]].collect().map(_.toArray)
      else Similarity.trainCentroids(e, nlist, iters)
    require(cents.nonEmpty, s"IvfIndex.build: no embeddings under $sfDir")
    s.createDataset(cents.toIndexedSeq.zipWithIndex
        .map { case (cv, c) => (c, cv.toIndexedSeq) })
      .toDF("c", "cv")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    e.withColumn("cluster", Similarity.nearestCentroidRounded($"nv", cents))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$indexDir/corpus")
  }

  /** Incremental maintenance: assign a batch of NEW vectors with the
    * index's PERSISTED centroids and append them to the partitioned
    * corpus — no rebuild, no full-corpus shuffle; the only cost is the
    * new batch's assignment scan and its partitioned write. The
    * quantizer is frozen (classic IVF practice: centroids drift slowly;
    * rebuild on a cadence, append in between), so probes see old and new
    * vectors through the same cell geometry. `newVectors` needs
    * (`vec_id`, `embedding`); ids are the caller's contract — append
    * does not dedupe against the existing corpus (pair an anti-join in
    * front when re-ingestion is possible). */
  def append(s: SparkSession, indexDir: String, newVectors: DataFrame): Unit = {
    import s.implicits._
    val cents: Array[Array[Double]] = s.read.parquet(s"$indexDir/centroids")
      .orderBy($"c").select($"cv").as[Seq[Double]].collect().map(_.toArray)
    require(cents.nonEmpty, s"IvfIndex.append: no centroids under $indexDir")
    newVectors
      .select($"vec_id".cast("long").as("vec_id"),
        Similarity.normalized($"embedding").as("nv"))
      .withColumn("cluster", Similarity.nearestCentroidRounded($"nv", cents))
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$indexDir/corpus")
  }

  /** Probe the index with `queries` (`query_id`, `qv` normalized): exact
    * top-k within the `nprobe` nearest cells per query. Same output
    * contract as [[Similarity.ivfTopKExact]]. */
  def probe(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 3): DataFrame = {
    import s.implicits._
    val cents: Array[Array[Double]] = s.read.parquet(s"$indexDir/centroids")
      .orderBy($"c").select($"cv").as[Seq[Double]].collect().map(_.toArray)
    val corpus = s.read.parquet(s"$indexDir/corpus")
    // probe list sorted by (cos desc, centroid index asc) — the rounded
    // argmax/oracle tie-break rule, same as ivfTopKExact; one
    // CentroidKernel call, tensor as a codegen reference object
    val probed = queries
      .select($"query_id", $"qv",
        explode(Similarity.centroidProbes($"qv", cents, nprobe, rounded = true))
          .as("cluster"))
    val scored = corpus.join(broadcast(probed), Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(Similarity.dot($"nv", $"qv"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"query_id", $"rank")
  }

  // One deterministic-seed index per (sfDir, nlist) per JVM: repeated
  // q43Indexed invocations (bench ladders, query-registry loops) reuse
  // the build instead of writing a fresh full-corpus copy each time —
  // the build is idempotent for fixed seeds, so reuse is exact. The
  // temp dir stays unique per JVM (concurrent JVMs never share a path)
  // and ONE shutdown hook reaps every cached index.
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      indexCache.values().forEach { dir =>
        try {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(dir)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Exception => () }
      }))

  /** The registered q43_ann_ivf_indexed entry: deterministic-seed build
    * into a per-(corpus, nlist) cached temp dir (built once per JVM),
    * then probe with the first 10 vectors — output identical to
    * [[Similarity.ivfTopKExact]], gated by the SAME DuckDB oracle
    * ([[Similarity.q43ExactSql]]). */
  def q43Indexed(s: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 5,
      nlist: Int = 8, nprobe: Int = 3): DataFrame = {
    import s.implicits._
    cleanupHook
    val indexDir = indexCache.computeIfAbsent((sfDir, nlist), _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
      build(s, sfDir, dir, nlist)
      dir
    })
    val queries = embeddings(s, sfDir)
      .select($"vec_id".cast("long").as("vec_id"),
        Similarity.normalized($"embedding").as("nv"))
      .filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"nv".as("qv"))
    probe(s, indexDir, queries, k, nprobe)
  }
}
