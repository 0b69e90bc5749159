package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the query
  *    set against the corpus — the correctness baseline (oracle-checked).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign
  *    signature, queries probe their own bucket (plus multi-probe by
  *    flipping low-confidence bits); at cluster scale this turns an
  *    all-pairs O(Q*N*d) into O(Q * bucket * d) with one shuffle on the
  *    bucket key.
  *
  * Vector math is pure `functions._` over array<float> columns (zip_with +
  * aggregate), fully codegen'd — no UDF in the hot path.
  */
object Similarity {

  /** q35 oracle — exact cosine top-k for the first 10 vectors. */
  /** q56 — retrieval evaluation harness: label consistency of the exact
    * top-k neighbors (fraction of a query's k nearest sharing the query's
    * ground-truth `label`). The standard embedding-quality / ANN-sanity
    * metric; same broadcast-queries single-corpus-scan shape as q35, plus
    * one count aggregate. */
  def q56AnnLabelEval(s: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .select($"vec_id".cast("long").as("vec_id"), $"label",
        normalized($"embedding").as("nv"))
      .localCheckpoint()
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"label".as("query_label"), $"nv".as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", round(dot($"nv", $"qv"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .groupBy($"query_id", $"query_label")
      .agg(sum(when($"label" === $"query_label", 1L).otherwise(0L))
        .cast("long").as("n_same"))
      .select($"query_id", $"query_label".cast("long").as("query_label"),
        $"n_same", round($"n_same".cast("double") / k, 6).as("purity"))
      .orderBy($"query_id")
  }

  /** q56 oracle — q35's brute-force shape with the label join. */
  val q56Sql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, label AS query_label, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id < 10
      |), s AS (
      |  SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id, e.label,
      |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s
      |)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      |  CAST(query_label AS BIGINT) AS query_label,
      |  CAST(sum(CASE WHEN label = query_label THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
      |  round(sum(CASE WHEN label = query_label THEN 1 ELSE 0 END)::DOUBLE / 5, 6) AS purity
      |FROM r WHERE rank <= 5 GROUP BY query_id, query_label ORDER BY query_id""".stripMargin

  val q35Sql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
      |), s AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s
      |)
      |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
      |  CAST(neighbor_id AS BIGINT) AS neighbor_id, round(cos, 6) AS cos
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Sum of elementwise products of two double-array columns — a native
    * codegen'd Expression (graft.plans.VectorExpressions.DotProduct); the
    * HOF formulation allocates an intermediate array per pair. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** float[] -> unit-length double[] (so cosine becomes a plain dot). */
  def normalized(v: Column): Column = {
    val dv = transform(v, x => x.cast("double"))
    val n = norm(dv)
    transform(dv, x => x / n)
  }

  /** Exact cosine top-k: first `nQueries` vectors (by vec_id) against the
    * whole corpus. The query side is broadcast — at any scale the query
    * set is the small side, so the corpus is scanned exactly once with no
    * shuffle. Ties broken by neighbor id for determinism. */
  def bruteForceTopK(s: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import s.implicits._
    // materialized so the per-row normalization isn't re-run per (row,query)
    val e = embeddings(s, dir)
      .select($"vec_id".cast("long").as("vec_id"), normalized($"embedding").as("nv"))
      .localCheckpoint()
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"nv".as("qv"))
    // cross-engine float rule: the rank key is the cosine QUANTIZED to 6
    // decimals so a neighbor near-tie cannot order differently between
    // Spark (normalized dot) and DuckDB (raw-vector cosine)
    val scored = e.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", round(dot($"nv", $"qv"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** Random hyperplanes for sign-LSH: `nBits` fixed pseudo-random unit
    * directions per table, seeded and deterministic. */
  private def hyperplanes(dim: Int, nBits: Int, table: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(7 + table * 1009)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Flattened row-major plane matrix (nBits x dim) for the packed
    * verify-prefilter signature — seeded independently of every bucket
    * table ([[hyperplanes]] uses 7 + table*1009; this seed is outside
    * that family), so the prune statistic is unbiased by the collision
    * event that made a pair a candidate. */
  private[graft] def signaturePlanes(dim: Int, nBits: Int): Array[Double] = {
    val rnd = new scala.util.Random(104729)
    Array.fill(nBits * dim)(rnd.nextGaussian())
  }

  /** Sign-signature bucket id of a vector column under table `t`'s
    * hyperplanes: bit i = (v . h_i) >= 0, OR'd with the table id so buckets
    * from different tables never collide. Column-composed REFERENCE form —
    * the hot paths use [[lshBucketsArray]] (one codegen kernel call for
    * all tables); OperatorsSpec pins the two equal per table. */
  def lshBucket(v: Column, dim: Int, nBits: Int, table: Int): Column = {
    val planes = hyperplanes(dim, nBits, table)
    planes.zipWithIndex.map { case (h, i) =>
      val hcol = array(h.map(lit): _*)
      when(dot(v, hcol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _) + lit(table.toLong << 32)
  }

  /** All `nTables` bucket ids as one array<long> column — the multi-table
    * production form of [[lshBucket]]. One [[graft.plans.LshBucketsKernel]]
    * call per row with the flattened plane tensor as a single codegen
    * reference object, where `array(lshBucket(0), ..., lshBucket(L-1))`
    * inlines L*nBits literal plane arrays and blows janino's 64 KB method
    * limit at the auto operating points (L ~ n^rho; the sketch projection
    * then runs INTERPRETED over 500+ boxed references). */
  def lshBucketsArray(v: Column, dim: Int, nBits: Int, nTables: Int): Column =
    graft.plans.VectorExpressions.lshBuckets(v, flatPlanes(dim, nBits, nTables), dim, nBits)

  /** The same nTables x nBits sign bits as [[lshBucketsArray]], bit-packed
    * into ceil(nTables*nBits/64) longs — the per-row collision map for
    * exactly-once pair emission (see
    * [[graft.plans.VectorExpressions.FirstCollidingTable]]). Bit
    * `t*nBits + b` here == bit b of bucket key t (spec-pinned). */
  def lshBucketsPacked(v: Column, dim: Int, nBits: Int, nTables: Int): Column =
    graft.plans.VectorExpressions.lshBucketPack(v, flatPlanes(dim, nBits, nTables), dim, nBits)

  /** Row-major nTables x nBits x dim plane tensor shared by
    * [[lshBucketsArray]] / [[lshBucketsPacked]] — ONE codegen reference
    * object per projection. */
  private def flatPlanes(dim: Int, nBits: Int, nTables: Int): Array[Double] = {
    val flat = new Array[Double](nTables * nBits * dim)
    var t = 0
    while (t < nTables) {
      val hs = hyperplanes(dim, nBits, t)
      var b = 0
      while (b < nBits) {
        System.arraycopy(hs(b), 0, flat, (t * nBits + b) * dim, dim)
        b += 1
      }
      t += 1
    }
    flat
  }

  /** Deterministic spherical k-means for IVF coarse quantization.
    *
    * Init: the `nlist` corpus vectors with the smallest `xxhash64(vec_id)`
    * — a deterministic hash-sample, order-independent and stable across
    * partitionings. Then `iters` Lloyd rounds: centroids are broadcast as
    * literal array columns (nlist x dim doubles — KBs), assignment is a
    * single codegen'd argmax-of-dots scan with NO shuffle, and the
    * per-cluster mean reduces via posexplode + groupBy(cluster, pos) —
    * one narrow shuffle of n*dim scalar rows per round. At 100 TB you
    * train on the hash-sample (`trainFraction`) and only the final
    * assignment pass touches the full corpus.
    *
    * Returns the centroids as driver-side arrays (they ARE the index
    * metadata — nlist x dim, small by construction). */
  def trainCentroids(e: DataFrame, nlist: Int, iters: Int,
      trainFraction: Double = 1.0): Array[Array[Double]] = {
    val s = e.sparkSession
    import s.implicits._
    val sample =
      if (trainFraction >= 1.0) e
      else e.filter(pmod(xxhash64($"vec_id"), lit(1000000)) < lit((trainFraction * 1000000).toLong))
    var cents: Array[Array[Double]] = sample
      .orderBy(xxhash64($"vec_id")).limit(nlist)
      .select($"nv").as[Seq[Double]].collect().map(_.toArray)
    for (_ <- 0 until iters) {
      val assigned = sample.withColumn("cluster", nearestCentroid($"nv", cents))
      val sums = assigned
        .select($"cluster", posexplode($"nv").as(Seq("pos", "v")))
        .groupBy($"cluster", $"pos").agg(sum($"v").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            val dim = rows.length
            val mean = new Array[Double](dim)
            rows.foreach(r => mean(r.getInt(1)) = r.getAs[Double]("s") / r.getAs[Long]("n"))
            val n = math.sqrt(mean.map(x => x * x).sum)
            if (n > 0) mean.map(_ / n) else cents(c) // re-normalize (spherical)
          case None => cents(c) // empty cluster keeps its centroid
        }
      }.toArray
    }
    cents
  }

  /** Codegen'd argmax-of-dot-products: index (0-based) of the centroid with
    * the highest cosine against `v`. Centroids ride along as literal array
    * columns — no join, no shuffle, no UDF. */
  def nearestCentroid(v: Column, cents: Array[Array[Double]]): Column =
    graft.plans.VectorExpressions.nearestCentroid(v, flatCents(cents),
      cents(0).length, rounded = false)

  /** [[nearestCentroid]] with each cosine quantized to 6 decimals before
    * the argmax — the repo's cross-engine float rule for ORACLE-GATED
    * assignments: the DuckDB oracle computes `list_cosine_similarity` on
    * the raw vectors while Spark dots the pre-normalized ones, so a
    * centroid near-tie could otherwise pick different cells per engine.
    * Ties after quantization resolve to the lowest centroid index on both
    * sides (the kernel's first-max, `ORDER BY cos DESC, c` there).
    *
    * Both assignment forms are ONE [[graft.plans.CentroidKernel]] call
    * with the flattened tensor as a codegen reference object: the
    * composed `array(round(dot(v, array(lit...))))` form (kept as the
    * spec-pinned REFERENCE, [[nearestCentroidComposed]]) inlines
    * nlist*dim literal doubles and blows janino's 64 KB method limit at
    * production quantizer sizes (nlist ~ sqrt n — 450 cells at the 100x
    * semantic-dedup point). */
  def nearestCentroidRounded(v: Column, cents: Array[Array[Double]]): Column =
    graft.plans.VectorExpressions.nearestCentroid(v, flatCents(cents),
      cents(0).length, rounded = true)

  /** Column-composed REFERENCE forms of the two assignments — the exact
    * expressions the kernels replaced; OperatorsSpec pins kernel ==
    * composed, cell for cell. Not for hot paths. */
  def nearestCentroidComposed(v: Column, cents: Array[Array[Double]],
      rounded: Boolean): Column = {
    val dots =
      if (rounded) array(cents.map(c => round(dot(v, array(c.map(lit): _*)), 6)): _*)
      else array(cents.map(c => dot(v, array(c.map(lit): _*))): _*)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  private def flatCents(cents: Array[Array[Double]]): Array[Double] = {
    val dim = cents(0).length
    val flat = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      require(cents(c).length == dim, "ragged centroid tensor")
      System.arraycopy(cents(c), 0, flat, c * dim, dim)
      c += 1
    }
    flat
  }

  /** Probe list as a kernel call — `nprobe` centroid indices by
    * (dot desc, index asc), optionally 6-decimal-rounded (the oracle
    * rule). Replaces the per-centroid struct-array sort composition. */
  def centroidProbes(v: Column, cents: Array[Array[Double]], nprobe: Int,
      rounded: Boolean): Column =
    graft.plans.VectorExpressions.centroidProbes(v, flatCents(cents),
      cents(0).length, nprobe, rounded)

  /** ANN top-k via IVF (inverted-file) coarse quantization — the other
    * standard scale path next to [[lshTopK]].
    *
    * The corpus is partitioned into `nlist` Voronoi cells by spherical
    * k-means ([[trainCentroids]]); each query probes its `nprobe` nearest
    * cells and scores exactly within them. Cost per query drops from O(N*d)
    * to O(N*nprobe/nlist*d + nlist*d); the only corpus shuffle is the ONE
    * repartition-by-cell materialization (at cluster scale: write the
    * corpus bucketed by `cluster` once, then every query batch joins
    * against only the probed cells — classic FAISS IVF-Flat layout,
    * re-expressed as a partitioned table + equi-join). Recall is checked
    * against [[bruteForceTopK]] in the spec (approximate op — no SQL
    * oracle; registered rows-only). */
  /** Default IVF operating point, derived from the corpus size (r16 —
    * the old fixed (nlist=8, nprobe=3) default probed 37.5% of the
    * corpus for a measured 0.638 recall at sf0.1, a thin margin over
    * the 0.6 gate): nlist grows ~sqrt(n) (canonical IVF sizing — cell
    * size and cell count balance, so probe cost per query is
    * O(sqrt n * d) either way), nprobe probes [[IvfDefaultProbeFraction]]
    * of the cells. The fraction is grounded by the committed
    * recall-vs-probed-fraction curve in TWIN_GATES.json (100-query
    * sweep vs brute force at sf0.1); the gate there holds the default's
    * recall >= 0.7. Floors keep tiny spec corpora (tens of vectors)
    * from degenerating below the k-means' seed count. */
  val IvfDefaultProbeFraction = 0.355 // sf0.1 sweep: (45,16) = recall 0.746,
  // STRICTLY dominating the old (8,3) point (0.638 recall at 0.375 probed)
  def ivfDefaults(n: Long): (Int, Int) = {
    val nlist = math.max(8, math.round(math.sqrt(n.toDouble)).toInt)
    val nprobe = math.max(3, math.ceil(nlist * IvfDefaultProbeFraction).toInt)
    (nlist, math.min(nlist, nprobe))
  }

  def ivfTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
      nlist: Int = -1, nprobe: Int = -1, iters: Int = 3): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .select($"vec_id".cast("long").as("vec_id"), normalized($"embedding").as("nv"))
      .localCheckpoint()
    // -1 = scale-aware default from the materialized corpus count (the
    // localCheckpoint above is eager, so this is a cached-block count).
    // Resolve nl FIRST, then derive a defaulted np from the EFFECTIVE nl:
    // the r16 shape paired a caller's nlist with a default nprobe computed
    // for the sqrt(n) nlist — e.g. nlist=8, nprobe=-1 on a 2000-vector
    // corpus yielded nprobe=16 > nlist, silently probing every cell and
    // breaking the probe-fraction contract (ADVICE r16).
    val nl = if (nlist > 0) nlist else ivfDefaults(e.count())._1
    val np = if (nprobe > 0) nprobe
      else math.min(nl, math.max(3, math.ceil(nl * IvfDefaultProbeFraction).toInt))
    val cents = trainCentroids(e, nl, iters)
    val corpus = e.withColumn("cluster", nearestCentroid($"nv", cents))
    // per-query probe list: nprobe highest-cosine centroids
    val probed = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"nv".as("qv"))
      .select($"query_id", $"qv",
        explode(centroidProbes($"qv", cents, np, rounded = false)).as("cluster"))
    val scored = corpus.join(broadcast(probed), Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(dot($"nv", $"qv"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** q43_exact oracle — the deterministic-seed IVF below is exact within
    * its probed cells, so DuckDB can replay it: same seed list (the first
    * `nlist` vectors), same argmax assignment with index tie-break, same
    * top-`nprobe` probe list, exact top-k inside the probed union. */
  val q43ExactSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |seeds AS (SELECT vec_id AS c, v AS cv FROM e ORDER BY vec_id LIMIT 8),
      |assign AS (
      |  SELECT vec_id, c AS cluster FROM (
      |    SELECT e.vec_id, s.c,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, s.cv), 6) DESC, s.c) AS rn
      |    FROM e, seeds s) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, c AS cluster FROM (
      |    SELECT e.vec_id, s.c,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, s.cv), 6) DESC, s.c) AS rn
      |    FROM e, seeds s WHERE e.vec_id < 10) WHERE rn <= 3),
      |cand AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id
      |  FROM probes p JOIN assign a USING (cluster)
      |  WHERE a.vec_id <> p.query_id),
      |scored AS (
      |  SELECT c.query_id, c.neighbor_id,
      |    round(list_cosine_similarity(ev.v, qv.v), 6) AS cos
      |  FROM cand c JOIN e ev ON ev.vec_id = c.neighbor_id
      |    JOIN e qv ON qv.vec_id = c.query_id),
      |r AS (SELECT *, row_number() OVER (
      |  PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
      |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
      |  CAST(neighbor_id AS BIGINT) AS neighbor_id, round(cos, 6) AS cos
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Driver-gated IVF variant: identical plan shape to [[ivfTopK]] (argmax
    * assignment scan with literal centroids, probe join, windowed top-k)
    * but the coarse quantizer is fully deterministic AND SQL-expressible —
    * the seed centroids are the first `nlist` corpus vectors instead of
    * k-means output, so the DuckDB oracle ([[q43ExactSql]]) can replay the
    * whole computation and hash-match it. [[ivfTopK]] (trained centroids,
    * recall-gated in the spec) stays the production quantizer; this
    * variant proves the IVF machinery — assignment, probe selection,
    * within-cell exact scoring — against an independent engine. */
  def ivfTopKExact(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
      nlist: Int = 8, nprobe: Int = 3): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .select($"vec_id".cast("long").as("vec_id"), normalized($"embedding").as("nv"))
      .localCheckpoint()
    // seed centroids: nlist x dim — index metadata by construction. First
    // nlist rows in vec_id ORDER (not `vec_id < nlist`), so sparse or
    // offset ids still yield nlist real centroids (q57 seed rule).
    val cents: Array[Array[Double]] = e.orderBy($"vec_id").limit(nlist)
      .select($"nv").as[Seq[Double]].collect().map(_.toArray)
    require(cents.nonEmpty, s"ivfTopKExact: no embeddings found under $dir")
    val corpus = e.withColumn("cluster", nearestCentroidRounded($"nv", cents))
    // probe list sorted by (cos desc, centroid index asc) — the oracle's
    // tie-break, and the same first-max rule the ROUNDED argmax applies
    // (assignment and probe ordering both quantize to 6 decimals so the
    // oracle replays them bit-identically)
    val probed = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"nv".as("qv"))
      .select($"query_id", $"qv",
        explode(centroidProbes($"qv", cents, nprobe, rounded = true)).as("cluster"))
    val scored = corpus.join(broadcast(probed), Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(dot($"nv", $"qv"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** ANN top-k via multi-table random-hyperplane LSH.
    *
    * `nTables` independent signatures; a corpus vector is a candidate for a
    * query if they share a bucket in ANY table (union via explode over the
    * per-table bucket array + distinct). Recall/(compute) is tuned by
    * (nBits, nTables): more bits -> smaller buckets, more tables -> more
    * probes. For sign-LSH the per-bit collision probability is
    * 1 - theta/pi, so at cos=0.5, nBits=4, nTables=8 expected recall is
    * ~0.85 while scanning ~half the corpus per query — the knob that turns
    * an O(Q*N) scan into O(Q*N/2^bits*L) at cluster scale, where the
    * shuffle key is (bucket) and the query side is broadcast. Checked
    * against [[bruteForceTopK]] in the spec rather than the SQL oracle. */
  def lshTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
      dim: Int = 64, nBits: Int = 4, nTables: Int = 8): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .select($"vec_id".cast("long").as("vec_id"), normalized($"embedding").as("nv"))
      .localCheckpoint()
      .withColumn("bucket",
        explode(lshBucketsArray($"nv", dim, nBits, nTables)))
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"nv".as("qv"), $"bucket")
    val cand = e.join(broadcast(queries), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"qv", $"vec_id", $"nv")
      .dropDuplicates("query_id", "vec_id")
    val scored = cand.withColumn("cos", round(dot($"nv", $"qv"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"query_id", $"rank")
  }
}
