package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational operator suite over the driver test tables.
  *
  * Each query maps one or more operators from SURVEY.md §2 (scan/filter,
  * equi-join incl. semi/anti, aggregation, window, set ops, dedup, string
  * and date expressions) onto the TPC-H-ish tables so the DuckDB oracle can
  * check it. Conventions for cross-engine determinism:
  *
  *   - double measures are cast to DECIMAL(18,2) *before* aggregation: the
  *     parquet doubles are money-like values within 1e-12 of a 2-decimal
  *     value, so the cast recovers the exact decimal in both engines and the
  *     sum becomes order-independent integer arithmetic. Results are cast
  *     back to double only when still exactly representable (< 2^53 cents).
  *   - integer outputs are cast to BIGINT (parquet has a mix of i32/i64).
  *   - timestamps are rendered as 'yyyy-MM-dd' strings at the boundary.
  *   - every result carries a total ORDER BY so row order is well-defined
  *     regardless of how the driver hashes.
  *
  * Scale posture: joins against region/nation/part/supplier/customer are
  * broadcast (dimension side is tiny relative to fact tables at any SF);
  * fact-fact joins (orders⋈lineitem) are left to sort-merge + AQE, keyed on
  * the natural join key so the shuffle is one exchange on each side.
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** q01 — G1/G5: grouped multi-aggregate scan (TPC-H Q1 shape).
    * Ref: oc_meta counting suite `run/count/meta_entities.py`, benchmark
    * aggregates `run/meta_process.py:499-546`. */
  def q01Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).cast("long").as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — S1/F-family: projection + predicate pushdown to the parquet scan.
    * Ref: row filters `core/curator.py:130-141`. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter($"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .select(
        $"l_orderkey".cast("long").as("l_orderkey"),
        $"l_linenumber".cast("long").as("l_linenumber"),
        dec($"l_extendedprice").cast("double").as("price"),
        dec($"l_discount").cast("double").as("disc"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Sql: String =
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03 — J1/J2: fact⋈fact equi-join + grouped revenue, top-N.
    * orders⋈lineitem is the one genuinely large join: shuffle on orderkey,
    * AQE decides broadcast at small SF. Ref: id→entity joins
    * `lib/finder.py:130-177`. */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    val l = lineitem(s, dir)
    o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey")
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
        .cast("double").as("revenue"))
      .select($"o_custkey".cast("long").as("custkey"), $"revenue")
      .orderBy($"revenue".desc, $"custkey")
      .limit(20)
  }

  val q03Sql: String =
    """SELECT CAST(o_custkey AS BIGINT) AS custkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_custkey
      |ORDER BY revenue DESC, custkey
      |LIMIT 20""".stripMargin

  /** q04 — J8 shape: LEFT SEMI join (EXISTS). Orders having any high-quantity
    * line, counted per priority. Ref: `run/meta/preprocess_input.py:49-123`. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    val l = lineitem(s, dir).filter($"l_quantity" >= 48).select($"l_orderkey")
    o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy($"o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q05 — J9 shape: LEFT ANTI join (NOT EXISTS): customers without orders.
    * Ref: processed-omid anti-join `run/meta/generate_csv.py:111-115`. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = customer(s, dir)
    val o = orders(s, dir).filter($"o_totalprice" > 250000).select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey".cast("long").as("c_custkey"), $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q05Sql: String =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin

  /** q06 — W2/W4: ranking window, top-3 orders per customer by totalprice.
    * Ref: snapshot ordering `lib/finder.py:227-233`. */
  def q06WindowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select(
        $"o_custkey".cast("long").as("custkey"),
        $"rn".cast("long").as("rn"),
        $"o_orderkey".cast("long").as("orderkey"),
        dec($"o_totalprice").cast("double").as("totalprice"))
      .orderBy($"custkey", $"rn")
  }

  val q06Sql: String =
    """SELECT CAST(o_custkey AS BIGINT) AS custkey, CAST(rn AS BIGINT) AS rn,
      |  CAST(o_orderkey AS BIGINT) AS orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
      |WHERE rn <= 3
      |ORDER BY custkey, rn""".stripMargin

  /** q07 — F6: duplicate collapse, LAST row wins (reference keeps the last
    * occurrence per id, `core/curator.py:333`). Emulated with a descending
    * row_number per (user_id, event_type) over (ts, event_id). */
  def q07DedupLastWins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"user_id".cast("long").as("user_id"),
        $"event_type",
        $"event_id".cast("long").as("last_event_id"),
        dec($"value").cast("double").as("last_value"))
      .orderBy($"user_id", $"event_type")
  }

  val q07Sql: String =
    """SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
      |  CAST(event_id AS BIGINT) AS last_event_id,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** q08 — G4: exact distinct counting per group.
    * Ref: `run/count/meta_entities.py`. */
  def q08DistinctCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").cast("long").as("users"),
        count(lit(1)).cast("long").as("n"))
      .orderBy($"event_type")
  }

  val q08Sql: String =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q09 — J-chain: 4-way dimension join with broadcast of the small sides.
    * region and nation are broadcast explicitly; customer joins orders on
    * the shuffled key. Ref: VVI 3-table resolution `lib/finder.py:835-1004`. */
  def q09MultiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = region(s, dir)
    val n = nation(s, dir)
    val c = customer(s, dir)
    val o = orders(s, dir)
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(dec($"o_totalprice")).cast("double").as("total"),
        count(lit(1)).cast("long").as("orders"))
      .orderBy($"r_name", $"n_name")
  }

  val q09Sql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  CAST(count(*) AS BIGINT) AS orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q10 — set operations (INTERSECT/EXCEPT), J8/J9 composition: customers
    * with both open and finished orders vs only-open. */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey").distinct()
    val open = o.filter($"o_orderstatus" === "O").select($"o_custkey").distinct()
    val both = open.intersect(f).withColumn("tag", lit("both"))
    val onlyOpen = open.except(f).withColumn("tag", lit("only_open"))
    both.union(onlyOpen)
      .select($"o_custkey".cast("long").as("custkey"), $"tag")
      .orderBy($"tag", $"custkey")
  }

  val q10Sql: String =
    """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |  o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |  both_t AS (SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM o INTERSECT SELECT o_custkey FROM f)),
      |  only_o AS (SELECT o_custkey, 'only_open' AS tag FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f))
      |SELECT CAST(o_custkey AS BIGINT) AS custkey, tag
      |FROM (SELECT * FROM both_t UNION ALL SELECT * FROM only_o)
      |ORDER BY tag, custkey""".stripMargin
}
