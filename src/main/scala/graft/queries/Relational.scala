package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.util.Exact._

/** Relational operator inventory from SURVEY.md §2.2–§2.8: projections,
  * filters, joins, aggregations, windows, set ops, scalar functions.
  *
  * Design rules applied throughout (100 TB posture):
  *  - declarative `functions._` only → whole-stage codegen, pushdown, pruning;
  *  - small dimensions broadcast explicitly; fact-fact joins shuffle on keys;
  *  - every output carries a deterministic ORDER BY + tiebreak so results are
  *    reproducible regardless of partitioning;
  *  - float outputs derive from exact decimal intermediates (see
  *    [[graft.util.Exact]]).
  */
object Relational {

  /** q1: pricing-summary aggregation (reference A4/A5-style value_counts and
    * group means, scaled to the classic flag/status rollup).
    * Map-side partial aggregation + single shuffle on the 6-value group key.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(BigDecimal(1)) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2: star join lineitem⋈orders⋈customer⋈nation⋈region → revenue per
    * region (reference J1/J2 equi-join chain). region/nation are tiny and
    * broadcast; customer is broadcast below the 10 MB default at bench SF and
    * left to AQE above it; lineitem⋈orders shuffles on the order key.
    */
  def q2JoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val o  = Tables(spark, dir, "orders")
    val c  = Tables(spark, dir, "customer")
    val n  = Tables(spark, dir, "nation")
    val r  = Tables(spark, dir, "region")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        sum(dec($"l_extendedprice") * (lit(BigDecimal(1)) - dec($"l_discount")))
          .cast("double").as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"r_name")
  }

  val q2Sql: String =
    """SELECT r_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q3: selective filter + narrow projection (reference P1/P6; TPC-H Q6
    * shape). Both the predicate and the 3-column read schema reach the
    * parquet scan — the plan must show PushedFilters on l_shipdate.
    */
  def q3FilterRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
             .cast("double").as("revenue"),
           count(lit(1)).as("n"))
  }

  val q3Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** q4: keyed dedup keep-LAST (reference J3, link_extractor.py:558 — later
    * record wins). Spark has no ordered dropDuplicates, so the exact
    * semantics are a row_number window over an explicit arrival order —
    * one shuffle on the dedup key, no O(n²).
    */
  def q4DedupKeepLast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type")
      .orderBy($"user_id")
  }

  val q4Sql: String =
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q5: unkeyed full-row dedup (reference J4, drop_duplicates after column
    * drop). Hash aggregate on all columns — no window needed.
    */
  def q5Distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"lang", $"source")
      .dropDuplicates()
      .orderBy($"lang", $"source")
  }

  val q5Sql: String =
    "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source"

  /** q6: top-k per group (reference W1/W3 medoid/top-term selection shape).
    * row_number over (group, ordered metric) — single shuffle, no global sort
    * of the fact table; ties broken by key for determinism (§7.4.1).
    */
  def q6TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rk")
  }

  val q6Sql: String =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin

  /** q7: group stats broadcast back to row grain (reference A5/A6 —
    * groupby().transform('count'/'mean')). Window aggregates avoid the
    * self-join a naive translation would do.
    */
  def q7GroupBroadcast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
    Tables(spark, dir, "events")
      .withColumn("user_events", count(lit(1)).over(w))
      .withColumn("user_avg_value",
        sum(dec($"value")).over(w).cast("double") / count(lit(1)).over(w))
      .select($"event_id", $"user_id", $"user_events", $"user_avg_value")
      .orderBy($"event_id")
  }

  val q7Sql: String =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER (PARTITION BY user_id) AS user_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE)
      |    / COUNT(*) OVER (PARTITION BY user_id) AS user_avg_value
      |FROM events ORDER BY event_id""".stripMargin

  /** q8: union of per-source extracts + keyed keep-last dedup (reference
    * S6/U1/J3 — three engines fanned out, flattened, later engine wins).
    * unionByName keeps it schema-safe; the dedup is the q4 window pattern
    * keyed on an explicit engine ordinal.
    */
  def q8UnionDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
    def engine(tpe: String, ord: Int) =
      ev.filter($"event_type" === tpe)
        .select($"user_id", $"event_id", lit(ord).as("engine"))
    val all = engine("click", 1)
      .unionByName(engine("view", 2))
      .unionByName(engine("purchase", 3))
    val w = Window.partitionBy($"user_id").orderBy($"engine".desc, $"event_id".desc)
    all.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"engine", $"event_id")
      .orderBy($"user_id")
  }

  val q8Sql: String =
    """SELECT user_id, engine, event_id FROM (
      |  SELECT user_id, engine, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY engine DESC, event_id DESC) AS rn
      |  FROM (
      |    SELECT user_id, event_id, 1 AS engine FROM events WHERE event_type = 'click'
      |    UNION ALL
      |    SELECT user_id, event_id, 2 AS engine FROM events WHERE event_type = 'view'
      |    UNION ALL
      |    SELECT user_id, event_id, 3 AS engine FROM events WHERE event_type = 'purchase'
      |  ) u) t WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q9: longest-of-two coalesce incl. the tie→'' quirk (reference P12,
    * content_cleaner.py:98-118), then the se-title override. Pure `when`
    * chain — fully codegen'd, no UDF.
    */
  def q9CoalesceLongest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merged = when(length($"p_name") > length($"p_type"), $"p_name")
      .when(length($"p_name") < length($"p_type"), $"p_type")
      .otherwise(lit(""))
    Tables(spark, dir, "part")
      .withColumn("merged0", merged)
      .withColumn("merged",
        when(length($"p_brand") > length($"merged0"), $"p_brand")
          .otherwise($"merged0"))
      .select($"p_partkey", $"merged")
      .orderBy($"p_partkey")
  }

  val q9Sql: String =
    """SELECT p_partkey,
      |  CASE WHEN LENGTH(p_brand) > LENGTH(m) THEN p_brand ELSE m END AS merged
      |FROM (
      |  SELECT p_partkey, p_brand,
      |    CASE WHEN LENGTH(p_name) > LENGTH(p_type) THEN p_name
      |         WHEN LENGTH(p_name) < LENGTH(p_type) THEN p_type
      |         ELSE '' END AS m
      |  FROM part) t ORDER BY p_partkey""".stripMargin

  /** q10: explode text to words + frequency count (reference F22 explode +
    * word-count core of the topic pipeline). generate → partial-agg →
    * shuffle on word; at 100 TB the map-side combine keeps the shuffle
    * proportional to vocabulary, not corpus.
    */
  def q10WordCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word")
  }

  val q10Sql: String =
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) t
      |WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word""".stripMargin

  /** q11: regex group extract from a JSON-ish props string (reference F4,
    * yahoo RU=(.+)/RK link extraction shape) + bucketed rollup.
    */
  def q11RegexExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .withColumn("k", regexp_extract($"props", "\"k\": (\\d+)", 1).cast("long"))
      .withColumn("k_bucket", $"k" % 10)
      .groupBy($"k_bucket")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"k_bucket")
  }

  val q11Sql: String =
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** q12: md5 fingerprint of text (reference F6 — page-change detection
    * hash). Content-hash is also the exact-dedup key (see Dedup module).
    */
  def q12Md5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"doc_id", md5($"text").as("text_md5"))
      .orderBy($"doc_id")
  }

  val q12Sql: String =
    "SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id"

  /** q13: date arithmetic + formatting (reference F8 — arrow shift(months)
    * → yyyyMMdd window strings). add_months clamps to month end in both
    * engines.
    */
  def q13DateArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .withColumn("order_month", date_format($"o_orderdate", "yyyy-MM"))
      .withColumn("due", date_format(add_months($"o_orderdate", 3), "yyyyMMdd"))
      .groupBy($"order_month")
      .agg(count(lit(1)).as("n"),
           min($"due").as("first_due"),
           dsum($"o_totalprice").as("month_total"))
      .orderBy($"order_month")
  }

  val q13Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
      |  COUNT(*) AS n,
      |  MIN(strftime(o_orderdate + INTERVAL 3 MONTH, '%Y%m%d')) AS first_due,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
      |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin

  /** q14: group-agg-argmax (reference A1/A9 — pick the parent hierarchy with
    * the max summed text length). max over a (metric, key) struct == max_by
    * with a deterministic tiebreak, computed in one aggregation pass.
    */
  def q14ArgMax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"lang").orderBy($"total_chars".desc, $"source")
    Tables(spark, dir, "documents")
      .groupBy($"lang", $"source")
      .agg(sum($"n_chars").as("total_chars"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lang", $"source", $"total_chars")
      .orderBy($"lang")
  }

  val q14Sql: String =
    """SELECT lang, source, total_chars FROM (
      |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY SUM(n_chars) DESC, source) AS rn
      |  FROM documents GROUP BY lang, source) t
      |WHERE rn = 1 ORDER BY lang""".stripMargin
}
