package graft

import graft.functions.CrossEngine._
import graft.gold.Gold
import graft.operators.{AsOfJoin, Casting, Dedup, Rule, Upsert, Validation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.immutable.ListMap

/** One named query per operator in SURVEY.md §2, each with an ANSI-SQL
  * twin the driver runs in DuckDB over the same parquet files.
  *
  * Cross-engine determinism rules applied throughout:
  *   - double aggregates over fixed-decimal data use
  *     [[graft.functions.CrossEngine]] fixed-point builders (float sums
  *     are order-dependent, and cent data hits decimal halves where
  *     engines' round() disagree) — the oracle SQL is generated from
  *     the same spec so the two sides can never drift;
  *   - dates are emitted as ISO strings (date objects deserialize
  *     differently per reader);
  *   - computed integers use the same width on both sides (Spark
  *     count/sum are i64; DuckDB sum(BIGINT) is HUGEINT → cast);
  *   - no arbitrary-winner semantics: dedup/top-k carry explicit
  *     tie-breaks; rank() ties are kept identically on both sides;
  *   - events.ts (parquet ns) is truncated to µs on read; oracles use
  *     date/hour parts only.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revSql = "l_extendedprice * (1 - l_discount)"

  /** Validation rules used by the error-histogram / rejected-rows
    * queries (thresholds chosen to actually fire on the testdata). */
  val lineitemRules: Seq[Rule] = Seq(
    Rule(col("l_quantity") > 45, "QTY_ABOVE_MAX"),
    Rule(col("l_discount") > 0.08, "DISCOUNT_ABOVE_MAX"),
    Rule(col("l_tax") > 0.06, "TAX_ABOVE_MAX"))

  private val lineitemRulesSql =
    """CASE WHEN l_quantity > 45 THEN 'QTY_ABOVE_MAX' END,
      | CASE WHEN l_discount > 0.08 THEN 'DISCOUNT_ABOVE_MAX' END,
      | CASE WHEN l_tax > 0.06 THEN 'TAX_ABOVE_MAX' END""".stripMargin

  final case class QueryDef(fn: Q, oracle: Option[String])

  /** q_excel_roundtrip's workbook fixture: 200 orders rows exported to
    * two .xlsx files, built ONCE per (content generation of
    * orders.parquet) into a fresh temp dir. Keyed on the LISTING TAG
    * of the source parquet, not its path: a path key would serve a
    * stale workbook after an in-JVM fixture regeneration (the exact
    * round-7 failure mode the MV caches' parquetTag exists for) — the
    * oracle would read the NEW rows while the query round-trips the
    * OLD ones, a spurious hash mismatch dressed as a codec bug. */
  private val excelFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def excelFixtureDir(c: Ctx): String =
    excelFixtures.computeIfAbsent(
      s"${c.dir}:${QueriesAnalytics.parquetTag(s"${c.dir}/orders.parquet")}",
      _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
      val src = c.orders.orderBy("o_orderkey").limit(200)
        .select(col("o_orderkey"), col("o_orderstatus"),
                col("o_orderdate").cast(DateType).as("o_date"),
                col("o_orderdate").cast(TimestampType).as("o_ts"),
                col("o_totalprice"),
                (col("o_orderkey") % 2 === 0).as("even"))
      val header = src.columns.toSeq
      val (a, b) = src.collect().toSeq.map(_.toSeq).splitAt(100)
      Seq("part1.xlsx" -> a, "part2.xlsx" -> b).foreach { case (f, rows) =>
        val out = new java.io.FileOutputStream(s"$dir/$f")
        try graft.sources.ExcelSource.write(header, rows, out)
        finally out.close()
      }
      dir
    })

  private def q(fn: Ctx => DataFrame, oracle: String): QueryDef =
    QueryDef((s, dir) => fn(Ctx(s, dir)), Some(oracle).filter(_.nonEmpty))

  val defs: ListMap[String, QueryDef] = ListMap(

    // ── aggregations (SURVEY §2.4) ────────────────────────────────────
    "q_pricing_summary" -> q(
      c => c.lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          exactSum(col("l_quantity"), 2, 2).as("sum_qty"),
          exactSum(col("l_extendedprice"), 2, 2).as("sum_base_price"),
          exactSum(rev, 4, 2).as("sum_disc_price"),
          exactAvg(col("l_quantity"), 2, 4).as("avg_qty"),
          exactAvg(col("l_extendedprice"), 2, 4).as("avg_price"),
          count(lit(1)).as("count_order")),
      s"""SELECT l_returnflag, l_linestatus,
        | ${exactSumSql("l_quantity", 2, 2)} AS sum_qty,
        | ${exactSumSql("l_extendedprice", 2, 2)} AS sum_base_price,
        | ${exactSumSql(revSql, 4, 2)} AS sum_disc_price,
        | ${exactAvgSql("l_quantity", 2, 4)} AS avg_qty,
        | ${exactAvgSql("l_extendedprice", 2, 4)} AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),

    "q_daily_sales" -> q(
      Gold.dailySales,
      s"""SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | ${exactSumSql("o_totalprice", 2, 2)} AS total_sales,
        | count(DISTINCT o_orderkey) AS order_count,
        | ${exactAvgSql("o_totalprice", 2, 4)} AS avg_order_value,
        | count(DISTINCT o_custkey) AS unique_customers,
        | count(*) AS total_items,
        | floor(CAST(count(*) AS DOUBLE) / count(DISTINCT o_orderkey) * 10000 + 0.5) / 10000
        |   AS items_per_order
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin),

    "q_product_performance" -> q(
      Gold.productPerformance,
      s"""SELECT p_partkey, p_name, p_brand,
        | count(*) AS times_purchased,
        | ${exactSumSql(revSql, 4, 2)} AS total_revenue,
        | count(DISTINCT l_orderkey) AS order_count,
        | ${exactAvgSql("l_quantity", 2, 4)} AS avg_quantity,
        | ${exactAvgSql("l_discount", 2, 4)} AS avg_discount
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2, 3""".stripMargin),

    "q_department_analytics" -> q(
      Gold.departmentAnalytics,
      s"""SELECT p_brand,
        | ${exactSumSql(revSql, 4, 2)} AS total_revenue,
        | count(DISTINCT p_partkey) AS unique_parts,
        | count(DISTINCT o_orderkey) AS unique_orders,
        | count(DISTINCT o_custkey) AS unique_customers,
        | ${exactAvgSql(revSql, 4, 4)} AS avg_item_revenue
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin),

    "q_customer_insights" -> q(
      Gold.customerInsights,
      s"""WITH um AS (
        | SELECT o_custkey AS custkey,
        |  count(DISTINCT o_orderkey) AS total_orders,
        |  ${exactSumSql("o_totalprice", 2, 2)} AS total_spent,
        |  ${exactAvgSql("o_totalprice", 2, 4)} AS avg_order_value,
        |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_order_date,
        |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_date,
        |  CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '${Gold.AnchorDate}') AS INTEGER)
        |    AS days_since_last_order
        | FROM orders GROUP BY 1
        |), um2 AS (
        | SELECT *, CASE WHEN total_orders > 10 THEN 'Loyal'
        |   WHEN total_orders > 5 AND days_since_last_order <= 30 THEN 'Active'
        |   WHEN total_orders > 1 AND days_since_last_order <= 90 THEN 'Regular'
        |   WHEN days_since_last_order > 90 THEN 'Lapsed'
        |   ELSE 'New' END AS customer_segment
        | FROM um
        |), pc AS (
        | SELECT o_custkey AS custkey, l_partkey, count(*) AS purchase_count
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2
        |), fav AS (
        | SELECT custkey, l_partkey AS favorite_partkey,
        |  purchase_count AS favorite_purchase_count,
        |  rank() OVER (PARTITION BY custkey ORDER BY purchase_count DESC) AS rnk
        | FROM pc
        |)
        |SELECT um2.custkey, total_orders, total_spent, avg_order_value,
        | days_since_last_order, customer_segment,
        | first_order_date, last_order_date,
        | favorite_partkey, favorite_purchase_count
        |FROM um2 JOIN fav ON um2.custkey = fav.custkey WHERE rnk = 1""".stripMargin),

    "q_column_stats" -> q(
      c => c.lineitem.agg(
        rnd2(min("l_quantity")).as("qty_min"),
        rnd2(max("l_quantity")).as("qty_max"),
        exactAvg(col("l_quantity"), 2, 4).as("qty_avg"),
        rnd4(stddev("l_quantity")).as("qty_std"),
        rnd2(min("l_extendedprice")).as("price_min"),
        rnd2(max("l_extendedprice")).as("price_max"),
        exactAvg(col("l_extendedprice"), 2, 4).as("price_avg"),
        rnd4(min("l_discount")).as("disc_min"),
        rnd4(max("l_discount")).as("disc_max"),
        exactAvg(col("l_discount"), 2, 4).as("disc_avg")),
      s"""SELECT floor(min(l_quantity) * 100 + 0.5) / 100 AS qty_min,
        | floor(max(l_quantity) * 100 + 0.5) / 100 AS qty_max,
        | ${exactAvgSql("l_quantity", 2, 4)} AS qty_avg,
        | floor(stddev(l_quantity) * 10000 + 0.5) / 10000 AS qty_std,
        | floor(min(l_extendedprice) * 100 + 0.5) / 100 AS price_min,
        | floor(max(l_extendedprice) * 100 + 0.5) / 100 AS price_max,
        | ${exactAvgSql("l_extendedprice", 2, 4)} AS price_avg,
        | floor(min(l_discount) * 10000 + 0.5) / 10000 AS disc_min,
        | floor(max(l_discount) * 10000 + 0.5) / 10000 AS disc_max,
        | ${exactAvgSql("l_discount", 2, 4)} AS disc_avg
        |FROM lineitem""".stripMargin),

    "q_dup_check" -> q(
      c => Dedup.duplicateStats(c.lineitem, Seq("l_orderkey", "l_linenumber")),
      """SELECT count(*) AS total_rows,
        | (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS distinct_keys,
        | count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS duplicate_rows
        |FROM lineitem""".stripMargin),

    // ── joins (SURVEY §2.3) ───────────────────────────────────────────
    // broadcastRef = false: the ref side here is ORDERS — its distinct
    // custkeys are customer-cardinality, and customer is fact-sized at
    // the 100 TB target (the q_right_outer comment's own reasoning) —
    // a forced broadcast would OOM the driver; AQE still upgrades the
    // un-hinted join to broadcast at small SF
    "q_anti_join" -> q(
      c => Validation.riViolations(
             c.customer.select(col("c_custkey"), col("c_name")),
             c.orders, "c_custkey", "o_custkey", broadcastRef = false),
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),

    "q_semi_join" -> q(
      c => c.orders
        .join(c.lineitem.filter(col("l_returnflag") === "R").select("l_orderkey"),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin),

    // broadcastRef = false: distinct high-discount l_orderkeys are
    // order-cardinality — fact-derived, never force-broadcast
    "q_left_outer_tag" -> q(
      c => Validation.tagRiViolations(
             c.orders.select("o_orderkey"),
             c.lineitem.filter(col("l_discount") > 0.08), "o_orderkey",
             "l_orderkey", "no_high_discount", broadcastRef = false),
      """SELECT o_orderkey, h.l_orderkey IS NULL AS no_high_discount
        |FROM orders LEFT JOIN
        | (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_discount > 0.08) h
        | ON o_orderkey = h.l_orderkey""".stripMargin),

    // Shuffle-minimal 5-way join: lineitem is pre-aggregated to one row
    // per order BEFORE touching the wider tables (600k→150k narrow
    // rows), the fixed-size dims (nation, region) broadcast onto
    // customer, and only then do the two key-partitioned joins run.
    // The countDistinct expand then operates on per-order rows, not
    // per-item rows. customer is NOT broadcast — at 100 TB it's a fact-
    // sized table, so it joins shuffle-on-key (AQE upgrades it to
    // broadcast at small SF on its own).
    // right-outer completes the outer-join family (left/full/semi/anti/
    // cross are exercised elsewhere): every customer appears, order
    // aggregates only where they exist
    "q_right_outer" -> q(
      c => c.orders
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             exactSum(col("o_totalprice"), 2, 2).as("total_spent"))
        .join(c.customer.select(col("c_custkey"), col("c_mktsegment")),
              col("o_custkey") === col("c_custkey"), "right_outer")
        .select(col("c_custkey"), col("c_mktsegment"),
                coalesce(col("n_orders"), lit(0L)).as("n_orders"),
                col("total_spent")),
      s"""SELECT c_custkey, c_mktsegment,
        | coalesce(n_orders, 0) AS n_orders, total_spent
        |FROM (
        | SELECT o_custkey, count(*) AS n_orders,
        |  ${exactSumSql("o_totalprice", 2, 2)} AS total_spent
        | FROM orders GROUP BY 1
        |) o RIGHT JOIN customer ON o_custkey = c_custkey""".stripMargin),

    "q_region_revenue" -> q(
      c => {
        val custRegion = c.customer.select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(c.nation.select(col("n_nationkey"), col("n_regionkey"))),
                col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(c.region.select(col("r_regionkey"), col("r_name"))),
                col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"), col("r_name"))
        val perOrder = c.lineitem
          .groupBy(col("l_orderkey"))
          .agg(sum(units(rev, 4)).as("rev_units"),
               count(lit(1)).as("order_items"))
        c.orders.select(col("o_orderkey"), col("o_custkey"))
          .join(perOrder, col("o_orderkey") === col("l_orderkey"))
          .join(custRegion, col("o_custkey") === col("c_custkey"))
          .groupBy(col("r_name"))
          .agg((floor(sum(col("rev_units")) / 100.0 + 0.5) / 100.0).as("total_revenue"),
               countDistinct("o_custkey").as("unique_customers"),
               sum("order_items").as("n_items"))
      },
      s"""SELECT r_name,
        | ${exactSumSql(revSql, 4, 2)} AS total_revenue,
        | count(DISTINCT o_custkey) AS unique_customers,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin),

    // ── window / sort / top-k / dedup (SURVEY §2.5, §2.6) ─────────────
    "q_window_rank" -> q(
      c => c.orders
        .withColumn("rnk", rank().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)))
        .filter(col("rnk") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        | FROM orders) WHERE rnk = 1""".stripMargin),

    // agg-then-join (same rationale as Gold.productPerformance): the
    // revenue aggregate runs on the int key; the name dimension joins
    // onto the 20k-row aggregate, not the 600k-row fact.
    "q_topk_parts" -> q(
      c => c.lineitem
        .groupBy(col("l_partkey"))
        .agg(exactSum(rev, 4, 2).as("total_revenue"))
        .join(broadcast(c.part.select(col("p_partkey"), col("p_name"))),
              col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("total_revenue"))
        .orderBy(col("total_revenue").desc, col("p_partkey"))
        .limit(10),
      s"""SELECT p_partkey, p_name,
        | ${exactSumSql(revSql, 4, 2)} AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY total_revenue DESC, p_partkey LIMIT 10""".stripMargin),

    "q_dedup_keep_first" -> q(
      c => Dedup.keepFirst(c.events, Seq("user_id", "event_type"),
                           Seq(col("event_id").asc))
             .select(col("user_id"), col("event_type"), col("event_id"),
                     col("value")),
      """SELECT user_id, event_type, event_id, value FROM (
        | SELECT user_id, event_type, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        | FROM events) WHERE rn = 1""".stripMargin),

    "q_distinct" -> q(
      c => c.lineitem.select("l_returnflag", "l_linestatus").distinct(),
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),

    // ── filters / projections / conditionals / casts (SURVEY §2.2) ────
    "q_between_filter" -> q(
      c => c.lineitem
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
             exactSum(col("l_extendedprice"), 2, 2).as("sum_price")),
      s"""SELECT l_returnflag, count(*) AS n_items,
        | ${exactSumSql("l_extendedprice", 2, 2)} AS sum_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY 1""".stripMargin),

    "q_conditional_bucket" -> q(
      c => c.customer
        .withColumn("balance_tier",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .groupBy(col("balance_tier"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
             exactSum(col("c_acctbal"), 2, 2).as("total_balance")),
      s"""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |  WHEN c_acctbal < 1000 THEN 'low'
        |  WHEN c_acctbal < 5000 THEN 'mid'
        |  ELSE 'high' END AS balance_tier,
        | c_mktsegment, count(*) AS n_customers,
        | ${exactSumSql("c_acctbal", 2, 2)} AS total_balance
        |FROM customer GROUP BY 1, 2""".stripMargin),

    "q_cast_schema" -> q(
      c => Casting.castTo(c.documents, StructType(Seq(
             StructField("doc_id", LongType),
             StructField("lang", DoubleType),     // uncastable → NULL
             StructField("source", IntegerType),  // uncastable → NULL
             StructField("n_chars", DoubleType))))
           .select("doc_id", "lang", "source", "n_chars"),
      """SELECT doc_id, TRY_CAST(lang AS DOUBLE) AS lang,
        | TRY_CAST(source AS INTEGER) AS source,
        | CAST(n_chars AS DOUBLE) AS n_chars
        |FROM documents""".stripMargin),

    // strict schema conformance (the bronze append-path pinning rule):
    // declared order restored, null-on-error casts, missing declared
    // column materialized as a typed null, every undeclared column
    // dropped — all visible in one result
    "q_conform_schema" -> q(
      c => Casting.conformTo(c.lineitem, StructType(Seq(
             StructField("l_orderkey", StringType),
             StructField("l_linenumber", IntegerType),
             StructField("l_returnflag", IntegerType),   // text → NULL
             StructField("quality_flag", IntegerType)))), // absent → NULL
      """SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
        | CAST(l_linenumber AS INTEGER) AS l_linenumber,
        | TRY_CAST(l_returnflag AS INTEGER) AS l_returnflag,
        | CAST(NULL AS INTEGER) AS quality_flag
        |FROM lineitem""".stripMargin),

    // ── Excel source (SURVEY §2.1 S3): the reference's bronze ingest
    // format (docs/etl_processes.md:133). 200 orders rows are exported
    // to TWO .xlsx files (pure-JDK writer), read back through the
    // binaryFile-distributed pure-JDK parser with header + schema
    // inference — longs, strings, doubles, date- and datetime-styled
    // serials, booleans — and hash-compared against DuckDB on the
    // ORIGINAL parquet: the whole codec round-trips bit-exactly.
    "q_excel_roundtrip" -> q(
      c => {
        val df = graft.sources.ExcelSource.read(c.spark, excelFixtureDir(c))
        df.select(col("o_orderkey"), col("o_orderstatus"),
          date_format(col("o_date"), "yyyy-MM-dd").as("o_date"),
          date_format(col("o_ts"), "yyyy-MM-dd HH:mm:ss").as("o_ts"),
          col("o_totalprice"), col("even"))
      },
      """SELECT o_orderkey, o_orderstatus,
        | strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
        | strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS o_ts,
        | o_totalprice, (o_orderkey % 2 = 0) AS even
        |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 200)""".stripMargin),

    // ── bronze lineage (SURVEY §2.8 F7): per-row source_file from file
    // metadata, the per-file row count a data engineer reaches for when
    // a bad file lands. The Spark side derives source_table from the
    // real scan metadata (_metadata.file_path); the oracle pins each
    // table's name literally since DuckDB views hide the path.
    "q_bronze_lineage" -> q(
      c => {
        def lineage(name: String) = c.spark.read
          .parquet(s"${c.dir}/$name.parquet")
          .select(regexp_extract(col("_metadata.file_path"),
                                 "/([^/]+)\\.parquet", 1).as("source_table"))
          .groupBy("source_table").agg(count(lit(1)).as("n_rows"))
        lineage("orders").unionByName(lineage("lineitem"))
          .unionByName(lineage("documents"))
      },
      """SELECT 'orders' AS source_table, count(*) AS n_rows FROM orders
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'documents', count(*) FROM documents""".stripMargin),

    // ── validation split / error histogram (SURVEY §2.2 P3/P7, §2.4 A6) ─
    "q_error_histogram" -> q(
      c => Validation.withErrors(c.lineitem, lineitemRules)
        .filter(col(Validation.ErrCol).isNotNull)
        .groupBy(col(Validation.ErrCol))
        .agg(count(lit(1)).as("error_count")),
      s"""SELECT validation_errors, count(*) AS error_count FROM (
        | SELECT NULLIF(concat_ws('; ', $lineitemRulesSql), '') AS validation_errors
        | FROM lineitem) WHERE validation_errors IS NOT NULL GROUP BY 1""".stripMargin),

    "q_rejected_rows" -> q(
      c => Validation.split(c.lineitem, lineitemRules)._2
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_discount"), col("l_tax"), col(Validation.ErrCol)),
      s"""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
        | validation_errors FROM (
        | SELECT *, NULLIF(concat_ws('; ', $lineitemRulesSql), '') AS validation_errors
        | FROM lineitem) WHERE validation_errors IS NOT NULL""".stripMargin),

    // ── upsert (SURVEY §2.1 S6, MERGE emulation) ──────────────────────
    "q_upsert" -> q(
      c => {
        val target = c.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        val updates = target.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", rnd2(col("o_totalprice") * 1.1))
        Upsert.upsert(target, updates, Seq("o_orderkey"))
      },
      """SELECT o_orderkey, 'U' AS o_orderstatus,
        | floor(o_totalprice * 1.1 * 100 + 0.5) / 100 AS o_totalprice
        |FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin),

    // CDC apply-changes: the delete half of the MERGE surface (Delta
    // whenMatchedDelete) — one anti-join pass applies updates AND
    // deletes; oracle recomputes from the construction rules
    "q_apply_changes" -> q(
      c => {
        val target = c.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        val changes = target
          .filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 === 3)
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 7 === 3, col("o_orderstatus")).otherwise(lit("U")))
          .withColumn("is_delete", col("o_orderkey") % 7 === 3)
        Upsert.applyChanges(target, changes, Seq("o_orderkey"), "is_delete")
      },
      """SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 3""".stripMargin),

    // ── beyond-reference analytics surface: frames, rollup, pivot, sets ─
    "q_running_total" -> q(
      c => c.orders
        .withColumn("cum_spend", rnd2(
          sum(units(col("o_totalprice"), 2)).over(
            Window.partitionBy("o_custkey")
              .orderBy(col("o_orderdate"), col("o_orderkey"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            / 100.0))
        .select(col("o_custkey"), col("o_orderkey"),
                dateStr(col("o_orderdate")).as("order_date"), col("cum_spend")),
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0 * 100 + 0.5) / 100
        |   AS cum_spend
        |FROM orders""".stripMargin),

    "q_rollup" -> q(
      c => c.lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(exactSum(col("l_extendedprice"), 2, 2).as("sum_price"),
             count(lit(1)).as("n_items"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
                col("sum_price"), col("n_items")),
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | ${exactSumSql("l_extendedprice", 2, 2)} AS sum_price,
        | count(*) AS n_items
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),

    "q_pivot" -> q(
      c => c.events
        .groupBy(dateStr(col("ts")).as("event_date"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L),
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'view') AS view,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1""".stripMargin),

    "q_set_ops" -> q(
      c => {
        val building = c.customer.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val withOrders = c.orders.select(col("o_custkey").as("custkey")).distinct()
        val both = building.intersect(withOrders).withColumn("set_op", lit("intersect"))
        val only = withOrders.except(building).withColumn("set_op", lit("except"))
        both.unionByName(only)
      },
      """SELECT custkey, 'intersect' AS set_op FROM (
        | SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT custkey, 'except' AS set_op FROM (
        | SELECT DISTINCT o_custkey AS custkey FROM orders
        | EXCEPT
        | SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin),

    // as-of join (temporal backward join, composed per design rule (a);
    // oracle = DuckDB's native ASOF JOIN): each non-purchase event gets
    // the user's most recent purchase at/before it
    "q_asof_join" -> q(
      c => {
        val e = c.events.select(col("event_id"), col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("us"))
        // one purchase per (user, timestamp), max event id winning --
        // NOT fixture trivia: AsOfJoin resolves same-time right rows
        // deterministically (greatest carry tuple) but DuckDB's ASOF
        // pick among equal right timestamps is unspecified, so the
        // cross-engine hash match must make ties impossible BEFORE the
        // join, identically on both sides
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("us"))
          .agg(max(col("event_id")).as("p_event_id"))
        val trades = e.filter(col("event_type") =!= "purchase")
        AsOfJoin.asOf(trades, purchases, "user_id", "us", "us",
                      Seq("p_event_id"))
          .select(col("user_id"), col("event_id"), col("event_type"),
                  col("asof_p_event_id"))
      },
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
        |), p AS (
        | SELECT user_id, us, max(event_id) AS p_event_id FROM e
        | WHERE event_type = 'purchase' GROUP BY 1, 2
        |), t AS (SELECT * FROM e WHERE event_type <> 'purchase')
        |SELECT t.user_id, t.event_id, t.event_type,
        | p.p_event_id AS asof_p_event_id
        |FROM t ASOF LEFT JOIN p
        | ON t.user_id = p.user_id AND t.us >= p.us""".stripMargin),

    // salted two-level aggregation on a hot-key column (event_type has
    // ~5 values — exactly the shape where one reducer owns a hot
    // group): partial per (key, salt), merge per key. Salting is
    // semantically transparent, so the oracle is the PLAIN group-by —
    // the hash-match proves the decomposition exact.
    "q_salted_agg" -> q(
      c => graft.operators.Skew.saltedAgg(
        c.events, keys = Seq("event_type"), salts = 8,
        saltOn = col("event_id"),
        partial = Seq(count(lit(1)).as("__cnt"),
                      sum(units(col("value"), 6)).as("__su")),
        finalAgg = Seq(sum("__cnt").as("n_events"),
                       (floor(sum("__su") / 10000.0 + 0.5) / 100.0)
                         .as("total_value"))),
      s"""SELECT event_type, count(*) AS n_events,
        | ${exactSumSql("value", 6, 2)} AS total_value
        |FROM events GROUP BY 1""".stripMargin),

    // SQL-text surface (SURVEY §3.3: the reference's Athena path):
    // the same catalog-register + spark.sql lifecycle a SQL client
    // uses, with a correlated EXISTS (TPC-H Q4 shape — late-shipping
    // orders per priority)
    "q_sql_surface" -> q(
      c => {
        c.orders.createOrReplaceTempView("orders_v")
        c.lineitem.createOrReplaceTempView("lineitem_v")
        c.spark.sql(
          """SELECT o_orderpriority, count(*) AS n_orders
            |FROM orders_v
            |WHERE EXISTS (
            |  SELECT 1 FROM lineitem_v
            |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
            |GROUP BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin),

    // ── events: hourly rollup (streaming batch-twin) + JSON props ─────
    "q_events_hourly" -> q(
      c => c.events
        .groupBy(dateStr(col("ts")).as("event_date"),
                 hour(col("ts")).cast("long").as("hour_of_day"),
                 col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             exactSum(col("value"), 6, 2).as("total_value")),
      s"""SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        | CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
        | event_type, count(*) AS n_events,
        | ${exactSumSql("value", 6, 2)} AS total_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    // silver time-feature derivation (docs/etl_processes.md:308-309:
    // day_of_week + hour_of_day). Spark dayofweek is 1=Sunday; the
    // oracle's is 0=Sunday, hence the +1.
    "q_time_features" -> q(
      c => c.events
        .groupBy(dayofweek(col("ts")).cast("long").as("day_of_week"),
                 hour(col("ts")).cast("long").as("hour_of_day"))
        .agg(count(lit(1)).as("n_events"),
             countDistinct("user_id").as("unique_users")),
      """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week,
        | CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
        | count(*) AS n_events, count(DISTINCT user_id) AS unique_users
        |FROM events GROUP BY 1, 2""".stripMargin),

    "q_json_extract" -> q(
      c => c.events
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
                           .try_cast(LongType))
        .groupBy(col("event_type"))
        .agg(rnd4(avg("k")).as("avg_k"),
             sum("k").as("sum_k"),
             count(lit(1)).as("n_events")),
      """SELECT event_type,
        | floor(avg(k) * 10000 + 0.5) / 10000 AS avg_k,
        | CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n_events
        |FROM (SELECT event_type,
        |       TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
        |      FROM events) GROUP BY 1""".stripMargin),
  )
}
