package graft

import graft.etl.EcommercePipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** End-to-end medallion run on fixture CSVs with injected anomalies
  * (the shipped reference data is clean — SURVEY.md §1.3, so fixtures
  * must inject: null required field, negative amount, FK orphans,
  * duplicate PK). */
class EcommercePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeCsv(dir: String, name: String, lines: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes)
    p.toString
  }

  test("bronze->silver->gold with injected anomalies") {
    val dir = TestSpark.tmpDir("ecom")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A",
      "2,11,Toys,Toy B",
      "3,12,Games,",          // null product_name -> rejected
      "2,11,Toys,Toy B"))     // duplicate PK -> deduped, not rejected
    val orders = writeCsv(dir, "orders.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01",
      "2,101,1,2025-04-01T11:00:00,-5.0,2025-04-01", // negative -> rejected
      "3,102,2,2025-04-02T10:00:00,30.0,2025-04-02"))
    val items = writeCsv(dir, "order_items.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1000,100,1,,1,1,0,2025-04-01T10:00:00,2025-04-01",
      "1001,100,1,,2,2,1,2025-04-01T10:00:00,2025-04-01",
      "1002,999,1,,1,1,0,2025-04-01T10:00:00,2025-04-01",  // orphan order
      "1003,102,2,,77,1,0,2025-04-02T10:00:00,2025-04-02")) // orphan product

    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    val res = pipe.run(products, orders, items)

    assert(res("products") == graft.etl.StageResult(2, 1))
    assert(res("orders") == graft.etl.StageResult(2, 1))
    assert(res("order_items") == graft.etl.StageResult(2, 2))

    // bronze layer: raw rows (duplicates and rejects included) with
    // per-row lineage metadata from the file scan
    assert(pipe.bronzeProducts.read.count() == 4)
    assert(pipe.bronzeOrders.read.count() == 3)
    assert(pipe.bronzeOrderItems.read.count() == 4)
    val bp = pipe.bronzeProducts.read
    assert(bp.columns.contains("source_file") &&
           bp.columns.contains("ingestion_timestamp"))
    assert(bp.filter(col("source_file").endsWith("products.csv")).count() == 4)
    assert(bp.filter(col("ingestion_timestamp").isNull).count() == 0)

    // silver metadata columns (reference data_model.md:96-148): lineage
    // flows through, products carry SCD1 flags, orders carry time parts
    val sp = pipe.silverProducts.read
    assert(sp.columns.contains("source_file"))
    assert(sp.filter(!col("is_active")).count() == 0)
    assert(sp.filter(col("last_updated_timestamp").isNull).count() == 0)
    val so = pipe.silverOrders.read
    // 2025-04-01 is a Tuesday: dayofweek=3 (Sunday=1); both orders at 10:00
    assert(so.filter(col("order_id") === 100)
             .select("day_of_week", "hour_of_day").collect().head.toSeq == Seq(3, 10))

    // quarantine carries error strings per reference semantics
    val q = pipe.quarantine.read
    assert(q.count() == 4)
    val errs = q.select("validation_errors").collect().map(_.getString(0))
    assert(errs.exists(_.contains("Missing required field: product_name")))
    assert(errs.exists(_.contains("Negative total_amount")))
    assert(errs.exists(_.contains("order_id not found in orders")))
    assert(errs.exists(_.contains("product_id not found in products")))

    // gold daily_sales: only 2025-04-01 has surviving joined items;
    // reference quirk preserved: totals are over joined rows (2 items)
    val ds = pipe.goldDailySales().collect()
    assert(ds.length == 1)
    val r = ds.head
    assert(r.getAs[java.math.BigDecimal]("total_sales").doubleValue == 100.0) // 50.0 x 2 items
    assert(r.getAs[Int]("order_count") == 1)
    assert(r.getAs[Int]("total_items") == 2)
    assert(r.getAs[java.math.BigDecimal]("avg_items_per_order").doubleValue == 2.0)

    // gold output types follow the documented DDL (data_model.md:158-223)
    import org.apache.spark.sql.types.DecimalType
    val dss = pipe.goldDailySales().schema
    assert(dss("total_sales").dataType == DecimalType(15, 2))
    assert(dss("avg_order_value").dataType == DecimalType(10, 2))
    assert(dss("avg_items_per_order").dataType == DecimalType(5, 2))
    assert(pipe.goldProductPerformance()
      .schema("reorder_rate").dataType == DecimalType(5, 4))
    val das = pipe.goldDepartmentAnalytics().schema
    assert(das("total_sales").dataType == DecimalType(15, 2))
    assert(das("customer_count").dataType ==
           org.apache.spark.sql.types.IntegerType)

    // customer insights: user 1 favorites tie -> rank keeps both rows
    val ci = pipe.goldCustomerInsights("2025-06-01")
    assert(ci.filter(col("user_id") === 1).count() == 2)
    assert(ci.select("customer_segment").distinct().collect()
             .map(_.getString(0)).forall(Set("Loyal", "Active", "Regular", "Lapsed", "New")))

    // idempotent re-run of every stage leaves silver unchanged (the
    // order_items path regressed here once: helper RI tags leaked into
    // the stored schema and broke the incremental upsert)
    val before = pipe.silverOrders.read.orderBy("order_id").collect().toSeq
    val beforeItems = pipe.silverOrderItems.read.orderBy("id").collect().toSeq
    pipe.run(products, orders, items)
    assert(pipe.silverOrders.read.orderBy("order_id").collect().toSeq == before)
    assert(pipe.silverOrderItems.read.orderBy("id").collect().toSeq == beforeItems)
    assert(!pipe.silverOrderItems.read.columns.exists(_.startsWith("__")))
    // bronze is append-only with file-level idempotence: the rerun of
    // already-ingested paths appended nothing
    assert(pipe.bronzeProducts.read.count() == 4)
    assert(pipe.bronzeOrders.read.count() == 3)
    assert(pipe.bronzeOrderItems.read.count() == 4)
    // ...and silver stages are incremental: the rerun's empty batch
    // re-quarantines nothing (history-wide re-validation would have
    // doubled the quarantine to 8)
    assert(pipe.quarantine.read.count() == 4)
  }

  test("correction batch wins deterministically; drifted schema conforms") {
    val dir = TestSpark.tmpDir("ecom_corr")
    val v1 = writeCsv(dir, "products_v1.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A",
      "2,11,Toys,Toy B (typo)"))
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    pipe.runProducts(v1)

    // a later file re-delivers pk 2 with corrected values, drops a
    // column, and adds an unknown one — the correction must win in
    // silver (update-wins MERGE on the fresh batch), the missing
    // column must land as a typed null, and the new column must be
    // dropped (bronze schema pinned by the first batch)
    val v2 = writeCsv(dir, "products_v2.csv", Seq(
      "product_id,department,product_name,surprise_col",
      "2,Toys,Toy B,xyz"))
    pipe.runProducts(v2)

    val silver = pipe.silverProducts.read
    val row2 = silver.filter(col("product_id") === 2).collect().head
    assert(row2.getAs[String]("product_name") == "Toy B")
    assert(row2.isNullAt(row2.fieldIndex("department_id")))
    assert(!silver.columns.contains("surprise_col"))
    assert(silver.count() == 2)
    val bronze = pipe.bronzeProducts.read
    assert(bronze.count() == 3 && !bronze.columns.contains("surprise_col"))

    // re-running the corrected file is a no-op (file-level idempotence)
    pipe.runProducts(v2)
    assert(pipe.bronzeProducts.read.count() == 3)
    assert(pipe.silverProducts.read.filter(col("product_id") === 2)
      .collect().head.getAs[String]("product_name") == "Toy B")
  }

  test("quarantine replay recovers RI rejects once the dimension arrives") {
    val dir = TestSpark.tmpDir("ecom_replay")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A"))
    val orders1 = writeCsv(dir, "orders1.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01"))
    // item 1002 references order 999, which hasn't arrived yet
    val items = writeCsv(dir, "items.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1001,100,1,,1,1,0,2025-04-01T10:00:00,2025-04-01",
      "1002,999,2,,1,1,0,2025-04-02T10:00:00,2025-04-02"))
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    val res = pipe.run(products, orders1, items)
    assert(res("order_items") == graft.etl.StageResult(1, 1))

    // re-delivering the items file is a bronze no-op — replay is the
    // only road back for the quarantined row
    assert(pipe.runOrderItems(items).rejected == 0)
    assert(pipe.silverOrderItems.read.count() == 1)

    // the missing order arrives; replay recovers exactly the RI reject
    val orders2 = writeCsv(dir, "orders2.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "2,999,2,2025-04-02T09:00:00,30.0,2025-04-02"))
    // BATCH semantics: the second batch reports its own 1 merged row,
    // not the table total of 2 — incremental reporting is O(batch)
    assert(pipe.runOrders(orders2) == graft.etl.StageResult(1, 0))
    assert(pipe.silverOrders.read.count() == 2)
    val rec = pipe.replayQuarantine()
    assert(rec == Map("products" -> 0L, "orders" -> 0L, "order_items" -> 1L), rec)
    val items2 = pipe.silverOrderItems.read
    assert(items2.count() == 2)
    assert(items2.filter(col("id") === 1002).count() == 1)
    assert(!items2.columns.exists(_.startsWith("__")) &&
           !items2.columns.contains("record"))
    // quarantine no longer holds the recovered record; replay is
    // idempotent and recovers nothing further
    assert(pipe.quarantine.read.count() == 0)
    assert(pipe.replayQuarantine().values.sum == 0L)
  }

  test("order_items before any dim bootstraps: quarantined, then replayed") {
    val dir = TestSpark.tmpDir("ecom_nodims")
    // EVERY orders row invalid -> silver_orders never created
    val badOrders = writeCsv(dir, "orders.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,-50.0,2025-04-01"))
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A"))
    val items = writeCsv(dir, "items.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1001,100,1,,1,1,0,2025-04-01T10:00:00,2025-04-01"))
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    pipe.runProducts(products)
    assert(pipe.runOrders(badOrders) == graft.etl.StageResult(0, 1))
    assert(!pipe.silverOrders.exists)
    // items must NOT crash on the missing dim (the file has already
    // landed in bronze — a crash here would strand it forever); the
    // whole batch goes to quarantine instead
    assert(pipe.runOrderItems(items) == graft.etl.StageResult(0, 1))
    assert(!pipe.silverOrderItems.exists)
    assert(pipe.quarantine.read
      .filter(col("source_table") === "order_items").count() == 1)

    // the corrected orders file bootstraps the dim; replay recovers
    val goodOrders = writeCsv(dir, "orders2.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01"))
    pipe.runOrders(goodOrders)
    val rec = pipe.replayQuarantine()
    assert(rec("order_items") == 1L, rec)
    assert(pipe.silverOrderItems.read.count() == 1)
  }

  test("legacy unbucketed quarantine rows migrate and replay recovers them") {
    val dir = TestSpark.tmpDir("ecom_legacy")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A"))
    val orders1 = writeCsv(dir, "orders1.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01"))
    val items = writeCsv(dir, "items.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1001,100,1,,1,1,0,2025-04-01T10:00:00,2025-04-01",
      "1002,999,2,,1,1,0,2025-04-02T10:00:00,2025-04-02")) // orphan order
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    pipe.run(products, orders1, items)

    // simulate a pre-bucketing warehouse: hoist the bucket's batch
    // dirs to the quarantine top level and drop the bucket dir
    val q = new java.io.File(s"$dir/warehouse/rejected_records")
    val bucket = new java.io.File(q, "src-order_items")
    assert(bucket.isDirectory)
    bucket.listFiles().filter(_.getName.startsWith("batch-")).foreach { b =>
      assert(b.renameTo(new java.io.File(q, b.getName)))
    }
    assert(bucket.listFiles().forall(!_.getName.startsWith("batch-")))
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    deleteRec(bucket)

    // the missing order arrives — replay must migrate the legacy rows
    // into buckets and recover the reject, not silently skip it
    val orders2 = writeCsv(dir, "orders2.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "2,999,2,2025-04-02T09:00:00,30.0,2025-04-02"))
    pipe.runOrders(orders2)
    val rec = pipe.replayQuarantine()
    assert(rec("order_items") == 1L, rec)
    assert(pipe.silverOrderItems.read.filter(col("id") === 1002).count() == 1)
    // legacy dirs are gone; what remains is bucketed
    assert(!q.listFiles().exists(_.getName.startsWith("batch-")))
    assert(pipe.quarantine.read.count() == 0)
  }

  test("all-rejected first batch doesn't wedge silver; replay bootstraps it") {
    val dir = TestSpark.tmpDir("ecom_boot")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A"))
    val orders1 = writeCsv(dir, "orders1.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01"))
    // EVERY row of the first order_items batch is an orphan
    val items = writeCsv(dir, "items.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1001,999,2,,1,1,0,2025-04-02T10:00:00,2025-04-02",
      "1002,999,2,,1,2,0,2025-04-02T10:00:00,2025-04-02"))
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    pipe.runProducts(products)
    pipe.runOrders(orders1)
    val r = pipe.runOrderItems(items)
    // no valid row -> the silver table must NOT be created (an empty
    // partitioned overwrite would wedge schema inference forever)
    assert(r == graft.etl.StageResult(0, 2))
    assert(!pipe.silverOrderItems.exists)

    // the missing order arrives; replay BOOTSTRAPS silver_order_items
    // from the quarantine records alone
    val orders2 = writeCsv(dir, "orders2.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "2,999,2,2025-04-02T09:00:00,30.0,2025-04-02"))
    pipe.runOrders(orders2)
    val rec = pipe.replayQuarantine()
    assert(rec("order_items") == 2L, rec)
    assert(pipe.silverOrderItems.read.count() == 2)
    assert(pipe.quarantine.read.count() == 0)
  }

  test("incremental gold daily_sales: per-date merge equals full recompute") {
    val dir = TestSpark.tmpDir("ecom_inc")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A", "2,11,Toys,Toy B"))
    val day1Orders = writeCsv(dir, "orders1.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01"))
    val day1Items = writeCsv(dir, "items1.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1000,100,1,,1,1,0,2025-04-01T10:00:00,2025-04-01",
      "1001,100,1,,2,2,1,2025-04-01T10:00:00,2025-04-01"))
    val day2Orders = writeCsv(dir, "orders2.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "2,101,2,2025-04-02T10:00:00,30.0,2025-04-02"))
    val day2Items = writeCsv(dir, "items2.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1002,101,2,,1,1,0,2025-04-02T10:00:00,2025-04-02"))

    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    val gold = graft.tables.LakehouseTable(spark, s"$dir/warehouse/gold_daily_sales",
      Seq("date"))

    pipe.run(products, day1Orders, day1Items)
    pipe.goldDailySalesIncremental(gold, Seq("2025-04-01"))
    assert(gold.read.count() == 1)

    // day-2 batch lands incrementally; day-1 gold rows are untouched
    pipe.run(products, day2Orders, day2Items)
    pipe.goldDailySalesIncremental(gold, Seq("2025-04-02"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("date").collect().map(_.toSeq).toSeq
    assert(canon(gold.read) == canon(pipe.goldDailySales()))

    // idempotent: re-merging the same date changes nothing
    pipe.goldDailySalesIncremental(gold, Seq("2025-04-02"))
    assert(canon(gold.read) == canon(pipe.goldDailySales()))
  }

  test("a mixed .xlsx/.csv drop directory is rejected loudly, not silently narrowed") {
    // the Excel branch reads via pathGlobFilter *.xlsx: CSVs sharing
    // the directory would never be ingested OR quarantined, on this
    // and every future run — fail at dispatch instead
    val dir = TestSpark.tmpDir("ecom_mixed")
    val drop = TestSpark.tmpDir("ecom_mixed_drop")
    writeCsv(drop, "late_orders.csv",
      Seq("order_num,order_id,user_id,order_timestamp,total_amount,date",
          "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01"))
    val out = new java.io.FileOutputStream(s"$drop/orders.xlsx")
    try graft.sources.ExcelSource.write(
      Seq("order_num", "order_id", "user_id", "order_timestamp",
          "total_amount", "date"),
      Seq(Seq(2L, 101L, 1L,
              java.sql.Timestamp.valueOf("2025-04-01 11:00:00"), 30.0,
              java.sql.Date.valueOf("2025-04-01"))),
      out) finally out.close()
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    val e = intercept[IllegalArgumentException] {
      pipe.ingestBronze(drop, pipe.bronzeOrders)
    }
    assert(e.getMessage.contains("late_orders.csv"), e.getMessage)

    // a drop of ONLY another recognizable format (no .csv, no .xlsx)
    // must not fall through to the CSV branch as mis-parsed garbage
    val jsonDrop = TestSpark.tmpDir("ecom_json_drop")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(jsonDrop, "orders.json"),
      """{"order_id": 100}""".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      pipe.ingestBronze(jsonDrop, pipe.bronzeOrders)
    }
    assert(e2.getMessage.contains("orders.json"), e2.getMessage)

    // compressed CSV parts are NOT foreign — the CSV reader handles
    // .csv.gz transparently and the guard must look through the suffix
    val gzDrop = TestSpark.tmpDir("ecom_gz_drop")
    val gzOut = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$gzDrop/orders.csv.gz"))
    try gzOut.write(
      ("order_num,order_id,user_id,order_timestamp,total_amount,date\n" +
       "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01\n").getBytes("UTF-8"))
    finally gzOut.close()
    pipe.ingestBronze(gzDrop, pipe.bronzeOrders)
    assert(pipe.bronzeOrders.read.count() == 1L)
  }

  test("bronze ingest dispatches on Excel input (the reference's orders/items format)") {
    // the reference lands orders and order-items as Excel
    // (docs/etl_processes.md:133,189) and products as CSV — same data
    // as the anomaly test, same results, through the xlsx decode path
    val dir = TestSpark.tmpDir("ecom_xlsx")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A",
      "2,11,Toys,Toy B",
      "3,12,Games,",
      "2,11,Toys,Toy B"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def d(s: String) = java.sql.Date.valueOf(s)
    val ordersDir = TestSpark.tmpDir("ecom_xlsx_o")
    val out1 = new java.io.FileOutputStream(s"$ordersDir/orders.xlsx")
    try graft.sources.ExcelSource.write(
      Seq("order_num", "order_id", "user_id", "order_timestamp",
          "total_amount", "date"),
      Seq(Seq(1L, 100L, 1L, ts("2025-04-01 10:00:00"), 50.0, d("2025-04-01")),
          Seq(2L, 101L, 1L, ts("2025-04-01 11:00:00"), -5.0, d("2025-04-01")),
          Seq(3L, 102L, 2L, ts("2025-04-02 10:00:00"), 30.0, d("2025-04-02"))),
      out1) finally out1.close()
    val itemsDir = TestSpark.tmpDir("ecom_xlsx_i")
    val out2 = new java.io.FileOutputStream(s"$itemsDir/order_items.xlsx")
    try graft.sources.ExcelSource.write(
      Seq("id", "order_id", "user_id", "days_since_prior_order",
          "product_id", "add_to_cart_order", "reordered",
          "order_timestamp", "date"),
      Seq(Seq(1000L, 100L, 1L, null, 1L, 1L, 0L, ts("2025-04-01 10:00:00"), d("2025-04-01")),
          Seq(1001L, 100L, 1L, null, 2L, 2L, 1L, ts("2025-04-01 10:00:00"), d("2025-04-01")),
          Seq(1002L, 999L, 1L, null, 1L, 1L, 0L, ts("2025-04-01 10:00:00"), d("2025-04-01")),
          Seq(1003L, 102L, 2L, null, 77L, 1L, 0L, ts("2025-04-02 10:00:00"), d("2025-04-02"))),
      out2) finally out2.close()

    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    val res = pipe.run(products, ordersDir, itemsDir)
    assert(res("products") == graft.etl.StageResult(2, 1))
    assert(res("orders") == graft.etl.StageResult(2, 1))
    assert(res("order_items") == graft.etl.StageResult(2, 2))

    // Excel lineage: source_file carries the workbook path
    assert(pipe.bronzeOrders.read
      .filter(col("source_file").endsWith("orders.xlsx")).count() == 3)
    // silver types follow the declared schemas through the xlsx path
    val so = pipe.silverOrders.read
    assert(so.schema("order_timestamp").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(so.filter(col("order_id") === 100)
             .select("day_of_week", "hour_of_day").collect().head.toSeq ==
      Seq(3, 10))
    // gold matches the CSV-ingested run's numbers
    val ds = pipe.goldDailySales().collect()
    assert(ds.length == 1)
    assert(ds.head.getAs[java.math.BigDecimal]("total_sales")
      .doubleValue == 100.0)

    // file-level idempotence holds for workbooks too
    pipe.run(products, ordersDir, itemsDir)
    assert(pipe.bronzeOrders.read.count() == 3)
    assert(pipe.quarantine.read.count() == 4)
  }

  test("a batch stranded between bronze landing and the silver stage is recovered") {
    // the crash window file-level idempotence cannot see: the file
    // LANDED in bronze, then the run died before its silver stage —
    // the rerun ingests nothing (file already seen) and, without the
    // ack handshake, nothing would ever re-present the rows
    val dir = TestSpark.tmpDir("ecom_strand")
    val products = writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A",
      "2,11,Toys,Toy B"))
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    // simulate the crash: bronze landing only, no stage
    pipe.ingestBronze(products, pipe.bronzeProducts)
    assert(pipe.bronzeProducts.read.count() == 2)
    assert(!pipe.silverProducts.exists)
    // the rerun finds the unacked batch and stages it
    assert(pipe.runProducts(products) == graft.etl.StageResult(2, 0))
    assert(pipe.silverProducts.read.count() == 2)
    // acked: a further rerun reprocesses nothing
    assert(pipe.runProducts(products) == graft.etl.StageResult(0, 0))
    assert(pipe.silverProducts.read.count() == 2)
  }

  test("dims-missing wholesale quarantine and ordinary rejects share one bucket schema") {
    // the two quarantine writers once diverged on the ErrCol type
    // (array<string> vs string) — the shared bucket then held
    // conflicting parquet schemas and every later read or replay of it
    // threw. Exercise both writers into ONE bucket and read it back.
    val dir = TestSpark.tmpDir("ecom_qschema")
    val items1 = writeCsv(dir, "items1.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1001,100,1,,1,1,0,2025-04-01T10:00:00,2025-04-01"))
    val pipe = new EcommercePipeline(spark, s"$dir/warehouse")
    // no dims yet: wholesale quarantine path
    assert(pipe.runOrderItems(items1) == graft.etl.StageResult(0, 1))
    // bootstrap the dims
    pipe.runProducts(writeCsv(dir, "products.csv", Seq(
      "product_id,department_id,department,product_name",
      "1,10,Books,Book A")))
    pipe.runOrders(writeCsv(dir, "orders.csv", Seq(
      "order_num,order_id,user_id,order_timestamp,total_amount,date",
      "1,100,1,2025-04-01T10:00:00,50.0,2025-04-01")))
    // ordinary validation reject into the SAME bucket
    val items2 = writeCsv(dir, "items2.csv", Seq(
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp,date",
      "1002,999,1,,1,1,0,2025-04-01T10:00:00,2025-04-01")) // orphan order
    assert(pipe.runOrderItems(items2) == graft.etl.StageResult(0, 1))
    // both writers' records coexist readably — a schema conflict
    // would throw here
    val q = pipe.quarantine.readBucket("src-order_items").get
    val errs = q.select("validation_errors").collect().map(_.getString(0))
    assert(errs.toSet == Set("dimension tables not yet available",
                             "order_id not found in orders"), errs.toSeq)
    // and replay recovers the dims-missing batch through the mixed bucket
    val rec = pipe.replayQuarantine()
    assert(rec("order_items") == 1L, rec)
    assert(pipe.silverOrderItems.read.count() == 1)
  }
}
