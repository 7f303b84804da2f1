package graft

import java.io.ByteArrayOutputStream
import java.time.LocalDate

import graft.sources.ExcelSource
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S3 — the reference's Excel ingest
  * (docs/etl_processes.md:133,189), re-implemented as a pure-JDK xlsx
  * parse distributed over the binaryFile source. */
class ExcelSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeXlsx(dir: String, name: String, header: Seq[String],
                        rows: Seq[Seq[Any]]): String = {
    val f = s"$dir/$name"
    val out = new java.io.FileOutputStream(f)
    try ExcelSource.write(header, rows, out) finally out.close()
    f
  }

  test("round-trip: types survive write → parse → infer") {
    val dir = TestSpark.tmpDir("xlsx")
    writeXlsx(dir, "a.xlsx",
      Seq("id", "name", "price", "ok", "d", "ts"),
      Seq(
        Seq(1L, "alpha", 1.5, true, java.sql.Date.valueOf("2024-02-29"),
            java.sql.Timestamp.valueOf("2024-02-29 13:45:09")),
        Seq(2L, "beta & <co>", 2.0, false, java.sql.Date.valueOf("1900-02-28"),
            java.sql.Timestamp.valueOf("1970-01-01 00:00:00")),
        Seq(3L, null, null, true, null, null)))
    val df = ExcelSource.read(spark, dir)
    assert(df.schema == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType), StructField("ok", BooleanType),
      StructField("d", DateType), StructField("ts", TimestampType))))
    val rows = df.orderBy("id")
      .selectExpr("id", "name", "price", "ok", "cast(d as string)",
                  "cast(ts as string)")
      .as[(Long, String, Option[Double], Boolean, String, String)]
      .collect().toSeq
    assert(rows == Seq(
      (1L, "alpha", Some(1.5), true, "2024-02-29", "2024-02-29 13:45:09"),
      (2L, "beta & <co>", Some(2.0), false, "1900-02-28", "1970-01-01 00:00:00"),
      (3L, null, None, true, null, null)))
  }

  test("hand-built sheet: shared strings, cell gaps, sparse refs, formula and error cells") {
    // built without the writer so the reader is exercised against the
    // parts a real producer emits: sharedStrings (incl. rich text),
    // skipped cells addressed by `r`, t="str" formula results, t="e"
    val dir = TestSpark.tmpDir("xlsx2")
    val f = new java.io.FileOutputStream(s"$dir/h.xlsx")
    val z = new java.util.zip.ZipOutputStream(f)
    def part(n: String, b: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(b.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId9"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId9" Target="worksheets/data.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst><si><t>k</t></si><si><t>v</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>""")
    part("xl/worksheets/data.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>w</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="C2" t="str"><v>=sum</v></c></row>
        |<row r="4"><c r="B4"><v>7</v></c><c r="C4" t="e"><v>#DIV/0!</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.finish(); f.close()
    val df = ExcelSource.read(spark, dir, inferSchema = false)
    val rows = df.as[(String, String, String)].collect().toSet
    assert(rows == Set(("rich", null, "=sum"), (null, "7", null)))
    assert(df.columns.toSeq == Seq("k", "v", "w"))
  }

  test("out-of-order and duplicate cell refs land at their referenced column") {
    // malformed producers emit cells out of `r` order (and duplicated
    // refs); a blind append would shift values into the wrong columns.
    // Contract: value goes to its referenced index; a duplicate ref
    // keeps the LAST value (spreadsheet overwrite semantics).
    val dir = TestSpark.tmpDir("xlsx_ooo")
    val f = new java.io.FileOutputStream(s"$dir/o.xlsx")
    val z = new java.util.zip.ZipOutputStream(f)
    def part(n: String, b: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(b.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="B1" t="inlineStr"><is><t>b</t></is></c><c r="C1" t="inlineStr"><is><t>c</t></is></c></row>
        |<row r="2"><c r="C2"><v>3</v></c><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c></row>
        |<row r="3"><c r="A3"><v>9</v></c><c r="A3"><v>10</v></c><c r="B3"><v>20</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.finish(); f.close()
    val df = ExcelSource.read(spark, dir, inferSchema = false)
    val rows = df.as[(String, String, String)].collect().toSet
    assert(rows == Set(("1", "2", "3"), ("10", "20", null)), rows)
  }

  test("1904 date system shifts serials") {
    // serial 0 in the 1904 system = 1904-01-01
    assert(ExcelSource.serialToIso(0.0, withTime = false, date1904 = true)
      == "1904-01-01")
    assert(ExcelSource.serialToIso(1.0, withTime = false, date1904 = false)
      == "1900-01-01")
    assert(ExcelSource.serialToIso(59.0, withTime = false, date1904 = false)
      == "1900-02-28")
    assert(ExcelSource.serialToIso(61.0, withTime = false, date1904 = false)
      == "1900-03-01")
    assert(ExcelSource.serialToIso(45382.5, withTime = true, date1904 = false)
      == "2024-03-31 12:00:00")
  }

  test("multi-file directory: per-file parallel read, lineage column, header validation") {
    val dir = TestSpark.tmpDir("xlsxm")
    writeXlsx(dir, "p1.xlsx", Seq("a", "b"), Seq(Seq(1L, "x")))
    writeXlsx(dir, "p2.xlsx", Seq("a", "b"), Seq(Seq(2L, "y"), Seq(3L, "z")))
    val df = ExcelSource.read(spark, dir, sourceFileCol = Some("source_file"))
    assert(df.count() == 3)
    assert(df.filter($"source_file".contains("p2.xlsx")).count() == 2)
    assert(df.schema("a").dataType == LongType)

    writeXlsx(dir, "bad.xlsx", Seq("a", "c"), Seq(Seq(9L, "w")))
    val e = intercept[IllegalArgumentException] {
      ExcelSource.read(spark, dir)
    }
    assert(e.getMessage.contains("header mismatch"))
  }

  test("review-found edges: dotted headers, cell-less rows, empty bool cells, date-shaped junk, control chars") {
    val dir = TestSpark.tmpDir("xlsxe")
    // dotted header resolves as a COLUMN (not a struct-field path) all
    // the way through inference and casting
    writeXlsx(dir, "dots.xlsx", Seq("order.total", "id"),
      Seq(Seq(1.5, 10L), Seq(2.5, 11L)))
    val dotted = ExcelSource.read(spark, s"$dir/dots.xlsx")
    assert(dotted.schema("order.total").dataType == DoubleType)
    assert(dotted.select(org.apache.spark.sql.functions.col("`order.total`"))
      .as[Double].collect().sorted.toSeq == Seq(1.5, 2.5))
    // case-insensitive duplicate headers rejected up front (Spark's
    // default resolution would fail later, ambiguously)
    val dir2 = TestSpark.tmpDir("xlsxe2")
    writeXlsx(dir2, "dup.xlsx", Seq("ID", "id"), Seq(Seq(1L, 2L)))
    val e = intercept[IllegalArgumentException] {
      ExcelSource.read(spark, dir2)
    }
    assert(e.getMessage.contains("duplicate header names"))

    // hand-built sheet: a cell-less <row/> (style carrier) before the
    // header, one mid-data, an empty t="b" cell, and a date-SHAPED but
    // invalid value in a string column
    val dir3 = TestSpark.tmpDir("xlsxe3")
    val f = new java.io.FileOutputStream(s"$dir3/h.xlsx")
    val z = new java.util.zip.ZipOutputStream(f)
    def part(n: String, b: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(b.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"/>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>d</t></is></c><c r="B2" t="inlineStr"><is><t>ok</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>2023-01-15</t></is></c><c r="B3" t="b"><v>1</v></c></row>
        |<row r="4"/>
        |<row r="5"><c r="A5" t="inlineStr"><is><t>2023-02-30</t></is></c><c r="B5" t="b"/></row>
        |</sheetData></worksheet>""".stripMargin)
    z.finish(); f.close()
    val df = ExcelSource.read(spark, dir3)
    // the impossible 2023-02-30 keeps the column StringType — no
    // silent null-out through a DateType cast
    assert(df.schema("d").dataType == StringType)
    val rows = df.as[(String, String)].collect().toSet
    // cell-less rows absent; empty bool cell is null, not false
    assert(rows == Set(("2023-01-15", "true"), ("2023-02-30", null)))

    // control characters are stripped at write (XML 1.0 cannot carry
    // them); the written workbook stays readable
    val dir4 = TestSpark.tmpDir("xlsxe4")
    writeXlsx(dir4, "ctl.xlsx", Seq("s"), Seq(Seq("a\u0000b\u0008c\td")))
    assert(ExcelSource.read(spark, dir4).as[String].collect().toSeq ==
      Seq("abc\td"))
  }

  test("duration formats stay raw serials; time-of-day formats render HH:mm:ss") {
    // styles: xf1 = built-in 46 ([h]:mm:ss duration), xf2 = custom
    // elapsed [h]:mm, xf3 = built-in 18 (time of day), xf4 = custom
    // h:mm time of day — a 30-hour duration must NOT become an
    // 1899-anchored timestamp
    val dir = TestSpark.tmpDir("xlsxd")
    val f = new java.io.FileOutputStream(s"$dir/d.xlsx")
    val z = new java.util.zip.ZipOutputStream(f)
    def part(n: String, b: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(b.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/styles.xml",
      """<styleSheet><numFmts><numFmt numFmtId="164" formatCode="[h]:mm"/><numFmt numFmtId="165" formatCode="h:mm"/></numFmts>
        |<cellXfs><xf numFmtId="0"/><xf numFmtId="46"/><xf numFmtId="164"/><xf numFmtId="18"/><xf numFmtId="165"/></cellXfs></styleSheet>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>dur46</t></is></c><c r="B1" t="inlineStr"><is><t>durH</t></is></c><c r="C1" t="inlineStr"><is><t>tod18</t></is></c><c r="D1" t="inlineStr"><is><t>todHm</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>1.25</v></c><c r="B2" s="2"><v>1.25</v></c><c r="C2" s="3"><v>0.5</v></c><c r="D2" s="4"><v>0.75</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.finish(); f.close()
    val df = ExcelSource.read(spark, dir, inferSchema = false)
    val r = df.as[(String, String, String, String)].collect().head
    // 30-hour durations surface as the raw serial, not a bogus date
    assert(r == ("1.25", "1.25", "12:00:00", "18:00:00"), r)
  }

  test("a corrupt workbook fails naming the file") {
    val dir = TestSpark.tmpDir("xlsxc")
    // a TRUNCATED workbook (cut mid-deflate-stream) — the kind of
    // corruption an interrupted upload produces
    val good = s"$dir/good.bin"
    val out = new java.io.FileOutputStream(good)
    try ExcelSource.write(Seq("a"), (1 to 500).map(i => Seq[Any](s"v$i")), out)
    finally out.close()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(good))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/broken.xlsx"),
      bytes.take(bytes.length / 2))
    val e = intercept[Exception] { ExcelSource.read(spark, dir) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("broken.xlsx")), messages(e))

    // a non-zip byte blob also errors naming the file (it yields no
    // zip entries, so no worksheet part — silently treating it as an
    // empty sheet would drop the file from a multi-file read)
    val dir2 = TestSpark.tmpDir("xlsxc2")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir2/blob.xlsx"),
      "this is not a zip".getBytes)
    val e2 = intercept[Exception] { ExcelSource.read(spark, dir2) }
    assert(messages(e2).exists(_.contains("blob.xlsx")), messages(e2))
  }

  test("mixed column types fall back: int+float → double, any junk → string") {
    val dir = TestSpark.tmpDir("xlsxt")
    writeXlsx(dir, "t.xlsx", Seq("m", "j", "dt"),
      Seq(Seq(1L, "1", java.sql.Date.valueOf("2024-01-01")),
          Seq(2.5, "oops", java.sql.Timestamp.valueOf("2024-01-01 01:02:03"))))
    val df = ExcelSource.read(spark, dir)
    assert(df.schema("m").dataType == DoubleType)
    assert(df.schema("j").dataType == StringType)
    // date + datetime strings promote to timestamp
    assert(df.schema("dt").dataType == TimestampType)
    assert(df.selectExpr("cast(dt as string)").as[String].collect().toSet
      == Set("2024-01-01 00:00:00", "2024-01-01 01:02:03"))
  }

  test("multi-sheet workbook: selection by name and index; default reads sheet 1 only") {
    val dir = TestSpark.tmpDir("xlsxms")
    val f = new java.io.FileOutputStream(s"$dir/two.xlsx")
    try ExcelSource.writeSheets(Seq(
      ("orders", Seq("id", "qty"), Seq(Seq(1L, 10L), Seq(2L, 20L))),
      ("returns", Seq("rid", "reason"),
        Seq(Seq(9L, "damaged"), Seq(8L, "late"), Seq(7L, "other")))), f)
    finally f.close()

    // default = first sheet in workbook order; the second sheet's rows
    // must NOT leak in (the pre-r9 silent-data-loss mode, inverted:
    // here sheet 1 IS the requested data)
    val first = ExcelSource.read(spark, dir)
    assert(first.columns.toSeq == Seq("id", "qty"))
    assert(first.count() == 2)

    val byName = ExcelSource.read(spark, dir,
      sheet = ExcelSource.SheetName("returns"))
    assert(byName.columns.toSeq == Seq("rid", "reason"))
    assert(byName.as[(Long, String)].collect().toSet ==
      Set((9L, "damaged"), (8L, "late"), (7L, "other")))

    val byIdx = ExcelSource.read(spark, dir,
      sheet = ExcelSource.SheetIndex(1))
    assert(byIdx.as[(Long, String)].collect().toSet ==
      byName.as[(Long, String)].collect().toSet)

    // unknown sheet name fails loudly, naming the sheets present —
    // silent fallback to sheet 1 would be wrong-data
    val e = intercept[Exception] {
      ExcelSource.read(spark, dir,
        sheet = ExcelSource.SheetName("nope")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("nope") && m.contains("orders") && m.contains("returns")),
      messages(e))
    val e2 = intercept[Exception] {
      ExcelSource.read(spark, dir,
        sheet = ExcelSource.SheetIndex(5)).collect()
    }
    assert(messages(e2).exists(_.contains("out of range")), messages(e2))
  }

  test("dataAddress sub-range: preamble rows and margin columns excluded, " +
       "range row 0 is the header") {
    // a real-world workbook shape: a title + blank preamble above the
    // header, a notes column to the right, data in B3:C6 of sheet
    // "data" (second in workbook order) — the crealytics dataAddress
    // case (docs/etl_processes.md:133,189) the bare sheet selector
    // mis-parses (title row would become the header)
    val dir = TestSpark.tmpDir("xlsxaddr")
    val f = new java.io.FileOutputStream(s"$dir/p.xlsx")
    val z = new java.util.zip.ZipOutputStream(f)
    def part(n: String, b: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(b.getBytes("UTF-8")); z.closeEntry()
    }
    def is(s: String) = s"""t="inlineStr"><is><t>$s</t></is>"""
    part("xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="cover" sheetId="1" r:id="rId1"/><sheet name="data" sheetId="2" r:id="rId2"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Target="worksheets/sheet2.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      s"""<worksheet><sheetData><row r="1"><c r="A1" ${is("COVER")}</c></row></sheetData></worksheet>""")
    part("xl/worksheets/sheet2.xml",
      s"""<worksheet><sheetData>
        |<row r="1"><c r="A1" ${is("Quarterly report")}</c></row>
        |<row r="3"><c r="B3" ${is("sku")}</c><c r="C3" ${is("qty")}</c><c r="D3" ${is("notes")}</c></row>
        |<row r="4"><c r="A4" ${is("x")}</c><c r="B4"><v>11</v></c><c r="C4"><v>5</v></c><c r="D4" ${is("rush")}</c></row>
        |<row r="6"><c r="B6"><v>12</v></c><c r="C6"><v>7</v></c></row>
        |<row r="7"><c r="B7"><v>99</v></c><c r="C7"><v>99</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.finish(); f.close()

    val df = ExcelSource.readAddress(spark, dir, "'data'!B3:C6")
    assert(df.columns.toSeq == Seq("sku", "qty"))
    // row 2 is empty in the sheet (sparse), row 7 is past the range,
    // column D (notes) and column A (margin) are outside the window
    assert(df.as[(Long, Long)].collect().toSet == Set((11L, 5L), (12L, 7L)))

    // open-ended start cell: header at B3, data to the sheet's end
    val open = ExcelSource.readAddress(spark, dir, "data!B3")
    assert(open.columns.toSeq == Seq("sku", "qty", "notes"))
    assert(open.count() == 3) // rows 4, 6, 7

    // header-anchor guard (crealytics anchors the header at the range
    // start): a start row that is sparse-OMITTED from the XML (row 2)
    // or all-null INSIDE the column window (the title row 1 has only
    // A1, outside B:C) must fail loudly — silently promoting the next
    // qualifying row to header would mislabel every column by one row
    def anchorMsgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).toSeq
    Seq("'data'!B2:C6", "'data'!B1:C6").foreach { addr =>
      val ea = intercept[Exception] {
        ExcelSource.readAddress(spark, dir, addr).collect()
      }
      assert(anchorMsgs(ea).exists(_.contains("anchor")),
        s"$addr: expected the header-anchor failure, got: $ea")
    }

    // parser grammar: quoting, escaped quote, unqualified, rejects
    import ExcelSource.{DataAddress, SheetName, FirstSheet, CellRange}
    assert(DataAddress.parse("'it''s'!A1:B2") ==
      ((SheetName("it's"), CellRange(0, 0, Some(1), Some(1)))))
    assert(DataAddress.parse("C35") ==
      ((FirstSheet, CellRange(34, 2, None, None))))
    intercept[IllegalArgumentException] { DataAddress.parse("data!") }
    intercept[IllegalArgumentException] { DataAddress.parse("'data'A1") }
    intercept[IllegalArgumentException] { DataAddress.parse("data!C3:A1") }
    intercept[IllegalArgumentException] { DataAddress.parse("A0") } // 1-based
  }

  test("writeDir: distributed multi-partition export round-trips, empty partitions included") {
    val dir = TestSpark.tmpDir("xlsxdir")
    val df = spark.range(0, 100).selectExpr(
      "id", "concat('name-', id) AS name",
      "cast(id * 1.5 as double) AS score",
      "date_add(date'2024-01-01', cast(id as int)) AS d")
      .repartition(7)
    ExcelSource.writeDir(df, s"$dir/out")
    val parts = new java.io.File(s"$dir/out").listFiles()
      .map(_.getName).filter(_.endsWith(".xlsx")).sorted
    assert(parts.length == 7, parts.toSeq)
    assert(new java.io.File(s"$dir/out/_SUCCESS").exists())
    assert(!parts.exists(_.contains("inprogress")))
    val back = ExcelSource.read(spark, s"$dir/out")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", LongType), ("name", StringType),
          ("score", DoubleType), ("d", DateType)))
    val exp = df.selectExpr("id", "name", "score", "cast(d as string)")
      .as[(Long, String, Double, String)].collect().toSet
    val got = back.selectExpr("id", "name", "score", "cast(d as string)")
      .as[(Long, String, Double, String)].collect().toSet
    assert(got == exp)

    // empty frame: header-only parts still round-trip to the schema
    val empty = df.limit(0).repartition(3)
    ExcelSource.writeDir(empty, s"$dir/empty")
    val backEmpty = ExcelSource.read(spark, s"$dir/empty")
    assert(backEmpty.count() == 0)
    assert(backEmpty.columns.toSeq == Seq("id", "name", "score", "d"))

    // a ZERO-partition frame (no tasks scheduled at all) still yields
    // a readable header-only export
    val zero = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("x", LongType))))
    assert(zero.rdd.getNumPartitions == 0)
    ExcelSource.writeDir(zero, s"$dir/zerop")
    val backZ = ExcelSource.read(spark, s"$dir/zerop")
    assert(backZ.count() == 0 && backZ.columns.toSeq == Seq("x"))

    // a rerun into the same directory replaces stale parts (the first
    // export's 7 parts must not merge with a 2-partition rerun), and
    // sweeps a dead attempt's .inprogress leftover (planted here as a
    // crashed prior job would leave it)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/out", "part-00099.xlsx.inprogress-7"),
      "half-written".getBytes("UTF-8"))
    ExcelSource.writeDir(df.repartition(2), s"$dir/out")
    val all2 = new java.io.File(s"$dir/out").listFiles().map(_.getName)
    val parts2 = all2.filter(_.endsWith(".xlsx")).sorted
    assert(parts2.length == 2, parts2.toSeq)
    assert(!all2.exists(_.contains("inprogress")), all2.toSeq)
    val back2 = ExcelSource.read(spark, s"$dir/out")
    assert(back2.count() == 100)
  }

  test("publishPart: committed parts are never replaced — speculative " +
       "zombies lose the claim; dead-claimer takeover converges") {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dir = TestSpark.tmpDir("xlsx-claim")
    def plant(name: String, content: String): Path = {
      val p = new Path(dir, name)
      val os = fs.create(p, true)
      os.write(content.getBytes("UTF-8")); os.close(); p
    }
    def readOut(p: Path): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val out = new Path(dir, "part-00000.xlsx")
    val claim = new Path(dir, "part-00000.xlsx.claim")

    // 1. winner publishes: part committed, claim held, tmp gone
    val t1 = plant("part-00000.xlsx.inprogress-1", "winner")
    ExcelSource.publishPart(fs, t1, out, claim, 1, pollMs = 1, polls = 2)
    assert(readOut(out) == "winner" && fs.exists(claim) && !fs.exists(t1))

    // 2. the HARD contract: a late zombie twin (the attempt Spark
    // kills asynchronously after the stage completed) must NOT rename
    // over the committed part — old protocol tolerated that replace,
    // the claim protocol forbids it
    val t2 = plant("part-00000.xlsx.inprogress-2", "zombie")
    ExcelSource.publishPart(fs, t2, out, claim, 2, pollMs = 1, polls = 2)
    assert(readOut(out) == "winner", "zombie replaced a committed part")
    assert(!fs.exists(t2), "loser left its tmp behind")

    // 3. dead-claimer takeover: claim exists, no part (a claimer that
    // crashed between claim and rename) — the retry polls out, steals
    // the claim, and publishes
    val out3 = new Path(dir, "part-00001.xlsx")
    plant("part-00001.xlsx.claim", "99") // dead attempt's claim
    val t3 = plant("part-00001.xlsx.inprogress-3", "retry")
    ExcelSource.publishPart(fs, t3, out3,
      new Path(dir, "part-00001.xlsx.claim"), 3, pollMs = 1, polls = 2)
    assert(readOut(out3) == "retry", "takeover did not publish")
  }

  test("writeSheets rejects sheet names Excel itself would refuse") {
    // >31 chars, and each forbidden character — a workbook with such a
    // name is a valid zip this library round-trips but Excel "repairs"
    // or rejects on open; fail at the API boundary instead
    def attempt(name: String): Unit = {
      val out = new java.io.ByteArrayOutputStream()
      ExcelSource.writeSheets(
        Seq((name, Seq("a"), Seq(Seq[Any](1)))), out)
    }
    intercept[IllegalArgumentException](attempt("x" * 32))
    Seq(":", "\\", "/", "?", "*", "[", "]").foreach { ch =>
      intercept[IllegalArgumentException](attempt(s"q1${ch}draft"))
    }
    attempt("x" * 31) // at the cap: fine
    attempt("Q1 (draft) — final!") // parens/dash/bang: all legal
  }
}
