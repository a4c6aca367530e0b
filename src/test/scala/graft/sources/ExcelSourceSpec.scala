package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Excel DataSourceV2 specs: reads a programmatically-built OOXML
  * workbook (shared strings, inline strings, numbers, empty cells),
  * prunes columns, and feeds the E2E pipeline. */
class ExcelSourceSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark

  /** Build a minimal .xlsx: sharedStrings for the header, inline strings
    * and numeric cells in the data rows, one deliberately-empty cell. */
  private def writeXlsx(path: String, header: Seq[String], rows: Seq[Seq[Any]]): String = {
    def colRef(c: Int, r: Int): String = {
      require(c < 26); s"${('A' + c).toChar}${r + 1}"
    }
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    entry("xl/sharedStrings.xml",
      "<?xml version=\"1.0\"?><sst>" +
        header.map(h => s"<si><t>$h</t></si>").mkString + "</sst>")
    val headerXml = header.indices.map(c =>
      s"""<c r="${colRef(c, 0)}" t="s"><v>$c</v></c>""").mkString
    val dataXml = rows.zipWithIndex.map { case (row, r) =>
      val cells = row.zipWithIndex.collect {
        case (v: String, c) =>
          s"""<c r="${colRef(c, r + 1)}" t="inlineStr"><is><t>$v</t></is></c>"""
        case (v: Int, c)    => s"""<c r="${colRef(c, r + 1)}"><v>$v</v></c>"""
        case (v: Double, c) => s"""<c r="${colRef(c, r + 1)}"><v>$v</v></c>"""
        // null → no cell element at all (sparse row, like real writers)
      }.mkString
      s"""<row r="${r + 2}">$cells</row>"""
    }.mkString
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData><row r="1">$headerXml</row>$dataXml</sheetData></worksheet>""")
    zos.close()
    path
  }

  private lazy val salesXlsx: String = {
    val dir = Files.createDirectories(java.nio.file.Paths.get("target/fixtures")).toString
    writeXlsx(s"$dir/store_sales.xlsx",
      Seq("dt", "store", "product", "units", "amount"),
      Seq(
        Seq("2024-01-05", "S01", "P001", 3, 29.97),
        Seq("2024-01-06", "S01", "P002", 1, 9.99),
        Seq("2024-01-07", null, "P001", 2, 19.98)))
  }

  test("reads header-row schema and all cell kinds (shared/inline/number/empty)") {
    val df = Sources.excel(spark, salesXlsx)
    assert(df.columns.toSeq == Seq("dt", "store", "product", "units", "amount"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.orderBy("dt").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "2024-01-05" && rows(0).getString(3) == "3")
    assert(rows(2).getString(1) == null) // sparse cell → null
  }

  test("column pruning pushes into the scan") {
    val df = Sources.excel(spark, salesXlsx).select("product")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("P001", "P001", "P002"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("product") && !plan.contains("amount"))
  }

  test("registered by short name: spark.read.format(\"xlsx\")") {
    assert(spark.read.format("xlsx").load(salesXlsx).count() == 3)
  }

  test("first tab resolved via workbook.xml when it is not sheet1.xml") {
    val dir = Files.createDirectories(java.nio.file.Paths.get("target/fixtures")).toString
    val path = s"$dir/multi_sheet.xlsx"
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    def sheetXml(headerName: String, value: String): String =
      s"""<?xml version="1.0"?><worksheet><sheetData>""" +
        s"""<row r="1"><c r="A1" t="inlineStr"><is><t>$headerName</t></is></c></row>""" +
        s"""<row r="2"><c r="A2" t="inlineStr"><is><t>$value</t></is></c></row>""" +
        "</sheetData></worksheet>"
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    // the workbook's FIRST tab is rId2 → sheet2.xml (e.g. after reordering)
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Data" sheetId="2" r:id="rId2"/><sheet name="Old" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>""" +
        "</Relationships>")
    entry("xl/worksheets/sheet1.xml", sheetXml("wrong_sheet", "nope"))
    entry("xl/worksheets/sheet2.xml", sheetXml("right_sheet", "yes"))
    zos.close()
    val df = Sources.excel(spark, path)
    assert(df.columns.toSeq == Seq("right_sheet"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("yes"))
  }

  test("duplicate header names disambiguate as name.1 and resolve by position") {
    val dir = Files.createDirectories(java.nio.file.Paths.get("target/fixtures")).toString
    val path = writeXlsx(s"$dir/dup_headers.xlsx",
      Seq("a", "a", "b"), Seq(Seq("x", "y", "z")))
    val df = Sources.excel(spark, path)
    assert(df.columns.toSeq == Seq("a", "a.1", "b"))
    val r = df.select("`a.1`", "a", "b").head()
    assert(r.getString(0) == "y" && r.getString(1) == "x" && r.getString(2) == "z")
  }

  test("date-styled numeric cells round-trip to TimestampType via the coerce transform") {
    val dir = Files.createDirectories(java.nio.file.Paths.get("target/fixtures")).toString
    val path = s"$dir/dated.xlsx"
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    // style 0 = general; style 1 = builtin date (numFmtId 14); style 2 =
    // CUSTOM date-time code (164); style 3 = custom non-date code (165);
    // style 4 = builtin ELAPSED time (46, [h]:mm:ss — a duration);
    // style 5 = custom elapsed code (166)
    entry("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet>""" +
        """<numFmts count="3"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm"/>""" +
        """<numFmt numFmtId="165" formatCode="#,##0.00"/>""" +
        """<numFmt numFmtId="166" formatCode="[h]:mm:ss"/></numFmts>""" +
        """<cellXfs count="6"><xf numFmtId="0"/><xf numFmtId="14"/>""" +
        """<xf numFmtId="164"/><xf numFmtId="165"/>""" +
        """<xf numFmtId="46"/><xf numFmtId="166"/></cellXfs></styleSheet>""")
    // 45301 = 2024-01-10 (1900 system); .5 = noon. One date-styled integer
    // serial, one date-styled fractional serial, one PLAIN numeric with a
    // non-date custom style, and two ELAPSED-styled durations (1.25 =
    // 30 hours) that must stay raw serials, never 1899 dates.
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>sold_at</t></is></c>""" +
        """<c r="B1" t="inlineStr"><is><t>updated</t></is></c>""" +
        """<c r="C1" t="inlineStr"><is><t>amount</t></is></c>""" +
        """<c r="D1" t="inlineStr"><is><t>elapsed_b</t></is></c>""" +
        """<c r="E1" t="inlineStr"><is><t>elapsed_c</t></is></c></row>""" +
        """<row r="2"><c r="A2" s="1"><v>45301</v></c>""" +
        """<c r="B2" s="2"><v>45301.5</v></c>""" +
        """<c r="C2" s="3"><v>19.98</v></c>""" +
        """<c r="D2" s="4"><v>1.25</v></c>""" +
        """<c r="E2" s="5"><v>1.25</v></c></row>""" +
        "</sheetData></worksheet>")
    zos.close()
    val df = Sources.excel(spark, path)
    val raw = df.head()
    assert(raw.getString(0) == "2024-01-10 00:00:00")
    assert(raw.getString(1) == "2024-01-10 12:00:00") // custom date code detected
    assert(raw.getString(2) == "19.98") // non-date custom style untouched
    assert(raw.getString(3) == "1.25") // builtin elapsed (46): duration stays raw
    assert(raw.getString(4) == "1.25") // custom [h]:mm:ss: duration stays raw
    val typed = graft.etl.Transforms.coerceTimestamp(
      graft.etl.Transforms.coerceTimestamp(df, "sold_at"), "updated")
    assert(typed.schema("sold_at").dataType.typeName == "timestamp")
    val ts = typed.select("sold_at", "updated").head()
    assert(ts.getTimestamp(0).toString.startsWith("2024-01-10 00:00:00"))
    assert(ts.getTimestamp(1).toString.startsWith("2024-01-10 12:00:00"))
  }

  test("E2E: pipeline ingests xlsx directly (S1 without the CSV degrade)") {
    val products = {
      val p = java.nio.file.Paths.get("target/fixtures/xlsx_products.json")
      Files.writeString(p,
        """[{"product_id": "P001", "product_name": "Widget", "price": 9.99},
          |{"product_id": "P002", "product_name": "Gadget", "price": 19.99}]""".stripMargin)
      p.toString
    }
    val results = graft.pipeline.Pipeline.run(spark, salesXlsx, products, database = "test_xlsx")
    assert(results.forall(_.passed))
    // the null-store row is dropped by the transform (P9), as with any source
    assert(spark.table("test_xlsx.store_sales").count() == 2)
  }
}
