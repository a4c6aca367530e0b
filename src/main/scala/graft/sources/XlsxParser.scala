package graft.sources

import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

/** Minimal xlsx parsing — SURVEY.md §7.4 phase-2: an Excel workbook is a
  * zip of XML parts (ECMA-376 / ISO 29500, the public OOXML spec), so a
  * header-row tabular read needs only `java.util.zip` + StAX, both in the
  * JDK. Covers what `pd.read_excel` does in the reference
  * (dags/etl_pipeline.py:70): first sheet, first row = header, cells as
  * strings.
  *
  * Supported cell types: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula strings (`t="str"`), booleans (`t="b"`),
  * and numbers (no `t`). Numeric cells whose STYLE renders as a date
  * (xl/styles.xml numFmt — what pandas uses to produce datetime64) are
  * converted from Excel serials to "yyyy-MM-dd HH:mm:ss" strings; typed
  * coercion to TimestampType remains the transform layer's job, exactly
  * as it is for the CSV hop the reference itself degrades to
  * (etl_pipeline.py:73–74). */
object XlsxParser {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    // not expecting DTDs in OOXML; disable external entity resolution
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** "BC" of "BC12" → 0-based column index. */
  def colIndex(cellRef: String): Int = {
    var idx = 0
    var i = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      idx = idx * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    idx - 1
  }

  /** The workbook's shared-string table (xl/sharedStrings.xml); rich-text
    * runs are concatenated. Empty when the part is absent. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val out = ArrayBuffer.empty[String]
    val r = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      var current: StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => current = new StringBuilder
              case "t"  => inT = true
              case _    =>
            }
          case XMLStreamConstants.CHARACTERS if inT && current != null =>
            current.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t"  => inT = false
              case "si" => out += current.toString; current = null
              case _    =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  // ── date-styled numeric cells ─────────────────────────────────────────

  /** Built-in OOXML numFmtIds that render as CALENDAR dates/times
    * (ECMA-376 §18.8.30: 14–22). 45–47 are ELAPSED-time formats
    * ([h]:mm:ss family) — a duration, not a point in time; converting
    * their serials through the date epoch would fabricate 1899/1904
    * dates, so they stay raw (as pandas surfaces them as timedeltas,
    * not datetimes). */
  private def isBuiltinDateFmt(id: Int): Boolean = id >= 14 && id <= 22

  /** Heuristic for CUSTOM format codes (the pandas/openpyxl test): after
    * stripping bracketed sections, quoted literals, and escaped chars, any
    * of y/m/d/h/s marks a date-time format — EXCEPT elapsed-time codes
    * (`[h]`, `[m]`, `[s]` brackets), which are durations and stay raw. */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val lower = code.toLowerCase
    if (lower.contains("[h") || lower.contains("[m") || lower.contains("[s"))
      return false
    val sb = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < code.length) {
      code.charAt(i) match {
        case '"'              => inQuote = !inQuote
        case '\\' if !inQuote => i += 1 // skip escaped char
        case '[' if !inQuote  =>
          while (i < code.length && code.charAt(i) != ']') i += 1
        case ch if !inQuote   => sb.append(ch)
        case _                =>
      }
      i += 1
    }
    sb.toString.toLowerCase.exists("ymdhs".contains(_))
  }

  /** Per-style-index "renders as a date" flags from xl/styles.xml: custom
    * `numFmt` codes plus `cellXfs` xf → numFmtId (document order puts
    * numFmts before cellXfs, so one StAX pass suffices). Empty when the
    * part is absent (every style then falls back to raw serials). */
  private def dateStyles(zip: ZipFile): Array[Boolean] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return Array.empty
    val customDate = scala.collection.mutable.HashSet.empty[Int]
    val xfIsDate = ArrayBuffer.empty[Boolean]
    var inCellXfs = false
    val r = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "numFmt" =>
                val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.trim.toInt)
                val code = Option(r.getAttributeValue(null, "formatCode"))
                if (id.isDefined && code.exists(isDateFormatCode)) customDate += id.get
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                val fmt = Option(r.getAttributeValue(null, "numFmtId"))
                  .map(_.trim.toInt).getOrElse(0)
                xfIsDate += (isBuiltinDateFmt(fmt) || customDate.contains(fmt))
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
      }
    } finally r.close()
    xfIsDate.toArray
  }

  /** Whether the workbook uses the 1904 date system (Mac-origin workbooks;
    * xl/workbook.xml workbookPr/@date1904). */
  private def isDate1904(zip: ZipFile): Boolean = {
    val entry = zip.getEntry("xl/workbook.xml")
    if (entry == null) return false
    val r = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
          val v = Option(r.getAttributeValue(null, "date1904")).getOrElse("")
          return v == "1" || v.equalsIgnoreCase("true")
        }
      }
      false
    } finally r.close()
  }

  /** Excel serial → "yyyy-MM-dd HH:mm:ss" (the string form the transform
    * layer's datetime coercion parses into TimestampType). 1900 system
    * epoch is 1899-12-30 — the standard convention that absorbs Excel's
    * phantom 1900-02-29 for all modern dates; fractional days round to the
    * nearest second, as pandas/openpyxl render. */
  private[sources] def serialToDatetime(serial: Double, date1904: Boolean): String = {
    val epoch = if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else java.time.LocalDate.of(1899, 12, 30)
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    epoch.atStartOfDay.plusDays(days).plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  private val RelNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** r:id of the first `<sheet>` in xl/workbook.xml (tab order), if the
    * part and attribute exist. */
  private def firstSheetRelId(zip: ZipFile): Option[String] = {
    val entry = zip.getEntry("xl/workbook.xml")
    if (entry == null) return None
    val r = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
          return Option(r.getAttributeValue(RelNs, "id"))
      }
      None
    } finally r.close()
  }

  /** Target of a relationship id in xl/_rels/workbook.xml.rels, resolved
    * to a zip part name. */
  private def relTarget(zip: ZipFile, rid: String): Option[String] = {
    val entry = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (entry == null) return None
    val r = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == rid) {
          return Option(r.getAttributeValue(null, "Target")).map { t =>
            if (t.startsWith("/")) t.drop(1) else s"xl/$t"
          }
        }
      }
      None
    } finally r.close()
  }

  /** First worksheet part name. Resolves the workbook's ACTUAL first tab
    * via xl/workbook.xml (sheet order) → r:id → workbook.xml.rels target
    * (a workbook's first tab need not be sheet1.xml — e.g. after sheet
    * reordering, or when part names reach sheet10.xml, which sorts before
    * sheet2.xml). Falls back to the conventional part name, then to the
    * lexicographically smallest worksheet part, when the workbook/rels
    * parts are absent or unresolvable. */
  private def firstSheetPath(zip: ZipFile): String = {
    val viaWorkbook = firstSheetRelId(zip)
      .flatMap(relTarget(zip, _))
      .filter(zip.getEntry(_) != null)
    viaWorkbook.getOrElse {
      val conventional = "xl/worksheets/sheet1.xml"
      if (zip.getEntry(conventional) != null) conventional
      else {
        val entries = zip.entries()
        var best: String = null
        while (entries.hasMoreElements) {
          val n = entries.nextElement().getName
          if (n.startsWith("xl/worksheets/") && n.endsWith(".xml") && (best == null || n < best))
            best = n
        }
        require(best != null, s"no worksheet parts in ${zip.getName}")
        best
      }
    }
  }

  /** All rows of the first sheet as string cells (null = empty cell),
    * each padded/truncated to `width` when `width > 0`. Numeric cells whose
    * style renders as a date surface as "yyyy-MM-dd HH:mm:ss" strings (the
    * pandas `read_excel` datetime64 family), not raw serials. */
  def rows(path: String, width: Int = -1): Vector[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      val strings = sharedStrings(zip)
      val dateStyle = dateStyles(zip)
      val use1904 = isDate1904(zip)
      val sheet = zip.getEntry(firstSheetPath(zip))
      val r = factory.createXMLStreamReader(zip.getInputStream(sheet))
      val out = ArrayBuffer.empty[Array[String]]
      try {
        var row: ArrayBuffer[String] = null
        var cellCol = -1
        var cellType = ""
        var cellStyle = -1
        var inV = false
        var text = new StringBuilder
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" => row = ArrayBuffer.empty[String]
                case "c" =>
                  val ref = Option(r.getAttributeValue(null, "r"))
                  cellCol = ref.map(colIndex).getOrElse(row.length)
                  cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                  cellStyle = Option(r.getAttributeValue(null, "s"))
                    .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(-1)
                case "v" | "t" => inV = true; text = new StringBuilder
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inV =>
              text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" | "t" =>
                  inV = false
                  if (row != null && cellCol >= 0) {
                    while (row.length <= cellCol) row += null
                    val raw = text.toString
                    row(cellCol) = cellType match {
                      case "s"   => strings(raw.trim.toInt)
                      case "b"   => if (raw.trim == "1") "true" else "false"
                      case "" | "n" if cellStyle >= 0 && cellStyle < dateStyle.length &&
                          dateStyle(cellStyle) =>
                        scala.util.Try(raw.trim.toDouble).toOption
                          .map(serialToDatetime(_, use1904)).getOrElse(raw)
                      case _     => raw // n, str, inlineStr's t handled here too
                    }
                  }
                case "c" => cellCol = -1; cellType = ""; cellStyle = -1
                case "row" =>
                  if (row != null) {
                    val w = if (width > 0) width else row.length
                    val arr = new Array[String](w)
                    var i = 0
                    while (i < math.min(w, row.length)) { arr(i) = row(i); i += 1 }
                    out += arr
                  }
                  row = null
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      out.toVector
    } finally zip.close()
  }

  /** Header names from the first row (pd.read_excel header=0 semantics);
    * unnamed columns become col0, col1, …; duplicate names are
    * disambiguated as name.1, name.2 (pandas mangle_dupe_cols) — without
    * this, by-name column resolution would silently read the FIRST
    * occurrence's cells for every duplicate. */
  def header(path: String): Array[String] = {
    val first = rows(path).headOption.getOrElse(Array.empty[String])
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    first.zipWithIndex.map { case (h, i) =>
      val base = if (h == null || h.isEmpty) s"col$i" else h
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"$base.$n"
    }
  }
}
