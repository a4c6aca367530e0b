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
  * and numbers (no `t`). Dates surface as their raw serial numbers —
  * downstream coercion is the transform layer's job, exactly as it is for
  * the CSV hop the reference itself degrades to (etl_pipeline.py:73–74). */
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
    * each padded/truncated to `width` when `width > 0`. */
  def rows(path: String, width: Int = -1): Vector[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      val strings = sharedStrings(zip)
      val sheet = zip.getEntry(firstSheetPath(zip))
      val r = factory.createXMLStreamReader(zip.getInputStream(sheet))
      val out = ArrayBuffer.empty[Array[String]]
      try {
        var row: ArrayBuffer[String] = null
        var cellCol = -1
        var cellType = ""
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
                      case _     => raw // n, str, inlineStr's t handled here too
                    }
                  }
                case "c" => cellCol = -1; cellType = ""
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
