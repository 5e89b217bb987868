package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/text block parsing as pure column functions (SURVEY F11). The
  * reference walks a BeautifulSoup tree and assembles paragraph blocks
  * (reference: pipelines/datalake/extract_load/diario_oficial_rj/
  * utils.py:236-310 — table→"[tabela]" substitution, per-`<p>` text
  * extraction, NBSP/CR/LF cleanup, dots-only "irrelevant" filter; and
  * pipelines/reports/informes_seguranca/utils.py:92-93 — inter-tag +
  * multi-space compression). Re-expressed Spark-first, the tree walk
  * collapses into a chain of codegen'd `regexp_replace`/`split` column
  * expressions — no UDF, no driver loop — so block extraction runs inside
  * the scan's project at full whole-stage-codegen speed.
  */
object HtmlFunctions {

  /** Block-closing tags become this separator before tags are stripped. */
  private val Sep = "\u0001"

  /** The reference substitutes whole `<table>…</table>` subtrees with a
    * `[tabela]` paragraph (utils.py:237-246) — tables are flagged, not
    * flattened into word soup.
    */
  def replaceTables(html: Column): Column =
    regexp_replace(html, "(?is)<table.*?</table>", "<p>[tabela]</p>")

  /** Mark block boundaries — opening AND closing `p`/`div`/`h*`/`li`/`tr`
    * tags (attributes allowed) plus `<br>`/`<br/>` — with a control
    * separator so the block structure survives tag stripping.
    */
  def markBlockBreaks(html: Column): Column =
    regexp_replace(html,
      "(?i)<(?:/?(?:p|div|h[1-6]|li|tr)(?:\\s[^>]*)?|br\\s*/?)>", Sep)

  /** Drop every remaining tag. */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  /** Minimal entity decode + the reference's `clean_text` character fixes
    * (utils.py:248-258): NBSP/NNBSP→space, CR dropped, LF→space. `&amp;`
    * decodes LAST so `&amp;nbsp;` does not double-decode.
    */
  def cleanText(c: Column): Column = {
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
      }
    regexp_replace(
      regexp_replace(decoded, "[\u00A0\u202F\n]", " "), "\r", "")
  }

  /** Multi-whitespace → single space, trimmed (informes_seguranca
    * utils.py:92-93).
    */
  def compressWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s{2,}", " "))

  /** The reference's inter-tag squeeze (`>\s+<` → `><`) — applied to RAW
    * html before parsing when markup arrives pretty-printed.
    */
  def compressInterTag(html: Column): Column =
    regexp_replace(html, ">\\s+<", "><")

  /** Full block extraction: tables flagged → block breaks marked → tags
    * stripped → entities/NBSP cleaned → per-block whitespace squeeze →
    * empty and dots-only ("irrelevant", utils.py:260-266) blocks dropped.
    * Returns `array<string>` of text blocks in document order.
    */
  def htmlBlocks(html: Column): Column = {
    val pieces = split(
      cleanText(stripTags(markBlockBreaks(replaceTables(html)))), Sep)
    filter(
      transform(pieces, b => compressWhitespace(b)),
      b => b =!= "" && !b.rlike("^[.\\s]+$"))
  }

  /** Assembled document text: blocks joined by newline (the reference's
    * `"\n".join(...)` section assembly, utils.py:359).
    */
  def htmlText(html: Column): Column = array_join(htmlBlocks(html), "\n")
}
