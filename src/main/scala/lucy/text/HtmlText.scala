package lucy.text

import java.nio.charset.StandardCharsets
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer
import java.util.regex.Pattern

/** HTML → plain text extraction (SURVEY.md §8.1).
  *
  * The invariant from BASELINE.json:15 is *byte-identical extracted
  * text per url*: this must be one pure, audited function — hence a
  * single Scala UDF rather than composed built-ins (decision recorded
  * in SURVEY.md §2.3 F1). It runs once per document at ingest, so the
  * codegen boundary cost is irrelevant next to the parsing itself.
  *
  * Pipeline: UTF-8 decode (malformed → U+FFFD) → strip <script>…,
  * <style>…, <!-- … --> (non-greedy, case-insensitive) → every
  * remaining tag → one space → decode the fixed entity set → collapse
  * [ \t\r\n]+ to one space → trim.
  */
object HtmlText {

  private val scriptStyleComment: Pattern = Pattern.compile(
    "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>|<!--.*?-->")
  private val anyTag: Pattern = Pattern.compile("<[^>]*>")
  // single pass over the fixed entity set — avoids double-decoding &amp;lt;
  private val entity: Pattern = Pattern.compile("&(amp|lt|gt|quot|#39|nbsp);")
  private val wsRun: Pattern = Pattern.compile("[ \\t\\r\\n]+")

  /** Lenient UTF-8 decode: malformed/unmappable bytes become U+FFFD. */
  def decodeUtf8(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  def extractFromHtml(html: Array[Byte]): String = {
    if (html == null) return ""
    extractFromString(decodeUtf8(html))
  }

  def extractFromString(html: String): String = {
    if (html == null || html.isEmpty) return ""
    var s = scriptStyleComment.matcher(html).replaceAll("")
    s = anyTag.matcher(s).replaceAll(" ")
    s = decodeEntities(s)
    s = wsRun.matcher(s).replaceAll(" ")
    s.trim
  }

  private def decodeEntities(s: String): String = {
    val m = entity.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      sb.append(m.group(1) match {
        case "amp"  => "&"
        case "lt"   => "<"
        case "gt"   => ">"
        case "quot" => "\""
        case "#39"  => "'"
        case "nbsp" => " "
      })
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  /** The per-row rule from BASELINE.json:15: if `text` is present it is
    * taken verbatim; otherwise it is derived from `html`. Null-safe
    * (SURVEY.md §7.3 item 5).
    */
  def textOf(html: Array[Byte], text: String): String =
    if (text != null) text else extractFromHtml(html)
}
