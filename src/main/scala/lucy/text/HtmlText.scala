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

  /** Production path: the single-pass scanner. Byte-identical to
    * `extractReference` (the four-regex-pass spec-literal pipeline) —
    * HtmlTextSpec property-tests the equality on adversarial inputs.
    * The scanner exists because the regex pipeline makes four full-string
    * copies per document (~6 KB of garbage per 1.4 KB page), which made
    * ingest memory-bandwidth-bound at 32 cores.
    */
  def extractFromString(html: String): String = {
    if (html == null || html.isEmpty) return ""
    extractFast(html)
  }

  /** Normative reference implementation (SURVEY.md §8.1, frozen). */
  def extractReference(html: String): String = {
    if (html == null || html.isEmpty) return ""
    var s = scriptStyleComment.matcher(html).replaceAll("")
    s = anyTag.matcher(s).replaceAll(" ")
    s = decodeEntities(s)
    s = wsRun.matcher(s).replaceAll(" ")
    s.trim
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Case-insensitive region match of lowercase `pat` at s(i). */
  private def matchesAt(s: String, i: Int, pat: String): Boolean =
    s.regionMatches(true, i, pat, 0, pat.length)

  /** Find the end of `</script\s*>` / `</style\s*>` starting the search
    * at `from`; returns index AFTER the closing '>' or -1.
    */
  private def findClose(s: String, from: Int, name: String): Int = {
    val pat = "</" + name
    var i = from
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == '<' && matchesAt(s, i, pat)) {
        var j = i + pat.length
        // java-regex \s = [ \t\n\x0B\f\r]
        while (j < n && { val w = s.charAt(j)
          w == ' ' || w == '\t' || w == '\n' || w == '\u000B' || w == '\f' || w == '\r' }) j += 1
        if (j < n && s.charAt(j) == '>') return j + 1
      }
      i += 1
    }
    -1
  }

  /** Scanner equal to the reference pipeline, in two exact passes (the
    * reference is inherently two-phase: removing a comment can CREATE a
    * tag that the tag-stripping phase then removes, so a single pass
    * cannot be equal on all inputs).
    *
    * Pass 1 mirrors `(?is)<script\b[^>]*>.*?</script\s*> | <style…> |
    * <!--.*?-->` → "": leftmost scan, skip matched blocks, copy all else.
    * Pass 2 fuses tag→space, the entity set, and whitespace collapse +
    * trim into one scan (safe to fuse: entities never span a removed tag
    * because the tag's replacement space breaks any candidate, and
    * decoded characters are never rescanned).
    */
  def extractFast(html: String): String = pass2(pass1(html))

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** script/style/comment removal (reference pass 1). */
  private def pass1(html: String): String = {
    val n = html.length
    var i = html.indexOf('<')
    if (i < 0) return html
    val sb = new java.lang.StringBuilder(n)
    sb.append(html, 0, i)
    while (i < n) {
      val c = html.charAt(i)
      var skippedTo = -1
      if (c == '<') {
        if (matchesAt(html, i, "<script") || matchesAt(html, i, "<style")) {
          val name = if (matchesAt(html, i, "<script")) "script" else "style"
          val after = i + 1 + name.length
          // \b: next char must not be a word char (end-of-input is a boundary)
          if (after >= n || !isWordChar(html.charAt(after))) {
            var e = after // [^>]*> — scan to the first '>'
            while (e < n && html.charAt(e) != '>') e += 1
            if (e < n) {
              val close = findClose(html, e + 1, name)
              if (close > 0) skippedTo = close
            }
          }
        } else if (matchesAt(html, i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          if (end >= 0) skippedTo = end + 3
        }
      }
      if (skippedTo > 0) i = skippedTo
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** tags → space, entity decode, whitespace collapse, trim (reference
    * passes 2–4 fused).
    */
  private def pass2(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n / 4)
    var pendingSpace = false
    var i = 0

    @inline def emit(c: Char): Unit = {
      if (pendingSpace) {
        if (sb.length() > 0) sb.append(' ') // leading spaces trimmed
        pendingSpace = false
      }
      sb.append(c)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // `<[^>]*>` → one space; a '<' with no closing '>' stays literal
        var e = i + 1
        while (e < n && html.charAt(e) != '>') e += 1
        if (e < n) { i = e + 1; pendingSpace = true }
        else { emit('<'); i += 1 }
      } else if (c == '&') {
        // exact, case-sensitive entity set; decoded chars not rescanned
        if (html.regionMatches(i, "&amp;", 0, 5)) { emit('&'); i += 5 }
        else if (html.regionMatches(i, "&lt;", 0, 4)) { emit('<'); i += 4 }
        else if (html.regionMatches(i, "&gt;", 0, 4)) { emit('>'); i += 4 }
        else if (html.regionMatches(i, "&quot;", 0, 6)) { emit('"'); i += 6 }
        else if (html.regionMatches(i, "&#39;", 0, 5)) { emit('\''); i += 5 }
        else if (html.regionMatches(i, "&nbsp;", 0, 6)) { pendingSpace = true; i += 6 }
        else { emit('&'); i += 1 }
      } else if (isWs(c)) {
        pendingSpace = true // trailing run dropped by never flushing
        i += 1
      } else {
        emit(c)
        i += 1
      }
    }
    sb.toString
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
