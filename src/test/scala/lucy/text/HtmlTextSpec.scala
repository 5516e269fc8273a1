package lucy.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Golden byte-for-byte checks for the extractor (BASELINE.json:15
  * byte-identity invariant; SURVEY.md §8.1).
  */
class HtmlTextSpec extends AnyFunSuite {

  private def ex(html: String): String =
    HtmlText.extractFromHtml(html.getBytes(StandardCharsets.UTF_8))

  test("strips script, style, comments, tags; collapses whitespace") {
    val html = """<html><head><title>My Title</title><style>p{color:red}</style>
      |<script>var x = "<b>not text</b>";</script></head>
      |<body><h1>My   Title</h1><p>hello
      |world</p><!-- hidden --></body></html>""".stripMargin
    assert(ex(html) === "My Title My Title hello world")
  }

  test("decodes exactly the fixed entity set, single pass") {
    assert(ex("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g</p>")
      === "a & b <c> \"d\" 'e' f g")
    // &amp;lt; must NOT double-decode to '<'
    assert(ex("<p>&amp;lt;</p>") === "&lt;")
    // unknown entities pass through
    assert(ex("<p>&copy;</p>") === "&copy;")
  }

  test("case-insensitive script/style, attributes on tags") {
    assert(ex("""<SCRIPT type="text/javascript">alert(1)</SCRIPT><p class="x">ok</p>""") === "ok")
    assert(ex("""<StYlE media="all">body{}</StYlE>ok""") === "ok")
  }

  test("malformed UTF-8 becomes U+FFFD") {
    val bad = Array[Byte]('<'.toByte, 'p'.toByte, '>'.toByte, 0xFF.toByte, 'a'.toByte)
    assert(HtmlText.extractFromHtml(bad) === "�a")
  }

  test("null-safety and text-verbatim rule") {
    assert(HtmlText.extractFromHtml(null) === "")
    assert(HtmlText.textOf(null, "given text") === "given text")
    assert(HtmlText.textOf("<p>x</p>".getBytes(StandardCharsets.UTF_8), null) === "x")
  }

  test("scanner == frozen regex reference on adversarial inputs (property)") {
    val rnd = new scala.util.Random(42)
    val frags = Array("<script>", "</script>", "</script >", "<SCRIPT a=b>",
      "<style>", "</style>", "<!--", "-->", "<scriptx>", "<script_b>",
      "<b>", "</b>", "<", ">", "<b", "&amp;", "&lt;", "&GT;", "&nbsp;",
      "&#39;", "&amp", "& amp;", "text", "a  b", "\t", "\n", " ", "x<y",
      "var q = \"<b>\";", "p{color:red}", "<!-- <script> -->", "é中")
    (0 until 3000).foreach { caseNo =>
      val html = (0 until rnd.nextInt(24)).map(_ => frags(rnd.nextInt(frags.length))).mkString
      val ref = HtmlText.extractReference(html)
      val fast = HtmlText.extractFast(html)
      assert(fast === ref, s"case $caseNo input: ${html.replace("\n", "\\n").replace("\t", "\\t")}")
    }
    // plus the generated corpus pages (both html variants)
    (0L until 200L).foreach { i =>
      val h = new String(lucy.fixtures.PagesGen.page(i).html, StandardCharsets.UTF_8)
      assert(HtmlText.extractFast(h) === HtmlText.extractReference(h), s"page $i")
    }
  }

  test("golden: the PagesGen template extracts deterministically") {
    val p = lucy.fixtures.PagesGen.page(0L)
    val extracted = HtmlText.extractFromHtml(p.html)
    assert(extracted.nonEmpty)
    assert(!extracted.contains("<"))
    assert(!extracted.contains("var x=1"))
    assert(!extracted.contains("color:red"))
    // odd ids carry the exact extractor output in `text` (FIXTURES.md §1)
    val p1 = lucy.fixtures.PagesGen.page(1L)
    assert(p1.text === HtmlText.extractFromHtml(p1.html))
  }
}
