package lucy.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import lucy.LucySpec
import lucy.text.HtmlText

/** One synthesized Common-Crawl-style page (the exact input_hint shape,
  * BASELINE.json:15 / FIXTURES.md §1).
  */
case class Page(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
                text: String, lang: String)

/** Deterministic corpus generator (FIXTURES.md §1). Every row is a pure
  * function of (seed=42, docOrdinal), so N-row and 4N-row corpora share
  * prefixes, `local[8]` and `local[32]` builds see identical input, and
  * resumed builds regenerate identical partitions.
  *
  * Vocabulary is zipf-weighted (rank r drawn with weight ∝ 1/(r+1)) and
  * deliberately contains stopwords and a few very frequent head terms so
  * stopword filtering and head-term salting paths are exercised.
  */
object PagesGen {

  /** 64-word vocab: head terms first (zipf rank order), stopwords mixed in. */
  val vocab: Array[String] = Array(
    "spark", "the", "shuffle", "partition", "index", "of", "posting", "term",
    "query", "and", "merge", "sort", "join", "a", "scan", "filter",
    "broadcast", "executor", "driver", "stage", "task", "block", "varint",
    "delta", "skip", "wand", "heap", "score", "rank", "text", "token",
    "stopword", "segment", "manifest", "resume", "checkpoint", "lineage",
    "metric", "parquet", "iceberg", "catalyst", "codegen", "tungsten",
    "columnar", "vectorized", "pushdown", "pruning", "salting", "skew",
    "range", "hash", "bucket", "stream", "batch", "watermark", "compaction",
    "docid", "corpus", "crawl", "warc", "html", "entity", "anchor", "snippet")

  private val cumWeights: Array[Double] = {
    val w = vocab.indices.map(r => 1.0 / (r + 1)).toArray
    val total = w.sum
    val cum = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(w.length - 1) = 1.0
    cum
  }

  /** Zipf-ish draw: vocab word for row i, draw j. */
  def word(i: Long, j: Long): String = {
    val u = LucySpec.unitDouble(LucySpec.rnd(i, j))
    var lo = 0; var hi = cumWeights.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cumWeights(mid) <= u) lo = mid + 1 else hi = mid
    }
    vocab(lo)
  }

  private val epochMs = 1704067200000L // 2024-01-01T00:00:00Z

  def page(i: Long): Page = {
    val title = (0 until (2 + (LucySpec.rnd(i, 1000000) & 0x3L).toInt))
      .map(j => word(i, 2000000 + j)).mkString(" ")
    val bodyLen = 20 + (Math.floorMod(LucySpec.rnd(i, 1000001), 181L)).toInt // 20..200
    val body = (0 until bodyLen).map(j => word(i, j)).mkString(" ")
    val html =
      s"""<html><head><title>$title</title><style>p{color:red}</style><script>var x=1;</script></head><body><h1>$title</h1><p>$body</p><!-- crawler --></body></html>"""
    val htmlBytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // even ids: text=null forces the html extraction path; odd ids carry the
    // exact extractor output so both paths byte-agree (FIXTURES.md §1).
    val text = if (i % 2 == 0) null else HtmlText.extractFromHtml(htmlBytes)
    val langs = Array("de", "es", "fr", "zh")
    val lang = if (i % 10 != 9) "en" else langs(((i / 10) % 4).toInt)
    Page(s"https://example.org/p/$i",
      new java.sql.Timestamp(epochMs + i * 1000L), htmlBytes, text, lang)
  }

  /** Distributed generation — one narrow map over spark.range, no shuffle. */
  def pages(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(0L, n)
    base.as[Long].map(page _).toDF()
  }

  /** Recrawl variant: same urls re-emitted with a later warc_ts and a
    * marker token appended — exercises url-dedup (PF2) and streaming
    * compaction. Pure function of ordinal as well.
    */
  def recrawl(spark: SparkSession, n: Long, tsOffsetSec: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n).as[Long].map { i =>
      val p = page(i)
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
        .replace("</p>", " recrawl</p>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      Page(p.url, new java.sql.Timestamp(epochMs + (i + tsOffsetSec) * 1000L),
        html, if (i % 2 == 0) null else HtmlText.extractFromHtml(html), p.lang)
    }.toDF()
  }
}
