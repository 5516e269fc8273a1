package lucy.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import lucy.LucySpec
import lucy.text.HtmlText

/** Ingest stages of the index build (SURVEY.md §3.1 stages 1–5):
  * lang filter (PF1) → url dedup (PF2) → text derivation (F1) →
  * deterministic docId (§8.5) → tokenize (F2).
  *
  * All plan nodes are DataFrame built-ins except the two audited UDFs
  * (extractText, tokenize) mandated by the byte-identity invariant
  * (SURVEY.md §2.3). The lang filter is pushed to the parquet scan by
  * Catalyst; dedup is a hash aggregation (partial+final `max_by`), not
  * a window sort — one shuffle on url, no per-partition global sort,
  * which is what survives at 10^12 rows.
  */
object Ingest {

  /** F1 — byte-identical text per url (BASELINE.json:15). */
  val extractTextUdf = udf((html: Array[Byte], text: String) => HtmlText.textOf(html, text))

  /** F2 — LucySpec tokenizer (SURVEY.md §8.2). */
  val tokenizeUdf = udf((text: String) => LucySpec.tokenize(text))

  /** Tokenizer with an explicit stemming flag (§8.7 r3: the stemming-ON
    * golden path; LucySpec.stemming stays the frozen default).
    */
  def tokenizeUdfFor(stem: Boolean) =
    udf((text: String) => LucySpec.tokenizeWith(text, stem))

  /** One document's postings for one term: tf + the varint-encoded
    * position stream (§8.3/§8.7 — absolute first position, then gaps).
    */
  case class TermPosting(term: String, tf: Int, pos: Array[Byte])

  /** A1 fused per-document (r2): (term → tf, positions) computed in ONE
    * local pass over the token array. A document's postings never span
    * rows, so aggregating them with a groupBy(docId, term) shuffle —
    * r1's shape — moves the entire exploded token stream (≈ corpus
    * tokens) across the wire to compute something every mapper already
    * has locally. This UDF replaces that shuffle with a narrow map, and
    * emits positions ALREADY varint-compressed so the big range
    * exchange carries ~1 byte/token instead of an int array.
    */
  val termPostingsUdf = udf((tokens: Seq[String]) => {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val acc = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    var i = 0
    val n = tokens.length
    while (i < n) {
      val t = tokens(i)
      acc.getOrElseUpdate(t, { order += t; scala.collection.mutable.ArrayBuffer.empty[Int] }) += i
      i += 1
    }
    order.iterator.map { t =>
      val ps = acc(t)
      TermPosting(t, ps.length, PostingBlock.encodePositions(ps.toArray))
    }.toArray
  })

  /** §8.5 — positive-63-bit xxhash64(url, seed 42); Spark's built-in
    * expression (codegen'd) — XxHash64Spec proves it equals
    * LucySpec.docIdForUrl used on the driver.
    */
  def docIdCol(url: Column): Column = xxhash64(url).bitwiseAND(lit(Long.MaxValue))

  /** pages(url, warc_ts, html, text, lang) →
    * (docId, url, warc_ts, lang, tokens) — deduped, filtered, tokenized.
    * Caller persists if it needs more than one pass (IndexBuilder does).
    *
    * Stage order (measured 5× faster than dedup-first at 270k docs):
    * extract BEFORE dedup so the dedup shuffle carries `text` instead of
    * raw `html` (≈ half the bytes — the shuffle is the cost, extraction
    * is idempotent per row so running it on recrawl losers is cheap);
    * tokenize AFTER dedup so only winners pay it. PF2 dedup is a max_by
    * hash aggregation (map-side combine), not a row_number window, which
    * would sort whole shuffle partitions.
    */
  def cleanPages(pages: DataFrame, lang: Option[String] = Some("en"),
                 stem: Boolean = LucySpec.stemming): DataFrame = {
    val filtered = lang.fold(pages)(l => pages.filter(col("lang") === l))
    val extracted = filtered
      .withColumn("text", extractTextUdf(col("html"), col("text")))
      // PF3: html dropped here — column pruning upstream means it was
      // only ever read for rows whose text was null.
      .select(col("url"), col("warc_ts"), col("text"), col("lang"))
    val deduped = extracted
      .groupBy(col("url"))
      .agg(max_by(struct(col("warc_ts"), col("text"), col("lang")), col("warc_ts")).as("r"))
      .select(col("url"), col("r.warc_ts").as("warc_ts"),
        col("r.text").as("text"), col("r.lang").as("lang"))
    deduped
      .withColumn("docId", docIdCol(col("url")))
      .withColumn("tokens", tokenizeUdfFor(stem)(col("text")))
      .select(col("docId"), col("url"), col("warc_ts"), col("lang"), col("tokens"))
  }

  /** docmap (SRC2): one row per document, docLen per §8.2. */
  def docmap(cleaned: DataFrame): DataFrame =
    cleaned.select(col("docId"), col("url"), col("warc_ts"), col("lang"),
      size(col("tokens")).as("docLen"))

  /** A1 — (docId, term) → tf. Explode + partial/final hash aggregation. */
  def termTf(cleaned: DataFrame): DataFrame =
    cleaned
      .select(col("docId"), explode(col("tokens")).as("term"))
      .groupBy(col("docId"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (docId, pos, term) — 0-based positions in the post-stopword token
    * stream (§8.2/§8.3); the naive phrase oracle's input.
    */
  def tokPos(cleaned: DataFrame): DataFrame =
    cleaned.select(col("docId"), posexplode(col("tokens")).as(Seq("pos", "term")))
}
