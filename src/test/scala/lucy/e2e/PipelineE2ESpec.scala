package lucy.e2e

import java.nio.file.Files
import org.apache.spark.sql.functions._
import lucy.SparkFunSuite
import lucy.index._
import lucy.pipeline.{Dedup, TextAnalysis}
import lucy.query.{NaiveSearch, QueryMode, Searcher}

/** The composition the library exists for (r4): a training-data
  * pipeline chaining the pipeline operators into the engine —
  * exact-dedup → quality filter → index build → BM25 serving — and the
  * result must stay rank-identical to the naive oracle over exactly
  * the filtered corpus. This is the "a reference user could switch"
  * integration check: every stage is the public API, end to end.
  */
class PipelineE2ESpec extends SparkFunSuite {

  test("dedup -> quality filter -> index -> search is rank-identical over the filtered corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    // 1. exact dedup: canonical docs only (sf0.1 has 8 duplicate texts)
    val canon = Dedup.exact(docs).filter(!col("is_dup")).select("doc_id")
    val nCanon = canon.count()
    assert(nCanon < docs.count(), "dedup must drop the duplicate texts")

    // 2. quality gate at 0.5 (keeps ~3/4 of the corpus — measured
    // distribution min 0.34 / median 0.605 / max 0.86)
    val good = TextAnalysis.qualityScore(docs)
      .filter(col("quality") >= 0.5).select("doc_id")
    val filtered = docs.join(canon, Seq("doc_id")).join(good, Seq("doc_id"))
    val nKept = filtered.count()
    assert(nKept > 1000 && nKept < nCanon,
      s"quality gate must bite but keep a corpus (kept $nKept of $nCanon)")

    // 3. index the survivors through the standard pages shape
    val pages = filtered.select(
      col("doc_id").cast("string").as("url"),
      timestamp_seconds(col("doc_id")).as("warc_ts"),
      lit(null).cast("binary").as("html"),
      col("text"), col("lang"))
    val dir = Files.createTempDirectory("lucy-e2e").toString + "/idx"
    IndexBuilder.build(pages, dir, IndexConfig(lang = None))
    val index = LucyIndex(dir)

    // 4. rank identity vs the naive oracle over the SAME filtered corpus
    val cleaned = Ingest.cleanPages(pages, lang = None)
    val (docmap, termTf) = (Ingest.docmap(cleaned), Ingest.termTf(cleaned))
    val stats = Stats.corpusStats(docmap)
    for ((q, m, k) <- Seq(("spark join", QueryMode.And, 15),
      ("window filter batch", QueryMode.Or, 15),
      ("order fast", QueryMode.Phrase, 10),
      ("s", QueryMode.Prefix, 15))) {
      val fast = Searcher.search(spark, index, q, m, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val naive = (if (m == QueryMode.Prefix)
        NaiveSearch.prefixSearch(termTf, docmap, stats, q, k)
      else if (m == QueryMode.Phrase)
        NaiveSearch.phraseSearch(Ingest.tokPos(cleaned), termTf, docmap, stats, q, k)
      else NaiveSearch.search(termTf, docmap, stats, q, m, k))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      assert(fast.length === naive.length, s"[$q/$m] row count")
      fast.zip(naive).foreach { case ((fd, fs, fn), (nd, ns, nn)) =>
        assert(fd === nd && fn === nn, s"[$q/$m] docId/nTerms")
        assert(java.lang.Double.doubleToLongBits(fs) === java.lang.Double.doubleToLongBits(ns),
          s"[$q/$m] score bits")
      }
      assert(m == QueryMode.Phrase || fast.nonEmpty, s"[$q/$m] must match something")
    }
  }
}
