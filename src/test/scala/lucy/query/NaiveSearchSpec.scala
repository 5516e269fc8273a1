package lucy.query

import lucy.{LucySpec, SparkFunSuite}
import lucy.fixtures.PagesGen
import lucy.index.{Ingest, Stats}

/** M1 end-to-end: pages → ingest → naive BM25 top-k, with hand-computed
  * score checks on a micro corpus (SURVEY.md §5.2 "unit: scorer").
  */
class NaiveSearchSpec extends SparkFunSuite {

  import org.apache.spark.sql.Row

  private def microCorpus() = {
    import spark.implicits._
    // 3 docs, known tokens (no stopwords):
    //   d0: "spark shuffle spark"   (docLen 3)
    //   d1: "shuffle partition"     (docLen 2)
    //   d2: "spark"                 (docLen 1)
    Seq(
      ("u0", "spark shuffle spark"),
      ("u1", "shuffle partition"),
      ("u2", "spark")
    ).map { case (u, t) =>
      (u, new java.sql.Timestamp(0L), null.asInstanceOf[Array[Byte]], t, "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  test("hand-computed BM25 on a 3-doc corpus") {
    val cleaned = Ingest.cleanPages(microCorpus())
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val stats = Stats.corpusStats(docmap)
    assert(stats.n === 3)
    assert(math.abs(stats.avgdl - 2.0) < 1e-12)

    val res = NaiveSearch.search(termTf, docmap, stats, "spark", QueryMode.And, 10)
      .collect()
    // expected via the normative scalar formula (bit-equal to the Column
    // path by the pinned association in Bm25.addendCol)
    def addend(tf: Long, dl: Long): Double = LucySpec.bm25Addend(tf, dl, 2, 3, 2.0)
    val d0 = LucySpec.docIdForUrl("u0")
    val d2 = LucySpec.docIdForUrl("u2")
    val expected = Map(d0 -> addend(2, 3), d2 -> addend(1, 1))
    // sanity vs an independent hand expansion (tolerance only)
    assert(math.abs(addend(1, 1) - math.log(1.6) * 2.2 / 1.75) < 1e-12)
    assert(res.length === 2)
    res.foreach { case Row(docId: Long, score: Double, n: Int) =>
      assert(n === 1)
      assert(score === expected(docId), s"docId $docId")
    }
    // d2 (tf=1, dl=1): 1/(1+1.2*(0.25+0.375)) = 1/1.75
    // d0 (tf=2, dl=3): 2/(2+1.2*(0.25+1.125)) = 2/3.65
    // 1/1.75 > 2/3.65 → d2 ranks first
    assert(res.head.getLong(0) === d2)
  }

  test("AND vs OR semantics") {
    val cleaned = Ingest.cleanPages(microCorpus())
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val stats = Stats.corpusStats(docmap)
    val and = NaiveSearch.search(termTf, docmap, stats, "spark shuffle", QueryMode.And).collect()
    val or = NaiveSearch.search(termTf, docmap, stats, "spark shuffle", QueryMode.Or).collect()
    assert(and.map(_.getLong(0)).toSet === Set(LucySpec.docIdForUrl("u0")))
    assert(or.length === 3)
    // duplicate query terms count once (§8.6)
    val dup = NaiveSearch.search(termTf, docmap, stats, "spark spark shuffle", QueryMode.And).collect()
    assert(dup.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      and.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("stopword-only query is empty; unknown term empty in AND") {
    val cleaned = Ingest.cleanPages(microCorpus())
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val stats = Stats.corpusStats(docmap)
    assert(NaiveSearch.search(termTf, docmap, stats, "the and of").count() === 0)
    assert(NaiveSearch.search(termTf, docmap, stats, "spark zzzmissing", QueryMode.And).count() === 0)
    assert(NaiveSearch.search(termTf, docmap, stats, "spark zzzmissing", QueryMode.Or).count() === 2)
  }

  test("e2e over the generated corpus: dedup, lang filter, ranking sane") {
    val pages = PagesGen.pages(spark, 500)
    val cleaned = Ingest.cleanPages(pages)
    val docmap = Ingest.docmap(cleaned)
    // lang filter: only en docs stay (9/10 of 500 = 450)
    assert(docmap.count() === 450)
    val termTf = Ingest.termTf(cleaned)
    val stats = Stats.corpusStats(docmap)
    val res = NaiveSearch.search(termTf, docmap, stats, "spark shuffle", QueryMode.Or, 10).collect()
    assert(res.length === 10)
    val scores = res.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "descending scores")
    // stopwords never indexed
    assert(termTf.filter(org.apache.spark.sql.functions.col("term") === "the").count() === 0)
  }

  test("url dedup keeps latest warc_ts") {
    import org.apache.spark.sql.functions._
    val pages = PagesGen.pages(spark, 100)
    val re = PagesGen.recrawl(spark, 50, 1000000L)
    val cleaned = Ingest.cleanPages(pages.unionByName(re))
    assert(Ingest.docmap(cleaned).count() === 90) // 90 en docs, recrawls merged
    // recrawled docs contain the marker token
    val termTf = Ingest.termTf(cleaned)
    val recrawledEnDocs = (0 until 50).filter(_ % 10 != 9).size
    assert(termTf.filter(col("term") === "recrawl").count() === recrawledEnDocs)
  }
}
