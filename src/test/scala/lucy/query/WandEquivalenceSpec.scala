package lucy.query

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import lucy.SparkFunSuite
import lucy.fixtures.PagesGen
import lucy.index._

/** THE most important test in the repo (SURVEY.md §4.4): the WAND fast
  * path must equal the exhaustive naive engine exactly — same top-k
  * docIds, bit-equal Double scores, same (score DESC, docId ASC) order —
  * over generated corpora, both modes, salted and unsalted indexes.
  */
class WandEquivalenceSpec extends SparkFunSuite {

  private lazy val tmp = Files.createTempDirectory("lucy-eq").toString

  private def buildBoth(n: Long, cfg: IndexConfig, tag: String) = {
    val pages = PagesGen.pages(spark, n)
    val dir = s"$tmp/$tag"
    IndexBuilder.build(pages, dir, cfg)
    val index = LucyIndex(dir)
    val cleaned = Ingest.cleanPages(pages)
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val stats = Stats.corpusStats(docmap)
    (index, termTf, docmap, stats)
  }

  private def assertSame(fast: DataFrame, naive: DataFrame, ctx: String): Unit = {
    val f = fast.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val nv = naive.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(f.length === nv.length, s"$ctx: row count")
    f.zip(nv).zipWithIndex.foreach { case (((fd, fs, fn), (nd, ns, nn)), i) =>
      assert(fd === nd, s"$ctx rank $i docId")
      assert(java.lang.Double.doubleToLongBits(fs) === java.lang.Double.doubleToLongBits(ns),
        s"$ctx rank $i score bits: fast=$fs naive=$ns")
      assert(fn === nn, s"$ctx rank $i nTerms")
    }
  }

  private val queries = Seq(
    ("spark", QueryMode.And, 10),
    ("spark shuffle", QueryMode.And, 10),
    ("spark shuffle", QueryMode.Or, 10),
    ("spark shuffle partition index", QueryMode.And, 10),
    ("spark shuffle partition index", QueryMode.Or, 25),
    ("wand heap", QueryMode.And, 5),
    ("varint", QueryMode.Or, 100),
    ("snippet anchor entity", QueryMode.Or, 10),   // tail terms
    ("the spark and shuffle", QueryMode.And, 10),  // stopword-laden
    ("Spark, SHUFFLE!", QueryMode.Or, 10),         // punctuation/case
    ("spark spark shuffle", QueryMode.And, 10),    // duplicate terms
    ("zzznotfound", QueryMode.Or, 10),             // absent term
    ("spark zzznotfound", QueryMode.And, 10),      // absent term AND
    ("spark zzznotfound", QueryMode.Or, 10),
    ("the and of", QueryMode.And, 10),             // stopword-only
    ("merge", QueryMode.And, 1),                   // k=1
    ("sort join scan", QueryMode.Or, 200)          // k > matches
  )

  test("WAND == naive on a 600-doc corpus (unsalted)") {
    val (index, termTf, docmap, stats) = buildBoth(600, IndexConfig(), "unsalted")
    queries.foreach { case (q, m, k) =>
      assertSame(
        Searcher.search(spark, index, q, m, k),
        NaiveSearch.search(termTf, docmap, stats, q, m, k),
        s"[$q/$m/k=$k]")
    }
  }

  test("WAND == naive with aggressive salting (threshold 50, maxSalts 8)") {
    val (index, termTf, docmap, stats) =
      buildBoth(600, IndexConfig(saltDfThreshold = 50, maxSalts = 8), "salted")
    // head terms have df ≫ 50 → multiple salt streams per term
    val salts = index.segments(spark).select("salt").distinct().count()
    assert(salts > 1, "salting must actually engage")
    queries.foreach { case (q, m, k) =>
      assertSame(
        Searcher.search(spark, index, q, m, k),
        NaiveSearch.search(termTf, docmap, stats, q, m, k),
        s"salted[$q/$m/k=$k]")
    }
  }

  test("exact ties break by docId: duplicate documents") {
    import spark.implicits._
    // 40 identical docs + 10 others → guaranteed equal scores
    val pages = (0 until 50).map { i =>
      val text = if (i < 40) "alpha beta gamma" else "alpha delta epsilon zeta"
      (s"u$i", new java.sql.Timestamp(i * 1000L), null.asInstanceOf[Array[Byte]], text, "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")
    val dir = s"$tmp/ties"
    IndexBuilder.build(pages, dir)
    val index = LucyIndex(dir)
    val cleaned = Ingest.cleanPages(pages)
    val (docmap, termTf) = (Ingest.docmap(cleaned), Ingest.termTf(cleaned))
    val stats = Stats.corpusStats(docmap)
    for ((m, k) <- Seq((QueryMode.And, 7), (QueryMode.Or, 13), (QueryMode.Or, 45))) {
      assertSame(
        Searcher.search(spark, index, "alpha beta", m, k),
        NaiveSearch.search(termTf, docmap, stats, "alpha beta", m, k),
        s"ties[$m/k=$k]")
    }
  }
}
