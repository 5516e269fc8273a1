package lucy.e2e

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import lucy.SparkFunSuite
import lucy.fixtures.PagesGen
import lucy.index._
import lucy.query._

/** Rank-identity against the frozen goldens (BASELINE.json:14 "matching
  * the reference's top-k docIDs and BM25 scores (rank-identical) on the
  * reference query set"; SURVEY.md §5.2): both the naive engine and the
  * WAND fast path must reproduce the committed golden docIds and raw
  * Double score bits for all 20 reference queries, in order.
  */
case class GoldenHit(docId: Long, scoreBits: Long, nTerms: Long)
case class Golden(id: String, query: String, mode: String, k: Long, hits: Array[GoldenHit])

class RankIdentitySpec extends SparkFunSuite {

  private lazy val goldens: Map[String, Golden] = {
    import spark.implicits._
    spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[Golden]].schema)
      .json("src/test/resources/golden_queries.json")
      .as[Golden].collect().map(g => g.id -> g).toMap
  }

  private lazy val env = {
    val pages = PagesGen.pages(spark, lucy.tools.GenGoldens.corpusSize)
    val dir = Files.createTempDirectory("lucy-rank").toString + "/idx"
    IndexBuilder.build(pages, dir, IndexConfig(saltDfThreshold = 200, maxSalts = 8))
    val cleaned = Ingest.cleanPages(pages)
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val tokPos = Ingest.tokPos(cleaned)
    (LucyIndex(dir), termTf, tokPos, docmap, Stats.corpusStats(docmap))
  }

  test("goldens cover all reference queries") {
    assert(goldens.keySet === QuerySet.reference.map(_.id).toSet)
  }

  test("naive engine is rank-identical to goldens") {
    val (_, termTf, tokPos, docmap, stats) = env
    QuerySet.reference.foreach { q =>
      val got = NaiveSearch.forQuery(termTf, tokPos, docmap, stats, q.query, q.mode, q.k)
        .collect().map(r => GoldenHit(r.getLong(0),
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getInt(2)))
      assert(got.toSeq === goldens(q.id).hits.toSeq, s"naive ${q.id}")
    }
  }

  test("WAND fast path is rank-identical to goldens") {
    val (index, _, _, _, _) = env
    QuerySet.reference.foreach { q =>
      val got = Searcher.search(spark, index, q.query, q.mode, q.k)
        .collect().map(r => GoldenHit(r.getLong(0),
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getInt(2)))
      assert(got.toSeq === goldens(q.id).hits.toSeq, s"wand ${q.id}")
    }
  }
}
