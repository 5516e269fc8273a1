package lucy.e2e

import java.nio.file.Files
import org.apache.spark.sql.functions._
import lucy.SparkFunSuite
import lucy.fixtures.PagesGen
import lucy.index._
import lucy.query.{NaiveSearch, QueryMode, Searcher}

/** Parallelism invariance (SURVEY.md §5.2, §7.3 item 1; the sandbox
  * substitute for the N vs 4N executor rank-identity requirement,
  * BASELINE.json:14): the same corpus indexed under different partition
  * counts must yield identical logical segment content and bit-identical
  * query results.
  */
class DeterminismSpec extends SparkFunSuite {

  private lazy val tmp = Files.createTempDirectory("lucy-det").toString

  private def decoded(index: LucyIndex) = {
    import spark.implicits._
    index.segments(spark).as[SegmentRow].flatMap { r =>
      val d = PostingBlock.decode(r.toBlock)
      d.docIds.indices.map(i => (r.term, r.salt, d.docIds(i), d.tfs(i), d.docLens(i)))
    }.toDF("term", "salt", "docId", "tf", "docLen")
  }

  test("identical logical index + bit-identical results at 2 vs 13 partitions") {
    val pages = PagesGen.pages(spark, 500)
    val cfg = IndexConfig(saltDfThreshold = 60, maxSalts = 8)
    val dirA = s"$tmp/p2"
    val dirB = s"$tmp/p13"
    IndexBuilder.build(pages, dirA, cfg.copy(numPartitions = 2))
    IndexBuilder.build(pages, dirB, cfg.copy(numPartitions = 13))
    val (a, b) = (LucyIndex(dirA), LucyIndex(dirB))

    // logical postings content identical (blocks/partitioning may differ)
    assert(decoded(a).exceptAll(decoded(b)).count() === 0)
    assert(decoded(b).exceptAll(decoded(a)).count() === 0)

    // manifests agree on corpus facts
    val (ma, mb) = (a.manifest(spark).get, b.manifest(spark).get)
    assert(ma.docs === mb.docs)
    assert(java.lang.Double.doubleToLongBits(ma.avgdl) ===
      java.lang.Double.doubleToLongBits(mb.avgdl))
    assert(ma.postings === mb.postings)

    // bit-identical query results under different shuffle.partitions too
    // (r2: phrase adjacency and prefix expansion must be invariant too)
    val queries = Seq(("spark shuffle", QueryMode.And), ("index posting term", QueryMode.Or),
      ("merge sort", QueryMode.And), ("spark shuffle", QueryMode.Phrase),
      ("wa", QueryMode.Prefix))
    for ((q, m) <- queries) {
      val before = spark.sessionState.conf.numShufflePartitions
      val resA =
        try { spark.conf.set("spark.sql.shuffle.partitions", 3)
          Searcher.search(spark, a, q, m, 20).collect() }
        finally spark.conf.set("spark.sql.shuffle.partitions", before)
      val resB =
        try { spark.conf.set("spark.sql.shuffle.partitions", 17)
          Searcher.search(spark, b, q, m, 20).collect() }
        finally spark.conf.set("spark.sql.shuffle.partitions", before)
      assert(resA.length === resB.length, s"$q row count")
      resA.zip(resB).foreach { case (ra, rb) =>
        assert(ra.getLong(0) === rb.getLong(0), s"$q docId")
        assert(java.lang.Double.doubleToLongBits(ra.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(rb.getDouble(1)), s"$q score bits")
      }
    }
  }
}
