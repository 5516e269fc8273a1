package lucy.stream

import java.nio.file.Files
import lucy.SparkFunSuite
import lucy.fixtures.PagesGen
import lucy.index.CompositeIndex

/** VERDICT r6 next-round #6: the fastCorpusStats/aggCorpusStats
  * boundary. The fast path bails to the aggregation when the small
  * side exceeds CompositeIndex.smallSideLimit; both sides of the
  * threshold must produce IDENTICAL CorpusStats. The limit is lowered
  * via the documented test hook so the crossing is exercised without a
  * 2²⁰-doc fixture.
  */
class CorpusStatsBoundarySpec extends SparkFunSuite {

  test("fast path and aggregation fallback produce identical stats across the limit") {
    import spark.implicits._
    val root = Files.createTempDirectory("stats-boundary").toString + "/store"
    IncrementalIndexer.bootstrap(PagesGen.pages(spark, 400), root)
    // two deltas: 120 fresh docs + 60 RECRAWLS of base urls (so the
    // overlap/winner correction path is exercised, not just appends)
    IncrementalIndexer.indexBatch(
      spark.range(400L, 520L).as[Long].map(PagesGen.page _).toDF(), root, 0L)
    IncrementalIndexer.indexBatch(PagesGen.recrawl(spark, 60, 100000), root, 1L)

    val view = IncrementalIndexer.composite(spark, root)
    val orig = CompositeIndex.smallSideLimit
    try {
      CompositeIndex.smallSideLimit = 1L << 20 // fast path (small side 180 ≤ limit)
      val fast = view.corpusStats(spark)
      CompositeIndex.smallSideLimit = 10L // small side 180 > 10 → fallback
      val agg = view.corpusStats(spark)
      assert(fast.n === agg.n, "doc count differs across the boundary")
      assert(java.lang.Double.doubleToLongBits(fast.avgdl) ===
        java.lang.Double.doubleToLongBits(agg.avgdl),
        s"avgdl differs across the boundary: ${fast.avgdl} vs ${agg.avgdl}")
    } finally CompositeIndex.smallSideLimit = orig
  }
}
