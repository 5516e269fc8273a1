package lucy.query

import lucy.SparkFunSuite

/** A6 — the composable typed top-k heap must agree with orderBy.limit
  * and work inside groupByKey (per-group top-k, the case the plan-level
  * sort cannot express).
  */
class TopKAggregatorSpec extends SparkFunSuite {

  test("global top-k equals orderBy.limit semantics (ties by docId)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (0 until 500).map(i => ScoredDoc(i.toLong, (rnd.nextInt(50) / 10.0), rnd.nextInt(3)))
    val ds = spark.createDataset(docs).repartition(7)
    val viaAgg = ds.select(TopKAggregator.topK(10)).head()
    val expected = docs.sortBy(d => (-d.score, d.docId)).take(10)
    assert(viaAgg.toList === expected.toList)
  }

  test("per-group top-k inside groupByKey") {
    import spark.implicits._
    val docs = (0 until 100).map(i => ScoredDoc(i.toLong, (i % 10).toDouble, i % 4))
    val byGroup = spark.createDataset(docs)
      .groupByKey(_.nTerms)
      .agg(TopKAggregator.topK(3))
      .collect().toMap
    byGroup.foreach { case (g, top) =>
      val expected = docs.filter(_.nTerms == g).sortBy(d => (-d.score, d.docId)).take(3)
      assert(top.toList === expected.toList, s"group $g")
    }
  }
}
