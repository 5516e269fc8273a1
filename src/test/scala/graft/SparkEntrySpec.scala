package graft

import lucy.SparkFunSuite

/** Harness contract smoke: every query runs against sf0.001, every
  * oracleSql key has a queries twin, the flagship returns rows. The
  * value-level oracle comparison is the driver's job (and
  * tools/mimic_driver.py locally).
  */
class SparkEntrySpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries twin: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dedup_ngram_capped: the hot-shingle cap actually engages (VERDICT r2 #1)") {
    import org.apache.spark.sql.functions._
    val hot = lucy.pipeline.Dedup.shingles(Harness.documents(spark, sf), 3)
      .groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
      .filter(col("sdf") > 5).count()
    assert(hot > 0, "maxShingleDf=5 must exceed at least one shingle's df at this scale")
  }

  test("every query executes and is non-degenerate") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empties = counts.filter(_._2 == 0).keySet
    // queries allowed to be legitimately empty on this corpus: none
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
