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

  test("every query executes and is non-degenerate") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empties = counts.filter(_._2 == 0).keySet
    // queries allowed to be legitimately empty on this corpus: none
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
