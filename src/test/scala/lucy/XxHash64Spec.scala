package lucy

import org.apache.spark.sql.functions._

/** The driver-side pure-Scala XXH64 must agree with Spark's xxhash64
  * column function (seed 42 over UTF-8 bytes) — docId assignment
  * (LucySpec §8.5) depends on this equality.
  */
class XxHash64Spec extends SparkFunSuite {

  private def sparkHash(strings: Seq[String]): Seq[Long] = {
    import spark.implicits._
    strings.toDF("s").select(xxhash64(col("s"))).collect().map(_.getLong(0)).toSeq
  }

  test("pure-Scala XXH64 == Spark xxhash64 on representative urls") {
    val samples = Seq("", "a", "abc", "https://example.org/p/0",
      "https://example.org/p/123456789",
      "x" * 31, "x" * 32, "x" * 33, "x" * 100,
      "héllo wörld ünïcode ✓ 中文")
    val expected = sparkHash(samples)
    samples.zip(expected).foreach { case (s, e) =>
      assert(XxHash64.hashUtf8(s, 42L) === e, s"mismatch for '$s'")
    }
  }

  test("pure-Scala XXH64 == Spark xxhash64 (seeded random strings)") {
    val rnd = new scala.util.Random(42)
    val strings = (0 until 300).map { _ =>
      val len = rnd.nextInt(120)
      new String(Array.fill(len)((32 + rnd.nextInt(95)).toChar))
    }
    val expected = sparkHash(strings)
    strings.zip(expected).foreach { case (s, e) =>
      assert(XxHash64.hashUtf8(s, 42L) === e, s"mismatch for '$s'")
    }
  }

  test("docId is positive, deterministic, collision-free at test scale") {
    val ids = (0 until 1000).map(i => LucySpec.docIdForUrl(s"https://example.org/p/$i"))
    assert(ids.forall(_ >= 0))
    assert(ids.distinct.size === 1000)
    assert(ids === (0 until 1000).map(i => LucySpec.docIdForUrl(s"https://example.org/p/$i")))
  }
}
