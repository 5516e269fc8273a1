package lucy

import org.apache.spark.sql.functions._

/** Driver-side murmur3 must equal Spark's hash() column (seed 42). */
class HashingSpec extends SparkFunSuite {

  test("pure-Scala murmur3 == Spark hash() on strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "ab", "abc", "abcd", "abcde", "spark",
      "partition", "ünïcode中") ++
      (0 until 200).map { _ =>
        val len = rnd.nextInt(40)
        new String(Array.fill(len)((32 + rnd.nextInt(95)).toChar))
      }
    val expected = samples.toDF("s").select(hash(col("s"))).collect().map(_.getInt(0))
    samples.zip(expected).foreach { case (s, e) =>
      assert(Hashing.termHash(s) === e, s"mismatch for '$s'")
    }
  }
}
