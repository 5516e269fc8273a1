package lucy

import java.nio.charset.StandardCharsets

/** Driver-side twins of Spark's hash expressions.
  *
  * termHash must be computable both as a Column (`hash(col("term"))`,
  * codegen'd, written into segments) and on the driver (query planning
  * computes the termHash pruning set without a Spark job). Spark's
  * `hash()` on a string is Murmur3_x86_32 over UTF-8 bytes, seed 42,
  * processed 4 bytes at a time little-endian with the remaining tail
  * bytes each mixed as an int (this is Spark's hashUnsafeBytes layout,
  * NOT the canonical murmur3 tail handling — hence this dedicated twin;
  * HashingSpec asserts equality against the Column function).
  */
object Hashing {

  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  def termHash(term: String): Int =
    murmur3SparkBytes(term.getBytes(StandardCharsets.UTF_8), LucySpec.seed.toInt)

  /** Mirror of org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes. */
  def murmur3SparkBytes(bytes: Array[Byte], seed: Int): Int = {
    val len = bytes.length
    val lenAligned = len - len % 4
    var h1 = seed
    var i = 0
    while (i < lenAligned) {
      val halfWord = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8) |
        ((bytes(i + 2) & 0xFF) << 16) | ((bytes(i + 3) & 0xFF) << 24)
      h1 = mixH1(h1, mixK1(halfWord))
      i += 4
    }
    while (i < len) {
      h1 = mixH1(h1, mixK1(bytes(i))) // signed byte widened, matches Platform.getByte
      i += 1
    }
    fmix(h1, len)
  }

  @inline private def mixK1(k1In: Int): Int = {
    var k1 = k1In * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  @inline private def mixH1(h1In: Int, k1: Int): Int = {
    var h1 = h1In ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  @inline private def fmix(h1In: Int, length: Int): Int = {
    var h1 = h1In ^ length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
