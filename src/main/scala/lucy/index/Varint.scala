package lucy.index

/** Unsigned LEB128 varint codec over Long (LucySpec §8.3; classic
  * postings compression — Manning/Raghavan/Schütze IIR ch.5 [LIT]).
  * Little-endian 7-bit groups, high bit = continuation. Pure Scala on
  * byte arrays; deliberately NOT an SQL expression — only the block
  * packer/unpacker (typed mapPartitions) touches these bytes
  * (SURVEY.md §2.3 F5).
  */
object Varint {

  /** Max encoded size of one Long. */
  val maxBytes = 10

  def sizeOf(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7FL) != 0) { x >>>= 7; n += 1 }
    n
  }

  /** Append v at buf(pos); returns new pos. Caller sizes buf. */
  def write(buf: Array[Byte], pos: Int, v: Long): Int = {
    var x = v; var p = pos
    while ((x & ~0x7FL) != 0) {
      buf(p) = ((x & 0x7F) | 0x80).toByte; p += 1; x >>>= 7
    }
    buf(p) = x.toByte
    p + 1
  }

  /** Decode one varint at pos; returns (value, nextPos) packed —
    * value in the returned VarintCursor-style contract below is avoided
    * for hot loops; use Reader.
    */
  final class Reader(val buf: Array[Byte]) {
    var pos: Int = 0
    def hasNext: Boolean = pos < buf.length
    def read(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = buf(pos) & 0xFF
        result |= (b & 0x7FL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      result
    }
  }

  /** Encode a list of non-negative longs. */
  def encodeAll(values: Array[Long]): Array[Byte] = {
    var size = 0
    var i = 0
    while (i < values.length) { size += sizeOf(values(i)); i += 1 }
    val buf = new Array[Byte](size)
    var p = 0
    i = 0
    while (i < values.length) { p = write(buf, p, values(i)); i += 1 }
    buf
  }

  def decodeAll(buf: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    val r = new Reader(buf)
    var i = 0
    while (i < count) { out(i) = r.read(); i += 1 }
    out
  }
}
