package lucy.index

import org.scalatest.funsuite.AnyFunSuite

/** Codec properties (SURVEY.md §5.2 "unit: codecs") — seeded randomized
  * roundtrips plus boundary cases.
  */
class VarintSpec extends AnyFunSuite {

  test("roundtrip boundary values") {
    val vals = Array(0L, 1L, 127L, 128L, 129L, 16383L, 16384L,
      Int.MaxValue.toLong, Long.MaxValue - 1, Long.MaxValue)
    assert(Varint.decodeAll(Varint.encodeAll(vals), vals.length).sameElements(vals))
    assert(Varint.sizeOf(0L) === 1)
    assert(Varint.sizeOf(127L) === 1)
    assert(Varint.sizeOf(128L) === 2)
    assert(Varint.sizeOf(Long.MaxValue) === 9)
  }

  test("roundtrip seeded random longs") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(300)
      val vals = Array.fill(n)(rnd.nextLong() & Long.MaxValue)
      assert(Varint.decodeAll(Varint.encodeAll(vals), n).sameElements(vals))
    }
  }

  test("gap encoding is compact for dense docIds") {
    val dense = (1000L until 2000L).toArray // gaps of 1
    val gaps = dense.sliding(2).map(a => a(1) - a(0)).toArray
    assert(Varint.encodeAll(gaps).length === 999) // 1 byte per gap
  }

  test("block pack/decode roundtrip across block boundaries") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 127, 128, 129, 256, 1000)) {
      var docId = 0L
      val postings = (0 until n).map { _ =>
        docId += 1 + rnd.nextInt(1 << 20)
        val tf = 1 + rnd.nextInt(50)
        // tf strictly-ascending random positions
        val ps = {
          var p = -1
          Array.fill(tf) { p += 1 + rnd.nextInt(20); p }
        }
        (docId, tf, 1 + rnd.nextInt(500), ps, PostingBlock.encodePositions(ps))
      }
      val blocks = PostingBlock.pack(13, "t", 0,
        postings.iterator.map(p => (p._1, p._2, p._3, p._5))).toVector
      assert(blocks.length === (n + 127) / 128)
      assert(blocks.map(_.count).sum === n)
      assert(blocks.head.firstDocId === postings.head._1)
      assert(blocks.last.lastDocId === postings.last._1)
      val decoded = blocks.flatMap { b =>
        val d = PostingBlock.decode(b)
        assert(d.docIds.head === b.firstDocId)
        assert(d.docIds.last === b.lastDocId)
        assert(d.tfs.max <= b.maxTf)
        assert(d.docLens.min >= b.minDocLen)
        val ps = PostingBlock.decodePositions(b, d.tfs)
        d.docIds.indices.map(i => (d.docIds(i), d.tfs(i), d.docLens(i), ps(i).toSeq))
      }
      assert(decoded === postings.toVector.map(p => (p._1, p._2, p._3, p._4.toSeq)))
      // blockNo sequential
      assert(blocks.map(_.blockNo) === blocks.indices.toVector)
    }
  }

  test("slicePositions cuts per-doc substreams byte-identical to re-encode (VERDICT r2)") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 2, 128, 129, 300)) {
      var docId = 0L
      val postings = (0 until n).map { _ =>
        docId += 1 + rnd.nextInt(1 << 16)
        val tf = 1 + rnd.nextInt(40)
        val ps = {
          var p = -1
          // large gaps force multi-byte varints so the slicer must walk
          // continuation bits, not just count bytes
          Array.fill(tf) { p += 1 + rnd.nextInt(1 << 14); p }
        }
        (docId, tf, 1 + rnd.nextInt(500), PostingBlock.encodePositions(ps))
      }
      PostingBlock.pack(13, "t", 0, postings.iterator).foreach { b =>
        val d = PostingBlock.decode(b)
        val sliced = PostingBlock.slicePositions(b, d.tfs)
        val reencoded = PostingBlock.decodePositions(b, d.tfs).map(PostingBlock.encodePositions)
        assert(sliced.length === reencoded.length)
        sliced.indices.foreach(i => assert(sliced(i).sameElements(reencoded(i)),
          s"doc $i of block ${b.blockNo}"))
        // the slices concatenate back to the whole stream
        assert(sliced.flatten.sameElements(b.posVarint))
      }
    }
  }

  test("pack rejects non-ascending docIds") {
    val p0 = PostingBlock.encodePositions(Array(0))
    intercept[IllegalArgumentException] {
      PostingBlock.pack(0, "t", 0,
        Iterator((5L, 1, 1, p0), (5L, 1, 1, p0))).toVector
    }
  }

  test("encodePositions rejects non-ascending positions") {
    intercept[IllegalArgumentException] {
      PostingBlock.encodePositions(Array(3, 3))
    }
  }
}
