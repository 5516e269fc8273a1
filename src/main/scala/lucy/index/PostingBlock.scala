package lucy.index

import lucy.LucySpec

/** One compressed postings block (LucySpec §8.3, SURVEY.md §1.2).
  *
  * Blocks of up to LucySpec.blockSize (128) docs per (term, salt), docIds
  * strictly ascending. The sorted sequence of block rows per term IS the
  * skip list: (firstDocId, lastDocId) per row lets block-max WAND jump
  * whole blocks without decoding (SURVEY.md §4.3; Moffat & Zobel
  * self-skipping [LIT], Ding & Suel block-max [LIT]).
  *
  * Encodings (all unsigned LEB128):
  *  - docsVarint: count−1 gaps (docId_i − docId_{i−1}, each ≥ 1);
  *    docId₀ = firstDocId from the row itself — no cross-block state.
  *  - tfsVarint:  count entries, tf−1 in doc order.
  *  - dlsVarint:  count entries, docLen in doc order (WAND computes
  *    exact BM25 inside the kernel, so norms travel with the block —
  *    a driver-side docLen lookup per candidate would not distribute).
  *  - posVarint:  per doc in doc order, its tf term positions
  *    (0-based indices into the POST-stopword token sequence, §8.2):
  *    first position absolute, then gaps (≥ 1). Decoding needs the tfs,
  *    so positions decode AFTER (and only when phrase mode asks —
  *    a separate parquet column, pruned away by non-phrase scans of the
  *    segments table when a projection drops it; the query paths carry
  *    it so one block cache serves both modes).
  *
  * Block-max bound: (maxTf, minDocLen) rather than a baked maxImpact —
  * impact is monotone ↑ in tf and ↓ in docLen, so
  * impact(maxTf, minDocLen, avgdl) bounds every doc in the block under
  * the CURRENT avgdl. A stored impact computed at build-time avgdl
  * would become an unsafe bound after incremental deltas shift avgdl.
  *
  * termHash = murmur3(term, seed 42) (Spark's `hash()`), the range-
  * partitioning and file-pruning key (BASELINE.json:14).
  */
case class PostingBlock(
    termHash: Int,
    term: String,
    salt: Int,
    blockNo: Int,
    firstDocId: Long,
    lastDocId: Long,
    count: Int,
    maxTf: Int,
    minDocLen: Int,
    docsVarint: Array[Byte],
    tfsVarint: Array[Byte],
    dlsVarint: Array[Byte],
    posVarint: Array[Byte])

/** A decoded block: parallel arrays. */
final case class DecodedBlock(docIds: Array[Long], tfs: Array[Int], docLens: Array[Int])

/** One persisted segment row = PostingBlock + the partition that wrote
  * it (lineage). Matches the segments/ parquet schema exactly.
  */
case class SegmentRow(termHash: Int, term: String, salt: Int, blockNo: Int,
                      firstDocId: Long, lastDocId: Long, count: Int,
                      maxTf: Int, minDocLen: Int,
                      docsVarint: Array[Byte], tfsVarint: Array[Byte],
                      dlsVarint: Array[Byte], posVarint: Array[Byte], partId: Int) {
  def toBlock: PostingBlock = PostingBlock(termHash, term, salt, blockNo,
    firstDocId, lastDocId, count, maxTf, minDocLen, docsVarint, tfsVarint, dlsVarint,
    posVarint)
}

object PostingBlock {

  /** Encode one document's term positions (ascending, tf of them):
    * absolute first position, then gaps — self-contained per doc, so a
    * block's posVarint is the plain concatenation of per-doc encodings.
    * Producers (the ingest UDF, compaction re-encode) call this ONCE per
    * posting; the shuffles and the packer only ever move/concat bytes.
    */
  def encodePositions(ps: Array[Int]): Array[Byte] = {
    val deltas = new Array[Long](ps.length)
    var j = 0
    while (j < ps.length) {
      require(j == 0 || ps(j) > ps(j - 1), "positions not strictly ascending")
      deltas(j) = if (j == 0) ps(0).toLong else (ps(j) - ps(j - 1)).toLong
      j += 1
    }
    Varint.encodeAll(deltas)
  }

  /** Pack one (term, salt)'s postings — already sorted by docId — into
    * block rows. Streaming: consumes the iterator, O(blockSize) memory,
    * so a head term with 10^9 postings never materializes (the reason
    * this is NOT collect_list, SURVEY.md §2.4 A5). Each posting carries
    * its PRE-ENCODED position stream (encodePositions; tf entries).
    */
  def pack(termHash: Int, term: String, salt: Int,
           postings: Iterator[(Long, Int, Int, Array[Byte])]): Iterator[PostingBlock] = {
    val docIds = new Array[Long](LucySpec.blockSize)
    val tfs = new Array[Int](LucySpec.blockSize)
    val dls = new Array[Int](LucySpec.blockSize)
    val poss = new Array[Array[Byte]](LucySpec.blockSize)
    var blockNo = 0

    new Iterator[PostingBlock] {
      def hasNext: Boolean = postings.hasNext
      def next(): PostingBlock = {
        var n = 0
        var maxTf = 0
        var minDl = Int.MaxValue
        var posBytes = 0
        while (n < LucySpec.blockSize && postings.hasNext) {
          val (d, tf, dl, ps) = postings.next()
          require(n == 0 || d > docIds(n - 1),
            s"postings for ($term,$salt) not strictly ascending at $d")
          docIds(n) = d; tfs(n) = tf; dls(n) = dl; poss(n) = ps
          posBytes += ps.length
          if (tf > maxTf) maxTf = tf
          if (dl < minDl) minDl = dl
          n += 1
        }
        val gaps = new Array[Long](n - 1)
        var i = 1
        while (i < n) { gaps(i - 1) = docIds(i) - docIds(i - 1); i += 1 }
        val tfsM1 = new Array[Long](n)
        val dlsL = new Array[Long](n)
        i = 0
        while (i < n) { tfsM1(i) = (tfs(i) - 1).toLong; dlsL(i) = dls(i).toLong; i += 1 }
        val pv = new Array[Byte](posBytes)
        var w = 0
        i = 0
        while (i < n) {
          System.arraycopy(poss(i), 0, pv, w, poss(i).length)
          w += poss(i).length
          i += 1
        }
        val b = PostingBlock(termHash, term, salt, blockNo,
          docIds(0), docIds(n - 1), n, maxTf, minDl,
          Varint.encodeAll(gaps), Varint.encodeAll(tfsM1), Varint.encodeAll(dlsL), pv)
        blockNo += 1
        b
      }
    }
  }

  def decode(b: PostingBlock): DecodedBlock = {
    val docIds = new Array[Long](b.count)
    docIds(0) = b.firstDocId
    val gaps = Varint.decodeAll(b.docsVarint, b.count - 1)
    var i = 1
    while (i < b.count) { docIds(i) = docIds(i - 1) + gaps(i - 1); i += 1 }
    val tfs = Varint.decodeAll(b.tfsVarint, b.count).map(v => (v + 1).toInt)
    val dls = Varint.decodeAll(b.dlsVarint, b.count).map(_.toInt)
    DecodedBlock(docIds, tfs, dls)
  }

  /** Slice a block's posVarint into per-doc substreams WITHOUT decoding
    * (VERDICT r2 what's-wrong #2 — the compaction hot loop). Doc i's
    * stream is tfs(i) LEB128 values and a value ends at the first byte
    * with the high bit clear, so the split is one pass over the bytes:
    * no Long decoding, no Int arrays, no re-encode. Byte-identical to
    * encodePositions(decodePositions(b, tfs)(i)) because the per-doc
    * encoding (absolute first + gaps) is doc-local and the encoder
    * emits canonical minimal LEB128 (VarintSpec pins both).
    */
  def slicePositions(b: PostingBlock, tfs: Array[Int]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](tfs.length)
    val pv = b.posVarint
    var off = 0
    var i = 0
    while (i < tfs.length) {
      val start = off
      var remaining = tfs(i)
      while (remaining > 0) {
        while ((pv(off) & 0x80) != 0) off += 1
        off += 1 // the terminating (high-bit-clear) byte
        remaining -= 1
      }
      out(i) = java.util.Arrays.copyOfRange(pv, start, off)
      i += 1
    }
    out
  }

  /** Positions per doc of an already-decoded block (tfs give the per-doc
    * stream lengths). Only phrase evaluation pays this decode.
    */
  def decodePositions(b: PostingBlock, tfs: Array[Int]): Array[Array[Int]] = {
    val total = { var s = 0; var i = 0; while (i < tfs.length) { s += tfs(i); i += 1 }; s }
    val deltas = Varint.decodeAll(b.posVarint, total)
    val out = new Array[Array[Int]](tfs.length)
    var w = 0
    var i = 0
    while (i < tfs.length) {
      val ps = new Array[Int](tfs(i))
      var j = 0
      var acc = 0
      while (j < tfs(i)) {
        acc = if (j == 0) deltas(w).toInt else acc + deltas(w).toInt
        ps(j) = acc
        w += 1; j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }
}
