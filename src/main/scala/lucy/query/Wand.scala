package lucy.query

import scala.collection.mutable
import lucy.LucySpec
import lucy.index.{DecodedBlock, PostingBlock}

/** Query-side plan: tiny, broadcast to executors (SURVEY.md §3.2).
  * terms are distinct + ascending — the normative summation order.
  */
case class QueryPlan(terms: Array[String], dfs: Array[Long], n: Long,
                     avgdl: Double, conjunctive: Boolean, k: Int) {
  def termIndex(t: String): Int = java.util.Arrays.binarySearch(terms.asInstanceOf[Array[AnyRef]], t)
}

case class ScoredDoc(docId: Long, score: Double, nTerms: Int)

/** A cursor over one (term, salt) stream's blocks within a bucket,
  * sorted by firstDocId. Lazily decodes; advances block-at-a-time using
  * (firstDocId, lastDocId) skip metadata without decoding skipped blocks
  * (SURVEY.md §4.4).
  */
private[query] final class Cursor(val termIdx: Int, blocks: Array[PostingBlock],
                                  endExclusive: Long, avgdl: Double) {
  private var bi = 0
  private var decoded: DecodedBlock = null
  private var pos = 0
  var docId: Long = -1L
  var exhausted: Boolean = false

  /** Upper bound of the remaining stream's impact (suffix max over
    * remaining blocks of impact(maxTf, minDocLen) — monotone bounds,
    * safe under any current avgdl; see PostingBlock doc).
    */
  private val suffixImpactUb: Array[Double] = {
    val a = new Array[Double](blocks.length + 1)
    var i = blocks.length - 1
    while (i >= 0) {
      val b = blocks(i)
      val ub = LucySpec.impactUpperBound(b.maxTf, b.minDocLen, avgdl)
      a(i) = math.max(ub, a(i + 1))
      i -= 1
    }
    a
  }

  def remainingImpactUb: Double = if (exhausted) 0.0 else suffixImpactUb(bi)

  def tf: Int = decoded.tfs(pos)
  def docLen: Int = decoded.docLens(pos)

  /** Position at the first docId ≥ target (and < endExclusive). */
  def advanceTo(target: Long): Unit = {
    if (exhausted) return
    if (decoded != null && docId >= target) return
    // skip whole blocks by metadata
    while (bi < blocks.length && blocks(bi).lastDocId < target) {
      bi += 1; decoded = null; pos = 0
    }
    if (bi >= blocks.length) { exhausted = true; docId = Long.MaxValue; return }
    if (decoded == null) { decoded = PostingBlock.decode(blocks(bi)); pos = 0 }
    while (pos < decoded.docIds.length && decoded.docIds(pos) < target) pos += 1
    if (pos >= decoded.docIds.length) {
      bi += 1; decoded = null; pos = 0
      advanceTo(target) // next block (first docId may still be < target across gaps)
      return
    }
    docId = decoded.docIds(pos)
    if (docId >= endExclusive) { exhausted = true; docId = Long.MaxValue }
  }

  def next(): Unit = advanceTo(docId + 1)
}

/** Block-max WAND kernel (SURVEY.md §4.4; Broder et al. CIKM'01, Ding &
  * Suel SIGIR'11 [LIT]) — runs per docId bucket inside mapPartitions.
  * State is O(#cursors + k); no spill possible.
  *
  * Exactness contract (WandEquivalenceSpec): identical top-k — docIds,
  * bit-equal scores, same (score DESC, docId ASC) order — as
  * NaiveSearch over any corpus. Scores are computed addend-by-addend in
  * ascending term order via LucySpec.bm25Addend, exactly the naive
  * engine's fold.
  */
object Wand {

  /** Heap entry ordering: the WORST result first (min-heap on score,
    * tie: larger docId is worse) so the root is the eviction candidate.
    */
  private val worstFirst: Ordering[ScoredDoc] = (a: ScoredDoc, b: ScoredDoc) => {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
  }

  /** Run the kernel over one bucket's blocks.
    *
    * @param blocksByCursor blocks grouped per (term,salt), each group
    *                       sorted by firstDocId, with the term's index
    *                       into plan.terms
    * @param lo,width       bucket docId range: docs with docId/width==bucket
    */
  def topK(plan: QueryPlan, blocksByCursor: Iterable[(Int, Array[PostingBlock])],
           bucket: Long, width: Long): Iterator[ScoredDoc] = {
    val endExclusive =
      if (bucket >= Long.MaxValue / width) Long.MaxValue
      else (bucket + 1) * width
    val lo = bucket * width

    val cursors = blocksByCursor.iterator.map { case (ti, bs) =>
      val c = new Cursor(ti, bs, endExclusive, plan.avgdl)
      c.advanceTo(lo)
      c
    }.filterNot(_.exhausted).toArray

    val nQ = plan.terms.length
    if (cursors.isEmpty) return Iterator.empty
    if (plan.conjunctive) {
      // every term must have ≥1 live cursor, else no doc can qualify
      val present = cursors.map(_.termIdx).toSet
      if (present.size < nQ) return Iterator.empty
    }

    val idfs = plan.dfs.map(df => LucySpec.idf(df, plan.n))
    val weights = idfs.map(_ * (LucySpec.k1 + 1.0)) // per-term score multiplier

    val heap = new mutable.PriorityQueue[ScoredDoc]()(worstFirst.reverse) // min-root
    def theta: Double = if (heap.size >= plan.k) heap.head.score else Double.NegativeInfinity

    // score doc d: addends in ascending term order (cursors per term are
    // disjoint docId sets, so at most one cursor per term matches d)
    val byTerm: Array[Array[Cursor]] = {
      val m = Array.fill(nQ)(mutable.ArrayBuffer.empty[Cursor])
      cursors.foreach(c => m(c.termIdx) += c)
      m.map(_.toArray)
    }

    def scoreDoc(d: Long): Unit = {
      var score = 0.0
      var matched = 0
      var t = 0
      while (t < nQ) {
        val cs = byTerm(t)
        var i = 0
        while (i < cs.length) {
          val c = cs(i)
          if (!c.exhausted && c.docId == d) {
            score += LucySpec.bm25Addend(c.tf, c.docLen, plan.dfs(t), plan.n, plan.avgdl)
            matched += 1
            i = cs.length
          } else i += 1
        }
        t += 1
      }
      if (plan.conjunctive && matched < nQ) return
      val cand = ScoredDoc(d, score, matched)
      if (heap.size < plan.k) heap.enqueue(cand)
      else if (worstFirst.compare(cand, heap.head) > 0) { // cand better than worst
        heap.dequeue(); heap.enqueue(cand)
      }
    }

    if (plan.conjunctive) {
      // leapfrog intersection with block-skip advances. The candidate is
      // max over TERMS of (min over the term's salt cursors) — NOT max
      // over all cursors, which would jump past docs served by a term's
      // other salt stream.
      var target = lo
      var done = false
      while (!done) {
        // advance every cursor group to ≥ target; a term is "at" target
        // if one of its cursors is
        var t = 0
        var aligned = true
        var nextTarget = target
        while (t < nQ && !done) {
          val cs = byTerm(t)
          var best = Long.MaxValue
          var i = 0
          while (i < cs.length) {
            val c = cs(i)
            if (!c.exhausted) { c.advanceTo(target); if (c.docId < best) best = c.docId }
            i += 1
          }
          if (best == Long.MaxValue) done = true // term exhausted → no more AND matches
          else {
            if (best != target) aligned = false
            if (best > nextTarget) nextTarget = best
          }
          t += 1
        }
        if (!done) {
          if (aligned) { scoreDoc(target); nextTarget = target + 1 }
          target = nextTarget
        }
      }
    } else {
      // disjunctive WAND: pivot on cumulative remaining upper bounds
      val live = mutable.ArrayBuffer(cursors: _*)
      var continue = true
      while (continue && live.nonEmpty) {
        val sorted = live.sortBy(_.docId)
        var acc = 0.0
        var pivot = -1
        var i = 0
        while (i < sorted.length && pivot == -1) {
          acc += weights(sorted(i).termIdx) * sorted(i).remainingImpactUb
          if (acc >= theta) pivot = i
          i += 1
        }
        if (pivot == -1) continue = false // nothing can reach θ
        else {
          val pivotDoc = sorted(pivot).docId
          if (sorted(0).docId == pivotDoc) {
            scoreDoc(pivotDoc)
            // advance EVERY cursor sitting at pivotDoc (also those beyond
            // the pivot index) or the doc would be scored twice
            var j = 0
            while (j < sorted.length && sorted(j).docId <= pivotDoc) {
              sorted(j).advanceTo(pivotDoc + 1); j += 1
            }
          } else {
            // advance the leading cursors up to the pivot document
            var j = 0
            while (j < pivot) { sorted(j).advanceTo(pivotDoc); j += 1 }
          }
          live.filterInPlace(!_.exhausted)
        }
      }
    }

    heap.dequeueAll.reverseIterator // best-first (cosmetic; global sort follows)
  }
}
