package lucy.query

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k heap aggregator (SURVEY.md §2.4 A6).
  *
  * The default top-k path is `orderBy.limit` → TakeOrderedAndProjectExec
  * (already per-partition heap + driver merge), so this Aggregator is
  * the *composable* form: usable inside a groupBy (`top-k per
  * language`), in structured streaming aggregations, or wherever a
  * Column is needed rather than a plan-level sort. Buffer is a plain
  * Seq kept bounded at k (sorted worst-last; inserts prune eagerly), so
  * the encoder path serializes O(k) state per partition — matches the
  * SURVEY decision record (§2.10): no TypedImperativeAggregate needed.
  *
  * Ordering matches the engine's total order: score DESC, docId ASC.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredDoc, Seq[ScoredDoc], Seq[ScoredDoc]] {

  private def better(a: ScoredDoc, b: ScoredDoc): Boolean =
    a.score > b.score || (a.score == b.score && a.docId < b.docId)

  override def zero: Seq[ScoredDoc] = Vector.empty

  override def reduce(buf: Seq[ScoredDoc], d: ScoredDoc): Seq[ScoredDoc] = insert(buf, d)

  override def merge(a: Seq[ScoredDoc], b: Seq[ScoredDoc]): Seq[ScoredDoc] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[ScoredDoc], d: ScoredDoc): Seq[ScoredDoc] = {
    if (buf.size >= k && !better(d, buf.last)) return buf
    val (hi, lo) = buf.span(better(_, d))
    ((hi :+ d) ++ lo).take(k)
  }

  override def finish(r: Seq[ScoredDoc]): Seq[ScoredDoc] = r

  override def bufferEncoder: Encoder[Seq[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredDoc]]()
  override def outputEncoder: Encoder[Seq[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredDoc]]()
}

object TopKAggregator {
  def topK(k: Int): TypedColumn[ScoredDoc, Seq[ScoredDoc]] =
    new TopKAggregator(k).toColumn
}
