package lucy.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import lucy.LucySpec

/** One (term, doc) posting with everything the block packer needs.
  * posBytes: the doc's varint-encoded position stream
  * (PostingBlock.encodePositions — tf ascending 0-based indices into
  * the post-stopword token sequence, §8.3/§8.7).
  */
case class TermPostingRow(termHash: Int, term: String, salt: Int,
                          docId: Long, tf: Long, docLen: Int,
                          posBytes: Array[Byte])

/** Posting-list construction (SURVEY.md §3.1 stages 5–9).
  *
  * termTfDl(docId, docLen, term, tf)
  *   → salt head terms (broadcast join against the tiny df>threshold set)
  *   → range-partition by (termHash, term, salt)   [THE big shuffle; AQE coalesces]
  *   → sortWithinPartitions(termHash, term, salt, docId)
  *   → streaming block packer in mapPartitions (O(blockSize) memory per
  *     run — a 10^9-posting head term never materializes; this is why
  *     it is not collect_list, SURVEY.md §2.4 A5)
  *
  * Salting (SURVEY.md §4.3): AQE splits *join* skew but not groupBy/sort
  * skew, so a head term with df ≫ others would serialize one reducer.
  * salt = pmod(murmur3(docId), S(df)) splits its postings into S
  * interleaved, individually-sorted streams; the query kernel unions
  * salt streams of a term (disjoint docId sets), so no merge stage is
  * needed for correctness — compaction may later k-way merge them.
  */
object Postings {

  /** Head terms needing salting: term → number of salt streams. */
  def headTerms(termStats: DataFrame, saltDfThreshold: Long, maxSalts: Int): DataFrame =
    termStats
      .filter(col("df") > saltDfThreshold)
      .select(col("term"),
        least(lit(maxSalts), greatest(lit(1), (col("df") / saltDfThreshold).cast("int")))
          .as("salts"))

  /** termTfDl + head-term salting + termHash. */
  def salted(termTfDl: DataFrame, headTermsDf: DataFrame): DataFrame =
    termTfDl
      .join(broadcast(headTermsDf), Seq("term"), "left")
      .withColumn("salt",
        when(col("salts").isNull, lit(0))
          .otherwise(pmod(hash(col("docId")), col("salts"))))
      .withColumn("termHash", hash(col("term")))
      .select(col("termHash"), col("term"), col("salt"), col("docId"),
        col("tf"), col("docLen"), col("posBytes"))

  /** Range exchange + in-partition sort + streaming pack. */
  def packBlocks(saltedDf: DataFrame, numPartitions: Int): Dataset[PostingBlock] = {
    val spark = saltedDf.sparkSession
    import spark.implicits._
    saltedDf
      .repartitionByRange(numPartitions, col("termHash"), col("term"), col("salt"))
      .sortWithinPartitions(col("termHash"), col("term"), col("salt"), col("docId"))
      .as[TermPostingRow]
      .mapPartitions { rows =>
        RunIterator(rows)(r => (r.termHash, r.term, r.salt)).flatMap {
          case ((h, t, s), run) =>
            PostingBlock.pack(h, t, s,
              run.map(r => (r.docId, r.tf.toInt, r.docLen, r.posBytes)))
        }
      }
  }
}

/** Streams consecutive runs sharing a key as (key, run-iterator) pairs
  * without materializing a run. Contract: each run iterator MUST be
  * exhausted before calling hasNext/next on the outer iterator (the
  * block packer does — it drains every run).
  */
object RunIterator {
  def apply[T, K](it: Iterator[T])(keyOf: T => K): Iterator[(K, Iterator[T])] = {
    val buf = it.buffered
    new Iterator[(K, Iterator[T])] {
      def hasNext: Boolean = buf.hasNext
      def next(): (K, Iterator[T]) = {
        val k = keyOf(buf.head)
        val run = new Iterator[T] {
          def hasNext: Boolean = buf.hasNext && keyOf(buf.head) == k
          def next(): T = buf.next()
        }
        (k, run)
      }
    }
  }
}
