package lucy.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import lucy.{Hashing, LucySpec}
import lucy.index.{PostingBlock, RunIterator, SearchableIndex, Stats}

/** A segment block row as shuffled to docId buckets (PostingBlock +
  * routing bucket). */
private[query] case class BucketedBlock(
    bucket: Long, srcPart: Int, termHash: Int, term: String, salt: Int, blockNo: Int,
    firstDocId: Long, lastDocId: Long, count: Int, maxTf: Int, minDocLen: Int,
    docsVarint: Array[Byte], tfsVarint: Array[Byte], dlsVarint: Array[Byte]) {
  def toBlock: PostingBlock = PostingBlock(termHash, term, salt, blockNo,
    firstDocId, lastDocId, count, maxTf, minDocLen, docsVarint, tfsVarint, dlsVarint)
}

/** Top-k BM25 over the segment index — entry point 2 (SURVEY.md §3.2).
  *
  * Plan shape and why it scales:
  *
  *  1. PRUNED SCAN — `termHash isin(...)` is a literal predicate on a
  *     column the segments are range-partitioned AND sorted by, so
  *     parquet row-group min/max stats skip everything but the query
  *     terms' blocks. IO is proportional to the query terms' postings,
  *     not the corpus.
  *  2. BUCKET EXCHANGE — the index is term-partitioned, but scoring
  *     (AND intersection, per-doc Σ) needs all query terms co-located
  *     per docId. Blocks are routed to fixed arithmetic docId buckets
  *     (docId/width; docIds are xxhash64 → uniform, so buckets are
  *     balanced by construction — no sampling, no skew). Only the
  *     pruned blocks shuffle: for a 4-term query on 10^12 docs this is
  *     a few GB against a PB-scale index. A block rarely straddles a
  *     bucket boundary (128 consecutive docIds in a 2^63 space); if it
  *     does, it is replicated to each overlapped bucket and the kernel
  *     evaluates only docs with docId/width == bucket — each doc scored
  *     exactly once.
  *  3. PER-BUCKET WAND — block-max pruning kernel, O(cursors + k)
  *     memory, emits ≤k local hits.
  *  4. GLOBAL TOP-K — orderBy(score DESC, docId ASC).limit(k) plans as
  *     TakeOrderedAndProjectExec (per-partition heap + driver merge).
  *
  * Query-term stats (df per term, N, avgdl) are driver-looked-up (one
  * tiny pruned job over stats/terms) and broadcast inside QueryPlan.
  */
object Searcher {

  def search(spark: SparkSession, index: SearchableIndex, query: String,
             mode: QueryMode.Value = QueryMode.And,
             k: Int = LucySpec.defaultK): DataFrame =
    searchWith(spark, index.segments(spark), query, mode, k, index.corpusStats(spark),
      terms => Stats.lookupTerms(index.termStats(spark), terms))

  /** Search with externally supplied plan inputs. QueryEngine passes a
    * REUSED segments DataFrame and cached stats: re-creating the scan per
    * query repeats driver-side file listing + footer reads and was the
    * concurrency bottleneck in serving benchmarks — a warm server plans
    * against one shared relation.
    */
  def searchWith(spark: SparkSession, segments: DataFrame, query: String,
                 mode: QueryMode.Value, k: Int, stats: lucy.index.CorpusStats,
                 lookup: Seq[String] => Map[String, lucy.index.TermStats]): DataFrame = {
    import spark.implicits._
    val terms = LucySpec.queryTerms(query)
    val empty = Seq.empty[ScoredDoc].toDS().toDF("docId", "score", "nTerms")
    if (terms.isEmpty) return empty

    val dfMap = lookup(terms.toSeq)
    // terms absent from the corpus: AND can never match; OR drops them
    val present = terms.filter(dfMap.contains)
    if (mode == QueryMode.And && present.length < terms.length) return empty
    if (present.isEmpty) return empty

    // Tiny immutable plan: captured in the task closure — at <1 KB the
    // closure IS the broadcast (an explicit torrent broadcast per query
    // costs more than it saves; "broadcasting query-term stats" at this
    // size means shipping them with the task).
    val plan = QueryPlan(present, present.map(dfMap(_).df), stats.n, stats.avgdl,
      conjunctive = mode == QueryMode.And, k = k)

    val hashes = present.map(t => Hashing.termHash(t).asInstanceOf[Any])
    val pruned = segments
      .filter(col("termHash").isin(hashes.toSeq: _*) &&
        col("term").isin(present.map(_.asInstanceOf[Any]).toSeq: _*))

    val local =
      if (present.length == 1) {
        // Single-term fast path: no per-doc co-location needed (every
        // posting scores independently), so skip the bucket exchange and
        // run the kernel directly on the scan partitions. A stream split
        // across scan partitions is fine — each sub-stream is sorted and
        // scored independently.
        singleTermLocal(spark, pruned, plan)
      } else {
        // Bucket count sized to the work: candidates ≤ Σ df(query terms);
        // aim for ~64k postings per kernel invocation, capped by the
        // session's shuffle partitions. A fixed large D would pay tens of
        // idle tasks per query; a fixed small D would bottleneck head
        // queries at scale.
        val sumDf = present.map(dfMap(_).df).sum
        val maxB = spark.sessionState.conf.numShufflePartitions
        val numBuckets = math.max(1L, math.min(maxB.toLong, sumDf / 65536 + 1)).toInt
        bucketedLocal(spark, pruned, plan, numBuckets)
      }

    local.toDF("docId", "score", "nTerms")
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  private def singleTermLocal(spark: SparkSession, pruned: DataFrame, plan: QueryPlan) = {
    import spark.implicits._
    pruned
      .withColumn("bucket", lit(0L))
      .select(col("bucket"), col("srcPart"), col("termHash"), col("term"), col("salt"),
        col("blockNo"), col("firstDocId"), col("lastDocId"), col("count"), col("maxTf"),
        col("minDocLen"), col("docsVarint"), col("tfsVarint"), col("dlsVarint"))
      .as[BucketedBlock]
      .mapPartitions { rows =>
        val sorted = rows.toArray.sortBy(r => (r.term, r.salt, r.srcPart, r.firstDocId))
        val cursors = mutable.ArrayBuffer.empty[(Int, Array[PostingBlock])]
        RunIterator(sorted.iterator)(r => (r.term, r.salt, r.srcPart)).foreach {
          case ((t, _, _), g) =>
            val ti = plan.termIndex(t)
            if (ti >= 0) cursors += ((ti, g.map(_.toBlock).toArray))
        }
        Wand.topK(plan, cursors, 0L, Long.MaxValue)
      }
  }

  private def bucketedLocal(spark: SparkSession, pruned: DataFrame, plan: QueryPlan,
                            numBuckets: Int) = {
    import spark.implicits._
    val width = Long.MaxValue / numBuckets + 1
    pruned
      .withColumn("bucket",
        explode(sequence(expr(s"firstDocId div ${width}L"), expr(s"lastDocId div ${width}L"))))
      .select(col("bucket"), col("srcPart"), col("termHash"), col("term"), col("salt"),
        col("blockNo"), col("firstDocId"), col("lastDocId"), col("count"), col("maxTf"),
        col("minDocLen"), col("docsVarint"), col("tfsVarint"), col("dlsVarint"))
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("term"), col("salt"), col("srcPart"),
        col("firstDocId"))
      .as[BucketedBlock]
      .mapPartitions { rows =>
        RunIterator(rows)(_.bucket).flatMap { case (bucket, run) =>
          // buffer this bucket's pruned blocks, one cursor per (term, salt,
          // srcPart); rows arrive sorted by (term, salt, srcPart, firstDocId).
          // srcPart matters: different sub-indexes of a composite overlap in
          // docId space and must not be concatenated into one stream.
          val groups = mutable.ArrayBuffer.empty[(Int, Array[PostingBlock])]
          RunIterator(run)(r => (r.term, r.salt, r.srcPart)).foreach { case ((t, _, _), g) =>
            val ti = plan.termIndex(t)
            if (ti >= 0) groups += ((ti, g.map(_.toBlock).toArray))
          }
          Wand.topK(plan, groups, bucket, width)
        }
      }
  }

  /** J4 — attach urls for display (tiny isin-filtered broadcast join). */
  def searchWithUrls(spark: SparkSession, index: SearchableIndex, query: String,
                     mode: QueryMode.Value = QueryMode.And,
                     k: Int = LucySpec.defaultK): DataFrame =
    NaiveSearch.withUrls(search(spark, index, query, mode, k), index.docmap(spark))
}
