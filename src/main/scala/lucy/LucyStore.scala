package lucy

import org.apache.spark.sql.{DataFrame, SparkSession}
import lucy.index.{BuildManifest, IndexConfig, SearchableIndex}
import lucy.query.{QueryEngine, QueryMode}
import lucy.stream.IncrementalIndexer

/** The lucy.js user-facing surface, whole: a mutable document store with
  * a live full-text index. lucy.js hooks IndexedDB `put/add/delete` and
  * answers `search()` against the in-memory inverted index; this is the
  * cluster-scale equivalent over the delta/tombstone/compaction machinery
  * (SURVEY.md §3.3, §8.7):
  *
  *   - `put(pages)`   — add or update documents (url-keyed; latest
  *     warc_ts wins at compaction) → one delta index, exactly-once by
  *     the caller-supplied batch id.
  *   - `delete(urls)` — tombstone documents; masked immediately, purged
  *     at the next `compact()`.
  *   - `search(q)`    — top-k BM25 (And/Or/Phrase/Prefix) over the live
  *     view. EXACT (bit-equal to a from-scratch index of the current
  *     contents) for pure adds and deletes; for a url UPDATED between
  *     compactions the index is additive (CompositeIndex docs: the doc
  *     is scored once, against its latest version's tf, but stale
  *     postings of terms dropped by the update may still match until
  *     the merge) — `compact()` restores exactness (ADVICE r2;
  *     LucyStoreSpec probes both regimes).
  *   - `compact()`    — fold deltas + deletes into a new base generation.
  *
  * A serving QueryEngine (block cache + stats cache) is rebuilt whenever
  * the underlying view changes — mutation invalidates, reads are warm in
  * between. Single-writer semantics (one driver mutates a store), same
  * as lucy.js's single JS thread.
  */
final class LucyStore(spark: SparkSession, rootDir: String,
                      config: IndexConfig = IndexConfig()) {

  @volatile private var engineCache: Option[QueryEngine] = None

  private def invalidate(): Unit = synchronized { engineCache = None }

  private def engine: QueryEngine = synchronized {
    engineCache.getOrElse {
      val e = new QueryEngine(spark, view, config.stemming)
      engineCache = Some(e)
      e
    }
  }

  /** The current searchable view (base + deltas, tombstone-masked). */
  def view: SearchableIndex = IncrementalIndexer.composite(spark, rootDir)

  /** Bootstrap the store from an initial corpus (no-op analog: an empty
    * store works too — the first put creates the first delta).
    */
  def bootstrap(pages: DataFrame): BuildManifest = {
    val m = IncrementalIndexer.bootstrap(pages, rootDir, config)
    invalidate(); m
  }

  /** Add/update documents. batchId is the exactly-once key: re-putting
    * the same id is a no-op (a replaying upstream is safe).
    */
  def put(pages: DataFrame, batchId: Long): Unit = {
    IncrementalIndexer.indexBatch(pages, rootDir, batchId, config)
    invalidate()
  }

  /** Delete documents by url (tombstoned until the next compact). */
  def delete(urls: Seq[String]): Unit = {
    IncrementalIndexer.deleteUrls(spark, rootDir, urls)
    invalidate()
  }

  /** Fold deltas and deletes into a new base generation. */
  def compact(): BuildManifest = {
    val m = IncrementalIndexer.compact(spark, rootDir, config)
    invalidate(); m
  }

  def search(query: String, mode: QueryMode.Value = QueryMode.And,
             k: Int = LucySpec.defaultK): DataFrame =
    engine.search(query, mode, k)

  /** Search with urls attached (J4 join-back). */
  def searchWithUrls(query: String, mode: QueryMode.Value = QueryMode.And,
                     k: Int = LucySpec.defaultK): DataFrame =
    lucy.query.NaiveSearch.withUrls(search(query, mode, k), view.docmap(spark))
}
