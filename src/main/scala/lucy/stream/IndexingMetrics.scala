package lucy.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest metrics (SURVEY.md §2.9 ST2/ST3): tumbling-window
  * docs/lang counts over the page stream, tolerating late recrawls via
  * an event-time watermark. Append-mode compatible (emits a window only
  * once the watermark passes it), so the sink can be a plain parquet
  * metrics table.
  */
object IndexingMetrics {

  /** pages stream → windowed arrival counts.
    *
    * @param lateness how long to keep windows open for late warc_ts
    *                 rows; rows later than this land in the next
    *                 compaction instead (the index itself is additive —
    *                 SURVEY.md ST2 — so metrics lateness is a display
    *                 concern, not a correctness one)
    */
  def docsPerWindow(pagesStream: DataFrame, window: String = "1 minute",
                    lateness: String = "1 hour"): DataFrame =
    pagesStream
      .withWatermark("warc_ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window), col("lang"))
      .agg(count(lit(1)).as("docs"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("lang"), col("docs"))
}
