package lucy.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-relational operators (SURVEY §2.5 J6 / §2.9 ST5, implemented
  * r4): backward as-of join and gap-based sessionization — the two
  * time-join shapes a training-data pipeline actually needs (attach the
  * latest reference row to every event; group event streams into
  * sessions).
  *
  * Scale shapes:
  *  - asofJoin: union + one keyed window, i.e. ONE shuffle on the join
  *    key and a per-key sort — never a range/theta join, whose candidate
  *    set is quadratic in rows-per-key. This is the standard
  *    cluster-scale as-of (the union-tag trick): at 10^12 events the
  *    cost is the same exchange an aggregation by key would pay.
  *  - sessionize: Spark's native `session_window` aggregation (works in
  *    batch and Structured Streaming with a watermark) — one shuffle on
  *    the key, state merged by the session-window operator itself.
  */
object Relational {

  /** Backward as-of join: each left row gets the LATEST right row with
    * `right.ts <= left.ts` for the same key (ASOF JOIN semantics, the
    * DuckDB/kdb default). Right must be unique per (key, ts) — enforce
    * upstream (e.g. max_by aggregation) — or the attached value at a
    * tied timestamp is unspecified.
    *
    * Returns the LEFT rows (original columns) plus `ref_ts` and the
    * right value columns prefixed `ref_` — only rows with a match
    * (inner as-of); callers wanting left semantics can start from
    * left.join(result, ..., "left").
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val valCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(
      (col(key) +: col(ts).as("__rts") +:
        valCols.map(c => col(c).as(s"ref_$c"))): _*)
      .withColumn(ts, col("__rts"))
      .withColumn("__tag", lit(0))
    // union with right rows sorted BEFORE left rows at equal ts (tag 0
    // first) so the >= boundary includes same-instant reference rows
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refCols = "__rts" +: valCols.map(c => s"ref_$c")
    val filled = refCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__tag") === 1 && col("__rts").isNotNull)
      .withColumnRenamed("__rts", "ref_ts")
      .drop("__tag")
  }

  /** Bounded interval join: pairs (left, right) with the same key and
    * `right.ts ∈ [left.ts − window, left.ts]`. The scale shape is a
    * time-BUCKETIZED equi-join — both sides keyed by (key, bucket)
    * where bucket = floor(epoch / window), the left side exploded to
    * its bucket and the previous one (an interval of length `window`
    * spans at most two buckets), then the exact range filter. Fan-out
    * is 2× the left side plus per-bucket density — never the quadratic
    * candidate set of a raw theta join, and Catalyst runs it as a hash
    * join on (key, bucket). Output: left rows (original columns) plus
    * `ref_ts` and a `ref` struct of the right row's value columns —
    * one output row per matching (left, right) pair.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                   windowSeconds: Long = 3600L): DataFrame = {
    require(windowSeconds > 0, "interval window must be positive")
    val us = windowSeconds * 1000000L
    // NTZ-tolerant epoch micros: differences are timezone-invariant, so
    // the LTZ cast is safe for bucket/range arithmetic on either type
    def micros(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val l = left.withColumn("__b0", floor(micros(col(ts)) / us))
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"))))
      .drop("__b0")
    val r = right.select(col(key), col(ts).as("ref_ts"),
      struct(right.columns.filterNot(c => c == key || c == ts).map(col): _*).as("ref"))
      .withColumn("__bucket", floor(micros(col("ref_ts")) / us))
    l.join(r, Seq(key, "__bucket"))
      .filter(col("ref_ts") <= col(ts) &&
        micros(col("ref_ts")) >= micros(col(ts)) - us)
      .drop("__bucket")
  }

  /** Gap-based sessionization via the built-in `session_window`: events
    * of one key belong to the same session while consecutive gaps stay
    * UNDER `gap`; the window end extends `gap` past the last event
    * (Spark session-window semantics). Emits one row per session with
    * start/end and the given aggregates applied to `valueCol`.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 key: String = "user_id", ts: String = "ts",
                 valueCol: String = "value"): DataFrame =
    events
      .groupBy(session_window(col(ts), gap), col(key))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(key), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
}
