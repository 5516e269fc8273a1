package lucy.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One decoded media record (the typed batch row the decode stage
  * emits). At production scale `payload` is an image/audio/video blob;
  * here the decoder is a deterministic stub (no media libs in this
  * container) while ALL Spark-side plumbing — binary column, schema,
  * batch-shaped partition processing, feature vector layout — is real.
  */
case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                         mean_byte: Double, histogram: Array[Long])

/** Multimodal columns: media as opaque BinaryType + typed metadata.
  *
  * Decode / feature-extract runs as batch-shaped partition processing
  * (`mapPartitions` over a typed Dataset — the JVM analog of
  * `mapInPandas`: one tight loop per partition, no per-row UDF
  * dispatch). The decode itself is STUBBED deterministically —
  * `fakeDecode` stands in for an image decoder — and clearly marked;
  * swap it for a real codec and nothing else changes.
  */
object Multimodal {

  /** STUB decoder: deterministic fake "image header" parse. A real
    * implementation would hand `bytes` to an image library and return
    * actual dimensions; the fake derives them from the byte length so
    * the oracle can state the same function.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (16 + n % 64, 16 + (n / 64) % 64)
  }

  /** Attach a binary payload column derived from text (the sandbox has
    * no real media; production reads `html: binary` or blob columns
    * directly).
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Batch feature extraction over the binary column: dims (stub
    * decode), mean byte value, 16-bin byte histogram.
    */
  def extractFeatures(docs: DataFrame, idCol: String = "doc_id",
                      payloadCol: String = "payload"): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val (w, h) = fakeDecode(b)
          val hist = new Array[Long](16)
          var sum = 0L
          var i = 0
          while (i < b.length) {
            val v = b(i) & 0xFF
            sum += v
            hist(v >> 4) += 1
            i += 1
          }
          MediaFeatures(id, b.length, w, h,
            if (b.length > 0) sum.toDouble / b.length else 0.0, hist)
        }
      }
  }
}
