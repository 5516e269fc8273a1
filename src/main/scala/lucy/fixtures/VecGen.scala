package lucy.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import lucy.LucySpec

/** Deterministic synthetic embedding corpus for ANN benchmarking at
  * scales the driver tables don't reach (the sf0.1 embeddings table is
  * 2 000 vectors; the ANN scale paths need ≥10⁶ to show their shape —
  * VERDICT r3 next-round #6).
  *
  * Vectors are drawn around `numClusters` deterministic cluster centers
  * with additive noise, so IVF/LSH bucketing has real structure to
  * exploit (uniform vectors would make every cosine ≈ 0 and any
  * bucketing vacuous). Pure function of (vec_id, dim): same corpus at
  * any parallelism, generation is a narrow map over spark.range — no
  * shuffle, no driver memory.
  */
object VecGen {

  private val ClusterSeed = 0xC1A57E12L
  private val NoiseSeed = 0x4015E5EEL

  /** component d of cluster c's center, in [-1, 1) */
  private def center(c: Long, d: Int): Double =
    LucySpec.unitDouble(LucySpec.rnd(ClusterSeed ^ c, d)) * 2.0 - 1.0

  def vectors(spark: SparkSession, n: Long, dim: Int = 64,
              numClusters: Int = 256, noise: Double = 0.4,
              parts: Int = 64): DataFrame = {
    val vecUdf = udf((id: Long) => {
      val c = id % numClusters
      Array.tabulate(dim) { d =>
        (center(c, d) +
          noise * (LucySpec.unitDouble(LucySpec.rnd(NoiseSeed ^ id, d)) * 2.0 - 1.0)).toFloat
      }
    })
    spark.range(0L, n, 1L, parts)
      .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
  }

  private val PairBaseSeed = 0x9A17EDBAL
  private val PairNoiseSeed = 0x9A1B5EEDL

  /** Planted near-dup PAIR corpus for the dedup-pairs probe soak
    * (VERDICT r5 next-round #3): vec_id 2m is a fresh pseudo-random
    * base vector; 2m+1 is that base plus componentwise noise of
    * amplitude `delta` — cosine ≈ 1/√(1+δ²/ (1/3·3)) ≈ 0.989 at the
    * default δ = 0.15, comfortably above a 0.95 threshold. Bases are
    * mutually independent, so in 64 dims every non-planted cosine
    * concentrates near 0 and the TRUE ≥-threshold pair set is exactly
    * the planted pairs whose exact cosine clears the threshold — a
    * LINEAR-cost ground truth (one n/2-row join) standing in for the
    * O(n²) exact path at soak scale. Pure function of (vec_id, dim).
    */
  def pairedVectors(spark: SparkSession, nPairs: Long, dim: Int = 64,
                    delta: Double = 0.15, parts: Int = 64): DataFrame = {
    val vecUdf = udf((id: Long) => {
      val base = id >> 1
      val perturbed = (id & 1L) == 1L
      Array.tabulate(dim) { d =>
        val b = LucySpec.unitDouble(LucySpec.rnd(PairBaseSeed ^ base, d)) * 2.0 - 1.0
        val v =
          if (perturbed)
            b + delta * (LucySpec.unitDouble(LucySpec.rnd(PairNoiseSeed ^ base, d)) * 2.0 - 1.0)
          else b
        v.toFloat
      }
    })
    spark.range(0L, nPairs * 2, 1L, parts)
      .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
  }
}
