package lucy.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import lucy.LucySpec

/** Deterministic near-duplicate corpus with PLANTED ground truth, for
  * the dedup-family soak (VERDICT r4 next-round #3): the ANN paths had
  * 1M/10M evidence, the dedup families only sf0.1 timings — this
  * generator gives them a ≥1M-doc corpus where recall is measurable
  * against known truth, not just timable.
  *
  * Layout: docs come in CLUSTERS whose sizes cycle 1, 2, 3 (one period
  * of 3 clusters = 6 docs), so a corpus of n docs holds n/6·4 true
  * intra-cluster near-dup pairs (sizes 1→0, 2→1, 3→3 pairs). Within a
  * cluster, variant v > 0 mutates exactly 3 of the 90 tokens of the
  * cluster's base text, so pairwise shingle Jaccard is ≈ 0.81 (base vs
  * variant) / ≈ 0.66 (variant vs variant) — all above the 0.5 dedup
  * threshold, none byte-identical. Tokens are drawn from a ~10^6-word
  * synthetic vocabulary ("w"+hash), so shingles are effectively
  * cluster-local and cross-cluster shingle collisions are noise-level —
  * unlike PagesGen's 64-word zipf vocab, where every 3-gram is shared
  * corpus-wide and near-dup structure would drown in hot shingles.
  *
  * An optional MEGA-CLUSTER of byte-identical boilerplate docs is
  * appended after the planted docs: its band/chunk buckets exceed the
  * default hot-bucket caps, so the soak exercises the caps LOUDLY
  * (non-zero CapStats drops) on the same run that measures recall on
  * the planted clusters. Everything is a pure function of doc_id.
  */
object NearDupGen {

  /** Cluster id of planted doc i (sizes cycle 1,2,3 per 6 docs). */
  def clusterOf(i: Long): Long = {
    val r = i % 6
    val idx = if (r == 0) 0L else if (r <= 2) 1L else 2L
    (i / 6) * 3 + idx
  }

  /** Variant index within the cluster (0 = base text). */
  def variantOf(i: Long): Int = {
    val r = (i % 6).toInt
    if (r == 0) 0 else if (r <= 2) r - 1 else r - 3
  }

  /** True intra-cluster pair count for n planted docs (n % 6 == 0). */
  def truePairs(n: Long): Long = n / 6 * 4

  private val BaseSeed = 0xC0D50000L
  private val MutSeed = 0x3D5EED00L
  private val TokensPerDoc = 90

  /** Planted doc text: 90 tokens from the cluster's base draw; variant
    * v mutates the 3 positions v·7+{8,38,68 offsets} with variant-
    * specific replacements.
    */
  def text(i: Long): String = {
    val c = clusterOf(i)
    val v = variantOf(i)
    val sb = new StringBuilder(TokensPerDoc * 8)
    var j = 0
    while (j < TokensPerDoc) {
      val mutated = v > 0 && (j == v * 7 + 1 || j == v * 7 + 31 || j == v * 7 + 61)
      val w =
        if (mutated) "m" + (math.abs(LucySpec.rnd(MutSeed + c, 1000L + v * 100L + j)) % 1000000L)
        else "w" + (math.abs(LucySpec.rnd(BaseSeed + c, j)) % 1000000L)
      sb.append(w)
      if (j < TokensPerDoc - 1) sb.append(' ')
      j += 1
    }
    sb.toString
  }

  /** The mega-cluster's shared boilerplate (byte-identical across its
    * docs — the domain of exact dedup; here it exists to trip the
    * sketch paths' hot-bucket caps).
    */
  val megaText: String =
    (0 until 50).map(j => "boiler" + (math.abs(LucySpec.rnd(0xB01L, j)) % 1000L)).mkString(" ")

  /** (doc_id, text) corpus: nPlanted cluster docs + megaDocs identical
    * boilerplate docs. One narrow map over spark.range — no shuffle.
    */
  def corpus(spark: SparkSession, nPlanted: Long, megaDocs: Long = 0L,
             partitions: Int = 0): DataFrame = {
    require(nPlanted % 6 == 0, "nPlanted must be a multiple of 6 (cluster period)")
    import spark.implicits._
    val n = nPlanted + megaDocs
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(0L, n)
    base.as[Long]
      .map(i => (i, if (i < nPlanted) text(i) else megaText))
      .toDF("doc_id", "text")
  }
}
