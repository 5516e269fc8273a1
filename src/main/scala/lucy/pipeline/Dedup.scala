package lucy.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import lucy.{LucySpec, XxHash64}

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact → n-gram Jaccard → MinHash/LSH → SimHash.
  *
  * Scale notes (the 100 TB lens):
  *  - exact: one hash aggregation — shuffle keyed by a 64-bit text hash,
  *    never the text itself.
  *  - ngram Jaccard: candidate generation via shared-shingle join; at
  *    web scale you NEVER all-pairs — the shingle join is the pruner,
  *    and hot shingles are capped (maxShingleDf) exactly like head-term
  *    salting caps posting skew.
  *  - MinHash/LSH: signatures are a narrow map; banding turns near-dup
  *    search into a groupBy on band keys — the standard sublinear path.
  *  - SimHash: 64-bit sketch, bucket by prefix, verify by Hamming.
  */
object Dedup {

  /** Exact dedup by content hash: every doc tagged with its group's
    * canonical (minimum) id and a dup flag. Shuffles only (hash, id).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol).asc)
    docs
      .withColumn("content_hash", xxhash64(col(textCol)))
      .withColumn("canonical_id", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
      .select(col(idCol), col("canonical_id"), col("is_dup"))
  }

  /** Word n-gram shingles, distinct per doc. */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val shingleUdf = udf((text: String) =>
      LucySpec.tokenize(text).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toArray.distinct)
    docs.select(col(idCol), explode(shingleUdf(col(textCol))).as("shingle"))
  }

  /** Near-dup pairs by exact n-gram Jaccard ≥ threshold.
    * Candidates come from a shared-shingle self-join (docs with no
    * common shingle can't pass any threshold > 0); ubiquitous shingles
    * (df > maxShingleDf) are dropped from candidate generation — they
    * only generate quadratic noise — but still count in |A∪B| via the
    * per-doc shingle totals, keeping Jaccard exact.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        maxShingleDf: Long = 1000,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingles(docs, n, idCol, textCol)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val rare = sh.join(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
        .filter(col("sdf") <= maxShingleDf).select("shingle"),
      Seq("shingle"), "left_semi")
    val a = rare.toDF("shingle", "a")
    val b = rare.toDF("shingle", "b")
    val shared = a.join(b, Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.toDF("a", "sza"), Seq("a"))
      .join(sizes.toDF("b", "szb"), Seq("b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sza") + col("szb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("shared"), col("jaccard"))
  }

  /** MinHash signature: for permutation p, min over shingles of
    * xxh64(p || shingle). Deterministic (seed 42), identical across
    * runs and parallelism. numPerms hashes per doc = one narrow pass.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, numPerms: Int = 16,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigUdf = udf((text: String) => {
      val sh = LucySpec.tokenize(text).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toArray.distinct
      (0 until numPerms).map { p =>
        if (sh.isEmpty) Long.MaxValue
        else sh.iterator.map(s => XxHash64.hashUtf8(s"$p|$s", LucySpec.seed)).min
      }.toArray
    })
    docs.select(col(idCol), sigUdf(col(textCol)).as("signature"))
  }

  /** LSH banding: signatures split into bands of `rowsPerBand`; docs
    * sharing any full band become candidate pairs (groupBy band key —
    * sublinear, no all-pairs). Returns distinct candidate pairs with
    * their estimated Jaccard (signature agreement rate).
    */
  def minhashLshCandidates(docs: DataFrame, n: Int = 3, numPerms: Int = 16,
                           rowsPerBand: Int = 4, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val sigs = minhashSignatures(docs, n, numPerms, idCol, textCol)
    val numBands = numPerms / rowsPerBand
    val banded = sigs.select(col(idCol), col("signature"),
      posexplode(sequence(lit(0), lit(numBands - 1))).as(Seq("bandPos", "band")))
      .withColumn("bandKey",
        xxhash64(col("band"),
          slice(col("signature"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select(col(idCol), col("signature"), col("bandKey"))
    val l = banded.toDF("a", "sigA", "bandKey")
    val r = banded.toDF("b", "sigB", "bandKey")
    l.join(r, Seq("bandKey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sigA"), col("sigB"))
      .distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sigA"), col("sigB"), (x, y) => x === y), b => b))
          .cast("double") / size(col("sigA")))
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  /** SimHash core (shared with TextAnalysis.simhashUdf). */
  def simhash64(tokens: Array[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = XxHash64.hashUtf8(t, LucySpec.seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs within a Hamming radius, bucketed by the
    * four 16-bit chunks (a pair within distance ≤3 shares at least one
    * chunk — pigeonhole), so candidate generation is a groupBy join,
    * not all-pairs.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "chunk bucketing covers Hamming ≤ 3")
    val withSig = docs.select(col(idCol), TextAnalysis.simhashUdf(col(textCol)).as("simhash"))
    val chunked = withSig.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunkNo"),
          shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)).as("c"))
      .select(col(idCol), col("simhash"), col("c.chunkNo"), col("c.chunk"))
    val l = chunked.toDF("a", "simA", "chunkNo", "chunk")
    val r = chunked.toDF("b", "simB", "chunkNo", "chunk")
    val hamming = udf((x: Long, y: Long) => java.lang.Long.bitCount(x ^ y))
    l.join(r, Seq("chunkNo", "chunk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("simA"), col("simB"))
      .distinct()
      .withColumn("hamming", hamming(col("simA"), col("simB")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }
}
