package lucy.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import lucy.SparkFunSuite
import lucy.fixtures.VecGen

/** r7 optimization round: pins that the rewritten internals compute
  * EXACTLY what the r6 formulations computed.
  */
class R7OptimizationSpec extends SparkFunSuite {

  /** The r6 bruteCosineTopK formulation, verbatim (cross join + window
    * rank) — the reference the heap rewrite must bit-match.
    */
  private def bruteViaWindow(corpus: org.apache.spark.sql.DataFrame,
                             queries: org.apache.spark.sql.DataFrame,
                             k: Int): org.apache.spark.sql.DataFrame = {
    val dot = udf((a: Array[Float], b: Array[Float]) => {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    })
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qvec"), Similarity.normCol(col("embedding")).as("qn")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cvec"), Similarity.normCol(col("embedding")).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  test("r7 heap bruteCosineTopK is row- and bit-identical to the r6 window form") {
    val vecs = VecGen.vectors(spark, 3000, parts = 4).cache()
    try {
      val queries = vecs.filter(col("vec_id") < 7)
      for (k <- Seq(1, 5, 17)) {
        val got = Similarity.bruteCosineTopK(vecs, queries, k)
          .orderBy(col("query_id"), col("rank")).collect()
        val exp = bruteViaWindow(vecs, queries, k)
          .orderBy(col("query_id"), col("rank")).collect()
        assert(got.length == exp.length, s"row counts at k=$k")
        got.zip(exp).foreach { case (g, e) =>
          assert(g.getLong(0) == e.getLong(0) && g.getLong(1) == e.getLong(1),
            s"ids differ at k=$k: $g vs $e")
          // bit-exact cosine (the rewrite claims identical FP op order)
          assert(java.lang.Double.doubleToRawLongBits(g.getDouble(2)) ==
            java.lang.Double.doubleToRawLongBits(e.getDouble(2)),
            s"cosine bits differ at k=$k: $g vs $e")
          assert(g.getInt(3) == e.getInt(3) || g.getLong(3) == e.getLong(3))
        }
      }
    } finally vecs.unpersist()
  }

  test("r7 heap brute: corpus smaller than k and duplicate-cosine ties") {
    import spark.implicits._
    // two vectors with IDENTICAL embeddings → equal cosines must rank
    // by neighbor_id ascending, and k beyond the corpus returns all
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(0.0f, 1.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.bruteCosineTopK(df, df.filter(col("vec_id") === 0), k = 10)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L)) // cos 1.0, 0.6, 0.0
    assert(got.map(r => r.getInt(3)).toSeq == Seq(1, 2, 3))
  }
}
