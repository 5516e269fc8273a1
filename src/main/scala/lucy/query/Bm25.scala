package lucy.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import lucy.LucySpec

/** BM25 as pure Column arithmetic (SURVEY.md §2.3 F6) — no UDF, fully
  * whole-stage-codegen'd, and translatable 1:1 to the DuckDB oracle SQL
  * (SURVEY.md §5.3). Formula per LucySpec §8.4 (k1=1.2, b=0.75,
  * Lucene-style idf ≥ 0).
  */
object Bm25 {

  /** idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1). */
  def idfCol(df: Column, n: Column): Column =
    log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** One BM25 addend for a (term, doc) pair.
    *
    * The association is pinned to EXACTLY LucySpec.bm25Addend's scalar
    * evaluation order — (idf · (k1+1)) · (tf / denom) — so naive-engine
    * scores are bit-equal to the WAND kernel's (SURVEY.md §4.3
    * "deterministic FP summation"). Don't "simplify" the parentheses.
    */
  def addendCol(tf: Column, docLen: Column, df: Column, n: Column, avgdl: Column): Column =
    idfCol(df, n) * lit(LucySpec.k1 + 1.0) *
      (tf / (tf + lit(LucySpec.k1) * (lit(1.0 - LucySpec.b) + lit(LucySpec.b) * docLen / avgdl)))

  /** Identical SQL text for the DuckDB oracle — keep in lockstep with
    * addendCol (same operator tree, same constants).
    */
  def addendSql(tf: String, docLen: String, df: String, n: String, avgdl: String): String =
    s"ln(($n - $df + 0.5) / ($df + 0.5) + 1.0) * ${LucySpec.k1 + 1.0} * " +
      s"($tf / ($tf + ${LucySpec.k1} * (${1.0 - LucySpec.b} + ${LucySpec.b} * $docLen / $avgdl)))"
}
