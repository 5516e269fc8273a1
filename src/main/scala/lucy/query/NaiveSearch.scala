package lucy.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import lucy.LucySpec
import lucy.index.CorpusStats

/** Query mode (SURVEY.md §8.6): AND = docs containing every distinct
  * query term; OR = any.
  */
object QueryMode extends Enumeration {
  val And, Or = Value
  def parse(s: String): Value = if (s.equalsIgnoreCase("or")) Or else And
}

/** The naive exhaustive BM25 engine (SURVEY.md §7.1 M1).
  *
  * Pure DataFrame built-ins over the (docId, term, tf) table and the
  * docmap — every operator Catalyst-visible, BM25 as Column arithmetic,
  * top-k via `orderBy.limit` (planned as TakeOrderedAndProjectExec:
  * per-partition heap + driver merge, SURVEY.md §2.4 A7).
  *
  * Role: (a) the permanent correctness oracle the WAND fast path is
  * property-tested against (scores bit-equal — hence the explicit
  * ascending-term summation below, §8.4); (b) the DuckDB-translatable
  * twin for the driver harness (SURVEY.md §5.3).
  */
object NaiveSearch {

  /** Top-k BM25. Returns (docId, score, nTerms) ordered by
    * score DESC, docId ASC, limited to k.
    */
  def search(termTf: DataFrame, docmap: DataFrame, stats: CorpusStats,
             query: String, mode: QueryMode.Value = QueryMode.And,
             k: Int = LucySpec.defaultK): DataFrame = {
    val spark = termTf.sparkSession
    val terms = LucySpec.queryTerms(query)
    if (terms.isEmpty) {
      // stopword-only / empty query ⇒ empty result, not an error (§8.6)
      import spark.implicits._
      return Seq.empty[(Long, Double, Int)].toDF("docId", "score", "nTerms")
    }

    // df(t) computed over the whole corpus but only for query terms —
    // the isin filter prunes before the aggregation.
    val matching = termTf.filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
    val dfPerTerm = matching.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // Attach docLen (join on docId) and df (broadcast: ≤ |query| rows).
    val scored = matching
      .join(docmap.select(col("docId"), col("docLen")), Seq("docId"))
      .join(broadcast(dfPerTerm), Seq("term"))
      .withColumn("addend",
        Bm25.addendCol(col("tf"), col("docLen"), col("df"), lit(stats.n), lit(stats.avgdl)))

    // Deterministic summation (§8.4): collect the ≤|q| addends per doc,
    // sort by term, fold left — bit-identical across any parallelism.
    val perDoc = scored
      .groupBy(col("docId"))
      .agg(sort_array(collect_list(struct(col("term"), col("addend")))).as("parts"))
      .withColumn("score",
        aggregate(col("parts"), lit(0.0), (acc, x) => acc + x.getField("addend")))
      .withColumn("nTerms", size(col("parts")))
      .select(col("docId"), col("score"), col("nTerms"))

    val filtered = mode match {
      case QueryMode.And => perDoc.filter(col("nTerms") === lit(terms.length))
      case QueryMode.Or  => perDoc
    }
    filtered.orderBy(col("score").desc, col("docId").asc).limit(k)
  }

  /** J4 — join top-k back to display columns. k is tiny: isin filter on
    * the docmap, no shuffle of the big side.
    */
  def withUrls(topk: DataFrame, docmap: DataFrame): DataFrame = {
    val ids = topk.select("docId").collect().map(_.getLong(0))
    if (ids.isEmpty) return topk.withColumn("url", lit(null: String))
    topk.join(broadcast(docmap.filter(col("docId").isin(ids.map(_.asInstanceOf[Any]): _*))
      .select(col("docId"), col("url"))), Seq("docId"), "left")
      .orderBy(col("score").desc, col("docId").asc)
  }
}
