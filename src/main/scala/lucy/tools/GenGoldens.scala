package lucy.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import lucy.fixtures.PagesGen
import lucy.index.{Ingest, Stats}
import lucy.query.{NaiveSearch, QuerySet}

/** One-off golden generator (SURVEY.md §5.2 "e2e: rank-identity"):
  * NaiveSearch (the spec-literal exhaustive engine) over the frozen
  * N=2000 fixture corpus × the reference query set → JSON lines with
  * docIds and raw Double score bits. Output is committed at
  * src/test/resources/golden_queries.json and treated as frozen; it only
  * changes if LucySpec itself changes (a reconciliation event,
  * SURVEY.md §0.1).
  *
  * `--stem` (§8.7 r3) generates the stemming-ON twin set
  * (golden_queries_stem.json): the same corpus and queries through the
  * Porter-stemmed pipeline, so a reconciliation flip of
  * LucySpec.stemming is pre-evidenced end-to-end
  * (StemmedRankIdentitySpec).
  *
  * Run: sbt "runMain lucy.tools.GenGoldens src/test/resources/golden_queries.json"
  *      sbt "runMain lucy.tools.GenGoldens --stem src/test/resources/golden_queries_stem.json"
  */
object GenGoldens {
  val corpusSize = 2000L

  def main(args: Array[String]): Unit = {
    val stem = args.contains("--stem")
    val out = args.filterNot(_ == "--stem").headOption.getOrElse(
      if (stem) "src/test/resources/golden_queries_stem.json"
      else "src/test/resources/golden_queries.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cleaned = Ingest.cleanPages(PagesGen.pages(spark, corpusSize), stem = stem).cache()
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val tokPos = Ingest.tokPos(cleaned)
    val stats = Stats.corpusStats(docmap)

    val lines = QuerySet.reference.map { q =>
      val rows = NaiveSearch.forQuery(termTf, tokPos, docmap, stats, q.query, q.mode, q.k,
        stem).collect()
      val hits = rows.map { r =>
        s"""{"docId":${r.getLong(0)},"scoreBits":${java.lang.Double.doubleToLongBits(r.getDouble(1))},"nTerms":${r.getInt(2)}}"""
      }.mkString("[", ",", "]")
      s"""{"id":"${q.id}","query":"${q.query}","mode":"${q.mode}","k":${q.k},"hits":$hits}"""
    }
    Files.writeString(Paths.get(out), lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.length} goldens to $out (corpus N=$corpusSize, " +
      s"docs=${stats.n}, avgdl=${stats.avgdl}, stemming=$stem)")
    spark.stop()
  }
}
