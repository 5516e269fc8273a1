package lucy.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import lucy.fixtures.PagesGen
import lucy.index.{Ingest, Stats}
import lucy.query.{NaiveSearch, QuerySet}

/** One-off golden generator (SURVEY.md §5.2 "e2e: rank-identity"):
  * NaiveSearch (the spec-literal exhaustive engine) over the frozen
  * N=2000 fixture corpus × the 20-query reference set → JSON lines with
  * docIds and raw Double score bits. Output is committed at
  * src/test/resources/golden_queries.json and treated as frozen; it only
  * changes if LucySpec itself changes (a reconciliation event,
  * SURVEY.md §0.1).
  *
  * Run: sbt "runMain lucy.tools.GenGoldens src/test/resources/golden_queries.json"
  */
object GenGoldens {
  val corpusSize = 2000L

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/golden_queries.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cleaned = Ingest.cleanPages(PagesGen.pages(spark, corpusSize)).cache()
    val docmap = Ingest.docmap(cleaned)
    val termTf = Ingest.termTf(cleaned)
    val tokPos = Ingest.tokPos(cleaned)
    val stats = Stats.corpusStats(docmap)

    val lines = QuerySet.reference.map { q =>
      val rows = NaiveSearch.forQuery(termTf, tokPos, docmap, stats, q.query, q.mode, q.k).collect()
      val hits = rows.map { r =>
        s"""{"docId":${r.getLong(0)},"scoreBits":${java.lang.Double.doubleToLongBits(r.getDouble(1))},"nTerms":${r.getInt(2)}}"""
      }.mkString("[", ",", "]")
      s"""{"id":"${q.id}","query":"${q.query}","mode":"${q.mode}","k":${q.k},"hits":$hits}"""
    }
    Files.writeString(Paths.get(out), lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.length} goldens to $out (corpus N=$corpusSize, " +
      s"docs=${stats.n}, avgdl=${stats.avgdl})")
    spark.stop()
  }
}
