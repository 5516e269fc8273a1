package lucy.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import lucy.Hashing
import lucy.index.{IndexBuilder, IndexConfig, LucyIndex}

/** Micro-attribution of the gather path: time the pruned-scan collect for
  * specific term sets against the warm cached segments relation.
  */
object ProfileGather {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idxDir = s"/tmp/lucy-profile-idx-270000"
    IndexBuilder.build(lucy.fixtures.PagesGen.pages(spark, 270000, 64), idxDir,
      IndexConfig(saltDfThreshold = 1L << 16, maxSalts = 16))
    val index = LucyIndex(idxDir)
    val segments = index.segments(spark)
    segments.cache().count()

    def timeIt(tag: String, terms: Seq[String]): Unit = {
      val hashes = terms.map(t => Hashing.termHash(t).asInstanceOf[Any])
      val pruned = segments.filter(col("termHash").isin(hashes: _*) &&
        col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val rows = pruned.select("termHash", "term", "salt", "blockNo", "firstDocId",
          "lastDocId", "count", "maxTf", "minDocLen", "docsVarint", "tfsVarint",
          "dlsVarint", "srcPart").collect()
        val ms = (System.nanoTime() - t0) / 1e6
        val bytes = rows.map(r => r.getAs[Array[Byte]]("docsVarint").length +
          r.getAs[Array[Byte]]("tfsVarint").length +
          r.getAs[Array[Byte]]("dlsVarint").length).sum
        val postings = rows.map(_.getAs[Int]("count").toLong).sum
        println(f"$tag%-22s run$i: ${ms}%8.1f ms  rows=${rows.length}%6d postings=$postings%8d bytes=$bytes%9d")
      }
    }

    timeIt("tail2 [snippet,anchor]", Seq("snippet", "anchor"))
    timeIt("head1 [spark]", Seq("spark"))
    timeIt("2mixed [spark,varint]", Seq("spark", "varint"))
    timeIt("4tail [catalyst...]", Seq("catalyst", "codegen", "tungsten", "columnar"))

    // pure kernel time over pre-gathered blocks (no Spark in the loop)
    import lucy.query.{QueryPlan, Wand}
    import lucy.index.{PostingBlock, TermStats, Stats, CorpusStats}
    def kernelBench(tag: String, terms: Seq[String], conjunctive: Boolean): Unit = {
      val sorted = terms.distinct.sorted.toArray
      val stats = index.corpusStats(spark)
      val dfm = Stats.lookupTerms(index.termStats(spark), sorted)
      val hashes = sorted.map(t => Hashing.termHash(t).asInstanceOf[Any])
      val rows = segments.filter(col("termHash").isin(hashes.toSeq: _*) &&
          col("term").isin(sorted.map(_.asInstanceOf[Any]).toSeq: _*))
        .collect()
      val blocks = rows.map { r =>
        (PostingBlock(r.getAs[Int]("termHash"), r.getAs[String]("term"), r.getAs[Int]("salt"),
          r.getAs[Int]("blockNo"), r.getAs[Long]("firstDocId"), r.getAs[Long]("lastDocId"),
          r.getAs[Int]("count"), r.getAs[Int]("maxTf"), r.getAs[Int]("minDocLen"),
          r.getAs[Array[Byte]]("docsVarint"), r.getAs[Array[Byte]]("tfsVarint"),
          r.getAs[Array[Byte]]("dlsVarint"), r.getAs[Array[Byte]]("posVarint")),
          r.getAs[Int]("srcPart"))
      }
      val groups = blocks.groupBy(b => (b._1.term, b._1.salt, b._2)).toSeq.map {
        case ((t, _, _), g) =>
          (java.util.Arrays.binarySearch(sorted.asInstanceOf[Array[AnyRef]], t),
            g.map(_._1).sortBy(_.firstDocId))
      }
      val plan = QueryPlan(sorted, sorted.map(dfm(_).df), stats.n, stats.avgdl,
        conjunctive, 10)
      val postings = blocks.map(_._1.count.toLong).sum
      for (i <- 1 to 5) {
        val t0 = System.nanoTime()
        val hits = Wand.topK(plan, groups, 0L, Long.MaxValue).toArray
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"KERNEL $tag%-18s run$i: $ms%8.2f ms  postings=$postings%8d hits=${hits.length}")
      }
    }
    kernelBench("or_punct", Seq("spark", "shuffle"), conjunctive = false)
    kernelBench("and_punct", Seq("spark", "shuffle"), conjunctive = true)
    kernelBench("or_tail2", Seq("snippet", "anchor"), conjunctive = false)
    kernelBench("and_4", Seq("index", "posting", "term", "query"), conjunctive = true)

    // full path comparison
    val engine = new lucy.query.QueryEngine(spark, index)
    import lucy.query.QueryMode
    for ((tag, q, m) <- Seq(
      ("S or_tail2", "snippet anchor", QueryMode.Or),
      ("S or_headstop", "spark the", QueryMode.Or),
      ("S and_2mixed", "spark varint", QueryMode.And),
      ("S or_k100", "bucket salting skew", QueryMode.Or));
         i <- 1 to 4) {
      val t0 = System.nanoTime()
      engine.search(q, m, if (tag.contains("k100")) 100 else 10).collect()
      println(f"$tag%-22s run$i: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    spark.stop()
  }
}
