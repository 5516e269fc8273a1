package lucy.index

import java.nio.file.Files
import org.apache.spark.sql.functions._
import lucy.SparkFunSuite
import lucy.fixtures.PagesGen

/** Index build integrity: decoded segments ≡ the naive tf table
  * (logical content pinned, FIXTURES.md §2), manifests, resume.
  */
class IndexBuilderSpec extends SparkFunSuite {

  private lazy val tmp = Files.createTempDirectory("lucy-ib").toString

  private def decodedPostings(index: LucyIndex) = {
    import spark.implicits._
    index.segments(spark)
      .as[SegmentRow]
      .flatMap { r =>
        val d = PostingBlock.decode(r.toBlock)
        d.docIds.indices.map(i => (r.term, d.docIds(i), d.tfs(i), d.docLens(i)))
      }
      .toDF("term", "docId", "tf", "docLen")
  }

  test("segments decode to exactly the naive tf table (unsalted + salted)") {
    val pages = PagesGen.pages(spark, 400)
    val cleaned = Ingest.cleanPages(pages)
    val expected = Ingest.termTf(cleaned)
      .join(Ingest.docmap(cleaned).select(col("docId"), col("docLen")), Seq("docId"))
      .select(col("term"), col("docId"), col("tf").cast("int").as("tf"), col("docLen"))

    for ((cfg, tag) <- Seq((IndexConfig(), "plain"),
      (IndexConfig(saltDfThreshold = 30, maxSalts = 16), "salty"))) {
      val dir = s"$tmp/decode-$tag"
      val m = IndexBuilder.build(pages, dir, cfg)
      val got = decodedPostings(LucyIndex(dir))
      assert(got.count() === m.postings)
      assert(got.exceptAll(expected).count() === 0, s"$tag: extra postings")
      assert(expected.exceptAll(got).count() === 0, s"$tag: missing postings")
    }
  }

  test("build manifest records corpus + stage facts; partition manifests exist") {
    val dir = s"$tmp/manifest"
    val m = IndexBuilder.build(PagesGen.pages(spark, 300), dir, fingerprint = "pages@300")
    assert(m.docs === 270) // 90% en
    assert(m.avgdl > 0)
    assert(m.blocks > 0 && m.postings > 0)
    assert(m.fingerprint === "pages@300")
    val parts = spark.read.json(s"$dir/meta/partitions")
    assert(parts.count() > 0)
    assert(parts.agg(sum("postings")).head().getLong(0) === m.postings)
  }

  test("resume: a completed build is a no-op; fingerprint mismatch refuses") {
    val dir = s"$tmp/resume"
    val pages = PagesGen.pages(spark, 200)
    val m1 = IndexBuilder.build(pages, dir, fingerprint = "v1")
    val m2 = IndexBuilder.build(pages, dir, fingerprint = "v1")
    assert(m2 === m1) // returned from manifest, nothing recomputed
    intercept[RuntimeException] {
      IndexBuilder.build(pages, dir, fingerprint = "v2")
    }
  }

  test("PARTIAL build with a different fingerprint refuses to resume (ADVICE r1)") {
    import org.apache.hadoop.fs.Path
    val dir = s"$tmp/partial-guard"
    val pages = PagesGen.pages(spark, 100)
    IndexBuilder.build(pages, dir, fingerprint = "inputA")
    // simulate a crash after the stages but before the final manifest:
    // stage outputs + fingerprint marker survive, completed manifest gone
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$dir/meta/build"), true)
    val e = intercept[IllegalArgumentException] {
      IndexBuilder.build(PagesGen.pages(spark, 120), dir, fingerprint = "inputB")
    }
    assert(e.getMessage.contains("partial build"))
    // the matching fingerprint may resume and completes
    val m = IndexBuilder.build(pages, dir, fingerprint = "inputA")
    assert(m.docs > 0)
  }

  test("resume: crash between segments and manifest re-runs only the tail") {
    import org.apache.hadoop.fs.Path
    val dir = s"$tmp/crash"
    val pages = PagesGen.pages(spark, 200)
    val m1 = IndexBuilder.build(pages, dir, fingerprint = "v1")
    // simulate a crash after segments committed but before the build
    // manifest was written: delete manifest + partition metrics only
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$dir/meta"), true)
    val docmapMtime = fs.getFileStatus(new Path(s"$dir/docmap/_SUCCESS")).getModificationTime
    val m2 = IndexBuilder.build(pages, dir, fingerprint = "v1")
    assert(m2.docs === m1.docs)
    assert(m2.postings === m1.postings)
    assert(m2.blocks === m1.blocks)
    // docmap stage was NOT re-run (same _SUCCESS mtime)
    assert(fs.getFileStatus(new Path(s"$dir/docmap/_SUCCESS")).getModificationTime === docmapMtime)
  }

  test("resume: segments wiped, docmap/stats kept → rebuilt index is logically identical") {
    import org.apache.hadoop.fs.Path
    val dir = s"$tmp/partial"
    val pages = PagesGen.pages(spark, 250)
    IndexBuilder.build(pages, dir, fingerprint = "v1")
    val before = decodedPostings(LucyIndex(dir)).collect().toSet
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$dir/segments"), true)
    fs.delete(new Path(s"$dir/meta"), true)
    val docmapMtime = fs.getFileStatus(new Path(s"$dir/docmap/_SUCCESS")).getModificationTime
    IndexBuilder.build(pages, dir, fingerprint = "v1")
    assert(decodedPostings(LucyIndex(dir)).collect().toSet === before)
    assert(fs.getFileStatus(new Path(s"$dir/docmap/_SUCCESS")).getModificationTime === docmapMtime,
      "docmap stage must not re-run")
  }

  test("docLen and tf survive the varint roundtrip at block boundaries") {
    // force multi-block terms: 300 docs all sharing one tail-ish term
    import spark.implicits._
    val pages = (0 until 300).map { i =>
      (s"u$i", new java.sql.Timestamp(i * 1000L), null.asInstanceOf[Array[Byte]],
        s"needle filler$i " + ("pad " * (i % 7)), "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")
    val dir = s"$tmp/blocks"
    IndexBuilder.build(pages, dir)
    val needle = LucyIndex(dir).segments(spark).filter(col("term") === "needle")
    assert(needle.count() === 3) // 300 docs / 128 per block
    assert(needle.agg(sum("count")).head().getLong(0) === 300)
  }
}
