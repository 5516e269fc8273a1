package lucy.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Build configuration. numPartitions=0 → spark.sql.shuffle.partitions.
  * saltDfThreshold is LucySpec's 2^20 in production; tests lower it to
  * exercise the salted paths at toy scale.
  */
case class IndexConfig(
    numPartitions: Int = 0,
    saltDfThreshold: Long = lucy.LucySpec.saltDfThreshold,
    maxSalts: Int = lucy.LucySpec.maxSalts,
    lang: Option[String] = Some("en"))

/** On-disk index layout:
  * {{{
  * indexDir/
  *   docmap/          parquet  docId, url, warc_ts, lang, docLen
  *   stats/terms/     parquet  term, df, cf — range-sorted by term, so
  *                             parquet min/max stats prune term lookups
  *   segments/        parquet  PostingBlock columns + partId — range-
  *                             partitioned and sorted by termHash, so
  *                             termHash isin(...) prunes row groups/files
  *   meta/partitions/ json     per-partition lineage + metrics
  *   meta/build/      json     BuildManifest (fingerprint, timings) — LAST
  * }}}
  */
case class LucyIndex(dir: String) {
  def docmap(spark: SparkSession): DataFrame = spark.read.parquet(s"$dir/docmap")
  def termStats(spark: SparkSession): DataFrame = spark.read.parquet(s"$dir/stats/terms")
  def segments(spark: SparkSession): DataFrame = spark.read.parquet(s"$dir/segments")
  def manifest(spark: SparkSession): Option[BuildManifest] = Manifest.readBuild(spark, dir)
  def corpusStats(spark: SparkSession): CorpusStats = {
    val m = manifest(spark).getOrElse(sys.error(s"no build manifest in $dir"))
    CorpusStats(m.docs, m.avgdl)
  }
}

/** Batch index build — entry point 1 (SURVEY.md §3.1).
  *
  * Stage structure and shuffles:
  *  1. scan + lang filter (pushed to parquet) .......... no shuffle
  *  2. url dedup (max_by hash agg) ..................... SHUFFLE on url
  *  3. extractText + tokenize UDFs, docId .............. pipelined
  *  4. docmap write
  *  5. explode + tf agg ................................ SHUFFLE on (docId,term,docLen)
  *  6. term stats agg .................................. SHUFFLE on term (small output)
  *  7. head-term salting ............................... broadcast join (tiny)
  *  8. range exchange + sort by (termHash,term,salt) ... SHUFFLE (the big one)
  *  9. streaming block pack ............................ mapPartitions
  * 10. segments write + manifests (manifest LAST)
  *
  * Resume (BASELINE.json:14): each output dir's _SUCCESS is the stage
  * checkpoint; completed stages are skipped on re-run. `fingerprint`
  * names the input (caller supplies, e.g. "path@snapshot"); a non-empty
  * mismatch forces a full rebuild into a clean dir. All stage outputs
  * are deterministic functions of the input (fixed-seed hashing, pure
  * UDFs), so re-running a missing stage after a crash reproduces
  * byte-identical logical content.
  */
object IndexBuilder {

  def build(pages: DataFrame, indexDir: String,
            config: IndexConfig = IndexConfig(),
            fingerprint: String = ""): BuildManifest = {
    val spark = pages.sparkSession
    val t0 = System.nanoTime()

    Manifest.readBuild(spark, indexDir) match {
      case Some(m) if fingerprint.isEmpty || m.fingerprint == fingerprint =>
        return m // complete build already present
      case Some(m) =>
        sys.error(s"index at $indexDir was built from '${m.fingerprint}', " +
          s"refusing to overwrite with '$fingerprint' — use a fresh dir")
      case None => ()
    }

    val numPartitions =
      if (config.numPartitions > 0) config.numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // Stages 1–3; persisted because docmap, stats and segments all
    // consume it. MEMORY_AND_DISK: at cluster scale this is the classic
    // materialize-once tradeoff (tokens ≈ corpus size; spills to disk).
    val cleaned = Ingest.cleanPages(pages, config.lang)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Stage 4: docmap
    val tDocmap0 = System.nanoTime()
    if (!Manifest.stageDone(spark, s"$indexDir/docmap")) {
      Ingest.docmap(cleaned).write.mode("overwrite").parquet(s"$indexDir/docmap")
    }
    val docmap = spark.read.parquet(s"$indexDir/docmap")
    val docmapMs = (System.nanoTime() - tDocmap0) / 1000000

    // §8.5 collision check: distinct docId must equal distinct url.
    val Array(nDocs, nUrls) =
      docmap.agg(count_distinct(col("docId")), count_distinct(col("url")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nDocs == nUrls,
      s"docId collision: $nDocs distinct docIds for $nUrls urls (LucySpec §8.5)")
    val stats = Stats.corpusStats(docmap)

    // Stage 5: (docId, docLen, term) → tf. docLen rides the groupBy key
    // (functionally dependent on docId) so no docmap join is needed.
    val termTfDl = cleaned
      .select(col("docId"), size(col("tokens")).as("docLen"),
        explode(col("tokens")).as("term"))
      .groupBy(col("docId"), col("docLen"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // Stage 6: term stats
    val tStats0 = System.nanoTime()
    if (!Manifest.stageDone(spark, s"$indexDir/stats/terms")) {
      Stats.termStats(termTfDl)
        .repartitionByRange(math.max(1, numPartitions / 4), col("term"))
        .sortWithinPartitions(col("term"))
        .write.mode("overwrite").parquet(s"$indexDir/stats/terms")
    }
    val termStats = spark.read.parquet(s"$indexDir/stats/terms")
    val statsMs = (System.nanoTime() - tStats0) / 1000000

    // Stages 7–10: salting, range partition, pack, write
    val tSeg0 = System.nanoTime()
    if (!Manifest.stageDone(spark, s"$indexDir/segments")) {
      val head = Postings.headTerms(termStats, config.saltDfThreshold, config.maxSalts)
      val blocks = Postings.packBlocks(Postings.salted(termTfDl, head), numPartitions)
      blocks.toDF()
        .withColumn("partId", spark_partition_id())
        .write.mode("overwrite").parquet(s"$indexDir/segments")
    }
    val segments = spark.read.parquet(s"$indexDir/segments")
    val segmentsMs = (System.nanoTime() - tSeg0) / 1000000

    if (!Manifest.stageDone(spark, s"$indexDir/meta/partitions")) {
      Manifest.partitionManifests(segments)
        .coalesce(1).write.mode("overwrite").json(s"$indexDir/meta/partitions")
    }

    val Array(nPostings, nBlocks) =
      segments.agg(sum(col("count")), count(lit(1)))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray

    cleaned.unpersist()

    val m = BuildManifest(
      fingerprint = fingerprint,
      docs = stats.n, avgdl = stats.avgdl,
      postings = nPostings, blocks = nBlocks,
      numPartitions = numPartitions,
      saltDfThreshold = config.saltDfThreshold,
      lang = config.lang.getOrElse(""),
      docmapMs = docmapMs, statsMs = statsMs, segmentsMs = segmentsMs,
      totalMs = (System.nanoTime() - t0) / 1000000)
    Manifest.writeBuild(spark, indexDir, m) // manifest LAST = build complete
    m
  }
}
