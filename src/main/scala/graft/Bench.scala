package graft

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import org.apache.spark.sql.SparkSession
import lucy.fixtures.PagesGen
import lucy.index.{IndexBuilder, IndexConfig, LucyIndex}
import lucy.query.{QueryEngine, QuerySet}

/** Round benchmark (BASELINE.md protocol). Phases:
  *
  *  A. index build over a freshly generated pages corpus (the engine's
  *     headline: docs/sec through dedup → extract → tokenize → tf →
  *     stats → salt → range sort → pack → write),
  *  B. the reference query set (30 since r3, incl. the head-term
  *     combinations whose Σdf > 2^20 exercises the bucket-exchange
  *     shape at bench scale), sequential (latency) after a warm-up,
  *  C. the same set driven by 8 concurrent client threads (throughput —
  *     Spark schedules concurrent jobs; this is the realistic serving
  *     shape and what the N→4N scaling criterion is measured on),
  *  D. every SparkEntry.queries entry over SPARK_GRAFT_SF_DIR
  *     (operator sweep).
  *
  * Corpus size defaults by SF dir and is overridable with
  * SPARK_GRAFT_BENCH_DOCS. Two-parallelism scaling evidence
  * (BASELINE.json:14, sandbox substitute): run this main with
  * SPARK_GRAFT_CPUS=8 and =32 on the same inputs — results are recorded
  * in BENCH/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong).getOrElse {
      if (sfDir.contains("sf0.1")) 300000L
      else if (sfDir.contains("sf0.01")) 60000L
      else 20000L
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      timings(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // Phase A: index build, cold — best-of-2 into separate dirs (the
    // VM's timings are bimodal with 2-4× spread, BENCH/BASELINE.md; the
    // r3 driver capture landed entirely in a degraded phase — VERDICT r3
    // next-round #1a). Both raw samples are reported; the headline is
    // the min, which is the standard best-of discipline the campaign
    // numbers already use.
    val benchRoot = Files.createTempDirectory("lucy-bench").toString
    val manifest = timed("index_build_s1") {
      IndexBuilder.build(PagesGen.pages(spark, benchDocs, cpus.toInt * 2), s"$benchRoot/idx1",
        IndexConfig(saltDfThreshold = 1L << 16, maxSalts = 16))
    }
    timed("index_build_s2") {
      IndexBuilder.build(PagesGen.pages(spark, benchDocs, cpus.toInt * 2), s"$benchRoot/idx2",
        IndexConfig(saltDfThreshold = 1L << 16, maxSalts = 16))
    }
    timings("index_build") = math.min(timings("index_build_s1"), timings("index_build_s2"))
    val idxDir = s"$benchRoot/idx1"
    val docsPerSec = manifest.docs / timings("index_build")

    // Warm serving engine (pins segments + stats into block-manager cache)
    val engine = timed("engine_warm") {
      new QueryEngine(spark, LucyIndex(idxDir)).warm()
    }

    // Phase B: sequential query latency (1 warm-up pass, then timed)
    QuerySet.reference.foreach(q => engine.search(q.query, q.mode, q.k).collect())
    timed("queries_sequential") {
      QuerySet.reference.foreach { q =>
        timed(s"q_${q.id}") {
          engine.search(q.query, q.mode, q.k).collect()
        }
      }
    }
    val seqQps = QuerySet.reference.size / timings("queries_sequential")

    // Phase C: concurrent throughput, 8 client threads × 5 passes
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val passes = 5
    timed("queries_concurrent") {
      val futs = (0 until passes).flatMap(_ => QuerySet.reference).map { q =>
        Future { engine.search(q.query, q.mode, q.k).collect() }
      }
      Await.result(Future.sequence(futs), Duration.Inf)
    }
    pool.shutdown()
    val concQps = (QuerySet.reference.size * passes) / timings("queries_concurrent")

    // Phase gating for scaling campaigns (r4): A/B/C always run (they
    // carry the headline metrics); D..I are skippable so a 2-core
    // scaling rep doesn't pay the full operator sweep. Default = A-G
    // (H, the ≥1M-doc dedup soak, and I, the dedup-pairs multi-probe
    // soak, are campaign-gated by design).
    val phases = sys.env.getOrElse("SPARK_GRAFT_PHASES", "ABCDEFG")

    // Locale.ROOT: default-locale "%.3f" yields comma decimals under e.g.
    // de_DE and would crash .toDouble after all phases complete (ADVICE r1)
    def num(fmt: String, v: Double): Double =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v)).toDouble

    // Phase D: harness operator sweep over the driver tables
    if (phases.contains('D')) timed("harness_total") {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        timed(s"h_$name") {
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        }
      }
    }

    // Phase E (r3): compaction wall-time — base 50k + delta 10k folded
    // into a new generation (the merge now SLICES position streams
    // through instead of decode/re-encode; VERDICT r2 #5). Fixed sizes
    // so the number is comparable across rounds.
    if (phases.contains('E')) {
      import lucy.stream.IncrementalIndexer
      val root = Files.createTempDirectory("lucy-bench-store").toString + "/store"
      IncrementalIndexer.bootstrap(PagesGen.pages(spark, 50000, cpus.toInt), root)
      import spark.implicits._
      IncrementalIndexer.indexBatch(
        spark.range(50000, 60000).as[Long].map(PagesGen.page _).toDF(), root, 0L)
      timed("compact_50k_plus_10k") {
        IncrementalIndexer.compact(spark, root)
      }
    }

    // Phase F (r4): ANN scale paths at 10^6 vectors (VERDICT r3 #6) —
    // the driver embeddings table (2k vectors) cannot show the IVF/LSH
    // shapes; a derived-parameter run over a generated clustered corpus
    // does. Generation+cache is timed separately (ann_gen) so the ivf/
    // lsh numbers are the search paths alone. IVF passes a reduced
    // sampleCap/iters (geometry unchanged: numLists = √n = 1000 is far
    // below either cap) to keep the driver-side k-means training a
    // bounded share of the phase.
    var annRecall = ""
    if (phases.contains('F')) {
      import lucy.fixtures.VecGen
      import lucy.pipeline.Similarity
      import org.apache.spark.sql.functions.col
      val annN = sys.env.get("SPARK_GRAFT_ANN_DOCS").map(_.toLong).getOrElse(1000000L)
      val vecs = timed("ann_gen") {
        val v = VecGen.vectors(spark, annN, parts = cpus.toInt * 2).cache()
        v.count()
        v
      }
      val queries = vecs.filter(col("vec_id") < 16)
      // Recall is MEASURED, not assumed (VERDICT r4 next-round #2):
      // brute-force top-10 over the same 16 queries is the truth set —
      // 16·n exact dots, a bounded extra phase cost — and each ANN
      // path's result is scored against it, so the bench record ties
      // "fast" to "still finding the right neighbors" as the derived
      // parameters coarsen with n.
      val bruteTop = timed("ann_brute_truth") {
        Similarity.bruteCosineTopK(vecs, queries, k = 10)
          .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      }
      def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
        val byQ = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val rs = bruteTop.map { case (q, top) =>
          byQ.getOrElse(q, Set.empty).intersect(top).size.toDouble / top.size }
        rs.sum / rs.size
      }
      val ivfRows = timed("ann_ivf_1m") {
        // explicit numLists pins the FLAT path (at 10M+ the derived
        // default now dispatches to two-level — r5), keeping this
        // datapoint comparable across rounds and corpus sizes
        val (dnl, _) = Similarity.ivfParamsFor(annN, 16384)
        Similarity.ivfCosineTopK(vecs, queries, k = 10, numLists = dnl,
          corpusCount = annN, sampleCap = 16384, iters = 2).collect()
      }
      val lshRows = timed("ann_lsh_1m") {
        Similarity.lshCosineTopK(vecs, queries, k = 10, corpusCount = annN).collect()
      }
      // two-level quantizer (r4): k1=k2=n^(1/4) → same √n cell count as
      // the flat path at (k1+k2)·d assignment cost — the 10^12 shape
      val ivf2Rows = timed("ann_ivf2_1m") {
        Similarity.ivfTwoLevelTopK(vecs, queries, k = 10, corpusCount = annN,
          sampleCap = 16384, iters = 2).collect()
      }
      // optional forced-probe variant (SPARK_GRAFT_ANN_PROBE=bits): the
      // multi-probe recall lever measured at bench scale — auto probing
      // only engages at reduced band counts, so this pins it ON to show
      // the recall/cost trade against the same derived geometry
      val probeRecall = sys.env.get("SPARK_GRAFT_ANN_PROBE").map(_.toInt).map { pbits =>
        val rows = timed("ann_lsh_probe") {
          Similarity.lshCosineTopK(vecs, queries, k = 10, corpusCount = annN,
            probeBits = pbits).collect()
        }
        s""""lsh_probe$pbits":${num("%.3f", recallOf(rows))},"""
      }.getOrElse("")
      // optional two-level probe sweep (SPARK_GRAFT_IVF2_SWEEP=
      // "21x21,32x32,..."; VERDICT r5 next-round #4): recall vs
      // (probe1, probe2) against the in-phase brute truth, so the 50M
      // campaign can chart whether holding recall ≈ 1 needs probe
      // counts that scale with n beyond the k/4 default.
      val ivf2Sweep = sys.env.get("SPARK_GRAFT_IVF2_SWEEP").map { spec =>
        spec.split(',').map { combo =>
          val Array(p1, p2) = combo.trim.split('x').map(_.toInt)
          val rows = timed(s"ann_ivf2_p${p1}x$p2") {
            Similarity.ivfTwoLevelTopK(vecs, queries, k = 10, probe1 = p1, probe2 = p2,
              corpusCount = annN, sampleCap = 16384, iters = 2).collect()
          }
          s""""ivf2_p${p1}x$p2":${num("%.3f", recallOf(rows))}"""
        }.mkString("", ",", ",")
      }.getOrElse("")
      annRecall = s""""ann_recall":{"ivf":${num("%.3f", recallOf(ivfRows))},""" +
        s""""lsh":${num("%.3f", recallOf(lshRows))},$probeRecall$ivf2Sweep""" +
        s""""ivf2":${num("%.3f", recallOf(ivf2Rows))}},"""
      vecs.unpersist()
    }

    // Phase G (r5, VERDICT r4 next-round #6): LucyStore serving-while-
    // ingesting throughput — bootstrap, micro-batch puts, live search,
    // tombstone delete, compaction, post-compaction search. The store
    // had correctness coverage (LucyStoreSpec) but no throughput
    // datapoint.
    var storeStats = ""
    if (phases.contains('G')) {
      import spark.implicits._
      val storeDocs = sys.env.get("SPARK_GRAFT_STORE_DOCS").map(_.toLong).getOrElse(200000L)
      val root = Files.createTempDirectory("lucy-bench-lucystore").toString + "/store"
      val store = new lucy.LucyStore(spark, root)
      timed("store_bootstrap") {
        store.bootstrap(PagesGen.pages(spark, storeDocs, cpus.toInt * 2))
      }
      val batch = math.max(1000L, storeDocs / 20)
      timed("store_puts") {
        var b = 0L
        while (b < 5) {
          val lo = storeDocs + b * batch
          store.put(spark.range(lo, lo + batch).as[Long].map(PagesGen.page _).toDF(), b)
          b += 1
        }
      }
      val liveQueries = QuerySet.reference.take(5)
      // ZERO-GAP pass: the first search fires the instant the last put
      // returns, so it races (and usually pays inline) the warm-behind's
      // one-time costs — composite term-stats materialization, corpus
      // stats, delta caches. A real ingest stream almost always has
      // think-time between the last write and the next query; the
      // second pass below measures THAT regime (warm engine, same
      // view), so the record separates the one-time engine tax from the
      // steady-state live-serving tax (VERDICT r5 next-round #6 is a
      // statement about the latter).
      timed("store_search_live") {
        liveQueries.zipWithIndex.foreach { case (q, i) =>
          timed(s"store_live_q${i + 1}") {
            store.search(q.query, q.mode, q.k).collect()
          }
        }
      }
      timed("store_search_live_warm") {
        liveQueries.foreach(q => store.search(q.query, q.mode, q.k).collect())
      }
      timed("store_delete") {
        store.delete((0L until 1000L).map(i => s"https://example.org/p/$i"))
      }
      timed("store_compact") { store.compact() }
      // same two-pass protocol post-compaction: the first pass pays the
      // (much cheaper) single-part engine build, the second is pure
      // warm serving — live_warm / compacted_warm is the apples-to-
      // apples composite-view serving tax.
      timed("store_search_compacted") {
        liveQueries.foreach(q => store.search(q.query, q.mode, q.k).collect())
      }
      timed("store_search_compacted_warm") {
        liveQueries.foreach(q => store.search(q.query, q.mode, q.k).collect())
      }
      storeStats = s""""store_put_docs_per_sec":${num("%.1f", 5 * batch / timings("store_puts"))},"""
    }

    // Phase H (r5, VERDICT r4 next-round #3): dedup-family soak over a
    // generated ≥1M-doc corpus with PLANTED near-dup clusters
    // (NearDupGen) — wall time AND recall vs planted truth for
    // minhash/simhash/ngram-capped, connected-components cluster count,
    // with the hot-bucket caps visibly engaged by a planted
    // mega-cluster (non-zero cap_drops in this record). Campaign-gated
    // (not in the default driver phases): the ngram shingle self-join
    // over ~90M shingle rows is minutes of work by design.
    var dedupSoak = ""
    if (phases.contains('H')) {
      import lucy.pipeline.Dedup
      import org.apache.spark.sql.functions.{col, udf}
      val planted = sys.env.get("SPARK_GRAFT_DEDUP_DOCS").map(_.toLong).getOrElse(999996L)
      val mega = sys.env.get("SPARK_GRAFT_DEDUP_MEGA").map(_.toLong).getOrElse(20000L)
      val d = timed("dedup_soak_gen") {
        val c = lucy.fixtures.NearDupGen.corpus(spark, planted, mega, cpus.toInt * 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count()
        c
      }
      val clusterUdf = udf((id: Long) => lucy.fixtures.NearDupGen.clusterOf(id))
      val truePairs = lucy.fixtures.NearDupGen.truePairs(planted)
      // (total plantedPairs, intra-cluster plantedPairs) for a pair frame,
      // mega docs excluded — they are exact-dedup's domain and capped here
      def pairStats(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val p = pairs.filter(col("a") < planted && col("b") < planted)
          .withColumn("ca", clusterUdf(col("a")))
          .withColumn("cb", clusterUdf(col("b")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val total = p.count()
        val intra = p.filter(col("ca") === col("cb")).count()
        p.unpersist()
        (total, intra)
      }
      val mhPairs = timed("dedup_soak_minhash") {
        val p = Dedup.minhashLshCandidates(d, n = 3, numPerms = 16, threshold = 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p
      }
      val (mhTotal, mhIntra) = pairStats(mhPairs)
      val (shTotal, shIntra) = {
        val p = timed("dedup_soak_simhash") {
          val x = Dedup.simhashPairs(d, maxHamming = 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          x.count(); x
        }
        val s = pairStats(p); p.unpersist(); s
      }
      // wide-radius simhash (r6, Manku block tables): same corpus, the
      // Hamming <= 6 regime the 4-chunk scheme cannot reach. 84 tables
      // -> an 84x linear row multiplier instead of the old scheme's
      // n^2/65536 within-bucket blow-up; the soak records whether the
      // wider radius recovers recall at the planted mutation rate.
      val (swTotal, swIntra) = {
        val p = timed("dedup_soak_simhash_wide") {
          val x = Dedup.simhashPairsWide(d, maxHamming = 6)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          x.count(); x
        }
        val s = pairStats(p); p.unpersist(); s
      }
      val (ngTotal, ngIntra) = {
        val p = timed("dedup_soak_ngram") {
          val x = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5, maxShingleDf = 1000)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          x.count(); x
        }
        val s = pairStats(p); p.unpersist(); s
      }
      // ADVICE r5 #3: clustering consumes the est_jaccard >= 0.5 subset,
      // so record THAT set's recall/precision alongside the raw candidate
      // numbers (which are now labeled for what they are).
      val (mhfTotal, mhfIntra) = pairStats(mhPairs.filter(col("est_jaccard") >= 0.5))
      val nClusters = timed("dedup_soak_clusters") {
        Dedup.nearDupClusters(mhPairs.filter(col("est_jaccard") >= 0.5))
          .select(col("cluster")).distinct().count()
      }
      mhPairs.unpersist()
      d.unpersist()
      Dedup.releaseCaches()
      dedupSoak = s""""dedup_soak":{"planted_docs":$planted,"mega_docs":$mega,""" +
        s""""true_pairs":$truePairs,""" +
        s""""minhash_pairs":$mhTotal,"minhash_recall":${num("%.4f", mhIntra.toDouble / truePairs)},""" +
        s""""minhash_precision":${num("%.4f", if (mhTotal == 0) 0.0 else mhIntra.toDouble / mhTotal)},""" +
        s""""minhash_filtered_pairs":$mhfTotal,""" +
        s""""minhash_filtered_recall":${num("%.4f", mhfIntra.toDouble / truePairs)},""" +
        s""""minhash_filtered_precision":${num("%.4f", if (mhfTotal == 0) 0.0 else mhfIntra.toDouble / mhfTotal)},""" +
        s""""simhash_pairs":$shTotal,"simhash_recall":${num("%.4f", shIntra.toDouble / truePairs)},""" +
        s""""simhash_wide_pairs":$swTotal,""" +
        s""""simhash_wide_recall":${num("%.4f", swIntra.toDouble / truePairs)},""" +
        s""""simhash_wide_precision":${num("%.4f", if (swTotal == 0) 0.0 else swIntra.toDouble / swTotal)},""" +
        s""""ngram_pairs":$ngTotal,"ngram_recall":${num("%.4f", ngIntra.toDouble / truePairs)},""" +
        s""""ngram_precision":${num("%.4f", if (ngTotal == 0) 0.0 else ngIntra.toDouble / ngTotal)},""" +
        s""""clusters_found":$nClusters},"""
    }

    // Phase I (r6, VERDICT r5 next-round #3): dedup-pairs multi-probe
    // soak — embeddingCosinePairsLsh under the PINNED saturated 2×30-bit
    // geometry (the n = 10^12 lshParamsFor shape, same as the
    // ann_lsh_probe harness entry), probeBits = 0 vs 4, over a planted
    // vector-PAIR corpus (VecGen.pairedVectors) whose ground truth is
    // linear to compute: recall is against the planted pairs whose EXACT
    // cosine clears the threshold, standing in for the O(n²) exact path
    // at soak scale. Records wall, pair counts, recall, and (via the
    // global CapStats collection below) any hot-bucket drops — the
    // corpus-side ×2^probeBits cost multiplier, actually measured.
    var embDedup = ""
    if (phases.contains('I')) {
      import lucy.fixtures.VecGen
      import lucy.pipeline.{Dedup, Similarity}
      import org.apache.spark.sql.functions.col
      val nPairs = sys.env.get("SPARK_GRAFT_EMBDEDUP_PAIRS").map(_.toLong).getOrElse(500000L)
      val thresh = 0.95
      val vecs = timed("embdedup_gen") {
        val v = VecGen.pairedVectors(spark, nPairs, parts = cpus.toInt * 2).cache()
        v.count()
        v
      }
      // linear ground truth: exact cosine of each planted (2m, 2m+1) pair
      val truth = timed("embdedup_truth") {
        val even = vecs.filter(col("vec_id") % 2 === 0)
          .select((col("vec_id") / 2).cast("long").as("m"), col("embedding").as("va"))
        val odd = vecs.filter(col("vec_id") % 2 === 1)
          .select((col("vec_id") / 2).cast("long").as("m"), col("embedding").as("vb"))
        val t = even.join(odd, Seq("m"))
          .filter(Similarity.cosineCol(col("va"), col("vb")) >= thresh)
          .select((col("m") * 2).as("a"), (col("m") * 2 + 1).as("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t.count()
        t
      }
      val truthN = truth.count()
      def runProbe(pb: Int, label: String): (Long, Long) = {
        val pairs = timed(label) {
          val p = Dedup.embeddingCosinePairsLsh(vecs, thresh,
            numPlanes = 60, bandBits = 30, corpusCount = nPairs * 2, probeBits = pb)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count(); p
        }
        val found = pairs.count()
        val hit = pairs.join(truth, Seq("a", "b"), "left_semi").count()
        pairs.unpersist()
        (found, hit)
      }
      val (f0, h0) = runProbe(0, "embdedup_probe0")
      val (f4, h4) = runProbe(4, "embdedup_probe4")
      truth.unpersist()
      vecs.unpersist()
      lucy.pipeline.Dedup.releaseCaches()
      embDedup = s""""emb_dedup_probe":{"pairs_planted":$truthN,""" +
        s""""probe0_pairs":$f0,"probe0_recall":${num("%.4f", h0.toDouble / truthN)},""" +
        s""""probe4_pairs":$f4,"probe4_recall":${num("%.4f", h4.toDouble / truthN)}},"""
    }

    // No-silent-caps evidence in the acceptance record (r4; collected
    // AFTER every phase since r5 so the soak's engaged caps and any
    // propagation non-convergence show up too): every capped operator
    // that ran reports its drop accounting.
    val capDrops = lucy.pipeline.CapStats.all.map { d =>
      s""""drops_${d.op}":${d.droppedBuckets}"""
    }.mkString(",")

    val total = timings("index_build") + timings("queries_sequential") +
      timings("queries_concurrent") + timings.getOrElse("harness_total", 0.0)
    val qs = timings.map { case (k, v) => s""""$k":${num("%.3f", v)}""" }
      .mkString("{", ",", "}")
    val capField = if (capDrops.isEmpty) "" else s""""cap_drops":{$capDrops},"""
    println(s"""{"metric":"total","value":${num("%.3f", total)},"unit":"sec",""" +
      s""""queries":$qs,$capField$annRecall$storeStats$dedupSoak$embDedup""" +
      s""""sf":"$sfDir","cpus":$cpus,"bench_docs":${manifest.docs},""" +
      s""""postings":${manifest.postings},"docs_per_sec":${num("%.1f", docsPerSec)},""" +
      s""""qps_sequential":${num("%.2f", seqQps)},""" +
      s""""qps_concurrent":${num("%.2f", concQps)}}""")
    spark.stop()
  }
}
