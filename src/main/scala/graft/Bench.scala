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
    // carry the headline metrics); D/E/F are skippable so a 2-core
    // scaling rep doesn't pay the full operator sweep. Default = all.
    val phases = sys.env.getOrElse("SPARK_GRAFT_PHASES", "ABCDEF")

    // Phase D: harness operator sweep over the driver tables
    if (phases.contains('D')) timed("harness_total") {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        timed(s"h_$name") {
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        }
      }
    }

    // No-silent-caps evidence in the acceptance record (r4): every
    // capped operator that ran in phase D reports its drop accounting.
    val capDrops = lucy.pipeline.CapStats.all.map { d =>
      s""""drops_${d.op}":${d.droppedBuckets}"""
    }.mkString(",")

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
      timed("ann_ivf_1m") {
        Similarity.ivfCosineTopK(vecs, queries, k = 10, corpusCount = annN,
          sampleCap = 16384, iters = 2).count()
      }
      timed("ann_lsh_1m") {
        Similarity.lshCosineTopK(vecs, queries, k = 10, corpusCount = annN).count()
      }
      // two-level quantizer (r4): k1=k2=n^(1/4) → same √n cell count as
      // the flat path at (k1+k2)·d assignment cost — the 10^12 shape
      timed("ann_ivf2_1m") {
        Similarity.ivfTwoLevelTopK(vecs, queries, k = 10, corpusCount = annN,
          sampleCap = 16384, iters = 2).count()
      }
      vecs.unpersist()
    }

    // Locale.ROOT: default-locale "%.3f" yields comma decimals under e.g.
    // de_DE and would crash .toDouble after all phases complete (ADVICE r1)
    def num(fmt: String, v: Double): Double =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v)).toDouble
    val total = timings("index_build") + timings("queries_sequential") +
      timings("queries_concurrent") + timings.getOrElse("harness_total", 0.0)
    val qs = timings.map { case (k, v) => s""""$k":${num("%.3f", v)}""" }
      .mkString("{", ",", "}")
    val capField = if (capDrops.isEmpty) "" else s""""cap_drops":{$capDrops},"""
    println(s"""{"metric":"total","value":${num("%.3f", total)},"unit":"sec",""" +
      s""""queries":$qs,$capField"sf":"$sfDir","cpus":$cpus,"bench_docs":${manifest.docs},""" +
      s""""postings":${manifest.postings},"docs_per_sec":${num("%.1f", docsPerSec)},""" +
      s""""qps_sequential":${num("%.2f", seqQps)},""" +
      s""""qps_concurrent":${num("%.2f", concQps)}}""")
    spark.stop()
  }
}
