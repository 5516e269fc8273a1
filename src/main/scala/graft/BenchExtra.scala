package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import lucy.fixtures.{PagesGen, VecGen}
import lucy.index.{IndexBuilder, IndexConfig}

/** r7 optimization-round measurement harness (guide §1.4: noop-sink /
  * isolated timings). NOT part of the frozen driver contract — Bench
  * stays the official record; numbers from here are cited in
  * OPTIMIZATION_r07.md as isolation evidence only.
  *
  * Usage: sbt "runMain graft.BenchExtra <phase> [args...]"
  *   build [n]        — two builds into fresh dirs, per-stage ms from manifest
  *   store [n]        — bootstrap n + 5 puts of n/20 + compact (no LucyStore warm)
  *   ivf [n]          — assignment-only noop + train + full flat IVF at n vectors
  *   brute [n]        — bruteCosineTopK over n vectors, 16 queries
  *   harness <names…> — time each named SparkEntry query 3× (count())
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_AQE").foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    if (sys.env.contains("SPARK_GRAFT_JOBLOG"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
          println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      })
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(name)
      val r = f
      println(f"[extra] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.headOption.getOrElse("build") match {
      case "build" =>
        val n = args.lift(1).map(_.toLong).getOrElse(300000L)
        val root = Files.createTempDirectory("r7-extra-build").toString
        for (s <- 1 to 2) {
          val m = timed(s"build_s$s") {
            IndexBuilder.build(PagesGen.pages(spark, n, cpus.toInt * 2), s"$root/idx$s",
              IndexConfig(saltDfThreshold = 1L << 16, maxSalts = 16))
          }
          println(s"[extra] build_s$s stages: docmap=${m.docmapMs}ms stats=${m.statsMs}ms " +
            s"segments=${m.segmentsMs}ms total=${m.totalMs}ms docs=${m.docs}")
        }

      case "store" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        import lucy.stream.IncrementalIndexer
        import spark.implicits._
        val root = Files.createTempDirectory("r7-extra-store").toString + "/store"
        timed("bootstrap")(IncrementalIndexer.bootstrap(
          PagesGen.pages(spark, n, cpus.toInt * 2), root))
        val batch = math.max(1000L, n / 20)
        timed("puts_5x") {
          for (b <- 0L until 5L) {
            val lo = n + b * batch
            val m = timed(s"put_$b")(IndexBuilder.build(
              spark.range(lo, lo + batch).as[Long].map(PagesGen.page _).toDF(),
              s"$root/deltas/delta-$b", IndexConfig(), fingerprint = s"delta-$b"))
            println(s"[extra] put_$b stages: docmap=${m.docmapMs}ms stats=${m.statsMs}ms " +
              s"segments=${m.segmentsMs}ms total=${m.totalMs}ms")
          }
        }
        timed("compact")(IncrementalIndexer.compact(spark, root))

      case "ivf" =>
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        import lucy.pipeline.Similarity
        val vecs = timed("gen") {
          val v = VecGen.vectors(spark, n, parts = cpus.toInt * 2).cache(); v.count(); v
        }
        val (dnl, _) = Similarity.ivfParamsFor(n, 16384)
        val centroids = timed("train")(Similarity.trainIvfCentroids(
          vecs, dnl, n, sampleCap = 16384, iters = 2))
        for (rep <- 1 to 2) {
          timed(s"assign_noop_old_$rep") {
            val assign = Similarity.assignUdfOld(centroids)
            noop(vecs.select(col("vec_id"), assign(col("embedding")).as("listId")))
          }
          timed(s"assign_noop_new_$rep") {
            val assign = Similarity.assignUdfFor(centroids)
            noop(vecs.select(col("vec_id"), assign(col("embedding")).as("listId")))
          }
        }
        val queries = vecs.filter(col("vec_id") < 16)
        timed("ivf_full") {
          Similarity.ivfCosineTopK(vecs, queries, k = 10, numLists = dnl,
            corpusCount = n, sampleCap = 16384, iters = 2).collect()
        }
        vecs.unpersist()

      case "brute" =>
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        import lucy.pipeline.Similarity
        val vecs = timed("gen") {
          val v = VecGen.vectors(spark, n, parts = cpus.toInt * 2).cache(); v.count(); v
        }
        val queries = vecs.filter(col("vec_id") < 16)
        for (s <- 1 to 2)
          timed(s"brute_s$s")(Similarity.bruteCosineTopK(vecs, queries, k = 10).collect())
        vecs.unpersist()

      case "storelive" =>
        // isolate the zero-gap first-search race: same shape as bench
        // phase G but with a SECOND store whose first search waits for
        // the background warm — separating the warm race from the
        // steady live-serving cost.
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        import lucy.query.QueryMode
        import spark.implicits._
        val batch = math.max(1000L, n / 20)
        def mk(tag: String): lucy.LucyStore = {
          val root = Files.createTempDirectory(s"r7-live-$tag").toString + "/store"
          val st = new lucy.LucyStore(spark, root)
          timed(s"${tag}_bootstrap")(st.bootstrap(PagesGen.pages(spark, n, cpus.toInt * 2)))
          timed(s"${tag}_puts") {
            for (b <- 0L until 5L) {
              val lo = n + b * batch
              st.put(spark.range(lo, lo + batch).as[Long].map(PagesGen.page _).toDF(), b)
            }
          }
          st
        }
        val qs = lucy.query.QuerySet.reference.take(5)
        val s1 = mk("zerogap")
        timed("zerogap_search5") {
          qs.zipWithIndex.foreach { case (q, i) =>
            timed(s"zerogap_q${i + 1}")(s1.search(q.query, q.mode, q.k).collect())
          }
        }
        s1.close()
        val s2 = mk("warmed")
        timed("warm_wait")(Thread.sleep(4000))
        timed("warmed_search5") {
          qs.zipWithIndex.foreach { case (q, i) =>
            timed(s"warmed_q${i + 1}")(s2.search(q.query, q.mode, q.k).collect())
          }
        }
        s2.close()

      case "harness" =>
        val names = args.drop(1)
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          for (s <- 1 to 3) timed(s"${name}_s$s")(fn(spark, sfDir).count())
        }

      case other => sys.error(s"unknown phase $other")
    }
    spark.stop()
  }
}
