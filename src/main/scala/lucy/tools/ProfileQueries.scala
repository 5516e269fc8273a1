package lucy.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import lucy.fixtures.PagesGen
import lucy.index.{IndexBuilder, IndexConfig, LucyIndex}
import lucy.query.{QueryEngine, QuerySet}

/** Ad-hoc latency attribution for the warm query path (round-2 perf
  * work). Runs the reference query set against a warm engine and prints,
  * per query: wall time, number of Spark jobs, scheduler-reported task
  * time, and the gap (driver/planning overhead). Not part of the test
  * suite; run with `sbt "runMain lucy.tools.ProfileQueries"`.
  */
object ProfileQueries {

  final class JobMeter extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var jobWallMs = 0L
    private var jobStart = Map.empty[Int, Long]
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      jobs += 1; jobStart += j.jobId -> j.time
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobStart.get(j.jobId).foreach(t0 => jobWallMs += j.time - t0)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskMs = 0; jobWallMs = 0; jobStart = Map.empty
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val docs = sys.env.getOrElse("PROFILE_DOCS", "270000").toLong
    val aqe = sys.env.getOrElse("PROFILE_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idxDir = s"/tmp/lucy-profile-idx-$docs"
    val m = IndexBuilder.build(PagesGen.pages(spark, docs, cpus.toInt * 2), idxDir,
      IndexConfig(saltDfThreshold = 1L << 16, maxSalts = 16))
    println(s"index: ${m.docs} docs, ${m.postings} postings (aqe=$aqe)")

    val engine = new QueryEngine(spark, LucyIndex(idxDir)).warm()
    val meter = new JobMeter
    spark.sparkContext.addSparkListener(meter)

    // warm-up pass
    QuerySet.reference.foreach(q => engine.search(q.query, q.mode, q.k).collect())

    println(f"${"query"}%-16s ${"wall_ms"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskMs"}%7s ${"jobWall"}%8s")
    QuerySet.reference.foreach { q =>
      meter.reset()
      val t0 = System.nanoTime()
      engine.search(q.query, q.mode, q.k).collect()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(50) // let listener drain
      println(f"${q.id}%-16s $wall%8.1f ${meter.jobs}%5d ${meter.stages}%6d ${meter.tasks}%6d ${meter.taskMs}%7d ${meter.jobWallMs}%8d")
    }
    spark.stop()
  }
}
