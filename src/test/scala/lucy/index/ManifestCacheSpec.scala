package lucy.index

import org.apache.hadoop.fs.Path
import lucy.SparkFunSuite

/** ADVICE r6 #2: the manifest read cache is keyed on the _SUCCESS
  * modification time, so an out-of-band rewrite of a completed
  * manifest (another process; delete+recreate with no readBuild in
  * the gap) is observed on the next read instead of served stale.
  */
class ManifestCacheSpec extends SparkFunSuite {

  private def writeRaw(dir: String, m: BuildManifest, mtime: Long): Unit = {
    val d = new Path(dir + "/meta/build")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(d, true)
    fs.mkdirs(d)
    val out = fs.create(new Path(d, "part-00000.json"), true)
    val json = s"""{"fingerprint":"${m.fingerprint}","docs":${m.docs},""" +
      s""""avgdl":${m.avgdl},"postings":${m.postings},"blocks":${m.blocks},""" +
      s""""numPartitions":${m.numPartitions},"saltDfThreshold":${m.saltDfThreshold},""" +
      s""""lang":"${m.lang}","docmapMs":0,"statsMs":0,"segmentsMs":0,"totalMs":0}"""
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
    val succ = new Path(d, "_SUCCESS")
    fs.create(succ, true).close()
    fs.setTimes(succ, mtime, -1)
  }

  test("out-of-band manifest rewrite invalidates the read cache (mtime mismatch)") {
    val dir = java.nio.file.Files.createTempDirectory("manifest-cache").toString
    def m(docs: Long) = BuildManifest("fp", docs, 1.0, 10, 1, 4, 1L << 20, "en",
      0, 0, 0, 0)
    writeRaw(dir, m(111), 1000000L)
    assert(Manifest.readBuild(spark, dir).get.docs == 111)
    // rewrite OUT OF BAND (not via Manifest.writeBuild, so the cache is
    // not refreshed by the writer) with a different mtime
    writeRaw(dir, m(222), 2000000L)
    assert(Manifest.readBuild(spark, dir).get.docs == 222,
      "stale cache entry served after out-of-band rewrite")
    // deletion is still observed immediately
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir + "/meta/build"), true)
    assert(Manifest.readBuild(spark, dir).isEmpty)
  }
}
