import org.apache.spark.sql.functions._
import lucy.pipeline.{Dedup, TextAnalysis, CapStats}
import lucy.fixtures.NearDupGen
import lucy.index.{IndexBuilder, IndexConfig, LucyIndex}
import lucy.query.{QueryEngine, QueryMode}

def timed[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"==T $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
}

val planted = sys.env.get("CURATION_DOCS").map(_.toLong).getOrElse(999996L) / 6 * 6
val docs = timed("gen") {
  val d = NearDupGen.corpus(spark, planted, 20000L, 64)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  d.count(); d
}
// 1) candidate pairs -> 2) clusters -> 3) keep-best canonicals
val pairs = timed("minhash_pairs") {
  val p = Dedup.minhashLshCandidates(docs, n = 3, numPerms = 16, threshold = 0.5)
    .filter(col("est_jaccard") >= 0.5)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  println(s"== pairs ${p.count()}"); p
}
val clusters = timed("clusters") {
  val c = Dedup.nearDupClusters(pairs)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  println(s"== clustered docs ${c.count()}"); c
}
val keep = timed("keep_best") {
  val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
  val k = Dedup.keepBest(clusters, q)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  println(s"== canonicals ${k.count()}"); k
}
// 4) survivors = singletons (never in the pair graph) + cluster canonicals
val survivors = timed("survivors") {
  val singles = docs.join(clusters.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
  val canon = docs.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")
  val s = singles.unionByName(canon).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  println(s"== surviving docs ${s.count()} of ${docs.count()}"); s
}
// 5) index the curated corpus and serve
val pages = survivors.select(
  col("doc_id").cast("string").as("url"),
  timestamp_seconds(col("doc_id")).as("warc_ts"),
  lit(null).cast("binary").as("html"), col("text"), lit("en").as("lang"))
val dir = "/dev/shm/e2e-curated-idx"
timed("index_build") { IndexBuilder.build(pages, dir, IndexConfig(lang = None)) }
val engine = timed("engine_warm") { new QueryEngine(spark, LucyIndex(dir)).warm() }
timed("queries") {
  // terms exist in the synthetic vocab: grab three real tokens first
  val terms = survivors.limit(1).select(col("text")).collect()(0).getString(0).split(" ").take(3)
  terms.foreach { t =>
    val n = engine.search(t, QueryMode.Or, 10).count()
    println(s"== query '$t' -> $n hits")
  }
}
println("== cap drops: " + CapStats.all.map(d => s"${d.op}=${d.droppedBuckets}").mkString(", "))
sys.exit(0)
