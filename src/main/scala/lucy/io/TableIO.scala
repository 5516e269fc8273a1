package lucy.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-format abstraction (SURVEY.md §1.4, SRC1/SRC2).
  *
  * The engine's semantics are format-agnostic; at 10^12-document scale
  * the corpus lives in Iceberg (hidden partitioning on days(warc_ts) +
  * bucket(N, url), snapshot-pinned resumable reads, metadata-only
  * pruning), while this sandbox has no Iceberg runtime jar — so Parquet
  * is the tested implementation and Iceberg the same calls behind a
  * format switch, activated when `iceberg-spark-runtime` is on the
  * classpath and the catalog is configured.
  */
trait TableIO {
  def readPages(spark: SparkSession, table: String): DataFrame
  def writeTable(df: DataFrame, table: String): Unit
}

/** Offline/test implementation — plain parquet paths. */
object ParquetTableIO extends TableIO {
  def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
  def writeTable(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}

/** Iceberg implementation: `table` is a catalog table name. Reads pin a
  * snapshot when `snapshotId` is set, which is what makes a resumed
  * build re-read IDENTICAL input (the build manifest records the
  * snapshot id as its fingerprint). Untestable offline (no runtime jar
  * in /opt/spark/jars — verified); code path kept minimal and symmetric
  * with the parquet one.
  */
class IcebergTableIO(snapshotId: Option[Long] = None) extends TableIO {
  def readPages(spark: SparkSession, table: String): DataFrame = {
    val r = spark.read.format("iceberg")
    snapshotId.fold(r)(id => r.option("snapshot-id", id.toString)).load(table)
  }
  def writeTable(df: DataFrame, table: String): Unit =
    df.writeTo(table).createOrReplace()
}

object TableIO {
  /** Pick by config: spark.lucy.tableFormat = parquet (default) | iceberg. */
  def forSession(spark: SparkSession): TableIO =
    spark.conf.getOption("spark.lucy.tableFormat") match {
      case Some("iceberg") => new IcebergTableIO()
      case _               => ParquetTableIO
    }
}
