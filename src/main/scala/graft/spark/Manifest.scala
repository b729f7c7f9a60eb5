package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume manifest: one row per completed input partition with lineage
  * (input snapshot id, partition spec value, row counts, extraction metrics,
  * wall-clock). Reruns anti-join the pending partition list against completed
  * manifest entries, so the job resumes idempotently.
  *
  * Production target is Iceberg `MERGE INTO manifest ON part` (SURVEY.md §7.5);
  * this sandbox has no Iceberg runtime jar, so the same semantics are implemented
  * as parquet append + latest-wins dedupe on read (window over run_ts). The
  * call-sites are format-agnostic: swap `write`/`read` for the Iceberg catalog
  * and nothing else changes.
  */
object Manifest {

  val schemaCols: Seq[String] =
    Seq("part", "snapshot_id", "rows", "chars", "status", "run_ts")

  def read(spark: SparkSession, path: String): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "part STRING, snapshot_id STRING, rows BIGINT, chars BIGINT, status STRING, run_ts TIMESTAMP"))
    try {
      val raw = spark.read.parquet(path)
      // latest-wins per partition key = MERGE semantics on read
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("part")).orderBy(col("run_ts").desc)
      raw.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    } catch {
      case _: org.apache.spark.sql.AnalysisException => empty // no manifest yet
    }
  }

  def append(df: DataFrame, path: String): Unit =
    df.select(schemaCols.map(col): _*).write.mode(SaveMode.Append).parquet(path)

  /** Partitions still to process: all input partitions minus completed ones. */
  def pending(allParts: DataFrame, manifest: DataFrame): DataFrame =
    allParts.join(
      manifest.filter(col("status") === "done").select("part"),
      Seq("part"), "left_anti")
}
