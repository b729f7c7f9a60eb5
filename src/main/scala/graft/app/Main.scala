package graft.app

import graft.spark.{Manifest, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entrypoint for the production extraction job.
  *
  * Usage:
  *   spark-submit --class graft.app.Main <jar> \
  *     --input <transcript table path> --output <extracted table path> \
  *     --manifest <manifest path> [--partitions N] [--mode full|resume]
  *
  * Resume semantics: input partitions are bucketed by conv_id prefix; completed
  * buckets (manifest status=done for the same snapshot) are anti-joined away,
  * so reruns only process pending data, and the output write is idempotent per
  * (conv_id, turn_idx) — MERGE INTO in the Iceberg deployment, partition
  * overwrite here.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args)
    finally spark.stop()
  }

  /** Session-agnostic job body (tests drive it with their own session). */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts("--input")
    val output = opts("--output")
    val manifestPath = opts.getOrElse("--manifest", s"$output.manifest")
    val mode = opts.getOrElse("--mode", "full")
    val partitions = opts.get("--partitions").map(_.toInt)

    val snapshotId = opts.getOrElse("--snapshot", "latest")
    val buckets = opts.get("--buckets").map(_.toInt).getOrElse(64)

    val turnsAll = Pipeline.readTurns(spark, input)
      .withColumn("__bucket", pmod(xxhash64(col("conv_id")), lit(buckets)).cast("string"))

    val pendingBuckets: Set[String] =
      if (mode == "resume") {
        val done = Manifest.read(spark, manifestPath)
          .filter(col("status") === "done" && col("snapshot_id") === snapshotId)
          .select("part").collect().map(_.getString(0)).toSet
        (0 until buckets).map(_.toString).toSet -- done
      } else (0 until buckets).map(_.toString).toSet

    import spark.implicits._
    val pending = pendingBuckets.toSeq.sorted
    if (pending.nonEmpty) {
      // ONE pass over the input: all pending buckets extracted together and
      // split at write time via partitionBy — a per-bucket filter loop would
      // rescan the full table O(buckets) times (xxhash64(conv_id) pmod can't be
      // pushed down or pruned). Dynamic partition overwrite keeps the write
      // idempotent per bucket (Iceberg deployment: MERGE INTO keyed on
      // (conv_id, turn_idx)).
      val turns = turnsAll.filter(col("__bucket").isin(pending: _*))
        .drop("__bucket").as[graft.core.Turn]
      val extracted = Pipeline.extractTurns(turns, partitions)
        .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(buckets)).cast("string"))
      val outPath = new org.apache.hadoop.fs.Path(output)
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Write discipline per mode:
      //  - full: plain (static) overwrite replaces the whole dataset, which
      //    also clears any stale partitions (the Iceberg deployment does an
      //    atomic snapshot replace; vanilla Spark overwrite carries the
      //    standard replace window). Crucially there is NO pre-delete pass
      //    here: in full mode completed buckets DO have durable manifest
      //    entries, so deleting them up front would open an unrecoverable
      //    window — a crash mid-extraction would leave the data gone while
      //    resume considers every bucket done.
      //  - resume: dynamic overwrite only replaces partitions present in the
      //    new data, so a pending bucket whose extraction now yields zero
      //    rows would keep its stale files (and the metrics read below would
      //    count them). Pending buckets carry no manifest entry by
      //    definition, so pre-clearing exactly those is crash-safe: a rerun
      //    re-extracts them.
      if (mode == "resume" && fs.exists(outPath)) pending.foreach { b =>
        val p = new org.apache.hadoop.fs.Path(outPath, s"bucket=$b")
        if (fs.exists(p)) fs.delete(p, true)
      }
      val overwriteMode = if (mode == "resume") "dynamic" else "static"
      val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", overwriteMode)
      try extracted.write.mode("overwrite").partitionBy("bucket").parquet(output)
      finally prevMode match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // per-bucket metrics from the just-written files — never re-run extraction
      val ts = new java.sql.Timestamp(System.currentTimeMillis())
      val anyData = fs.exists(outPath) &&
        fs.listStatus(outPath).exists(_.getPath.getName.startsWith("bucket="))
      val counted: Map[String, (Long, Long)] =
        if (!anyData) Map.empty
        else spark.read.parquet(output)
          .filter(col("bucket").isin(pending: _*))
          .groupBy(col("bucket").cast("string").as("part"))
          .agg(count(lit(1)).as("rows"), coalesce(sum(length(col("extracted_text"))), lit(0L)).as("chars"))
          .collect()
          .map(r => r.getString(0) -> (r.getAs[Long]("rows"), r.getAs[Long]("chars"))).toMap
      // every pending bucket gets a 'done' row — zero-yield buckets included,
      // else they are re-extracted on every subsequent resume
      Manifest.append(
        pending.map { b =>
          val (n, c) = counted.getOrElse(b, (0L, 0L))
          (b, snapshotId, n, c, "done", ts)
        }.toDF("part", "snapshot_id", "rows", "chars", "status", "run_ts"),
        manifestPath)
    }
  }
}
