package graft.spark

import graft.core.{ExtractedTurn, Turn}
import graft.extract.Extractor
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The production extraction job, Spark-first:
  *
  *   scan (Iceberg/parquet, column-pruned, partition-pruned)
  *     → repartitionByRange(conv_id, turn_idx)      // skew-safe: a mega-conversation
  *                                                  // splits across partitions by
  *                                                  // turn_idx ranges, no salt needed
  *                                                  // for this stateless map stage
  *     → sortWithinPartitions(conv_id, turn_idx)    // stable turn ordering
  *     → mapPartitions(Extractor.extractTurn)       // the hot per-row state machines
  *     → sink (idempotent MERGE-keyed on (conv_id, turn_idx) in Iceberg; parquet
  *       append + manifest in this sandbox)
  *
  * Because turns are independent (the reference's page loop is sequential only as
  * an artifact of its promise chain — pdfToSvg.js:65-89), the only cross-row
  * requirement is *ordering* of the output, which range partitioning + within-
  * partition sort provides without a global sort barrier. At 100 TB the plan is:
  * one shuffle (the range exchange), then a single pipelined map stage; AQE
  * coalesces small partitions and splits skewed ones.
  */
object Pipeline {

  def readTurns(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(path).as[Turn]
  }

  /** Core extraction: ordered, skew-safe, one shuffle. */
  def extractTurns(ds: Dataset[Turn], numPartitions: Option[Int] = None): Dataset[ExtractedTurn] =
    extractTurnsEncoding(ds, identity, numPartitions)

  /** Extraction with a per-row payload step fused AFTER the range exchange
    * (guide §2.3/§8: shuffle the lightweight rows, run payload expansion in
    * the post-exchange map stage). Two effects versus mapping `encode` before
    * [[extractTurns]]: the exchange carries the raw text instead of the
    * (larger) encoded payload, and the RangePartitioner's sampling pass — a
    * full extra evaluation of the child plan — samples cheap raw rows instead
    * of re-running the encode. The row set is identical either way: `encode`
    * is per-row and the sort keys (conv_id, turn_idx) don't depend on it. */
  def extractTurnsEncoding(ds: Dataset[Turn], encode: Turn => Turn,
      numPartitions: Option[Int] = None): Dataset[ExtractedTurn] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val parts = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    ds.repartitionByRange(parts, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .mapPartitions(_.map(t => Extractor.extractTurn(encode(t))))
  }

  /** Ordering invariant check (BASELINE.json north_rule): row_number over
    * (conv_id ORDER BY turn_idx) must equal the dense per-conversation index.
    * Returns the violation count — 0 on a healthy table. */
  def orderingViolations(ds: Dataset[ExtractedTurn]): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    ds.toDF()
      .withColumn("rn", row_number().over(w))
      .withColumn("expected", dense_rank().over(w))
      .filter(col("rn") =!= col("expected"))
      .count()
  }

  /** One-pass extraction metrics for the manifest (SURVEY.md §2.10). */
  def metrics(ds: Dataset[ExtractedTurn]) = {
    ds.toDF().agg(
      count(lit(1)).as("turns"),
      sum(length(col("extracted_text"))).as("chars"),
      sum(col("metrics.runs")).as("runs"),
      sum(col("metrics.dropped_nodes")).as("dropped_nodes"),
      approx_count_distinct(col("conv_id")).as("approx_convs"))
  }
}
