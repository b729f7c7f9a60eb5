package graft.spark

import graft.core.ExtractedTurn
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

final case class ExtractionStats(
    turns: Long, chars: Long, runs: Long, dropped: Long, maxChars: Long)

/** One-pass typed metrics bundle (`Aggregator[IN, BUF, OUT]` — SURVEY.md §4.3's
  * fused single-pass metric option): a single map-side-combined pass instead of
  * five column aggregates. */
object MetricsAgg extends Aggregator[ExtractedTurn, ExtractionStats, ExtractionStats] {
  override def zero: ExtractionStats = ExtractionStats(0, 0, 0, 0, 0)
  override def reduce(b: ExtractionStats, t: ExtractedTurn): ExtractionStats =
    ExtractionStats(
      b.turns + 1,
      b.chars + t.extracted_text.length,
      b.runs + t.metrics.runs,
      b.dropped + t.metrics.dropped_nodes,
      math.max(b.maxChars, t.extracted_text.length.toLong))
  override def merge(a: ExtractionStats, b: ExtractionStats): ExtractionStats =
    ExtractionStats(a.turns + b.turns, a.chars + b.chars, a.runs + b.runs,
      a.dropped + b.dropped, math.max(a.maxChars, b.maxChars))
  override def finish(r: ExtractionStats): ExtractionStats = r
  override def bufferEncoder: Encoder[ExtractionStats] = Encoders.product[ExtractionStats]
  override def outputEncoder: Encoder[ExtractionStats] = Encoders.product[ExtractionStats]

  def over(ds: Dataset[ExtractedTurn]): ExtractionStats =
    ds.select(MetricsAgg.toColumn).collect()(0)
}

/** Per-conversation rollups with explicit salt: the two-phase aggregation the
  * north rule calls for — phase 1 groups on (conv_id, salt) so a mega
  * conversation spreads over `salt` reducers (map-side combine applies), phase 2
  * merges the partials per conv_id. At 10^12 turns phase 2's input is bounded by
  * convs × salt rows, never by turns. */
object ConvRollup {
  def salted(ds: Dataset[ExtractedTurn], salt: Int = 16): DataFrame =
    ds.toDF()
      .withColumn("__salt", pmod(hash(col("turn_idx")), lit(salt)))
      .groupBy(col("conv_id"), col("__salt"))
      .agg(
        count(lit(1)).as("t"),
        sum(length(col("extracted_text"))).as("c"),
        max(col("turn_idx")).as("m"))
      .groupBy(col("conv_id"))
      .agg(
        sum(col("t")).as("turns"),
        sum(col("c")).as("chars"),
        max(col("m")).as("max_turn_idx"))
}
