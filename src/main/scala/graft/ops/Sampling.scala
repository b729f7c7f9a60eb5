package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators for training-data pipelines: deterministic
  * stratified down-sampling (mixture weighting) and greedy sequence packing
  * (token-budget binning). Both are exactly reproducible — no RNG state, no
  * partition-order sensitivity — so the same inputs give the same sample and
  * the same packing on any cluster size, and both are mirrored in DuckDB SQL
  * for the oracle.
  */
object Sampling {

  /** Keep the `n` lowest-`mix64(id)` rows per stratum — hash-ordered
    * "random" sampling with a deterministic, seed-free rank. This is the
    * mixture-weighting primitive: set per-stratum `n` proportional to the
    * target mixture and the sample follows it exactly.
    *
    * Scale shape: one hash shuffle on the stratum key; rank keys are computed
    * map-side by a codegen'd kernel. For strata far larger than `n`, swap the
    * full window rank for a per-partition top-n pre-filter (the standard
    * top-k-per-group optimization) — same semantics, bounded shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(graft.functions.TextHashes.mix64_col(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Greedy contiguous sequence packing: within each group (ordered by id),
    * documents accumulate into the current sequence until the next one would
    * exceed `budget` tokens, then a new sequence starts. A single document
    * larger than the budget gets its own sequence. Output adds `seq_idx`
    * (0-based per group).
    *
    * The scan is inherently sequential per group — the Spark shape is one
    * shuffle on the group key, then a linear pass per group inside
    * `flatMapGroups` (sorted in-memory; a group is a conversation, bounded
    * by conversation length, not corpus size). Packing across groups stays
    * embarrassingly parallel. */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("long"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.toArray.sortBy(_._2)
        var acc = 0L
        var bin = 0L
        rows.iterator.map { case (_, id, tok) =>
          if (acc > 0 && acc + tok > budget) { bin += 1; acc = 0 }
          acc += tok
          (g, id, tok, bin)
        }
      }
      .toDF(groupCol, idCol, tokensCol, "seq_idx")
  }

  /** Best-fit-decreasing packing: same grouping and output shape as
    * [[packSequences]], but documents sort by token count DESCENDING (id
    * tie-break) and each lands in the fullest already-open sequence that
    * still fits, else opens a new one. Trades the greedy path's document
    * order preservation for strictly-no-worse fill (the classic BFD bound:
    * ≤ 11/9·OPT + 6/9 bins); use when sequences need no intra-group document
    * order (e.g. packing independent documents, not conversation turns).
    *
    * Deterministic (sort + first-best tie-break), no RNG. The per-group scan
    * is O(docs × open bins) — fine for conversation-sized groups; a TreeMap
    * keyed by remaining capacity makes it O(docs log bins) if groups grow. */
  def packSequencesBfd(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("long"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.toArray.sortBy(r => (-r._3, r._2))
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        rows.iterator.map { case (_, id, tok) =>
          var best = -1
          var bestRem = Long.MaxValue
          var i = 0
          while (i < remaining.length) {
            val r = remaining(i)
            if (r >= tok && r < bestRem) { best = i; bestRem = r }
            i += 1
          }
          val bin =
            if (best >= 0) { remaining(best) -= tok; best }
            else { remaining += math.max(budget - tok, 0L); remaining.length - 1 }
          (g, id, tok, bin.toLong)
        }
      }
      .toDF(groupCol, idCol, tokensCol, "seq_idx")
  }
}
