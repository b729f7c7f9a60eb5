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
    * Scale shape (round 6): a map-side per-partition top-n pre-filter (the
    * standard top-k-per-group optimization) runs BEFORE the stratum-key
    * shuffle — each input partition forwards at most `n` rows per stratum
    * it sees, so the exchange volume is bounded by
    * `partitions × strata × n` instead of the corpus size; for strata far
    * larger than `n` (the mixture-weighting regime) that is the difference
    * between shuffling everything and shuffling the sample. The window rank
    * then runs exactly as before over the surviving superset — any row in
    * the global top-n of its stratum is in the top-n of its partition under
    * the same (mix64, id) total order, so results are identical. The
    * pre-filter needs a partition-local id ordering that matches the
    * window's (strings compare by UTF-8 bytes, like UTF8String); id types
    * outside the supported set skip the pre-filter and keep the plain
    * window plan. Per-partition state: distinct-strata-in-partition × n
    * buffered rows. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String, n: Int): DataFrame = {
    val keyed = df.withColumn("__rk", graft.functions.TextHashes.mix64_col(col(idCol)))
    val schema = keyed.schema
    val rkIdx = schema.fieldIndex("__rk")
    val idIdx = schema.fieldIndex(idCol)
    val stIdx = schema.fieldIndex(stratumCol)
    val pre = idOrdering(schema(idIdx).dataType) match {
      case Some(idOrd) =>
        val rowOrd: Ordering[org.apache.spark.sql.Row] =
          Ordering.by[org.apache.spark.sql.Row, Long](_.getLong(rkIdx))
            .orElse(Ordering.by[org.apache.spark.sql.Row, Any](_.get(idIdx))(idOrd))
        keyed.mapPartitions { it =>
          val heaps = scala.collection.mutable.HashMap
            .empty[Any, scala.collection.mutable.PriorityQueue[org.apache.spark.sql.Row]]
          it.foreach { row =>
            val heap = heaps.getOrElseUpdate(row.get(stIdx),
              scala.collection.mutable.PriorityQueue.empty(rowOrd)) // max-heap
            if (heap.size < n) heap += row
            else if (rowOrd.compare(row, heap.head) < 0) { heap.dequeue(); heap += row }
          }
          heaps.valuesIterator.flatMap(_.iterator)
        }(org.apache.spark.sql.Encoders.row(schema))
      case None => keyed
    }
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("__rk"), col(idCol))
    pre.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn", "__rk")
  }

  /** Partition-local ordering matching Spark's sort order for the id type —
    * strings by UTF-8 bytes (UTF8String.binaryCompare), integral/floating
    * types naturally. None ⇒ the caller skips the pre-filter. */
  private def idOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | TimestampType | DateType =>
        Some(Ordering.by { v: Any =>
          v match {
            case l: Long => l
            case i: Int => i.toLong
            case s: Short => s.toLong
            case b: Byte => b.toLong
            case t: java.sql.Timestamp => t.getTime
            case d: java.sql.Date => d.getTime
            case _ => 0L
          }
        })
      case DoubleType | FloatType =>
        Some(Ordering.by { v: Any =>
          v match { case d: Double => d; case f: Float => f.toDouble; case _ => 0.0 }
        })
      case StringType =>
        Some(new Ordering[Any] {
          def compare(a: Any, b: Any): Int = {
            val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            java.util.Arrays.compareUnsigned(x, y)
          }
        })
      case _ => None
    }
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
