package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond vanilla equi-joins: as-of joins and skew-salted joins.
  * Both compose built-in operators (SURVEY.md §7.4 — preference (a): no custom
  * strategy needed), with shuffle structure chosen for 100 TB inputs.
  */
object Joins {

  /** As-of join: for each left row, attach the latest right row with the same
    * key and right.ts <= left.ts.
    *
    * Implementation: union the two sides tagged by origin, one window pass
    * ordered by (ts, origin) per key carrying `last(right value)` forward —
    * a single range-shuffle + sort, NO join node at all. This beats the
    * windowed-self-join formulation at scale: each side is shuffled exactly
    * once and skew splits by the range partitioner.
    *
    * `rightCols` are the value columns to carry; they appear suffixed "_asof".
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightCols: Seq[String]): DataFrame = {
    // values are wrapped in single-field structs: the struct is non-null for
    // every right row even when the value itself is null, so last(ignoreNulls)
    // picks the latest right ROW (ASOF semantics), not the latest non-null value
    val leftTagged = left
      .withColumn("__src", lit(1))
      .withColumns(rightCols.map(c =>
        s"__v_$c" -> lit(null).cast(s"struct<v:${right.schema(c).dataType.sql}>")).toMap)
    val rightTagged = right
      .select((Seq(col(keyCol), col(tsCol)) ++ rightCols.map(col)): _*)
      .withColumn("__src", lit(0))
      .withColumns(rightCols.map(c => s"__v_$c" -> struct(col(c).as("v"))).toMap)
      .drop(rightCols: _*)
    val leftCols = left.columns
    val unioned = leftTagged.select(
      (leftCols.map(col) ++ Seq(col("__src")) ++ rightCols.map(c => col(s"__v_$c"))): _*)
      .unionByName(
        rightTagged.select(
          (leftCols.map(c => if (c == keyCol || c == tsCol) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) ++
            Seq(col("__src")) ++ rightCols.map(c => col(s"__v_$c"))): _*))
    // right rows sort before left rows at equal ts (__src 0 < 1): <= semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"${c}_asof",
        last(col(s"__v_$c"), ignoreNulls = true).over(w).getField("v"))
    }
    carried.filter(col("__src") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"${c}_asof"))): _*)
  }

  /** Skew-salted equi-join: replicate the (small) right side `salt` times and
    * scatter the left side across the replicas, so one hot key spreads over
    * `salt` reducers instead of melting a single one. AQE's skew-join split is
    * the runtime fallback; explicit salting is the planned-for-it version.
    *
    * The salt is a CONTENT hash of the left row (`saltCols`, defaulting to
    * every hashable left column), so row→partition placement is stable across
    * task retries (rand() re-draws on retry and can double-place or drop rows
    * under speculative execution). Hashing the join key alone would be a
    * no-op — every row of the hot key would land in one salt bucket — so the
    * payload columns must participate. Content determinism has one corollary:
    * byte-identical duplicate rows co-locate by construction. A corpus whose
    * hot key is dominated by FULL duplicates should pass a unique row id as
    * `saltCols` (or exact-dedup first — this engine's pipelines do). */
  def salted(
      left: DataFrame, right: DataFrame,
      key: String, salt: Int = 8, saltCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    // xxhash64 rejects MapType ANYWHERE in a column's type tree — exclude such
    // columns from the default salt input instead of failing analysis
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => containsMap(a.elementType)
      case st: StructType => st.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
    val hashable =
      if (saltCols.nonEmpty) saltCols
      else left.schema.fields.collect {
        case f if !containsMap(f.dataType) => f.name
      }.toSeq
    require(hashable.nonEmpty, "salted join needs at least one hashable salt column")
    // a salt that is a pure function of the join key puts the whole hot key in
    // ONE bucket — the exact melt this operator exists to prevent — while still
    // paying the salt-fold right-side replication. Refuse instead of silently
    // degrading; the caller adds a unique id (or any payload column) to fix it.
    require(saltCols.nonEmpty || hashable != Seq(key),
      s"left side has no hashable non-key columns: a key-only salt cannot " +
        s"spread the hot key — pass saltCols with a unique row id")
    val saltedLeft = left.withColumn(
      "__salt", pmod(xxhash64(hashable.map(col): _*), lit(salt.toLong)))
    val explodedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}
