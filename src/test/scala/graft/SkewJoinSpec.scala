package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join evidence (north rule: "AQE skew-join splitting"): a sort-merge
  * join with one pathological key must get its skewed partition split at
  * runtime rather than melting a single reducer. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds low enough that the test-sized skew triggers the optimization
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

      // left: 400k rows, 95% on key 7; right: uniform
      val left = spark.range(400000)
        .select(when(pmod(col("id"), lit(20)) < 19, lit(7L)).otherwise(col("id") % 100).as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(100).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // collect on the same Dataset so ITS AdaptiveSparkPlan finalizes
      // (count()/select() would build separate executions)
      val n = joined.collect().length
      assert(n == 400000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // AQE marks the split join: SortMergeJoin(skew=true) / "isSkew=true"
      assert(plan.contains("skew=true") || plan.contains("isSkew"), plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("salted join is deterministic across runs and spreads a hot key over salts") {
    import graft.ops.Joins
    val left = spark.range(2000)
      .select(lit(7L).as("k"), concat(lit("p-"), col("id")).as("v"))
    val right = spark.range(10).select(col("id").as("k"), lit("dim").as("d"))
    def run() = Joins.salted(left, right, "k", salt = 8)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val a = run()
    val b = run()
    assert(a == b) // rand()-based salting was retry/run nondeterministic
    assert(a.length == 2000)
    // the salt must come from the payload, not the key: a key-only hash would
    // put all 2000 hot-key rows in one bucket and the salting would be a no-op
    val salts = left
      .withColumn("__salt", pmod(xxhash64(left.columns.map(col): _*), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"hot key only spread over $salts of 8 salts")
  }
}
