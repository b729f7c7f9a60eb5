package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-story evidence: pre-bucketed tables co-locate their join — zero
  * exchange at read time. At 100 TB this is the difference between a join that
  * shuffles the corpus and one that streams bucket-aligned splits (the
  * extracted-output table is written bucketed by conv_id for exactly this). */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("join on bucketed tables has no shuffle exchange") {
    import spark.implicits._
    // warehouse dir is a static conf — use the session default (spark-warehouse/)
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")

    (1L to 1000L).map(i => (i % 50, s"conv_$i", i)).toDF("k", "conv", "v")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("graft_bucketed_a")
    (0L until 50L).map(i => (i, s"meta_$i")).toDF("k", "meta")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("graft_bucketed_b")

    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "k")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
