package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q28's sweep ratio (VERDICT round-5 #6): splits
  * pack_sequences into its stages — token-kernel scan, conv-key exchange,
  * per-group sort+greedy scan — at 1× and the sweep factors, so the steep
  * ratio can be attributed to a stage instead of argued about.
  * Usage: Test/runMain graft.ProfileQ28 <sfDir> [factors…] */
object ProfileQ28 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.driver.memory", "16g")
      .appName("profile-q28").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    def stages(dir: String, label: String): Unit = {
      def docs = spark.read.parquet(s"$dir/documents.parquet")
      def proj = docs.select(
        pmod(col("doc_id"), lit(50)).as("conv"), col("doc_id"),
        graft.ops.TextStats.bpeishTokenCount(col("text")).as("tokens"))
      // warm run (JIT + file listing) then measure: best of 3
      def best(f: => Long): (Double, Long) = {
        f
        val runs = (1 to 3).map(_ => time(f))
        (runs.map(_._1).min, runs.head._2)
      }
      val (tScan, n) = best(proj.select(count(lit(1)), sum("tokens")).collect()(0).getLong(0))
      val (tShuf, _) = best(
        proj.repartition(32, col("conv")).select(count(lit(1))).collect()(0).getLong(0))
      val (tFull, _) = best(graft.ops.Sampling.packSequences(
        proj, "conv", "doc_id", "tokens", budget = 500L).select(count(lit(1))).collect()(0).getLong(0))
      println(f"[q28prof] $label rows=$n scan=$tScan%.3f scan+exchange=$tShuf%.3f full=$tFull%.3f " +
        f"(exchange=${tShuf - tScan}%.3f groupscan=${tFull - tShuf}%.3f)")
    }

    stages(sfDir, "1x")
    factors.foreach { f =>
      val path = s"/tmp/q28prof_scaled_$f"
      Bench.materializeScaled(spark, sfDir, f, path)
      stages(path, s"${f}x")
    }
    spark.stop()
  }
}
