package graft

import graft.spark.Pipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query seconds plus the
  * north-rule scaling evidence: the extraction pipeline run at two parallelism
  * levels (local[8] vs local[32], the sandbox stand-in for N vs 4N executors)
  * with throughput at both and scaling efficiency = (T8/T32)/4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // headline queries at the driver-provided parallelism
    val spark = session(cpus)
    val headline = Seq(
      "q01_agg", "q02_join_broadcast", "q03_window", "q05_filter_pushdown",
      "q10_extract_html", "q11_extract_svg", "q12_extract_pdf",
      "q13_pipeline_e2e", "q20_dedup_exact", "q21_dedup_minhash",
      "q30_ann_bruteforce", "q40_textstats", "q50_events_window")
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // warm once at tiny scale? no — measure cold plan + execution, count() action
      val sec = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // scaling evidence: identical extraction job at two parallelism levels
    val nTurns = spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.stop()

    def extractionThroughput(c: Int): Double = {
      val s = session(c)
      try {
        val fn = SparkEntry.queries("q13_pipeline_e2e")
        fn(s, sfDir).count() // warm-up: JIT + parquet footer cache
        val sec = time(fn(s, sfDir).count())
        nTurns / sec
      } finally s.stop()
    }
    val tpLow = extractionThroughput(8)
    val tpHigh = extractionThroughput(32)
    val eff = (tpHigh / tpLow) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""extract_turns_per_sec_p8":$tpLow,"extract_turns_per_sec_p32":$tpHigh,""" +
      s""""scaling_efficiency_8_to_32":$eff,"extract_rows":$nTurns}""")
  }
}
