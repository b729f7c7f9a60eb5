package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-7 measurement harness (guide §1: measure first; §1.4: noop-sink
  * isolation). NOT part of the frozen driver contract — `graft.Bench` stays
  * the headline surface; this main exists so optimization evidence (per-query
  * medians, job/stage/task counts, noop-vs-count deltas, formatted plans) can
  * be produced without touching the hashed harness.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [queryName ...]"
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     local core count (default 32)
  *   SPARK_GRAFT_SAMPLES  samples per query (default 3)
  *   SPARK_GRAFT_PLANS_DIR  if set, writes <query>_<tag>.txt formatted plans
  *   SPARK_GRAFT_PLAN_TAG   plan filename suffix (default "before")
  */
object BenchExtra {

  /** Same session shape as graft.Bench.session — measurements must be
    * comparable with the frozen headline harness. */
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
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

  private final class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += sc.stageInfo.numTasks
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nSamples = sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "3").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")

    val headline = Seq(
      "q01_agg", "q02_join_broadcast", "q03_window", "q05_filter_pushdown",
      "q10_extract_html", "q11_extract_svg", "q12_extract_pdf",
      "q13_pipeline_e2e", "q18_pdf_file_ingest", "q20_dedup_exact", "q21_dedup_minhash",
      "q22_simhash_pairs", "q25_fingerprint_pairs", "q26_dedup_clusters",
      "q27_stratified_sample", "q28_pack_sequences", "q29_oov_rate",
      "q30_ann_bruteforce", "q33_ann_ivf", "q36_substring_dedup", "q37_semantic_dedup",
      "q34_ann_ivfpq", "q40_textstats", "q43_fingerprint", "q44_chunking",
      "q46_clean_pipeline", "q50_events_window", "q53_rollup", "q59_asof_join",
      "q61_pdf_images")
    val names = if (args.nonEmpty) args.toSeq else headline

    val spark = session(cpus)
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    // same warm-up family as Bench: JIT the shared kernel paths once
    SparkEntry.queries("q01_agg")(spark, sfDir).count()
    SparkEntry.queries("q10_extract_html")(spark, sfDir).count()
    SparkEntry.queries("q21_dedup_minhash")(spark, sfDir).count()
    SparkEntry.queries("q30_ann_bruteforce")(spark, sfDir).count()

    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    println("query,samples_count_sec,min_count,jobs,stages,tasks,noop_sec")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      // count() samples — the frozen harness's action
      val samples = (0 until nSamples).map(_ => time(fn(spark, sfDir).count()))
      // one counted run for job/stage/task profile
      counts.reset()
      val _ = fn(spark, sfDir).count()
      Thread.sleep(100) // listener drain
      val (j, st, tk) = (counts.jobs, counts.stages, counts.tasks)
      // noop-sink isolation (guide §1.4): computes every column, no count prune
      val noopSec = time {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      plansDir.foreach { dir =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"${name}_$planTag.txt"), txt)
      }
      spark.sparkContext.setJobDescription(null)
      println(s"$name,${samples.map(f3).mkString(" ")},${f3(samples.min)},$j,$st,$tk,${f3(noopSec)}")
    }
    spark.stop()
  }
}
