package graft

import graft.core.Turn
import graft.extract.Extractor
import graft.spark.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scaling diagnosis: extraction job over an existing corpus at several
  * parallelism levels, plus a raw single-thread kernel baseline and an
  * extract-before-shuffle pipeline variant. */
object ScalingProbe {

  private def session(c: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", (c * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val modes = args.drop(1)

    modes.foreach {
      case m if m.startsWith("gen:") => // gen:<target> → materialize corpus into args(0)
        val target = m.substring(4).toLong
        val s = session(32)
        import s.implicits._
        val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select("doc_id", "text").as[(Long, String)]
        val nd = docs.count()
        val reps = math.max(1L, target / nd)
        docs.repartition(64).flatMap { case (id, txt) =>
          (0L until reps).iterator.map { r =>
            val key = id * reps + r
            val payload = (key % 10) match {
              case x if x < 6 => graft.testgen.Synth.encodeSvg(txt)
              case x if x < 9 => graft.testgen.Synth.encodeHtml(txt)
              case _ => graft.testgen.Synth.encodePdf(txt)
            }
            Turn(f"c${key % 2000}%05d", (key / 2000).toInt, "user", payload, "",
              new java.sql.Timestamp(1735689600000L + key))
          }
        }.write.mode("overwrite").parquet(corpus)
        println(s"[probe] generated ${nd * reps} turns at $corpus")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      case "raw" =>
        val s = session(4)
        val payloads = s.read.parquet(corpus).select("text")
          .limit(30000).collect().map(_.getString(0))
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        // warm
        payloads.take(5000).foreach(Extractor.extract)
        val t0 = System.nanoTime()
        var chars = 0L
        payloads.foreach(p => chars += Extractor.extract(p).text.length)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] raw 1-thread: ${payloads.length} payloads in $sec%.2f s (${payloads.length / sec}%.0f turns/s, $chars chars)")
      case m if m.startsWith("write") => // full job incl. parquet sink: writeN
        val c = m.substring(5).toInt
        val s = session(c)
        val outDir = java.nio.file.Files.createTempDirectory("graft-write").toString + "/out"
        def job() = Pipeline.extractTurns(Pipeline.readTurns(s, corpus))
          .write.mode("overwrite").parquet(outDir)
        job()
        val t0 = System.nanoTime(); job(); val sec = (System.nanoTime() - t0) / 1e9
        val n = s.read.parquet(outDir).count()
        println(f"[probe] write local[$c%d]: $sec%.2f s  (${n / sec}%.0f turns/s incl. sink)")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      case m if m.startsWith("wlite") => // write without the spans column: wliteN
        val c = m.substring(5).toInt
        val s = session(c)
        val outDir = java.nio.file.Files.createTempDirectory("graft-wlite").toString + "/out"
        def job() = Pipeline.extractTurns(Pipeline.readTurns(s, corpus))
          .drop("spans")
          .write.mode("overwrite").parquet(outDir)
        job()
        val t0 = System.nanoTime(); job(); val sec = (System.nanoTime() - t0) / 1e9
        val n = s.read.parquet(outDir).count()
        println(f"[probe] wlite local[$c%d]: $sec%.2f s  (${n / sec}%.0f turns/s, no spans col)")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      case m if m.startsWith("map") => // extraction only, no shuffle: mapN
        val c = m.substring(3).toInt
        val s = session(c)
        import s.implicits._
        def job() = Pipeline.readTurns(s, corpus)
          .mapPartitions(_.map(t => graft.extract.Extractor.extract(t.text).text.length))
          .reduce(_ + _)
        job()
        val t0 = System.nanoTime(); job(); val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] map-only local[$c%d]: $sec%.2f s")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      case m if m.startsWith("scan") => // scan+deserialize only: scanN
        val c = m.substring(4).toInt
        val s = session(c)
        import s.implicits._
        def job() = Pipeline.readTurns(s, corpus)
          .mapPartitions(_.map(_.text.length)).reduce(_ + _)
        job()
        val t0 = System.nanoTime(); job(); val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] scan-only local[$c%d]: $sec%.2f s")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      case m if m.startsWith("ex") => // extract-first pipeline at local[N]: exN
        val c = m.substring(2).toInt
        val s = session(c)
        import s.implicits._
        def job() = {
          val ds = Pipeline.readTurns(s, corpus)
          ds.mapPartitions(_.map(Extractor.extractTurn))
            .repartition(c * 2, col("conv_id"))
            .sortWithinPartitions(col("conv_id"), col("turn_idx"))
            .count()
        }
        job()
        val t0 = System.nanoTime(); val n = job(); val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] extract-first local[$c%d]: $sec%.2f s  (${n / sec}%.0f turns/s)")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      case m => // range pipeline at local[N]
        val c = m.toInt
        val s = session(c)
        def job() = Pipeline.extractTurns(Pipeline.readTurns(s, corpus)).count()
        job()
        val t0 = System.nanoTime(); val n = job(); val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] range local[$c%d]: $sec%.2f s  (${n / sec}%.0f turns/s)")
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
