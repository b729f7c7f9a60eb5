package graft

import graft.core.Turn
import graft.spark.Manifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end spark-submit entrypoint: full run writes every bucket + manifest;
  * resume with a complete manifest processes nothing new; resume with a
  * partially-complete manifest processes only the missing buckets. */
class AppMainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("app.Main: full run, idempotent resume, partial-manifest resume") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-app-in").toString + "/turns"
    val out = Files.createTempDirectory("graft-app-out").toString + "/extracted"
    val mf = Files.createTempDirectory("graft-app-mf").toString + "/manifest"

    val turns = (0 until 200).map { i =>
      Turn(f"c${i % 20}%03d", i / 20, "user", s"plain text $i", "",
        new java.sql.Timestamp(1700000000000L + i))
    }
    spark.createDataset(turns).write.parquet(in)

    def run(mode: String): Unit = graft.app.Main.run(spark, Array(
      "--input", in, "--output", out, "--manifest", mf,
      "--mode", mode, "--buckets", "4", "--partitions", "4"))

    run("full")
    val extracted = spark.read.parquet(out)
    assert(extracted.count() == 200)
    val m1 = Manifest.read(spark, mf)
    assert(m1.filter(col("status") === "done").count() == 4) // all 4 buckets

    // resume with everything done: no bucket reprocessed (manifest unchanged)
    val rowsBefore = spark.read.parquet(mf).count()
    run("resume")
    assert(spark.read.parquet(mf).count() == rowsBefore)
    assert(spark.read.parquet(out).count() == 200)

    // knock one bucket out of the manifest → resume reprocesses exactly it
    val kept = spark.read.parquet(mf).filter(col("part") =!= "1")
    val mf2 = Files.createTempDirectory("graft-app-mf2").toString + "/manifest"
    kept.write.parquet(mf2)
    graft.app.Main.run(spark, Array(
      "--input", in, "--output", out, "--manifest", mf2,
      "--mode", "resume", "--buckets", "4", "--partitions", "4"))
    val m2 = Manifest.read(spark, mf2)
    assert(m2.filter(col("status") === "done").count() == 4)
    assert(spark.read.parquet(out).count() == 200) // overwrite kept it idempotent
  }

  test("app.Main: zero-yield buckets get rows=0 done entries; stale partitions cleared") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-app0-in").toString + "/turns"
    val out = Files.createTempDirectory("graft-app0-out").toString + "/extracted"
    val mf = Files.createTempDirectory("graft-app0-mf").toString + "/manifest"

    // one conversation → its rows land in exactly one of 8 buckets; the other
    // 7 are pending-but-empty on every run
    val turns = (0 until 10).map { i =>
      Turn("conv_only", i, "user", s"text $i", "",
        new java.sql.Timestamp(1700000000000L + i))
    }
    spark.createDataset(turns).write.parquet(in)

    def run(): Unit = graft.app.Main.run(spark, Array(
      "--input", in, "--output", out, "--manifest", mf,
      "--mode", "resume", "--buckets", "8", "--partitions", "2"))

    run()
    val m1 = Manifest.read(spark, mf).filter(col("status") === "done")
    // EVERY pending bucket recorded done — empty ones with rows=0 — else each
    // subsequent resume re-extracts them forever
    assert(m1.count() == 8)
    assert(m1.filter(col("rows") === 0).count() == 7)
    assert(m1.filter(col("rows") > 0).agg(sum("rows")).head.getLong(0) == 10)

    // second resume: complete manifest → nothing reprocessed, no new entries
    val entriesBefore = spark.read.parquet(mf).count()
    run()
    assert(spark.read.parquet(mf).count() == entriesBefore)

    // stale-partition clear: pre-write garbage into a pending bucket dir,
    // knock that bucket from the manifest, rerun — the garbage must be gone
    // (its input bucket is empty, so dynamic overwrite alone would keep it)
    val fullBucket = m1.filter(col("rows") > 0).select("part").head.getString(0)
    val emptyBucket = (0 until 8).map(_.toString).find(_ != fullBucket).get
    spark.read.parquet(out).limit(3).write.parquet(s"$out/bucket=$emptyBucket")
    val kept = spark.read.parquet(mf).filter(col("part") =!= emptyBucket)
    val mf2 = Files.createTempDirectory("graft-app0-mf2").toString + "/manifest"
    kept.write.parquet(mf2)
    graft.app.Main.run(spark, Array(
      "--input", in, "--output", out, "--manifest", mf2,
      "--mode", "resume", "--buckets", "8", "--partitions", "2"))
    val m2 = Manifest.read(spark, mf2).filter(col("status") === "done")
    assert(m2.filter(col("part") === emptyBucket).select("rows").head.getLong(0) == 0)
    assert(spark.read.parquet(out).count() == 10) // stale files cleared, not counted
  }
}
