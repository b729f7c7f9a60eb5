package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Scratch: q25 cost/selectivity vs (k, w) at sf0.1 and sf0.01. */
object WinnowScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      for ((k, w) <- Seq((12, 8), (24, 12), (32, 16), (48, 24))) {
        val t0 = System.nanoTime()
        val n = Dedup.fingerprintNearDups(docs, "doc_id", "text", k = k, w = w, minShared = 2).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$sf k=$k w=$w pairs=$n sec=$sec%.2f")
      }
    }
  }
}
