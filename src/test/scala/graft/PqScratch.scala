package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Scratch: q34 recall-gate sensitivity on the real sf0.01 embeddings. */
object PqScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid")
    for ((nprobe, m, ksub, refine) <- Seq((6, 16, 16, 8), (6, 16, 32, 8), (6, 8, 32, 8),
        (8, 16, 32, 8), (6, 16, 32, 16), (8, 16, 32, 16))) {
      val pq = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = nprobe, m = m, ksub = ksub, refine = refine)
      val hits = pq.select("qid", "nid").join(bf, Seq("qid", "nid"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val hs = (0L until 10L).map(i => hits.getOrElse(i, 0L))
      println(s"nprobe=$nprobe m=$m ksub=$ksub refine=$refine hits=${hs.mkString(",")} min=${hs.min}")
    }
  }
}
