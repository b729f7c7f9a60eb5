package graft

import graft.functions.PqVector
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: kernel identities and the IVF-PQ operator. */
class PqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def syntheticVecs(n: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(n)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  test("train: deterministic, correct shapes, centroids from the sample space") {
    val sample = syntheticVecs(100, 16)
    val cb1 = PqVector.train(sample, m = 4, ksub = 8)
    val cb2 = PqVector.train(sample.map(_.clone()), m = 4, ksub = 8)
    assert(cb1.length == 4)
    assert(cb1.forall(_.length == 8))
    assert(cb1.forall(_.forall(_.length == 4)))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("train pads sparse subspaces to a uniform ksub (lut/adc indexing invariant)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // first subspace constant (1 distinct subvector), second rich: without
    // padding, lut() sizes by codebooks(0).length and corrupts/overflows
    val rnd = new scala.util.Random(9)
    val sample = Array.fill(50)(Array(1.0, 1.0) ++ Array.fill(2)(rnd.nextDouble()))
    val cb = PqVector.train(sample, m = 2, ksub = 8)
    assert(cb.forall(_.length == 8), cb.map(_.length).toSeq)
    val code = PqVector.encode(new GenericArrayData(sample(3)), cb, isFloat = false)
    assert(code(0) == 0) // duplicates padded after index 0 are never selected
    val lut = PqVector.lut(new GenericArrayData(sample(7)), cb, isFloat = false)
    assert(lut.length == 16)
    val adc = PqVector.adc(code, new GenericArrayData(lut))
    val recon = code.zipWithIndex.flatMap { case (c, m) => cb(m)(c & 0xff) }
    val direct = sample(7).zip(recon).map { case (a, b) => a * b }.sum
    assert(math.abs(adc - direct) < 1e-9)
  }

  test("adc over a lut equals the dot of query with the reconstructed vector") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sample = syntheticVecs(64, 16)
    val cb = PqVector.train(sample, m = 4, ksub = 8)
    val v = sample(10)
    val q = sample(20)
    val code = PqVector.encode(new GenericArrayData(v), cb, isFloat = false)
    assert(code.length == 4)
    val lut = PqVector.lut(new GenericArrayData(q), cb, isFloat = false)
    val adc = PqVector.adc(code, new GenericArrayData(lut))
    // reconstruct: concatenation of chosen sub-centroids
    val recon = code.zipWithIndex.flatMap { case (c, m) => cb(m)(c & 0xff) }
    val direct = q.zip(recon).map { case (a, b) => a * b }.sum
    assert(math.abs(adc - direct) < 1e-9)
    // reconstructed norm² identity
    val normSq = cb.map(_.map(c => c.map(x => x * x).sum))
    assert(math.abs(PqVector.codeNormSq(code, normSq) - recon.map(x => x * x).sum) < 1e-9)
  }

  test("encode picks the L2-nearest sub-centroid (brute force cross-check)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sample = syntheticVecs(64, 12)
    val cb = PqVector.train(sample, m = 3, ksub = 8)
    syntheticVecs(10, 12).foreach { v =>
      val code = PqVector.encode(new GenericArrayData(v), cb, isFloat = false)
      (0 until 3).foreach { m =>
        val sub = v.slice(m * 4, m * 4 + 4)
        val dists = cb(m).map(c => sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        assert(dists(code(m) & 0xff) == dists.min)
      }
    }
  }

  test("ivfPqTopK: perfect recall on clustered data") {
    import spark.implicits._
    // 20 tight clusters of 10 vectors each; neighbors of a query are its own
    // cluster — any sane coarse+PQ pipeline recovers them after refine
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextGaussian()))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", k = 5)
    // BOTH encodings must recover the clusters (residual is the default;
    // the raw path must not rot untested)
    Seq(true, false).foreach { res =>
      val pq = Similarity.ivfPqTopK(q, df, "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 3, m = 8, ksub = 16, refine = 8, byResidual = res)
      val hits = pq.select("qid", "nid").join(bf.select("qid", "nid"), Seq("qid", "nid")).count()
      assert(hits == 25, s"byResidual=$res: expected 25 exact hits, got $hits")
      // refine step means returned sims are EXACT cosines
      val sims = pq.select("sim").collect().map(_.getDouble(0))
      assert(sims.forall(s => s > 0.9 && s <= 1.0 + 1e-9), s"byResidual=$res")
    }
  }

  test("residual decomposition identity: dot(q,c)+ADC == dot(q, c + recon(residual))") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(31)
    val dim = 16
    val c = Array.fill(dim)(rnd.nextDouble())
    val x = Array.fill(dim)(rnd.nextDouble())
    val q = Array.fill(dim)(rnd.nextDouble())
    val residual = x.zip(c).map { case (a, b) => a - b }
    val sample = Array.fill(64)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    val cb = PqVector.train(sample, m = 4, ksub = 8)
    val code = PqVector.encode(new GenericArrayData(residual), cb, isFloat = false)
    val lutQ = PqVector.lut(new GenericArrayData(q), cb, isFloat = false)
    val adc = PqVector.adc(code, new GenericArrayData(lutQ))
    val recon = code.zipWithIndex.flatMap { case (cd, mm) => cb(mm)(cd & 0xff) }
    val dotDirect = q.zip(c.zip(recon).map { case (a, b) => a + b })
      .map { case (a, b) => a * b }.sum
    val dotDecomposed = q.zip(c).map { case (a, b) => a * b }.sum + adc
    assert(math.abs(dotDirect - dotDecomposed) < 1e-9)
    // and the norm decomposition: ||c||^2 + 2*dot(c, recon) + ||recon||^2
    val lutC = PqVector.lut(new GenericArrayData(c), cb, isFloat = false)
    // adcIndexed deliberately duplicates adc's loop (hot path must not copy
    // ArrayData); this pin keeps the two indexing contracts identical
    assert(graft.functions.PqResidual.adcIndexed(code, 0, Array(lutC)) ==
      PqVector.adc(code, new GenericArrayData(lutC)))
    val normDecomposed = c.map(v => v * v).sum +
      2 * graft.functions.PqResidual.adcIndexed(code, 0, Array(lutC)) +
      PqVector.codeNormSq(code, cb.map(_.map(cc => cc.map(v => v * v).sum)))
    val xRecon = c.zip(recon).map { case (a, b) => a + b }
    assert(math.abs(normDecomposed - xRecon.map(v => v * v).sum) < 1e-9)
  }

  test("multi-probe LSH: superset of exact-bucket results, one match per pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (0 until 120).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 6)
    val exact = Similarity.lshTopK(q, df, "vec_id", "embedding", k = 5, bits = 6)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.lshMultiProbeTopK(q, df, "vec_id", "embedding", k = 5, bits = 6)
    val multiRows = multi.collect()
    // no duplicate (qid, nid) pairs: a pair matches at most one probe
    val pairs = multiRows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    // every query returns k rows (the whole point: exact-bucket LSH often
    // cannot fill k from one bucket at these sizes)
    assert(multiRows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // candidate POOL is a superset, so per-query top-k sims are >= exact's
    val exactBest = Similarity.lshTopK(q, df, "vec_id", "embedding", k = 1, bits = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val multiBest = multiRows.filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    exactBest.foreach { case (qid, s) =>
      assert(multiBest(qid) >= s - 1e-12, s"qid $qid")
    }
    val _ = exact
  }

  test("zero-vector corpus rows score 0 cosine, never NaN-rank first") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 30).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() + 0.1f))) :+
      (99L, Array.fill(8)(0.0f)) // dead embedding
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0)
    val top = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", k = 5).collect()
    // all-positive vectors: every real neighbor has sim > 0; the zero vector
    // must not appear in the top-5 (an unguarded NaN sorts first in Spark)
    assert(!top.map(_.getLong(1)).contains(99L), top.mkString(","))
    assert(top.forall(r => !r.getDouble(2).isNaN))
  }

  test("ivfPqTopK output contract: k rows per query, rank 1..k, sim descending") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 100).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 3)
    val out = Similarity.ivfPqTopK(q, df, "vec_id", "embedding", k = 4,
      nlist = 4, nprobe = 4, m = 4, ksub = 8, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length == 12)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to 4))
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
