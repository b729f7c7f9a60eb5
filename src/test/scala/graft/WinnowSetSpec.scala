package graft

import graft.functions.TextSketch
import graft.ops.{Dedup, ProductionDefaults}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprint sets (TextSketch.winnowSet) and the overlap
  * operator (Dedup.fingerprintNearDups). */
class WinnowSetSpec extends AnyFunSuite {

  private def ws(s: String, k: Int = 12, w: Int = 8): Array[Long] =
    TextSketch.winnowSet(UTF8String.fromString(s), k, w)

  test("empty text has no fingerprints; short text has exactly the q43 fingerprint") {
    assert(ws("").isEmpty)
    val s = "short"
    assert(ws(s, k = 12).toSeq ==
      Seq(TextSketch.fingerprint(UTF8String.fromString(s), 12)))
  }

  /** Brute-force positional window hashes: unseeded 31-poly over each k-gram,
    * mixed — the definition the kernel's rolling hash must equal (ASCII
    * inputs, so chars == codepoints). */
  private def positional(s: String, k: Int): Array[Long] =
    if (s.length <= k) Array(TextSketch.fingerprint(UTF8String.fromString(s), k))
    else (0 to s.length - k).map { p =>
      var h = 0L
      (p until p + k).foreach(i => h = 31 * h + s.charAt(i))
      TextSketch.mix64(h)
    }.toArray

  test("deque sliding min matches the brute-force definition") {
    val rnd = new scala.util.Random(42)
    (0 until 100).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val s = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
      val k = 1 + rnd.nextInt(8)
      val w = 1 + rnd.nextInt(6)
      val hs = positional(s, k)
      val expect: Set[Long] =
        if (hs.length <= w) Set(hs.min)
        else hs.sliding(w).map(_.min).toSet
      assert(ws(s, k, w).toSet == expect, s"n=$n k=$k w=$w")
    }
  }

  test("sorted, distinct, and a subset of the window hashes") {
    val s = "the quick brown fox jumps over the lazy dog " * 10
    val out = ws(s)
    assert(out.toSeq == out.toSeq.sorted)
    assert(out.distinct.length == out.length)
    assert(out.toSet.subsetOf(ws(s, 12, 1).toSet))
  }

  test("fingerprintNearDups finds a copied paragraph between different documents") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val para = "this exact paragraph was copied verbatim between two documents " +
      "and winnowing should select identical fingerprints from inside it"
    val df = Seq(
      (0L, s"unique preamble alpha beta gamma. $para"),
      (1L, s"$para. a totally different conclusion about spark catalyst internals"),
      (2L, "nothing in common with the others at all, completely disjoint content here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.fingerprintNearDups(df, "doc_id", "text", k = 12, w = 8, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("connectedComponents: chains, cliques and isolated pairs get min-id labels (both paths)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // component A: chain 1-2-3-4-5 (exercises multi-round propagation);
    // component B: clique {10,11,12}; component C: pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find fast path (default) and distributed propagation
    // (driverEdgeLimit = 0) must agree exactly
    val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b", driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expect)
    assert(dist == expect)
  }

  test("connectedComponents converges on a long chain within maxIters (both paths)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // chain of 18 nodes: min label must travel the full diameter
    val pairs = (0L until 17L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Seq(4000000L, 0L).foreach { lim =>
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b", driverEdgeLimit = lim)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc.size == 18 && cc.values.forall(_ == 0L), s"limit=$lim")
    }
  }

  test("connectedComponents: driver and distributed paths agree on random graphs") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    (0 until 3).foreach { trial =>
      val n = 40
      // include occasional self-pairs: both paths must emit them as singletons
      val pairs = (Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b } :+ ((100L, 100L)))
        .toDF("id_a", "id_b")
      val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(pairs, "id_a", "id_b", driverEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"trial $trial")
      // the exact (anti-join) convergence witness yields identical labels
      val exact = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverEdgeLimit = 0, exactWitness = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(exact == dist, s"trial $trial exactWitness")
      // labels are component minima: every label maps to itself
      local.values.foreach(c => assert(local(c) == c, s"trial $trial label $c"))
    }
    // one denser trial: 200 nodes / 300 edges mixes long paths with clusters
    val big = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val bl = Dedup.connectedComponents(big, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bd = Dedup.connectedComponents(big, "id_a", "id_b", driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bl == bd)
  }

  test("maxBucket excludes hot fingerprints from candidate generation") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val boiler = "standard footer text appended to every single document in the corpus"
    val df = (0L until 10L).map(i => (i, s"document body number $i. $boiler")).toDF("doc_id", "text")
    val uncapped = Dedup.fingerprintNearDups(df, "doc_id", "text", k = 12, w = 8, minShared = 1).count()
    val capped = Dedup.fingerprintNearDups(df, "doc_id", "text", k = 12, w = 8, minShared = 1, maxBucket = 5).count()
    assert(uncapped == 45) // all pairs share the boilerplate fingerprints
    assert(capped == 0) // every shared fingerprint sits in a 10-doc bucket
  }

  test("ProductionDefaults profile: capped paths keep real near-dups and stay deterministic") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // a genuine duplicate pair + unique docs: the sized production caps
    // (far above this bucket population) must not change the answer
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    // character k-grams power the fingerprints, so the unique docs must not
    // share ANY 12-char run — seeded-random tokens, no common template text
    val df = ((0L until 8L).map { i =>
      val docRnd = new scala.util.Random(1000 + i)
      (i, Seq.fill(15)(docRnd.alphanumeric.take(8).mkString).mkString(" "))
    } ++ Seq((100L, base), (101L, base))).toDF("doc_id", "text")
    val pairs = Dedup.fingerprintNearDups(df, "doc_id", "text", k = 12, w = 8,
      minShared = 1, maxBucket = ProductionDefaults.MaxBucket)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)))
    // connected components under the full production profile
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b",
      driverEdgeLimit = ProductionDefaults.DriverEdgeLimit,
      exactWitness = ProductionDefaults.ExactWitness)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(100L -> 100L, 101L -> 100L))
    // substring dedup with the production gram cap: planted duplication far
    // below the cap is still clipped (deterministically)
    val sub = Dedup.substringDedup(df, "doc_id", "text", l = 20,
      maxDocs = ProductionDefaults.MaxDocs)
      .select("doc_id", "n_spans", "dropped_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the planted duplicate pair is clipped; unique docs are untouched
    assert(sub(100L)._2 > 0 && sub(101L)._2 > 0)
    (0L until 8L).foreach(i => assert(sub(i) == ((0L, 0L)), s"doc $i"))
  }
}
