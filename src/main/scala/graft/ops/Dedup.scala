package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the 100 TB training-data pipeline.
  *
  * All are declarative DataFrame plans (Catalyst-optimized, codegen'd built-ins —
  * no UDF in the candidate-generation hot path except the documented signature
  * steps), with shuffle structure chosen for scale:
  *
  *  - exact: one hash-shuffle on the content hash (map-side partial agg first);
  *  - MinHash+LSH: shingle→minhash→band — the only shuffle is the band-bucket
  *    self-join, whose fan-out is bounded by bucket size, not corpus size;
  *  - SimHash: 64-bit fingerprints; near-dup candidates via block-permutation
  *    (4×16-bit keys) so candidates shuffle on short keys;
  *  - n-gram Jaccard verification over candidate pairs only.
  */
object Dedup {

  /** Exact dedupe: survivors = min id per normalized-content group. Map-side
    * combine makes this one cheap shuffle at any scale; dedupe on xxhash64 of
    * the text keeps shuffle rows narrow (hash collisions: verify on tie if
    * byte-exactness is required — flag below). */
  def exact(df: DataFrame, idCol: String, textCol: String, verifyBytes: Boolean = false): DataFrame =
    if (verifyBytes)
      df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol)).select(idCol, textCol)
    else
      df.withColumn("__h", xxhash64(col(textCol)))
        .groupBy(col("__h"))
        .agg(min(col(idCol)).as(idCol), first(col(textCol)).as(textCol))
        .select(idCol, textCol)

  /** Word k-shingles as an array column (codegen'd split + transform). */
  def shingles(textCol: Column, k: Int): Column = {
    val words = split(textCol, " ")
    val n = size(words)
    // positions 0 .. n-k; each shingle = words[i..i+k-1] joined
    filter(
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => when(i <= n - k, array_join(slice(words, i + 1, lit(k)), " "))),
      x => x.isNotNull)
  }

  /** MinHash signature — single-pass native expression (graft.functions.
    * MinHashSignature): shingle hashes computed once per row, k slots derived
    * with long arithmetic. Replaces a 64-aggregate formulation whose generated
    * code re-hashed every shingle per slot (measured 40s/1k rows → ~ms). */
  def minhashSignature(textCol: Column, shingleK: Int, numHashes: Int): Column =
    graft.functions.TextHashes.minhash_signature(textCol, shingleK, numHashes)

  /** LSH banding: signature → `bands` bucket keys (hash of each band's rows).
    * Near-dup candidate pairs = ids sharing any bucket. */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol), minhashSignature(col(textCol), shingleK, numHashes).as("__sig"))
    val withBuckets = withSig.select(
      col(idCol),
      posexplode(
        array((0 until bands).map(b =>
          xxhash64(concat_ws(",",
            (0 until rows).map(r => col("__sig")(b * rows + r)): _*), lit(b))): _*))
        .as(Seq("__band", "__bucket")))
    val left = withBuckets.select(col(idCol).as("a"), col("__band"), col("__bucket"))
    val right = withBuckets.select(col(idCol).as("b"), col("__band"), col("__bucket"))
    left.join(right, Seq("__band", "__bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Verified near-dups: candidates filtered by exact n-gram Jaccard ≥ threshold.
    * The verification join is narrow (candidate pairs ≪ corpus²). */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleK: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleK, numHashes, bands)
    // exact Jaccard over hashed shingles (array<long>): same set semantics as the
    // string shingles, but the verification join shuffles 8-byte elements
    val sh = df.select(col(idCol),
      graft.functions.TextHashes.shingle_hashes(col(textCol), shingleK).as("__sh"))
    cands
      .join(sh.select(col(idCol).as("a"), col("__sh").as("__sha")), "a")
      .join(sh.select(col(idCol).as("b"), col("__sh").as("__shb")), "b")
      .withColumn("jaccard",
        size(array_intersect(col("__sha"), col("__shb"))).cast("double") /
          size(array_union(col("__sha"), col("__shb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash: 64-bit fingerprint — sign of the per-bit vote sum of token hashes;
    * single-pass native expression (graft.functions.SimHash64). */
  def simhash(textCol: Column): Column =
    graft.functions.TextHashes.simhash64(textCol).as("simhash")

  /** Hamming-near SimHash pairs: block-permutation candidate generation — split
    * the 64-bit fingerprint in 4 blocks of 16; any pair within Hamming distance
    * ≤3 shares at least one exact block (pigeonhole). Shuffles on 16-bit keys. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    // 4 blocks cover Hamming ≤ 3 by pigeonhole; a larger radius would need more
    // blocks (or pair-of-block keys) to stay complete — refuse rather than
    // silently under-report.
    require(maxHamming <= 3, s"block-permutation with 4 blocks is complete only for maxHamming <= 3, got $maxHamming")
    val withFp = df.select(col(idCol), simhash(col(textCol)))
    val blocks = withFp.select(
      col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("__blk", "__key")))
    val l = blocks.select(col(idCol).as("a"), col("simhash").as("__fa"), col("__blk"), col("__key"))
    val r = blocks.select(col(idCol).as("b"), col("simhash").as("__fb"), col("__blk"), col("__key"))
    l.join(r, Seq("__blk", "__key"))
      .filter(col("a") < col("b"))
      .withColumn("hamming", bit_count(col("__fa").bitwiseXOR(col("__fb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming").distinct()
  }
}
