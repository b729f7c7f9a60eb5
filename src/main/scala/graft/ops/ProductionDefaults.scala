package graft.ops

/** Sized cap values for a ~100 TB corpus run — the scale-safe configuration
  * as code, not tribal knowledge.
  *
  * Every candidate-generating operator in this library defaults its cap
  * knobs to 0 (= uncapped) so the DuckDB oracles can assert EXACT output.
  * Production profiles must size them: an uncapped bucket join is quadratic
  * in the hottest bucket, and one boilerplate n-gram shared by millions of
  * documents (page headers, license blurbs) is enough to melt a stage. The
  * values below bound worst-case candidate blowup while leaving realistic
  * near-dup clusters untouched; each one is the knob's own scaladoc
  * recommendation, centralized.
  *
  * | knob | applies to | value | bound it enforces |
  * |------|-----------|-------|-------------------|
  * | `maxBucket` | minhashCandidates, simhashPairs, winnowPairs, cosineNearDups | 1000 | ≤ k(k−1)/2 ≈ 5·10^5 pairs per signature bucket; a degenerate bucket (empty docs, boilerplate) contributes bounded work instead of O(n²) |
  * | `maxDocs` | substringDedup | 10000 | a token-gram shared by more than this many docs is boilerplate, not duplication — dropping it keeps the positional explode linear |
  * | `driverEdgeLimit` | connectedComponents | 1e6 (the default) | pair graphs under ~1M edges union-find on the driver in one job; larger graphs take the O(log n) distributed path |
  * | `exactWitness` | connectedComponents | true | convergence proven by set equality, not a 2^-64 hash race — one extra join per O(log n) round |
  *
  * Oracle exactness vs production: capped paths stay DETERMINISTIC (caps
  * keep the lowest ids per bucket), so capped runs are reproducible — they
  * are just no longer byte-identical to the uncapped oracle replay when a
  * planted degenerate bucket overflows the cap. The planted-degenerate
  * tests in OpsSpec/WinnowSetSpec pin that behavior.
  */
object ProductionDefaults {
  /** Per-signature-bucket candidate cap for all LSH-family pair generators. */
  final val MaxBucket: Int = 1000

  /** Duplicated-gram document-frequency cap for exact substring dedup. */
  final val MaxDocs: Long = 10000L

  /** Driver union-find threshold for connected components (edges). */
  final val DriverEdgeLimit: Long = 1000000L

  /** Exact set-equality convergence witness for connected components. */
  final val ExactWitness: Boolean = true
}
