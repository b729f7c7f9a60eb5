package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality assertions: the 100 TB story depends on the physical plans, not
  * just results. These pin the properties that must survive refactors:
  * predicate/column pushdown to the parquet scan, broadcast joins for small
  * dims, map-side partial aggregation, and a single exchange in the extraction
  * pipeline.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q05: filters and projection pushed to the parquet scan") {
    val p = plan("q05_filter_pushdown")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"), p)
    // pruned read schema: only the three referenced columns
    assert(p.contains("l_returnflag") && !p.contains("l_extendedprice"), p)
  }

  test("q02: dimension joins are broadcast, aggregation is partial+final") {
    val p = plan("q02_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q01: whole-stage codegen covers scan→partial agg") {
    // AQE finalizes the plan at execution; run the query, then inspect
    val df = SparkEntry.queries("q01_agg")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the plan printer marks whole-stage-codegen spans with "*(n)" prefixes
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
  }

  test("extraction pipeline: exactly one exchange (the range repartition)") {
    import spark.implicits._
    val turns = spark.createDataset(Seq(
      graft.core.Turn("c1", 0, "user", "plain", "", new java.sql.Timestamp(0))))
    val p = graft.spark.Pipeline.extractTurns(turns).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("MapPartitions"), p)
  }

  test("q30 ANN: query side broadcast — corpus never shuffles for the join") {
    val p = plan("q30_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("SQL function surface: extensions wiring + registered functions") {
    // the extensions class must inject cleanly into a SparkSessionExtensions
    // (config-time path: spark.sql.extensions=graft.functions.GraftExtensions)
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
    // runtime path: same expressions through the session's function registry
    val s2 = spark.newSession()
    graft.functions.TextHashes.register(s2)
    val r = s2.sql(
      "SELECT extract_text('<body><p>hi</p></body>') AS t, simhash64('a b c') AS h")
      .collect()(0)
    assert(r.getString(0) == "hi")
    val spans = s2.sql(
      "SELECT explode(extract_spans('<body><p>hi</p></body>')) AS s")
      .select("s.start", "s.end", "s.label").collect()
    assert(spans.length == 1 && spans(0).getInt(0) == 0 && spans(0).getInt(1) == 2)
    assert(r.getLong(1) == graft.functions.TextSketch.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    // round-4 kernels through SQL: positional grams + span clip
    val sub = s2.sql(
      "SELECT size(token_gram_hashes('a b c')) AS n, " +
        "drop_token_spans('a b c d', array(1), array(3)) AS kept")
      .collect()(0)
    assert(sub.getInt(0) == 0) // 3 tokens < default l=50 -> no grams
    assert(sub.getString(1) == "a d")
  }

  test("q20 exact dedup: single shuffle with partial aggregation below it") {
    val p = plan("q20_dedup_exact")
    val idx = p.indexOf("Exchange")
    assert(idx > 0, p)
    // a HashAggregate (partial) must appear below (after, in printed order) the exchange
    assert(p.indexOf("HashAggregate", idx) > idx, p)
  }

  test("exact128: winner-election exchange carries only (hash, id), never text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = graft.ops.Dedup.exact128(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    val planned = df.queryExecution.executedPlan
    val root = planned match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, planned.toString)
    // the hash-partitioned winner election must not move the text column; only
    // the id-keyed semi-join side may carry it
    val hashed = exchanges.filter(_.outputPartitioning.toString.contains("__h1"))
    assert(hashed.nonEmpty, planned.toString)
    hashed.foreach { e =>
      assert(!e.child.output.exists(_.name == "text"), e.child.output.mkString(","))
    }
  }

  test("q36 substring dedup: gram exchanges carry (hash, id, pos) only, never text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = graft.ops.Dedup.substringDedup(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", l = 15)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, root.toString)
    // every shuffle in the operator is narrow: the gram dup-count exchange and
    // the per-doc span-merge exchange move ids/hashes/positions, NEVER text —
    // the text rides only the final broadcast/id-keyed join back to the source
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.name == "text"),
        e.child.output.mkString(","))
    }
  }

  test("q36b two-pass: bloom pre-filter sits below the exact gram semi-join") {
    val df = graft.ops.Dedup.substringDedupTwoPass(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", l = 15)
    val plan = df.queryExecution.executedPlan.toString
    // the map-side bloom membership test appears as a Filter over the gram
    // stream BEFORE any exchange — only candidates reach the exact semi-join.
    // The filter bytes ride ONE broadcast (BloomMightContainBcast), not a
    // per-task expression Literal: the plan must show the bcast-backed name
    // and must NOT embed the serialized bloom as a binary literal.
    assert(plan.contains("might_contain_bcast"), plan.take(2000))
    assert(!plan.contains("might_contain(0x"), plan.take(2000))
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val filters = root.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    val bcastExprs = filters.flatMap(_.expressions.flatMap(_.collect {
      case b: graft.functions.BloomMightContainBcast => b.bloom.id
    }))
    assert(bcastExprs.distinct.length == 1, bcastExprs.toString)
    // two-pass output is byte-identical to the one-pass operator
    val onePass = graft.ops.Dedup.substringDedup(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", l = 15)
    val a = df.orderBy("doc_id").collect().map(_.toSeq)
    val b = onePass.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("q25 winnow pairs: candidate exchanges carry (fp, id) only, never text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = graft.ops.Dedup.fingerprintNearDups(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, root.toString)
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.name == "text"), e.child.output.mkString(","))
    }
  }

  test("q34 IVF-PQ: probe join broadcast; ADC stage ranks codes, not vectors") {
    val p = plan("q34_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    // the native kernels appear in the plan (codegen'd expressions, not HOFs)
    assert(p.contains("pq_adc"), p)
    assert(p.contains("pq_encode"), p)
  }
}
