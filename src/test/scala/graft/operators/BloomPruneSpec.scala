package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpecBase {

  test("bloom semi-join equals the plain semi-join (false positives scrubbed)") {
    val s = spark
    import s.implicits._
    val fact = Tables(s, sf, "lineitem")
    val dim = Tables(s, sf, "part").filter($"p_size" <= 5)
    val pruned = BloomPrune.semiJoin(fact, dim, "l_partkey", "p_partkey",
        expectedItems = 10000L)
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().sorted
    val plain = fact
      .join(dim.select($"p_partkey"), $"l_partkey" === $"p_partkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().sorted
    assert(plain.nonEmpty && pruned.sameElements(plain))
  }

  test("the bloom probe prunes pre-shuffle: survivors are a small superset " +
    "of true matches, far below the full fact row count") {
    val s = spark
    import s.implicits._
    val fact = Tables(s, sf, "lineitem")
    val dim = Tables(s, sf, "part").filter($"p_size" <= 5)
    val filter = BloomPrune.buildFilter(dim, "p_partkey", 10000L, 0.01)
    val total = fact.count()
    val trueMatches = fact.join(dim.select($"p_partkey"),
      $"l_partkey" === $"p_partkey", "left_semi").count()
    val survivors = fact.filter(BloomPrune.mightContain(filter, $"l_partkey")).count()
    assert(survivors >= trueMatches, "bloom filters must never false-negative")
    // 1% fpp over the non-matching remainder, with generous slack
    assert(survivors <= trueMatches + (total - trueMatches) / 10,
      s"bloom pruned too little: $survivors of $total (true: $trueMatches)")
  }

  test("the bloom probe evaluates BELOW the join exchange — rows drop " +
    "before they are shuffled, which is the operator's entire point") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val plan = BloomPrune.semiJoin(Tables(s, sf, "lineitem"),
          Tables(s, sf, "part").filter($"p_size" <= 5),
          "l_partkey", "p_partkey", expectedItems = 10000L)
        .queryExecution.executedPlan.toString
      val exchange = plan.indexOf("Exchange hashpartitioning")
      val probe = plan.indexOf("might_contain")
      // the tree prints parents first: deeper (earlier-executing)
      // operators appear later, so probe must print after the exchange
      assert(exchange >= 0 && probe > exchange,
        s"bloom probe not below the exchange:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("Catalyst's own runtime bloom filter injects on a selective " +
    "shuffle join when thresholds allow (the automatic twin)") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val plan = Tables(s, sf, "lineitem")
        .join(Tables(s, sf, "part").filter($"p_size" <= 5),
          $"l_partkey" === $"p_partkey")
        .groupBy($"l_returnflag").agg(count(lit(1)))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
