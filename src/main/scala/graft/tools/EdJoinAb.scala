package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Same-sitting A/B harness for the q208 EdJoin shape history (r10
  * verdict item 2, carried to r12): q208's min-of-2 moved 2.44 s (r9)
  * → 4.23 s (r10, with the enforced exact-grouping fallback) → 5.98 s
  * (r11, BIT-IDENTICAL code), so history alone cannot say whether the
  * r10 change cost anything. This main replays all three shapes of the
  * SAME q208 pipeline in ONE JVM, interleaved, min-of-N — the
  * apples-to-apples measurement the cross-round numbers cannot give.
  * Results are recorded in BASELINE.md (round 12); the harness stays
  * in-tree so the number is reproducible:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.EdJoinAb"
  *
  * Shapes (the operator history, inlined so one binary holds all
  * three):
  *   r9  — fallback pairs unioned with probe candidates BEFORE one
  *         shared verify; no exact grouping; no output-wide distinct.
  *   r10 — exact-grouped fallback verified separately; prefix windows
  *         from ALL strings; output-wide 3-column distinct.
  *   r12 — the current operator (prefix restricted to long strings,
  *         disjoint branches, no output-wide distinct).
  * All three are brute-force-equal by construction (EdJoinSpec pins
  * the current one; this harness asserts the three agree on the q208
  * output before timing is reported).
  */
object EdJoinAb {

  /** The r9/r10 shapes, parameterized: `exactGroup` switches the
    * fallback between raw all-pairs-in-class (r9) and
    * exact-group-first (r10); r10 also adds the output-wide distinct.
    * Kept verbatim-shaped to the historical operator (see the git
    * history of operators/EdJoin.scala) minus comments. */
  private def joinHistoric(strs: DataFrame, idCol: String, strCol: String,
                           tau: Int, q: Int, exactGroup: Boolean): DataFrame = {
    val prefixLen = tau * q + 1
    val s = strs.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))
    val grams = s.select(col("__id"), col("__len"),
      posexplode(expr(
        s"transform(sequence(1, greatest(__len - ${q - 1}, 1)), " +
          s"i -> substring(__s, i, $q))")).as(Seq("__p0", "__g")))
      .select(col("__id"), col("__len"), (col("__p0") + 1).as("__pos"),
        col("__g"))
    val freq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
    val prefix = grams.join(freq, "__g")
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__f"), col("__g"), col("__pos"))))
      .filter(col("__r") <= prefixLen)
      .select(col("__id").as("p_id"), col("__len").as("p_len"),
        col("__pos").as("p_pos"), col("__g").as("__ga"))
    val index = grams
      .select(col("__id").as("i_id"), col("__len").as("i_len"),
        col("__pos").as("i_pos"), col("__g").as("__gb"))
    val probed = prefix.join(index,
        col("__ga") === col("__gb") &&
          col("p_id") =!= col("i_id") &&
          abs(col("p_pos") - col("i_pos")) <= tau &&
          abs(col("p_len") - col("i_len")) <= tau)
      .select(least(col("p_id"), col("i_id")).as("a_id"),
        greatest(col("p_id"), col("i_id")).as("b_id"))
    val sa = s.select(col("__id").as("a_id"), col("__s").as("__sa"))
    val sb = s.select(col("__id").as("b_id"), col("__s").as("__sb"))
    val few = s.filter(greatest(col("__len") - (q - 1), lit(1)) <= tau * q)
    if (!exactGroup) { // r9: one shared candidate set + one verify
      val fa = few.select(col("__id").as("a_id"), col("__len").as("a_len"))
      val fb = few.select(col("__id").as("b_id"), col("__len").as("b_len"))
      val fewPairs = fa.join(fb,
          col("a_id") < col("b_id") &&
            abs(col("a_len") - col("b_len")) <= tau)
        .select(col("a_id"), col("b_id"))
      probed.unionAll(fewPairs).distinct()
        .join(sa, "a_id").join(sb, "b_id")
        .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
        .filter(col("dist") <= tau)
        .select(col("a_id"), col("b_id"), col("dist"))
    } else { // r10: exact-grouped fallback + output-wide distinct
      val probedVerified = probed.distinct()
        .join(sa, "a_id").join(sb, "b_id")
        .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
        .filter(col("dist") <= tau)
        .select(col("a_id"), col("b_id"), col("dist"))
      val reps = few.groupBy(col("__s"), col("__len"))
        .agg(min(col("__id")).as("__rep"))
      val members = few.join(reps.select(col("__s"), col("__rep")), Seq("__s"))
        .select(col("__rep"), col("__id"))
      val ra = reps.select(col("__rep").as("__ra"), col("__s").as("__sra"),
        col("__len").as("__la"))
      val rb = reps.select(col("__rep").as("__rb"), col("__s").as("__srb"),
        col("__len").as("__lb"))
      val repVerified = ra.join(rb,
          col("__ra") < col("__rb") &&
            abs(col("__la") - col("__lb")) <= tau)
        .withColumn("dist", levenshtein(col("__sra"), col("__srb")))
        .filter(col("dist") <= tau)
        .select(col("__ra"), col("__rb"), col("dist"))
      val crossPairs = repVerified
        .join(members.select(col("__rep").as("__ra"), col("__id").as("__ida")),
          "__ra")
        .join(members.select(col("__rep").as("__rb"), col("__id").as("__idb")),
          "__rb")
        .select(least(col("__ida"), col("__idb")).as("a_id"),
          greatest(col("__ida"), col("__idb")).as("b_id"), col("dist"))
      val withinPairs = members.select(col("__rep"), col("__id").as("a_id"))
        .join(members.select(col("__rep"), col("__id").as("b_id")), Seq("__rep"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), lit(0).as("dist"))
      probedVerified.unionByName(crossPairs).unionByName(withinPairs)
        .distinct()
    }
  }

  /** q208's tail over a pair frame. */
  private def q208Tail(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("a_id").as("id"), col("dist"))
      .unionAll(pairs.select(col("b_id").as("id"), col("dist")))
    sym.groupBy(col("id"))
      .agg(sum(when(col("dist") <= 1, 1L).otherwise(0L)).as("n_d1"),
        count(lit(1)).as("n_d2"))
      .orderBy(col("n_d2").desc, col("id"))
      .limit(100)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPEAT", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceKnownBenignWarnings()

    def corpus = graft.queries.Dedup.typoCorpus(spark, sfDir)
    // probe path only — CORRECT solely on corpora with an empty short
    // class (true for q208's 19/20-char identifiers); isolates what the
    // always-built fallback machinery costs when it carries no rows
    def probeOnly(): DataFrame = {
      val tau = 2; val q = 3
      val s = corpus.select(col("id").as("__id"), col("nm").as("__s"),
        length(col("nm")).as("__len"))
      val grams = s.select(col("__id"), col("__len"),
        posexplode(expr(
          s"transform(sequence(1, greatest(__len - ${q - 1}, 1)), " +
            s"i -> substring(__s, i, $q))")).as(Seq("__p0", "__g")))
        .select(col("__id"), col("__len"), (col("__p0") + 1).as("__pos"),
          col("__g"))
      val freq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
      val prefix = grams.filter(col("__len") >= tau * q + q)
        .join(freq, "__g")
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("__id"))
            .orderBy(col("__f"), col("__g"), col("__pos"))))
        .filter(col("__r") <= tau * q + 1)
        .select(col("__id").as("p_id"), col("__len").as("p_len"),
          col("__pos").as("p_pos"), col("__g").as("__ga"))
      val index = grams
        .select(col("__id").as("i_id"), col("__len").as("i_len"),
          col("__pos").as("i_pos"), col("__g").as("__gb"))
      val probed = prefix.join(index,
          col("__ga") === col("__gb") &&
            col("p_id") =!= col("i_id") &&
            abs(col("p_pos") - col("i_pos")) <= tau &&
            abs(col("p_len") - col("i_len")) <= tau)
        .select(least(col("p_id"), col("i_id")).as("a_id"),
          greatest(col("p_id"), col("i_id")).as("b_id"))
      probed.distinct()
        .join(s.select(col("__id").as("a_id"), col("__s").as("__sa")), "a_id")
        .join(s.select(col("__id").as("b_id"), col("__s").as("__sb")), "b_id")
        .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
        .filter(col("dist") <= tau)
        .select(col("a_id"), col("b_id"), col("dist"))
    }
    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "r9" -> (() => q208Tail(joinHistoric(corpus, "id", "nm", 2, 3,
        exactGroup = false))),
      "r10" -> (() => q208Tail(joinHistoric(corpus, "id", "nm", 2, 3,
        exactGroup = true))),
      "r12" -> (() => q208Tail(graft.operators.EdJoin
        .join(corpus, "id", "nm", tau = 2, q = 3))),
      "probe_only" -> (() => q208Tail(probeOnly())))

    // the three shapes must agree before their timings mean anything
    val outs = shapes.map { case (n, f) =>
      n -> f().collect().map(_.toSeq).toSet }
    require(outs.forall(_._2 == outs.head._2),
      "shape outputs diverge — timing comparison void")

    // interleaved rounds so drift hits every shape symmetrically
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      shapes.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().collect()
        times(n) = (System.nanoTime() - t0) / 1e9 :: times(n)
      }
    }
    val mins = shapes.map { case (n, _) => n -> times(n).min }
    println(mins.map { case (n, t) => s""""$n":${f"$t%.2f"}""" }
      .mkString(s"""{"metric":"edjoin_ab_q208_min_of_$reps","sf":"$sfDir",""",
        ",", "}"))
    spark.stop()
  }
}
