package graft.operators

import graft.SparkSpecBase
import graft.core.Barriers._
import org.apache.spark.sql.functions._

/** Pins GraphAnn.beamSearch (q238): exact replay equality against a
  * driver-side reference of the same search, and the recall claim —
  * on a clustered corpus with cluster-covering entry points, beam
  * search over the NN-Descent graph reaches recall >= IVF given an
  * equal-or-larger IVF candidate budget. */
class GraphAnnSpec extends SparkSpecBase {

  private val dim = 8
  private val rnd = new scala.util.Random(4238)

  /** Clustered synthetic corpus: 8 well-separated clusters x 50 points
    * on the quantized grid (ids ordered by cluster). */
  private def corpus(): Seq[(Long, Array[Long])] = {
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextInt(20000).toLong))
    (0 until 400).map { i =>
      val c = centers(i / 50)
      (i.toLong, c.map(x => x + rnd.nextInt(201) - 100))
    }
  }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Driver-side replay of the exact beamSearch semantics. Returns
    * (per-query ranked answer, per-query seen budget). */
  private def refBeam(vecs: Map[Long, Array[Long]],
                      sym: Map[Long, Seq[Long]],
                      queries: Seq[Long], entries: Seq[Long],
                      beam: Int, rounds: Int, k: Int)
      : (Map[Long, Seq[(Long, Long)]], Map[Long, Int]) = {
    val answers = queries.map { q =>
      var seen = entries.map(e => e -> d2(vecs(q), vecs(e))).toMap
      var expanded = Set.empty[Long]
      (1 to rounds).foreach { _ =>
        val toExpand = seen.toSeq.filterNot(x => expanded(x._1))
          .sortBy { case (id, d) => (d, id) }.take(beam).map(_._1)
        expanded ++= toExpand
        val fresh = toExpand.flatMap(sym.getOrElse(_, Nil)).distinct
          .filterNot(seen.contains)
        seen = seen ++ fresh.map(e => e -> d2(vecs(q), vecs(e)))
      }
      val top = seen.toSeq.filter(_._1 != q)
        .sortBy { case (id, d) => (d, id) }.take(k)
      (q, top, seen.size)
    }
    (answers.map(a => a._1 -> a._2).toMap,
      answers.map(a => a._1 -> a._3).toMap)
  }

  test("beamSearch == driver-side replay of the same search (frontier " +
    "selection, fresh-only scoring, seen fold, final ranking) on a " +
    "clustered corpus") {
    val s = spark
    import s.implicits._
    val data = corpus()
    val vq = data.toDF("vec_id", "xq")
    val n = data.size.toLong
    val init = vq.select($"vec_id".as("v"),
        explode(sequence(lit(1), lit(6))).as("i"))
      .select($"v", (($"v" + $"i") % n).as("u"))
    val graphDf = NNDescent.build(vq, "vec_id", init, k = 6, rounds = 3)
      .select($"v", $"u").barrier()
    val queries = Seq(7L, 63L, 130L, 205L, 333L, 388L)
    val entries = (0 until 16).map(_ * 25L) // covers every cluster
    val got = GraphAnn.beamSearch(vq, "vec_id", graphDf,
        vq.filter($"vec_id".isin(queries: _*))
          .select($"vec_id".as("q_id"), $"xq"),
        entries.toDF("id"), beam = 6, rounds = 4, k = 8)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq
      }
    val vecs = data.toMap
    val edges = graphDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    val (want, _) = refBeam(vecs, sym, queries, entries, 6, 4, 8)
    queries.foreach { q =>
      assert(got(q) === want(q), s"query $q diverges from the replay")
    }
  }

  test("appendNodes (q240): order-free — appending the delta in two " +
    "sub-batches yields the same edges as one batch; appended edges hit " +
    "the true frozen top-k with recall >= 0.9 on the clustered corpus") {
    val s = spark
    import s.implicits._
    val data = corpus()
    val frozen = data.filter(_._1 < 320)
    val delta = data.filter(_._1 >= 320)
    val fq = frozen.toDF("vec_id", "xq")
    val n = frozen.size.toLong
    val init = fq.select($"vec_id".as("v"),
        explode(sequence(lit(1), lit(6))).as("i"))
      .select($"v", (($"v" + $"i") % n).as("u"))
    val graphDf = NNDescent.build(fq, "vec_id", init, k = 6, rounds = 3)
      .select($"v", $"u").barrier()
    val entries = (0 until 16).map(_ * 20L) // covers the frozen clusters
    def append(d: Seq[(Long, Array[Long])]) = GraphAnn
      .appendNodes(fq, "vec_id", graphDf, d.toDF("vec_id", "xq"),
        entries.toDF("id"), beam = 6, rounds = 4, k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val oneBatch = append(delta)
    val (h1, h2) = delta.splitAt(delta.size / 2)
    assert(append(h1) ++ append(h2) === oneBatch,
      "append is not sub-batch composable")
    // recall vs the true frozen top-6 per delta node
    val vecs = data.toMap
    val byNode = oneBatch.groupBy(_._1)
    val recalls = delta.map { case (id, x) =>
      val truth = frozen.sortBy { case (fid, fx) => (d2(x, fx), fid) }
        .take(6).map(_._1).toSet
      byNode(id).map(_._3).toSet.intersect(truth).size.toDouble / 6
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"append recall $recall below floor")
  }

  test("removeNodes (q241): live edges == anti-join brute force (deleted " +
    "gone as sources AND targets), and the degradation ledger matches a " +
    "per-node brute force") {
    val s = spark
    import s.implicits._
    val data = corpus()
    val vq = data.toDF("vec_id", "xq")
    val n = data.size.toLong
    val init = vq.select($"vec_id".as("v"),
        explode(sequence(lit(1), lit(6))).as("i"))
      .select($"v", (($"v" + $"i") % n).as("u"))
    val graphDf = NNDescent.build(vq, "vec_id", init, k = 6, rounds = 2)
      .barrier()
    val edges = graphDf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val delSet = data.map(_._1).filter(_ % 13 == 5).toSet
    val deleted = delSet.toSeq.toDF("vec_id")
    val (live, ledger) = GraphAnn.removeNodes(graphDf, deleted)
    val gotLive = live.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val wantLive = edges.filterNot(e => delSet(e._1) || delSet(e._3)).toSet
    assert(gotLive === wantLive)
    val gotLed = ledger.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val wantLed = edges.filterNot(e => delSet(e._1)).groupBy(_._1)
      .map { case (v, es) =>
        val lost = es.count(e => delSet(e._3)).toLong
        v -> (es.size.toLong, lost, es.size - lost)
      }
    assert(gotLed === wantLed)
  }

  test("recall: beam search over the KNN graph >= IVF given an " +
    "equal-or-larger candidate budget (clustered corpus, " +
    "cluster-covering entries — the navigability knob HNSW's top " +
    "layer plays)") {
    val s = spark
    import s.implicits._
    val data = corpus()
    val vecs = data.toMap
    val vq = data.toDF("vec_id", "xq")
    val n = data.size.toLong
    val init = vq.select($"vec_id".as("v"),
        explode(sequence(lit(1), lit(6))).as("i"))
      .select($"v", (($"v" + $"i") % n).as("u"))
    val graphDf = NNDescent.build(vq, "vec_id", init, k = 6, rounds = 3)
      .select($"v", $"u").barrier()
    val queries = Seq(3L, 77L, 141L, 222L, 319L, 395L)
    val entries = (0 until 16).map(_ * 25L)
    val k = 8
    val got = GraphAnn.beamSearch(vq, "vec_id", graphDf,
        vq.filter($"vec_id".isin(queries: _*))
          .select($"vec_id".as("q_id"), $"xq"),
        entries.toDF("id"), beam = 6, rounds = 4, k = k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    // ground truth + the search's actual scored budget (replay)
    val edges = graphDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    val (_, budget) = refBeam(vecs, sym, queries, entries, 6, 4, k)
    def truth(q: Long): Set[Long] = vecs.toSeq.filter(_._1 != q)
      .sortBy { case (id, v) => (d2(vecs(q), v), id) }.take(k).map(_._1).toSet
    val beamRecall = queries.map(q =>
      got(q).intersect(truth(q)).size.toDouble / k).sum / queries.size
    // IVF with the SAME corpus partitioned into its true 8 clusters and
    // nprobe sized so IVF scans >= the beam's scored budget
    val maxBudget = budget.values.max
    val nprobe = math.max(1, math.ceil(maxBudget / 50.0).toInt)
    val ivfRecall = queries.map { q =>
      val probed = (0 until 8).sortBy { c =>
        val center = (0 until 50).map(i => vecs(c * 50L + i))
          .transpose.map(_.sum / 50)
        (d2(vecs(q), center.toArray), c)
      }.take(nprobe)
      val cand = probed.flatMap(c => (0 until 50).map(i => c * 50L + i))
        .filter(_ != q)
      val top = cand.sortBy(id => (d2(vecs(q), vecs(id)), id)).take(k).toSet
      top.intersect(truth(q)).size.toDouble / k
    }.sum / queries.size
    assert(beamRecall >= ivfRecall,
      s"beam recall $beamRecall < IVF recall $ivfRecall at budget " +
        s"$maxBudget (nprobe $nprobe)")
    assert(beamRecall >= 0.9, s"beam recall $beamRecall below floor")
  }

  test("layered search (q280): beamSearchFrom with cross-joined seeds == " +
    "beamSearch (the refactor is an identity), and hierarchical entry " +
    "selection beats the single fixed entry at an equal layer-0 budget " +
    "on the clustered corpus") {
    val s = spark
    import s.implicits._
    val data = corpus()
    val vq = data.toDF("vec_id", "xq")
    val n = data.size.toLong
    val init0 = vq.select($"vec_id".as("v"),
        explode(sequence(lit(1), lit(6))).as("i"))
      .select($"v", (($"v" + $"i") % n).as("u"))
    val g0 = NNDescent.build(vq, "vec_id", init0, k = 6, rounds = 3)
      .select($"v", $"u").barrier()
    val queries = Seq(63L, 130L, 205L, 333L, 388L) // far from node 0
    val qDf = vq.filter($"vec_id".isin(queries: _*))
      .select($"vec_id".as("q_id"), $"xq").barrier()
    val k = 6
    def collectAns(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    // identity: entries-form == seeds-form with the same cross join
    val entries = Seq(0L, 200L).toDF("id")
    val viaEntries = collectAns(GraphAnn.beamSearch(
      vq, "vec_id", g0, qDf, entries, beam = 4, rounds = 3, k = k))
    val seedsCross = qDf.select($"q_id").crossJoin(entries)
    val viaSeeds = collectAns(GraphAnn.beamSearchFrom(
      vq, "vec_id", g0, qDf, seedsCross, beam = 4, rounds = 3, k = k))
    assert(viaEntries === viaSeeds)
    // hierarchical: 1-in-8 top layer (KNN + exponential-stride ring,
    // q280's navigable construction) searched from node 0; top-2 seeds
    val top = vq.filter($"vec_id" % 8 === 0)
    val m = top.count()
    val strides = (0 until 20).map(1L << _).filter(_ < m)
    val ring = top.select($"vec_id".as("v"),
        explode(lit(strides.toArray)).as("st"))
      .select($"v", expr(s"((v DIV 8) + st) % $m * 8").as("u"))
    val g1 = NNDescent.build(top, "vec_id", ring, k = 3, rounds = 2)
      .select($"v", $"u").unionByName(ring.select($"v", $"u")).barrier()
    val stage1 = GraphAnn.beamSearch(top, "vec_id", g1, qDf,
      Seq(0L).toDF("id"), beam = 3, rounds = 3, k = 2)
    val layered = collectAns(GraphAnn.beamSearchFrom(
      vq, "vec_id", g0, qDf, stage1.select($"q_id", $"id"),
      beam = 4, rounds = 3, k = k))
    val fixed = collectAns(GraphAnn.beamSearch(
      vq, "vec_id", g0, qDf, Seq(0L).toDF("id"), beam = 4, rounds = 3, k = k))
    val vecs = data.toMap
    def recall(ans: Map[Long, Seq[Long]]) = queries.map { q =>
      val truth = data.filter(_._1 != q)
        .sortBy { case (id, x) => (d2(vecs(q), x), id) }.take(k)
        .map(_._1).toSet
      ans.getOrElse(q, Nil).toSet.intersect(truth).size.toDouble / k
    }.sum / queries.size
    val (rl, rf) = (recall(layered), recall(fixed))
    assert(rl >= rf,
      s"layered recall $rl < fixed-entry recall $rf at equal budget")
    assert(rl >= 0.9, s"layered recall $rl below floor")
  }
}
