package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins ClusterTakedown.removeFromClusters (q242) against a full
  * rebuild on the survivors — including the two behaviors no row
  * filter reproduces: representative re-election and component
  * SPLITS when a bridging signature vanishes. */
class ClusterTakedownSpec extends SparkSpecBase {

  private val k = 2
  private val bits = 56

  private def rebuildLabels(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    // brute-force union-find over surviving ids at hamming <= k
    val ids = rows.map(_._1).sorted
    val sig = rows.toMap
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- ids; j <- ids if i < j
         if java.lang.Long.bitCount((sig(i) ^ sig(j)) & ((1L << bits) - 1)) <= k) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    ids.map(i => i -> find(i)).toMap
  }

  private def run(rows: Seq[(Long, Long)], deleted: Seq[Long]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ClusterTakedown.removeFromClusters(
        rows.toDF("id", "sig"), "id", "sig",
        deleted.toDF("id"), k, bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bridge deletion SPLITS the component: A-B-C chained only through " +
    "B; deleting every copy of B leaves {A} and {C} as separate clusters") {
    val a = 0x00000000000000L
    val b = a ^ 3L            // dist 2 from a
    val c = b ^ (3L << 10)    // dist 2 from b, dist 4 from a
    val rows = Seq((1L, a), (2L, b), (3L, b), (4L, c))
    val got = run(rows, Seq(2L, 3L))
    val want = rebuildLabels(Seq((1L, a), (4L, c)))
    assert(got === want)
    assert(got(1L) !== got(4L), "the split did not happen")
  }

  test("representative re-election: deleting a viral group's min id " +
    "re-labels with the next surviving member, matching the rebuild") {
    val h = 0x123456789aL
    val near = h ^ 1L
    val rows = (10L to 20L).map(i => (i, h)) :+ ((30L, near))
    val got = run(rows, Seq(10L, 11L))
    val want = rebuildLabels(rows.filterNot(r => Set(10L, 11L)(r._1)))
    assert(got === want)
    assert(got(12L) === 12L && got(30L) === 12L)
  }

  test("untouched components keep their member sets and get " +
    "min-surviving-id labels without any re-closure; fully-deleted " +
    "components disappear; randomized corpora match the rebuild") {
    val rnd = new scala.util.Random(4242)
    (0 until 5).foreach { trial =>
      val base = Seq.fill(12)(rnd.nextLong() & ((1L << bits) - 1))
      val rows = base.zipWithIndex.flatMap { case (h, i) =>
        val copies = 1 + rnd.nextInt(3)
        (0 until copies).map(c => ((i * 10 + c).toLong, h)) ++
          (if (rnd.nextBoolean())
            Seq(((i * 10 + 5).toLong, h ^ (1L << rnd.nextInt(bits)))) else Nil)
      }
      val ids = rows.map(_._1)
      val deleted = ids.filter(_ => rnd.nextInt(3) == 0)
      val got = run(rows, deleted)
      val want = rebuildLabels(rows.filterNot(r => deleted.contains(r._1)))
      assert(got === want, s"trial $trial diverged from the rebuild")
    }
  }

  test("viral component: one component dwarfs the rest; labels match the " +
    "rebuild and the untouched-label plan carries NO window partitioned " +
    "by component (groupBy + broadcast join back — the skew-immune shape)") {
    val s = spark
    import s.implicits._
    val viral = 0x5a5a5a5aL
    // 400 members in ONE component (viral sig + a 1-bit neighbor),
    // plus 20 singleton components and one small deleted-from group
    val rows = (0L until 400L).map(i => (i, if (i % 7 == 0) viral ^ 1L else viral)) ++
      (1000L until 1020L).map(i => (i, 0x1000L * i)) ++
      Seq((2000L, 0x77777777L), (2001L, 0x77777777L))
    val got = run(rows, Seq(2000L)) // nothing vanishes -> untouched path only
    val want = rebuildLabels(rows.filterNot(_._1 == 2000L))
    assert(got === want)
    assert(got.count(_._2 == 0L) === 400, "the viral component broke")
    val plan = ClusterTakedown.removeFromClusters(
        rows.toDF("id", "sig"), "id", "sig",
        Seq(2000L).toDF("id"), k, bits)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(component"),
      "member-level window over component is back — viral-cluster skew")
  }

  test("no vanished signature -> the re-closure branch is skipped " +
    "(isEmpty early-out) and labels still match the rebuild") {
    val h = 0xabcdefL
    val rows = Seq((1L, h), (2L, h), (3L, h ^ 1L), (40L, 0x0f0f0f0f0fL))
    val got = run(rows, Seq(1L)) // sig h keeps id 2 -> nothing vanishes
    val want = rebuildLabels(rows.filterNot(_._1 == 1L))
    assert(got === want)
    assert(got(2L) === 2L && got(3L) === 2L)
  }
}
