package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic two-copy placement for ATOMIC-ROW serving stores (SURVEY.md
  * §2.11a X122d, q318): [[ReplicatedCodes]] replicates the SQ8 rows
  * and [[ReplicatedIndex]] the compressed blocks; the remaining named
  * vector store — the q280 NAVIGABLE-GRAPH tier — is rows too (a
  * vertex's quantized vector + its adjacency list entries), and a real
  * deployment CO-PLACES a vector's adjacency with its codes on the
  * same nodes (a traversal that lands on a vertex needs both). This
  * operator is that placement, factored once:
  *
  *   - every row keys by an id column; the id's preference list is
  *     [[ReplicatedCodes.position]]'s vec ring (the SAME ring as the
  *     codes — co-placement falls out of sharing the hash);
  *   - the primary copy carries a `shard` column, the replica copy
  *     (node, origin) — q294's key shapes on bare rows;
  *   - [[failover]] of node x returns the ORIGINAL row set: primaries
  *     of nodes ≠ x ∪ replica rows with origin = x, a row-set
  *     PARTITION — so any computation that is a pure function of the
  *     row SET (a beam search over edges, an ADC scan over codes) is
  *     answer-invariant under every failover, which is exactly the
  *     property q318 gates for the graph traversal (iterative, so a
  *     single lost row would change paths — the invariance is a real
  *     claim, not a tautology about one scan).
  *
  * Scale: one broadcast doubled-ring join over the DISTINCT id list
  * per store; the copies are row unions (the 2× write amplification);
  * failover is a filter + union, never a shuffle of the payload. */
object ReplicatedRows {

  /** Both copies of `rows`, placed by `idCol` on the vec ring.
    * Returns (primary with `shard`, replica with `node`/`origin`). */
  /** Placement/key column names the payload frame must not use — the
    * build join and the copies' keys would become ambiguous or
    * silently wrong (ADVICE r17). */
  private val Reserved = Set("primary", "replica", "shard", "node", "origin")

  def build(rows: DataFrame, idCol: String,
      nShards: Int): (DataFrame, DataFrame) = {
    val clash = rows.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"ReplicatedRows.build: payload columns ${clash.mkString(", ")} " +
        "collide with placement keys (primary/replica/shard/node/origin)")
    val s = rows.sparkSession
    import s.implicits._
    val ids = rows.select(col(idCol).as("doc_id")).distinct()
      .withColumn("p", ReplicatedCodes.position($"doc_id"))
    val a = ReplicatedIndex.assignPR(ids, nShards)
      .select($"doc_id".as(idCol), $"primary", $"replica")
    val joined = rows.join(a, idCol)
    val payload = rows.columns.map(col)
    val primary = joined.select(($"primary".as("shard") +: payload): _*)
    val replica = joined.select(($"replica".as("node") +:
      $"primary".as("origin") +: payload): _*)
    (primary, replica)
  }

  /** The original row set with node `failed` down — a partition of the
    * rows, every one served from a surviving copy. */
  def failover(primary: DataFrame, replica: DataFrame,
      failed: Long): DataFrame = {
    val payload = primary.columns.filterNot(_ == "shard").map(col)
    primary.filter(col("shard") =!= failed).select(payload: _*)
      .unionByName(replica.filter(col("origin") === failed)
        .select(payload: _*))
  }
}
