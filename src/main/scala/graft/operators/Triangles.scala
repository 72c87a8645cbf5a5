package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by the degree-ordered "forward" algorithm
  * (Schank & Wagner '05; the MapReduce form is Suri & Vassilvitskii
  * '11) — the graph-analytics staple behind clustering coefficients,
  * community density and spam/bot subgraph detection.
  *
  * Every edge is ORIENTED from its (degree, id)-smaller endpoint to
  * the larger; a wedge (u→v, u→w) with v before w in that order closes
  * into a triangle iff the oriented edge v→w exists. Each triangle is
  * found exactly once, and — the scale property — a node only serves
  * as wedge apex for edges where it is the LOWER-degree endpoint, so a
  * celebrity node of degree d generates O(d) wedges from its few
  * low-degree partners instead of the naive O(d²): total wedge volume
  * is bounded by O(E^1.5) on any graph (arboricity bound), shuffles
  * are all equi-joins on compact node ids, and no neighbor list is
  * ever materialized in executor memory.
  *
  * Determinism: counts and integer ids only — no ordering sensitivity.
  * The q108 DuckDB oracle mirrors every step; the naive 3-join count
  * equality is additionally pinned in ScalaTest on random graphs.
  */
object Triangles {

  /** Per-node triangle participation counts: (node, n_triangles), one
    * row per node that belongs to at least one triangle. Input edges
    * are undirected; self-loops, duplicates and reversed copies are
    * tolerated. */
  def participation(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge set
    val e = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient by (degree, id); carry the head's degree for wedge ordering
    val o = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("dv"))
          .otherwise(col("du")).as("td"))
      .persist() // feeds the wedge join twice and the closure once
    val wedges = o.select(col("s"), col("t").as("w1"), col("td").as("wd1"))
      .join(o.select(col("s"), col("t").as("w2"), col("td").as("wd2")), Seq("s"))
      .filter(struct(col("wd1"), col("w1")) < struct(col("wd2"), col("w2")))
      .select(col("s"), col("w1"), col("w2"))
    val tri = wedges.join(
      o.select(col("s").as("w1"), col("t").as("w2")), Seq("w1", "w2"))
    tri.select(col("s").as("node"))
      .unionByName(tri.select(col("w1").as("node")))
      .unionByName(tri.select(col("w2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
