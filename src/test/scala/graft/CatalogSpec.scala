package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog generator's anti-drift contract: the family list must
  * flatten to exactly the driver registry, every query must resolve a
  * file:line anchor, and the rendered index must carry every query name
  * — a new query family that forgets to register here fails loudly.
  */
class CatalogSpec extends AnyFunSuite {

  test("catalog families flatten to exactly SparkEntry.registry") {
    val cat = Catalog.families.flatMap(_._2).map(_.name)
    val reg = SparkEntry.registry.map(_.name)
    assert(cat === reg,
      "Catalog.families and SparkEntry.registry diverged — keep both lists in sync")
  }

  test("rendered catalog anchors every query to its defining file:line " +
    "and carries a scale note for the overwhelming majority") {
    val md = Catalog.render(".")
    val names = SparkEntry.registry.map(_.name)
    for (n <- names)
      assert(md.contains(s"| $n |"), s"$n missing from rendered catalog")
    // every row's Where column must be file:line, not a bare file
    val rows = md.linesIterator.filter(_.startsWith("| q")).toSeq
    assert(rows.size === names.size)
    for (r <- rows)
      assert(r.matches(".*\\.scala:\\d+ \\|$"), s"row lacks a line anchor: $r")
    // scale posture: queries with a dedicated `Scale:` scaladoc
    // paragraph get a per-row note (~1/3 of the registry); the rest
    // inherit the family-level posture rendered in each section intro.
    // Pin both: a floor on per-row notes and an intro for every family.
    val withNote = rows.count(_.split("\\|")(4).trim.nonEmpty)
    assert(withNote >= names.size / 5,
      s"only $withNote/${names.size} rows carry a scale note")
    for ((fam, _) <- Catalog.families)
      assert(md.contains(s"## $fam ("), s"family section missing: $fam")
  }

  test("every registered query declares a non-empty one-line doc") {
    val undocumented = SparkEntry.registry.filter(_.doc.trim.isEmpty).map(_.name)
    assert(undocumented.isEmpty,
      s"queries without doc strings: ${undocumented.mkString(", ")}")
  }
}
