package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash-exact float math for the DuckDB differential oracle (SURVEY.md §5.2).
  *
  * Summing doubles is order-dependent, and Spark's partitioned partial
  * aggregation makes the order nondeterministic. Every money/measure
  * aggregate therefore goes through exact DECIMAL arithmetic (associative,
  * commutative) and is rendered back to DOUBLE only at the very end — the
  * final double is then a deterministic function of the data, identical in
  * Spark and DuckDB, and identical across any partitioning/cluster size.
  *
  * Corpus measures are 2-decimal-place values (FIXTURES.md), so:
  *  - prices/amounts  -> DECIMAL(12,2)  (max ~5e5, 2dp)
  *  - rates (disc/tax)-> DECIMAL(8,4)   (0.00-0.10, 2dp)
  * Products stay well under DECIMAL(38,_) so no precision-loss rounding is
  * ever triggered in either engine: (12,2)x(9,4)x(9,4) = (32,10).
  */
object Exact {
  val Money: DecimalType = DecimalType(12, 2)
  val Rate: DecimalType  = DecimalType(8, 4)

  def money(c: Column): Column = c.cast(Money)
  def rate(c: Column): Column  = c.cast(Rate)

  /** (1 - rate) / (1 + rate), re-cast to Rate so chained products stay under
    * DECIMAL(38) — otherwise Spark's precision-loss rounding diverges from
    * DuckDB's exact arithmetic. Exact: rates are 2dp in [0, 0.10]. */
  def oneMinus(c: Column): Column = (lit(1) - rate(c)).cast(Rate)
  def onePlus(c: Column): Column  = (lit(1) + rate(c)).cast(Rate)

  /** Final decimal -> double rendering. MUST go through DECIMAL(18,6): with
    * scale 6 and |value| < 1e12 the scaled integer stays below 2^53, so the
    * int->double conversion is exact and the divide-by-10^6 is one correctly
    * rounded IEEE op in every engine. Casting a wider decimal (int128) to
    * double double-rounds in DuckDB and diverges from Spark by 1 ULP. */
  val Out: DecimalType = DecimalType(18, 6)
  def toDbl(c: Column): Column = c.cast(Out).cast(DoubleType)

  /** Exact sum of a 2dp measure, rendered as double. */
  def dsum(c: Column): Column = toDbl(sum(money(c)))

  /** Deterministic avg: exact decimal sum -> double -> IEEE divide by count. */
  def davg(c: Column): Column = toDbl(sum(money(c))) / count(c)

  // DuckDB twins for the above (string builders keep the two sides in sync).
  def sqlMoney(x: String): String = s"CAST($x AS DECIMAL(12,2))"
  def sqlRate(x: String): String  = s"CAST($x AS DECIMAL(8,4))"
  def sqlOneMinus(x: String): String = s"CAST(1 - ${sqlRate(x)} AS DECIMAL(8,4))"
  def sqlOnePlus(x: String): String  = s"CAST(1 + ${sqlRate(x)} AS DECIMAL(8,4))"
  def sqlToDbl(x: String): String = s"CAST(CAST($x AS DECIMAL(18,6)) AS DOUBLE)"
  def sqlDsum(x: String): String  = sqlToDbl(s"SUM(${sqlMoney(x)})")
  def sqlDavg(x: String): String  = s"${sqlToDbl(s"SUM(${sqlMoney(x)})")} / COUNT($x)"
}
