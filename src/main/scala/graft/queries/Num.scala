package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine deterministic rounding.
  *
  * Spark's round() (BigDecimal HALF_UP on the exact double) and DuckDB's
  * round() (libm on value*10^n) disagree on representation ties — e.g.
  * 0.49125 rounds to 0.4912 in Spark and 0.4913 in DuckDB. Both sides of
  * the oracle therefore use the SAME pure-double expression
  * floor(x * 10^n + 0.5) / 10^n, which every engine evaluates bit-identically.
  */
object Num {
  def r(c: Column, n: Int): Column = {
    val s = math.pow(10, n).toLong
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** The DuckDB-side macro: same expression, textual. */
  def rSql(expr: String, n: Int): String = {
    val s = math.pow(10, n).toLong
    s"floor(($expr) * $s + 0.5) / $s"
  }
}
