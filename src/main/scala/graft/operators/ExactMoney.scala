package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-integer arithmetic for monetary revenue sums — the fix for the
  * summation-order half-boundary class the sf0.1 oracle sweep caught
  * (q5/NATION_11: the true revenue sum landed EXACTLY on a 2-d.p. half,
  * 13237001.475, and the two engines' float summation orders rounded it
  * to different sides).
  *
  * Why rounding cannot fix this class: `round(sum(x), 2)` absorbs
  * summation-order ulps ONLY when the true sum is at least ~ulp away
  * from a .xx5 boundary. Sums of RAW 2-d.p. columns are safe (the true
  * sum IS a 2-d.p. value, 0.005 from the boundary), but products like
  * `l_extendedprice · (1 − l_discount)` have 4+ true decimals, so the
  * true sum can sit ON a half — and then no amount of rounding
  * discipline helps; which side each engine lands on is summation-order
  * luck that changes with data scale.
  *
  * The fix: sum in EXACT integer units. A 2-d.p. money column is an
  * exact integer count of cents; a 2-d.p. rate is an exact integer
  * percent. `Σ cents·(100 − pct)` is exact BIGINT arithmetic —
  * order-independent, overflow-safe to ~9·10¹⁸, identical on every
  * engine — and one final `CAST(… AS DOUBLE) / 10⁴` produces a
  * bit-identical IEEE quotient on both engines (identical dividend and
  * divisor), with the emitted value now the mathematically EXACT
  * revenue instead of a rounded approximation. DuckDB twin of each
  * helper is spelled in the probes' oracle SQL (`::BIGINT` of
  * `round(x·100, 0)`; bare decimal literals cast `::DOUBLE` per the
  * CLAUDE.md literal rule).
  */
object ExactMoney {

  /** Exact integer cents of a 2-d.p. monetary column: the stored double
    * is the nearest representable to an exact 2-d.p. value, so
    * `x·100` is within ulps of an integer and round-to-nearest recovers
    * it exactly on every engine (no true halves exist to disagree on).
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact integer percent of a 2-d.p. rate column (discount, tax). */
  def pct(c: Column): Column = round(c * 100, 0).cast("long")

  /** `Σ cents·(100 − pct(discount))` — the exact revenue sum in
    * 10⁻⁴-currency units. */
  def revenueUnits(price: Column, discount: Column): Column =
    sum(cents(price) * (lit(100L) - pct(discount)))

  /** Emit an exact integer-unit sum as currency: one division of the
    * identical dividend by the identical power-of-ten divisor —
    * bit-identical cross-engine, NEVER round() this (Spark rounds the
    * shortest-decimal rendering, DuckDB the numeric value — they split
    * exactly at the halves this machinery exists to avoid). */
  def asCurrency(units: Column, unitsPerCurrency: Double): Column =
    units.cast("double") / lit(unitsPerCurrency)
}
