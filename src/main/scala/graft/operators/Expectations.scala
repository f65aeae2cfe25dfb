package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Deequ-style
  * contract layer: each expectation states a column invariant and a
  * violation budget in ppm; the checker computes every metric in ONE
  * aggregation pass over the table and returns one verdict row per
  * expectation. At 100 TB the single-pass shape matters: N expectations
  * cost one scan + one (tiny) aggregate, not N jobs, and the output is
  * integer ppm — exact, engine-independent, alert-ready.
  *
  * `Unique` is the exception that needs distinct counting; it rides the
  * same pass via count_distinct (Spark plans one expand), counting each
  * duplicated EXTRA row as a violation ((n − distinct) / n).
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    def colName: String
    def budgetPpm: Long
  }
  /** Null fraction must not exceed the budget. */
  final case class NotNull(colName: String, budgetPpm: Long = 0)
      extends Expectation { val name = "not_null" }
  /** Duplicate rows (beyond the first per value) within budget. */
  final case class Unique(colName: String, budgetPpm: Long = 0)
      extends Expectation { val name = "unique" }
  /** Values outside [lo, hi] (nulls excluded) within budget. */
  final case class InRange(colName: String, lo: Double, hi: Double,
      budgetPpm: Long = 0) extends Expectation { val name = "in_range" }
  /** Values outside the accepted set (nulls excluded) within budget. */
  final case class AcceptedValues(colName: String, values: Seq[String],
      budgetPpm: Long = 0) extends Expectation { val name = "accepted_values" }

  /** One row per expectation: (expectation, column, violations, total,
    * violation_ppm, budget_ppm, passed). */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty)
    def violations(e: Expectation): Column = e match {
      case NotNull(c, _) =>
        sum(when(col(c).isNull, 1L).otherwise(0L))
      case Unique(c, _) =>
        count(col(c)) - count_distinct(col(c))
      case InRange(c, lo, hi, _) =>
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L))
      case AcceptedValues(c, vs, _) =>
        sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L)
          .otherwise(0L))
    }
    val metrics = expectations.zipWithIndex.map { case (e, i) =>
      coalesce(violations(e), lit(0L)).cast("long").as(s"__v$i")
    }
    val agg = df.agg(count(lit(1)).as("__total"), metrics: _*)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("expectation"), lit(e.colName).as("col_name"),
        col(s"__v$i").as("violations"), col("__total").as("total"),
        when(col("__total") === 0, 0L)
          .otherwise(expr(s"(1000000 * __v$i) div __total")).as("violation_ppm"),
        lit(e.budgetPpm).as("budget_ppm"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      // exact cross-multiplied verdict: comparing the TRUNCATED ppm
      // would let a zero-budget expectation pass with up to total/1e6
      // real violations (5 nulls in 10M rows truncate to 0 ppm)
      .withColumn("passed",
        col("violations") * 1000000L <= col("budget_ppm") * col("total"))
  }
}
