package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the dbt-tests/Deequ-style
  * check runner a warehouse gates loads with (reference surface: the
  * validation counters scattered through the reference's cleaning DAG,
  * generalized into a reusable declarative runner; the Spark-first shape
  * is original). Each check compiles to relational aggregates and the
  * suite returns ONE small frame:
  *   (check_name, n_violations, n_rows, pass)
  *
  * Scale shape: every ROW-LOCAL check (not-null, range, accepted-values,
  * freshness) folds into a SINGLE corpus pass — one hash-agg whose
  * partial aggregation collapses map-side, then the bounded 1-row result
  * fans out to one output row per check (explode of a literal struct
  * array — no second scan). Key checks cost what they must: uniqueness
  * is one groupBy shuffle on the key, each foreign key one anti-join
  * (broadcast when the dim is small). Nothing collects to the driver. */
object Expectations {

  /** A declarative expectation over one table. */
  sealed trait Check { def name: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }
  /** `cols` must be unique; violations = rows in over-occupied groups. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }
  /** Non-null `col` must lie in [lo, hi] (raw-value comparisons only —
    * no arithmetic, so doubles compare identically cross-engine). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"range:$col"
  }
  /** Non-null `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"accepted_values:$col"
  }
  /** Non-null `col` must exist in `dim.dimCol` (referential integrity). */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"fk:$col"
  }
  /** Freshness: max(date(col)) must reach `atLeast` (ISO date); one
    * violation when the table is stale. */
  final case class MinDate(col: String, atLeast: String) extends Check {
    def name = s"freshness:$col"
  }

  /** Run `checks` against `df`; returns one row per check. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: at least one check")
    val (rowLocal, keyed) = checks.partition {
      case _: Unique | _: ForeignKey => false
      case _                         => true
    }
    val frames =
      (if (rowLocal.nonEmpty) Seq(runRowLocal(df, rowLocal)) else Nil) ++
        keyed.map {
          case Unique(cols) =>
            val viol = df.groupBy(cols.map(col): _*)
              .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
              .agg(coalesce(sum(col("__c")), lit(0L)).as("n_violations"))
            withTotal(viol, df, Unique(cols).name)
          case ForeignKey(c, dim, dimCol) =>
            val viol = df.filter(col(c).isNotNull)
              .join(dim.select(col(dimCol).as(c)), Seq(c), "left_anti")
              .agg(count(lit(1)).as("n_violations"))
            withTotal(viol, df, ForeignKey(c, dim, dimCol).name)
          case other => sys.error(s"unreachable: $other")
        }
    frames.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .select(col("check_name"), col("n_violations"), col("n_rows"),
        col("pass"))
  }

  /** All row-local checks in ONE aggregate pass, fanned out to one row
    * per check from the bounded 1-row result. */
  private def runRowLocal(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      (c match {
        case NotNull(cl) => count(when(col(cl).isNull, 1))
        case InRange(cl, lo, hi) =>
          count(when(col(cl).isNotNull &&
            (col(cl) < lit(lo) || col(cl) > lit(hi)), 1))
        case InSet(cl, vs) =>
          count(when(col(cl).isNotNull && !col(cl).isin(vs: _*), 1))
        case MinDate(cl, atLeast) =>
          // NULL max (empty table / all-null column) must FAIL the
          // freshness gate, not slide through the NULL predicate to
          // otherwise(0): an empty table is maximally stale
          when(coalesce(max(to_date(col(cl))) >= to_date(lit(atLeast)),
            lit(false)), 0L).otherwise(1L)
        case other => sys.error(s"not row-local: $other")
      }).as(s"__v$i")
    }
    val agged = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"__v$i").cast("long").as("n_violations"))
    }
    agged.select(explode(array(structs: _*)).as("__c"),
        col("__n").cast("long").as("n_rows"))
      .select(col("__c.check_name"), col("__c.n_violations"), col("n_rows"))
  }

  /** Attach the table row count to a 1-row violation frame (1x1
    * broadcast cross join — the bounded stat-frame pattern). */
  private def withTotal(viol: DataFrame, df: DataFrame,
                        name: String): DataFrame =
    viol.crossJoin(broadcast(df.agg(count(lit(1)).as("n_rows"))))
      .select(lit(name).as("check_name"),
        col("n_violations").cast("long").as("n_violations"),
        col("n_rows").cast("long").as("n_rows"))
}
