package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Exact

/** OLAP surface beyond the reference (SURVEY.md §2.5 notes the
  * reference has no real analytics): rollup, pivot, and the window
  * function suite. Parity notes: rollup's null group keys need
  * explicit NULLS FIRST in the oracle (DuckDB defaults NULLS LAST,
  * Spark ascending defaults nulls first); pivot cells with no rows are
  * null in Spark vs 0 for DuckDB's count FILTER — na.fill(0) aligns.
  */
object OlapQueries {

  private val DEC = "DECIMAL(18,2)"
  private def dsum(c: String) = s"CAST(sum(CAST($c AS $DEC)) AS DOUBLE)"

  val queries: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q42
    Q("q42_rollup",
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---------------------------------------------------------------- q66
    // CUBE completes the OLAP grouping family (ROLLUP q42, GROUPING
    // SETS q51, pivot q43): all four (flag, status) subtotal
    // combinations, with grouping() flags disambiguating real nulls
    // from subtotal rows.
    Q("q66_cube",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
         |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
         |  count(*) AS n, ${dsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"), Exact.dsum(col("l_extendedprice")).as("sum_price"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"),
          col("g_status"), col("n"), col("sum_price"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---------------------------------------------------------------- q43
    Q("q43_pivot",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    },

    // ---------------------------------------------------------------- q44
    // The window-function suite over customer order history.
    Q("q44_window_suite",
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number()  OVER w AS BIGINT) AS rn,
        |  CAST(rank()        OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank()  OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4)      OVER w AS BIGINT) AS quartile,
        |  lag(o_orderkey)    OVER w AS prev_order,
        |  lead(o_orderkey)   OVER w AS next_order,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          first(col("o_orderkey")).over(w).as("first_order"),
          count(lit(1)).over(Window.partitionBy(col("o_custkey"))).as("n_orders"))
        .orderBy("o_custkey", "rn")
    }
  )
}
