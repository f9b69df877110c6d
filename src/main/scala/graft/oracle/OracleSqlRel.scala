package graft.oracle

/** DuckDB mirrors of [[graft.pipeline.RelOps]] — money/value doubles
  * become per-row micro-unit BIGINTs before any SUM, so aggregation is
  * exact-integer in both engines. */
object OracleSqlRel {

  val eventsHourly: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS wstart,
      |       event_type,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT)
      |         AS val_micro
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  val q3Revenue: String =
    """SELECT o.o_orderpriority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |         1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY 1""".stripMargin

  val topkOrders: String =
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT) AS total_micro
      |FROM orders
      |ORDER BY total_micro DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  val rollupRevenue: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |       COALESCE(o_orderstatus, 'ALL') AS status,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT))
      |         AS BIGINT) AS total_micro
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin

  val distinctUsers: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin

  val q5LocalRevenue: String =
    """SELECT n.n_name,
      |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |         1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |              AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY 1""".stripMargin
}
