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

  /** Q1 mirror: same per-row micro rounding (operand order mirrored),
    * averages as truncating integer division of the micro sums. */
  val q1Pricing: String =
    """WITH m AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS qty,
      |    CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS price,
      |    CAST(ROUND(l_discount * 1000000.0) AS BIGINT) AS disc,
      |    CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1000000.0)
      |      AS BIGINT) AS dp,
      |    CAST(ROUND(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) *
      |      1000000.0) AS BIGINT) AS ch
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |)
      |SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(qty) AS BIGINT) AS sum_qty_micro,
      |       CAST(SUM(price) AS BIGINT) AS sum_base_micro,
      |       CAST(SUM(dp) AS BIGINT) AS sum_disc_price_micro,
      |       CAST(SUM(ch) AS BIGINT) AS sum_charge_micro,
      |       CAST(SUM(qty) // COUNT(*) AS BIGINT) AS avg_qty_micro,
      |       CAST(SUM(price) // COUNT(*) AS BIGINT) AS avg_price_micro,
      |       CAST(SUM(disc) // COUNT(*) AS BIGINT) AS avg_disc_micro,
      |       COUNT(*) AS count_order
      |FROM m GROUP BY 1, 2""".stripMargin

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

  /** CUBE mirror ([[graft.pipeline.RelOps.cubeRevenue]]). */
  val cubeRevenue: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |       COALESCE(o_orderstatus, 'ALL') AS status,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT))
      |         AS BIGINT) AS total_micro
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  /** Pivot mirror ([[graft.pipeline.RelOps.pivotDailyValues]]): the
    * conditional-sum spelling of the same fixed-domain pivot. */
  val pivotDailyValues: String =
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
      |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |)
      |SELECT day,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN v END), 0)
      |    AS BIGINT) AS click_micro,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN v END), 0)
      |    AS BIGINT) AS error_micro,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN v END), 0)
      |    AS BIGINT) AS purchase_micro,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN v END), 0)
      |    AS BIGINT) AS signup_micro,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN v END), 0)
      |    AS BIGINT) AS view_micro
      |FROM e GROUP BY 1""".stripMargin

  val distinctUsers: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin

  /** SQL-surface mirror: the identical ANSI aggregation (SUM cast back
    * to BIGINT — DuckDB widens integer SUM to HUGEINT). */
  val sqlSourceStats: String =
    """SELECT source, COUNT(*) AS docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars,
      |       MIN(doc_id) AS first_doc
      |FROM documents GROUP BY source""".stripMargin

  /** HLL mirror: same md5-hash60 buckets, exact bit-smear ρ, exact
    * integer register sum, identical final double division. The
    * numerator literal is emitted from the SAME Scala expression the
    * engine uses, so both sides parse the identical double. */
  val hllDistinctUsers: String = {
    val numerator = 0.709 * 4096.0 * 1.8014398509481984e16
    s"""WITH hv AS (
      |  SELECT event_type, user_id,
      |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) AS h
      |  FROM events
      |),
      |w0 AS (SELECT event_type, h, h // 64 AS w FROM hv),
      |m1 AS (SELECT event_type, h, (w | (w >> 1))  AS w FROM w0),
      |m2 AS (SELECT event_type, h, (w | (w >> 2))  AS w FROM m1),
      |m4 AS (SELECT event_type, h, (w | (w >> 4))  AS w FROM m2),
      |m8 AS (SELECT event_type, h, (w | (w >> 8))  AS w FROM m4),
      |m16 AS (SELECT event_type, h, (w | (w >> 16)) AS w FROM m8),
      |m32 AS (SELECT event_type, h, (w | (w >> 32)) AS w FROM m16),
      |rv AS (
      |  SELECT event_type, h % 64 AS bucket,
      |         LEAST(55 - bit_count(w), 54) AS rho
      |  FROM m32
      |),
      |regs AS (
      |  SELECT event_type, bucket, MAX(rho) AS mj FROM rv GROUP BY 1, 2
      |),
      |allb AS (
      |  SELECT DISTINCT e.event_type, b.bucket
      |  FROM events e CROSS JOIN
      |    (SELECT unnest(range(0, 64)) AS bucket) b
      |),
      |sx AS (
      |  SELECT a.event_type,
      |         CAST(SUM(CAST(1 AS BIGINT) <<
      |           CAST(54 - COALESCE(r.mj, 0) AS INTEGER)) AS BIGINT) AS s
      |  FROM allb a LEFT JOIN regs r
      |    ON a.event_type = r.event_type AND a.bucket = r.bucket
      |  GROUP BY 1
      |),
      |ex AS (
      |  SELECT event_type, COUNT(DISTINCT user_id) AS exact
      |  FROM events GROUP BY 1
      |)
      |SELECT sx.event_type,
      |       CAST(ROUND($numerator / CAST(sx.s AS DOUBLE)
      |         * 1000000.0) AS BIGINT) AS est_micro,
      |       ex.exact
      |FROM sx JOIN ex ON sx.event_type = ex.event_type""".stripMargin
  }

  /** Rolling-HLL mirror ([[graft.pipeline.RelOps.hllRollingUsers]]):
    * identical per-day registers, RANGE(-6..0) merge on the day
    * ordinal, identical integer s per day → identical double divide. */
  val hllRollingUsers: String = {
    val numerator = 0.709 * 4096.0 * 1.8014398509481984e16
    s"""WITH ev AS (
      |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day
      |  FROM events
      |),
      |hv AS (
      |  SELECT day, user_id,
      |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) AS h
      |  FROM ev
      |),
      |w0 AS (SELECT day, h, h // 64 AS w FROM hv),
      |m1 AS (SELECT day, h, (w | (w >> 1))  AS w FROM w0),
      |m2 AS (SELECT day, h, (w | (w >> 2))  AS w FROM m1),
      |m4 AS (SELECT day, h, (w | (w >> 4))  AS w FROM m2),
      |m8 AS (SELECT day, h, (w | (w >> 8))  AS w FROM m4),
      |m16 AS (SELECT day, h, (w | (w >> 16)) AS w FROM m8),
      |m32 AS (SELECT day, h, (w | (w >> 32)) AS w FROM m16),
      |rv AS (
      |  SELECT day, h % 64 AS bucket,
      |         LEAST(55 - bit_count(w), 54) AS rho
      |  FROM m32
      |),
      |regs AS (SELECT day, bucket, MAX(rho) AS mj FROM rv GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.day, b.bucket
      |  FROM (SELECT DISTINCT day FROM ev) d
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) b
      |),
      |mg AS (
      |  SELECT g.day,
      |         MAX(r.mj) OVER (PARTITION BY g.bucket ORDER BY g.day
      |           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mmj
      |  FROM grid g LEFT JOIN regs r
      |    ON g.day = r.day AND g.bucket = r.bucket
      |),
      |sx AS (
      |  SELECT day,
      |         CAST(SUM(CAST(1 AS BIGINT) <<
      |           CAST(54 - COALESCE(mmj, 0) AS INTEGER)) AS BIGINT) AS s
      |  FROM mg GROUP BY 1
      |),
      |ex AS (
      |  SELECT wday AS day, COUNT(DISTINCT user_id) AS exact
      |  FROM (SELECT user_id,
      |          unnest(generate_series(day, day + 6)) AS wday
      |        FROM ev) e
      |  JOIN (SELECT DISTINCT day FROM ev) d ON e.wday = d.day
      |  GROUP BY 1
      |)
      |SELECT CAST(sx.day AS BIGINT) AS day,
      |       CAST(ROUND($numerator / CAST(sx.s AS DOUBLE)
      |         * 1000000.0) AS BIGINT) AS est_micro,
      |       ex.exact
      |FROM sx JOIN ex ON sx.day = ex.day""".stripMargin
  }

  /** Theta-overlap mirror ([[graft.pipeline.RelOps.thetaOverlapUsers]]):
    * same k-smallest KMV samples (window-ranked here — the oracle does
    * not need the bounded aggregate), same θ = min rule with the
    * exact-side fallback, same integer match count and single double
    * multiply. */
  val thetaOverlapUsers: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      |hv AS (
      |  SELECT event_type, user_id,
      |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) AS h
      |  FROM tu
      |),
      |r AS (
      |  SELECT event_type, h,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
      |           AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM hv
      |),
      |sk AS (SELECT event_type, h, rn, n FROM r WHERE rn <= 128),
      |th AS (
      |  SELECT event_type,
      |         CASE WHEN MAX(n) >= 128
      |              THEN MAX(CASE WHEN rn = 128 THEN h END)
      |              ELSE 1152921504606846976 END AS theta
      |  FROM sk GROUP BY 1
      |),
      |mm AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         LEAST(ta.theta, tb.theta) AS theta,
      |         CAST(COUNT(*) AS BIGINT) AS m
      |  FROM sk a
      |  JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
      |  JOIN th ta ON ta.event_type = a.event_type
      |  JOIN th tb ON tb.event_type = b.event_type
      |  WHERE a.h < LEAST(ta.theta, tb.theta)
      |  GROUP BY 1, 2, 3
      |),
      |ex AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         COUNT(DISTINCT a.user_id) AS exact
      |  FROM tu a
      |  JOIN tu b ON a.user_id = b.user_id
      |            AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |),
      |grid AS (
      |  -- every type_a < type_b pair emits a row, zero-filled (the
      |  -- engine's full-grid contract — pairs with no shared users
      |  -- report est 0 / exact 0 instead of vanishing)
      |  SELECT a.event_type AS type_a, b.event_type AS type_b
      |  FROM th a JOIN th b ON a.event_type < b.event_type
      |)
      |SELECT g.type_a, g.type_b,
      |       CAST(ROUND(COALESCE(mm.m, 0)
      |         * (CAST(1152921504606846976 AS DOUBLE)
      |            / CAST(COALESCE(mm.theta, 1152921504606846976) AS DOUBLE))
      |         * 1000000.0) AS BIGINT) AS est_micro,
      |       CAST(COALESCE(ex.exact, 0) AS BIGINT) AS exact
      |FROM grid g
      |LEFT JOIN mm ON g.type_a = mm.type_a AND g.type_b = mm.type_b
      |LEFT JOIN ex ON g.type_a = ex.type_a AND g.type_b = ex.type_b""".stripMargin

  val q14PromoShare: String =
    """WITH j AS (
      |  SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m')
      |           AS month,
      |         p.p_type,
      |         CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |           1000000.0) AS BIGINT) AS rev
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |),
      |g AS (
      |  SELECT month,
      |         CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
      |           AS BIGINT) AS promo_micro,
      |         CAST(SUM(rev) AS BIGINT) AS total_micro
      |  FROM j GROUP BY 1
      |)
      |SELECT month, promo_micro, total_micro,
      |       CAST(ROUND(CAST(promo_micro AS DOUBLE) /
      |         CAST(total_micro AS DOUBLE) * 1000000.0) AS BIGINT)
      |         AS share_micro
      |FROM g""".stripMargin

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

  val q7VolumeShipping: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |         1000000.0) AS BIGINT)) AS BIGINT) AS volume_micro
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |WHERE s.s_nationkey <> c.c_nationkey
      |GROUP BY 1, 2, 3""".stripMargin

  val q10Returns: String =
    """SELECT c.c_custkey, c.c_name,
      |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |         1000000.0) AS BIGINT)) AS BIGINT) AS lost_micro,
      |       COUNT(*) AS items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE l.l_returnflag = 'R'
      |GROUP BY 1, 2
      |ORDER BY lost_micro DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  val q6Forecast: String =
    """SELECT COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 1000000.0)
      |         AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  val q13OrderDist: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1
      |)
      |GROUP BY 1""".stripMargin

  val q15TopSupplier: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) *
      |           1000000.0) AS BIGINT)) AS BIGINT) AS total_rev_micro
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1
      |)
      |SELECT s.s_suppkey, s.s_name, r.total_rev_micro
      |FROM rev r
      |JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE r.total_rev_micro = (SELECT MAX(total_rev_micro) FROM rev)""".stripMargin

  val q18LargeOrders: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |         CAST(SUM(CAST(ROUND(l_quantity * 1000000.0) AS BIGINT))
      |           AS BIGINT) AS total_qty_micro
      |  FROM lineitem
      |  GROUP BY 1
      |  HAVING SUM(CAST(ROUND(l_quantity * 1000000.0) AS BIGINT))
      |    > 150000000
      |)
      |SELECT o.o_orderkey, o.o_custkey,
      |       CAST(ROUND(o.o_totalprice * 1000000.0) AS BIGINT)
      |         AS total_micro,
      |       b.total_qty_micro
      |FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey""".stripMargin

  /** Q4-shape mirror ([[graft.pipeline.RelOps.q4LateOrders]]): the
    * EXISTS form DuckDB plans as its own semi join. */
  val q4LateOrders: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate)
      |GROUP BY 1""".stripMargin

  /** Q12-shape mirror ([[graft.pipeline.RelOps.q12PriorityClass]]):
    * same 0/1 priority class before the conditional sums. */
  val q12PriorityClass: String =
    """SELECT l.l_returnflag,
      |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT)
      |         AS high_line_count,
      |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 0 ELSE 1 END) AS BIGINT)
      |         AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1""".stripMargin

  /** Q17-shape mirror ([[graft.pipeline.RelOps.q17SmallQtyRevenue]]):
    * identical integer cross-multiplied 20%-of-average predicate. */
  val q17SmallQtyRevenue: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |         CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS qty,
      |         CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS price
      |  FROM lineitem
      |),
      |pp AS (
      |  SELECT l_partkey AS a_partkey,
      |         CAST(SUM(qty) AS BIGINT) AS sq,
      |         CAST(COUNT(*) AS BIGINT) AS cq
      |  FROM li GROUP BY 1
      |)
      |SELECT CAST(SUM(price) // 7 AS BIGINT) AS avg_yearly_micro
      |FROM li
      |JOIN part ON li.l_partkey = part.p_partkey
      |JOIN pp ON li.l_partkey = pp.a_partkey
      |WHERE part.p_brand = 'Brand#12'
      |  AND 5 * qty * cq < sq""".stripMargin

  /** Q19-shape mirror ([[graft.pipeline.RelOps.q19BrandRevenue]]):
    * the same OR-of-ANDs disjunction as the join condition. */
  val q19BrandRevenue: String =
    """SELECT COUNT(*) AS cnt,
      |       CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
      |         * 1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q2-shape mirror ([[graft.pipeline.RelOps.q2MinCostSupp]]): same
    * derived min-discounted-line-price supply cost (the schema has no
    * partsupp), same per-part MIN join-back with all-ties output. */
  val q2MinCostSupp: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |         MIN(CAST(ROUND(l_extendedprice * (1.0 - l_discount) *
      |           1000000.0) AS BIGINT)) AS cost_micro
      |  FROM lineitem GROUP BY 1, 2
      |),
      |eu AS (
      |  SELECT s.s_suppkey, s.s_name,
      |         CAST(ROUND(s.s_acctbal * 1000000.0) AS BIGINT) AS acct_micro
      |  FROM supplier s
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'
      |),
      |pc AS (
      |  SELECT c.l_partkey, c.cost_micro, e.s_name, e.acct_micro
      |  FROM cost c JOIN eu e ON c.l_suppkey = e.s_suppkey
      |),
      |mn AS (SELECT l_partkey, MIN(cost_micro) AS m FROM pc GROUP BY 1)
      |SELECT p.p_partkey, p.p_name, pc.s_name, pc.acct_micro,
      |       pc.cost_micro
      |FROM pc
      |JOIN mn ON pc.l_partkey = mn.l_partkey AND pc.cost_micro = mn.m
      |JOIN part p ON pc.l_partkey = p.p_partkey
      |WHERE p.p_type = 'STANDARD' AND p.p_size <= 25""".stripMargin

  /** Q8-shape mirror ([[graft.pipeline.RelOps.q8MarketShare]]): share
    * as exact integers — numerator, denominator, ppm by integer
    * division. */
  val q8MarketShare: String =
    """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |       CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
      |         THEN CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |           1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS num_micro,
      |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |         1000000.0) AS BIGINT)) AS BIGINT) AS den_micro,
      |       CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
      |           THEN CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |             1000000.0) AS BIGINT) ELSE 0 END) AS HUGEINT) * 1000000
      |         // SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |           1000000.0) AS BIGINT)) AS BIGINT) AS share_ppm
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |JOIN region r ON cn.n_regionkey = r.r_regionkey
      |  AND r.r_name = 'AMERICA'
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |GROUP BY 1""".stripMargin

  /** Q9-shape mirror ([[graft.pipeline.RelOps.q9ProfitByNation]]): the
    * same modeled cost (retail·qty·0.5, identical operand order) rounded
    * per row before the difference. */
  val q9ProfitByNation: String =
    """SELECT sn.n_name AS nation,
      |       CAST(year(l.l_shipdate) AS BIGINT) AS yr,
      |       CAST(SUM(
      |         CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) *
      |           1000000.0) AS BIGINT)
      |         - CAST(ROUND(p.p_retailprice * l.l_quantity * 0.5 *
      |           1000000.0) AS BIGINT)) AS BIGINT) AS profit_micro
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'red%'
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |GROUP BY 1, 2""".stripMargin

  /** Q11-shape mirror ([[graft.pipeline.RelOps.q11ImportantParts]]):
    * same cross-multiplied 0.1%-of-total threshold on the scalar
    * subquery. */
  val q11ImportantParts: String =
    """WITH v AS (
      |  SELECT l.l_partkey,
      |         CAST(SUM(CAST(ROUND(l.l_extendedprice * 1000000.0)
      |           AS BIGINT)) AS BIGINT) AS val_micro
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |    AND n.n_name = 'NATION_7'
      |  GROUP BY 1
      |)
      |SELECT l_partkey, val_micro FROM v
      |WHERE CAST(val_micro AS HUGEINT) * 1000
      |        > (SELECT SUM(val_micro) FROM v)""".stripMargin

  /** Q16-shape mirror ([[graft.pipeline.RelOps.q16SupplierCnt]]): the
    * observed DISTINCT part↔supplier pairs stand in for partsupp;
    * negative balances stand in for complaints. */
  val q16SupplierCnt: String =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p.p_brand, p.p_type, p.p_size,
      |       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM ps
      |JOIN part p ON ps.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#1'
      |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM supplier s
      |    WHERE s.s_suppkey = ps.l_suppkey AND s.s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q20-shape mirror ([[graft.pipeline.RelOps.q20ExcessShippers]]):
    * same exact-integer more-than-half-of-shipments test. */
  val q20ExcessShippers: String =
    """WITH sq AS (
      |  SELECT l.l_partkey, l.l_suppkey,
      |         CAST(SUM(CAST(ROUND(l.l_quantity * 1000000.0) AS BIGINT))
      |           AS BIGINT) AS sq
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |    AND p.p_name LIKE 'small%'
      |  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2
      |),
      |st AS (SELECT l_partkey, SUM(sq) AS st FROM sq GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE EXISTS (
      |  SELECT 1 FROM sq
      |  JOIN st ON sq.l_partkey = st.l_partkey
      |  WHERE sq.l_suppkey = s.s_suppkey AND 2 * sq.sq > st.st)""".stripMargin

  /** Q21-shape mirror ([[graft.pipeline.RelOps.q21WaitingSupp]]): the
    * same unique-latest-shipper derivation via per-order aggregates. */
  val q21WaitingSupp: String =
    """WITH ls AS (
      |  SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS mx
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |    AND o.o_orderstatus = 'F'
      |  GROUP BY 1, 2
      |),
      |os AS (
      |  SELECT l_orderkey, COUNT(*) AS ns, MAX(mx) AS omax
      |  FROM ls GROUP BY 1
      |),
      |ach AS (
      |  SELECT ls.l_orderkey, COUNT(*) AS nach
      |  FROM ls JOIN os ON ls.l_orderkey = os.l_orderkey
      |    AND ls.mx = os.omax
      |  GROUP BY 1
      |)
      |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM ls
      |JOIN os ON ls.l_orderkey = os.l_orderkey
      |  AND ls.mx = os.omax AND os.ns > 1
      |JOIN ach ON ls.l_orderkey = ach.l_orderkey AND ach.nach = 1
      |JOIN supplier s ON ls.l_suppkey = s.s_suppkey
      |GROUP BY 1""".stripMargin

  /** Q22-shape mirror ([[graft.pipeline.RelOps.q22GlobalSales]]): the
    * same exact-integer above-positive-average filter and date-cutoff
    * dormancy anti join. */
  val q22GlobalSales: String =
    """WITH pos AS (
      |  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 1000000.0) AS BIGINT))
      |           AS BIGINT) AS pos_sum,
      |         COUNT(*) AS pos_n
      |  FROM customer
      |  WHERE CAST(ROUND(c_acctbal * 1000000.0) AS BIGINT) > 0
      |)
      |SELECT c.c_mktsegment,
      |       CAST(COUNT(*) AS BIGINT) AS numcust,
      |       CAST(SUM(CAST(ROUND(c.c_acctbal * 1000000.0) AS BIGINT))
      |         AS BIGINT) AS totacct_micro
      |FROM customer c, pos
      |WHERE CAST(CAST(ROUND(c.c_acctbal * 1000000.0) AS BIGINT)
      |          AS HUGEINT) * pos.pos_n
      |        > pos.pos_sum
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY 1""".stripMargin

  /** As-of attribution mirror ([[graft.pipeline.EventOps.asofAttribution]]):
    * the identical union-tagged running-last plan (not DuckDB's ASOF JOIN
    * keyword, whose equal-ts tie handling is unspecified) — clicks sort
    * before purchases at equal ts, so `last_value(... IGNORE NULLS)` over
    * the unbounded-preceding frame is the as-of match in both engines.
    * Gap seconds in exact integer µs arithmetic: both engines truncate
    * event time to `epoch_ns(ts) // 1000` microseconds first (DuckDB
    * reads TIMESTAMP(NANOS) at µs precision, so µs is the finest
    * cross-engine integer — same contract as latestEventState). */
  val asofAttribution: String =
    """WITH u AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
      |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |),
      |w AS (
      |  SELECT user_id, tus, event_id, kind,
      |         last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY tus, kind, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS click_id,
      |         last_value(CASE WHEN kind = 0 THEN tus END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY tus, kind, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS click_tus
      |  FROM u
      |)
      |SELECT event_id AS purchase_id, user_id,
      |       CAST(COALESCE(click_id, -1) AS BIGINT) AS click_id,
      |       CAST(COALESCE((tus - click_tus) // 1000000, -1) AS BIGINT)
      |         AS gap_sec
      |FROM w WHERE kind = 1""".stripMargin

  /** Sessionization mirror ([[graft.pipeline.EventOps.sessionize]]):
    * gaps-and-islands with the same 30-min µs gap, (tus, event_id) order
    * and micro-int value sums. */
  val sessionize: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id,
      |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |),
      |l AS (
      |  SELECT user_id, tus, event_id, v,
      |         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |           AS prev_tus
      |  FROM e
      |),
      |b AS (
      |  SELECT user_id, tus, v,
      |         CASE WHEN prev_tus IS NULL
      |                   OR tus - prev_tus > 1800000000 THEN 1
      |              ELSE 0 END AS brk,
      |         event_id
      |  FROM l
      |),
      |s AS (
      |  SELECT user_id, tus, v,
      |         CAST(SUM(brk) OVER (PARTITION BY user_id
      |           ORDER BY tus, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS sess
      |  FROM b
      |)
      |SELECT user_id, sess,
      |       CAST(MIN(tus) // 1000000 AS BIGINT) AS start_sec,
      |       CAST((MAX(tus) - MIN(tus)) // 1000000 AS BIGINT) AS dur_sec,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(v) AS BIGINT) AS val_micro
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Range-join mirror ([[graft.pipeline.EventOps.rangeJoinRecentErrors]]):
    * plain interval containment (DuckDB's optimizer handles the range
    * join; the bucket explosion is the Spark scale device, not a
    * semantic difference). */
  val rangeJoinRecentErrors: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type
      |  FROM events
      |)
      |SELECT p.event_id AS purchase_id, p.user_id,
      |       COUNT(*) AS n_recent_errors,
      |       CAST(MIN((p.tus - er.tus) // 1000000) AS BIGINT)
      |         AS min_gap_sec
      |FROM e p JOIN e er
      |  ON p.user_id = er.user_id
      | AND er.event_type = 'error'
      | AND p.tus >= er.tus
      | AND p.tus - er.tus <= 21600000000
      |WHERE p.event_type = 'purchase'
      |GROUP BY 1, 2""".stripMargin

  /** Latest-state compaction mirror
    * ([[graft.pipeline.EventOps.latestEventState]]): the per-user argmax
    * by (ts, event_id) — the window form here, the max(struct) hash
    * aggregate in Spark; (ts, event_id) is a total order so both pick
    * the same row. */
  val latestEventState: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type,
      |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |),
      |r AS (
      |  SELECT user_id, tus, event_id, event_type, v,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |           ORDER BY tus DESC, event_id DESC) AS rn,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM e
      |)
      |SELECT user_id, CAST(tus AS BIGINT) AS last_tus,
      |       event_id AS last_event_id,
      |       event_type AS last_type, v AS last_value_micro,
      |       CAST(n_events AS BIGINT) AS n_events
      |FROM r WHERE rn = 1""".stripMargin

  /** Ordered-funnel mirror ([[graft.pipeline.EventOps.funnelSteps]]):
    * the same three chained conditional window minima over the per-user
    * partition, -1 sentinels, depth 0-3. */
  val funnelSteps: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_type
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |),
      |v AS (
      |  SELECT user_id, tus, event_type,
      |         MIN(CASE WHEN event_type = 'view' THEN tus END)
      |           OVER (PARTITION BY user_id) AS v_tus
      |  FROM e
      |),
      |c AS (
      |  SELECT user_id, tus, event_type, v_tus,
      |         MIN(CASE WHEN event_type = 'click' AND tus >= v_tus
      |                  THEN tus END)
      |           OVER (PARTITION BY user_id) AS c_tus
      |  FROM v
      |),
      |p AS (
      |  SELECT user_id, v_tus, c_tus,
      |         MIN(CASE WHEN event_type = 'purchase' AND tus >= c_tus
      |                  THEN tus END)
      |           OVER (PARTITION BY user_id) AS p_tus
      |  FROM c
      |),
      |u AS (
      |  SELECT user_id, MIN(v_tus) AS v_tus, MIN(c_tus) AS c_tus,
      |         MIN(p_tus) AS p_tus
      |  FROM p GROUP BY 1
      |)
      |SELECT user_id,
      |       CAST(COALESCE(v_tus, -1) AS BIGINT) AS view_tus,
      |       CAST(COALESCE(c_tus, -1) AS BIGINT) AS click_tus,
      |       CAST(COALESCE(p_tus, -1) AS BIGINT) AS purchase_tus,
      |       CAST(CASE WHEN p_tus IS NOT NULL THEN 3
      |                 WHEN c_tus IS NOT NULL THEN 2
      |                 WHEN v_tus IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS depth
      |FROM u""".stripMargin

  /** Cadence mirror ([[graft.pipeline.EventOps.userCadence]]): same
    * per-user (tus, event_id)-ordered lag gaps, truncating divisions
    * and cross-multiplied burstiness flag. */
  val userCadence: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id
      |  FROM events
      |),
      |g AS (
      |  SELECT user_id,
      |         tus - lag(tus) OVER (PARTITION BY user_id
      |           ORDER BY tus, event_id) AS gap
      |  FROM e
      |),
      |a AS (
      |  SELECT user_id,
      |         CAST(COUNT(*) AS BIGINT) AS n_events,
      |         CAST(COUNT(gap) AS BIGINT) AS n_gaps,
      |         CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
      |         CAST(MAX(gap) AS BIGINT) AS max_gap_us
      |  FROM g GROUP BY 1
      |)
      |SELECT user_id, n_events,
      |       CAST((sum_gap_us // n_gaps) // 1000000 AS BIGINT)
      |         AS mean_gap_sec,
      |       CAST(max_gap_us // 1000000 AS BIGINT) AS max_gap_sec,
      |       CAST(CASE WHEN max_gap_us * n_gaps > 4 * sum_gap_us
      |                 THEN 1 ELSE 0 END AS BIGINT) AS bursty
      |FROM a WHERE n_gaps > 0""".stripMargin

  /** Conversion-latency mirror
    * ([[graft.pipeline.EventOps.conversionLatency]]): the funnel oracle
    * as a derived table, then the same histogram rank-pick. */
  val conversionLatency: String =
    s"""WITH lat AS (
       |  SELECT (purchase_tus - view_tus) // 1000000 AS sec
       |  FROM ($funnelSteps) fu WHERE depth = 3
       |),
       |h AS (SELECT sec, CAST(COUNT(*) AS BIGINT) AS cnt
       |      FROM lat GROUP BY 1),
       |c AS (
       |  SELECT sec, cnt,
       |         SUM(cnt) OVER (ORDER BY sec
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |         SUM(cnt) OVER () AS n
       |  FROM h
       |)
       |SELECT CAST(SUM(cnt) AS BIGINT) AS n_conversions,
       |       CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN sec END)
       |         AS BIGINT) AS p50_sec,
       |       CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN sec END)
       |         AS BIGINT) AS p90_sec,
       |       CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN sec END)
       |         AS BIGINT) AS p99_sec,
       |       CAST(MAX(sec) AS BIGINT) AS max_sec
       |FROM c""".stripMargin

  /** Retention-cohort mirror ([[graft.pipeline.EventOps.retentionCohorts]]):
    * first-signup epoch-day cohort × active-day offset × distinct users. */
  val retentionCohorts: String =
    """WITH e AS (
      |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |         event_type
      |  FROM events
      |),
      |coh AS (
      |  SELECT user_id, MIN(day) AS cohort_day
      |  FROM e WHERE event_type = 'signup' GROUP BY 1
      |)
      |SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
      |       CAST(day - cohort_day AS BIGINT) AS day_offset,
      |       COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN coh ON e.user_id = coh.user_id
      |WHERE day >= cohort_day
      |GROUP BY 1, 2""".stripMargin

  /** Gap-filled hourly series mirror
    * ([[graft.pipeline.EventOps.activityGapfill]]): generate_series over
    * the corpus hour range × distinct types, left-joined onto observed
    * counts with zero fill. */
  val activityGapfill: String =
    """WITH hourly AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
      |         COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
      |              FROM bounds) g
      |)
      |SELECT CAST(grid.h * 3600 AS BIGINT) AS hour_sec, grid.event_type,
      |       CAST(COALESCE(hourly.cnt, 0) AS BIGINT) AS cnt
      |FROM grid LEFT JOIN hourly
      |  ON grid.event_type = hourly.event_type AND grid.h = hourly.h""".stripMargin

  /** Anomaly-flag mirror ([[graft.pipeline.EventOps.anomalousHours]]):
    * same gap-filled grid, same 24-row trailing frame, same
    * integer-exact (n·x−s)² > 9·(n·ssq−s²) comparison in HUGEINT. */
  val anomalousHours: String =
    """WITH hourly AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
      |              FROM bounds) g
      |),
      |dense AS (
      |  SELECT grid.h, grid.event_type,
      |         CAST(COALESCE(hourly.cnt, 0) AS BIGINT) AS cnt
      |  FROM grid LEFT JOIN hourly
      |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
      |),
      |win AS (
      |  SELECT h, event_type, cnt,
      |         COUNT(*) OVER tw AS n,
      |         SUM(cnt) OVER tw AS s,
      |         SUM(CAST(cnt AS HUGEINT) * cnt) OVER tw AS ssq
      |  FROM dense
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT CAST(h * 3600 AS BIGINT) AS hour_sec, event_type, cnt,
      |       CAST((s * 1000000) // n AS BIGINT) AS mean_micro,
      |       CAST(CASE WHEN CAST(n * cnt - s AS HUGEINT) * (n * cnt - s)
      |                      > 9 * (n * ssq - CAST(s AS HUGEINT) * s)
      |                 THEN 1 ELSE 0 END AS BIGINT) AS anomaly
      |FROM win WHERE n = 24""".stripMargin

  /** As-of-T mirror ([[graft.pipeline.EventOps.stateAsOfMidmonth]]):
    * same filtered (tus, event_id) argmax at T = 2024-01-15T00:00:00Z. */
  val stateAsOfMidmonth: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type
      |  FROM events
      |  WHERE epoch_ns(ts) // 1000 <= 1705276800000000
      |),
      |r AS (
      |  SELECT user_id, tus, event_id, event_type,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |           ORDER BY tus DESC, event_id DESC) AS rn,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM e
      |)
      |SELECT user_id, CAST(tus AS BIGINT) AS tus, event_id, event_type,
      |       CAST(n AS BIGINT) AS n_events_to_t
      |FROM r WHERE rn = 1""".stripMargin

  /** SCD2 mirror ([[graft.pipeline.EventOps.eventHistoryScd2]]): same
    * per-user (tus, event_id) order, same lead-based validity window. */
  val eventHistoryScd2: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type
      |  FROM events
      |)
      |SELECT user_id, event_id, event_type,
      |       CAST(tus AS BIGINT) AS valid_from_tus,
      |       CAST(COALESCE(lead(tus) OVER w, -1) AS BIGINT)
      |         AS valid_to_tus,
      |       CAST(CASE WHEN lead(tus) OVER w IS NULL THEN 1 ELSE 0 END
      |         AS BIGINT) AS is_current
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)""".stripMargin

  /** JSON-props mirror ([[graft.pipeline.EventOps.jsonPropsStats]]):
    * same `$.k` path extraction, per-type aggregates. */
  val jsonPropsStats: String =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |)
      |SELECT event_type,
      |       COUNT(*) AS cnt,
      |       COUNT(k) AS k_present,
      |       CAST(SUM(k) AS BIGINT) AS k_sum,
      |       COUNT(DISTINCT k) AS k_distinct,
      |       CAST(MAX(k) AS BIGINT) AS k_max
      |FROM e GROUP BY 1""".stripMargin

  /** Transition-matrix mirror ([[graft.pipeline.EventOps.eventTransitions]]):
    * same (µs, event_id) order, same truncating ppm division. */
  val eventTransitions: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type
      |  FROM events
      |),
      |p AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY tus, event_id) AS from_type,
      |         event_type AS to_type
      |  FROM e
      |),
      |c AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, cnt,
      |       CAST(cnt * 1000000 // SUM(cnt) OVER (PARTITION BY from_type)
      |         AS BIGINT) AS prob_ppm
      |FROM c""".stripMargin

  /** PageRank mirror ([[graft.pipeline.EventOps.eventPagerank]]): the
    * identical truncating-integer power iteration, unrolled by a
    * recursive CTE over the inlined transition matrix; zero-probability
    * self-loops make the contribution join total (they add nothing to
    * any rank) so the recursive term needs no outer join. */
  val eventPagerank: String =
    s"""WITH RECURSIVE trans AS (
       |  SELECT from_type, to_type, prob_ppm FROM ($eventTransitions)
       |),
       |nodes AS (
       |  -- explicit DISTINCT: under WITH RECURSIVE, DuckDB gives a
       |  -- plain UNION in a sibling CTE recursive-union treatment and
       |  -- skips the dedup, which would silently inflate N
       |  SELECT DISTINCT node FROM (
       |    SELECT from_type AS node FROM trans
       |    UNION ALL SELECT to_type FROM trans
       |  )
       |),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |t2 AS (
       |  SELECT from_type, to_type, prob_ppm FROM trans
       |  UNION ALL SELECT node, node, CAST(0 AS BIGINT) FROM nodes
       |),
       |pr AS (
       |  SELECT 0 AS it, node, (SELECT 1000000 // n FROM nn) AS r
       |  FROM nodes
       |  UNION ALL
       |  SELECT it + 1, node,
       |         (SELECT 150000 // n FROM nn) + (85 * contrib) // 100
       |  FROM (
       |    SELECT p.it AS it, t.to_type AS node,
       |           CAST(SUM(p.r * t.prob_ppm // 1000000) AS BIGINT)
       |             AS contrib
       |    FROM pr p JOIN t2 t ON t.from_type = p.node
       |    WHERE p.it < ${graft.pipeline.EventOps.PagerankIters}
       |    GROUP BY 1, 2
       |  )
       |)
       |SELECT node AS event_type, r AS rank_ppm
       |FROM pr WHERE it = ${graft.pipeline.EventOps.PagerankIters}""".stripMargin

  /** Entry-path mirror ([[graft.pipeline.EventOps.topPaths]]): the
    * row_number form of the first-3 pick (the Spark side's bounded
    * top-k aggregate selects the identical set and order). */
  val topPaths: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, event_type
      |  FROM events
      |),
      |r AS (
      |  SELECT user_id, event_type,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |           ORDER BY tus, event_id) AS rn
      |  FROM e
      |),
      |p AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 3 GROUP BY 1
      |)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM p GROUP BY 1
      |ORDER BY n_users DESC, path ASC
      |LIMIT 20""".stripMargin

  /** Seasonal-baseline mirror
    * ([[graft.pipeline.EventOps.seasonalProfile]]): the gap-fill CTE
    * verbatim, then the same (dow, hod) cell aggregate, HUGEINT
    * cross-multiplied mean/lift with `//` ≡ Spark `div` on the
    * non-negative operands. */
  val seasonalProfile: String =
    """WITH hourly AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
      |         COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
      |              FROM bounds) g
      |),
      |dense AS (
      |  SELECT grid.event_type, grid.h, COALESCE(hourly.cnt, 0) AS cnt
      |  FROM grid LEFT JOIN hourly
      |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
      |),
      |cells AS (
      |  SELECT event_type, ((h // 24) + 3) % 7 AS dow, h % 24 AS hod,
      |         COUNT(*) AS n_hours, SUM(cnt) AS cnt_sum
      |  FROM dense GROUP BY 1, 2, 3
      |),
      |totals AS (
      |  SELECT event_type, SUM(n_hours) AS t_hours, SUM(cnt_sum) AS t_sum
      |  FROM cells GROUP BY 1
      |)
      |SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow,
      |       CAST(c.hod AS BIGINT) AS hod,
      |       CAST(c.n_hours AS BIGINT) AS n_hours,
      |       CAST(c.cnt_sum AS BIGINT) AS cnt_sum,
      |       CAST((CAST(c.cnt_sum AS HUGEINT) * 1000000) // c.n_hours
      |         AS BIGINT) AS mean_micro,
      |       CAST(CASE WHEN t.t_sum = 0 THEN 0
      |         ELSE (CAST(c.cnt_sum AS HUGEINT) * t.t_hours * 1000000)
      |              // (CAST(c.n_hours AS HUGEINT) * t.t_sum)
      |       END AS BIGINT) AS lift_micro
      |FROM cells c JOIN totals t ON c.event_type = t.event_type""".stripMargin

  /** Profiler mirror ([[graft.pipeline.EventOps.columnProfile]]): same
    * long-form tagging (canonical repr + numeric/string order tiers with
    * -1/'' sentinels), one GROUP BY. ts profiles as epoch-µs (the
    * cross-engine grain), value as the eventsHourly micro-unit
    * rounding. */
  val columnProfile: String =
    """WITH lf AS (
      |  SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS repr,
      |         CAST(event_id AS BIGINT) AS num_ord,
      |         CAST(NULL AS VARCHAR) AS str_ord FROM events
      |  UNION ALL
      |  SELECT 'ts', CAST(epoch_us(ts) AS VARCHAR), epoch_us(ts), NULL
      |  FROM events
      |  UNION ALL
      |  SELECT 'user_id', CAST(user_id AS VARCHAR), user_id, NULL
      |  FROM events
      |  UNION ALL
      |  SELECT 'event_type', event_type, NULL, event_type FROM events
      |  UNION ALL
      |  SELECT 'value',
      |         CAST(CAST(ROUND(value * 1000000.0) AS BIGINT) AS VARCHAR),
      |         CAST(ROUND(value * 1000000.0) AS BIGINT), NULL FROM events
      |  UNION ALL
      |  SELECT 'props', props, NULL, props FROM events
      |)
      |SELECT col_name,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(COUNT(*) - COUNT(repr) AS BIGINT) AS n_null,
      |       CAST(COUNT(DISTINCT repr) AS BIGINT) AS n_distinct,
      |       CAST(COALESCE(MIN(num_ord), -1) AS BIGINT) AS min_num,
      |       CAST(COALESCE(MAX(num_ord), -1) AS BIGINT) AS max_num,
      |       COALESCE(MIN(str_ord), '') AS min_str,
      |       COALESCE(MAX(str_ord), '') AS max_str,
      |       CAST(COALESCE(SUM(LENGTH(repr)), 0) AS BIGINT) AS len_sum
      |FROM lf GROUP BY 1""".stripMargin

  /** Market-basket mirror ([[graft.pipeline.RelOps.basketPairs]]): same
    * distinct basket relation, per-order pair join, (support desc, ids
    * asc) top-20 head and HUGEINT truncating lift. */
  val basketPairs: String =
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
      |  FROM lineitem
      |),
      |freq AS (SELECT pkey, COUNT(*) AS cp FROM b GROUP BY 1),
      |no AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM b),
      |pr AS (
      |  SELECT x.pkey AS part_a, y.pkey AS part_b, COUNT(*) AS support
      |  FROM b x JOIN b y ON x.okey = y.okey AND x.pkey < y.pkey
      |  GROUP BY 1, 2
      |),
      |t AS (
      |  SELECT part_a, part_b, support FROM pr
      |  ORDER BY support DESC, part_a ASC, part_b ASC LIMIT 20
      |)
      |SELECT t.part_a, t.part_b,
      |       CAST(t.support AS BIGINT) AS support,
      |       CAST(fa.cp AS BIGINT) AS cnt_a,
      |       CAST(fb.cp AS BIGINT) AS cnt_b,
      |       CAST((CAST(t.support AS HUGEINT) * n_orders * 1000000)
      |         // (CAST(fa.cp AS HUGEINT) * fb.cp) AS BIGINT) AS lift_ppm
      |FROM t
      |JOIN freq fa ON fa.pkey = t.part_a
      |JOIN freq fb ON fb.pkey = t.part_b, no""".stripMargin

  /** Value-outlier mirror ([[graft.pipeline.EventOps.valueOutliers]]):
    * same integer 3σ cross-multiplication in HUGEINT, same truncating
    * mean and ppm share. */
  val valueOutliers: String =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |),
      |s AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(v) AS sv,
      |         SUM(CAST(v AS HUGEINT) * v) AS svv
      |  FROM e GROUP BY 1
      |),
      |f AS (
      |  SELECT e.event_type, s.n, s.sv,
      |         CASE WHEN
      |           (CAST(s.n AS HUGEINT) * e.v - s.sv) *
      |           (CAST(s.n AS HUGEINT) * e.v - s.sv) >
      |           9 * (CAST(s.n AS HUGEINT) * s.svv -
      |                CAST(s.sv AS HUGEINT) * s.sv)
      |         THEN 1 ELSE 0 END AS isout
      |  FROM e JOIN s USING (event_type)
      |)
      |SELECT event_type,
      |       CAST(MAX(n) AS BIGINT) AS n,
      |       CAST(MAX(sv) // MAX(n) AS BIGINT) AS mean_micro,
      |       CAST(SUM(isout) AS BIGINT) AS n_outliers,
      |       CAST((SUM(isout) * 1000000) // MAX(n) AS BIGINT)
      |         AS outlier_ppm
      |FROM f GROUP BY 1""".stripMargin

  /** Burstiness mirror ([[graft.pipeline.EventOps.burstiness]]): same
    * gap-filled grid, same HUGEINT Fano cross-multiplication. */
  val burstiness: String =
    s"""WITH hourly AS (
       |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
       |         COUNT(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |),
       |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
       |grid AS (
       |  SELECT t.event_type, g.h
       |  FROM (SELECT DISTINCT event_type FROM hourly) t
       |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
       |              FROM bounds) g
       |),
       |filled AS (
       |  SELECT grid.event_type,
       |         CAST(COALESCE(hourly.cnt, 0) AS BIGINT) AS cnt
       |  FROM grid LEFT JOIN hourly
       |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
       |),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
       |         CAST(SUM(cnt) AS BIGINT) AS s,
       |         SUM(CAST(cnt AS HUGEINT) * cnt) AS ssq
       |  FROM filled GROUP BY 1
       |)
       |SELECT event_type, n_hours,
       |       CAST((s * 1000) // n_hours AS BIGINT) AS mean_milli,
       |       CAST(((CAST(n_hours AS HUGEINT) * ssq -
       |              CAST(s AS HUGEINT) * s) * 1000000) //
       |            (CAST(n_hours AS HUGEINT) * s) AS BIGINT) AS fano_ppm,
       |       CAST(CASE WHEN ((CAST(n_hours AS HUGEINT) * ssq -
       |              CAST(s AS HUGEINT) * s) * 1000000) //
       |            (CAST(n_hours AS HUGEINT) * s) >
       |            ${graft.pipeline.EventOps.FanoPpmMax}
       |            THEN 1 ELSE 0 END AS BIGINT) AS bursty
       |FROM agg""".stripMargin

  /** CUSUM mirror ([[graft.pipeline.EventOps.cusumDrift]]): the same
    * gap-filled hourly grid and integer parameters; the max-clamped
    * recurrence replays via a recursive CTE stepping the hour index
    * (anchor = the first grid hour with S from 0). */
  val cusumDrift: String =
    """WITH RECURSIVE hourly AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
      |         COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
      |              FROM bounds) g
      |),
      |filled AS (
      |  SELECT grid.event_type, grid.h,
      |         CAST(COALESCE(hourly.cnt, 0) AS BIGINT) AS cnt
      |  FROM grid LEFT JOIN hourly
      |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
      |),
      |params AS (
      |  SELECT event_type, CAST(SUM(cnt) // COUNT(*) AS BIGINT) AS mu
      |  FROM filled GROUP BY 1
      |),
      |rec AS (
      |  SELECT f.event_type, f.h, f.cnt,
      |         GREATEST(CAST(0 AS BIGINT),
      |           f.cnt - p.mu - p.mu // 4) AS s_pos,
      |         GREATEST(CAST(0 AS BIGINT),
      |           (p.mu - p.mu // 4) - f.cnt) AS s_neg
      |  FROM filled f JOIN params p USING (event_type), bounds b
      |  WHERE f.h = b.h0
      |  UNION ALL
      |  SELECT f.event_type, f.h, f.cnt,
      |         GREATEST(CAST(0 AS BIGINT),
      |           r.s_pos + f.cnt - p.mu - p.mu // 4),
      |         GREATEST(CAST(0 AS BIGINT),
      |           r.s_neg + (p.mu - p.mu // 4) - f.cnt)
      |  FROM rec r
      |  JOIN filled f ON f.event_type = r.event_type AND f.h = r.h + 1
      |  JOIN params p ON p.event_type = r.event_type
      |)
      |SELECT r.event_type, CAST(r.h * 3600 AS BIGINT) AS hour_sec,
      |       r.cnt, r.s_pos, r.s_neg,
      |       CAST(CASE WHEN r.s_pos > 2 * p.mu OR r.s_neg > 2 * p.mu
      |            THEN 1 ELSE 0 END AS BIGINT) AS alarm
      |FROM rec r JOIN params p USING (event_type)""".stripMargin

  /** Sweep-line mirror ([[graft.pipeline.EventOps.concurrentSessions]]):
    * the sessionize interval CTEs, the definitional global running-sum
    * window over (t, delta)-ordered deltas (tie groups share their
    * delta, so the after-row value set — and therefore the hourly max —
    * is permutation-independent), hour rollup with carry-in. */
  val concurrentSessions: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id
      |  FROM events
      |),
      |l AS (
      |  SELECT user_id, tus, event_id,
      |         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |           AS prev_tus
      |  FROM e
      |),
      |b AS (
      |  SELECT user_id, tus, event_id,
      |         CASE WHEN prev_tus IS NULL
      |                   OR tus - prev_tus > 1800000000 THEN 1
      |              ELSE 0 END AS brk
      |  FROM l
      |),
      |s AS (
      |  SELECT user_id, tus,
      |         SUM(brk) OVER (PARTITION BY user_id
      |           ORDER BY tus, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM b
      |),
      |iv AS (
      |  SELECT user_id, sess, MIN(tus) AS start_us, MAX(tus) AS end_us
      |  FROM s GROUP BY 1, 2
      |),
      |d AS (
      |  SELECT start_us AS t, CAST(1 AS BIGINT) AS delta FROM iv
      |  UNION ALL
      |  SELECT end_us + 1, CAST(-1 AS BIGINT) FROM iv
      |),
      |r AS (
      |  SELECT t // 3600000000 AS h, delta,
      |         SUM(delta) OVER (ORDER BY t, delta
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM d
      |),
      |hr AS (SELECT h, MAX(run) AS hmax, SUM(delta) AS net
      |       FROM r GROUP BY 1),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hr),
      |grid AS (SELECT UNNEST(generate_series(h0, h1)) AS h FROM bounds),
      |fl AS (
      |  SELECT g.h, hr.hmax, COALESCE(hr.net, 0) AS net
      |  FROM grid g LEFT JOIN hr ON hr.h = g.h
      |),
      |cr AS (
      |  SELECT h, hmax, net,
      |         COALESCE(SUM(net) OVER (ORDER BY h
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS carry
      |  FROM fl
      |)
      |SELECT CAST(h * 3600 AS BIGINT) AS hour_sec,
      |       CAST(GREATEST(COALESCE(hmax, carry), carry) AS BIGINT)
      |         AS max_concurrent,
      |       CAST(carry + net AS BIGINT) AS end_concurrent
      |FROM cr""".stripMargin

  /** Durbin-Watson mirror ([[graft.pipeline.EventOps.eventAutocorr]]):
    * same gap-filled hourly grid, lag window, HUGEINT quadratics and
    * one truncating cross-multiplied division. */
  val eventAutocorr: String =
    """WITH hourly AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
      |         COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
      |              FROM bounds) g
      |),
      |filled AS (
      |  SELECT grid.event_type, grid.h,
      |         CAST(COALESCE(hourly.cnt, 0) AS BIGINT) AS cnt
      |  FROM grid LEFT JOIN hourly
      |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
      |),
      |lagged AS (
      |  SELECT event_type, cnt,
      |         lag(cnt) OVER (PARTITION BY event_type ORDER BY h) AS prev
      |  FROM filled
      |),
      |agg AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |         SUM(cnt) AS s,
      |         SUM(CAST(cnt AS HUGEINT) * cnt) AS sq,
      |         SUM(CASE WHEN prev IS NOT NULL
      |             THEN CAST(cnt - prev AS HUGEINT) * (cnt - prev)
      |             ELSE 0 END) AS sd
      |  FROM lagged GROUP BY 1
      |)
      |SELECT event_type, n_hours,
      |       CAST((CAST(1000000 AS HUGEINT) * n_hours * sd)
      |            // (n_hours * sq - CAST(s AS HUGEINT) * s) AS BIGINT)
      |         AS dw_ppm,
      |       CAST(CASE WHEN (CAST(1000000 AS HUGEINT) * n_hours * sd)
      |            // (n_hours * sq - CAST(s AS HUGEINT) * s) < 1500000
      |            THEN 1 ELSE 0 END AS BIGINT) AS positive_autocorr
      |FROM agg
      |WHERE n_hours * sq - CAST(s AS HUGEINT) * s > 0""".stripMargin

  /** EWMA mirror ([[graft.pipeline.EventOps.ewmaSmooth]]): the
    * cusumDrift gap-fill CTEs, then the α=1/4 recursion replayed with
    * `WITH RECURSIVE` in the same truncating micro-unit integers. */
  val ewmaSmooth: String =
    """WITH RECURSIVE hourly AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS h,
      |         COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
      |              FROM bounds) g
      |),
      |filled AS (
      |  SELECT grid.event_type, grid.h,
      |         CAST(COALESCE(hourly.cnt, 0) AS BIGINT) AS cnt
      |  FROM grid LEFT JOIN hourly
      |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
      |),
      |rec AS (
      |  SELECT f.event_type, f.h, f.cnt,
      |         CAST(f.cnt * 1000000 AS BIGINT) AS sm
      |  FROM filled f, bounds b WHERE f.h = b.h0
      |  UNION ALL
      |  SELECT f.event_type, f.h, f.cnt,
      |         CAST((3 * r.sm + f.cnt * 1000000) // 4 AS BIGINT)
      |  FROM rec r
      |  JOIN filled f ON f.event_type = r.event_type AND f.h = r.h + 1
      |)
      |SELECT event_type, CAST(h * 3600 AS BIGINT) AS hour_sec, cnt,
      |       sm AS ewma_micro
      |FROM rec""".stripMargin

  /** Drift-monitor mirror ([[graft.pipeline.EventOps.valueDrift]]):
    * identical half-month split, flooring half-unit buckets, exact
    * HUGEINT cross-multiplied total-variation ppm. */
  val valueDrift: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |         CASE WHEN epoch_ns(ts) // 1000 >
       |           ${graft.pipeline.EventOps.MidmonthTus}
       |           THEN 1 ELSE 0 END AS half,
       |         CAST(ROUND(value * 1000000.0) AS BIGINT) // 500000 AS bkt
       |  FROM events
       |),
       |hist AS (
       |  SELECT event_type, bkt,
       |         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS c1,
       |         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS c2
       |  FROM e GROUP BY 1, 2
       |),
       |tots AS (
       |  SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,
       |         CAST(SUM(c2) AS BIGINT) AS n2
       |  FROM hist GROUP BY 1
       |),
       |l1 AS (
       |  SELECT h.event_type, t.n1, t.n2,
       |         SUM(abs(CAST(h.c1 AS HUGEINT) * t.n2 -
       |                 CAST(h.c2 AS HUGEINT) * t.n1)) AS l1
       |  FROM hist h JOIN tots t USING (event_type)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT event_type, n1 AS n_first, n2 AS n_second,
       |       CAST((l1 * 500000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
       |         AS tv_ppm,
       |       CAST(CASE WHEN (l1 * 500000) //
       |              (CAST(n1 AS HUGEINT) * n2) >
       |              ${graft.pipeline.EventOps.DriftTvPpmMax}
       |            THEN 1 ELSE 0 END AS BIGINT) AS drifted
       |FROM l1""".stripMargin

  /** Winsorization mirror ([[graft.pipeline.EventOps.winsorize]]):
    * identical micro conversion, ceil-rank [p5, p95] histogram picks
    * (RANGE cumulative frames in both engines), identical clamp. */
  val winsorize: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |),
      |hist AS (
      |  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM e GROUP BY 1, 2
      |),
      |cum AS (
      |  SELECT event_type, v, c,
      |         SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
      |         SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM hist
      |),
      |th AS (
      |  SELECT event_type,
      |         MIN(CASE WHEN cum >= (n + 19) // 20 THEN v END) AS lo,
      |         MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN v END) AS hi
      |  FROM cum GROUP BY 1
      |)
      |SELECT e.event_id, e.event_type, e.v AS v_micro,
      |       GREATEST(th.lo, LEAST(th.hi, e.v)) AS v_winsor_micro,
      |       CAST(CASE WHEN GREATEST(th.lo, LEAST(th.hi, e.v)) <> e.v
      |            THEN 1 ELSE 0 END AS BIGINT) AS clipped
      |FROM e JOIN th USING (event_type)""".stripMargin

  /** MAD mirror ([[graft.pipeline.EventOps.madOutliers]]): the two
    * ceil-rank median picks over (type, value) and (type, deviation)
    * histograms, exact-rational 44478/10^4 consistency threshold. */
  val madOutliers: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |),
      |h1 AS (
      |  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM e GROUP BY 1, 2
      |),
      |c1 AS (
      |  SELECT event_type, v,
      |         SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
      |         SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM h1
      |),
      |med AS (
      |  SELECT event_type,
      |         MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med_micro
      |  FROM c1 GROUP BY 1
      |),
      |d AS (
      |  SELECT e.event_id, e.event_type, e.v, m.med_micro,
      |         ABS(e.v - m.med_micro) AS dev
      |  FROM e JOIN med m USING (event_type)
      |),
      |h2 AS (
      |  SELECT event_type, dev, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM d GROUP BY 1, 2
      |),
      |c2 AS (
      |  SELECT event_type, dev,
      |         SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
      |         SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM h2
      |),
      |mad AS (
      |  SELECT event_type,
      |         MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad_micro
      |  FROM c2 GROUP BY 1
      |)
      |SELECT d.event_id, d.event_type, d.v AS v_micro, d.med_micro,
      |       m.mad_micro,
      |       CAST(CASE WHEN d.dev * 10000 > m.mad_micro * 44478
      |            THEN 1 ELSE 0 END AS BIGINT) AS robust_outlier
      |FROM d JOIN mad m USING (event_type)""".stripMargin

  /** Skew-audit mirror ([[graft.pipeline.EventOps.eventSkewProfile]]):
    * same per-user counts, histogram rank-picked quantiles, bounded
    * top-10 sum and exact-ppm shares. */
  val eventSkewProfile: String =
    """WITH counts AS (
      |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
      |),
      |q AS (
      |  SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN mv END) AS p50_cnt,
      |         MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN mv END)
      |           AS p90_cnt,
      |         MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN mv END)
      |           AS p99_cnt
      |  FROM (SELECT mv,
      |          SUM(k) OVER (ORDER BY mv
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |          SUM(k) OVER () AS n
      |        FROM (SELECT cnt AS mv, COUNT(*) AS k FROM counts
      |              GROUP BY 1))
      |),
      |t10 AS (
      |  SELECT SUM(cnt) AS top10 FROM (
      |    SELECT cnt FROM counts ORDER BY cnt DESC, user_id ASC LIMIT 10)
      |),
      |s AS (
      |  SELECT COUNT(*) AS n_users, SUM(cnt) AS n_events,
      |         MAX(cnt) AS max_cnt
      |  FROM counts
      |)
      |SELECT CAST(n_users AS BIGINT) AS n_users,
      |       CAST(n_events AS BIGINT) AS n_events,
      |       CAST(max_cnt AS BIGINT) AS max_cnt,
      |       CAST(p50_cnt AS BIGINT) AS p50_cnt,
      |       CAST(p90_cnt AS BIGINT) AS p90_cnt,
      |       CAST(p99_cnt AS BIGINT) AS p99_cnt,
      |       CAST((max_cnt * 1000000) // n_events AS BIGINT)
      |         AS top1_share_ppm,
      |       CAST((top10 * 1000000) // n_events AS BIGINT)
      |         AS top10_share_ppm
      |FROM s, q, t10""".stripMargin

  /** Cohort-LTV mirror ([[graft.pipeline.EventOps.userLtv]]): same
    * first-signup cohorts, dense zero-filled (cohort, age) grid
    * (`range` end-exclusive ⇒ +1), same cumulative window and
    * truncating per-user division. */
  val userLtv: String =
    """WITH e AS (
      |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |         event_type, CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
      |  FROM events
      |),
      |coh AS (
      |  SELECT user_id, MIN(day) AS cohort FROM e
      |  WHERE event_type = 'signup' GROUP BY 1
      |),
      |us AS (SELECT cohort, COUNT(*) AS n_users FROM coh GROUP BY 1),
      |d1 AS (SELECT MAX(day) AS d1 FROM e),
      |rev AS (
      |  SELECT c.cohort, e.day - c.cohort AS age_day, SUM(e.v) AS rev
      |  FROM e JOIN coh c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.day >= c.cohort
      |  GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT u.cohort, u.n_users,
      |         unnest(range(0, d1.d1 - u.cohort + 1)) AS age_day
      |  FROM us u, d1
      |),
      |cum AS (
      |  SELECT g.cohort, g.age_day, g.n_users,
      |         SUM(COALESCE(r.rev, 0)) OVER (PARTITION BY g.cohort
      |           ORDER BY g.age_day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cum_rev
      |  FROM grid g
      |  LEFT JOIN rev r ON r.cohort = g.cohort AND r.age_day = g.age_day
      |)
      |SELECT CAST(cohort * 86400 AS BIGINT) AS cohort_sec,
      |       CAST(age_day AS BIGINT) AS age_day,
      |       CAST(n_users AS BIGINT) AS n_users,
      |       CAST(cum_rev AS BIGINT) AS cum_rev_micro,
      |       CAST(cum_rev // n_users AS BIGINT) AS ltv_micro
      |FROM cum""".stripMargin

  /** Session-summary mirror ([[graft.pipeline.EventOps.sessionSummary]]):
    * the sessionize CTE chain as a nested subquery, then the same
    * bounded-histogram rank picks and exact-integer counters. */
  val sessionSummary: String =
    s"""WITH sess AS (
       |$sessionize
       |),
       |he AS (SELECT n_events AS mv, COUNT(*) AS cnt FROM sess GROUP BY 1),
       |pe AS (
       |  SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN mv END)
       |           AS p50_n_events,
       |         MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN mv END)
       |           AS p90_n_events
       |  FROM (SELECT mv,
       |          SUM(cnt) OVER (ORDER BY mv
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |          SUM(cnt) OVER () AS n
       |        FROM he)
       |),
       |hd AS (SELECT dur_sec AS mv, COUNT(*) AS cnt FROM sess GROUP BY 1),
       |pd AS (
       |  SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN mv END)
       |           AS p50_dur_sec,
       |         MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN mv END)
       |           AS p90_dur_sec
       |  FROM (SELECT mv,
       |          SUM(cnt) OVER (ORDER BY mv
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |          SUM(cnt) OVER () AS n
       |        FROM hd)
       |),
       |c AS (
       |  SELECT COUNT(*) AS n_sessions,
       |         SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS bounces,
       |         SUM(val_micro) AS val_sum
       |  FROM sess
       |)
       |SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
       |       CAST(bounces * 1000000 // n_sessions AS BIGINT) AS bounce_ppm,
       |       CAST(p50_n_events AS BIGINT) AS p50_n_events,
       |       CAST(p90_n_events AS BIGINT) AS p90_n_events,
       |       CAST(p50_dur_sec AS BIGINT) AS p50_dur_sec,
       |       CAST(p90_dur_sec AS BIGINT) AS p90_dur_sec,
       |       CAST(val_sum // n_sessions AS BIGINT) AS mean_val_micro
       |FROM c, pe, pd""".stripMargin

  /** DAU/WAU/MAU mirror ([[graft.pipeline.EventOps.dauStickiness]]):
    * same distinct (day, user) relation, same explode-to-target-day
    * rolling distincts (`range` is end-exclusive ⇒ day+7/day+30), same
    * exact-ppm stickiness. */
  val dauStickiness: String =
    """WITH du AS (
      |  SELECT DISTINCT (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |         user_id
      |  FROM events
      |),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du),
      |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
      |wau AS (
      |  SELECT tday AS day, COUNT(DISTINCT user_id) AS wau
      |  FROM (SELECT unnest(range(day, day + 7)) AS tday, user_id FROM du)
      |  GROUP BY 1
      |),
      |mau AS (
      |  SELECT tday AS day, COUNT(DISTINCT user_id) AS mau
      |  FROM (SELECT unnest(range(day, day + 30)) AS tday, user_id FROM du)
      |  GROUP BY 1
      |)
      |SELECT CAST(d.day * 86400 AS BIGINT) AS day_sec,
      |       CAST(d.dau AS BIGINT) AS dau,
      |       CAST(w.wau AS BIGINT) AS wau,
      |       CAST(m.mau AS BIGINT) AS mau,
      |       CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_ppm
      |FROM dau d
      |JOIN wau w ON w.day = d.day
      |JOIN mau m ON m.day = d.day, bounds
      |WHERE d.day >= d0 AND d.day <= d1""".stripMargin

  /** RFM mirror ([[graft.pipeline.EventOps.rfmScores]]): same per-user
    * purchase aggregate, same rank-picked VALUE boundaries (element at
    * rank ⌈i·n/5⌉ over each metric's histogram), same strictly-above
    * scoring — value ties score identically in both engines. */
  val rfmScores: String = {
    // boundary CTEs for one metric expression (already "higher=better")
    def cuts(src: String, p: String): String =
      s"""h$p AS (SELECT $src AS mv, COUNT(*) AS cnt FROM b2 GROUP BY 1),
         |c$p AS (
         |  SELECT MIN(CASE WHEN cum >= (1*n + 4) // 5 THEN mv END) AS ${p}1,
         |         MIN(CASE WHEN cum >= (2*n + 4) // 5 THEN mv END) AS ${p}2,
         |         MIN(CASE WHEN cum >= (3*n + 4) // 5 THEN mv END) AS ${p}3,
         |         MIN(CASE WHEN cum >= (4*n + 4) // 5 THEN mv END) AS ${p}4
         |  FROM (SELECT mv,
         |          SUM(cnt) OVER (ORDER BY mv
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS cum,
         |          SUM(cnt) OVER () AS n
         |        FROM h$p))""".stripMargin
    def sc(src: String, p: String): String =
      s"""1 + (CASE WHEN $src > ${p}1 THEN 1 ELSE 0 END)
         |  + (CASE WHEN $src > ${p}2 THEN 1 ELSE 0 END)
         |  + (CASE WHEN $src > ${p}3 THEN 1 ELSE 0 END)
         |  + (CASE WHEN $src > ${p}4 THEN 1 ELSE 0 END)""".stripMargin
    s"""WITH e AS (
       |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_type,
       |         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
       |  FROM events
       |),
       |anchor AS (SELECT MAX(tus) AS anchor_tus FROM e),
       |base AS (
       |  SELECT user_id, COUNT(*) AS f_cnt, SUM(v) AS m_micro,
       |         MAX(tus) AS last_tus
       |  FROM e WHERE event_type = 'purchase' GROUP BY 1
       |),
       |b2 AS (
       |  SELECT user_id,
       |         CAST((anchor_tus - last_tus) // 86400000000 AS BIGINT)
       |           AS r_days,
       |         CAST(f_cnt AS BIGINT) AS f_cnt,
       |         CAST(m_micro AS BIGINT) AS m_micro,
       |         CAST(m_micro // 1000000 AS BIGINT) AS m_units
       |  FROM base, anchor
       |),
       |${cuts("-r_days", "rb")},
       |${cuts("f_cnt", "fb")},
       |${cuts("m_units", "mb")}
       |SELECT user_id, r_days, f_cnt, m_micro,
       |       CAST(${sc("-r_days", "rb")} AS BIGINT) AS r_score,
       |       CAST(${sc("f_cnt", "fb")} AS BIGINT) AS f_score,
       |       CAST(${sc("m_units", "mb")} AS BIGINT) AS m_score,
       |       CAST((${sc("-r_days", "rb")}) * 100
       |          + (${sc("f_cnt", "fb")}) * 10
       |          + (${sc("m_units", "mb")}) AS BIGINT) AS rfm
       |FROM b2, crb, cfb, cmb""".stripMargin
  }

  /** A/B readout mirror ([[graft.pipeline.EventOps.abTestMetrics]]):
    * identical salted MD5-prefix arm assignment, exact ppm/truncating
    * integer metrics. */
  val abTestMetrics: String =
    """WITH e AS (
      |  SELECT CAST(concat('0x',
      |           substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) % 2 AS arm,
      |         user_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
      |         CASE WHEN event_type = 'purchase'
      |              THEN CAST(ROUND(value * 1000000.0) AS BIGINT)
      |              ELSE 0 END AS v
      |  FROM events
      |),
      |pu AS (
      |  SELECT arm, user_id, SUM(p) AS purchases, SUM(v) AS rev
      |  FROM e GROUP BY 1, 2
      |)
      |SELECT arm,
      |       CAST(COUNT(*) AS BIGINT) AS n_users,
      |       CAST(SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_buyers,
      |       CAST(SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)
      |         * 1000000 // COUNT(*) AS BIGINT) AS conv_ppm,
      |       CAST(SUM(purchases) AS BIGINT) AS n_purchases,
      |       CAST(SUM(rev) AS BIGINT) AS revenue_micro,
      |       CAST(SUM(rev) // COUNT(*) AS BIGINT) AS arpu_micro
      |FROM pu GROUP BY 1""".stripMargin
}
