package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables.Fixture
import graft.operators.{Aggregates, EventAnalytics, Joins, Search, SetOps, Windows}

/** Declared relational queries (SURVEY §2.1–§2.8 + §2.9 R7 batch analog).
  *
  * Every spec pairs the Spark pipeline with its DuckDB oracle SQL. Type
  * parity notes: DuckDB `count(*)`/`row_number`/`len`/`year` return BIGINT
  * where Spark returns INT (or vice versa) — casts below keep the parquet
  * schemas identical on both sides.
  */
object RelationalQueries {

  private val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** The gaps-and-islands sessionization CTEs (`g`/`sess`, 30-min gap) —
    * ONE copy for q_session_agg and q_range_join: the gap constant and
    * the (ts, event_id) tiebreak must never desync between them.
    */
  private lazy val SessionCtes: String =
    "g AS (SELECT user_id, ts, event_id, " +
      "CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) IS NULL " +
      "OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
      "sess AS (SELECT user_id, ts, CAST(sum(new_sess) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id " +
      "FROM g)"

  /** The greedy funnel min-chain CTEs (`e`/`m1`/`m2`/`m3`/`r` over the
    * view→click→purchase stages, value ≥ 80 slice) — ONE copy for
    * q_event_funnel and q_funnel_time: the m_k timestamps ARE the fold's
    * advance times, so both oracles must derive them identically.
    */
  private lazy val FunnelMinChainCtes: String =
    """e AS (SELECT user_id, epoch_us(ts) AS ts,
      |  CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |    WHEN 'purchase' THEN 3 END AS BIGINT) AS st
      |  FROM events WHERE event_type IN ('view','click','purchase') AND value >= 80),
      |m1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE st = 1 GROUP BY 1),
      |m2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
      |  JOIN m1 USING (user_id) WHERE e.st = 2 AND e.ts > m1.t1 GROUP BY 1),
      |m3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
      |  JOIN m2 USING (user_id) WHERE e.st = 3 AND e.ts > m2.t2 GROUP BY 1),
      |r AS (SELECT u.user_id,
      |  CASE WHEN m3.t3 IS NOT NULL THEN 3 WHEN m2.t2 IS NOT NULL THEN 2
      |       WHEN m1.t1 IS NOT NULL THEN 1 ELSE 0 END AS reached
      |  FROM (SELECT DISTINCT user_id FROM e) u
      |  LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
      |  LEFT JOIN m3 USING (user_id))""".stripMargin

  /** TPC-H Q3 shape, valid verbatim in both Spark SQL and DuckDB. Ordered
    * by the ROUNDED revenue with a unique tiebreak so the cross-engine
    * compare never depends on raw double summation order.
    */
  private val SqlQ3: String =
    "SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
      "o_orderdate, o_orderpriority " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
      "ORDER BY revenue DESC, l_orderkey LIMIT 10"

  /** TPC-H Q5 shape (local-supplier volume): the 6-table join path.
    * Revenue is computed in integer basis points — `round(price*100)` and
    * `100 - round(discount*100)` are exact integers in both engines, so
    * the sum is order-independent and bit-portable (a float `round(sum)`
    * at 1e7 magnitude can straddle a half-cent boundary differently per
    * fold order; see TextFns determinism rules).
    */
  private val SqlQ5: String =
    "SELECT n_name, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_x10000 " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY n_name ORDER BY revenue_x10000 DESC, n_name"

  /** TPC-H Q4 shape (order-priority checking), adapted to the fixture's
    * columns: EXISTS correlated subquery. Catalyst decorrelates this to a
    * left-SEMI hash join on `l_orderkey` — no per-row subquery execution,
    * one shuffle (or a broadcast under AQE). The classic subquery surface
    * a SQL user of the reference store would expect.
    */
  private val SqlQ4: String =
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count " +
      "FROM orders WHERE EXISTS (" +
      "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  /** TPC-H Q17 shape (small-quantity-order revenue): correlated SCALAR
    * subquery per part. Catalyst decorrelates it to an aggregate joined
    * back on the correlation key — the per-part aggregate runs once over
    * the table, not once per outer row. The threshold comparison is exact
    * (integral quantities, integer doubling), so the predicate can never
    * flip on cross-engine float rounding; the output sum uses integer
    * cents for fold-order independence.
    */
  private val SqlQ17: String =
    "SELECT p_brand, CAST(count(*) AS BIGINT) AS small_orders, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE l_quantity * 2 < (" +
      "SELECT max(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey) " +
      "GROUP BY p_brand ORDER BY p_brand"

  /** TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
    * subquery. Catalyst plans the subquery as its own aggregate and turns
    * the IN into a left-semi join; the HAVING sum is exact (integral
    * quantities).
    */
  private val SqlQ18: String =
    "SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "WHERE o_orderkey IN (" +
      "SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 270) " +
      "ORDER BY o_orderkey"

  /** TPC-H Q7 shape (volume shipping between two nations): the join graph
    * references `nation` TWICE under different roles (supplier's vs
    * customer's) — the self-referential dimension pattern — with a
    * disjunctive cross-nation predicate and a per-year rollup. Both
    * nation sides are broadcast-size at any scale; revenue in integer
    * basis points for fold-order-independent cross-engine equality.
    */
  private val SqlQ7: String =
    "SELECT supp_nation, cust_nation, l_year, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_x10000 " +
      "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "CAST(year(l_shipdate) AS BIGINT) AS l_year, l_extendedprice, l_discount " +
      "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
      "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) shipping " +
      "GROUP BY supp_nation, cust_nation, l_year " +
      "ORDER BY supp_nation, cust_nation, l_year"

  /** TPC-H Q10 shape (returned-item revenue by customer): fact⋈fact join
    * (orders⋈lineitem) under a selective flag filter, customer+nation
    * enrichment, top-20 by revenue. The grouped key includes the customer
    * attributes so no second join-back is needed.
    */
  private val SqlQ10: String =
    "SELECT c_custkey, c_name, n_name, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_x10000 " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE l_returnflag = 'R' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' " +
      "GROUP BY c_custkey, c_name, n_name " +
      "ORDER BY revenue_x10000 DESC, c_custkey LIMIT 20"

  /** TPC-H Q14 shape (promo-revenue split): conditional aggregation over
    * a date-sliced fact⋈dim join — the numerator/denominator pair of the
    * classic promo ratio, kept as two exact integer sums (a cross-engine
    * float division would round differently; callers divide). DuckDB sums
    * integers into HUGEINT, hence the explicit BIGINT casts.
    */
  private val SqlQ14: String =
    "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN " +
      "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) ELSE 0 END) AS BIGINT) AS promo_x10000, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS total_x10000 " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"

  /** TPC-H Q6 shape (forecasting revenue change): the pure scan-side
    * query — no join, no group — whose entire cost is how much of the
    * fact table the scan can SKIP. Every predicate (date range, discount
    * band, quantity cap) is pushdown-eligible to the parquet reader's
    * row-group stats; at 100 TB with date-partitioned layout this reads
    * one partition's worth of row groups, nothing else. Revenue in
    * integer basis points for fold-order-independent equality.
    */
  private val SqlQ6: String =
    "SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_x10000, " +
      "CAST(count(*) AS BIGINT) AS n_items " +
      "FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"

  /** TPC-H Q19 shape (discounted revenue, adapted to the fixture's part
    * columns): three DISJUNCTIVE predicate branches, each constraining
    * both sides of the part⋈lineitem join. The planner must keep the
    * per-side conjuncts (`p_brand IN ...`, `l_quantity <= 30`) pushed
    * below the join while evaluating the cross-side disjunction above
    * it — the classic OR-of-ANDs pushdown test.
    */
  private val SqlQ19: String =
    "SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_x10000, " +
      "CAST(count(*) AS BIGINT) AS n_items " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#1' AND p_size >= 1 AND p_size <= 15 " +
      "AND l_quantity >= 1 AND l_quantity <= 11) " +
      "OR (p_brand = 'Brand#2' AND p_size >= 1 AND p_size <= 25 " +
      "AND l_quantity >= 10 AND l_quantity <= 20) " +
      "OR (p_brand = 'Brand#3' AND p_size >= 1 AND p_size <= 35 " +
      "AND l_quantity >= 20 AND l_quantity <= 30)"

  /** TPC-H Q2 shape (minimum-cost supplier), adapted to the fixture (no
    * `partsupp` — the part↔supplier relationship comes from `lineitem`,
    * and `s_acctbal` stands in for the supply cost): a correlated MIN
    * subquery whose inner query is itself a JOIN, the suite's deepest
    * decorrelation after Q21. The equality predicate compares a STORED
    * double against a min over stored doubles — no arithmetic, so the
    * compare is bit-exact in both engines. DISTINCT because a part keyed
    * through many lineitems repeats its winning supplier.
    */
  private val SqlQ2: String =
    "SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "WHERE p_size <= 5 " +
      "AND s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2 " +
      "JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey WHERE l2.l_partkey = p_partkey) " +
      "ORDER BY p_partkey, s_suppkey LIMIT 100"

  /** TPC-H Q12 shape (shipping-priority line split), adapted to the
    * fixture's columns (`l_linestatus` stands in for the missing
    * `l_shipmode`): fact⋈fact join under a scan-side date slice with a
    * two-way conditional count — the canonical CASE-inside-SUM surface.
    */
  private val SqlQ12: String =
    "SELECT l_linestatus, " +
      "CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_linestatus ORDER BY l_linestatus"

  /** TPC-H Q13 shape (customer order-count distribution): LEFT join with a
    * join-side filter (standing in for the original `o_comment NOT LIKE`),
    * then an aggregate OF an aggregate — per-customer counts regrouped
    * into a histogram. Customers with no qualifying orders must survive as
    * `c_count = 0`, the classic outer-join-then-count trap.
    */
  private val SqlQ13: String =
    "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (" +
      "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count " +
      "FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW' " +
      "GROUP BY c_custkey) c_orders " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"

  /** TPC-H Q15 shape (top supplier): a CTE referenced twice — once as the
    * join input and once under `max()` in a scalar subquery. Catalyst
    * plans the second reference as its own aggregate over the (reused)
    * CTE; revenue in integer basis points so the max-equality predicate
    * can never split on cross-engine float rounding.
    */
  private val SqlQ15: String =
    "WITH revenue AS (" +
      "SELECT l_suppkey AS supplier_no, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS total_rev " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' " +
      "GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_rev " +
      "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
      "WHERE total_rev = (SELECT max(total_rev) FROM revenue) " +
      "ORDER BY s_suppkey"

  /** TPC-H Q16 shape (supplier diversity per part class), adapted to the
    * fixture (no `partsupp` — the part⋈supplier relationship comes from
    * `lineitem`): COUNT(DISTINCT) per group plus a NOT IN subquery
    * (planned as a null-aware anti join; `s_suppkey` is non-null so it
    * stays a plain anti join — no pathological null-check cross join).
    */
  private val SqlQ16: String =
    "SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"

  /** TPC-H Q21 shape (suppliers who kept waiting orders), adapted to the
    * fixture's dates (lateness = shipped after the order date; there is no
    * receipt/commit date): EXISTS + correlated NOT EXISTS on the SAME
    * fact table with `<>` on the correlation side and an outer-column
    * comparison — the hardest decorrelation shape in the suite. Catalyst
    * turns both into semi/anti hash joins on `l_orderkey` with the
    * residual predicates as join conditions, never a per-row re-scan.
    */
  private val SqlQ21: String =
    "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait " +
      "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
      "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o_orderdate) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"

  /** TPC-H Q22 shape (dormant high-balance customers), adapted to the
    * fixture (country code = the customer number's tail digits; dormancy =
    * never placed an urgent order, since every fixture customer has SOME
    * order): a single-row aggregate subquery cross-joined in (the
    * avg-balance threshold) plus a correlated NOT EXISTS anti join. The
    * threshold compare is pure integer (`cents * n > sum_cents`) — the
    * textbook float-avg boundary flip can't happen cross-engine.
    */
  private val SqlQ22: String =
    "SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust, " +
      "CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS totacctbal_cents " +
      "FROM (SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey " +
      "FROM customer c, (SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS s, " +
      "CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_acctbal > 0.00) t " +
      "WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * t.n > t.s " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderpriority = '1-URGENT')) cust " +
      "GROUP BY cntrycode ORDER BY cntrycode"

  /** TPC-H Q8 shape (national market share): the widest join graph in the
    * suite — EIGHT relations, `nation` twice under different roles — with
    * numerator/denominator kept as separate exact integer sums (callers
    * divide; a cross-engine float share would round differently).
    */
  private val SqlQ8: String =
    "SELECT o_year, " +
      "CAST(sum(CASE WHEN nation = 'NATION_1' THEN vol ELSE 0 END) AS BIGINT) AS nation_vol, " +
      "CAST(sum(vol) AS BIGINT) AS total_vol " +
      "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS vol, " +
      "n2.n_name AS nation " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'ASIA' AND p_type = 'PROMO') all_nations " +
      "GROUP BY o_year ORDER BY o_year"

  /** TPC-H Q9 shape (product-line profit by nation and year), adapted to
    * the fixture (no `partsupp` — `p_retailprice` stands in for the
    * supply cost): LIKE-filtered 5-table join with a signed integer
    * amount (revenue minus cost can go negative — exercises signed
    * aggregation both engines must fold identically).
    */
  private val SqlQ9: String =
    "SELECT nation, o_year, CAST(sum(amount) AS BIGINT) AS sum_profit " +
      "FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) " +
      "- CAST(round(p_retailprice * 100, 0) AS BIGINT) * CAST(round(l_quantity, 0) AS BIGINT) * 100 AS amount " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%red%') profit " +
      "GROUP BY nation, o_year ORDER BY nation, o_year DESC"

  /** TPC-H Q11 shape (important stock identification), adapted to the
    * fixture (no `partsupp` — per-part shipped VALUE through one nation's
    * suppliers stands in for the stock value): GROUP BY + HAVING against a
    * GLOBAL scalar computed by a second aggregation over the same
    * restricted join. The TPC-H fraction (0.0001/SF) is scale-dependent by
    * design; here the threshold is scale-FREE — a part qualifies when its
    * value exceeds 2× the average per-part value — expressed in pure
    * integer math (`n_parts · value > 2 · total`), so the predicate can
    * never flip on a cross-engine float boundary. Catalyst evaluates both
    * uncorrelated scalar subqueries once (subquery reuse) and folds them
    * into the HAVING filter as literals — no per-group re-aggregation.
    */
  private val SqlQ11: String = {
    val v = "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "CAST(l_quantity AS BIGINT)) AS BIGINT)"
    val base = "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_1'"
    s"SELECT l_partkey, $v AS value_cents $base GROUP BY l_partkey " +
      s"HAVING (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) $base) * $v > " +
      s"2 * (SELECT $v $base) " +
      "ORDER BY value_cents DESC, l_partkey"
  }

  /** TPC-H Q20 shape (potential part promotion), adapted to the fixture
    * (no `partsupp` — a supplier-part's 1996 shipped quantity stands in
    * for the available stock): the NESTED-IN topology with a correlated
    * half-of-sum threshold — supplier IN (aggregated supplier-parts WHERE
    * part IN (LIKE-filtered parts) AND quantity > half of a correlated
    * per-(part)-scalar) — i.e. suppliers owning the MAJORITY of a promo
    * part's 1996 volume. Catalyst decorrelates the scalar into one
    * per-part aggregate joined back on the correlation key, and both INs
    * into left-semi joins; integral quantities make every compare exact.
    */
  private val SqlQ20: String =
    "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (" +
      "SELECT su FROM (" +
      "SELECT l_suppkey AS su, l_partkey AS pk, " +
      "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q96 " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_suppkey, l_partkey) sp " +
      "WHERE pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') " +
      "AND 2 * q96 > (SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT) " +
      "FROM lineitem l2 WHERE l2.l_partkey = sp.pk " +
      "AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00')) " +
      "ORDER BY s_suppkey"

  val specs: Seq[QuerySpec] = Seq(

    // ── §2.1 scans ─────────────────────────────────────────────────────
    // S1: explicit column list, never SELECT * (audit.services.ts:148-163).
    QuerySpec("q_scan_project",
      (s, d) => Fixture(s, d).events
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id"),
      Some("SELECT event_id, ts, user_id, event_type FROM events ORDER BY event_id")),

    // S2/X5: schema-on-read JSON extraction (processQueue.ts:107-128).
    QuerySpec("q_json_extract",
      (s, d) => Fixture(s, d).events
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      // TRY_CAST mirrors Spark's non-ANSI cast (null on a non-integer
      // value, never a conversion error) — same parity as q_scalar_regex
      Some("SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k " +
        "FROM events ORDER BY event_id")),

    // ── §2.2 filters ───────────────────────────────────────────────────
    // F1+F2: dynamic conjunctive filter, 3 predicates present.
    QuerySpec("q_filter_conj",
      (s, d) => Search.dynamicFilter(Fixture(s, d).events,
          Map("event_type" -> "purchase", "user_id" -> 7))
        .filter(col("event_id") % 2 === 0)
        .select(eventCols.map(col): _*)
        .orderBy("event_id"),
      Some("SELECT event_id, ts, user_id, event_type, value, props FROM events " +
        "WHERE event_type = 'purchase' AND user_id = 7 AND event_id % 2 = 0 " +
        "ORDER BY event_id")),

    // F1 degenerate: zero predicates → WHERE omitted (audit.services.ts:143-145).
    QuerySpec("q_filter_none",
      (s, d) => Search.dynamicFilter(Fixture(s, d).events, Map.empty)
        .select(eventCols.map(col): _*)
        .orderBy("event_id"),
      Some("SELECT event_id, ts, user_id, event_type, value, props FROM events " +
        "ORDER BY event_id")),

    // F3/X8: classification predicate (processQueue.ts:113) + CASE WHEN.
    QuerySpec("q_classify",
      (s, d) => Fixture(s, d).events
        .select(col("event_id"), col("event_type"),
          when(col("event_type").isin("purchase", "signup"), "conversion")
            .when(col("event_type") === "error", "failure")
            .otherwise("engagement").as("kind"),
          col("event_type").contains("ck").as("is_click"))
        .orderBy("event_id"),
      Some("SELECT event_id, event_type, " +
        "CASE WHEN event_type IN ('purchase','signup') THEN 'conversion' " +
        "WHEN event_type = 'error' THEN 'failure' ELSE 'engagement' END AS kind, " +
        "contains(event_type, 'ck') AS is_click FROM events ORDER BY event_id")),

    // ── §2.3 joins ─────────────────────────────────────────────────────
    // J1/S7: update-join merge — base records pick up latest status from a
    // batch (processQueue.ts:230-238). orders = inserts, lineitem = updates.
    QuerySpec("q_merge_responses",
      (s, d) => {
        val f = Fixture(s, d)
        val updates = f.lineitem.groupBy(col("l_orderkey")).agg(
          max(col("l_linestatus")).as("response_status"),
          count(lit(1)).as("n_lines"))
        Joins.mergeUpdates(
            f.orders.withColumnRenamed("o_orderkey", "l_orderkey"), updates, "l_orderkey")
          .select(col("l_orderkey").as("o_orderkey"), col("o_orderstatus"),
            col("response_status"), col("n_lines"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderstatus, response_status, n_lines FROM orders " +
        "JOIN (SELECT l_orderkey, max(l_linestatus) AS response_status, count(*) AS n_lines " +
        "FROM lineitem GROUP BY l_orderkey) r ON o_orderkey = l_orderkey ORDER BY o_orderkey")),

    // J2: detail-fetch enrichment — top-K result broadcast-left-joined to a
    // dimension (audit.services.ts:210-242 re-expressed set-based).
    QuerySpec("q_enrich_join",
      (s, d) => {
        val f = Fixture(s, d)
        val top = Search.search(f.events, Map.empty, "ts", "event_id", 100)
        Search.enrich(top, f.customer.select("c_custkey", "c_name", "c_mktsegment"),
            col("user_id") === col("c_custkey"))
          .select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")
          .orderBy("event_id")
      },
      Some("WITH top AS (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 100) " +
        "SELECT event_id, user_id, event_type, c_name, c_mktsegment FROM top " +
        "LEFT JOIN customer ON user_id = c_custkey ORDER BY event_id")),

    // J3: left outer — absent-response NULL semantics (setup-db.ts:61,66).
    QuerySpec("q_left_join",
      (s, d) => {
        val f = Fixture(s, d)
        Joins.leftJoin(f.customer.withColumnRenamed("c_custkey", "k"),
            f.orders.withColumnRenamed("o_custkey", "k"), Seq("k"))
          .select(col("k").as("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
      },
      Some("SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey " +
        "ORDER BY c_custkey, o_orderkey NULLS FIRST")),

    // J4: left semi — customers that have orders.
    QuerySpec("q_semi_join",
      (s, d) => {
        val f = Fixture(s, d)
        Joins.semiJoin(f.customer, f.orders, col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey")),

    // J5: left anti — orphans (requests whose response never landed). The
    // right side is pre-filtered so the result is nonempty at every sf.
    QuerySpec("q_anti_join",
      (s, d) => {
        val f = Fixture(s, d)
        Joins.antiJoin(f.customer, f.orders.filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) " +
        "ORDER BY c_custkey")),

    // J6: multi-way star join, dims broadcast.
    QuerySpec("q_star_join",
      (s, d) => {
        val f = Fixture(s, d)
        Joins.starJoin(f.lineitem, f.orders, f.customer, f.nation, f.region)
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("cnt"))
          .orderBy("r_name", "n_name")
      },
      Some("SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS cnt FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name")),

    // Skew-resistant salted join, oracle-checked: salting must be
    // row-IDENTICAL to the plain join (the oracle is the unsalted SQL), so
    // the skew machinery is verified by the exact same gate as every other
    // operator. At this fixture size the replicated 25-row dim broadcasts
    // (AQE) and the salt costs nothing; the operator exists for the
    // non-broadcastable case where the hot key's rows must land on
    // `buckets` tasks instead of one (JoinsSpec pins the skew semantics).
    QuerySpec("q_salted_join",
      (s, d) => {
        val f = Fixture(s, d)
        val e = f.events.withColumn("n_nationkey", (col("user_id") % 25).cast("int"))
        Joins.saltedJoin(e, f.nation, "n_nationkey", buckets = 8)
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("event_id")).cast("long").as("sum_id"))
          .orderBy("n_name")
      },
      Some("SELECT n_name, count(*) AS n_events, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM events JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")),

    // J7: as-of join — each event picks up the user's most recent purchase
    // value at-or-before its timestamp (union + single-sort window fill;
    // DuckDB verifies with its native ASOF LEFT JOIN).
    QuerySpec("q_asof_join",
      (s, d) => {
        val f = Fixture(s, d)
        val purchases = f.events.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("purchase_v"))
        Joins.asofJoin(f.events.select("event_id", "user_id", "ts"), purchases,
            "user_id", "ts", Seq("purchase_v"))
          .select("event_id", "user_id", "ts", "purchase_v")
          .orderBy("event_id")
      },
      Some("WITH p AS (SELECT user_id, ts, max(value) AS purchase_v FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) " +
        "SELECT e.event_id, e.user_id, e.ts, p.purchase_v " +
        "FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts " +
        "ORDER BY e.event_id")),

    // J7b: range join — events matched into their own user's session
    // intervals (operator composition: sessionAgg output is the interval
    // side). Bucket-prejoin keeps it a hash join, not a nested loop.
    QuerySpec("q_range_join",
      (s, d) => {
        val f = Fixture(s, d)
        val sessions = Windows.sessionAgg(f.events, "user_id", "ts", "event_id", 1800L)
        Joins.rangeJoin(f.events.select("event_id", "user_id", "ts"), sessions,
            "user_id", "ts", "session_start", "session_end", bucketSeconds = 3600L)
          .select(col("event_id"), col("user_id"), col("session_id"),
            col("session_start"), col("n_events"))
          .orderBy("event_id")
      },
      Some(s"WITH $SessionCtes, " +
        "sessions AS (SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events FROM sess GROUP BY user_id, session_id) " +
        "SELECT e.event_id, e.user_id, s.session_id, s.session_start, s.n_events " +
        "FROM events e JOIN sessions s ON e.user_id = s.user_id " +
        "AND e.ts >= s.session_start AND e.ts <= s.session_end " +
        "ORDER BY e.event_id")),

    // ── §2.4 aggregations ──────────────────────────────────────────────
    QuerySpec("q_count",
      (s, d) => Aggregates.countAll(Fixture(s, d).events),
      Some("SELECT count(*) AS cnt FROM events")),

    QuerySpec("q_group_count",
      (s, d) => Aggregates.groupCount(Fixture(s, d).events, "event_type"),
      Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type")),

    QuerySpec("q_min_avg_max",
      (s, d) => Aggregates.minAvgMax(Fixture(s, d).events, "event_type", "value"),
      Some("SELECT event_type, round(min(value), 2) AS min_v, round(avg(value), 2) AS avg_v, " +
        "round(max(value), 2) AS max_v FROM events GROUP BY event_type ORDER BY event_type")),

    QuerySpec("q_percentile",
      (s, d) => Aggregates.percentiles(Fixture(s, d).events, "event_type", "value"),
      Some("SELECT event_type, round(quantile_cont(value, 0.5), 2) AS p50, " +
        "round(quantile_cont(value, 0.9), 2) AS p90, " +
        "round(quantile_cont(value, 0.99), 2) AS p99 " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // A4b: bottom-k-hash quantile SKETCH — the deterministic mergeable
    // alternative to exact percentiles (per-group state bounded at k=64
    // rows instead of every value; WindowGroupLimit keeps the top-k
    // map-side). md5 sample membership re-derives bit-identically in
    // DuckDB, so unlike percentile_approx this sketch hash-checks.
    QuerySpec("q_quantile_sketch",
      (s, d) => Aggregates.kmhQuantiles(Fixture(s, d).events,
        "event_type", "event_id", "value", k = 64),
      Some(
        s"""WITH r AS (SELECT event_type, value,
           |  row_number() OVER (PARTITION BY event_type
           |    ORDER BY ${NsQueries.h60Sql("CAST(event_id AS VARCHAR)")}, event_id) AS rn
           |  FROM events)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
           |  round(quantile_cont(value, 0.5), 2) AS p50_est,
           |  round(quantile_cont(value, 0.9), 2) AS p90_est
           |FROM r WHERE rn <= 64 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QuerySpec("q_distinct",
      (s, d) => Aggregates.distinctOf(Fixture(s, d).events, Seq("user_id", "event_type")),
      Some("SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type")),

    QuerySpec("q_rollup",
      (s, d) => Aggregates.rollupSum(Fixture(s, d).lineitem, "l_returnflag", "l_linestatus", "l_quantity"),
      Some("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_v, count(*) AS cnt " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    // A7b: CUBE — all grouping-set combinations.
    QuerySpec("q_cube",
      (s, d) => Aggregates.cubeSum(Fixture(s, d).lineitem, "l_returnflag", "l_linestatus", "l_quantity"),
      Some("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_v, count(*) AS cnt " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    // A9: PIVOT — explicit value list, absent combos = 0.
    QuerySpec("q_pivot",
      (s, d) => Aggregates.pivotCount(Fixture(s, d).events, "user_id", "event_type",
        Seq("click", "error", "purchase", "signup", "view")),
      Some("SELECT user_id, " +
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, " +
        "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, " +
        "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, " +
        "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view " +
        "FROM events GROUP BY user_id ORDER BY user_id")),

    // A8: TPC-H Q1 shape — partial+final agg at scale.
    QuerySpec("q_agg_sum",
      (s, d) => Aggregates.pricingSummary(Fixture(s, d).lineitem, "1998-09-02 00:00:00"),
      Some("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc, " +
        "round(avg(l_quantity), 2) AS avg_qty, round(avg(l_discount), 2) AS avg_disc, " +
        "count(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // A10: string aggregation — sorted distinct concat (deterministic).
    QuerySpec("q_string_agg",
      (s, d) => Fixture(s, d).events
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("cnt"))
        .orderBy("user_id"),
      Some("SELECT user_id, array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types, " +
        "count(*) AS cnt FROM events GROUP BY user_id ORDER BY user_id")),

    // A11: histogram — fixed-width binning in exact integer/floor math.
    // The bin is nullable (a NULL value groups as a NULL bin): order it
    // NULLS FIRST on both engines — Spark defaults nulls-first, DuckDB
    // nulls-last, and the compare is row-order-sensitive.
    QuerySpec("q_histogram",
      (s, d) => Fixture(s, d).events
        .groupBy(floor(col("value") / 50).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bin").asc_nulls_first),
      Some("SELECT CAST(floor(value / 50) AS BIGINT) AS bin, count(*) AS cnt " +
        "FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST")),

    // A12: statistical aggregates (stddev/variance/correlation).
    QuerySpec("q_stats_agg",
      (s, d) => Fixture(s, d).events
        .groupBy(col("event_type"))
        .agg(round(stddev_samp(col("value")), 2).as("sd"),
          round(var_samp(col("value")), 2).as("vr"),
          round(corr(col("value"), col("user_id").cast("double")), 4).as("r"))
        .orderBy("event_type"),
      Some("SELECT event_type, round(stddev_samp(value), 2) AS sd, " +
        "round(var_samp(value), 2) AS vr, " +
        "round(corr(value, CAST(user_id AS DOUBLE)), 4) AS r " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // A-extension: ANALYZE-style dataset profile — per-column row/null/
    // distinct counts + min/max in ONE scan (stacked single aggregation).
    QuerySpec("q_profile",
      (s, d) => Aggregates.profile(Fixture(s, d).events,
        Seq("event_id", "user_id", "event_type", "props")),
      Some(Seq("event_id", "user_id", "event_type", "props").map(c =>
        s"SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, " +
          s"CAST(count(*) - count($c) AS BIGINT) AS n_nulls, " +
          s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val " +
          "FROM events").mkString(" UNION ALL ") + " ORDER BY column_name")),

    // A13: argmax — latest event per user via max_by with a zero-padded
    // composite key (DuckDB arg_max lacks struct ordering keys; a fixed-
    // width string makes lexicographic ≡ (ts, event_id) numeric order).
    // The +1e16 µs offset (~317 years) keeps the key positive for any
    // plausible timestamp — lpad on a negative number would zero-pad in
    // front of the minus sign and invert the pre-1970 ordering.
    QuerySpec("q_argmax",
      (s, d) => Fixture(s, d).events
        .groupBy(col("user_id"))
        .agg(max_by(col("event_type"),
          concat(lpad((unix_micros(col("ts")) + 10000000000000000L).cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 10, "0"))).as("latest_type"),
          max(col("ts")).as("latest_ts"))
        .orderBy("user_id"),
      Some("SELECT user_id, arg_max(event_type, " +
        "lpad(CAST(epoch_us(ts) + 10000000000000000 AS VARCHAR), 20, '0') || " +
        "lpad(CAST(event_id AS VARCHAR), 10, '0')) AS latest_type, " +
        "max(ts) AS latest_ts FROM events GROUP BY user_id ORDER BY user_id")),

    // ── §2.5 windows ───────────────────────────────────────────────────
    QuerySpec("q_window_rank",
      (s, d) => Windows.topNPerKey(Fixture(s, d).events, "user_id", "ts", "event_id", 5)
        .select("user_id", "event_id", "ts", "rn")
        .orderBy("user_id", "rn"),
      Some("SELECT user_id, event_id, ts, CAST(rn AS INT) AS rn FROM " +
        "(SELECT user_id, event_id, ts, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) " +
        "WHERE rn <= 5 ORDER BY user_id, rn")),

    QuerySpec("q_window_running",
      (s, d) => Windows.runningSum(Fixture(s, d).events, "user_id", "ts", "event_id", "value")
        .select("user_id", "event_id", "running_v")
        .orderBy("user_id", "event_id"),
      Some("SELECT user_id, event_id, round(sum(value) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_v " +
        "FROM events ORDER BY user_id, event_id")),

    QuerySpec("q_window_lag",
      (s, d) => Windows.interEventDelta(Fixture(s, d).events, "user_id", "ts", "event_id")
        .select("user_id", "event_id", "ts", "prev_ts", "delta_us")
        .orderBy("user_id", "event_id"),
      Some("SELECT user_id, event_id, ts, lag(ts, 1) OVER w AS prev_ts, " +
        "epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS delta_us FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY user_id, event_id")),

    // W4: batch sessionization — gaps-and-islands with a 30-minute gap.
    QuerySpec("q_session_agg",
      (s, d) => Windows.sessionAgg(Fixture(s, d).events, "user_id", "ts", "event_id", 1800L)
        .orderBy("user_id", "session_start"),
      Some(s"WITH $SessionCtes " +
        "SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events FROM sess GROUP BY user_id, session_id " +
        "ORDER BY user_id, session_start"),
    ),

    // ── §2.6 top-K (the reference's flagship read path) ────────────────
    QuerySpec("q_topk",
      (s, d) => Search.search(Fixture(s, d).events, Map.empty, "ts", "event_id", 100)
        .select(eventCols.map(col): _*),
      Some("SELECT event_id, ts, user_id, event_type, value, props FROM events " +
        "ORDER BY ts DESC, event_id DESC LIMIT 100")),

    // ── §2.7 set ops ───────────────────────────────────────────────────
    QuerySpec("q_union",
      (s, d) => {
        val e = Fixture(s, d).events.select("event_id", "user_id", "event_type")
        SetOps.unionAll(
            e.filter(col("event_type") === "click"),
            e.filter(col("event_type") === "view"))
          .orderBy("event_id")
      },
      Some("SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click' " +
        "UNION ALL SELECT event_id, user_id, event_type FROM events WHERE event_type = 'view' " +
        "ORDER BY event_id")),

    // U1b: UNION with distinct semantics (vs U1's UNION ALL).
    QuerySpec("q_union_distinct",
      (s, d) => {
        val e = Fixture(s, d).events.select("user_id", "event_type")
        SetOps.unionAll(
            e.filter(col("event_type") === "click"),
            e.filter(col("event_type") === "view"))
          .distinct()
          .orderBy("user_id", "event_type")
      },
      Some("SELECT user_id, event_type FROM events WHERE event_type = 'click' " +
        "UNION SELECT user_id, event_type FROM events WHERE event_type = 'view' " +
        "ORDER BY user_id, event_type")),

    // J9: cross join (tiny-side cartesian — the only place it's legitimate).
    QuerySpec("q_cross_join",
      (s, d) => {
        val f = Fixture(s, d)
        f.region.select("r_name").crossJoin(f.nation.select("n_name"))
          .orderBy("r_name", "n_name")
      },
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name")),

    QuerySpec("q_intersect",
      (s, d) => {
        val e = Fixture(s, d).events
        SetOps.intersect(
            e.filter(col("event_type") === "click").select("user_id"),
            e.filter(col("event_type") === "error").select("user_id"))
          .orderBy("user_id")
      },
      Some("SELECT user_id FROM events WHERE event_type = 'click' " +
        "INTERSECT SELECT user_id FROM events WHERE event_type = 'error' ORDER BY user_id")),

    QuerySpec("q_except",
      (s, d) => {
        val e = Fixture(s, d).events
        SetOps.except(
            e.select("user_id", "event_type"),
            e.filter(col("value") > 150).select("user_id", "event_type"))
          .orderBy("user_id", "event_type")
      },
      Some("SELECT DISTINCT user_id, event_type FROM events " +
        "EXCEPT SELECT DISTINCT user_id, event_type FROM events WHERE value > 150 " +
        "ORDER BY user_id, event_type")),

    // ── §2.8 scalars ───────────────────────────────────────────────────
    // X1/X2: date truncation + parts (s3.service.ts:33 partition key).
    QuerySpec("q_scalar_date",
      (s, d) => Fixture(s, d).events
        .select(col("event_id"),
          to_date(col("ts")).as("dt"),
          year(col("ts")).as("y"),
          month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"),
          date_format(col("ts"), "yyyy-MM-dd").as("dt_str"),
          date_trunc("hour", col("ts")).as("ts_hour"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(ts AS DATE) AS dt, CAST(year(ts) AS INT) AS y, " +
        "CAST(month(ts) AS INT) AS m, CAST(day(ts) AS INT) AS d, " +
        "strftime(ts, '%Y-%m-%d') AS dt_str, date_trunc('hour', ts) AS ts_hour " +
        "FROM events ORDER BY event_id")),

    // X4/X9: string surface (key construction s3.service.ts:34).
    QuerySpec("q_scalar_string",
      (s, d) => Fixture(s, d).documents
        .select(col("doc_id"),
          upper(col("lang")).as("lang_up"),
          substring(col("text"), 1, 10).as("prefix"),
          length(col("text")).as("n_len"),
          concat_ws("/", col("source"), col("lang")).as("key"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, upper(lang) AS lang_up, substring(text, 1, 10) AS prefix, " +
        "CAST(length(text) AS INT) AS n_len, concat_ws('/', source, lang) AS key " +
        "FROM documents ORDER BY doc_id")),

    // X7: arithmetic + round (duration-ms math, audit.middleware.ts:90-92).
    QuerySpec("q_scalar_math",
      (s, d) => Fixture(s, d).events
        .select(col("event_id"),
          // ×3 keeps 2-dp inputs at 2 dp — never a .005 half-rounding
          // boundary (×1.1 would land on one for every odd-cent input,
          // where Spark HALF_UP and DuckDB binary rounding disagree).
          round(col("value") * 3, 2).as("v_scaled"),
          round(sqrt(abs(col("value"))), 2).as("v_sqrt"),
          floor(col("value")).cast("long").as("v_floor"),
          round(col("value") % 7, 2).as("v_mod"),
          round(log(abs(col("value")) + 1), 2).as("v_ln"))
        .orderBy("event_id"),
      Some("SELECT event_id, round(value * 3, 2) AS v_scaled, round(sqrt(abs(value)), 2) AS v_sqrt, " +
        "CAST(floor(value) AS BIGINT) AS v_floor, round(value % 7, 2) AS v_mod, " +
        "round(ln(abs(value) + 1), 2) AS v_ln FROM events ORDER BY event_id")),

    // X11: regex scalar surface — extract/replace/match on the JSON blob.
    QuerySpec("q_scalar_regex",
      (s, d) => Fixture(s, d).events
        .select(col("event_id"),
          // nullif('') → NULL on no-match (Spark regexp_extract returns ''
          // and ANSI cast('' as long) would throw); DuckDB TRY_CAST+NULLIF
          // mirrors the same no-match → NULL semantics
          nullif(regexp_extract(col("props"), "\"k\": ?(-?\\d+)", 1), lit(""))
            .cast("long").as("k_num"),
          regexp_replace(col("props"), "\\d", "#").as("masked"),
          col("props").rlike("\\d\\d").as("has_2digits"))
        .orderBy("event_id"),
      Some("SELECT event_id, TRY_CAST(NULLIF(regexp_extract(props, '\"k\": ?(-?\\d+)', 1), '') AS BIGINT) AS k_num, " +
        "regexp_replace(props, '\\d', '#', 'g') AS masked, " +
        "regexp_matches(props, '\\d\\d') AS has_2digits FROM events ORDER BY event_id")),

    // X12: null-handling scalar surface — coalesce/nullif/greatest/least.
    QuerySpec("q_scalar_null",
      (s, d) => Fixture(s, d).events
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("(errored)")).as("masked_type"),
          greatest(col("value"), lit(0.0)).as("v_pos"),
          least(col("user_id"), lit(50L)).as("u_cap"),
          when(col("value").isNull, -1.0).otherwise(col("value")).as("v_filled"))
        .orderBy("event_id"),
      Some("SELECT event_id, coalesce(nullif(event_type, 'error'), '(errored)') AS masked_type, " +
        "greatest(value, 0.0) AS v_pos, least(user_id, 50) AS u_cap, " +
        "CASE WHEN value IS NULL THEN -1.0 ELSE value END AS v_filled " +
        "FROM events ORDER BY event_id")),

    // X10: array/higher-order functions over embeddings.
    QuerySpec("q_array_ops",
      (s, d) => Fixture(s, d).embeddings
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first"),
          round(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 2).as("l2"),
          array_max(col("embedding")).cast("double").as("mx"))
        .orderBy("vec_id"),
      Some("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, " +
        "CAST(embedding[1] AS DOUBLE) AS first, " +
        "round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 2) AS l2, " +
        "CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings ORDER BY vec_id")),

    // SQL surface end-to-end: the same engine queried through spark.sql
    // over registered views (TPC-H Q3 shape — shipping-priority revenue).
    // The SQL text IS the oracle text: one declaration, two engines.
    QuerySpec("q_sql_q3",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ3)
      },
      Some(SqlQ3)),

    // SQL surface, 6-table join path (TPC-H Q5 shape): customer⋈orders⋈
    // lineitem⋈supplier⋈nation⋈region with the co-located-nation predicate.
    // AQE broadcasts the dim chain; integer-bp revenue for cross-engine
    // determinism. The SQL text IS the oracle text.
    QuerySpec("q_sql_q5",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ5)
      },
      Some(SqlQ5)),

    // SQL surface, correlated EXISTS (TPC-H Q4 shape). Decorrelated by
    // Catalyst to a left-semi join — plan-pinned in PlanAuditSpec.
    QuerySpec("q_sql_exists",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ4)
      },
      Some(SqlQ4)),

    // SQL surface, correlated SCALAR subquery (TPC-H Q17 shape).
    // Decorrelated to one per-key aggregate + join-back, not a per-row
    // re-execution — the difference between O(n) and O(n²) at 100 TB.
    QuerySpec("q_sql_scalar_subq",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ17)
      },
      Some(SqlQ17)),

    // SQL surface, IN over a grouped-HAVING subquery (TPC-H Q18 shape).
    QuerySpec("q_sql_in_subq",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ18)
      },
      Some(SqlQ18)),

    // SQL surface, nation self-referenced twice under different join roles
    // with a disjunctive cross predicate (TPC-H Q7 shape).
    QuerySpec("q_sql_q7",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ7)
      },
      Some(SqlQ7)),

    // SQL surface, selective-flag fact join + top-20 customers (Q10 shape).
    QuerySpec("q_sql_q10",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ10)
      },
      Some(SqlQ10)),

    // SQL surface, conditional-aggregation promo split (TPC-H Q14 shape).
    QuerySpec("q_sql_q14",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ14)
      },
      Some(SqlQ14)),

    // SQL surface, scan-only predicate pushdown (TPC-H Q6 shape).
    QuerySpec("q_sql_q6",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ6)
      },
      Some(SqlQ6)),

    // SQL surface, disjunctive cross-side predicates (TPC-H Q19 shape).
    QuerySpec("q_sql_q19",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ19)
      },
      Some(SqlQ19)),

    // SQL surface, correlated MIN subquery over a JOIN (TPC-H Q2 shape,
    // lineitem standing in for partsupp) — the deepest decorrelation
    // after Q21; bit-exact stored-double equality.
    QuerySpec("q_sql_q2",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ2)
      },
      Some(SqlQ2)),

    // SQL surface, CASE-split conditional counts over a date-sliced
    // fact⋈fact join (TPC-H Q12 shape, l_linestatus for l_shipmode).
    QuerySpec("q_sql_q12",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ12)
      },
      Some(SqlQ12)),

    // SQL surface, aggregate-of-aggregate over a filtered LEFT join
    // (TPC-H Q13 shape) — zero-order customers must survive to the
    // histogram.
    QuerySpec("q_sql_q13",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ13)
      },
      Some(SqlQ13)),

    // SQL surface, CTE referenced twice + scalar max subquery (Q15 shape).
    QuerySpec("q_sql_q15",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ15)
      },
      Some(SqlQ15)),

    // SQL surface, COUNT(DISTINCT) + NOT IN anti join (TPC-H Q16 shape,
    // lineitem standing in for the absent partsupp).
    QuerySpec("q_sql_q16",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ16)
      },
      Some(SqlQ16)),

    // SQL surface, EXISTS + correlated NOT EXISTS on the same fact with
    // non-equi correlation (TPC-H Q21 shape) — the hardest decorrelation.
    QuerySpec("q_sql_q21",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ21)
      },
      Some(SqlQ21)),

    // SQL surface, single-row aggregate threshold + NOT EXISTS dormancy
    // (TPC-H Q22 shape), integer-exact threshold compare.
    QuerySpec("q_sql_q22",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ22)
      },
      Some(SqlQ22)),

    // SQL surface, eight-relation join graph with nation in two roles
    // (TPC-H Q8 shape); share kept as exact numerator/denominator sums.
    QuerySpec("q_sql_q8",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ8)
      },
      Some(SqlQ8)),

    // SQL surface, LIKE-filtered profit rollup with signed integer sums
    // (TPC-H Q9 shape, p_retailprice for the absent supply cost).
    QuerySpec("q_sql_q9",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ9)
      },
      Some(SqlQ9)),

    // SQL surface, GROUP-HAVING vs a global scalar over the same
    // restricted join (TPC-H Q11 shape, scale-free integer threshold).
    QuerySpec("q_sql_q11",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ11)
      },
      Some(SqlQ11)),

    // SQL surface, nested IN + correlated half-of-sum threshold
    // (TPC-H Q20 shape) — completes the expressible suite at 21 of 22.
    QuerySpec("q_sql_q20",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlQ20)
      },
      Some(SqlQ20)),

    // ── §2.9 R7: tumbling window, batch analog ─────────────────────────
    QuerySpec("q_tumbling_window",
      (s, d) => Windows.tumbling(Fixture(s, d).events, "ts", "1 hour",
          Seq(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_v")))
        .orderBy("window_start"),
      Some("SELECT date_trunc('hour', ts) AS window_start, count(*) AS cnt, " +
        "round(sum(value), 2) AS sum_v FROM events GROUP BY 1 ORDER BY 1")),

    // W-extensions: distribution window functions (ntile / percent_rank /
    // first-last value) — one sorted window per key, the same single
    // shuffle as q_window_rank at any scale.
    QuerySpec("q_window_misc",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
        val wAll = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
        Fixture(s, d).events
          .select(col("event_id"), col("event_type"), col("value"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            first_value(col("event_id")).over(w).as("first_id"),
            last_value(col("event_id")).over(wAll).as("last_id"))
          .orderBy("event_id")
      },
      Some(
        """SELECT event_id, event_type, value,
          |  ntile(4) OVER w AS quartile,
          |  percent_rank() OVER w AS pct_rank,
          |  first_value(event_id) OVER w AS first_id,
          |  last_value(event_id) OVER (PARTITION BY event_type ORDER BY value, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id
          |FROM events
          |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
          |ORDER BY event_id""".stripMargin)),

    // A7-extension: explicit GROUPING SETS through the SQL surface (finer
    // than rollup/cube — exactly the listed aggregation levels, one pass).
    QuerySpec("q_grouping_sets",
      (s, d) => {
        graft.Graft.registerViews(s, d)
        s.sql(SqlGroupingSets)
      },
      Some(SqlGroupingSets),
      ),

    // Time-series gap-fill: dense per-minute grid from `sequence`/explode,
    // zero-filled counts, forward-filled last observation (IGNORE NULLS
    // running window). Grid build is two scalar aggregates + a broadcast
    // cross join; the fill window shuffles once on the series key.
    QuerySpec("q_gapfill",
      (s, d) => {
        val e = Fixture(s, d).events
        val byMin = e.groupBy(col("event_type"),
            date_trunc("minute", col("ts")).as("m"))
          .agg(count(lit(1)).as("cnt"), max(col("value")).as("mx"))
        val bounds = e.agg(
          date_trunc("minute", min(col("ts"))).as("lo"),
          date_trunc("minute", max(col("ts"))).as("hi"))
        val minutes = bounds.select(
          explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("m"))
        val grid = e.select(col("event_type")).distinct().crossJoin(minutes)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("m"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        grid.join(byMin, Seq("event_type", "m"), "left")
          .select(col("event_type"), col("m"),
            coalesce(col("cnt"), lit(0L)).as("cnt"),
            last(col("mx"), ignoreNulls = true).over(w).as("mx_ffill"))
          .orderBy("event_type", "m")
      },
      Some(
        """WITH b AS (SELECT date_trunc('minute', min(ts)) AS lo,
          |    date_trunc('minute', max(ts)) AS hi FROM events),
          |mins AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS m FROM b),
          |ets AS (SELECT DISTINCT event_type FROM events),
          |grid AS (SELECT event_type, m FROM ets CROSS JOIN mins),
          |agg AS (SELECT event_type, date_trunc('minute', ts) AS m,
          |    count(*) AS cnt, max(value) AS mx FROM events GROUP BY 1, 2)
          |SELECT g.event_type, g.m, coalesce(a.cnt, 0) AS cnt,
          |  last_value(a.mx IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.m
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_ffill
          |FROM grid g LEFT JOIN agg a USING (event_type, m)
          |ORDER BY g.event_type, g.m""".stripMargin)),

    // Time-RANGE sliding window (Windows.timeRangeAgg): trailing-1-hour
    // aggregates per event_type — the RangeFrame shape (bound by
    // order-by VALUE) that no other declared window exercises. Outputs
    // are order-independent exact (count / Σfloor / max), so RANGE-peer
    // ties can't hash-diverge.
    QuerySpec("q_window_range",
      (s, d) => Windows.timeRangeAgg(Fixture(s, d).events,
          "event_type", "ts", "value", rangeSeconds = 3600L)
        .select(col("event_id"), col("event_type"), col("cnt_w"),
          col("sumfloor_w"), col("max_w"))
        .orderBy("event_id"),
      Some(
        """SELECT event_id, event_type,
          |  CAST(count(*) OVER w AS BIGINT) AS cnt_w,
          |  CAST(sum(CAST(floor(value) AS BIGINT)) OVER w AS BIGINT) AS sumfloor_w,
          |  max(value) OVER w AS max_w
          |FROM events
          |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
          |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)),

    // Ordered conversion funnel (EventAnalytics.funnel): strictly-
    // increasing-ts view→click→purchase chains over high-value events
    // (value ≥ 80 keeps ~1.3 qualifying events per type per user, so the
    // stage counts actually discriminate — unfiltered, every user
    // converts and the oracle row is degenerate). The Spark side is the
    // sorted `aggregate` fold; the oracle expresses the SAME semantics as
    // the greedy min-chain (m_k = earliest stage-k event strictly after
    // m_{k-1} — equivalent to the fold by the exchange argument: taking
    // the earliest completion of stage i only helps stage i+1). The
    // oracle deliberately avoids DuckDB `list_reduce`: measured
    // NONDETERMINISTIC under parallel execution in v1.0.0 (same stable
    // sorted input, different fold results run-to-run).
    QuerySpec("q_event_funnel",
      (s, d) => EventAnalytics.funnel(
        Fixture(s, d).events.filter(col("value") >= 80),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some(
        s"""WITH $FunnelMinChainCtes,
          |f AS (SELECT unnest([1,2,3]) AS step, unnest(['view','click','purchase']) AS step_name),
          |n AS (SELECT f.step, f.step_name,
          |  (SELECT CAST(count(*) AS BIGINT) FROM r WHERE reached >= f.step) AS n_users FROM f)
          |SELECT CAST(step AS BIGINT) AS step, step_name, n_users,
          |  (100 * n_users) // greatest((SELECT n_users FROM n WHERE step = 1), 1) AS pct_of_first_x100
          |FROM n ORDER BY step""".stripMargin)),

    // Funnel time-to-convert (EventAnalytics.funnelTimes): the same
    // greedy chain as q_event_funnel, with per-stage advance timestamps
    // carried through the fold → median/p95 stage-to-stage latency (µs)
    // per step. Oracle = the same min-chain CTEs (m_k already ARE the
    // fold's advance timestamps — the exchange argument extends from
    // existence to times), latencies as m_k − m_{k−1} joins, percentiles
    // as quantile_cont ≡ Spark's exact `percentile`, FLOORED to BIGINT so
    // the hash never rides on float rounding.
    QuerySpec("q_funnel_time",
      (s, d) => EventAnalytics.funnelTimes(
        Fixture(s, d).events.filter(col("value") >= 80),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some(
        s"""WITH $FunnelMinChainCtes,
          |l AS (SELECT CAST(2 AS BIGINT) AS step, m2.t2 - m1.t1 AS lat
          |    FROM m2 JOIN m1 USING (user_id)
          |  UNION ALL SELECT CAST(3 AS BIGINT), m3.t3 - m2.t2
          |    FROM m3 JOIN m2 USING (user_id)),
          |ls AS (SELECT step,
          |  CAST(floor(quantile_cont(lat, 0.5)) AS BIGINT) AS p50_lat_us,
          |  CAST(floor(quantile_cont(lat, 0.95)) AS BIGINT) AS p95_lat_us
          |  FROM l GROUP BY step),
          |f AS (SELECT unnest([1,2,3]) AS step, unnest(['view','click','purchase']) AS step_name),
          |n AS (SELECT CAST(f.step AS BIGINT) AS step, f.step_name,
          |  (SELECT CAST(count(*) AS BIGINT) FROM r WHERE reached >= f.step) AS n_users FROM f)
          |SELECT n.step, n.step_name, n.n_users, ls.p50_lat_us, ls.p95_lat_us
          |FROM n LEFT JOIN ls USING (step) ORDER BY n.step""".stripMargin)),

    // Cohort retention matrix (EventAnalytics.cohortRetention): cohort =
    // first active day per user, offset = days since, distinct active
    // users per cell. Two user-keyed hash aggregates + one user-keyed
    // join — no windows, AQE coalesces the co-keyed exchanges.
    QuerySpec("q_cohort_retention",
      (s, d) => EventAnalytics.cohortRetention(Fixture(s, d).events, "user_id", "ts"),
      Some(
        """WITH fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
          |  FROM events GROUP BY user_id),
          |ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
          |SELECT cohort_day, CAST(datediff('day', cohort_day, day) AS BIGINT) AS offset_days,
          |  CAST(count(*) AS BIGINT) AS n_users
          |FROM ad JOIN fd USING (user_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Top-k event paths (EventAnalytics.eventPaths): most common 3-step
    // consecutive event-type sequences, lead-chain n-grams — no per-user
    // list materialization. Path strings use '>' separators.
    QuerySpec("q_event_paths",
      (s, d) => EventAnalytics.eventPaths(
        Fixture(s, d).events, "user_id", "ts", "event_id", "event_type",
        n = 3, k = 10),
      Some(
        """WITH p AS (SELECT event_type || '>' || lead(event_type, 1) OVER w
          |    || '>' || lead(event_type, 2) OVER w AS path
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT path, CAST(count(*) AS BIGINT) AS n_occ FROM p WHERE path IS NOT NULL
          |GROUP BY path ORDER BY n_occ DESC, path LIMIT 10""".stripMargin)),

    // Session-scoped funnel (EventAnalytics.sessionFunnel): the ordered
    // chain must complete INSIDE one activity session (6 h gap rule over
    // ALL events — sessions are an activity property, so the gap sees
    // every event type; only the chain fold is type-pruned). At this gap
    // the fixture yields 1717/240/27 qualifying sessions — discriminative
    // at every step. Oracle = the same sessionization CTE as
    // q_session_agg + the greedy min-chain CTEs (see q_event_funnel on
    // why not list_reduce).
    QuerySpec("q_session_funnel",
      (s, d) => EventAnalytics.sessionFunnel(
        Fixture(s, d).events, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"), gapSeconds = 21600L),
      Some(
        """WITH g AS (SELECT user_id, ts, event_id, event_type,
          |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) IS NULL
          |  OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 21600000000 THEN 1 ELSE 0 END AS new_sess
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sess AS (SELECT user_id, ts, event_type, CAST(sum(new_sess) OVER
          |  (PARTITION BY user_id ORDER BY ts, event_id
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM g),
          |e AS (SELECT user_id, session_id, epoch_us(ts) AS ts,
          |  CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
          |    WHEN 'purchase' THEN 3 END AS BIGINT) AS st
          |  FROM sess WHERE event_type IN ('view','click','purchase')),
          |m1 AS (SELECT user_id, session_id, min(ts) AS t1 FROM e WHERE st = 1 GROUP BY 1, 2),
          |m2 AS (SELECT e.user_id, e.session_id, min(e.ts) AS t2 FROM e
          |  JOIN m1 USING (user_id, session_id) WHERE e.st = 2 AND e.ts > m1.t1 GROUP BY 1, 2),
          |m3 AS (SELECT e.user_id, e.session_id, min(e.ts) AS t3 FROM e
          |  JOIN m2 USING (user_id, session_id) WHERE e.st = 3 AND e.ts > m2.t2 GROUP BY 1, 2),
          |r AS (SELECT s.user_id, s.session_id,
          |  CASE WHEN m3.t3 IS NOT NULL THEN 3 WHEN m2.t2 IS NOT NULL THEN 2
          |       WHEN m1.t1 IS NOT NULL THEN 1 ELSE 0 END AS reached
          |  FROM (SELECT DISTINCT user_id, session_id FROM e) s
          |  LEFT JOIN m1 USING (user_id, session_id)
          |  LEFT JOIN m2 USING (user_id, session_id)
          |  LEFT JOIN m3 USING (user_id, session_id)),
          |f AS (SELECT unnest([1,2,3]) AS step, unnest(['view','click','purchase']) AS step_name)
          |SELECT CAST(f.step AS BIGINT) AS step, f.step_name,
          |  (SELECT CAST(count(*) AS BIGINT) FROM r WHERE reached >= f.step) AS n_sessions,
          |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM r WHERE reached >= f.step) AS n_users
          |FROM f ORDER BY f.step""".stripMargin))
  )

  /** GROUPING SETS declaration shared verbatim by both engines (the SQL
    * text IS the oracle text, like [[SqlQ3]]); NULL group keys are
    * coalesced to 'ALL' markers instead of `grouping_id()` (whose bit
    * numbering is engine-specific).
    */
  // lazy: declared below `specs`, which captures it at construction time
  private lazy val SqlGroupingSets: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS user_bucket,
      |  count(*) AS cnt
      |FROM events
      |GROUP BY GROUPING SETS ((event_type, user_id % 10), (event_type), ())
      |ORDER BY event_type, user_bucket""".stripMargin
}
