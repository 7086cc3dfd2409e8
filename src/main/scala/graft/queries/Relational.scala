package graft.queries

import graft.Tables
import graft.functions.Exact._
import graft.ops.GoldModel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operator coverage (SURVEY.md §2.1–§2.8) on the
  * TPC-H-ish corpus. Each query is the Spark-first expression of a
  * reference operator family; the oracle string is the same semantics
  * in DuckDB SQL. All float aggregation goes through graft.functions
  * .Exact so results are bit-identical at any parallelism.
  */
object Relational {
  private val Dec = DecimalType(18, 2)

  val all: Map[String, Q] = Map(

    // A2/A4-style multi-aggregate full-table pass (pricing summary) —
    // partial+final hash agg, the canonical Catalyst plan.
    "a2_pricing_summary" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(col("l_extendedprice").cast(Dec) * (lit(1) - col("l_discount").cast(Dec)))
              .cast("double").as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Salted equi-join (ops/Skew.saltedJoin): the hot-KEY mitigation —
    // the join key becomes (key, salt) with the dimension replicated
    // per salt bucket, spreading one pathological key over 8
    // independent partitions where AQE's partition-splitting would
    // still re-probe and re-converge it. The oracle is the DIRECT
    // join + rollup: salting must be row-invisible.
    "j15_salted_join" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
        graft.ops.Skew
          .saltedJoin(li, p, "l_partkey", "p_partkey",
            discriminator = col("l_orderkey"), buckets = 8)
          .groupBy(col("p_type"))
          .agg(
            dsum(col("l_extendedprice")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_type"))
      },
      """SELECT p_type,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin),

    // J1/J3 star join: fact ⋈ mid dims ⋈ broadcast dims, grouped rollup.
    // nation/region are explicitly broadcast (tiny); customer/orders
    // joins shuffle on their keys and AQE handles the rest.
    "j1_star_join_revenue" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        // two-level aggregation: revenue is first collapsed to one row
        // per order BELOW the join, so (a) the join probe side shrinks
        // ~4× and (b) COUNT(DISTINCT o_orderkey) degenerates to a plain
        // COUNT(*) — no expand/distinct shuffle round. Decimal sums are
        // associative, so the split is value-identical to the direct
        // GROUP BY (the oracle keeps the direct form).
        val perOrder = li
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast(Dec) * (lit(1) - col("l_discount").cast(Dec)))
            .as("order_rev"))
        perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"),
            year(col("o_orderdate")).as("order_year"))
          .agg(
            sum(col("order_rev")).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"), col("n_name"), col("order_year"))
      },
      """SELECT r_name, n_name,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name, order_year
        |ORDER BY r_name, n_name, order_year""".stripMargin),

    // S4 + A1: distinct-source discovery ordered by first appearance
    // (populate_sources_dag.py:41-45).
    "s4_source_discovery" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(min(col("event_id")).as("first_id"),
            count(lit(1)).as("n_events"))
          .orderBy(col("first_id")),
      """SELECT event_type, MIN(event_id) AS first_id, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY first_id""".stripMargin),

    // A4 stats block: one-pass multi-aggregate incl. conditional counts,
    // 4× exact COUNT(DISTINCT) and moment-exact sample stddev
    // (fact_gold_price.py:394-413).
    "a4_stats_block" -> Q(
      (s, dir) => {
        val f = GoldModel.fact(Tables.events(s, dir))
        f.agg(
            count(lit(1)).as("total_count"),
            count(when(col("side_id").isNull, 1)).as("null_side_count"),
            countDistinct(col("source_id")).as("unique_sources"),
            countDistinct(col("side_id")).as("unique_sides"),
            countDistinct(col("date_id")).as("unique_dates"),
            countDistinct(col("time_id")).as("unique_times"),
            min(col("price")).as("min_price"),
            max(col("price")).as("max_price"),
            davg(col("price")).as("avg_price"),
            dsum(col("price")).as("_sx"),
            dsumsq(col("price")).as("_sx2"))
          .withColumn("stddev_price",
            stddevSampExact(col("_sx"), col("_sx2"), col("total_count")))
          .drop("_sx", "_sx2")
      },
      s"""WITH $FactCte
        |SELECT total_count, null_side_count, unique_sources, unique_sides,
        |  unique_dates, unique_times, min_price, max_price, avg_price,
        |  CASE WHEN total_count > 1
        |       THEN sqrt((_sx2 - _sx * _sx / total_count) / (total_count - 1)) END AS stddev_price
        |FROM (
        |  SELECT COUNT(*) AS total_count,
        |    COUNT(CASE WHEN side_id IS NULL THEN 1 END) AS null_side_count,
        |    COUNT(DISTINCT source_id) AS unique_sources,
        |    COUNT(DISTINCT side_id) AS unique_sides,
        |    COUNT(DISTINCT date_id) AS unique_dates,
        |    COUNT(DISTINCT time_id) AS unique_times,
        |    MIN(price) AS min_price,
        |    MAX(price) AS max_price,
        |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(price) AS avg_price,
        |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS _sx,
        |    CAST(SUM(CAST(price AS DECIMAL(18,2)) * CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS _sx2
        |  FROM fact
        |) t""".stripMargin),

    // O4 top-1: ORDER BY … LIMIT 1 — Catalyst plans TakeOrderedAndProject
    // (no full sort), the distributed top-k.
    "o4_top1" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .orderBy(col("value").desc, col("event_id").asc)
          .limit(1),
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 1""".stripMargin),

    // Keyset (seek-method) pagination — the page-N read that SURVIVES
    // scale where OFFSET cannot: OFFSET k·n must produce and discard k
    // pages before returning one, so deep pages cost O(page·depth);
    // the seek predicate ((k1, k2) past the previous page's last key)
    // prunes everything before the cursor AT THE SCAN — the disjunction
    // reaches parquet as or(gt(l_orderkey,…), and(eq, gt)) in
    // PushedFilters, row groups below the cursor never decompress —
    // and the page itself is a TakeOrderedAndProject heap. The cursor
    // is a literal (a real pager passes the previous page's last key);
    // (l_orderkey, l_linenumber) is a unique composite, so pages are
    // gap-free and overlap-free at any parallelism.
    "o7_keyset_page" -> Q(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_orderkey") > 100 ||
            (col("l_orderkey") === 100 && col("l_linenumber") > 3))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_orderkey > 100 OR (l_orderkey = 100 AND l_linenumber > 3)
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin),

    // J7 scalar-subquery predicate (fact_gold_price.py:408-412) —
    // exercised through genuine SQL text so Catalyst plans the subquery.
    "j7_scalar_subquery" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
            |ORDER BY o_orderkey""".stripMargin)
      },
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
        |ORDER BY o_orderkey""".stripMargin),

    // Correlated subquery surface beyond J7's scalar form: EXISTS
    // (→ left-semi hash join), NOT EXISTS (→ left-anti), and an
    // uncorrelated IN over a dimension filter — all through genuine SQL
    // text so Catalyst's subquery decorrelation does the planning. The
    // fact-side orders scans stay on the join's build/probe path; no
    // per-row subquery execution survives optimization.
    "j12_exists_semi" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        Tables.customer(s, dir).createOrReplaceTempView("customer")
        Tables.nation(s, dir).createOrReplaceTempView("nation")
        s.sql(
          """SELECT c_custkey, c_name, c_acctbal FROM customer c
            |WHERE EXISTS (SELECT 1 FROM orders o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
            |  AND NOT EXISTS (SELECT 1 FROM orders o
            |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 20000)
            |  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
            |ORDER BY c_custkey""".stripMargin)
      },
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 20000)
        |  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
        |ORDER BY c_custkey""".stripMargin),

    // NOT IN — the null-aware anti join, a genuinely different operator
    // from j12's NOT EXISTS: one NULL in the subquery result makes NOT
    // IN reject EVERY row (three-valued logic), so the join must track
    // build-side nulls. Catalyst plans the single-column case as a
    // null-aware BroadcastHashJoin (LeftAnti, isNullAware) rather than
    // the quadratic nested-loop fallback the general form needs.
    "j13_not_in" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        Tables.customer(s, dir).createOrReplaceTempView("customer")
        s.sql(
          """SELECT c_custkey, c_name, c_acctbal FROM customer
            |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
            |                        WHERE o_totalprice > 450000)
            |ORDER BY c_custkey""".stripMargin)
      },
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin),

    // S5/S8 generalized — CDC apply, the full MERGE INTO action set
    // (insert + update + delete) in one keyed pass (ops/Merge.applyCdc):
    // a deterministic change log derived from orders (updates on %5,
    // deletes on %7, a higher-seq update on %20 overriding both, inserts
    // in the disjoint negative keyspace on %11) collapses to
    // latest-per-key and reconciles with the target in one full-outer
    // join. Arithmetic stays double-exact (+100, +500, /2), so values
    // hash-match the oracle's spelling.
    "s17_cdc_apply" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        // all four change branches generated in ONE scan pass: a
        // 4-way self-union re-reads (and, with the widened loader,
        // re-shuffles) the table once per branch because each branch's
        // filter pushes below the shared exchange and splits it — the
        // array+explode form is branch-count-invariant at any scale
        def branch(cond: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column,
                   op: String, seq: Int, price: org.apache.spark.sql.Column) =
          when(cond, struct(k.as("o_orderkey"), lit(op).as("op"),
            lit(seq).as("seq"), col("o_custkey"),
            price.as("o_totalprice")))
        val changes = o.select(explode(filter(array(
            branch(col("o_orderkey") % 5 === 0, col("o_orderkey"), "U", 1,
              col("o_totalprice") + 100),
            branch(col("o_orderkey") % 7 === 3, col("o_orderkey"), "D", 2,
              col("o_totalprice")),
            branch(col("o_orderkey") % 20 === 0, col("o_orderkey"), "U", 3,
              col("o_totalprice") + 500),
            branch(col("o_orderkey") % 11 === 0, -col("o_orderkey"), "I", 1,
              col("o_totalprice") / 2)),
            c => c.isNotNull)).as("c"))
          .select(col("c.o_orderkey"), col("c.op"), col("c.seq"),
            col("c.o_custkey"), col("c.o_totalprice"))
        graft.ops.Merge.applyCdc(o, changes, "o_orderkey", "op", "seq")
          .orderBy(col("o_orderkey"))
      },
      """WITH target AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |changes AS (
        |  SELECT o_orderkey, 'U' AS op, 1 AS seq, o_custkey,
        |         o_totalprice + 100 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', 2, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 3
        |  UNION ALL
        |  SELECT o_orderkey, 'U', 3, o_custkey, o_totalprice + 500
        |  FROM orders WHERE o_orderkey % 20 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, 'I', 1, o_custkey, o_totalprice / 2
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |                                 ORDER BY seq DESC) AS rn
        |    FROM changes) WHERE rn = 1)
        |SELECT o_orderkey,
        |  CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE t.o_custkey END AS o_custkey,
        |  CASE WHEN c.op IS NOT NULL THEN c.o_totalprice ELSE t.o_totalprice END AS o_totalprice
        |FROM target t FULL OUTER JOIN latest c USING (o_orderkey)
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY o_orderkey""".stripMargin),

    // P12 id-exclusion: != on a nullable key silently drops NULLs —
    // reference quirk preserved (fact_gold_price_temp.py:252-254).
    "p12_id_exclusion" -> Q(
      (s, dir) =>
        GoldModel.fact(Tables.events(s, dir))
          .filter(col("side_id") =!= 1)
          .groupBy(col("side_id"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("side_id")),
      s"""WITH $FactCte
        |SELECT side_id, COUNT(*) AS n FROM fact
        |WHERE side_id != 1 GROUP BY side_id ORDER BY side_id""".stripMargin),

    // P10 lenient coercion: failed casts become NULL (pandas
    // to_numeric(errors='coerce'), fact_gold_price.py:85-99) = try_cast.
    "p10_lenient_cast" -> Q(
      (s, dir) =>
        // sort FIRST, project AFTER: a global sort samples and then
        // re-executes its child, so putting the try_cast projection
        // above the sort runs it once (and post-exchange, parallel)
        // instead of twice in the single-task scan stage
        Tables.events(s, dir)
          .orderBy(col("event_id"))
          .select(
            col("event_id"),
            expr("try_cast(replace(replace(props, '{\"k\": ', ''), '}', '') AS INT)").as("k_value"),
            expr("try_cast(event_type AS INT)").as("bad_cast")),
      """SELECT event_id,
        |  TRY_CAST(replace(replace(props, '{"k": ', ''), '}', '') AS INT) AS k_value,
        |  TRY_CAST(event_type AS INT) AS bad_cast
        |FROM events ORDER BY event_id""".stripMargin),

    // P11 sanity-range DQ gate (dim_date_etl_dag.py:117).
    "p11_sanity_range" -> Q(
      (s, dir) =>
        Tables.orders(s, dir)
          .agg(
            count(when(to_date(col("o_orderdate")) < lit("1900-01-01").cast("date") ||
              to_date(col("o_orderdate")) > lit("2100-12-31").cast("date"), 1))
              .as("out_of_range"),
            count(lit(1)).as("total_rows")),
      """SELECT COUNT(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1900-01-01'
        |                    OR CAST(o_orderdate AS DATE) > DATE '2100-12-31' THEN 1 END) AS out_of_range,
        |       COUNT(*) AS total_rows
        |FROM orders""".stripMargin),

    // S1+P1+P2+P3: the filtered hourly extract — projection with no-ELSE
    // CASE, Tehran key derivation, closed-hour BETWEEN predicate. The
    // window is a parameter (reproducibility, SURVEY §7.4); here a fixed
    // representative hour.
    "s1_hourly_extract" -> Q(
      (s, dir) => {
        val local = GoldModel.tehran(col("ts"))
        Tables.events(s, dir)
          .filter(local.between(
            lit("2024-01-15 00:00:00").cast("timestamp"),
            lit("2024-01-16 00:00:00").cast("timestamp")))
          .select(
            col("event_id").as("id"),
            col("user_id").cast("int").as("source_id"),
            GoldModel.sideId(col("event_type")).as("side_id"),
            col("value").as("price"),
            GoldModel.dateId(local).as("date_id"),
            GoldModel.timeId(local).as("time_id"))
          .orderBy(col("id"))
      },
      s"""WITH $FactCte, loc AS (
        |  SELECT event_id AS id,
        |         (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tehran' AS ts_local
        |  FROM events
        |)
        |SELECT f.id, f.source_id, f.side_id, f.price, f.date_id, f.time_id
        |FROM fact f JOIN loc USING (id)
        |WHERE loc.ts_local BETWEEN TIMESTAMP '2024-01-15 00:00:00'
        |                       AND TIMESTAMP '2024-01-16 00:00:00'
        |ORDER BY f.id""".stripMargin),

    // JSON extraction (beyond the reference's string-surgery parsing in
    // P10): path extraction both as raw string and schema-bound int —
    // get_json_object / from_json on the Spark side, Catalyst folds both
    // into one codegen'd pass over the scan.
    "f_json_extract" -> Q(
      (s, dir) =>
        // JSON parsing is the compute-dominant case the events loader
        // deliberately does NOT widen (the widening exchange would tax
        // every slim query with the props column) — so widen HERE,
        // after pruning to exactly the columns the parse needs
        Tables.parallelized(
            Tables.events(s, dir).select("event_id", "props"), "event_id")
          .select(
            col("event_id"),
            expr("get_json_object(props, '$.k')").as("k_str"),
            expr("from_json(props, 'k INT').k").as("k_int"))
          .orderBy(col("event_id")),
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin),

    // F1–F14 scalar-function surface in one projection: md5 color hash,
    // lpad/concat, date_trunc/date_format, datediff, extract, floor/mod.
    "f_scalar_kitchen" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id").cast("int").as("id"))
          .agg(min(col("ts")).as("first_ts"))
          .select(
            col("id"),
            concat(lit("src_"), col("id").cast("string")).as("name"),
            GoldModel.colorOf(concat(lit("src_"), col("id").cast("string"))).as("color"),
            lpad(col("id").cast("string"), 4, "0").as("padded_id"),
            date_format(date_trunc("hour", col("first_ts")), "yyyy-MM-dd HH:mm:ss").as("first_hour"),
            datediff(lit("2024-02-01").cast("date"), to_date(col("first_ts"))).as("day_lag"),
            year(col("first_ts")).as("y"),
            month(col("first_ts")).as("m"),
            weekofyear(col("first_ts")).as("w"),
            (col("id") % 7).as("id_mod7"),
            floor(col("id") / 4).as("id_div4"))
          .orderBy(col("id")),
      """SELECT id,
        |  'src_' || CAST(id AS VARCHAR) AS name,
        |  concat('#', substr(md5('src_' || CAST(id AS VARCHAR)), 1, 6)) AS color,
        |  lpad(CAST(id AS VARCHAR), 4, '0') AS padded_id,
        |  strftime(date_trunc('hour', first_ts), '%Y-%m-%d %H:%M:%S') AS first_hour,
        |  CAST(date_diff('day', CAST(first_ts AS DATE), DATE '2024-02-01') AS INT) AS day_lag,
        |  CAST(EXTRACT(YEAR FROM first_ts) AS INT) AS y,
        |  CAST(EXTRACT(MONTH FROM first_ts) AS INT) AS m,
        |  CAST(EXTRACT(WEEK FROM first_ts) AS INT) AS w,
        |  id % 7 AS id_mod7,
        |  CAST(FLOOR(CAST(id AS DOUBLE) / 4) AS BIGINT) AS id_div4
        |FROM (SELECT CAST(user_id AS INT) AS id, MIN(ts) AS first_ts
        |      FROM events GROUP BY 1)
        |ORDER BY id""".stripMargin)
  )
}
