package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational suite: every SQL-expressible operator family from
  * SURVEY.md §2 (scans, filters, joins incl. the interval join J5,
  * aggregations A1-A6, set ops, sorts, scalar functions §2.8) expressed
  * over the TESTDATA tables, each with a DuckDB oracle.
  *
  * Parity conventions (both sides, so the driver's hash compare agrees):
  *  - money sums rounded to 2 decimals (inputs have 2 decimals, so the
  *    true sum is on the 0.01 grid and rounding is ulp-safe);
  *  - averages rounded to 4 decimals;
  *  - durations = floor(second-truncated epoch diff / unit) — Spark
  *    `unix_timestamp` equals DuckDB `date_diff('second', …)` exactly;
  *  - every query ends in a total ORDER BY.
  */
object Core {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[(String, Q)] = Seq(

    // A1: plain row count (the reference's most common action —
    // reconciliation counts, auto_loader_steps.py:289,386).
    "q_count" -> Q(
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem")),

    // A3/A4/P7/F*: filtered group-agg (TPC-H Q1 shape). Filter is pushed
    // to the parquet scan; partial aggregation is map-side.
    "q_pricing_summary" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A6: DISTINCT (dedup-before-count, auto_loader_steps.py:289,303).
    "q_distinct" -> Q(
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // Skew mitigation (graft.plans.Skew): two-phase salted aggregation
    // — partial agg on (key, salt), final on key — value-checked
    // against the plain one-phase GROUP BY it must equal. l_returnflag
    // is a genuinely hot key (3 values over the whole table), the exact
    // shape salting exists for.
    "q_skew_salted_agg" -> Q(
      (s, dir) => graft.plans.Skew.saltedSum(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity", saltFactor = 16)
        .select(col("l_returnflag"),
          round(col("sum_l_quantity"), 2).as("sum_qty"), col("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Salted shuffle JOIN (graft.plans.Skew.saltedJoin): the explicit
    // hot-key tool for when one key dominates a fact table, broadcast
    // is impossible and even AQE's split shuffle blocks lose — the
    // fact side salts (key, salt-of-row), the dim side replicates
    // saltFactor ways, and the hot key's rows spread over saltFactor
    // reducers. Fixture funnels ~75% of events onto one customer key;
    // the oracle replays the PLAIN join + rollup, so the salted plan
    // must be result-identical (no duplicated, no lost rows).
    "q_skew_salted_join" -> Q(
      (s, dir) => {
        val fact = t(s, dir, "events").select(
          when(col("user_id") % 4 =!= 0, lit(7L))
            .otherwise(col("user_id")).as("k"),
          col("value"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        graft.plans.Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("seg"))
      },
      Some("""SELECT c.c_mktsegment AS seg, count(*) AS n,
             |  round(sum(e.value), 2) AS sum_value
             |FROM (SELECT CASE WHEN user_id % 4 <> 0 THEN 7
             |               ELSE user_id END AS k, value
             |      FROM events) e
             |JOIN customer c ON c.c_custkey = e.k
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A2: scalar MAX subquery (insert_config.py:97 `(SELECT MAX(ColumnOrder) …)`).
    "q_scalar_subquery" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val mx = li.agg(max(col("l_quantity")).as("mx"))
        li.join(broadcast(mx), col("l_quantity") === col("mx"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity = (SELECT max(l_quantity) FROM lineitem)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // J1-chain: fact ⋈ three dim tables, all dims broadcast (the
    // create_workflow_jobs.py:108-116 config join at TPC-H shape).
    "q_join_dims" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // J2: LEFT JOIN + coalesce over the null side (Run jobs.py:110-114 shape).
    "q_left_join" -> Q(
      (s, dir) => {
        val nat = t(s, dir, "nation")
        val cust = t(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"),
               round(sum(col("c_acctbal")), 2).as("sum_bal"))
        nat.join(cust, col("n_nationkey") === col("c_nationkey"), "left")
          .select(col("n_nationkey"), col("n_name"),
                  coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                  coalesce(col("sum_bal"), lit(0.0)).as("sum_bal"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name,
             |  coalesce(n_cust, 0) AS n_cust, coalesce(sum_bal, 0.0) AS sum_bal
             |FROM nation LEFT JOIN (
             |  SELECT c_nationkey, count(*) AS n_cust,
             |         round(sum(c_acctbal), 2) AS sum_bal
             |  FROM customer GROUP BY c_nationkey) c
             |ON n_nationkey = c_nationkey
             |ORDER BY n_nationkey""".stripMargin)),

    // J5: interval join — equi key (user_id) + BETWEEN range residual
    // (Autoloader_daily_log_report.sql:129-138). The equi key keeps this a
    // hash/sort-merge join with a residual filter — never a cartesian.
    "q_interval_join" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val win = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id").as("w_user"))
          .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        ev.filter(col("event_type") === "purchase")
          .join(win, col("user_id") === col("w_user") &&
                     col("ts").between(col("start_ts"), col("end_ts")))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_in_window"),
               round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT e.user_id, count(*) AS n_in_window,
             |  round(sum(e.value), 2) AS sum_value
             |FROM events e
             |JOIN (SELECT user_id AS w_user, min(ts) AS start_ts, max(ts) AS end_ts
             |      FROM events WHERE event_type = 'view' GROUP BY user_id) w
             |ON e.user_id = w.w_user AND e.ts BETWEEN w.start_ts AND w.end_ts
             |WHERE e.event_type = 'purchase'
             |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin)),

    // Beyond-parity J-family: backward as-of join (graft.plans.AsofJoin)
    // — each purchase picks up the most recent prior view by the same
    // user. One shuffle, no row expansion; oracled by DuckDB's native
    // ASOF LEFT JOIN.
    "q_asof_join" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        // unique (key, ts) on the right side so the as-of winner is
        // well-defined (AsofJoin contract)
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("view_value"))
          .withColumnRenamed("ts", "view_ts")
        graft.plans.AsofJoin.backward(purchases, views, "user_id", "ts", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, p.ts, p.value, v.view_ts, v.view_value
             |FROM (SELECT event_id, user_id, ts, value FROM events
             |      WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT user_id, ts AS view_ts, max(value) AS view_value
             |                FROM events WHERE event_type = 'view'
             |                GROUP BY user_id, ts) v
             |ON p.user_id = v.user_id AND p.ts >= v.view_ts
             |ORDER BY p.event_id""".stripMargin)),

    // FORWARD as-of: each view picks up the NEXT purchase by the same
    // user at-or-after its timestamp (conversion attribution looking
    // ahead) — the mirrored direction of q_asof_join, same one-shuffle
    // union+window plan. DuckDB's ASOF accepts the <= inequality, so
    // the oracle stays the native form.
    "q_asof_forward" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
          .withColumnRenamed("ts", "purchase_ts")
        graft.plans.AsofJoin.forward(views, purchases, "user_id", "ts", "purchase_ts")
          .orderBy(col("event_id"))
      },
      Some("""SELECT v.event_id, v.user_id, v.ts, v.value,
             |  p.purchase_ts, p.purchase_value
             |FROM (SELECT event_id, user_id, ts, value FROM events
             |      WHERE event_type = 'view') v
             |ASOF LEFT JOIN (SELECT user_id, ts AS purchase_ts,
             |                  max(value) AS purchase_value
             |                FROM events WHERE event_type = 'purchase'
             |                GROUP BY user_id, ts) p
             |ON v.user_id = p.user_id AND v.ts <= p.purchase_ts
             |ORDER BY v.event_id""".stripMargin)),

    // Analytic window functions: row numbering, lag/lead, running sum,
    // ntile — the per-key sequence features a training pipeline derives
    // from event history. One shuffle (partition by user), sorted once,
    // all five functions share the frame.
    "q_window_funcs" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          row_number().over(w).as("rn"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          // unique total sort (ts, event_id) fixes the accumulation order,
          // so the double running sum is bit-identical to DuckDB's
          round(sum(col("value")).over(run), 2).as("running_value"),
          ntile(4).over(w).as("quartile"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, event_type,
             |  CAST(row_number() OVER w AS INT) AS rn,
             |  lag(value, 1) OVER w AS prev_value,
             |  lead(event_type, 1) OVER w AS next_type,
             |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
             |  CAST(ntile(4) OVER w AS INT) AS quartile
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // Array function family: collect_set → sort_array → array_join.
    // The output is the JOINED STRING, not the array — the driver's
    // checker hashes scalars only (the q_job_specs lesson), and the
    // sort inside the array makes the collect order-insensitive.
    "q_array_funcs" -> Q(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
            .as("priorities"),
          size(collect_set(col("o_orderpriority"))).as("n_priorities"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             |    AS priorities,
             |  CAST(len(list_distinct(list(o_orderpriority))) AS INT)
             |    AS n_priorities
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // JSON extraction from the events.props payload column
    // (get_json_object path syntax ≍ DuckDB json_extract) — parse,
    // cast, aggregate by the extracted field.
    "q_json_funcs" -> Q(
      (s, dir) => t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
             |  count(*) AS n
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)),

    // Fixed-width histogram: floor(x / width) bucketing — integral
    // boundary values divide exactly in both engines, so the bucket
    // edges are deterministic.
    "q_histogram" -> Q(
      (s, dir) => t(s, dir, "orders")
        .select(floor(col("o_totalprice") / 50000).cast("int").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
      Some("""SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Full-outer join with a coalesced using-key: unmatched rows
    // survive on BOTH sides (customers under 500 without qualifying
    // orders; order custkeys at or above 500).
    "q_full_outer" -> Q(
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_custkey") < 500)
          .select(col("c_custkey").as("custkey"), col("c_name"))
        val ords = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("sum_price"))
          .withColumnRenamed("o_custkey", "custkey")
        cust.join(ords, Seq("custkey"), "full_outer")
          .orderBy(col("custkey"))
      },
      Some("""SELECT coalesce(c.custkey, o.custkey) AS custkey,
             |  c.c_name, o.n_orders, o.sum_price
             |FROM (SELECT c_custkey AS custkey, c_name FROM customer
             |      WHERE c_custkey < 500) c
             |FULL OUTER JOIN
             |     (SELECT o_custkey AS custkey,
             |        CAST(count(*) AS BIGINT) AS n_orders,
             |        round(sum(o_totalprice), 2) AS sum_price
             |      FROM orders GROUP BY 1) o
             |ON c.custkey = o.custkey
             |ORDER BY custkey""".stripMargin)),

    // Native relational pivot: one pass, explicit value list (required
    // at scale — an unlisted-values pivot needs an extra distinct scan
    // to discover columns), absent cells zero-filled.
    "q_pivot" -> Q(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // Rank-family semantics under REAL ties: the 5-value priority
    // within each status gives dense_rank gaps-free numbering,
    // percent_rank/cume_dist as exact integer ratios (bit-identical
    // across engines — no rounding needed).
    "q_rank_family" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_orderpriority"))
        t(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          dense_rank().over(w).cast("int").as("drk"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority,
             |  CAST(dense_rank() OVER w AS INT) AS drk,
             |  percent_rank() OVER w AS prk,
             |  cume_dist() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
             |ORDER BY o_orderkey""".stripMargin)),

    // Batch sessionization (graft.plans.Sessionize): gap-islands over
    // per-user event history — lag flags gap starts, a running sum
    // numbers the islands, a group-agg summarizes each session. One
    // shuffle: the agg clusters on (user, session), a superset of the
    // window's user partitioning. 12h gap ≈ p70 of the per-user
    // inter-event spacing, so sessions genuinely merge AND split.
    "q_sessionize" -> Q(
      (s, dir) => graft.plans.Sessionize.batch(
        t(s, dir, "events"), "user_id", "ts", "event_id", "value",
        gapSeconds = 12 * 3600)
        // parity rounding is a query-layer concern (header note above);
        // the operator itself returns exact sums
        .withColumn("total_value", round(col("total_value"), 2))
        .orderBy(col("user_id"), col("session_id")),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000
             |         THEN 1 ELSE 0 END AS ns
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |numbered AS (
             |  SELECT user_id, ts, value,
             |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
             |      AS session_id
             |  FROM g)
             |SELECT user_id, session_id,
             |  min(ts) AS session_start, max(ts) AS session_end,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM numbered GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Behavioral SEQUENCE-corpus construction — the step that turns an
    // event log into per-session training sequences (the SFT/next-
    // action dataset shape): every (user, session) from the 12 h
    // gap-islands labeling (Sessionize.labeled — SAME numbering as
    // q_sessionize, shared code) re-emits as its ordered event-type
    // string, fingerprinted so the oracle pins the exact BYTES of
    // every sequence, plus first/last type from one sorted re-collect
    // (the q_token_ids ordered-re-collect stance: the only per-group
    // structure is bounded by session length). One shuffle on the
    // user key; at 100 TB this is the same sequence pass every
    // sessionization pays.
    "q_session_sequences" -> Q(
      (s, dir) => {
        val lab = graft.plans.Sessionize.labeled(t(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 12 * 3600)
        lab.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))).as("a"))
          .select(col("user_id"), col("session_id"), col("n_events"),
            md5(array_join(transform(col("a"),
              x => x.getField("event_type")), ">")).as("seq_fp"),
            element_at(col("a"), 1).getField("event_type").as("first_type"),
            element_at(col("a"), -1).getField("event_type").as("last_type"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000
             |         THEN 1 ELSE 0 END AS ns
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |numbered AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
             |      AS session_id
             |  FROM g)
             |SELECT user_id, session_id,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  md5(array_to_string(
             |    list(event_type ORDER BY ts, event_id), '>')) AS seq_fp,
             |  first(event_type ORDER BY ts, event_id) AS first_type,
             |  last(event_type ORDER BY ts, event_id) AS last_type
             |FROM numbered GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Native session windows (session_window): the built-in twin of
    // plans/Sessionize — one shuffle, merge-on-overlap state handled by
    // the engine, and the same aggregation runs unchanged on a stream.
    // Session end = last event + gap (Spark's half-open contract); a
    // new session starts when the inter-event gap is >= the timeout.
    "q_session_window" -> Q(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          col("sw.start").as("session_start"),
          col("sw.end").as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH g AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 21600000000
             |         THEN 1 ELSE 0 END AS ns
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |numbered AS (
             |  SELECT user_id, ts, value,
             |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 6 HOUR AS session_end,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM numbered GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // Time-series gap fill (graft.plans.Resample): hourly per-type
    // grid densified from each group's own span, zero-filled counts +
    // LOCF value — the dense axis is generated distributed
    // (sequence+explode), never a driver loop.
    "q_gapfill" -> Q(
      (s, dir) => graft.plans.Resample.gapFill(
        t(s, dir, "events"), "event_type", "ts", "value", unit = "hour")
        // query-layer parity rounding; LOCF picks elements, so
        // round∘locf = locf∘round and the oracle's order is equivalent
        .withColumn("bucket_value", round(col("bucket_value"), 2))
        .withColumn("value_locf", round(col("value_locf"), 2))
        .orderBy(col("event_type"), col("bucket")),
      Some("""WITH agg AS (
             |  SELECT event_type, date_trunc('hour', ts) AS bucket,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    round(sum(value), 2) AS bucket_value
             |  FROM events GROUP BY 1, 2),
             |bounds AS (
             |  SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
             |  FROM agg GROUP BY 1),
             |axis AS (
             |  SELECT event_type,
             |    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
             |  FROM bounds),
             |j AS (
             |  SELECT a.event_type, a.bucket, g.n_events, g.bucket_value
             |  FROM axis a LEFT JOIN agg g
             |    ON a.event_type = g.event_type AND a.bucket = g.bucket)
             |SELECT event_type, bucket,
             |  coalesce(n_events, 0) AS n_events,
             |  coalesce(bucket_value, 0.0) AS bucket_value,
             |  coalesce(last_value(bucket_value IGNORE NULLS) OVER (
             |    PARTITION BY event_type ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
             |    AS value_locf
             |FROM j ORDER BY event_type, bucket""".stripMargin)),

    // A3/U2/A5/F*: the run-window pivot — the reference does
    // UNION-then-MAX (Autoloader_daily_log_report.sql:99-124); conditional
    // aggregation is the shuffle-free equivalent (one pass, no union).
    // Duration = floor(second-truncated epoch diff / 60), the exact
    // semantics of the report's timediff(minute, …).
    "q_run_window_pivot" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup", col("ts"))).as("start_ts"),
            max(when(col("event_type") === "error", col("ts"))).as("end_ts"))
          .withColumn("duration_min",
            floor((unix_timestamp(col("end_ts")) - unix_timestamp(col("start_ts"))) / 60))
          .filter(col("start_ts").isNotNull && col("end_ts").isNotNull)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  min(CASE WHEN event_type = 'signup' THEN ts END) AS start_ts,
             |  max(CASE WHEN event_type = 'error' THEN ts END) AS end_ts,
             |  CAST(floor(date_diff('second',
             |    min(CASE WHEN event_type = 'signup' THEN ts END),
             |    max(CASE WHEN event_type = 'error' THEN ts END)) / 60.0) AS BIGINT)
             |    AS duration_min
             |FROM events GROUP BY user_id
             |HAVING start_ts IS NOT NULL AND end_ts IS NOT NULL
             |ORDER BY user_id""".stripMargin)),

    // F*: nested CASE (Run jobs.py:94-107; report :223-227).
    "q_case_nested" -> Q(
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F",
            when(col("o_totalprice") > 200000, lit("big-finished"))
              .otherwise(lit("finished")))
          .when(col("o_orderstatus") === "O",
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("hot-open"))
              .otherwise(lit("open")))
          .otherwise(lit("partial")).as("verdict"))
        .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
        .orderBy(col("verdict")),
      Some("""SELECT CASE WHEN o_orderstatus = 'F' THEN
             |         CASE WHEN o_totalprice > 200000 THEN 'big-finished' ELSE 'finished' END
             |       WHEN o_orderstatus = 'O' THEN
             |         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot-open' ELSE 'open' END
             |       ELSE 'partial' END AS verdict, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY verdict""".stripMargin)),

    // F* string functions: concat / substring / trim / lower / split.
    "q_string_funcs" -> Q(
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          lower(col("p_brand")).as("brand_lc"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat(col("p_brand"), lit("#"), trim(col("p_type"))).as("tag"),
          element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, lower(p_brand) AS brand_lc,
             |  substring(p_type, 1, 5) AS type5,
             |  concat(p_brand, '#', trim(p_type)) AS tag,
             |  split_part(p_name, ' ', 1) AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // F* date functions: date_format / timestampadd / year-month parts
    // (report :34-38,71,222-223).
    "q_date_funcs" -> Q(
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm").as("od_fmt"),
          year(col("o_orderdate")).as("od_year"),
          month(col("o_orderdate")).as("od_month"),
          expr("timestampadd(SECOND, 30, o_orderdate)").as("od_plus30s"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%m/%d/%Y %H:%M') AS od_fmt,
             |  CAST(year(o_orderdate) AS INT) AS od_year,
             |  CAST(month(o_orderdate) AS INT) AS od_month,
             |  o_orderdate + INTERVAL 30 SECOND AS od_plus30s
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // A4: SUM(CAST(extracted-string AS INT)) — the report's row-count
    // roll-up (Autoloader_daily_log_report.sql:205-214) over the events
    // props JSON-ish payload.
    "q_cast_sum" -> Q(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(coalesce(regexp_extract(col("props"), "[0-9]+", 0), lit("0"))
          .cast("int")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(coalesce(regexp_extract(props, '[0-9]+'), '0') AS INT)) AS BIGINT) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // O1/O2: global sort + limit (top-k runs through TakeOrderedAndProject,
    // no full sort at scale).
    "q_topk" -> Q(
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .limit(20),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // U1: inline constant status dimension (insert_config.py:125-144)
    // joined back to data grouped by a derived status id.
    "q_status_dim" -> Q(
      (s, dir) => {
        val dim = s.createDataFrame(Seq(
          (0, "Open"), (1, "Finished"), (2, "Partial")))
          .toDF("StatusID", "StatusName")
        val counts = t(s, dir, "orders")
          .withColumn("StatusID",
            when(col("o_orderstatus") === "O", 0)
              .when(col("o_orderstatus") === "F", 1).otherwise(2))
          .groupBy(col("StatusID")).agg(count(lit(1)).as("n"))
        dim.join(broadcast(counts), Seq("StatusID"), "left")
          .select(col("StatusID"), col("StatusName"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("StatusID"))
      },
      Some("""SELECT d.StatusID, d.StatusName, coalesce(c.n, 0) AS n
             |FROM (VALUES (0,'Open'),(1,'Finished'),(2,'Partial')) d(StatusID, StatusName)
             |LEFT JOIN (
             |  SELECT CASE WHEN o_orderstatus='O' THEN 0
             |              WHEN o_orderstatus='F' THEN 1 ELSE 2 END AS StatusID,
             |         count(*) AS n
             |  FROM orders GROUP BY 1) c ON d.StatusID = c.StatusID
             |ORDER BY d.StatusID""".stripMargin)),

    // U2: UNION (distinct) of two projections.
    "q_union_distinct" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
          .union(o.filter(col("o_totalprice") > 300000).select(col("o_custkey")))
          .distinct().orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |UNION
             |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
             |ORDER BY o_custkey""".stripMargin)),

    // Anti join — the NOT-MATCHED-BY-SOURCE semantics family
    // (insert_config.py merges) as a standalone operator: customers
    // with no orders.
    "q_anti_join" -> Q(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // Semi join — EXISTS: suppliers that shipped at least one item.
    "q_semi_join" -> Q(
      (s, dir) => t(s, dir, "supplier")
        .join(t(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey")),
          Seq("s_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
             |ORDER BY s_suppkey""".stripMargin)),

    // Beyond-parity: ROLLUP subtotals (multi-level aggregation in one
    // pass — the reference computes report subtotals with separate
    // queries).
    "q_rollup" -> Q(
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST,
             |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Per-group top-k: the windowed rank ≤ k idiom (top 3 orders per
    // status) — rank over the price ALONE, so equal-price rows share a
    // rank and all of them are kept (can yield > 3 rows in a tied
    // group); the outer ORDER BY carries the orderkey tiebreak that
    // makes the output total.
    "q_topk_per_group" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc)
        t(s, dir, "orders")
          .withColumn("rk", rank().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select(col("o_orderstatus"), col("rk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderstatus"), col("rk"), col("o_orderkey"))
      },
      Some("""SELECT o_orderstatus, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
             |FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    rank() OVER (PARTITION BY o_orderstatus
             |                 ORDER BY o_totalprice DESC) AS rk
             |  FROM orders)
             |WHERE rk <= 3
             |ORDER BY o_orderstatus, rk, o_orderkey""".stripMargin)),

    // Edit distance — fuzzy string matching for entity resolution;
    // levenshtein is exact-integer in both engines.
    "q_edit_distance" -> Q(
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("dist_bt"),
          levenshtein(lower(col("p_type")), lower(col("p_name"))).as("dist_tn"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  CAST(levenshtein(p_brand, p_type) AS INT) AS dist_bt,
             |  CAST(levenshtein(lower(p_type), lower(p_name)) AS INT) AS dist_tn
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Beyond-parity: CUBE with grouping() markers — all four aggregation
    // levels in one pass (rollup's sibling; subtotal provenance made
    // explicit so consumers can tell a real NULL group from a subtotal).
    "q_cube" -> Q(
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first,
          col("g_status"), col("g_priority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_priority
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST,
             |  o_orderpriority ASC NULLS FIRST, g_status, g_priority""".stripMargin)),

    // P6: isin membership filter (config_checking.py:28,39,50).
    "q_isin" -> Q(
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |FROM orders WHERE o_orderpriority IN ('1-URGENT','5-LOW')
             |GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // Distribution profiling: exact percentiles per group (type-7
    // linear interpolation — the same method DuckDB's quantile_cont
    // uses, so the values agree to the double grid; round(4) guards the
    // comparison like every other double aggregate here).
    "q_percentiles" -> Q(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 4) AS p50,
             |  round(quantile_cont(value, 0.9), 4) AS p90,
             |  round(quantile_cont(value, 0.99), 4) AS p99
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Optimizer-statistics collection: the EQUI-DEPTH histogram an
    // ANALYZE pass builds for selectivity estimation (equal mass per
    // bucket, unlike q_histogram's equal width) — 7 inner boundaries
    // at the octile quantiles (type-7, the q_percentiles convention),
    // rounded to the 4-dp grid BEFORE assignment so both engines
    // bucket against identical doubles; a value equal to a boundary
    // goes LEFT (bucket = count of strictly-smaller boundaries).
    // Shape: one quantile agg → a ONE-ROW boundary relation broadcast
    // into a codegen'd 7-comparison ladder → one hash agg; the 100 TB
    // swap is approx_percentile for the boundary row (the
    // q_classifier_filter_approx precedent), the scan stays
    // one-pass-each. Per bucket: count plus observed [lo, hi] — the
    // payload a cost model reads.
    "q_equidepth" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val boundCols = (1 to 7).map(i =>
          round(expr(s"percentile(value, ${i / 8.0})"), 4).as(s"b$i"))
        val bounds = ev.agg(boundCols.head, boundCols.tail: _*)
        val bucket = (1 to 7).map(i =>
          when(col("value") > col(s"b$i"), 1).otherwise(0))
          .reduce(_ + _)
        ev.select(col("value")).crossJoin(broadcast(bounds))
          .select(col("value"), bucket.as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            round(min(col("value")), 4).as("lo"),
            round(max(col("value")), 4).as("hi"))
          .orderBy(col("bucket"))
      },
      Some {
        val bs = (1 to 7)
          .map(i => s"round(quantile_cont(value, ${i / 8.0}), 4) AS b$i")
          .mkString(",\n    ")
        val ladder = (1 to 7)
          .map(i => s"(CASE WHEN value > b$i THEN 1 ELSE 0 END)")
          .mkString(" +\n      ")
        s"""WITH bounds AS (
           |  SELECT
           |    $bs
           |  FROM events),
           |assigned AS (
           |  SELECT value,
           |    $ladder AS bucket
           |  FROM events CROSS JOIN bounds)
           |SELECT CAST(bucket AS INT) AS bucket,
           |  CAST(count(*) AS BIGINT) AS n,
           |  round(min(value), 4) AS lo,
           |  round(max(value), 4) AS hi
           |FROM assigned GROUP BY bucket
           |ORDER BY bucket""".stripMargin
      }),

    // Training-pipeline profiling: one-pass per-column null rate +
    // cardinality over events (graft.plans.Profiler, exact mode — the
    // approx/HLL scale path is spec-gated in ProfilerSpec).
    "q_profile" -> Q(
      (s, dir) => graft.plans.Profiler.profile(
        t(s, dir, "events"),
        Seq("event_id", "user_id", "event_type", "value", "props"))
        .orderBy(col("column")),
      Some {
        val cols = Seq("event_id", "user_id", "event_type", "value", "props")
        cols.map { c =>
          s"""SELECT '$c' AS "column", count(*) AS n_rows,
             |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct
             |FROM events""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
      }),

    // §2.12-adjacent: binary/multimodal metadata — byte length + sha256
    // digest of an opaque payload column (here the document text bytes).
    "q_binary_meta" -> Q(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("byte_len"),
          sha2(col("text"), 256).as("digest"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |  sha256(text) AS digest
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multimodal payload path: opaque binary column + metadata
    // projection (graft.multimodal.Binary) — the codegen'd scan that
    // precedes any decode at 100 TB.
    "q_media_features" -> Q(
      (s, dir) => graft.multimodal.Binary.payloadMetadata(
        graft.multimodal.Binary.mediaTable(t(s, dir, "documents")))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS media_type,
             |  octet_length(encode(text)) AS byte_len,
             |  sha256(text) AS digest,
             |  lower(hex(encode(substring(text, 1, 8)))) AS magic
             |FROM documents ORDER BY doc_id""".stripMargin),
      // timed family gate: q_media_histogram (oracle still gates this entry)
      bench = false),

    // Media featurization that needs NO stub: per-payload byte-value
    // histogram (content sniffing / corruption screens) — the
    // fixed-width-vector-out kernel shape of any media featurizer,
    // recomputed byte-for-byte by the oracle (which still unrolls per
    // byte — DuckDB has no vector kernel). Restricted to the first
    // 100 docs so the ORACLE side stays cheap; the Spark side is the
    // one-pass graft_bytehist kernel.
    "q_media_histogram" -> Q(
      (s, dir) => graft.multimodal.Binary.byteHistogram(
        graft.multimodal.Binary.mediaTable(
          t(s, dir, "documents").filter(col("doc_id") < 100)))
        .orderBy(col("doc_id"), col("bucket")),
      Some("""WITH media AS (
             |  SELECT doc_id, hex(CAST(text AS BLOB)) AS h,
             |    octet_length(CAST(text AS BLOB)) AS n
             |  FROM documents WHERE doc_id < 100),
             |bytes AS (
             |  SELECT doc_id, h, unnest(range(1, n + 1)) AS i FROM media),
             |b2 AS (
             |  SELECT doc_id,
             |    ('0x' || substr(h, CAST(2*i - 1 AS INT), 2))::BIGINT // 16
             |      AS bucket
             |  FROM bytes)
             |SELECT doc_id, bucket, count(*) AS cnt
             |FROM b2 GROUP BY doc_id, bucket
             |ORDER BY doc_id, bucket""".stripMargin)),

    // The typed mapPartitions decode path (graft.multimodal.Binary
    // .decodeFeatures): per-partition decoder lifecycle, case-class
    // Encoder, batch shape — the real plumbing a media featurizer
    // runs at 100 TB. The decode itself is the documented
    // deterministic stub (no media libs in this environment), which
    // makes the WHOLE path oracle-checkable: the stub's arithmetic is
    // replayed by DuckDB, so a broken Encoder, a dropped partition or
    // a row-order dependence turns the row red.
    "q_media_decode" -> Q(
      (s, dir) => graft.multimodal.Binary.decodeFeatures(s,
        graft.multimodal.Binary.mediaTable(t(s, dir, "documents")))
        .toDF().orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS media_type,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
             |  CAST(64 + (octet_length(encode(text)) * 31) % 433 AS INT)
             |    AS height,
             |  CAST(CASE WHEN octet_length(encode(text)) % 2 = 0
             |    THEN 3 ELSE 1 END AS INT) AS channels
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling: fixed-offset byte slices of the payload (a video
    // decoder would seek to timestamps — the slicing/explode plumbing
    // is what runs at 100 TB either way). The oracle pins the exact
    // BYTES of every slice via hex (DuckDB's sha256/substring are
    // varchar-only, hex pairs are charset-proof), including the short
    // tail frame and payloads shorter than the frame grid.
    "q_media_frames" -> Q(
      (s, dir) => graft.multimodal.Binary.sampleFrames(
        graft.multimodal.Binary.mediaTable(
          t(s, dir, "documents").filter(col("doc_id") < 200)),
        frameBytes = 64, nFrames = 4)
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          octet_length(col("frame_bytes")).cast("long").as("frame_len"),
          lower(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy(col("doc_id"), col("frame_no")),
      Some("""WITH media AS (
             |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS h
             |  FROM documents WHERE doc_id < 200),
             |ix AS (
             |  SELECT doc_id, h, unnest(range(0, 4)) AS i FROM media),
             |fr AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
             |    substr(h, CAST(i * 128 + 1 AS INT), 128) AS fh
             |  FROM ix)
             |SELECT doc_id, frame_no,
             |  CAST(length(fh) // 2 AS BIGINT) AS frame_len,
             |  fh AS frame_hex
             |FROM fr WHERE length(fh) > 0
             |ORDER BY doc_id, frame_no""".stripMargin),
      // timed family gate: q_media_phash (oracle still gates this entry)
      bench = false)
  )
}
