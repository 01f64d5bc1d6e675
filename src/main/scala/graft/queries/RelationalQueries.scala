package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Broader relational coverage over the TPC-H-ish tables: join variants
  * (semi/anti), grouping sets, exact percentiles, date bucketing,
  * decorrelated subqueries, and event-sequence (funnel/retention)
  * analytics. Everything oracle-checked against DuckDB 1.0.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // left-semi + left-anti: customers with and without orders
    "semi_anti_customers" -> { (s, dir) =>
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val withOrders = customer.join(orders,
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("with_orders").as("bucket"), col("c_custkey"))
      val withoutOrders = customer.join(orders,
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_orders").as("bucket"), col("c_custkey"))
      withOrders.unionAll(withoutOrders)
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .transform(sortedSingle(_, col("bucket")))
    },

    // ROLLUP grouping sets over the Q1 keys
    "rollup_lineitem" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .transform(sortedSingle(_, col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first))
    },

    // analytic-window breadth: lag/lead/ntile/percent_rank/cume_dist/
    // first_value in one pinned-order window. All outputs are exact across
    // engines: lag/lead copy values, ntile is integer, percent_rank and
    // cume_dist are single divisions of integers (IEEE-identical), and the
    // (o_orderdate, o_orderkey) sort is total so no tie ambiguity exists.
    "window_analytics" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .where(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cum_dist"),
          first(col("o_orderkey")).over(w).as("first_key"))
        .transform(sortedSingle(_, col("o_custkey"), col("o_orderkey")))
    },

    // statistical moments WITHOUT float-order nondeterminism: quantities
    // cast to DECIMAL so the partial-aggregated sums are EXACT (and
    // shuffle-order-independent — the property a double sum loses the
    // moment AQE re-splits a partition); mean/variance then derive from
    // the exact moments in a fixed double formula both engines replay
    // bit for bit. The scale posture of every stats pipeline: exact
    // integer/decimal partials, float only at the final scalar step.
    "lineitem_moments" -> { (s, dir) =>
      val q = col("l_quantity").cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(q).cast("double").as("sum_qty"),
          sum(q * q).cast("double").as("sumsq_qty"))
        .select(col("l_returnflag"), col("n"), col("sum_qty"), col("sumsq_qty"),
          (col("sum_qty") / col("n")).as("mean_qty"),
          ((col("sumsq_qty") - col("sum_qty") * col("sum_qty") / col("n"))
            / (col("n") - 1)).as("var_qty"))
        .transform(sortedSingle(_, col("l_returnflag")))
    },

    // one-pass data profiling (ops/Profile): counts / nulls / ranges /
    // exact distincts for three columns in ONE aggregate (the multi-
    // count(DISTINCT) Expand pass), plus a fixed-range histogram — the
    // corpus-QA stage, all integer-or-IEEE-exact
    "profile_orders" -> { (s, dir) =>
      graft.ops.Profile.numeric(t(s, dir, "orders"),
          Seq("o_totalprice", "o_custkey", "o_orderkey"))
        .transform(sortedSingle(_, col("column")))
    },
    "histogram_orders" -> { (s, dir) =>
      graft.ops.Profile.histogram(t(s, dir, "orders"),
          col("o_totalprice"), lo = 0.0, hi = 600000.0, buckets = 12)
        .transform(sortedSingle(_, col("bucket")))
    },

    // exact interpolated percentiles per order priority. Exact tier is safe
    // here because priorities are a 5-value dimension with bounded groups;
    // unbounded groups must use Percentiles.approx (bounded sketch memory —
    // exact percentile buffers every group value and OOMs on a hot key).
    "orders_percentiles" -> { (s, dir) =>
      graft.ops.Percentiles.exact(
          t(s, dir, "orders"), Seq("o_orderpriority"), "o_totalprice",
          Seq(0.5, 0.9))
        .select(col("o_orderpriority"),
          round(col("p50"), 6).as("p50"), round(col("p90"), 6).as("p90"),
          col("n"))
        .transform(sortedSingle(_, col("o_orderpriority")))
    },

    // month bucketing + conditional aggregation over ship dates
    "monthly_shipments" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(trunc(col("l_shipdate").cast("date"), "month").as("ship_month"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(when(col("l_returnflag") === "R", col("l_extendedprice"))
            .otherwise(lit(0.0))), 6).as("returned_value"))
        .transform(sortedSingle(_, col("ship_month")))
    },

    // decorrelated scalar subquery: orders above their customer's average
    "orders_above_cust_avg" -> { (s, dir) =>
      // decorrelated "above my group's average" via a WINDOW over the
      // custkey partitioning, not groupBy + self-join: one exchange of
      // orders instead of two, and no aggregate side that stops being
      // broadcastable at scale (customer-count rows). The final groupBy
      // reuses the window's partitioning, so it adds no exchange.
      val w = Window.partitionBy("o_custkey")
      t(s, dir, "orders")
        .withColumn("cust_avg", avg("o_totalprice").over(w))
        .where(col("o_totalprice") > col("cust_avg") * 1.5)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big_orders"))
        .transform(sortedSingle(_, col("o_custkey")))
    },

    // event funnel: users whose first 'click' precedes a later 'purchase'
    // within one hour (sequence analytics via per-user window ordering)
    "events_funnel" -> { (s, dir) =>
      val ev = graft.SparkEntry.eventsTable(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts").as("first_click"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      clicks.join(purchases, "user_id")
        .where(col("p_ts") > col("first_click") &&
          col("p_ts").cast("double") - col("first_click").cast("double") <= 3600.0)
        .groupBy("user_id").agg(count(lit(1)).as("n_purchases_1h"))
        .transform(sortedSingle(_, col("user_id")))
    },

    // TPC-H Q5-ish: revenue by region/nation through the supplier side
    // (4-way star join; dims broadcast)
    "q5_region_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .transform(sortedSingle(_, col("r_name"), col("n_name")))
    },

    // HAVING: customers above an order-count threshold
    "having_big_customers" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 4).as("total_spend"))
        .where(col("n_orders") >= 15)
        .transform(sortedSingle(_, col("o_custkey")))
    },

    // ordered string aggregation: nation list per region
    "string_agg_nations" -> { (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
        .transform(sortedSingle(_, col("r_name")))
    },

    // set operations: INTERSECT / EXCEPT (distinct semantics both engines)
    "set_ops_docs" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val en = docs.where(col("lang") === "en").select("doc_id")
      val long = docs.where(col("n_chars") > 250).select("doc_id")
      en.intersect(long).withColumn("op", lit("intersect"))
        .unionAll(en.except(long).withColumn("op", lit("except")))
        .select("op", "doc_id")
        .transform(sortedSingle(_, col("op"), col("doc_id")))
    },

    // grouped top-k via the bounded-heap aggregate (generic use of
    // TopKByScore beyond vector search: top users per event type; a
    // window row_number would shuffle every (type, user) row)
    "events_top_users" -> { (s, dir) =>
      val perUser = graft.SparkEntry.eventsTable(s, dir)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
      perUser
        .select(col("event_type"),
          struct((-col("cnt")).cast("double").as("score"), col("user_id").as("id"))
            .as("sv"))
        .groupBy("event_type")
        .agg(graft.functions.topk_by_score(col("sv"), 3).as("hits"))
        .select(col("event_type"), posexplode(col("hits")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("user_id"), (-col("col.score")).cast("long").as("cnt"))
        .transform(sortedSingle(_, col("event_type"), col("rank")))
    },

    // cardinality + quantile sketches, oracle-checkable. The sketch values
    // themselves (HLL++, GK-quantile) can't hash-match DuckDB's internals,
    // so the query emits the EXACT distinct count plus booleans asserting
    // each sketch honors its published error bound — the oracle emits the
    // same exact count and TRUE. Three cheap passes beat one mixed
    // distinct/approx agg: count_distinct alongside other aggregates forces
    // an Expand (row duplication) over the whole scan, and the rank check
    // verifies approx_percentile without buffering exact percentiles.
    "sketch_stats" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      // exact distinct, two-phase: dedup keys map-side, then count — no Expand
      // (A/B-measured against folding the rank check into this pass via a
      // pre-join: three narrow passes beat two wider ones, 1.28s vs 1.56s
      // at sf0.1)
      val exact = li.groupBy("l_returnflag", "l_orderkey").agg(count(lit(1)).as("__c"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("exact_orders"))
      // sketches in one plain hash-aggregate pass
      val sketch = li.groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey")).as("__approx_orders"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("__approx_median"))
      // rank check: the fraction of rows <= the sketch median must sit within
      // eps of 0.5 (approx_percentile's rank-error contract, eps >= 1/accuracy)
      val rank = li.join(broadcast(sketch), "l_returnflag")
        .groupBy("l_returnflag")
        .agg((sum(when(col("l_extendedprice") <= col("__approx_median"), 1L)
          .otherwise(0L)) / count(lit(1))).as("__median_frac"))
      exact.join(broadcast(sketch), "l_returnflag").join(broadcast(rank), "l_returnflag")
        .select(
          col("l_returnflag"),
          col("exact_orders"),
          // HLL++ default rsd is 0.05; 0.15 = 3 sigma
          (abs(col("__approx_orders") - col("exact_orders")) <=
            col("exact_orders") * 0.15).as("approx_orders_ok"),
          (abs(col("__median_frac") - 0.5) <= 0.01).as("approx_median_ok"))
        .transform(sortedSingle(_, col("l_returnflag")))
    },

    // Z-order clustering (graft.ops.Layout): the multi-dimension layout
    // that gives min/max file pruning on EVERY participating column (the
    // lakehouse OPTIMIZE ZORDER capability). The z-value is pure bit
    // interleaving over bucketed columns, replayed exactly by the oracle;
    // LayoutSpec proves the locality property (a clustered write confines
    // each key of BOTH dimensions to few partitions).
    "zorder_values" -> { (s, dir) =>
      val z = graft.ops.Layout.zValue(Seq(
        pmod(col("o_custkey"), lit(256L)), pmod(col("o_orderkey"), lit(256L))), 8)
      t(s, dir, "orders")
        .select(col("o_orderkey"), z.as("z"))
        .transform(sortedSingle(_, col("o_orderkey")))
    },

    // salted JOIN (Skew.saltedJoin — the hot-key fact-dim join tier when
    // the dim is too big to broadcast): facts salt deterministically on a
    // row key, the dim replicates x salts, and the hot key's probe spreads
    // over `salts` tasks. Salting must not change the answer — the oracle
    // is the plain join.
    "salted_join_orders" -> { (s, dir) =>
      val facts = t(s, dir, "orders").withColumnRenamed("o_custkey", "custkey")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      graft.ops.Skew.saltedJoin(facts, dim, "custkey", Seq(col("o_orderkey")), salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("total"))
        .transform(sortedSingle(_, col("c_mktsegment")))
    },

    // the APPROX percentile tier (Percentiles.approx — GK sketch, bounded
    // memory per group: the 100 TB path for unbounded groups) under the
    // gate via the sketch_stats pattern: the sketch value itself can't
    // hash-match another engine, so the query asserts its rank-error
    // contract Spark-side (fraction of rows <= approx median within eps of
    // 0.5) and emits the boolean; the oracle emits TRUE. A contract
    // violation flips the boolean and fails the hash.
    "percentiles_approx_gate" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val ap = graft.ops.Percentiles.approx(
        o, Seq("o_orderpriority"), "o_totalprice", Seq(0.5))
      val rank = o.join(broadcast(ap.select("o_orderpriority", "p50")), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg((sum(when(col("o_totalprice") <= col("p50"), 1L).otherwise(0L)) /
          count(lit(1))).as("__frac"))
      ap.join(broadcast(rank), "o_orderpriority")
        .select(col("o_orderpriority"), col("n"),
          (abs(col("__frac") - 0.5) <= 0.01).as("approx_median_ok"))
        .transform(sortedSingle(_, col("o_orderpriority")))
    },

    // window frames: running per-customer order total (rows unbounded
    // preceding -> current row), deterministic frame order
    "running_order_total" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .where(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 6).as("running_total"))
        .transform(sortedSingle(_, col("o_custkey"), col("o_orderkey")))
    },

    // pivot: per-user event-type counts as columns (explicit value list ->
    // deterministic schema; oracle via conditional aggregation)
    "events_pivot" -> { (s, dir) =>
      graft.SparkEntry.eventsTable(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .transform(sortedSingle(_, col("user_id")))
    },

    // full outer join with match classification (orders x customer)
    "full_outer_match" -> { (s, dir) =>
      val orders = t(s, dir, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      val customer = t(s, dir, "customer").select("c_custkey")
      orders.join(customer, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          when(col("o_custkey").isNull, "customer_only")
            .when(col("c_custkey").isNull, "orders_only")
            .otherwise("matched").as("side"))
        .groupBy("side").agg(count(lit(1)).as("n"))
        .transform(sortedSingle(_, col("side")))
    },

    // JSON property extraction from the events props payload
    "events_json_extract" -> { (s, dir) =>
      graft.SparkEntry.eventsTable(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 6).as("avg_k"))
        .transform(sortedSingle(_, col("event_type")))
    },

    // as-of join (operator Spark lacks — graft.ops.AsOfJoin): each purchase
    // matched to the same user's most recent at-or-before click. Union + one
    // window pass; the oracle is DuckDB's native ASOF LEFT JOIN. Epochs as
    // BIGINT (never raw timestamps — parquet instant-adjustment skew).
    "events_asof" -> { (s, dir) =>
      val ev = graft.SparkEntry.eventsTable(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      graft.ops.AsOfJoin.backward(purchases, clicks, Seq("user_id"),
          "ts", "click_ts", Seq("click_ts"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("p_epoch"),
          unix_timestamp(col("click_ts")).as("click_epoch"))
        .transform(sortedSingle(_, col("event_id")))
    },

    // nearest as-of join: each purchase matched to the temporally CLOSEST
    // click either side (ties backward — pandas merge_asof nearest).
    // DuckDB has no nearest ASOF, so the oracle composes its backward and
    // forward ASOF joins and picks the least gap — an independent
    // formulation, not a replay of the Spark plan.
    "events_asof_nearest" -> { (s, dir) =>
      val ev = graft.SparkEntry.eventsTable(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      graft.ops.AsOfJoin.nearest(purchases, clicks, Seq("user_id"),
          "ts", "click_ts", Seq("click_ts"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("p_epoch"),
          unix_timestamp(col("click_ts")).as("click_epoch"))
        .transform(sortedSingle(_, col("event_id")))
    },

    // bucketed range join (graft.ops.RangeJoin): views within the 30 minutes
    // before each purchase, counted per purchase — the attribution-window
    // shape. A view at ts covers the interval [ts, ts+1800]; a purchase
    // matches every covering interval of its user. Equi-join on
    // (user, bucket), never a nested loop. Epoch seconds as double carry
    // fractional micros identically in both engines.
    "events_attribution" -> { (s, dir) =>
      val ev = graft.SparkEntry.eventsTable(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").cast("double").as("v_start"))
        .withColumn("v_end", col("v_start") + 1800.0)
      val counts = graft.ops.RangeJoin.pointInInterval(
          purchases.withColumn("p_t", col("ts").cast("double")), views,
          Seq("user_id"), "p_t", "v_start", "v_end", 1800.0)
        .groupBy("event_id").agg(count(lit(1)).as("__n"))
      purchases.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("p_epoch"),
          coalesce(col("__n"), lit(0L)).as("n_views_30m"))
        .transform(sortedSingle(_, col("event_id")))
    },

    // daily retention: users active on consecutive days
    "events_retention" -> { (s, dir) =>
      val ev = graft.SparkEntry.eventsTable(s, dir)
      val daily = ev.select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val next = daily.select(col("user_id"), col("day"))
      daily.as("a").join(next.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.day") === date_add(col("a.day"), 1))
        .groupBy(col("a.day").as("day"))
        .agg(count(lit(1)).as("retained_users"))
        .transform(sortedSingle(_, col("day")))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "semi_anti_customers" ->
      """SELECT bucket, count(*) AS n FROM (
        |  SELECT 'with_orders' AS bucket, c_custkey FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'no_orders' AS bucket, c_custkey FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "rollup_lineitem" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cum_dist,
        |       first_value(o_orderkey) OVER w AS first_key
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // exact decimal partials, double only at the final scalar formula —
    // mirrors the Spark side operation for operation so every float op is
    // the same IEEE op on the same exact inputs
    "lineitem_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*)::BIGINT AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sumsq_qty
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sum_qty, sumsq_qty,
        |       sum_qty / n AS mean_qty,
        |       (sumsq_qty - sum_qty * sum_qty / n) / (n - 1) AS var_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "profile_orders" ->
      """SELECT 'o_custkey' AS "column", count(*)::BIGINT AS n,
        |       (count(*) - count(o_custkey))::BIGINT AS n_null,
        |       CAST(min(o_custkey) AS DOUBLE) AS min,
        |       CAST(max(o_custkey) AS DOUBLE) AS max,
        |       count(DISTINCT o_custkey)::BIGINT AS n_distinct
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        |       CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE),
        |       count(DISTINCT o_orderkey)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |       min(o_totalprice), max(o_totalprice),
        |       count(DISTINCT o_totalprice)
        |FROM orders
        |ORDER BY "column" """.stripMargin,
    "histogram_orders" ->
      """SELECT CASE WHEN raw < 0 THEN -1
        |            WHEN raw >= 12 THEN 12
        |            ELSE CAST(raw AS BIGINT) END AS bucket,
        |       count(*)::BIGINT AS n
        |FROM (SELECT floor((o_totalprice - 0.0) * 12.0 / 600000.0) AS raw
        |      FROM orders WHERE o_totalprice IS NOT NULL)
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "orders_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "monthly_shipments" ->
      """SELECT date_trunc('month', l_shipdate::DATE)::DATE AS ship_month,
        |       count(*) AS n_items,
        |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 6) AS returned_value
        |FROM lineitem GROUP BY 1 ORDER BY ship_month""".stripMargin,
    "orders_above_cust_avg" ->
      """WITH ca AS (SELECT o_custkey, avg(o_totalprice) AS cust_avg FROM orders GROUP BY o_custkey)
        |SELECT o.o_custkey, count(*) AS n_big_orders
        |FROM orders o JOIN ca USING (o_custkey)
        |WHERE o.o_totalprice > ca.cust_avg * 1.5
        |GROUP BY o.o_custkey ORDER BY o.o_custkey""".stripMargin,
    "events_funnel" ->
      """WITH c AS (SELECT user_id, min(ts) AS first_click FROM events
        |           WHERE event_type = 'click' GROUP BY user_id)
        |SELECT e.user_id, count(*) AS n_purchases_1h
        |FROM events e JOIN c ON e.user_id = c.user_id
        |WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        |  AND date_part('epoch', e.ts) - date_part('epoch', c.first_click) <= 3600.0
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "having_big_customers" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 4) AS total_spend
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin,
    "string_agg_nations" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "set_ops_docs" ->
      """SELECT 'intersect' AS op, doc_id FROM (
        |  SELECT doc_id FROM documents WHERE lang = 'en'
        |  INTERSECT
        |  SELECT doc_id FROM documents WHERE n_chars > 250)
        |UNION ALL
        |SELECT 'except' AS op, doc_id FROM (
        |  SELECT doc_id FROM documents WHERE lang = 'en'
        |  EXCEPT
        |  SELECT doc_id FROM documents WHERE n_chars > 250)
        |ORDER BY op, doc_id""".stripMargin,
    "events_top_users" ->
      """SELECT event_type, rank, user_id, cnt FROM (
        |  SELECT event_type, user_id, cnt,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |              ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rank
        |  FROM (SELECT event_type, user_id, count(*) AS cnt
        |        FROM events GROUP BY event_type, user_id))
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "running_order_total" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "events_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "full_outer_match" ->
      """SELECT side, count(*) AS n FROM (
        |  SELECT CASE WHEN o.o_custkey IS NULL THEN 'customer_only'
        |              WHEN c.c_custkey IS NULL THEN 'orders_only'
        |              ELSE 'matched' END AS side
        |  FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  FULL OUTER JOIN (SELECT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey)
        |GROUP BY side ORDER BY side""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |       round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_asof" ->
      """SELECT p.event_id, p.user_id,
        |       CAST(floor(date_part('epoch', p.ts)) AS BIGINT) AS p_epoch,
        |       CAST(floor(date_part('epoch', c.ts)) AS BIGINT) AS click_epoch
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "events_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |     b AS (SELECT p.event_id, c.ts AS m FROM p
        |           ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
        |     f AS (SELECT p.event_id, c.ts AS m FROM p
        |           ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT p.event_id, p.user_id,
        |       CAST(floor(date_part('epoch', p.ts)) AS BIGINT) AS p_epoch,
        |       CAST(floor(date_part('epoch',
        |         CASE WHEN b.m IS NULL THEN f.m
        |              WHEN f.m IS NULL THEN b.m
        |              WHEN date_part('epoch', p.ts) - date_part('epoch', b.m)
        |                   <= date_part('epoch', f.m) - date_part('epoch', p.ts)
        |              THEN b.m ELSE f.m END)) AS BIGINT) AS click_epoch
        |FROM p JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY p.event_id""".stripMargin,
    "events_attribution" ->
      """WITH p AS (SELECT event_id, user_id, ts, date_part('epoch', ts) AS p_t
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, date_part('epoch', ts) AS v_t
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id,
        |       CAST(floor(p.p_t) AS BIGINT) AS p_epoch,
        |       CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_views_30m
        |FROM p LEFT JOIN (
        |  SELECT p2.event_id AS eid, count(*) AS cnt
        |  FROM p p2 JOIN v ON p2.user_id = v.user_id
        |    AND p2.p_t >= v.v_t AND p2.p_t <= v.v_t + 1800.0
        |  GROUP BY 1) c ON p.event_id = c.eid
        |ORDER BY p.event_id""".stripMargin,
    "events_retention" ->
      """WITH daily AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events)
        |SELECT a.day AS day, count(*) AS retained_users
        |FROM daily a JOIN daily b ON a.user_id = b.user_id AND b.day = a.day + 1
        |GROUP BY a.day ORDER BY a.day""".stripMargin,
    "sketch_stats" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |       TRUE AS approx_orders_ok, TRUE AS approx_median_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "percentiles_approx_gate" ->
      """SELECT o_orderpriority, count(*) AS n, TRUE AS approx_median_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "salted_join_orders" ->
      """SELECT c_mktsegment, count(*) AS n_orders, sum(o_totalprice) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "zorder_values" ->
      s"""SELECT o_orderkey,
         |  ${graft.ops.Layout.zValueSql(Seq("(o_custkey % 256)", "(o_orderkey % 256)"), 8)} AS z
         |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
