package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins
import Q._

/**
 * The rest of the §2.7 surface: as-of and range joins (composed operators —
 * see [[graft.operators.Joins]] for the scale rationale), GROUPING SETS via
 * the SQL surface, session windows, array functions, and approximate
 * distinct counting (rows-only: sketch estimates are engine-specific by
 * nature, so there is no cross-engine oracle; a ScalaTest pins the accuracy
 * envelope instead).
 */
object AdvancedPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof" -> { (s, dir) =>
      import s.implicits._
      // as-of in the MICROSECOND domain: DuckDB's TIMESTAMP_NS compares at
      // microsecond precision, so matching on raw nanos could diverge from
      // the oracle for same-microsecond events
      val ev = t(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts_us", $"event_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts_us", $"event_id".as("p_event_id"), $"value")
      Joins.asOf(clicks, purchases, key = "user_id",
        leftTime = "ts_us", rightTime = "ts_us",
        rightPayload = Seq("p_event_id" -> "p_event_id", "value" -> "p_value"),
        rightOrder = "p_event_id")
        .select($"event_id", $"user_id", $"p_event_id",
          cents($"p_value").as("p_value_c"))
        .orderBy($"event_id")
    },
    "q_join_range" -> { (s, dir) =>
      import s.implicits._
      val epoch = to_date(lit("1970-01-01"))
      val points = t(s, dir, "lineitem").filter($"l_quantity" === 50)
        .select($"l_shipdate", datediff($"l_shipdate", epoch).cast("long").as("ship_day"))
      val intervals = t(s, dir, "orders")
        .select($"o_orderkey",
          datediff($"o_orderdate", epoch).cast("long").as("lo"))
        .withColumn("hi", $"lo" + 7)
      Joins.rangeBinned(points, intervals, "ship_day", "lo", "hi", binWidth = 7)
        .groupBy(year($"l_shipdate").cast("long").as("y"),
          month($"l_shipdate").cast("long").as("m"))
        .agg(count(lit(1)).as("n"), countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"y", $"m")
    },
    "q_agg_grouping_sets" -> { (s, dir) =>
      // the SQL surface: GROUP BY GROUPING SETS over a registered view
      t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          |  count(*) AS cnt,
          |  CAST(round(sum(l_quantity)*100) AS BIGINT) AS qty_c
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },
    "q_events_sessions" -> { (s, dir) =>
      import s.implicits._
      // session windows (4h inactivity gap) on the micro-exact event time
      t(s, dir, "events")
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .groupBy($"user_id", session_window($"event_time", "4 hours"))
        .agg(count(lit(1)).as("n"))
        .select($"user_id", unix_micros($"session_window.start").as("start_us"), $"n")
        .orderBy($"user_id", $"start_us")
    },
    "q_scalar_array" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "part").filter($"p_partkey" <= 300)
        .withColumn("w", split($"p_name", " "))
        .select($"p_partkey",
          size($"w").cast("long").as("n_words"),
          // arrays are stringified so the driver's pandas row-hasher (which
          // can't digest list cells) still grades the array semantics
          array_join(sort_array($"w"), "|").as("sorted_w"),
          array_contains($"w", "green").as("has_green"),
          element_at($"w", 1).as("first_w"),
          element_at($"w", -1).as("last_w"),
          array_join(slice($"w", 1, 2), "|").as("first2"))
        .orderBy($"p_partkey")
    },
    "q_scalar_map" -> { (s, dir) =>
      import s.implicits._
      // MapType surface: JSON → map<string,string>, key lookup, key set,
      // cardinality (the oracle derives the same values from the raw JSON)
      t(s, dir, "events").filter($"event_id" < 1000)
        .select($"event_id",
          from_json($"props",
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)).as("m"))
        .select($"event_id",
          element_at($"m", "k").cast("long").as("k_val"),
          size($"m").cast("long").as("n_keys"),
          array_join(map_keys($"m"), ",").as("keys"))
        .orderBy($"event_id")
    },
    "q_agg_salted" -> { (s, dir) =>
      import s.implicits._
      // 100k events funneling into 5 keys: salting keeps the partial
      // aggregate parallel; the final combine shuffles only keys×salt rows
      graft.operators.Skew.saltedAgg(
        t(s, dir, "events"), $"event_type", saltBuckets = 16,
        Seq(
          "n" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))),
          "sum_v_c" -> ((sum($"value"), (c: org.apache.spark.sql.Column) => cents(sum(c))))))
        .withColumnRenamed("key", "event_type")
        .orderBy($"event_type")
    },
    "q_agg_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      // HLL++ estimates are engine-specific, so the oracle states the
      // CONTRACT: the exact distinct count plus a Spark-computed boolean
      // asserting the sketch landed within 5% of it (rsd=1% guarantees far
      // tighter). DuckDB independently recomputes exact_cust and expects
      // within_5pct = true for every group.
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(approx_count_distinct($"o_custkey", rsd = 0.01).as("approx_cust"),
          countDistinct($"o_custkey").as("exact_cust"))
        .select($"o_orderstatus", $"exact_cust",
          (abs($"approx_cust" - $"exact_cust") <= $"exact_cust" * 0.05)
            .as("within_5pct"))
        .orderBy($"o_orderstatus")
    },
  )

  override def oracles: Map[String, String] = Map(
    "q_join_asof" ->
      """WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |purch AS (SELECT user_id, ts, event_id AS p_event_id, value FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, ts, event_id, 1 AS side, NULL::BIGINT AS p_event_id, NULL::DOUBLE AS pv FROM clicks
        |  UNION ALL
        |  SELECT user_id, ts, NULL, 0, p_event_id, value FROM purch),
        |m AS (SELECT user_id, event_id, side,
        |    last_value(CASE WHEN side = 0 THEN p_event_id END IGNORE NULLS) OVER w AS p_event_id,
        |    last_value(CASE WHEN side = 0 THEN pv END IGNORE NULLS) OVER w AS p_value
        |  FROM u WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, side, p_event_id ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, p_event_id,
        |  CAST(round(p_value * 100) AS BIGINT) AS p_value_c
        |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin,
    "q_join_range" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS y, CAST(month(l_shipdate) AS BIGINT) AS m,
        |  count(*) AS n, count(DISTINCT o_orderkey) AS n_orders
        |FROM (SELECT l_shipdate FROM lineitem WHERE l_quantity = 50) l
        |JOIN orders o
        |  ON date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |     BETWEEN date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AND date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7
        |GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS cnt,
        |  CAST(round(sum(l_quantity)*100) AS BIGINT) AS qty_c
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_events_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
        |d AS (SELECT user_id, t_us,
        |   CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us) IS NULL
        |          OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us) >= 14400000000
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (SELECT user_id, t_us,
        |   sum(new_s) OVER (PARTITION BY user_id ORDER BY t_us
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM d)
        |SELECT user_id, min(t_us) AS start_us, count(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    "q_scalar_array" ->
      """SELECT p_partkey,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_w,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  (string_split(p_name, ' '))[1] AS first_w,
        |  (string_split(p_name, ' '))[-1] AS last_w,
        |  array_to_string((string_split(p_name, ' '))[1:2], '|') AS first2
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin,
    "q_scalar_map" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        | CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        | array_to_string(json_keys(props), ',') AS keys
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "q_agg_salted" ->
      """SELECT event_type, count(*) AS n, CAST(round(sum(value)*100) AS BIGINT) AS sum_v_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q_agg_approx_distinct: the sketch value itself is engine-specific, so
    // the oracle checks the contract — exact count + accuracy-bound boolean.
    "q_agg_approx_distinct" ->
      """SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
        | true AS within_5pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
