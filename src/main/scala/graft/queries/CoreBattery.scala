package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's analytics / data-quality battery (`redshift/init.sql:19-55`,
  * `README.md:196-211`) re-expressed over the driver testdata tables, plus the
  * scan/filter/aggregate primitives they exercise.
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side partial
  * aggregation (Spark plans partial+final automatically); the top-N queries
  * plan as `TakeOrderedAndProject` (per-partition heap, no full sort shuffle),
  * which is exactly what you want at 100 TB — no operator below materializes
  * more than (groups + N) rows on any node.
  */
object CoreBattery {
  import QueryDef._

  val all: Seq[QueryDef] = Seq(

    // A1: scalar COUNT(*) — redshift/init.sql:23
    sql("q_count",
      "SELECT count(*) AS cnt FROM lineitem") { (s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))
    },

    // A3+A4 flagship pricing summary: grouped sums/avgs with filter pushdown.
    sql("q_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // A4: GROUP BY + HAVING duplicate detector — redshift/init.sql:47-52.
    sql("q_dup_detect",
      """SELECT user_id, event_type, count(*) AS c
        |FROM events GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY c DESC, user_id, event_type LIMIT 20""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("c"))
        .filter($"c" > 1)
        .orderBy($"c".desc, $"user_id", $"event_type")
        .limit(20)
    },

    // O1/O2: top-N by recency — redshift/init.sql:25-28 (ORDER BY ... LIMIT).
    sql("q_latest_n",
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 20""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .orderBy($"ts".desc, $"event_id".desc)
        .limit(20)
    },

    // A3: per-column null distribution — redshift/init.sql:39-44.
    sql("q_null_distribution",
      """SELECT
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
        |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
        |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls
        |FROM events""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d).agg(
        sum(when($"user_id".isNull, 1).otherwise(0)).as("user_id_nulls"),
        sum(when($"event_type".isNull, 1).otherwise(0)).as("event_type_nulls"),
        sum(when($"value".isNull, 1).otherwise(0)).as("value_nulls"),
        sum(when($"props".isNull, 1).otherwise(0)).as("props_nulls"))
    },

    // A2+P8: fully-null-row detector — redshift/init.sql:30-36.
    sql("q_fully_null_rows",
      """SELECT count(*) AS fully_null_rows FROM events
        |WHERE event_type IS NULL AND value IS NULL AND props IS NULL""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .filter(Seq($"event_type", $"value", $"props").map(_.isNull).reduce(_ && _))
        .agg(count(lit(1)).as("fully_null_rows"))
    },

    // A5+P9: load-verification by event-time partition — README.md:196-211.
    // dt/hour derivation doubles as partition pruning keys at scale.
    sql("q_load_verification",
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H') AS hour,
        |  count(*) AS n, max(ts) AS max_ts
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(
          date_format($"ts", "yyyy-MM-dd").as("dt"),
          date_format($"ts", "HH").as("hour"))
        .agg(count(lit(1)).as("n"), max($"ts").as("max_ts"))
        .orderBy("dt", "hour")
    },

    // Gap-based sessionization (30-min gap) — the batch form of the
    // streaming flatMapGroupsWithState operator; ANSI-expressible, so fully
    // oracle-checked. One shuffle on the key.
    sql("q_sessionize",
      """WITH t AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM t)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.streaming.StreamingOps.sessionizeBatch(
          Tables.events(s, d), "ts", "user_id", gapSeconds = 1800)
        .orderBy($"user_id", $"session_start")
    },

    // P10/F20: range predicates (validation bounds) + grouped rollup of survivors.
    sql("q_filter_range",
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 40 AND l_discount > 0.02
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity".between(10, 40) && $"l_discount" > 0.02)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("rev"))
        .orderBy($"l_returnflag")
    },

    // Declarative DQ report: the whole init.sql battery as ONE scan.
    sql("q_dq_report",
      """SELECT rule, metric, passed FROM (
        |  SELECT 'row_count' AS rule, CAST(count(*) AS DOUBLE) AS metric,
        |    count(*) >= 1 AS passed FROM events
        |  UNION ALL
        |  SELECT 'fully_null_rows',
        |    CAST(sum(CASE WHEN event_type IS NULL AND value IS NULL AND props IS NULL
        |             THEN 1 ELSE 0 END) AS DOUBLE),
        |    sum(CASE WHEN event_type IS NULL AND value IS NULL AND props IS NULL
        |        THEN 1 ELSE 0 END) = 0 FROM events
        |  UNION ALL
        |  SELECT 'null_fraction_value',
        |    round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |          / count(*), 6),
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*) <= 0.5 FROM events
        |  UNION ALL
        |  SELECT 'out_of_range_value',
        |    CAST(sum(CASE WHEN value IS NOT NULL AND NOT (value BETWEEN 0 AND 1000)
        |             THEN 1 ELSE 0 END) AS DOUBLE),
        |    sum(CASE WHEN value IS NOT NULL AND NOT (value BETWEEN 0 AND 1000)
        |        THEN 1 ELSE 0 END) = 0 FROM events
        |) ORDER BY rule""".stripMargin) { (s, d) =>
      import graft.ops.DqCheck
      val ev = Tables.events(s, d)
      DqCheck.report(ev, Seq(
          DqCheck.rowCount(),
          DqCheck.noFullyNullRows(Seq("event_type", "value", "props")),
          DqCheck.maxNullFraction("value", 0.5),
          DqCheck.valuesInRange("value", 0, 1000)))
        .orderBy("rule")
    },

    // Approximate aggregates — the 100 TB substitute for exact distincts:
    // HLL++ count-distinct and quantile sketch, one pass, fixed memory.
    // ORACLED IN THE EXACT REGIME (the theta/KLL discipline): the distinct
    // count runs over a low-cardinality column (HLL++'s linear-counting
    // range, where the estimate IS the count) and the percentile's accuracy
    // parameter exceeds every group size, so the sketch retains all values
    // and returns the true discrete median — both therefore equal the
    // oracle's exact aggregates. ApproxSpec separately pins the
    // approximate-regime accuracy bands (high-cardinality l_partkey).
    // SPARK-VERSION COUPLING (known, accepted): neither "HLL++ is exact in
    // its linear-counting regime" nor "percentile_approx at accuracy 1e6
    // equals percentile_disc when groups fit" is a contractual guarantee —
    // a Spark upgrade changing sketch internals could flip this hash oracle
    // even though the query stays correct. If this entry alone fails after
    // an upgrade, check ApproxSpec first: it isolates the regime assumption
    // from the query logic (verified against Spark 4.1).
    sql("q_approx_stats",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS approx_statuses,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity), 2)
        |    AS p50_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_linestatus").as("approx_statuses"),
          round(percentile_approx($"l_quantity", lit(0.5), lit(1000000)), 2)
            .as("p50_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // F14: CASE WHEN conditional aggregation — redshift/init.sql:41-43 shape.
    sql("q_case_when_agg",
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          sum(when($"o_totalprice" > 200000, 1).otherwise(0)).as("big_orders"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("fulfilled"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },
  )
}
