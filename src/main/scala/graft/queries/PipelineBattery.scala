package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Conform, Dedup, DdbUnwrap, JsonExpand, Validate}
import graft.sources.Tables

/** The reference ETL's operator set exercised over the driver testdata:
  * embedded-JSON expansion, contract conformance, validation tagging, DDB
  * type-tag unwrap, idempotent dedup, event-time/string/date scalar surface.
  * Each entry is the library operator applied to the `events`/`customer`/
  * `orders` tables so the DuckDB oracle can replay the semantics in ANSI SQL.
  */
object PipelineBattery {
  import QueryDef._

  val all: Seq[QueryDef] = Seq(

    // F15/F16: embedded JSON-string expansion (events.props plays the bronze
    // `payload` column), then aggregate over the extracted field.
    sql("q_json_expand",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val expanded = JsonExpand.withSchema(
        Tables.events(s, d), "props",
        StructType(Seq(StructField("k", LongType))))
      expanded.groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    },

    // F15 via inference: same expansion but through the sampled-inference path
    // (the reference's glue:51-53 branch). Oracle identical to the explicit-
    // schema path — inference must land on the same shape.
    sql("q_json_expand_inferred",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin) { (s, d) =>
      import s.implicits._
      JsonExpand.withInference(Tables.events(s, d), "props", sampleN = 200)
        .select($"event_id", $"k")
        .orderBy($"event_id")
        .limit(100)
    },

    // F7: cast-or-null conformance — present cols cast (incl. narrowing
    // long→int), absent contract cols materialized as typed nulls.
    sql("q_conform",
      """SELECT event_id, CAST(user_id AS INT) AS user_id,
        |  CAST(value AS DOUBLE) AS value, event_type,
        |  CAST(NULL AS INT) AS clouds_pct, CAST(NULL AS VARCHAR) AS country
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin) { (s, d) =>
      import s.implicits._
      val contract = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", IntegerType),
        StructField("value", DoubleType),
        StructField("event_type", StringType),
        StructField("clouds_pct", IntegerType),
        StructField("country", StringType)))
      Conform.toContract(Tables.events(s, d), contract)
        .orderBy($"event_id")
        .limit(100)
    },

    // F19/P10: validation tagging — error array built from range rules,
    // rows flow through tagged, never dropped.
    sql("q_validate",
      """SELECT event_id,
        |  COALESCE(array_to_string(list_filter([
        |    CASE WHEN value IS NULL OR value < 0 OR value > 180 THEN 'value_out_of_range_or_null' END,
        |    CASE WHEN user_id IS NULL OR user_id < 0 OR user_id > 120 THEN 'user_id_out_of_range_or_null' END,
        |    CASE WHEN event_type IS NULL THEN 'event_type_null' END
        |  ], x -> x IS NOT NULL), ','), '') AS validation_errors,
        |  CAST(len(list_filter([
        |    CASE WHEN value IS NULL OR value < 0 OR value > 180 THEN 'value_out_of_range_or_null' END,
        |    CASE WHEN user_id IS NULL OR user_id < 0 OR user_id > 120 THEN 'user_id_out_of_range_or_null' END,
        |    CASE WHEN event_type IS NULL THEN 'event_type_null' END
        |  ], x -> x IS NOT NULL)) AS INT) AS n_errors
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val rules = Seq(
        Validate.rangeRule(ev("value"), "value_out_of_range_or_null", 0, 180),
        Validate.rangeRule(ev("user_id"), "user_id_out_of_range_or_null", 0, 120),
        Validate.Rule("event_type_null", ev("event_type").isNull))
      Validate.tag(ev, rules)
        // serialize the error array — the driver's row-sort can't order
        // ndarray cells; the tagging op itself still builds a real array
        .select($"event_id",
          array_join($"validation_errors", ",").as("validation_errors"),
          $"n_errors")
        .orderBy($"event_id")
        .limit(500)
    },

    // F18: DDB type-tag unwrap, validated as a round-trip: tag each event row
    // into a DDB NewImage envelope, unwrap with the engine UDF, extract the
    // original fields back out. Oracle = the identity projection.
    sql("q_ddb_unwrap",
      """SELECT event_id AS event_id_rt, event_type AS event_type_rt,
        |  value AS value_rt
        |FROM events ORDER BY event_id_rt LIMIT 200""".stripMargin) { (s, d) =>
      import s.implicits._
      val tagged = Tables.events(s, d).select(
        $"event_id",
        to_json(struct(
          struct($"event_id".cast("string").as("N")).alias("event_id"),
          struct($"event_type".as("S")).alias("event_type"),
          struct($"value".cast("string").as("N")).alias("value"),
          struct(struct($"event_type".as("S")).alias("nested")).alias("M_test")
        )).as("new_image"))
      tagged
        .withColumn("plain", DdbUnwrap.ddb_unwrap($"new_image"))
        .select(
          get_json_object($"plain", "$.event_id").cast("long").as("event_id_rt"),
          get_json_object($"plain", "$.event_type").as("event_type_rt"),
          get_json_object($"plain", "$.value").cast("double").as("value_rt"))
        .orderBy($"event_id_rt")
        .limit(200)
    },

    // T7: idempotent dedup — deterministic keep-first per natural key.
    sql("q_dedup_keep_first",
      """SELECT user_id, event_type, event_id, ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      import s.implicits._
      Dedup.keepFirst(
          Tables.events(s, d).select($"user_id", $"event_type", $"event_id", $"ts"),
          Seq("user_id", "event_type"),
          Seq($"ts", $"event_id"))
        .orderBy($"user_id", $"event_type")
    },

    // F1-F3/F22: string scalar surface — split, element_at, concat, substring,
    // coalesce fallback chain.
    sql("q_string_funcs",
      """SELECT c_custkey,
        |  string_split(c_name, '#')[2] AS cust_num,
        |  'CUST#' || c_name AS synth_key,
        |  substring(c_name, 1, 8) AS prefix,
        |  coalesce(c_mktsegment, 'unknown') AS segment
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d).select(
          $"c_custkey",
          element_at(split($"c_name", "#"), 2).as("cust_num"),
          concat(lit("CUST#"), $"c_name").as("synth_key"),
          substring($"c_name", 1, 8).as("prefix"),
          coalesce($"c_mktsegment", lit("unknown")).as("segment"))
        .orderBy($"c_custkey")
        .limit(100)
    },

    // F8-F13: timestamp scalar surface — format, truncation, extraction,
    // interval arithmetic, epoch.
    sql("q_date_funcs",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS dt,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 90 DAY AS due_date,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d).select(
          $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("dt"),
          year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          ($"o_orderdate" + expr("INTERVAL 90 DAYS")).as("due_date"),
          unix_timestamp($"o_orderdate").as("epoch_s"))
        .orderBy($"o_orderkey")
        .limit(100)
    },

    // Date arithmetic + conditional scalar breadth.
    sql("q_date_funcs2",
      """SELECT o_orderkey,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr_start,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  ifnull(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d).select(
          $"o_orderkey",
          last_day($"o_orderdate").as("month_end"),
          date_trunc("quarter", $"o_orderdate").as("qtr_start"),
          dayofweek($"o_orderdate").as("dow"),
          weekofyear($"o_orderdate").as("woy"),
          datediff(lit("2000-01-01").cast("timestamp"), $"o_orderdate").as("days_to_y2k"),
          nullif($"o_orderstatus", lit("O")).as("status_or_null"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_label"))
        .orderBy($"o_orderkey")
        .limit(200)
    },

    // Math scalar surface: rounding, powers, logs, signs, extrema.
    sql("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS d_abs,
        |  CAST(ceil(l_quantity) AS BIGINT) AS q_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
        |  round(sqrt(l_quantity), 4) AS q_sqrt,
        |  round(ln(l_extendedprice), 4) AS price_ln,
        |  round(power(l_tax + 1, 2), 6) AS tax_sq,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS d_sign,
        |  greatest(l_quantity, 25.0) AS q_hi, least(l_quantity, 25.0) AS q_lo
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d).select(
          $"l_orderkey", $"l_linenumber",
          abs($"l_discount" - 0.05).as("d_abs"),
          ceil($"l_quantity").as("q_ceil"),
          floor($"l_extendedprice" / 1000).as("price_k"),
          round(sqrt($"l_quantity"), 4).as("q_sqrt"),
          round(log($"l_extendedprice"), 4).as("price_ln"),
          round(pow($"l_tax" + 1, 2), 6).as("tax_sq"),
          signum($"l_discount" - 0.05).as("d_sign"),
          greatest($"l_quantity", lit(25.0)).as("q_hi"),
          least($"l_quantity", lit(25.0)).as("q_lo"))
        .orderBy($"l_orderkey", $"l_linenumber")
        .limit(500)
    },

    // String scalar surface beyond q_string_funcs: regex extraction,
    // padding, translate, reverse, repeat, position.
    sql("q_string_funcs2",
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
        |  reverse(c_mktsegment) AS rev,
        |  repeat('*', CAST(c_custkey % 4 AS INT)) AS stars,
        |  CAST(strpos(c_name, '#') AS INT) AS hash_pos,
        |  upper(c_mktsegment) AS seg_up, lower(c_mktsegment) AS seg_lo
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d).select(
          $"c_custkey",
          regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
          lpad($"c_custkey".cast("string"), 10, "0").as("padded"),
          translate($"c_mktsegment", "AEIOU", "aeiou").as("lowered_vowels"),
          reverse($"c_mktsegment").as("rev"),
          repeat(lit("*"), ($"c_custkey" % 4).cast("int")).as("stars"),
          locate("#", $"c_name").as("hash_pos"),
          upper($"c_mktsegment").as("seg_up"),
          lower($"c_mktsegment").as("seg_lo"))
        .orderBy($"c_custkey")
        .limit(200)
    },

    // Scalar subquery + IN-subquery (decorrelated by Catalyst).
    sql("q_subqueries",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      Tables.customer(s, d).createOrReplaceTempView("customer_sq")
      s.sql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders_sq
          |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders_sq)
          |  AND o_custkey IN (SELECT c_custkey FROM customer_sq WHERE c_mktsegment = 'BUILDING')
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin)
    },

    // Correlated scalar subquery (per-customer max).
    sql("q_correlated_subquery",
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT round(max(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer WHERE c_custkey < 100
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d).createOrReplaceTempView("orders_cq")
      Tables.customer(s, d).createOrReplaceTempView("customer_cq")
      s.sql(
        """SELECT c_custkey, c_mktsegment,
          |  (SELECT round(max(o_totalprice), 2) FROM orders_cq
          |   WHERE o_custkey = c_custkey) AS max_order
          |FROM customer_cq WHERE c_custkey < 100
          |ORDER BY c_custkey""".stripMargin)
    },

    // T2/P6: CDC insert-only filter over a synthesized change stream —
    // eventName derived deterministically from the row, then filtered the way
    // the forwarder does (`fwd:36-37`).
    // SCD Type-2 apply, oracled: changed keys close their current version
    // (valid_to = effective ts) and open a new one; unchanged keys pass
    // through. The oracle reconstructs the expected history in plain SQL.
    sql("q_scd2",
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 50)
        |SELECT c_custkey, c_mktsegment AS segment,
        |  TIMESTAMP '1990-01-01' AS valid_from,
        |  CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '1995-06-01' END AS valid_to,
        |  (c_custkey % 3 <> 0) AS is_current
        |FROM cust
        |UNION ALL
        |SELECT c_custkey, lower(c_mktsegment) AS segment,
        |  TIMESTAMP '1995-06-01' AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
        |FROM cust WHERE c_custkey % 3 = 0
        |ORDER BY c_custkey, valid_from""".stripMargin) { (s, d) =>
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_custkey" < 50)
      val history = cust.select(
        $"c_custkey", $"c_mktsegment".as("segment"),
        lit(java.sql.Timestamp.valueOf("1990-01-01 00:00:00")).as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))
      val changes = cust.filter($"c_custkey" % 3 === 0)
        .select($"c_custkey", lower($"c_mktsegment").as("segment"),
          lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")).as("eff"))
      graft.sinks.LakeMaintenance.scd2Apply(history, changes, Seq("c_custkey"), "eff")
        .orderBy($"c_custkey", $"valid_from")
    },

    sql("q_cdc_insert_filter",
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type,
        |    CASE WHEN event_id % 10 < 7 THEN 'INSERT'
        |         WHEN event_id % 10 < 9 THEN 'MODIFY'
        |         ELSE 'REMOVE' END AS eventName
        |  FROM events) t
        |WHERE eventName = 'INSERT' ORDER BY event_id LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("eventName",
          when($"event_id" % 10 < 7, "INSERT")
            .when($"event_id" % 10 < 9, "MODIFY")
            .otherwise("REMOVE"))
        .filter($"eventName" === "INSERT")
        .select($"event_id", $"user_id", $"event_type")
        .orderBy($"event_id")
        .limit(500)
    },

    // Warehouse (JDBC) gold load round-trip — the transport leg of the
    // reference's gold table: pre-action DDL + idempotent DELETE, parallel
    // JDBC append, post-action statistics refresh, then the verification
    // read back THROUGH the warehouse. Embedded Derby stands in for the
    // warehouse engine; the oracle is the gold aggregate itself, so the
    // write→read loop must be lossless (types, values, row count).
    sql("q_warehouse_roundtrip",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import s.implicits._
      val gold = Tables.documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), round(avg($"n_chars"), 2).as("avg_chars"))
      val url = "jdbc:derby:memory:graftwh;create=true"
      graft.sinks.WarehouseJdbc.load(gold, url, "gold_doc_stats",
        preactions = Seq(
          """CREATE TABLE gold_doc_stats ("lang" VARCHAR(16), "n_docs" BIGINT, "avg_chars" DOUBLE)""",
          "DELETE FROM gold_doc_stats"), // idempotent re-load (README.md:219)
        postactions = Seq(
          "CALL SYSCS_UTIL.SYSCS_UPDATE_STATISTICS('APP', 'GOLD_DOC_STATS', NULL)"),
        tolerableSqlStates = Set("X0Y32", "42X05", "42Y55"))
      graft.sinks.WarehouseJdbc.read(s, url, "gold_doc_stats")
        .orderBy($"lang")
    },

    // ORC sink/source round-trip (the second columnar format Spark ships
    // natively): gold aggregate written as ORC, read back through the ORC
    // reader. The oracle is the aggregate itself, so the loop must preserve
    // types and values exactly — decimal-free columns chosen deliberately
    // (ORC and parquet share Spark's internal row representation; the
    // format boundary is where truncation bugs would live).
    sql("q_orc_roundtrip",
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import s.implicits._
      val gold = Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val dir = s"${sys.props("java.io.tmpdir")}/graft-orc-$key"
      gold.write.mode("overwrite").orc(dir)
      s.read.orc(dir).orderBy($"l_returnflag", $"l_linestatus")
    },

    // Delta Lake transaction-log interop (the north star's named table
    // format, closing SURVEY "What's missing" 2): gold aggregate committed
    // as a PARTITIONED Snapshots table, published as a Delta log
    // (sinks/DeltaExport.export — protocol-v1 JSON actions referencing the
    // snapshot's immutable files in place, no data copy), then read back
    // THROUGH the Delta log reader (log-resolved file set, partition
    // columns materialized from each add's partitionValues, zero directory
    // listing). Oracle = the aggregate itself, so the snapshot → log →
    // external-scan loop must preserve values, types, and the partition
    // column exactly. Re-runs republish (remove+add reconcile) — the
    // reader sees one consistent current version every time.
    sql("q_delta_roundtrip",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import s.implicits._
      val gold = Tables.documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), round(avg($"n_chars"), 2).as("avg_chars"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val table = s"${sys.props("java.io.tmpdir")}/graft-delta-$key/gold"
      // dynamic overwrite touches every lang spec each run → a stable
      // current snapshot; export then publishes it as the next Delta
      // version (remove+add against the prior log)
      graft.sinks.Snapshots.commitPartitioned(gold, table, Seq("lang"),
        org.apache.spark.sql.SaveMode.Overwrite)
      graft.sinks.DeltaExport.export(s, table)
      graft.sinks.DeltaExport.read(s, table)
        .select($"lang", $"n_docs", $"avg_chars")
        .orderBy($"lang")
    },

    // ICEBERG interop, oracled end-to-end (VERDICT r16 item 2 — the
    // q_delta_roundtrip shape on the sibling format): commit a partitioned
    // gold table, export the snapshot as Iceberg v2 metadata (metadata.json
    // + manifest-list/manifest Avro referencing the parquet in place, no
    // data copy), read it back through the metadata chain, and oracle the
    // values cross-engine. Any drift in the export's schema/partition
    // encoding or the read's chain resolution breaks the hash.
    sql("q_iceberg_roundtrip",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import s.implicits._
      val gold = Tables.documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), round(avg($"n_chars"), 2).as("avg_chars"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val table = s"${sys.props("java.io.tmpdir")}/graft-iceberg-$key/gold"
      graft.sinks.Snapshots.commitPartitioned(gold, table, Seq("lang"),
        org.apache.spark.sql.SaveMode.Overwrite)
      graft.sinks.IcebergExport.export(s, table)
      graft.sinks.IcebergExport.read(s, table)
        .select($"lang", $"n_docs", $"avg_chars")
        .orderBy($"lang")
    },

    // FOREIGN-metadata conformance for Iceberg (the q_delta_foreign
    // discipline on the sibling format): the metadata chain here is
    // authored BY HAND in the legacy v1 shape a real external writer
    // produces and IcebergExport.export never does — format-version 1
    // with the bare "schema" / legacy "partition-spec" keys, an older
    // snapshot carrying an INLINE "manifests" array (no manifest-list
    // file), the current snapshot's manifest list in v1 Avro (no
    // content/sequence fields), TWO manifests (EXISTING + ADDED status
    // codes split across them), a status=2 DELETED entry referencing a
    // real decoy file holding WRONG rows (a reader that fails to skip
    // deletions reads them and breaks the hash), and a STALE
    // version-hint pointing below the newest metadata (the listing must
    // win). Oracle recomputes from raw documents.
    sql("q_iceberg_foreign",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM documents WHERE doc_id % 2 = 1 GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).filter($"doc_id" % 2 === 1)
        .select($"doc_id".cast("long").as("doc_id"),
          $"n_chars".cast("int").as("n_chars"), $"lang")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val t = s"${sys.props("java.io.tmpdir")}/graft-icebergforeign-$key/t"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(t))
      docs.repartition($"lang").write.partitionBy("lang").parquet(t)
      // the decoy: REAL parquet holding the WRONG half of the data — its
      // manifest entry is status=2 DELETED, so a correct reader never
      // touches it and a broken one changes the aggregate
      Tables.documents(s, d).filter($"doc_id" % 2 === 0)
        .select($"doc_id".cast("long").as("doc_id"),
          $"n_chars".cast("int").as("n_chars"))
        .coalesce(1).write.parquet(s"$t/decoy")
      val leafs = new java.io.File(t).listFiles().filter(_.getName.startsWith("lang="))
        .sortBy(_.getName).toSeq.flatMap { dir =>
          dir.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
            .map(pf => (pf.toURI.toString, dir.getName.stripPrefix("lang="), pf.length()))
        }
      val decoy = new java.io.File(s"$t/decoy").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toURI.toString
      require(leafs.size >= 2, s"foreign fixture needs >= 2 files, got ${leafs.size}")
      val (firstHalf, secondHalf) = leafs.splitAt(leafs.size / 2)
      // v1 Avro schemas — no content / sequence-number fields, exactly
      // what a v1 writer serializes
      val parser = new org.apache.avro.Schema.Parser()
      val listV1 = parser.parse(
        """{"type":"record","name":"manifest_file","fields":[
          |{"name":"manifest_path","type":"string"},
          |{"name":"manifest_length","type":"long"},
          |{"name":"partition_spec_id","type":"int"},
          |{"name":"added_snapshot_id","type":["null","long"],"default":null}
          |]}""".stripMargin.replaceAll("\n", ""))
      val entryV1 = parser.parse(
        """{"type":"record","name":"manifest_entry","fields":[
          |{"name":"status","type":"int"},
          |{"name":"snapshot_id","type":["null","long"],"default":null},
          |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |{"name":"file_path","type":"string"},
          |{"name":"file_format","type":"string"},
          |{"name":"partition","type":{"type":"record","name":"r102","fields":[
          |{"name":"lang","type":["null","string"],"default":null}]}},
          |{"name":"record_count","type":"long"},
          |{"name":"file_size_in_bytes","type":"long"}
          |]}}]}""".stripMargin.replaceAll("\n", ""))
      val metaDir = new java.io.File(s"$t/metadata"); metaDir.mkdirs()
      def writeAvro(name: String, schema: org.apache.avro.Schema,
          recs: Seq[org.apache.avro.generic.GenericRecord]): String = {
        val fl = new java.io.File(metaDir, name)
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](schema))
        w.create(schema, fl)
        recs.foreach(w.append)
        w.close()
        fl.toURI.toString
      }
      def entry(status: Int, path: String, lang: String, len: Long) = {
        val p = new org.apache.avro.generic.GenericData.Record(
          entryV1.getField("data_file").schema().getField("partition").schema())
        p.put("lang", lang)
        val df = new org.apache.avro.generic.GenericData.Record(
          entryV1.getField("data_file").schema())
        df.put("file_path", path)
        df.put("file_format", "PARQUET")
        df.put("partition", p)
        df.put("record_count", 0L) // v1 writers of unknown provenance: unused by scan
        df.put("file_size_in_bytes", len)
        val e = new org.apache.avro.generic.GenericData.Record(entryV1)
        e.put("status", status)
        e.put("snapshot_id", 20L)
        e.put("data_file", df)
        e
      }
      // snapshot 10 (old): firstHalf only, referenced INLINE (no list file)
      val m0 = writeAvro("m0.avro", entryV1,
        firstHalf.map { case (p, l, len) => entry(1, p, l, len) })
      // snapshot 20 (current): m1 = firstHalf EXISTING + the decoy DELETED;
      // m2 = secondHalf ADDED — final live set is every real file
      val m1 = writeAvro("m1.avro", entryV1,
        firstHalf.map { case (p, l, len) => entry(0, p, l, len) } :+
          entry(2, decoy, "en", 1L))
      val m2 = writeAvro("m2.avro", entryV1,
        secondHalf.map { case (p, l, len) => entry(1, p, l, len) })
      def listEntry(path: String) = {
        val r = new org.apache.avro.generic.GenericData.Record(listV1)
        r.put("manifest_path", path)
        r.put("manifest_length", new java.io.File(new java.net.URI(path)).length())
        r.put("partition_spec_id", 0)
        r.put("added_snapshot_id", 20L)
        r
      }
      val ml = writeAvro("snap-20.avro", listV1, Seq(listEntry(m1), listEntry(m2)))
      val schemaJson =
        """{"type":"struct","fields":[
          |{"id":1,"name":"doc_id","required":false,"type":"long"},
          |{"id":2,"name":"n_chars","required":false,"type":"int"},
          |{"id":3,"name":"lang","required":false,"type":"string"}
          |]}""".stripMargin.replaceAll("\n", "")
      val specJson =
        """[{"name":"lang","transform":"identity","source-id":3,"field-id":1000}]"""
      def metadata(v: Int, snapsJson: String, current: Long): Unit = {
        val body =
          s"""{"format-version":1,"table-uuid":"graft-foreign-iceberg",
             |"location":"$t","last-updated-ms":1,"last-column-id":3,
             |"schema":$schemaJson,"partition-spec":$specJson,
             |"properties":{},"current-snapshot-id":$current,
             |"snapshots":$snapsJson}""".stripMargin.replaceAll("\n", "")
        java.nio.file.Files.write(metaDir.toPath.resolve(s"v$v.metadata.json"),
          body.getBytes("UTF-8")); ()
      }
      val snap10 = s"""{"snapshot-id":10,"timestamp-ms":1,"manifests":[${
        firstHalf.map(_ => s""""$m0"""").distinct.mkString(",")}]}"""
      val snap20 = s"""{"snapshot-id":20,"timestamp-ms":2,"manifest-list":"$ml"}"""
      metadata(1, s"[$snap10]", 10L)
      metadata(2, s"[$snap10,$snap20]", 20L)
      // STALE version-hint: points at v1 while v2 exists — listing wins
      java.nio.file.Files.write(metaDir.toPath.resolve("version-hint.text"),
        "1".getBytes("UTF-8"))
      graft.sinks.IcebergExport.read(s, t)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), round(avg($"n_chars"), 2).as("avg_chars"))
        .orderBy($"lang")
    },

    // FOREIGN-log conformance, oracled end-to-end (round-16 item 5): the
    // Delta log here is authored BY HAND, not by DeltaExport.export — a
    // stand-in for an external writer, exercising protocol-legal shapes
    // the engine's own exporter never produces: action order inside the
    // first commit reversed (adds BEFORE protocol/metaData), a file
    // removed in one version and RE-ADDED in a later one, and adds split
    // across three commits. The reader must reconcile per-version replay
    // to exactly the full live set; the oracle recomputes the expected
    // aggregate from the raw documents table, so any mis-resolved file
    // (dropped, doubled, or stale) breaks the hash.
    sql("q_delta_foreign",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM documents WHERE doc_id % 2 = 0 GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"n_chars", $"lang")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val t = s"${sys.props("java.io.tmpdir")}/graft-deltaforeign-$key/t"
      // the fixture IS the input: rebuild deterministically every run
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(t))
      docs.repartition($"lang").write.partitionBy("lang").parquet(t)
      // enumerate the hive-laid-out data files (bounded: one per lang)
      val leafs = new java.io.File(t).listFiles().filter(_.getName.startsWith("lang="))
        .sortBy(_.getName).toSeq.flatMap { dir =>
          dir.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
            .map(pf => (s"${dir.getName}/${pf.getName}",
              dir.getName.stripPrefix("lang="), pf.length(), pf.lastModified()))
        }
      require(leafs.size >= 2, s"foreign fixture needs >= 2 files, got ${leafs.size}")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def add(fi: (String, String, Long, Long)): String = {
        val n = mapper.createObjectNode()
        val a = n.putObject("add")
        a.put("path", fi._1) // plain lang values: percent-encoding is identity
        a.putObject("partitionValues").put("lang", fi._2)
        a.put("size", fi._3)
        a.put("modificationTime", fi._4)
        a.put("dataChange", true)
        mapper.writeValueAsString(n)
      }
      def remove(path: String): String =
        s"""{"remove":{"path":"$path","deletionTimestamp":1,"dataChange":true}}"""
      val metaN = mapper.createObjectNode()
      val m = metaN.putObject("metaData")
      m.put("id", "graft-foreign-fixture")
      m.putObject("format").put("provider", "parquet").putObject("options")
      m.put("schemaString", docs.schema.json)
      m.putArray("partitionColumns").add("lang")
      m.putObject("configuration")
      m.put("createdTime", 1L)
      val logDir = new java.io.File(s"$t/_delta_log")
      logDir.mkdirs()
      def commit(v: Long, lines: Seq[String]): Unit = {
        java.nio.file.Files.write(logDir.toPath.resolve(f"$v%020d.json"),
          (lines.mkString("\n") + "\n").getBytes("UTF-8")); ()
      }
      val (firstHalf, secondHalf) = leafs.splitAt(leafs.size / 2)
      // v0: adds FIRST, protocol and metaData after — legal, never exported
      commit(0L, firstHalf.map(add) ++ Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        mapper.writeValueAsString(metaN)))
      // v1: drop the first file, add the second half
      commit(1L, remove(firstHalf.head._1) +: secondHalf.map(add))
      // v2: re-add the dropped file — final live set = every file
      commit(2L, Seq(add(firstHalf.head)))
      graft.sinks.DeltaExport.read(s, t)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), round(avg($"n_chars"), 2).as("avg_chars"))
        .orderBy($"lang")
    },
  )
}
