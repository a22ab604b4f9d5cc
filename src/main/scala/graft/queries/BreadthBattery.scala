package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Operator-breadth battery: generators, unpivot, map functions, exact
  * percentiles, string distance, distribution windows, null-safe equality,
  * bitwise/radix scalars, boolean aggregates. All shapes a lakehouse SQL
  * surface is expected to cover beyond the reference's §2 inventory, each
  * oracled against DuckDB.
  *
  * Scale notes mirror the rest of the engine: every aggregate here is
  * algebraic (map-side partials), the generators fan out bounded row counts
  * per input row, and windows partition on real keys — no global windows.
  */
object BreadthBattery {
  import QueryDef._

  val all: Seq[QueryDef] = Seq(

    // Generator/UNNEST: explode whitespace tokens, global top-50 words.
    // Two-phase hash agg under the explode keeps the shuffle at
    // |distinct words| not |tokens|.
    sql("q_explode_tokens",
      """SELECT word, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |      FROM documents)
        |WHERE len(word) > 0
        |GROUP BY 1 ORDER BY n DESC, word LIMIT 50""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(split(lower($"text"), "\\s+")).as("word"))
        .filter(length($"word") > 0)
        .groupBy($"word")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word")
        .limit(50)
    },

    // UNPIVOT / melt: wide per-flag aggregates to (flag, metric, value).
    sql("q_unpivot",
      """WITH t AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS sq,
        |    round(sum(l_extendedprice), 2) AS sp
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value
        |FROM t UNPIVOT (value FOR metric IN (sq, sp))
        |ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(round(sum($"l_quantity"), 2).as("sq"),
          round(sum($"l_extendedprice"), 2).as("sp"))
        .unpivot(Array($"l_returnflag"), Array($"sq", $"sp"), "metric", "value")
        .orderBy($"l_returnflag", $"metric")
    },

    // Map construction + lookup + transform_values; map-typed outputs are
    // serialized to scalars/strings (driver compare sorts rows in pandas).
    sql("q_map_funcs",
      """SELECT o_orderkey,
        |  o_orderpriority AS prio_val,
        |  upper(o_orderstatus) AS status_up,
        |  2 AS n_keys,
        |  'status,prio' AS keys,
        |  concat(o_orderstatus, ',', o_orderpriority) AS vals
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin) { (s, d) =>
      import s.implicits._
      val m = map(lit("status"), $"o_orderstatus", lit("prio"), $"o_orderpriority")
      Tables.orders(s, d)
        .select($"o_orderkey",
          element_at(m, "prio").as("prio_val"),
          element_at(transform_values(m, (_, v) => upper(v)), "status").as("status_up"),
          size(m).as("n_keys"),
          array_join(map_keys(m), ",").as("keys"),
          array_join(map_values(m), ",").as("vals"))
        .orderBy($"o_orderkey")
        .limit(200)
    },

    // Exact percentiles: linear-interpolation quantiles + median per group.
    sql("q_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(median(l_quantity), 4) AS med_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"))
        .orderBy($"l_returnflag")
    },

    // NTILE curriculum bins: equal-frequency quartiles of document length
    // WITHIN each language (the per-difficulty buckets a curriculum-ordered
    // training run samples from). The window partitions by lang — ntile
    // never sees a global order, so the bucketing parallelizes per language;
    // the (n_chars, doc_id) order key makes tile assignment deterministic
    // under length ties.
    sql("q_ntile_curriculum",
      """SELECT lang, CAST(quartile AS INT) AS quartile, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM (SELECT lang, n_chars,
        |        NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS quartile
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
      Tables.documents(s, d)
        .select($"lang", $"n_chars", ntile(4).over(w).as("quartile"))
        .groupBy($"lang", $"quartile")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
        .orderBy($"lang", $"quartile")
    },

    // Modal value per group with a DETERMINISTIC tie rule (smallest modal
    // value wins) — Spark's native mode() and DuckDB's mode() both leave
    // ties unspecified, so the portable form is count → windowed max →
    // min-among-modes, which the oracle states identically.
    sql("q_mode",
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, round(min(l_quantity), 2) AS mode_qty,
        |  CAST(max(cnt) AS BIGINT) AS mode_n
        |FROM (SELECT *, max(cnt) OVER (PARTITION BY l_returnflag) AS mx FROM c) t
        |WHERE cnt = mx GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val c = Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("cnt"))
      c.withColumn("mx", max($"cnt").over(Window.partitionBy($"l_returnflag")))
        .filter($"cnt" === $"mx")
        .groupBy($"l_returnflag")
        .agg(round(min($"l_quantity"), 2).as("mode_qty"), max($"cnt").as("mode_n"))
        .orderBy($"l_returnflag")
    },

    // Corpus profile per language — the doc-pipeline shape of the same
    // exact-percentile machinery.
    sql("q_doc_profile",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  round(quantile_cont(n_chars, 0.5), 1) AS med_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg($"n_chars"), 2).as("avg_chars"),
          min($"n_chars").cast("long").as("min_chars"),
          max($"n_chars").cast("long").as("max_chars"),
          round(expr("percentile(n_chars, 0.5)"), 1).as("med_chars"))
        .orderBy($"lang")
    },

    // Edit distance + affix predicates.
    sql("q_string_distance",
      """SELECT c_custkey,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev,
        |  starts_with(c_name, 'Customer') AS sw,
        |  ends_with(c_mktsegment, 'RY') AS ew,
        |  contains(c_mktsegment, 'O') AS has_o
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_custkey",
          levenshtein($"c_mktsegment", lit("BUILDING")).cast("int").as("lev"),
          $"c_name".startsWith("Customer").as("sw"),
          $"c_mktsegment".endsWith("RY").as("ew"),
          $"c_mktsegment".contains("O").as("has_o"))
        .orderBy($"c_custkey")
        .limit(300)
    },

    // Distribution windows: ntile / percent_rank / cume_dist / nth_value.
    // The (totalprice, orderkey) ordering is a total order, so peer groups
    // are single rows on both engines.
    sql("q_window_dist",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select($"o_orderkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value($"o_orderkey", 2).over(wFull).as("second_key"))
        .orderBy($"o_orderkey")
        .limit(500)
    },

    // first/last with IGNORE NULLS over an explicit full frame.
    sql("q_first_last_window",
      """SELECT o_orderkey,
        |  first_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER w AS first_closed,
        |  last_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER w AS last_closed,
        |  nth_value(o_orderkey, 3) OVER w AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      val statusN = nullif($"o_orderstatus", lit("O"))
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select($"o_orderkey",
          first(statusN, ignoreNulls = true).over(w).as("first_closed"),
          last(statusN, ignoreNulls = true).over(w).as("last_closed"),
          nth_value($"o_orderkey", 3).over(w).as("third_key"))
        .orderBy($"o_orderkey")
        .limit(500)
    },

    // sequence + explode: bounded per-row fan-out, re-aggregated.
    sql("q_sequence_explode",
      """SELECT step,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM (SELECT o_orderkey,
        |        unnest(generate_series(1, o_orderkey % 3 + 1)) AS step
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey",
          explode(sequence(lit(1L), ($"o_orderkey" % 3) + 1)).as("step"))
        .groupBy($"step")
        .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
        .orderBy($"step")
    },

    // Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain equality;
    // the plain-equality result is cast to INT so the nullable column stays
    // pandas-sortable in the driver compare.
    sql("q_null_safe_eq",
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS nseq_f,
        |  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS nseq_null,
        |  CAST(CASE WHEN nullif(o_orderstatus, 'O') = 'F' THEN 1
        |       WHEN NOT nullif(o_orderstatus, 'O') = 'F' THEN 0 END AS INT) AS eq_f
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      val statusN = nullif($"o_orderstatus", lit("O"))
      Tables.orders(s, d)
        .select($"o_orderkey",
          statusN.eqNullSafe(lit("F")).as("nseq_f"),
          statusN.eqNullSafe(lit(null).cast("string")).as("nseq_null"),
          when(statusN === "F", 1).when(!(statusN === "F"), 0)
            .cast("int").as("eq_f"))
        .orderBy($"o_orderkey")
        .limit(500)
    },

    // Bitwise scalar surface + radix conversion.
    sql("q_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS k_and,
        |  o_orderkey | 16 AS k_or,
        |  xor(o_orderkey, 96) AS k_xor,
        |  o_orderkey << 2 AS k_shl,
        |  o_orderkey >> 1 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS k_bits,
        |  hex(o_orderkey) AS k_hex
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey",
          $"o_orderkey".bitwiseAND(lit(255L)).as("k_and"),
          $"o_orderkey".bitwiseOR(lit(16L)).as("k_or"),
          $"o_orderkey".bitwiseXOR(lit(96L)).as("k_xor"),
          shiftleft($"o_orderkey", 2).as("k_shl"),
          shiftright($"o_orderkey", 1).as("k_shr"),
          bit_count($"o_orderkey").cast("int").as("k_bits"),
          hex($"o_orderkey").as("k_hex"))
        .orderBy($"o_orderkey")
        .limit(500)
    },

    // Regexp surface: global replace, match count, boolean match, group
    // extract. Spark regexp_replace is global by default = DuckDB 'g' flag.
    sql("q_regexp",
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
        |  CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits,
        |  regexp_matches(c_name, '^Customer') AS is_customer,
        |  regexp_extract(c_name, '([0-9]{3})$', 1) AS last3
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_custkey",
          regexp_replace($"c_name", "[0-9]+", "#").as("masked"),
          regexp_count($"c_name", lit("[0-9]")).cast("int").as("n_digits"),
          $"c_name".rlike("^Customer").as("is_customer"),
          regexp_extract($"c_name", "([0-9]{3})$", 1).as("last3"))
        .orderBy($"c_custkey")
        .limit(300)
    },

    // Datetime construction + epoch extraction from component values.
    sql("q_datetime_construct",
      """SELECT o_orderkey,
        |  make_date(1995, CAST(o_orderkey % 12 + 1 AS INT), CAST(o_orderkey % 28 + 1 AS INT)) AS d,
        |  make_timestamp(1995, CAST(o_orderkey % 12 + 1 AS INT), CAST(o_orderkey % 28 + 1 AS INT),
        |    CAST(o_orderkey % 24 AS INT), CAST(o_orderkey % 60 AS INT), 0.0) AS t,
        |  CAST(date_part('epoch', make_timestamp(1995, CAST(o_orderkey % 12 + 1 AS INT),
        |    CAST(o_orderkey % 28 + 1 AS INT), CAST(o_orderkey % 24 AS INT),
        |    CAST(o_orderkey % 60 AS INT), 0.0)) AS BIGINT) AS epoch_s,
        |  CAST(date_part('doy', o_orderdate) AS INT) AS doy
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, d) =>
      import s.implicits._
      val mo = ($"o_orderkey" % 12 + 1).cast("int")
      val dy = ($"o_orderkey" % 28 + 1).cast("int")
      val hr = ($"o_orderkey" % 24).cast("int")
      val mi = ($"o_orderkey" % 60).cast("int")
      val ts = make_timestamp(lit(1995), mo, dy, hr, mi, lit(0.0))
      Tables.orders(s, d)
        .select($"o_orderkey",
          make_date(lit(1995), mo, dy).as("d"),
          ts.as("t"),
          unix_timestamp(ts).as("epoch_s"),
          dayofyear($"o_orderdate").as("doy"))
        .orderBy($"o_orderkey")
        .limit(300)
    },

    // Tumbling event-time windows in batch: Spark's window() buckets are
    // epoch-aligned, as are DuckDB's time_bucket boundaries for intervals
    // that divide a day — identical bucketing, no streaming machinery.
    sql("q_tumbling_window",
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select($"w.start".as("bucket"), $"n", $"sum_value")
        .orderBy($"bucket")
    },

    // Calendar gap-fill: a generated day series LEFT-joined to per-day
    // order counts — absent days surface as zero instead of silently
    // missing rows (the broadcast side is the 31-row series).
    sql("q_gap_fill",
      """SELECT CAST(d.day AS DATE) AS day,
        |  CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
        |FROM (SELECT unnest(generate_series(DATE '1995-03-01', DATE '1995-03-31',
        |        INTERVAL 1 DAY)) AS day) d
        |LEFT JOIN (SELECT o_orderdate, count(*) AS n FROM orders GROUP BY 1) o
        |  ON CAST(d.day AS DATE) = o.o_orderdate
        |ORDER BY day""".stripMargin) { (s, d) =>
      import s.implicits._
      val days = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1995-03-01")),
        lit(java.sql.Date.valueOf("1995-03-31")),
        expr("INTERVAL 1 DAY"))).as("day"))
      val counts = Tables.orders(s, d)
        .groupBy($"o_orderdate").agg(count(lit(1)).as("n"))
      days.join(counts, $"day" === $"o_orderdate", "left")
        .select($"day", coalesce($"n", lit(0L)).as("n_orders"))
        .orderBy($"day")
    },

    // Connected components as dup clustering: chain edges within groups of
    // an identical profile key (the stand-in for near-dup candidate pairs,
    // whose engine hashes are not oracle-expressible), min-label propagated
    // to a fixpoint. Oracle = the closed-form min-per-group, which the
    // iterative algorithm must reproduce exactly.
    sql("q_dup_clusters",
      """SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
        |FROM (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY k) AS cluster_id,
        |        count(*) OVER (PARTITION BY k) AS c
        |      FROM (SELECT doc_id,
        |              lang || '|' || source || '|' || CAST(n_chars % 20 AS VARCHAR) AS k
        |            FROM documents))
        |WHERE c > 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val keyed = Tables.documents(s, d).select($"doc_id",
        concat_ws("|", $"lang", $"source", ($"n_chars" % 20).cast("string")).as("k"))
      val w = Window.partitionBy($"k").orderBy($"doc_id")
      val edges = keyed
        .withColumn("prev", lag($"doc_id", 1).over(w))
        .filter($"prev".isNotNull)
        .select($"prev".as("src"), $"doc_id".as("dst"))
      graft.ext.Components.connectedComponents(edges)
        .select($"id".as("doc_id"), $"component".as("cluster_id"))
        .orderBy($"doc_id")
    },

    // Salted join on an extreme-skew key (3 distinct values): every fact row
    // of a hot key spreads over `salts` reducers; oracle = the plain join.
    sql("q_salted_join",
      """WITH dim AS (SELECT DISTINCT l_returnflag, 'flag-' || l_returnflag AS label
        |             FROM lineitem)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN dim USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val dim = li.select($"l_returnflag").distinct()
        .withColumn("label", concat(lit("flag-"), $"l_returnflag"))
      graft.ops.SkewJoin.saltedInnerJoin(li, dim, Seq("l_returnflag"), salts = 8)
        .groupBy($"label")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("revenue"))
        .orderBy($"label")
    },

    // TF-IDF top terms per document: corpus-wide document frequency joined
    // back to per-doc term frequency — tf shuffles on (doc, word), df on
    // word, the doc-count is a broadcast scalar; all aggregates algebraic.
    sql("q_tfidf",
      """WITH tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE len(word) > 0),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, word, tfidf, rank FROM (
        |  SELECT doc_id, word,
        |    round(tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC, word) AS INT) AS rank
        |  FROM tf JOIN df USING (word) CROSS JOIN n
        |  WHERE doc_id < 50)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tok = docs
        .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("word"))
        .filter(length($"word") > 0)
      val tf = tok.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
      val dfq = tok.groupBy($"word").agg(countDistinct($"doc_id").as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val score = $"tf" * log($"n".cast("double") / $"df")
      val w = Window.partitionBy($"doc_id").orderBy(score.desc, $"word")
      tf.join(dfq, "word")
        .crossJoin(broadcast(n))
        .filter($"doc_id" < 50)
        .select($"doc_id", $"word", round(score, 6).as("tfidf"),
          row_number().over(w).as("rank"))
        .filter($"rank" <= 3)
        .orderBy($"doc_id", $"rank")
    },

    // Deterministic hash split (train/test): md5-prefix bucketing is stable
    // across engines, runs, and partitionings — the right way to split a
    // 100 TB corpus (no RNG, no sampling state).
    sql("q_hash_sample",
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
        |       THEN 'train' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(
          when(substring(md5($"doc_id".cast("string")), 1, 1) < "d", "train")
            .otherwise("test").as("split"),
          $"n_chars")
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), round(avg($"n_chars"), 4).as("avg_chars"))
        .orderBy($"split")
    },

    // Deterministic corpus shuffle + sharding — the "shuffle before
    // packing" step of a training-data pipeline: every doc gets a stable
    // pseudo-random position from its md5 (no RNG, reproducible across
    // engines, runs, and partitionings), sharded so ordering is a per-shard
    // window, never a global sort. Shard = first TWO hex chars (256
    // shards; the prefix width is the scale knob — each added char splits
    // 16× more, so a 100 TB corpus picks 3-4 chars to keep one shard's
    // sort in-memory); position = rank of the hex hash WITHIN the shard
    // (fixed-width hex compares lexicographically = numerically, so both
    // engines rank identically; doc_id breaks md5-prefix ties).
    sql("q_corpus_shuffle",
      """WITH h AS (
        |  SELECT doc_id, substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hv
        |  FROM documents)
        |SELECT CAST((strpos('0123456789abcdef', substr(hv, 1, 1)) - 1) * 16
        |    + strpos('0123456789abcdef', substr(hv, 2, 1)) - 1 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY substr(hv, 1, 2) ORDER BY hv, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM h ORDER BY shard, pos""".stripMargin) { (s, d) =>
      import s.implicits._
      val hv = substring(md5(concat(lit("shuf:"), $"doc_id".cast("string"))), 1, 8)
      Tables.documents(s, d)
        .select($"doc_id", hv.as("hv"))
        .select(
          ((expr("instr('0123456789abcdef', substring(hv, 1, 1))") - 1) * 16 +
            expr("instr('0123456789abcdef', substring(hv, 2, 1))") - 1)
            .cast("int").as("shard"),
          row_number().over(
            Window.partitionBy(substring($"hv", 1, 2)).orderBy($"hv", $"doc_id"))
            .cast("long").as("pos"),
          $"doc_id")
        .orderBy($"shard", $"pos")
    },

    // FULL OUTER join of two aggregates with coalesced keys.
    sql("q_outer_join",
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS no
        |           FROM orders
        |           WHERE CAST(o_orderdate AS DATE)
        |             BETWEEN DATE '1995-03-01' AND DATE '1995-03-31' GROUP BY 1),
        |     l AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS nl
        |           FROM lineitem
        |           WHERE CAST(l_shipdate AS DATE)
        |             BETWEEN DATE '1995-03-01' AND DATE '1995-03-31' GROUP BY 1)
        |SELECT COALESCE(o.d, l.d) AS day,
        |  CAST(COALESCE(no, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(nl, 0) AS BIGINT) AS n_ships
        |FROM o FULL OUTER JOIN l ON o.d = l.d
        |ORDER BY day""".stripMargin) { (s, d) =>
      import s.implicits._
      def inWindow(c: org.apache.spark.sql.Column) =
        c.between(lit(java.sql.Date.valueOf("1995-03-01")), lit(java.sql.Date.valueOf("1995-03-31")))
      val o = Tables.orders(s, d)
        .select($"o_orderdate".cast("date").as("od"))
        .filter(inWindow($"od"))
        .groupBy($"od").agg(count(lit(1)).as("no"))
      val l = Tables.lineitem(s, d)
        .select($"l_shipdate".cast("date").as("ld"))
        .filter(inWindow($"ld"))
        .groupBy($"ld").agg(count(lit(1)).as("nl"))
      o.join(l, $"od" === $"ld", "full_outer")
        .select(coalesce($"od", $"ld").as("day"),
          coalesce($"no", lit(0L)).as("n_orders"),
          coalesce($"nl", lit(0L)).as("n_ships"))
        .orderBy($"day")
    },

    // Cartesian product of two small dims (the one join shape where a
    // cross join is legitimate — both sides tiny).
    sql("q_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.table(s, d, "region").select($"r_name")
        .crossJoin(Tables.table(s, d, "nation").select($"n_name"))
        .orderBy($"r_name", $"n_name")
    },

    // RANGE frame over event-time values (not row counts): trailing-30-day
    // revenue per customer. The Spark side orders by day number with a
    // value-range frame — identical peer/frame semantics to the interval
    // RANGE frame DuckDB runs.
    sql("q_range_frame",
      """SELECT o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE)
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2) AS rev_30d
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy(unix_date($"o_orderdate".cast("date")))
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, d)
        .select($"o_orderkey",
          round(sum($"o_totalprice").over(w), 2).as("rev_30d"))
        .orderBy($"o_orderkey")
        .limit(500)
    },

    // Incremental aggregate maintenance: per-half partials merged =
    // the direct aggregate (the oracle computes it directly) — the
    // partial/final algebra applied ACROSS job runs.
    sql("q_incremental_agg",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val old = li.filter($"l_orderkey" % 2 === 0)
      val delta = li.filter($"l_orderkey" % 2 =!= 0)
      graft.ops.IncrementalAgg.merge(Seq("l_returnflag"),
          graft.ops.IncrementalAgg.partial(old, Seq("l_returnflag"), "l_extendedprice"),
          graft.ops.IncrementalAgg.partial(delta, Seq("l_returnflag"), "l_extendedprice"))
        .select($"l_returnflag", $"n",
          round($"sum_l_extendedprice", 2).as("sum_price"),
          round($"min_l_extendedprice", 2).as("min_price"),
          round($"max_l_extendedprice", 2).as("max_price"))
        .orderBy($"l_returnflag")
    },

    // Stratified sampling: exactly 10 docs per language, selected by a
    // deterministic hash order (md5 of the id) — reproducible across
    // engines, runs, and partitionings, unlike TABLESAMPLE/rand().
    sql("q_stratified_sample",
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      Tables.documents(s, d)
        .select($"lang", $"doc_id", row_number().over(w).as("rn"))
        .filter($"rn" <= 10)
        .select($"lang", $"doc_id")
        .orderBy($"lang", $"doc_id")
    },

    // Bloom-pruned semi join: the big side is pre-filtered MAP-SIDE by a
    // ~10-bit/key sketch of the small side's keys before any shuffle; the
    // exact join removes the sketch's false positives, so the result (and
    // the oracle) is the plain semi join.
    sql("q_bloom_semi_join",
      """SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        |FROM lineitem WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)""".stripMargin) { (s, d) =>
      import s.implicits._
      val pricey = Tables.orders(s, d)
        .filter($"o_totalprice" > 400000).select($"o_orderkey")
      graft.ops.Sketches.bloomSemiJoin(
          Tables.lineitem(s, d), pricey, "l_orderkey", "o_orderkey",
          expectedKeys = 100000)
        .agg(count(lit(1)).as("n"), sum($"l_orderkey").as("key_sum"))
    },

    // Two-pass exact heavy hitters: count-min candidates (never undercounts
    // → no true hitter lost), exact counts on the candidate set only. The
    // oracle is the exact GROUP BY HAVING the sketch plan must reproduce.
    sql("q_heavy_hitters",
      """SELECT k, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT CAST(l_suppkey AS VARCHAR) AS k FROM lineitem)
        |GROUP BY 1 HAVING count(*) >= 25 ORDER BY k""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.ops.Sketches.heavyHitters(
          Tables.lineitem(s, d), "l_suppkey", threshold = 25)
        .orderBy($"k")
    },

    // Native session_window in batch: dynamic gap-merged event-time
    // sessions as ONE groupBy — no lag/running-sum window chain. The
    // oracle rebuilds the same sessions with gap logic (break at
    // diff >= gap, matching session_window's half-open [start, last+gap)).
    sql("q_session_window",
      """WITH s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 300000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(session_window($"ts", "5 minutes"), $"user_id")
        .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .orderBy($"user_id", $"session_start")
    },

    // ANSI-safe arithmetic: the try_* family returns null where ANSI mode
    // would raise (divide by zero, overflow, bad parse).
    sql("q_try_arith",
      """SELECT o_orderkey,
        |  o_totalprice / NULLIF(o_orderkey % 10, 0) AS safe_div,
        |  CAST(NULL AS BIGINT) AS overflow_add,
        |  TRY_CAST(o_orderpriority AS DOUBLE) AS bad_parse,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey",
          try_divide($"o_totalprice", $"o_orderkey" % 10).as("safe_div"),
          try_add(lit(Long.MaxValue), $"o_orderkey" + 1).as("overflow_add"),
          expr("try_cast(o_orderpriority AS DOUBLE)").as("bad_parse"),
          expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").as("prio_num"))
        .orderBy($"o_orderkey")
        .limit(300)
    },

    // from_csv: scalar CSV parsing of an embedded delimited column.
    sql("q_from_csv",
      """SELECT o_orderkey,
        |  string_split(csv_line, ',')[1] AS f_status,
        |  TRY_CAST(string_split(csv_line, ',')[2] AS DOUBLE) AS f_price,
        |  string_split(csv_line, ',')[3] AS f_prio
        |FROM (SELECT o_orderkey,
        |        o_orderstatus || ',' || CAST(round(o_totalprice, 2) AS VARCHAR)
        |          || ',' || o_orderpriority AS csv_line
        |      FROM orders)
        |ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, d) =>
      import s.implicits._
      val line = concat_ws(",", $"o_orderstatus",
        round($"o_totalprice", 2).cast("string"), $"o_orderpriority")
      Tables.orders(s, d)
        .select($"o_orderkey", from_csv(line,
          org.apache.spark.sql.types.StructType.fromDDL(
            "f_status STRING, f_price DOUBLE, f_prio STRING"),
          Map.empty[String, String]).as("p"))
        .select($"o_orderkey", $"p.f_status", $"p.f_price", $"p.f_prio")
        .orderBy($"o_orderkey")
        .limit(300)
    },

    // VariantType (Spark 4): parse once into the binary variant encoding,
    // extract typed paths with variant_get — the schema-flexible column
    // type for semi-structured data at scale (no per-query JSON re-parse).
    sql("q_variant",
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  (CAST(json_extract(props, '$.k') AS INT) > 50) AS k_big
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin) { (s, d) =>
      import s.implicits._
      val v = parse_json($"props")
      Tables.events(s, d)
        .select($"event_id",
          variant_get(v, "$.k", "int").as("k_int"),
          (variant_get(v, "$.k", "bigint") % 10).as("k_mod"),
          (variant_get(v, "$.k", "int") > 50).as("k_big"))
        .orderBy($"event_id")
        .limit(500)
    },

    // Boolean aggregates: bool_and / bool_or / count_if per group.
    sql("q_bool_agg",
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.05) AS any_disc,
        |  CAST(count_if(l_tax = 0) AS BIGINT) AS n_taxfree
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          bool_and($"l_quantity" > 0).as("all_pos"),
          bool_or($"l_discount" > 0.05).as("any_disc"),
          count_if($"l_tax" === 0).as("n_taxfree"))
        .orderBy($"l_returnflag")
    },

    // Ordered event funnel: view → click-after-view → purchase-after-click.
    // Each stage is one keyed min-aggregate plus an equi-join on user_id —
    // the shuffle key stays user_id throughout, so at 100 TB this is three
    // co-partitioned hash aggs, not a per-user sort of all events.
    // Timestamps compare at µs (epoch_us) to match Spark's micros.
    sql("q_funnel",
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2 GROUP BY 1)
        |SELECT stage, n_users FROM (
        |  SELECT 1 AS ord, 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |  UNION ALL
        |  SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p)
        |ORDER BY ord""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"event_type",
        unix_micros($"ts").as("us"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"us").as("t1"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"us" > $"t1")
        .groupBy($"user_id").agg(min($"us").as("t2"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"us" > $"t2")
        .groupBy($"user_id").agg(min($"us").as("t3"))
      v.agg(count(lit(1)).as("n_users")).select(lit(1).as("ord"), lit("view").as("stage"), $"n_users")
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("ord"), lit("view>click").as("stage"), $"n_users"))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("ord"), lit("view>click>purchase").as("stage"), $"n_users"))
        .orderBy($"ord").select($"stage", $"n_users")
    },

    // Weekly cohort retention: cohort = ISO week of first activity, cell =
    // distinct users active k weeks later. Two keyed aggregates and one
    // user_id equi-join; the distinct lands on (cohort, week, user) — all
    // map-side partial-aggregable.
    sql("q_retention",
      """WITH first AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events)
        |SELECT f.cohort, CAST(datediff('day', f.cohort, a.wk) // 7 AS INT) AS week_n,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM first f JOIN act a ON f.user_id = a.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val first = ev.groupBy($"user_id")
        .agg(to_date(date_trunc("week", min($"ts"))).as("cohort"))
      val act = ev.select($"user_id", to_date(date_trunc("week", $"ts")).as("wk")).distinct()
      first.join(act, "user_id")
        .groupBy($"cohort", floor(datediff($"wk", $"cohort") / 7).cast("int").as("week_n"))
        .agg(count_distinct($"user_id").as("n_users"))
        .orderBy($"cohort", $"week_n")
    },

    // Ordered string aggregation (LISTAGG): deterministic via sort-then-join
    // on the collected array — the grouped lists are bounded (nations per
    // region), which is the only safe shape for collect_list at scale.
    sql("q_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"))
        .orderBy($"r_name")
    },

    // Word bigrams: pair adjacent tokens inside each document (zip the
    // token array against itself shifted by one), then a two-phase hash
    // agg over the exploded pairs — shuffle carries |distinct bigrams|.
    sql("q_bigrams",
      """SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |                i -> w[i] || ' ' || w[i + 1])) AS bigram
        |  FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |               x -> len(x) > 0) AS w
        |        FROM documents))
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 30""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(filter(split(lower($"text"), "\\s+"),
          x => length(x) > 0).as("w"))
        .select(explode(zip_with(
          slice($"w", lit(1), greatest(size($"w") - 1, lit(0))),
          slice($"w", lit(2), greatest(size($"w") - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
        .groupBy($"bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram")
        .limit(30)
    },

    // Hopping (sliding) event-time windows: 10-minute windows every
    // 5 minutes — Spark's window(ts, size, slide) generator; the oracle
    // expands each event into its two containing windows explicitly.
    sql("q_hopping_window",
      """WITH a AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
        |  FROM events)
        |SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 4) AS sum_value
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select($"w.start".as("window_start"), $"n", $"sum_value")
        .orderBy($"window_start")
    },

    // DISTINCT aggregate over a sliding window frame — Spark has no
    // count(DISTINCT) window form; size(collect_set() OVER frame) is the
    // equivalent (set state bounded by the 6-row frame, so no blowup).
    sql("q_window_count_distinct",
      """SELECT user_id, event_id,
        |  CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS INT) AS n_types_recent
        |FROM events WHERE user_id < 50
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-5, Window.currentRow)
      Tables.events(s, d)
        .filter($"user_id" < 50)
        .select($"user_id", $"event_id",
          size(collect_set($"event_type").over(w)).as("n_types_recent"))
        .orderBy($"user_id", $"event_id")
    },

    // Dataset mixing: per-source sampling rates applied with a DETERMINISTIC
    // hash gate (md5 prefix vs a rate threshold) — the reproducible way to
    // re-weight corpus sources for a training mix. Rate class = source
    // number mod 4 → 25/50/75/100%. One conditional-aggregation pass.
    sql("q_mix_sources",
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE
        |    CAST(substr(source, 4) AS INT) % 4 = 3
        |    OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |       CASE CAST(substr(source, 4) AS INT) % 4
        |         WHEN 0 THEN '40' WHEN 1 THEN '80' ELSE 'c0' END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val srcClass = substring($"source", 4, 10).cast("int") % 4
      val keep = srcClass === 3 ||
        substring(md5($"doc_id".cast("string")), 1, 2) <
          when(srcClass === 0, "40").when(srcClass === 1, "80").otherwise("c0")
      Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(keep, 1)).as("n_sampled"))
        .orderBy($"source")
    },

    // TEMPERATURE-based mixture sampling (the multilingual rebalancing
    // trick: sample language i with probability ∝ p_i^α, α < 1 flattening
    // the head so low-resource languages are over-represented relative to
    // their corpus share). Because p_i = n_i/N and N cancels in the
    // renormalization, q_i = n_i^α / Σ_j n_j^α — computable from per-lang
    // counts alone. Per-doc selection is the deterministic md5 hash gate
    // (q_mix_sources discipline) at rate round(min(1, B·q_i/n_i), 6):
    // reproducible, partition-parallel, no RNG state. The lang-rate table
    // is |langs| rows → broadcast; the corpus is scanned once for counts
    // and once for gating. Rounding the rate to 6 on both sides pins the
    // float gate boundary across engines (pow/Σ-order noise ~1e-16 is 10
    // orders below the rounded boundary).
    sql("q_mix_temperature",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |den AS (SELECT sum(pow(n, 0.3)) AS den FROM c),
        |r AS (SELECT lang, n, pow(n, 0.3) / den AS q,
        |        round(least(1.0, 200.0 * (pow(n, 0.3) / den) / n), 6) AS rate
        |      FROM c, den)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(min(r.q), 6) AS q_temp, min(r.rate) AS rate,
        |  CAST(count(*) FILTER (WHERE
        |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 < r.rate) AS BIGINT) AS n_sampled
        |FROM documents d JOIN r ON d.lang = r.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
      import s.implicits._
      val alpha = 0.3
      val budget = 200.0
      val counts = Tables.documents(s, d).groupBy($"lang").agg(count(lit(1)).as("n"))
      val denom = counts.agg(sum(pow($"n", alpha)).as("den"))
      val rates = counts.crossJoin(broadcast(denom))
        .withColumn("q", pow($"n", alpha) / $"den")
        .withColumn("rate", round(least(lit(1.0), lit(budget) * $"q" / $"n"), 6))
      Tables.documents(s, d)
        .join(broadcast(rates.select($"lang", $"q", $"rate")), "lang")
        .withColumn("frac",
          conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("double")
            / 4294967296.0)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          round(min($"q"), 6).as("q_temp"),
          min($"rate").as("rate"),
          count(when($"frac" < $"rate", 1)).as("n_sampled"))
        .orderBy($"lang")
    },

    // Shannon entropy of the event-type distribution per user bucket.
    // Spark has no entropy aggregate: two-level aggregation computes
    // log2(T) - Σ c·log2(c) / T — algebraic partials all the way down, no
    // window, no collect. Oracle: DuckDB's native entropy().
    sql("q_entropy",
      """SELECT user_id % 10 AS bucket,
        |  round(entropy(event_type), 4) AS type_entropy
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(pmod($"user_id", lit(10)).as("bucket"), $"event_type")
        .agg(count(lit(1)).as("c"))
        .groupBy($"bucket")
        .agg(round(
          log2(sum($"c")) - sum($"c" * log2($"c")) / sum($"c"), 4)
          .as("type_entropy"))
        .orderBy($"bucket")
    },

    // Linear-regression aggregates (slope/intercept/r², the SQL:2003 regr_*
    // family): price as a function of quantity per return flag.
    sql("q_regr_agg",
      """SELECT l_returnflag,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          regr_count($"l_extendedprice", $"l_quantity").as("n"),
          round(regr_slope($"l_extendedprice", $"l_quantity"), 4).as("slope"),
          round(regr_intercept($"l_extendedprice", $"l_quantity"), 4).as("intercept"),
          round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
          round(regr_avgx($"l_extendedprice", $"l_quantity"), 4).as("avg_qty"))
        .orderBy($"l_returnflag")
    },

    // Rolling-window anomaly detection: per event type, z-score each value
    // against the mean/stddev of its 100 PRECEDING events (ordered by ts
    // with event_id as the tie-breaker — a deterministic total order both
    // engines share). The frame excludes the current row so an outlier
    // cannot dilute its own baseline; rows with <30 predecessors are
    // warm-up and skipped. Scale: event_type has a HANDFUL of values, so
    // the textbook per-type window would sort each type's entire history
    // in one task — instead RollingHalo splits the timeline into
    // (type, day) window partitions and hands each bucket a ≤100-row halo
    // of preceding rows, bitwise-identical output (RollingHaloSpec pins
    // equivalence incl. sparse buckets and fold order; in streaming the
    // same frame is a mapGroupsWithState ring buffer). Threshold safety:
    // the sf0.01 minimum |z−3| gap is 4.6e-4, ~9 orders above
    // cross-engine float summation noise, so the filter set is
    // hash-stable.
    sql("q_anomaly_zscore",
      """WITH w AS (
        |  SELECT event_id, event_type, value,
        |    avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING) AS mu,
        |    stddev_samp(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING) AS sigma,
        |    count(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING) AS nprev
        |  FROM events)
        |SELECT event_id, event_type, value, round((value - mu) / sigma, 4) AS z
        |FROM w WHERE nprev >= 30 AND sigma > 0 AND abs((value - mu) / sigma) > 3
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.ext.RollingHalo
        .precedingStats(Tables.events(s, d), "event_type", "ts", "event_id",
          "value", frame = 100)
        .filter($"nprev" >= 30 && $"sigma" > 0 &&
          abs(($"value" - $"mu") / $"sigma") > 3)
        .select($"event_id", $"event_type", $"value",
          round(($"value" - $"mu") / $"sigma", 4).as("z"))
        .orderBy($"event_id")
    },

    // Identifier/PII redaction — the governance pass a training-data
    // pipeline runs before publishing: mask every digit run in the
    // identifier-bearing column, report how many characters were masked.
    // The pattern family in production covers emails/phones/SSNs; this
    // corpus carries numeric customer identifiers, and the digit-class
    // pattern used here is deliberately RE2-and-Java-regex common ground
    // so Spark and DuckDB redact byte-identically. Scale: a pure per-row
    // projection — codegen'd regexp_replace, no shuffle at all (the
    // ORDER BY+LIMIT exists only to pin a deterministic compare set).
    sql("q_pii_redact",
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_name,
        |  CAST(length(c_name) -
        |       length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_masked
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_custkey",
          regexp_replace($"c_name", "[0-9]", "*").as("masked_name"),
          (length($"c_name") -
            length(regexp_replace($"c_name", "[0-9]", ""))).cast("long")
            .as("n_masked"))
        .orderBy($"c_custkey")
        .limit(100)
    },
  )
}
