package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Graph
import graft.sources.Tables

/** Graph analytics battery: centrality, bounded reachability, triangle
  * census, plus a closed-form independence test. The fixture graph is user
  * co-occurrence over `events` — two users who emit the same event type in
  * the same minute share an edge — the shape a behavioral pipeline derives
  * before ranking accounts or expanding a flagged-seed set. Every entry is
  * hash-oracled: PageRank as unrolled iteration CTEs, BFS as a recursive
  * CTE, triangles/chi² as plain joins. Spark executes the same math as
  * iterative checkpointed joins ([[graft.ext.Graph]]) — fixed iteration
  * counts are what make the results bit-reproducible on both engines.
  *
  * Scale: the co-occurrence self-join keys on (minute, event_type) — a
  * composite fine enough that bucket sizes stay bounded as the corpus
  * grows (the quadratic blowup knob is the bucket width, chosen by data
  * density). PageRank/BFS rounds are join+agg pairs partitioned on node id;
  * the triangle closure joins partition on a shared vertex with AQE
  * handling hub skew.
  */
object GraphBattery {
  import QueryDef._

  /** Canonical (src < dst, distinct) co-occurrence edges. */
  private def coEdges(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(date_trunc("minute", col("ts")).as("m"), col("event_type"), col("user_id"))
    ev.toDF("m", "event_type", "src")
      .join(ev.toDF("m", "event_type", "dst"), Seq("m", "event_type"))
      .filter(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** Shared oracle CTE: the same canonical edge derivation in DuckDB SQL. */
  private val pairsCte =
    """pairs AS (
      |  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |  FROM events a JOIN events b
      |    ON date_trunc('minute', a.ts) = date_trunc('minute', b.ts)
      |   AND a.event_type = b.event_type AND a.user_id < b.user_id)""".stripMargin

  private val symCte =
    "sym AS (SELECT src, dst FROM pairs UNION SELECT dst AS src, src AS dst FROM pairs)"

  /** One unrolled PageRank iteration as a DuckDB CTE body. */
  private def prIterCte(k: Int): String =
    s"""pr$k AS (
       |  SELECT d.id, 0.15::DOUBLE/(SELECT cnt FROM n) + 0.85*coalesce(c.contrib, 0) AS pr
       |  FROM deg d LEFT JOIN (
       |    SELECT e.dst AS id, sum(p.pr/pd.outdeg) AS contrib
       |    FROM sym e JOIN pr${k - 1} p ON p.id = e.src JOIN deg pd ON pd.id = e.src
       |    GROUP BY e.dst) c ON c.id = d.id)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // PageRank (3 iterations, d=0.85) over the symmetrized co-occurrence
    // graph — account centrality. No sinks on a symmetric graph, so mass is
    // conserved and the oracle's unrolled CTEs are term-for-term the same
    // recurrence Spark iterates. round(6) pins the low-order float bits of
    // the two engines' differing sum orders.
    sql("q_pagerank",
      s"""WITH $pairsCte,
         |$symCte,
         |deg AS (SELECT src AS id, count(*) AS outdeg FROM sym GROUP BY src),
         |n AS (SELECT count(*) AS cnt FROM deg),
         |pr0 AS (SELECT id, 1.0::DOUBLE/(SELECT cnt FROM n) AS pr FROM deg),
         |${prIterCte(1)},
         |${prIterCte(2)},
         |${prIterCte(3)}
         |SELECT id AS user_id, round(pr, 6) AS pagerank
         |FROM pr3 ORDER BY pagerank DESC, user_id""".stripMargin) { (s, d) =>
      Graph.pageRank(Graph.symmetrize(coEdges(s, d)), iters = 3, damping = 0.85)
        .select(col("id").as("user_id"), round(col("pagerank"), 6).as("pagerank"))
        .orderBy(col("pagerank").desc, col("user_id"))
    },

    // Bounded-hop BFS from a seed set (user_id < 5) — "everyone within 3
    // hops of a flagged account", with the minimum hop distance. The oracle
    // is a recursive CTE whose UNION-dedup bounds the state; Spark's
    // frontier loop reaches each node first at its true min hop, so no
    // final re-aggregation is needed on the engine side.
    sql("q_khop_reach",
      s"""WITH RECURSIVE $pairsCte,
         |$symCte,
         |reach(id, hop) AS (
         |  SELECT DISTINCT src AS id, 0 AS hop FROM sym WHERE src < 5
         |  UNION
         |  SELECT e.dst AS id, r.hop + 1 AS hop
         |  FROM reach r JOIN sym e ON e.src = r.id WHERE r.hop < 3)
         |SELECT id AS user_id, CAST(min(hop) AS INTEGER) AS hops
         |FROM reach GROUP BY id ORDER BY user_id""".stripMargin) { (s, d) =>
      val sym = Graph.symmetrize(coEdges(s, d))
      val seeds = sym.select(col("src").as("id")).filter(col("id") < 5).distinct()
      Graph.minHops(sym, seeds, maxHops = 3)
        .select(col("id").as("user_id"), col("hops"))
        .orderBy(col("user_id"))
    },

    // Global triangle census on the canonical (a<b<c) edge set — the
    // clustering measure that separates a genuinely clique-y interaction
    // graph from a star-shaped bot pattern at the same edge count.
    sql("q_triangle_count",
      s"""WITH $pairsCte
         |SELECT count(*) AS n_triangles
         |FROM pairs e1
         |JOIN pairs e2 ON e2.src = e1.dst
         |JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin) { (s, d) =>
      Graph.triangleCount(coEdges(s, d))
    },

    // First-order Markov transition matrix over per-user event sequences —
    // the weighted digraph a behavior model starts from: consecutive-event
    // pairs via lead() in (ts, event_id) order (event_id breaks timestamp
    // ties into a total order, so both engines see the same sequences),
    // exact bigram counts, and row-normalized probabilities as one
    // deterministic division. Scale: the window partitions by user_id (no
    // global sort), the bigram aggregate is partial-combined map-side, and
    // the |types|² transition matrix is broadcast-sized by construction.
    sql("q_markov_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(CAST(c.n AS DOUBLE) / t.row_n, 6) AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val bi = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      val counts = bi.groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("from_type").agg(sum("n").as("row_n"))
      counts.join(tot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("row_n"), 6).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Pearson chi-square test of independence: event_type × user parity.
    // Full r×c grid (row-total × col-total cross join, missing cells
    // observed=0) so sparse cells still contribute their expected mass —
    // the textbook statistic, closed-form on both engines. All inputs are
    // exact counts; one rounded scalar out.
    sql("q_chisq_independence",
      """WITH obs AS (
        |  SELECT event_type, user_id % 2 AS bucket, count(*)::DOUBLE AS o
        |  FROM events GROUP BY 1, 2),
        |rowt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
        |colt AS (SELECT bucket, sum(o) AS c FROM obs GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM obs),
        |grid AS (
        |  SELECT rowt.event_type, colt.bucket, rowt.r, colt.c,
        |         coalesce(obs.o, 0) AS o
        |  FROM rowt CROSS JOIN colt
        |  LEFT JOIN obs ON obs.event_type = rowt.event_type AND obs.bucket = colt.bucket)
        |SELECT round(sum(pow(o - r*c/n, 2)/(r*c/n)), 4) AS chi2,
        |       (SELECT (count(DISTINCT event_type)-1)*(count(DISTINCT bucket)-1) FROM grid) AS df
        |FROM grid CROSS JOIN tot""".stripMargin) { (s, d) =>
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 2).as("bucket"))
        .agg(count(lit(1)).cast("double").as("o"))
      val rowt = obs.groupBy("event_type").agg(sum("o").as("r"))
      val colt = obs.groupBy("bucket").agg(sum("o").as("c"))
      val n = obs.agg(sum("o").as("n"))
      val grid = rowt.crossJoin(colt)
        .join(obs, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"), col("r"), col("c"),
          coalesce(col("o"), lit(0.0)).as("o"))
      val exp = col("r") * col("c") / col("n")
      grid.crossJoin(n)
        .agg(
          round(sum(pow(col("o") - exp, 2) / exp), 4).as("chi2"),
          ((countDistinct(col("event_type")) - 1) * (countDistinct(col("bucket")) - 1)).as("df"))
    },

    // Degree distribution — the first diagnostic run on any large graph
    // (power-law check, hub detection, join-skew forecast for everything
    // downstream). Node degree over the symmetrized co-occurrence edges,
    // then a histogram of degrees: (degree, how many nodes have it).
    // Scale: both aggregations are algebraic hash-aggs with map-side
    // partials; the histogram's key space is at most max-degree — tiny.
    // The hubs this surfaces are exactly the keys the skew-join salting
    // tier ([[graft.ops.SkewJoin]]) exists for.
    sql("q_degree_distribution",
      s"""WITH $pairsCte,
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT src AS node FROM pairs
        |        UNION ALL SELECT dst AS node FROM pairs)
        |  GROUP BY 1)
        |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin) { (s, d) =>
      val e = coEdges(s, d)
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }
  )
}
