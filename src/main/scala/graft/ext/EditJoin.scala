package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (Ed-Join shape): all pairs of strings
  * within Levenshtein distance ≤ maxDist, WITHOUT the all-pairs product.
  *
  * Filter chain, every step relational:
  *
  *  1. q-gram PREFIX filter: strings are decomposed into positional q-grams;
  *     each string keeps only its `maxDist·q + 1` rarest grams under a
  *     single global (frequency, gram) order. One edit operation destroys at
  *     most q grams, so two strings within maxDist share at least one of
  *     their rarest-(maxDist·q+1) grams (pigeonhole) — the candidate join
  *     runs on prefix grams only, which kills the "every document contains
  *     'the'" candidate explosion that a plain shared-gram join suffers.
  *  2. length filter: |len(a) − len(b)| ≤ maxDist rides the candidate join.
  *  3. exact verify: Spark's codegen'd `levenshtein` on the deduped
  *     candidate pairs.
  *
  * At 100 TB: gram frequencies are one aggregate over the corpus (re-usable
  * as a broadcast/bucketed table), the prefix join shuffles ids+grams only,
  * and the verify touches candidate pairs — linear-ish for realistic
  * near-dup densities. Same candidates-then-verify discipline as
  * [[SetSimJoin]] / [[MinHash]].
  *
  * COMPLETENESS precondition: a pair is guaranteed to share a q-gram only
  * when both strings have more than maxDist·q grams, i.e. length ≥
  * (maxDist+1)·q. Shorter strings keep their full gram set as the prefix
  * (the rn ≤ prefixLen cut never drops below the whole set), but two tiny
  * strings with zero common grams (e.g. "aaa" vs "bbb" at maxDist 10) are
  * legitimately unreachable by any gram join — route sub-(maxDist+1)·q
  * strings through a direct short-bucket pass if they matter.
  */
object EditJoin {

  def join(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 1)
    val prefixLen = maxDist * q + 1

    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // positional q-grams; strings shorter than q contribute themselves as
    // a single gram so short strings still generate candidates
    val grams = base.select(col("id"),
        explode(when(length(col("s")) < q, array(col("s")))
          .otherwise(expr(s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))")))
          .as("gram"))
      .groupBy("id", "gram").count().drop("count") // distinct (id, gram)

    // one global rarity order: gram frequency asc, gram asc (total order so
    // both sides of a pair rank identically). Frequency via count-over-
    // window instead of aggregate + rejoin: one shuffle on gram, one on id,
    // instead of three.
    val ranked = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("gram"))))
      .filter(col("rn") <= prefixLen)
      .select(col("id"), col("gram"))

    val cand = ranked.toDF("id_a", "gram")
      .join(ranked.toDF("id_b", "gram"), "gram")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    cand
      .join(base.toDF("id_a", "s_a"), "id_a")
      .join(base.toDF("id_b", "s_b"), "id_b")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
