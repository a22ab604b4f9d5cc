package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ext.TextAnalysis

/** TEMPORARY measurement scratchpad — deleted before commit. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SessionFactory.builder("graft-scratch", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def tokCountsBOf(t: org.apache.spark.sql.DataFrame) =
      t.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))

    val threshold = 0.8
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 600)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val toks = docs.select(
          col("doc_id").as("sid"),
          array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
        .filter(size(col("toks")) > 0)
      time("toks")(noop(toks))
      val tokCounts = toks.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))
      time("tokCounts")(noop(tokCounts))
      val prefix = toks
        .select(col("sid"), size(col("toks")).as("sz"), explode(col("toks")).as("tok"))
        .join(tokCounts, "tok")
        .withColumn("rn", row_number().over(
          Window.partitionBy("sid").orderBy(col("tf"), col("tok"))))
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
        .select("sid", "sz", "tok")
      time("prefix")(noop(prefix))
      val cand = prefix.toDF("a", "sz_a", "tok")
        .join(prefix.toDF("b", "sz_b", "tok"), Seq("tok"))
        .filter(col("a") < col("b") &&
          least(col("sz_a"), col("sz_b")) >=
            lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9))
        .select("a", "b")
        .distinct()
      time("cand")(noop(cand))
      val fin = cand
        .join(toks.toDF("a", "toks_a"), "a")
        .join(toks.toDF("b", "toks_b"), "b")
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
        .withColumn("uni", size(col("toks_a")) + size(col("toks_b")) - col("inter"))
        .filter(col("inter") > 0 && col("inter") / col("uni") >= threshold)
        .select(col("a").as("doc_a"), col("b").as("doc_b"),
          (col("inter") / col("uni")).as("jaccard"))
      time("final")(noop(fin))
      println("counts: toks=" + toks.count() + " tokCounts=" + tokCounts.count() +
        " prefix=" + prefix.count() + " cand=" + cand.count() + " final=" + fin.count())

      // ---- variant B: checkpoint toks + prefix so the self-join and the
      // verification joins read materialized frames instead of re-deriving
      val t0b = System.nanoTime()
      val toksB = toks.localCheckpoint()
      val prefixB = toksB
        .select(col("sid"), size(col("toks")).as("sz"), explode(col("toks")).as("tok"))
        .join(tokCountsBOf(toksB), "tok")
        .withColumn("rn", row_number().over(
          Window.partitionBy("sid").orderBy(col("tf"), col("tok"))))
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
        .select("sid", "sz", "tok")
        .localCheckpoint()
      println(f"TIME B-checkpointing ${(System.nanoTime() - t0b) / 1e9}%.3f s")
      val candB = prefixB.toDF("a", "sz_a", "tok")
        .join(prefixB.toDF("b", "sz_b", "tok"), Seq("tok"))
        .filter(col("a") < col("b") &&
          least(col("sz_a"), col("sz_b")) >=
            lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9))
        .select("a", "b")
        .distinct()
      time("B-cand")(noop(candB))
      val finB = candB
        .join(toksB.toDF("a", "toks_a"), "a")
        .join(toksB.toDF("b", "toks_b"), "b")
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
        .withColumn("uni", size(col("toks_a")) + size(col("toks_b")) - col("inter"))
        .filter(col("inter") > 0 && col("inter") / col("uni") >= threshold)
        .select(col("a").as("doc_a"), col("b").as("doc_b"),
          (col("inter") / col("uni")).as("jaccard"))
      time("B-final")(noop(finB))
      time("B-final-again")(noop(finB))
      val candC = candB.localCheckpoint()
      val j1 = candC.join(toksB.toDF("a", "toks_a"), "a")
      time("C-join1")(noop(j1))
      val j2 = j1.join(toksB.toDF("b", "toks_b"), "b")
      time("C-join2")(noop(j2))
      val j3 = j2.withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      time("C-intersect")(noop(j3))
      val j4 = j3.withColumn("uni", size(col("toks_a")) + size(col("toks_b")) - col("inter"))
        .filter(col("inter") > 0 && col("inter") / col("uni") >= threshold)
      time("C-verify-full")(noop(j4))
      if (pass == 2) j4.explain("formatted")
    }
    spark.stop()
  }
}
