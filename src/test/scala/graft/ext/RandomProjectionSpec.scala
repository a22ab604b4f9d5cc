package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JL ±1 random-projection invariants. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("the literal sign matrix matches the SQL md5-nibble parity rule") {
    val pairs = for (p <- 0 until 16; j <- 0 until 64) yield (p, j)
    // instr = Spark's 1-based strpos twin (0 when absent, i.e. on '0')
    val sqlSigns = pairs.toDF("p", "j")
      .select($"p", $"j",
        ((expr("instr('123456789abcdef', substring(md5(concat('jl:', p, ':', j)), 1, 1))")
          % 2) * 2 - 1).cast("int").as("s"))
      .as[(Int, Int, Int)].collect()
      .map { case (p, j, s) => (p, j) -> s }.toMap
    // Spark's strpos — same 1-based semantics as DuckDB's, 0 on '0'
    assert(pairs.forall { case (p, j) => RandomProjection.sign(p, j) == sqlSigns((p, j)) })
    // both signs occur (a degenerate all-+1 matrix would be useless)
    val all = pairs.map { case (p, j) => RandomProjection.sign(p, j) }
    assert(all.contains(1) && all.contains(-1))
  }

  test("JL property: pairwise distances survive the 64 -> 16 projection approximately") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val proj = RandomProjection.project(vecs.toDF("id", "v"), "id", "v")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, a) =>
        id -> a.sortBy(_._2).map(_._3.toDouble / 1000.0) }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val ratios = for {
      i <- 0L until 30L; j <- (i + 1) until 30L
    } yield d2(proj(i), proj(j)) / (d2(orig(i), orig(j)) * 16.0)
    // E[||R(x-y)||^2] = m ||x-y||^2 for ±1 planes (m = 16); the bulk within 3x
    val within = ratios.count(r => r > 1.0 / 3 && r < 3.0).toDouble / ratios.size
    assert(within > 0.9, s"only $within of pair distances within 3x after projection")
  }

  test("projection is a pure per-row map: no exchange in the plan") {
    val vecs = (0L until 8L).map(i => (i, Seq.fill(64)(i.toFloat)))
    val plan = RandomProjection.project(vecs.toDF("id", "v"), "id", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffles:\n$plan")
  }
}
