package graft.ext

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("reconstruction error bounded by scale/2 per element") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val q = emb.select($"vec_id", $"embedding",
      Quantize.quantize($"embedding").as("qz"))
    val err = q.select(
      aggregate(
        zip_with($"embedding".cast("array<double>"),
          Quantize.dequantize($"qz.scale", $"qz.q"),
          (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"),
      ($"qz.scale" / 2 + lit(1e-12)).as("bound"))
    assert(err.filter($"max_err" > $"bound").count() == 0)
  }

  test("int8 cosine ranks near the exact cosine: recall@10 >= 0.8") {
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = emb.filter($"id" < 5)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val qz = emb.select($"id", Quantize.quantize($"vec").as("z"))
    val qq = qz.filter($"id" < 5).select($"id".as("query_id"), $"z.q".as("qa"))
    val scored = qz.select($"id".as("neighbor_id"), $"z.q".as("qb"))
      .crossJoin(broadcast(qq))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        Quantize.cosineInt8($"qa", $"qb").as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    val approx = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("zero vector quantizes to zero bytes, cosine against it is null") {
    val df = Seq(
      (1L, Seq(0.0, 0.0, 0.0)),
      (2L, Seq(1.0, -2.0, 0.5))).toDF("id", "vec")
    val z = df.select($"id", Quantize.quantize($"vec").as("z"))
    val zero = z.filter($"id" === 1).select($"z.q").head().getAs[Array[Byte]](0)
    assert(zero.forall(_ == 0))
    val pair = z.select($"z.q".as("qa")).crossJoin(z.select($"z.q".as("qb")))
    assert(pair.select(Quantize.cosineInt8($"qa", $"qb")).collect()
      .count(_.isNullAt(0)) == 3) // every pair touching the zero vector
  }
}
