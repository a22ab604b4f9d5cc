package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with ±1 (Achlioptas 2003)
  * planes: project 64-dim embeddings onto `planes` signed-sum components.
  * The dimensionality-reduction tier under the ANN/clustering stack — a
  * 4× narrower vector preserves pairwise distances to O(1/√planes)
  * distortion, which is what makes corpus-scale clustering and candidate
  * generation affordable before the exact operators run on survivors.
  * Unlike [[SimHash]]/[[Similarity]]'s hyperplane BITS, the projection
  * keeps signed magnitudes, so downstream L2/cosine math still works.
  *
  * Determinism discipline: components are integer-quantized FIRST
  * (`floor(x·1000 + 0.5)`, the battery's fixed-point rule), and each
  * output component is an integer sum of signed integers — order-free,
  * so the DuckDB mirror hash-matches exactly. The sign matrix derives
  * from md5("jl:plane:dim") first-nibble parity: the Scala side embeds it
  * as literals (computed with java MessageDigest), the SQL side recomputes
  * it with its own md5 — equal by construction.
  *
  * Scale shape: a pure per-row projection (quantize, zip-multiply,
  * fold) — codegen'd, zero shuffles, linear at any corpus size.
  */
object RandomProjection {

  /** ±1 sign for (plane, dim): parity of the first hex nibble of
    * md5("jl:plane:dim") — even → -1, odd → +1. */
  def sign(plane: Int, dim: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$plane:$dim".getBytes("UTF-8"))
    (((h(0) >> 4) & 0xf) % 2) * 2 - 1
  }

  /** One row per (id, plane 0-based, proj): the signed integer projection
    * of the fixed-point-quantized vector onto each ±1 plane. */
  def project(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 16,
      dims: Int = 64): DataFrame = {
    val quantized = transform(col(vecCol),
      x => floor(x.cast("double") * 1000.0 + 0.5).cast("long"))
    val projections = array((0 until planes).map { p =>
      val signs = array((0 until dims).map(j => lit(sign(p, j).toLong)): _*)
      aggregate(zip_with(col("q"), signs, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    }: _*)
    emb
      .select(col(idCol).as("id"), quantized.as("q"))
      .select(col("id"), posexplode(projections))
      .select(col("id"), col("pos").cast("int").as("plane"),
        col("col").as("proj"))
  }
}
