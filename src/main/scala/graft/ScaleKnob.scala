package graft

import org.apache.spark.sql.functions._

/** Measures the semantic-dedup RESOLUTION KNOB (SURVEY §9.1): with the
  * cell vocabulary fixed by `gridBits`, an N× corpus grows mean cell
  * occupancy N× and within-cell candidate pairs toward N² — the one
  * super-linear trend the measured scaling curve found. The production
  * answer is that resolution scales with the corpus (and hot cells split);
  * this probe makes that quantitative instead of argued: for a given
  * (sfDir, gridBits) it reports the candidate-pair count and the wall time
  * of the full dedup, so runs at {sf0.1, bits 4} / {sf0.5, bits 4} /
  * {sf0.5, bits 4+⌈log2 N⌉} show the pair count restored to ~the base
  * scale's by the bit increase alone.
  *
  * The OTHER knob — hot-cell splitting at unchanged global bits — is
  * measured by passing `maxCellSize`: cells are [[ext.SemDedup
  * .splitHotCells]]-refined first, so the probe reports the pair count
  * the bounded dedup actually pays.
  *
  * Usage: ScaleKnob <sfDir> <gridBits> [minCos=0.3] [maxCellSize]
  * Prints one JSON line: {"sf":…,"bits":…,"vectors":…,"cells":…,
  * "max_cell":…,"pairs":…,"dedup_sec":…}.
  */
object ScaleKnob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleKnob <sfDir> <gridBits> [minCos] [maxCellSize]")
    val (dir, bits) = (args(0), args(1).toInt)
    val minCos = if (args.length > 2) args(2).toDouble else 0.3
    val maxCellSize = if (args.length > 3) Some(args(3).toLong) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SessionFactory.builder("graft-scale-knob", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = sources.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val raw = ext.SemDedup.gridCells(emb, bits)
    val cells = maxCellSize.fold(raw)(m => ext.SemDedup.splitHotCells(raw, m))
      .localCheckpoint()

    val occ = cells.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("cells"), max(col("n")).as("max_cell"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs"),
        sum(col("n")).as("vectors"))
      .collect()(0)

    val t0 = System.nanoTime()
    ext.SemDedup.dedup(cells, minCos).filter(col("keep")).count()
    val sec = (System.nanoTime() - t0) / 1e9

    println(f"""{"sf":"$dir","bits":$bits,"vectors":${occ.getLong(3)},""" +
      f""""cells":${occ.getLong(0)},"max_cell":${occ.getLong(1)},""" +
      f""""pairs":${occ.getDouble(2)}%.0f,"dedup_sec":$sec%.3f}""")
    spark.stop()
  }
}
