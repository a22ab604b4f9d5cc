package graft

/** Dev triage main: time registered queries one by one (all, or only the
  * names passed as args) against SPARK_GRAFT_SF_DIR, QTIME lines on stderr. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SessionFactory.builder("graft-probe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val queryList = if (args.isEmpty) all else all.filter(q => args.contains(q._1))
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "1").toInt
    (1 to passes).foreach { p =>
      queryList.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable => System.err.println(s"ERR $name: ${e.getClass.getSimpleName}") }
        System.err.println(f"QTIME pass=$p $name ${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
