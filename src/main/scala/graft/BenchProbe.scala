package graft
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SessionFactory.builder("graft-probe", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
    queryList.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable => System.err.println(s"ERR $name: ${e.getClass.getSimpleName}") }
      System.err.println(f"QTIME $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
