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
    // dev knob: also dump each result as parquet (targeted oracle triage
    // without a full Verify pass) plus the probed names' oracle SQL, in
    // Verify's oracle_sql.json shape so tools/check.py runs on the dump
    val dumpDir = sys.env.get("SPARK_GRAFT_PROBE_DUMP_DIR")
    dumpDir.foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.createObjectNode()
      queryList.foreach { case (name, _) =>
        SparkEntry.oracleSql.get(name).foreach(node.put(name, _)) }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/oracle_sql.json"),
        mapper.writeValueAsBytes(node))
    }
    (1 to passes).foreach { p =>
      queryList.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          dumpDir match {
            case Some(dir) if p == 1 => // Verify's layout: dir per bare name
              df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
            case _ => df.count()
          }
        } catch { case e: Throwable => System.err.println(s"ERR $name: ${e.getClass.getSimpleName} ${e.getMessage}") }
        System.err.println(f"QTIME pass=$p $name ${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
