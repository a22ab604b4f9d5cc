package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev triage main (optimization guide §1/§7): per-JOB wall-time breakdown
  * of named registry queries. Each `fn(spark, dir)` + action spawns one or
  * more Spark jobs (localCheckpoints, bounded collect gates, index builds,
  * convergence counts, the final count); this prints every job's duration,
  * stage count, task count and callsite so the expensive piece of a
  * multi-job query is visible without the UI. Usage:
  *   tools/run.sh graft.Profile q_setsim_join q_pretrain_pipeline
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROBE_PASSES (default 2; pass 1 is warmup, later passes
  * print — one-time codegen/JIT noise stays out of the breakdown).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    val spark = SessionFactory.builder("graft-profile", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, start: Long, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0, var callsite: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, System.nanoTime())
        j.callsite = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = System.nanoTime())
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // stages attribute to the job that submitted them via the jobId set
        val sid = e.stageInfo.stageId
        jobs.forEach { (_, j) =>
          if (j.end == 0L || true) () // attribution below via job groups is
        }
        // simplest robust attribution: the most recent unfinished job
        val open = jobs.values.toArray(Array.empty[Job])
          .filter(_.end == 0L).sortBy(-_.start)
        open.headOption.foreach { j =>
          j.stages += 1
          j.tasks += e.stageInfo.numTasks
        }
        val _ = sid
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_pricing_summary")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to passes).foreach { p =>
        jobs.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        df.count()
        val tEnd = System.nanoTime()
        if (p == passes) {
          println(f"===== $n pass=$p total=${(tEnd - t0) / 1e9}%.3f s " +
            f"(build=${(tBuild - t0) / 1e9}%.3f, action=${(tEnd - tBuild) / 1e9}%.3f)")
          val js = jobs.values.toArray(Array.empty[Job]).sortBy(_.id)
          js.foreach { j =>
            val dur = (if (j.end == 0L) tEnd else j.end) - j.start
            println(f"  job ${j.id}%4d ${dur / 1e9}%7.3f s stages=${j.stages}%3d tasks=${j.tasks}%5d  ${j.callsite}")
          }
          println(f"  jobs=${js.length} sumJob=${js.map(j => ((if (j.end == 0L) tEnd else j.end) - j.start)).sum / 1e9}%.3f s")
        }
      }
    }
    spark.stop()
  }
}
