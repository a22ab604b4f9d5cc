package graft

/** Quiet-reference capture for the bench's ~20 s probe timeline: samples
  * [[Bench.microCalibSec]] and [[Bench.ioProbeSec]] N times on an
  * otherwise-idle session and prints one JSON line of min/med/max plus
  * the SpinProbe readings — the input to blessing `mcal_ref` / `io_ref`
  * in `bench-baseline.properties` (same multi-capture discipline as the
  * per-query minima: run this 2-3× on a quiet host, bless the median of
  * the medians, never a reading from a window whose mt spin sits below
  * ~13.5k).
  *
  * Usage: tools/run.sh graft.ProbeRef [sfDir] [nSamples]
  */
object ProbeRef {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val n = args.lift(1).flatMap(_.toIntOption).getOrElse(15)
    val spark = SessionFactory.builder("graft-probe-ref", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mtPre = SpinProbe.allCores()
    // one unrecorded warm-up of each probe: the first micro-calib pays
    // session/codegen init the steady-state ~20 s samples never see
    Bench.microCalibSec(spark)
    Bench.ioProbeSec(spark, sfDir)
    val mcal = Seq.fill(n)(Bench.microCalibSec(spark)).sorted
    val io = Seq.fill(n)(Bench.ioProbeSec(spark, sfDir)).sorted
    val mtPost = SpinProbe.allCores()
    def r4(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", v)
    println(s"""{"n":$n,"mcal_min":${r4(mcal.head)},"mcal_med":${r4(mcal(n / 2))},"mcal_max":${r4(mcal.last)},"io_min":${r4(io.head)},"io_med":${r4(io(n / 2))},"io_max":${r4(io.last)},"calib_mt_pre":${r4(mtPre)},"calib_mt_post":${r4(mtPost)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
