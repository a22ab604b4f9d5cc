package graft.ext

/** Child-process half of the cross-process claim stress test
  * (IndexStoreStressSpec): a SECOND JVM hammering the shared artifact
  * registry while the spec's own JVM does the same. Prints START before
  * its first claim so the parent can begin claiming concurrently, and
  * DONE after its last, then exits 0. Kept free of Spark imports so the
  * child classpath is just graft classes + scala-library. */
object ClaimStressChild {
  def main(args: Array[String]): Unit = {
    val prefix = args(0)
    val n = args(1).toInt
    val root = args(2)
    println("START")
    System.out.flush()
    // two vintages per logical id: every re-claim exercises the
    // cross-process read-modify-write AND the predecessor vacuum
    for (r <- 0 until 2; i <- 0 until n) {
      val d = new java.io.File(root, s"$prefix-$i-v$r")
      d.mkdirs()
      new java.io.File(d, "payload").createNewFile()
      IndexStore.claim(s"$prefix-$i", d.getAbsolutePath)
    }
    println("DONE")
  }
}
