package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS stress for the artifact registry (round-11 verdict item):
  * the OS file lock in IndexStore.claim exists because two processes
  * interleaving the registry's read-modify-write would last-writer-win and
  * silently DROP each other's entries — stranding the dropped entry's
  * predecessor dir forever. A same-JVM test cannot exercise that path (the
  * JVM-level claimLock already serializes it), so this spec forks a real
  * second JVM ([[ClaimStressChild]]) and races it against this one on the
  * shared registry file. */
class IndexStoreStressSpec extends AnyFunSuite {

  /** Filesystem location of a loaded class — the child JVM's classpath is
    * assembled from the code sources actually in use, so the spec works
    * identically under sbt (in-process tests, useless java.class.path)
    * and a forked runner. */
  private def codeSource(c: Class[_]): String =
    new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI)
      .getAbsolutePath

  test("two JVMs claiming concurrently drop no entries and delete no live dirs") {
    val t = System.nanoTime()
    val root = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft-index")
    root.mkdirs()
    val childPrefix = s"stress-c-$t"
    val parentPrefix = s"stress-p-$t"
    val n = 50

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = Seq(
      codeSource(classOf[IndexStore.type]),        // main classes (IndexStore)
      codeSource(classOf[ClaimStressChild.type]),  // test classes (the child main)
      codeSource(classOf[scala.Predef.type])       // scala-library
    ).distinct.mkString(java.io.File.pathSeparator)
    val proc = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.ext.ClaimStressChild", childPrefix, n.toString, root.getAbsolutePath)
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    // wait for the child's first-claim marker so the two claim loops
    // genuinely overlap instead of running back-to-back
    assert(out.readLine() == "START", "child failed to start")

    for (r <- 0 until 2; i <- 0 until n) {
      val d = new java.io.File(root, s"$parentPrefix-$i-v$r")
      d.mkdirs()
      new java.io.File(d, "payload").createNewFile()
      IndexStore.claim(s"$parentPrefix-$i", d.getAbsolutePath)
    }

    val rest = Iterator.continually(out.readLine()).takeWhile(_ != null).toSeq
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish")
    assert(proc.exitValue() == 0, s"child failed:\n${rest.mkString("\n")}")
    assert(rest.contains("DONE"), s"child output missing DONE:\n${rest.mkString("\n")}")

    // the registry must hold EVERY logical id from BOTH processes, each at
    // its final (v1) dir — a dropped entry is exactly the lost-update the
    // OS file lock exists to prevent
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(new java.io.File(root, "REGISTRY"))
    try props.load(in) finally in.close()
    for (p <- Seq(childPrefix, parentPrefix); i <- 0 until n) {
      val expect = new java.io.File(root, s"$p-$i-v1").getAbsolutePath
      assert(props.getProperty(IndexStore.dirKey(s"$p-$i")) == expect,
        s"registry dropped or mis-points $p-$i")
      assert(new java.io.File(expect, "payload").exists(),
        s"live dir of $p-$i was deleted")
      assert(!new java.io.File(root, s"$p-$i-v0").exists(),
        s"stale predecessor of $p-$i survived")
    }
  }
}
