package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Vacuum discipline for fingerprint-keyed artifacts: regenerating a source
  * must reclaim the prior vintage's dir, never strand it (round-11 item —
  * disk grew monotonically across testdata regenerations before this); and
  * the reclaim itself must be CONTAINED: only dirs under the canonical
  * graft-index root are ever deletable, so a poisoned or corrupted registry
  * can never reach Spark scratch dirs, Derby locks, or foreign tmpdir files
  * (round-12 tightening — the containment used to be tmpdir-wide). */
class IndexStoreSpec extends AnyFunSuite {

  private val indexRoot = new java.io.File(
    s"${sys.props("java.io.tmpdir")}/graft-index")

  /** A claimable artifact dir: under graft-index/ like every dir the
    * engine registers (IndexStore.indexDir), with one payload file. */
  private def artifactDir(prefix: String): java.io.File = {
    val d = new java.io.File(indexRoot, s"$prefix-${System.nanoTime()}")
    d.mkdirs()
    new java.io.File(d, "payload").createNewFile()
    d
  }

  test("claim deletes the previous vintage's dir and keeps the current one") {
    val id = s"spec-claim-${System.nanoTime()}"
    val v1 = artifactDir("idx-v1")
    val v2 = artifactDir("idx-v2")
    IndexStore.claim(id, v1.getAbsolutePath)
    assert(v1.exists(), "first claim has no predecessor to remove")
    // source regenerated: same logical artifact, new fingerprinted dir
    IndexStore.claim(id, v2.getAbsolutePath)
    assert(!v1.exists(), "stale vintage must be vacuumed on re-claim")
    assert(v2.exists() && new java.io.File(v2, "payload").exists(),
      "current vintage must be untouched")
    // idempotent: re-claiming the current dir is a no-op
    IndexStore.claim(id, v2.getAbsolutePath)
    assert(v2.exists() && new java.io.File(v2, "payload").exists())
  }

  test("claims are independent per logical artifact") {
    val a = artifactDir("idx-a"); val b = artifactDir("idx-b")
    val t = System.nanoTime()
    IndexStore.claim(s"spec-iso-a-$t", a.getAbsolutePath)
    IndexStore.claim(s"spec-iso-b-$t", b.getAbsolutePath)
    val a2 = artifactDir("idx-a2")
    IndexStore.claim(s"spec-iso-a-$t", a2.getAbsolutePath)
    assert(!a.exists() && a2.exists())
    assert(b.exists(), "claiming artifact A must never touch artifact B")
  }

  test("claim refuses to delete a poisoned entry outside the graft-index root") {
    // a registry value INSIDE tmpdir but OUTSIDE graft-index/ — exactly
    // what Spark scratch dirs and Derby locks look like — must survive
    val foreign = new java.io.File(
      java.nio.file.Files.createTempDirectory("idx-foreign").toFile, "keep")
    foreign.mkdirs()
    val id = s"spec-foreign-${System.nanoTime()}"
    IndexStore.claim(id, foreign.getAbsolutePath)
    IndexStore.claim(id, artifactDir("idx-new").getAbsolutePath)
    assert(foreign.exists(), "tmpdir path outside graft-index/ must survive")
    foreign.delete(); foreign.getParentFile.delete()
  }

  test("claim refuses a prefix-attack sibling of the graft-index root") {
    // graft-index-evil shares the string prefix 'graft-index' — a bare
    // startsWith(root) would delete it; the trailing-separator compare
    // must refuse it
    val evil = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-index-evil-${System.nanoTime()}")
    evil.mkdirs()
    new java.io.File(evil, "keep").createNewFile()
    val id = s"spec-evil-${System.nanoTime()}"
    IndexStore.claim(id, evil.getAbsolutePath)
    IndexStore.claim(id, artifactDir("idx-new2").getAbsolutePath)
    assert(evil.exists() && new java.io.File(evil, "keep").exists(),
      "graft-index-evil sibling must survive a re-claim")
    new java.io.File(evil, "keep").delete(); evil.delete()
  }

  test("claim never deletes a registry entry pointing outside tmpdir") {
    // defense in depth: a poisoned registry value outside the tmp root is
    // refused, not deleted
    val outsideRoot = new java.io.File("target/idx-outside-" + System.nanoTime())
    val outside = new java.io.File(outsideRoot, "keep")
    outside.mkdirs()
    val id = s"spec-outside-${System.nanoTime()}"
    IndexStore.claim(id, outside.getAbsolutePath)
    IndexStore.claim(id, artifactDir("idx-new3").getAbsolutePath)
    assert(outside.exists(), "outside-tmpdir path must survive a re-claim")
    // cleanup
    outside.delete(); outsideRoot.delete()
  }
}
