package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Vacuum discipline for fingerprint-keyed artifacts: regenerating a source
  * must reclaim the prior vintage's dir, never strand it (round-11 item —
  * disk grew monotonically across testdata regenerations before this). */
class IndexStoreSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    new java.io.File(d, "payload").createNewFile()
    d
  }

  test("claim deletes the previous vintage's dir and keeps the current one") {
    val id = s"spec-claim-${System.nanoTime()}"
    val v1 = tmpDir("idx-v1")
    val v2 = tmpDir("idx-v2")
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
    val a = tmpDir("idx-a"); val b = tmpDir("idx-b")
    val t = System.nanoTime()
    IndexStore.claim(s"spec-iso-a-$t", a.getAbsolutePath)
    IndexStore.claim(s"spec-iso-b-$t", b.getAbsolutePath)
    val a2 = tmpDir("idx-a2")
    IndexStore.claim(s"spec-iso-a-$t", a2.getAbsolutePath)
    assert(!a.exists() && a2.exists())
    assert(b.exists(), "claiming artifact A must never touch artifact B")
  }

  test("claim never deletes a registry entry pointing outside tmpdir") {
    // defense in depth: even a poisoned registry value outside the tmp
    // root is refused, not deleted
    val outsideRoot = new java.io.File("target/idx-outside-" + System.nanoTime())
    val outside = new java.io.File(outsideRoot, "keep")
    outside.mkdirs()
    val id = s"spec-outside-${System.nanoTime()}"
    IndexStore.claim(id, outside.getAbsolutePath)
    IndexStore.claim(id, tmpDir("idx-new").getAbsolutePath)
    assert(outside.exists(), "outside-tmpdir path must survive a re-claim")
    // cleanup
    outside.delete(); outsideRoot.delete()
  }
}
