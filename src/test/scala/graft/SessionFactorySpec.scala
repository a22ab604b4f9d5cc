package graft

import org.scalatest.funsuite.AnyFunSuite

class SessionFactorySpec extends AnyFunSuite {

  test("dead-pid warehouse dirs are swept; the live process's dir survives") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    // 999999999 exceeds any Linux pid_max, so ProcessHandle.of is empty →
    // the dir reads as owned by a dead process
    val dead = new java.io.File(tmp, "graft-warehouse-999999999")
    dead.mkdirs()
    new java.io.File(dead, "orphaned-table").createNewFile()
    val own = new java.io.File(tmp, s"graft-warehouse-${ProcessHandle.current().pid()}")
    val ownExisted = own.exists()
    own.mkdirs()
    // a non-pid name must never match the sweep pattern
    val odd = new java.io.File(tmp, "graft-warehouse-notapid")
    odd.mkdirs()
    try {
      SessionFactory.sweepDeadWarehouses()
      assert(!dead.exists(), "dead-pid warehouse must be removed")
      assert(own.exists(), "own warehouse must survive the sweep")
      assert(odd.exists(), "non-pid-suffixed dirs are out of scope")
    } finally {
      odd.delete()
      if (!ownExisted) own.delete()
    }
  }
}
