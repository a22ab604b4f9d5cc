package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JDBC warehouse-sink leg (embedded Derby stands in for the warehouse):
  * pre-action DDL, parallel append, post-action statistics, and the
  * delete-then-append idempotent re-load pattern. */
class WarehouseJdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftwhspec;create=true"

  // Derby has no IF [NOT] EXISTS — tolerate exists/missing SQL states the
  // way a warehouse dialect's IF clauses would absorb them
  private val tolerable = Set("X0Y32", "42X05", "42Y55")

  private def ddl(table: String) =
    s"""CREATE TABLE $table ("k" VARCHAR(16), "n" BIGINT)"""

  test("load runs preactions, appends over JDBC, runs postactions") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    WarehouseJdbc.load(df, url, "t1",
      preactions = Seq(ddl("t1")),
      postactions = Seq("CALL SYSCS_UTIL.SYSCS_UPDATE_STATISTICS('APP', 'T1', NULL)"),
      tolerableSqlStates = tolerable)
    val back = WarehouseJdbc.read(spark, url, "t1")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(back.toSeq == Seq(("a", 1L), ("b", 2L)))
  }

  test("delete-then-append preaction makes re-loads idempotent") {
    val df = Seq(("x", 10L)).toDF("k", "n")
    def loadOnce(): Unit = WarehouseJdbc.load(df, url, "t2",
      preactions = Seq(ddl("t2"), "DELETE FROM t2"),
      tolerableSqlStates = tolerable)
    loadOnce()
    loadOnce() // replay: DELETE wipes the prior load, no duplicates
    assert(WarehouseJdbc.read(spark, url, "t2").count() == 1)
  }

  test("a non-tolerated DDL failure propagates loudly") {
    val df = Seq(("y", 1L)).toDF("k", "n")
    intercept[java.sql.SQLException] {
      WarehouseJdbc.load(df, url, "t3",
        preactions = Seq("THIS IS NOT SQL"), tolerableSqlStates = tolerable)
    }
  }
}
