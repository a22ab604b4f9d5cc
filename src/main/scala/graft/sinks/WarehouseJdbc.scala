package graft.sinks

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse (JDBC) gold-table load with pre/post DDL — the transport leg of
  * the reference's gold load (`glue/bronze_to_silver_openweather.py:110-148`):
  * `preactions` run on the warehouse connection BEFORE the append (partition
  * delete for idempotent re-loads, `CREATE TABLE IF NOT EXISTS`),
  * `postactions` run AFTER (`ANALYZE` / statistics refresh). The whole load
  * is append-only through Spark's JDBC writer — executors stream partitions
  * over parallel connections; only the DDL statements run driver-side.
  *
  * `tolerableSqlStates` maps warehouse-dialect `IF [NOT] EXISTS` clauses onto
  * engines that lack them (Derby: X0Y32 = table already exists, 42X05 /
  * 42Y55 = table missing) — a tolerated state skips that statement, anything
  * else propagates. Idempotence comes from the delete-then-append pattern,
  * exactly as the reference's README prescribes for double-run safety.
  */
object WarehouseJdbc {

  def load(
      df: DataFrame,
      url: String,
      table: String,
      preactions: Seq[String] = Nil,
      postactions: Seq[String] = Nil,
      properties: Properties = new Properties(),
      tolerableSqlStates: Set[String] = Set.empty): Unit = {
    runStatements(url, properties, preactions, tolerableSqlStates)
    df.write.mode(SaveMode.Append).jdbc(url, table, properties)
    runStatements(url, properties, postactions, tolerableSqlStates)
  }

  /** Read a warehouse table back as a DataFrame (verification / gold reads). */
  def read(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
      properties: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, properties)

  private def runStatements(
      url: String,
      properties: Properties,
      statements: Seq[String],
      tolerable: Set[String]): Unit = {
    if (statements.nonEmpty) {
      val conn = DriverManager.getConnection(url, properties)
      try statements.foreach { sql =>
        val st = conn.createStatement()
        try st.execute(sql)
        catch {
          case e: java.sql.SQLException if tolerable.contains(e.getSQLState) => ()
        } finally st.close()
      } finally conn.close()
    }
  }
}
