package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten propagation: erasing a document must also erase
  * every near-duplicate copy of it, or the requested content survives the
  * delete under a lightly-edited twin (the compliance failure mode — cf.
  * the reference's hard-delete story, redshift/init.sql's full-reload
  * tables, where "forget" is trivially a reload; a dedup-aware lakehouse
  * has to propagate instead).
  *
  * Scale shape: near-dup clusters come from the prefix-filtered
  * [[SetSimJoin]] (never all-pairs) + [[Components]]; the request list is
  * tiny relative to the corpus, so the erased-cluster set is a distinct on
  * the requested rows and propagation is one broadcast semi-probe per doc.
  * Nothing here scans the corpus more than the near-dup pass itself.
  */
object Erasure {

  /** Flags every row of `docs` with its near-dup `cluster_id`, the request
    * bit, and `erased` = "this row's cluster contains a requested doc".
    * All original columns ride along.
    *
    * @param requestedCol boolean expression over `docs` columns marking
    *                     the erasure-request list.
    */
  def sweep(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      requestedCol: Column,
      threshold: Double = 0.8): DataFrame = {
    val pairs = SetSimJoin.join(docs, idCol, textCol, threshold)
    val comp = Components.connectedComponents(pairs, srcCol = "doc_a", dstCol = "doc_b")
    val cl = docs
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("component"), col(idCol)).cast("long"))
      .drop("component")
      .withColumn("requested", requestedCol)
    val erasedClusters = cl.filter(col("requested"))
      .select(col("cluster_id")).distinct()
      .withColumn("erased", lit(true))
    cl.join(broadcast(erasedClusters), Seq("cluster_id"), "left")
      .withColumn("erased", coalesce(col("erased"), lit(false)))
  }
}
