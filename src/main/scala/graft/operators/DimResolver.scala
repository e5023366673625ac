package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Keys

/** J4 — dimension get-or-create + key substitution.
  *
  * The reference loops over distinct region names, looking each up by
  * unique name and inserting a fresh UUID when absent, then substitutes
  * ids into fact rows (reference: ingest_capacity.py:62-71,159-176;
  * same pattern in seed.py:14-25). Re-expressed as two set-level joins:
  *
  *   new names  = incoming.distinct ⟕anti dim          (one broadcast join)
  *   dim'       = dim ∪ (new names + deterministic key)
  *   fact ids   = facts ⋈ dim' on name                  (broadcast join)
  *
  * Surrogate keys are md5(name) instead of uuid4 (SURVEY.md §7.4.3) —
  * deterministic, coordination-free, identical when two concurrent
  * ingests race on the same new name (so the race is harmless, unlike
  * sequence-based ids).
  */
object DimResolver {

  /** Returns (updatedDim, newEntries). `dim` has columns (keyCol, nameCol,
    * ...); new entries carry NULL for any other dim columns. */
  def getOrCreate(dim: DataFrame, incomingNames: DataFrame,
                  nameCol: String = "name",
                  keyCol: String = "region_id"): (DataFrame, DataFrame) = {
    val distinctNew = incomingNames.select(col(nameCol)).distinct()
      .join(broadcast(dim.select(nameCol)), Seq(nameCol), "left_anti")
      .withColumn(keyCol, Keys.surrogateKey(col(nameCol)))
    val otherCols = dim.columns.filterNot(c => c == nameCol || c == keyCol)
    val padded = otherCols.foldLeft(distinctNew) { (d, c) =>
      d.withColumn(c, lit(null).cast(dim.schema(c).dataType))
    }.select(dim.columns.map(col): _*)
    (dim.unionByName(padded), padded)
  }

  /** Substitute dimension keys into fact rows: facts(factNameCol) →
    * dim(keyCol). Dim side is broadcast (dims are small relative to
    * facts; ≤56 regions in the reference). */
  def resolveKeys(facts: DataFrame, dim: DataFrame, factNameCol: String,
                  nameCol: String = "name",
                  keyCol: String = "region_id"): DataFrame =
    facts.join(broadcast(dim.select(col(nameCol).as(factNameCol), col(keyCol))),
        Seq(factNameCol), "inner")
}
