package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.{CatalogV2Util, Column}
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's `private[sql]` v2-column codec. The engine
  * persists column semantics (DEFAULT / GENERATED ALWAYS AS /
  * IDENTITY) in its own log actions; at the catalog boundary it must
  * speak Spark's encoding — the StructField metadata keys
  * (`CURRENT_DEFAULT`, `EXISTS_DEFAULT`, `GENERATION_EXPRESSION`,
  * `identity.*`) the analyzer reads when resolving INSERTs and the
  * exists-default backfill. Using Spark's own converters keeps the
  * two representations bit-compatible instead of hand-maintaining the
  * key set.
  */
object ColumnSemanticsBridge {

  /** v2 `Column[]` (CREATE/REPLACE TABLE definition) → StructType with
    * semantics encoded as field metadata.
    */
  def toStructType(cols: Array[Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(cols)

  /** StructType with semantics metadata → v2 `Column[]` (what
    * `Table.columns()` should surface).
    */
  def toV2Columns(schema: StructType): Array[Column] =
    CatalogV2Util.structTypeToV2Columns(schema)
}
