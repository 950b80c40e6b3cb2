package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 (validity-interval) dimension materialization from the
  * change stream — the other standard CDC product besides the
  * current-state table (streaming.StateTable keeps the LATEST winner
  * per key; this keeps EVERY version with its validity interval, the
  * shape a warehouse dimension or a point-in-time ML feature join
  * wants — the batch counterpart of streaming.TemporalJoin's version
  * lookup).
  *
  * Per key, changes ordered by (ts, seq) become half-open versions
  * `[valid_from, valid_to)`: each change's interval closes at the NEXT
  * change of the same key; the last one stays open (valid_to null,
  * is_current = 1). Deletes close their predecessor's interval but
  * materialize no version themselves — a tombstoned key simply has no
  * current row until reinserted.
  *
  * Scale: one shuffle on the entity key, one window pass — and the
  * entity key (db, table, pkey value) is HIGH cardinality, so the
  * low-cardinality parallelism cap the two-phase session/as-of
  * operators exist for does not bite here.
  */
object Scd {

  /** `changes` must carry `keys`, a long `tsUsCol`, a unique tie-break
    * `seqCol`, `payloadCol` and `opCol` (ChangeOp values). Output:
    * keys..., payload, valid_from_us, valid_to_us (null = open),
    * is_current (0/1).
    */
  def type2(changes: DataFrame, keys: Seq[String], tsUsCol: String,
      seqCol: String, payloadCol: String, opCol: String): DataFrame = {
    val k = keys.map(col)
    val w = Window.partitionBy(k: _*).orderBy(col(tsUsCol), col(seqCol))
    changes
      // lead BEFORE dropping deletes: a delete's timestamp is exactly
      // what closes its predecessor's interval
      .withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      .filter(col(opCol) =!= ChangeOp.Delete)
      .select(k :+ col(payloadCol).as("payload")
        :+ col(tsUsCol).as("valid_from_us") :+ col("valid_to_us")
        :+ when(col("valid_to_us").isNull, 1L).otherwise(0L).as("is_current"): _*)
  }
}
