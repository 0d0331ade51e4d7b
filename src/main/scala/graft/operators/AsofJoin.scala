package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: each left row picks up the values of the LATEST right row
  * with the same key and `time ≤` the left row's time (ties inclusive) —
  * the standard point-in-time / most-recent-match operator that Spark has
  * no built-in for (DuckDB: `ASOF JOIN`, kdb: `aj`, pandas: `merge_asof`).
  *
  * Scale shape: the naive formulation is a range join (`l.key = r.key AND
  * r.time <= l.time` + a per-row argmax), which Spark can only execute as
  * a broadcast/shuffled product over the key groups — quadratic in group
  * size. This implementation instead UNIONS the two sides tagged, sorts
  * each key group once by (time, tag), and carries the last-seen right
  * row forward with `last(_, ignoreNulls)` over a running window: ONE
  * shuffle on the key, linear work per group, and both the window sort
  * and any downstream per-key aggregate reuse the same partitioning. The
  * right row's values ride in a single struct so the filled columns are
  * always mutually consistent (taken from the same right row) even when
  * individual right values are null.
  *
  * Right columns other than (key, time) are emitted as `<prefix><col>`;
  * the matched right time as `<prefix><time>`. Left rows with no earlier
  * right row keep nulls (LEFT-join semantics).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      prefix: String = "asof_"): DataFrame = {
    val valCols = right.columns.toSeq.filterNot(c => c == key || c == time)
    val leftOther = left.columns.toSeq.filterNot(c => c == key || c == time)
    val payloadType = StructType(
      valCols.map(right.schema(_)) :+ right.schema(time))
    val lTagged = left.select(
      Seq(col(key), col(time), lit(1).as("_tag")) ++
        leftOther.map(col) :+
        lit(null).cast(payloadType).as("_asof"): _*)
    val rTagged = right.select(
      Seq(col(key), col(time), lit(0).as("_tag")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valCols.map(col) :+ col(time): _*).as("_asof"): _*)
    // tag 0 (right) sorts before tag 1 (left) at equal time ⇒ a right row
    // at exactly the left row's time matches (inclusive, ASOF `>=`).
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(
        Seq(col(key), col(time)) ++ leftOther.map(col) ++
          (valCols :+ time).map(v => col("_asof")(v).as(s"$prefix$v")): _*)
  }
}
