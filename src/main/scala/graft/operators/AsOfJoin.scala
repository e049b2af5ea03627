package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with
  * the greatest `rightTs <= leftTs` within the same key group (the
  * operator DuckDB spells `ASOF LEFT JOIN`; Spark has no built-in).
  *
  * Implementation is the union-and-carry pattern, composed entirely
  * from built-ins (SURVEY §7.3 preference (a)): tag both inputs, union,
  * and run ONE window pass per key ordered by (ts, side) where right
  * rows sort before left rows at equal timestamps (making the match
  * inclusive); `last(..., ignoreNulls)` carries the most recent right
  * payload forward onto each left row.
  *
  * 100 TB notes: exactly one shuffle of |L|+|R| rows on the key columns
  * and one per-partition sort — the same cost profile as a sort-merge
  * join, with no range-explosion risk. Skewed keys split under AQE like
  * any window shuffle.
  *
  * Right rows must be unique per (keys, ts) — pre-aggregate otherwise
  * (the carried value among same-ts duplicates would be tie-ambiguous).
  */
object AsOfJoin {

  /** @param left      driving rows (all columns preserved)
    * @param right     lookup rows; `payloadCols` are carried onto matches
    * @param keys      equi-join key column names (present on both sides)
    * @param leftTs    left ordering column name
    * @param rightTs   right ordering column name
    * @param payloadCols right columns to carry (emitted as-is, null when
    *                    no right row precedes the left row)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payloadCols.map(col): _*).schema.fields
            .map(_.copy(nullable = true)))))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct(payloadCols.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__r")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
      .unionByName(r.select(
        (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__r")): _*)
        .withColumns(leftCols.filterNot(keys.contains)
          .map(c => s"__l_$c" -> lit(null).cast(
            left.schema(c).dataType)).toMap))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    carried.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c) else col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
