package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-backfill primitive: for
  * each left ("probe") row, attach the LATEST right ("quote") row with
  * the same keys and `rightTime <= leftTime`. Spark has no native
  * merge_asof; the naive range-join formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + keep-max) explodes to a
  * per-key cartesian before pruning, and Catalyst plans non-equi joins
  * as broadcast-nested-loop at worst.
  *
  * This formulation is union + ordered window instead: tag both sides,
  * union on a common schema, and run ONE window per key ordered by
  * `(time, side, tieBreak)` with right rows sorting before probes at
  * equal time (so "as of" is inclusive). `last(value, ignoreNulls)` over
  * the unbounded-preceding frame carries the latest quote forward into
  * each probe row.
  *
  * Scale shape: exactly one shuffle — both sides co-partition on the
  * key — and per-row state is a single carried struct; cost is
  * `O(|L|+|R|)` rows sorted within each key, never `|L|×|R|` pairs. The
  * right values travel as ONE struct so every attached column comes from
  * the SAME quote row even when some of its fields are null.
  */
object AsofJoin {

  /** @param keys       equality keys present on both sides
    * @param leftTime   probe-time column on `left`
    * @param rightTime  quote-time column on `right`
    * @param rightVals  right columns to attach (emitted as `prefix+name`)
    * @param tieBreak   right columns ordering simultaneous quotes (the
    *                   LAST in this order wins); required for
    *                   determinism when (key, rightTime) can repeat
    * @param prefix     prefix for the attached columns
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      tieBreak: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.filterNot(keys.contains).toSeq
    val rvType = right.select(struct(rightVals.map(col): _*).as("v"))
      .schema.head.dataType
    val tbTypes = tieBreak.map(c => c -> right.schema(c).dataType)

    val rightSide = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(rightVals.map(col): _*).as("__rv")) ++
        tbTypes.map { case (c, _) => col(c).as(s"__tb_$c") } ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val leftSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(rvType).as("__rv")) ++
        tbTypes.map { case (c, t) => lit(null).cast(t).as(s"__tb_$c") } ++
        lCols.map(c => col(c).as(s"__l_$c")): _*)

    val order: Seq[Column] =
      col("__t").asc +: col("__side").asc +:
        tieBreak.map(c => col(s"__tb_$c").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightSide.unionByName(leftSide)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          lCols.map(c => col(s"__l_$c").as(c)) ++
          rightVals.map(v => col(s"__last.$v").as(s"$prefix$v")): _*)
  }
}
