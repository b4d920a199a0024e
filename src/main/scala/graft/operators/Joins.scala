package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join, composed from built-ins — preference
  * (a) of the custom-operator ladder: no custom SparkPlan needed.
  *
  * Implementation: tag and union both sides, sort within each key
  * partition by (ts, side) with the right side first at equal
  * timestamps (ASOF's `left.ts >= right.ts` includes equality), then a
  * running `last(_, ignoreNulls)` window carries the most recent right
  * row forward onto each left row. ONE shuffle of left+right on the key
  * — the same cost as a regular sort-merge join and immune to the
  * per-left-row range-scan blowup a naive theta join would produce.
  */
object Joins {

  /** Time-range self/pair join: all (a, b) with the same key and
    * `0 < b.ts - a.ts <= window`. A naive theta join is O(|key group|²)
    * *scanned* per partition with no pruning; bucketizing `ts` to
    * `window`-sized cells and exploding the right side into its cell and
    * the preceding one turns it into an equi-join on (key, cell) — each
    * qualifying pair is produced exactly once, and the shuffle key
    * carries the time locality. This is the composition pattern for
    * interval joins at scale (cf. Flink interval joins / range-bucketing).
    *
    * @param windowMicros match window in microseconds (ts columns are
    *                     TimestampType)
    */
  def rangeJoinPairs(events: DataFrame, key: String, tsCol: String,
                     windowMicros: Long): DataFrame = {
    val cell = (c: Column) => floor(unix_micros(c) / lit(windowMicros))
    val a = events.select(col(key), col(tsCol).as("ts_a"))
      .withColumn("_cell", cell(col("ts_a")))
    val b = events.select(col(key), col(tsCol).as("ts_b"))
      .withColumn("_cell_real", cell(col("ts_b")))
      .withColumn("_cell", explode(array(col("_cell_real") - 1, col("_cell_real"))))
      .drop("_cell_real")
    a.join(b, Seq(key, "_cell"))
      .filter(unix_micros(col("ts_b")) > unix_micros(col("ts_a")) &&
        unix_micros(col("ts_b")) <= unix_micros(col("ts_a")) + windowMicros)
      .drop("_cell")
  }

  /** @param left      left rows (keep all their columns)
    * @param right     right rows; `rightCols` are carried onto matches
    * @param key       equi-join key column name (both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right columns to carry (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Map[String, String]): DataFrame = {
    val leftKeep = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val lWithNulls = rightCols.foldLeft(l) { case (df, (src, dst)) =>
      df.withColumn(s"_r_$dst", lit(null).cast(right.schema(src).dataType))
    }
    val rBase = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
    val rRenamed = rightCols.foldLeft(rBase) { case (df, (src, dst)) =>
      df.withColumn(s"_r_$dst", col(src))
    }
    val cols = Seq(col(key).as(key), col("_ts"), col("_side")) ++
      leftKeep.filter(_ != key).map(c => col(c)) ++
      rightCols.values.map(d => col(s"_r_$d"))
    val lSel = lWithNulls.select(cols: _*)
    val rSel = rRenamed.select(
      (Seq(col(key).as(key), col("_ts"), col("_side")) ++
        leftKeep.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.values.map(d => col(s"_r_$d"))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.values.foldLeft(lSel.unionByName(rSel)) { (df, d) =>
      df.withColumn(s"_c_$d", last(col(s"_r_$d"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("_side") === 1)
    val finalCols = leftKeep.map(col) ++
      rightCols.values.map(d => col(s"_c_$d").as(d))
    out.select(finalCols: _*)
  }

  /** Point-in-interval join via the custom BroadcastRangeJoin operator
    * (graft.plans.BroadcastRangeJoin — sorted broadcast + binary search;
    * see the plan node's doc for the O(n·m) BNLJ cliff it replaces).
    * `p`, `lo`, `hi` must be BIGINT columns; `intervals` is the small
    * side and broadcasts whole.
    */
  def broadcastRangeJoin(points: DataFrame, intervals: DataFrame,
                         p: String, lo: String, hi: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = points.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.BroadcastRangeJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.BroadcastRangeJoinStrategy
    }
    Bridge.ofRows(spark, graft.plans.BroadcastRangeJoin(
      Bridge.expression(points(p)),
      Bridge.expression(intervals(lo)),
      Bridge.expression(intervals(hi)),
      points.queryExecution.analyzed,
      intervals.queryExecution.analyzed))
  }
}
