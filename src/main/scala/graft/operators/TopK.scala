package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graftbridge.Bridge

/** DataFrame API over the custom grouped-top-k operator
  * (graft.plans.GroupedTopK — see its doc for the why and the shuffle
  * economics). `orderCols` must form a total order within each group
  * for a deterministic result.
  */
object TopK {
  def groupedTopK(df: DataFrame, groupCols: Seq[String],
                  orderCols: Seq[Column], k: Int): DataFrame = {
    // sessions built without GraftExtensions (a library user's plain
    // session) still need the strategy or the planner cannot place the
    // node — experimental.extraStrategies is runtime-mutable and additive
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GroupedTopKStrategy
    }
    val group = groupCols.map(c => Bridge.expression(df(c)))
    val order = orderCols.map { c =>
      Bridge.convertedExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    Bridge.ofRows(df.sparkSession,
      graft.plans.GroupedTopK(group, order, k, df.queryExecution.analyzed))
  }
}
