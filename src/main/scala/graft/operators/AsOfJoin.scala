package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left ("probe") row, the most recent right
  * ("quote") row with the same key and time ≤ the probe time.
  *
  * Spark has no native as-of join; per the preference order this is
  * (a) a composition of built-ins: tag both sides, UNION, one window
  * pass per key ordered by (time, side, id) carrying the last non-null
  * quote id forward. Exactly ONE shuffle (the window partitioning) —
  * same cost as a sort-merge join, and no per-row range probing, so it
  * scales to 100 TB the same way any keyed window does. Skewed keys
  * fall under AQE's skew handling like any other window/join key.
  *
  * Determinism: ties on time are broken by (side, id): quotes at
  * exactly the probe time are visible to the probe, and among
  * equal-time quotes the highest id wins.
  */
object AsOfJoin {

  /** @param probe   left side (rows to enrich)
    * @param quote   right side (rows to look up)
    * @param outCols (name, column-over-the-tagged-union) for the output
    */
  def apply(
      probe: DataFrame, probeKey: Column, probeTime: Column, probeId: Column,
      quote: DataFrame, quoteKey: Column, quoteTime: Column, quoteId: Column): DataFrame = {
    val p = probe.select(
      probeKey.as("k"), probeTime.as("t"),
      lit(1).as("side"), lit(null).cast("long").as("qid"), probeId.as("pid"))
    val q = quote.select(
      quoteKey.as("k"), quoteTime.as("t"),
      lit(0).as("side"), quoteId.as("qid"), lit(null).cast("long").as("pid"))
    val w = Window
      .partitionBy(col("k"))
      .orderBy(col("t"), col("side"), coalesce(col("qid"), col("pid")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.union(p)
      .withColumn("asof_qid", last(col("qid"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("k"), col("t"), col("pid"), col("asof_qid"))
  }
}
