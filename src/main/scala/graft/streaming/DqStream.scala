package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING data-quality monitoring: `dq_constraints`' row-local
  * audit (operators/Quality.scala) maintained as RUNNING totals while
  * rows arrive — the continuous form a 100 TB ingest runs so a corrupt
  * upstream partition pages someone within one micro-batch instead of
  * at the nightly audit.
  *
  * Shape: each arriving row explodes into one (check_name, violation)
  * flag per ROW-LOCAL constraint (a stateless projection), then one
  * 7-key streaming aggregation in Update mode keeps (checked,
  * violations) current per constraint. Partial aggregation combines
  * map-side, so the tiny key space is a non-issue; state is 7 rows of
  * two counters. The key-uniqueness constraint is deliberately NOT
  * monitored here — it needs per-key state proportional to the key
  * space (the batch operator's two-level agg is its read-time home);
  * everything row-local streams. */
object DqStream {

  def monitor(src: DataFrame): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    def flag(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    val flags = src.select(
      flag($"l_orderkey".isNull || $"l_linenumber".isNull).as("v_key_null"),
      flag(!($"l_quantity" > 0.0)).as("v_qty_range"),
      flag(!($"l_discount" >= 0.0 && $"l_discount" <= 0.1)).as("v_disc_range"),
      flag(!($"l_tax" >= 0.0)).as("v_tax_range"),
      flag(!$"l_returnflag".isin("A", "N", "R")).as("v_rflag_enum"),
      flag(!$"l_linestatus".isin("O", "F")).as("v_lstatus_enum"))
    flags.select(expr(
      """stack(6,
         'key_not_null',      v_key_null,
         'quantity_positive', v_qty_range,
         'discount_in_0_0.1', v_disc_range,
         'tax_non_negative',  v_tax_range,
         'returnflag_in_ANR', v_rflag_enum,
         'linestatus_in_OF',  v_lstatus_enum)
         AS (check_name, violation)"""))
      .groupBy($"check_name")
      .agg(count(lit(1)).as("checked"), sum($"violation").as("violations"))
      .withColumn("ok", $"violations" === 0L)
  }
}
