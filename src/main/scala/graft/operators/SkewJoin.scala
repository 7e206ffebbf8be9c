package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's
  * runtime skew-join splitting isn't available (e.g. the skew is in a
  * broadcast-ineligible aggregation upstream, or on a streaming path
  * where AQE is disabled).
  *
  * The hot side's key is widened with a random salt in [0, salts); the
  * cold side is exploded once per salt value so every (key, salt)
  * bucket finds its match. One hot-side row → one shuffled row (just
  * better distributed); one cold-side row → `salts` rows, so use this
  * when cold is small relative to hot (the usual skew shape: a huge
  * fact with a few hot keys joining a modest dimension).
  */
object SkewJoin {

  def salted(
      hot: DataFrame, hotKey: Column,
      cold: DataFrame, coldKey: Column,
      salts: Int): DataFrame = {
    // deterministic spread: hash of the full row modulo salts, not
    // rand() — keeps the join replayable (streaming/retry safe)
    val saltedHot = hot.withColumn("_salt",
      pmod(xxhash64(struct(hot.columns.map(col): _*)), lit(salts)).cast("int"))
    val saltedCold = cold
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedHot.join(saltedCold,
      hotKey === coldKey && saltedHot("_salt") === saltedCold("_salt"))
      .drop("_salt")
  }
}
