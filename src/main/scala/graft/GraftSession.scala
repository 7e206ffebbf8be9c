package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's scale-oriented defaults.
  *
  * local[N] here, but every knob is chosen as it would be on a large
  * cluster: AQE on (runtime re-planning, skew-join splitting, partition
  * coalescing), shuffle partitions sized to the parallelism rather than
  * the 200 default, and a broadcast threshold that lets dimension tables
  * (region/nation/supplier/part at our scale) broadcast instead of
  * shuffling the fact table.
  *
  * Streaming state-store provider dial (NOT defaulted here — it is a
  * per-job choice): the default HDFSBackedStateStoreProvider keeps each
  * store as a JVM-heap map and re-snapshots the WHOLE store every
  * commit — fastest while keys-per-store stays small (≤ ~25k measured),
  * superlinear beyond. Past that, set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
  * with `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing
  * .enabled=true`, which commits only each batch's delta: measured 3.9×
  * faster ingest and 3.1× faster restart-drain at 1M in-flight keys,
  * near-linear to 4M (SCALING.md "provider crossover";
  * `tools.StateResumeProbe <keys> <parts> <hdfs|rocksdb>` re-measures).
  */
object GraftSession {
  def builderDefaults(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read the raw int64 nanos and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builderDefaults(SparkSession.builder().master(s"local[$cores]").appName("graft"), cores)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the parquet row groups; at 100 TB
  * the same call against a partitioned table additionally gets partition
  * pruning for free.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/$name.parquet"), name)

  /** Timestamp columns vary by generator vintage: events.ts has shipped
    * both as TIMESTAMP(NANOS) (surfaced as int64 nanos via the
    * nanosAsLong flag, truncated to µs here) and as TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Normalize every
    * vintage to a µs TimestampType: with the session pinned to UTC the
    * NTZ→LTZ cast is epoch-identical, and oracles compare at epoch_us. */
  def normalize(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    tsFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(tsFixed)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** Streaming twin of [[load]]: reads `streamDir` as a file stream
    * with the table's PHYSICAL parquet schema (whatever vintage is on
    * disk), then applies the same normalization — so streaming specs
    * and pipelines see exactly the frame batch code sees. `schemaFrom`
    * points at any parquet written with the same vintage (usually the
    * testdata file the fixture was staged from). */
  def loadStream(spark: SparkSession, streamDir: String, name: String,
      schemaFrom: String): DataFrame =
    normalize(
      spark.readStream.schema(spark.read.parquet(schemaFrom).schema).parquet(streamDir),
      name)
}
