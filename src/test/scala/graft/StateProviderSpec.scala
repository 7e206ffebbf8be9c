package graft

/** Conf-scoping semantics of [[GraftSession.withStateProvider]] — the
  * per-stage provider dial. What a streaming query does with the conf
  * (pins it at start via the cloned session) is Spark's documented
  * contract, exercised end-to-end by `PipelineE2EProbe sustain ...
  * rocksapply` in its own JVM; the RocksDB JNI itself deliberately
  * stays OUT of the shared test JVM (known benign teardown race at
  * exit would flake the whole suite). This spec pins what the helper
  * owns: exact conf values per provider name, restore of
  * previously-set values on every exit path, and loud failure on an
  * unknown name. */
class StateProviderSpec extends SparkSuite {

  private val Provider = "spark.sql.streaming.stateStore.providerClass"
  private val Changelog =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  test("rocksdb sets provider + changelog inside, restores the defaults after") {
    // getOption reports the conf's DEFAULT (the HDFS provider), not None
    val prov0 = spark.conf.getOption(Provider)
    val chg0 = spark.conf.getOption(Changelog)
    assert(prov0.exists(_.contains("HDFSBackedStateStoreProvider")))
    GraftSession.withStateProvider(spark, "rocksdb") {
      assert(spark.conf.get(Provider) ===
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      assert(spark.conf.get(Changelog) === "true")
    }
    assert(spark.conf.getOption(Provider) === prov0,
      "provider conf must read its default again after the scope")
    assert(spark.conf.getOption(Changelog) === chg0)
  }

  test("previously-set values are restored, including on the exception path") {
    spark.conf.set(Provider, "com.example.CustomProvider")
    try {
      GraftSession.withStateProvider(spark, "hdfs") {
        assert(spark.conf.get(Provider) ===
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      }
      assert(spark.conf.get(Provider) === "com.example.CustomProvider")
      intercept[RuntimeException] {
        GraftSession.withStateProvider(spark, "rocksdb") {
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get(Provider) === "com.example.CustomProvider",
        "exception exit must still restore the previous provider")
      assert(spark.conf.getOption(Changelog).isEmpty)
    } finally spark.conf.unset(Provider)
  }

  test("unknown provider name fails loudly without touching conf") {
    val prov0 = spark.conf.getOption(Provider)
    intercept[IllegalArgumentException] {
      GraftSession.withStateProvider(spark, "rocks") { fail("must not run") }
    }
    assert(spark.conf.getOption(Provider) === prov0)
  }
}
