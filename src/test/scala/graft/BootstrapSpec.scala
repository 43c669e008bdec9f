package graft

import graft.catalog.Bootstrap
import graft.model.Schemas
import graft.runtime.WatermarkStore

/** Catalog bootstrap (SURVEY §2.1 S6, §3.2): idempotent create + seed. */
class BootstrapSpec extends SparkTestBase {

  test("setup creates all targets + seeded watermarks, idempotently") {
    val wh = tmpDir("warehouse")
    val boot = new Bootstrap(spark, wh)
    boot.setup()
    Schemas.targets.foreach { case (name, schema) =>
      if (Bootstrap.partitioning.contains(name))
        // partitioned tables have no data files until first append; the sink
        // treats the bootstrapped dir as empty
        assert(graft.merge.MergeSink.readTarget(spark, boot.tablePath(name)).isEmpty, name)
      else {
        val df = spark.read.parquet(boot.tablePath(name))
        assert(df.schema.fieldNames.toSeq == schema.fieldNames.toSeq, name)
        assert(df.count() == 0, name)
      }
    }
    val store = new WatermarkStore(spark, boot.tablePath("etl_watermark"))
    assert(store.all().keySet == Bootstrap.defaultSourceTables.toSet)
    assert(store.since("fc_scenario", 90).before(
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))

    // idempotent re-run: nothing duplicated, existing state untouched
    store.advance("fc_scenario", 42,
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    boot.setup()
    assert(store.all().size == Bootstrap.defaultSourceTables.size)
    assert(store.get("fc_scenario").get.rowsLastRun == 42)
  }
}
