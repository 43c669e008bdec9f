package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Ship a Hadoop `Configuration` into executor closures.
  * `SerializableConfiguration` is `private[spark]`; this package sits
  * under `org.apache.spark`, so it can construct one without reflection
  * (same rationale as [[SessionBridge]]). Used by the distributed footer
  * scan in `TxTable.convertInPlace` — a 100 TB adoption reads millions of
  * footers and must not serialize them through the driver. */
object ConfBridge {
  def serializable(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)
}
