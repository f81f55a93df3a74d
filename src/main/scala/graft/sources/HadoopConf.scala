package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Serializable carrier for the session's Hadoop job configuration.
  *
  * Executor-side file IO (the binary sources' `foreachPartition` /
  * `mapPartitions` closures) must see the SAME Hadoop conf the driver
  * session resolved — object-store credentials, endpoints, and timeouts
  * all live there (`spark.hadoop.*` keys plus session overrides). A
  * fresh `new Configuration()` on the executor silently drops every one
  * of those, which works on local disk and breaks on the first real
  * S3/ABFS deployment. Hadoop's `Configuration` is not
  * `java.io.Serializable`, so this wrapper round-trips it through its
  * own `Writable` `write`/`readFields` — the same trick Spark uses
  * internally (`org.apache.spark.util.SerializableConfiguration`, which
  * is `private[spark]` and so not usable from library code).
  */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[graft] object SerializableHadoopConf {
  /** Snapshot the session's resolved job conf for shipping into a task
    * closure. `sessionState.newHadoopConf()` folds session-level SQL conf
    * overrides on top of the SparkContext's Hadoop conf — the exact conf
    * a built-in file source task would receive.
    */
  def from(spark: SparkSession): SerializableHadoopConf =
    new SerializableHadoopConf(spark.sessionState.newHadoopConf())
}
