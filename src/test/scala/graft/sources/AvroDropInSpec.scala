package graft.sources

import graft.SparkSpecBase

/** Self-verifying gate for the `format("avro")` batch-source claim —
  * the KafkaDropInSpec device applied to Avro. This environment ships
  * avro-core jars (`/opt/spark/jars/avro-1.12.1.jar`) but NOT the
  * `spark-avro` DataSource module, so `format("avro")` cannot resolve
  * here. The spec CANCELS while the module is absent; the day a
  * `spark-avro` jar lands it automatically starts asserting a full
  * write→read roundtrip preserving values and schema.
  */
class AvroDropInSpec extends SparkSpecBase {

  /** Mirror DataSource.lookupDataSource: "avro" resolves iff some jar
    * REGISTERS a DataSourceRegister with that short name — Spark 4
    * ships the avro serde classes inside spark-sql, so a bare
    * Class.forName check would false-positive (measured here). */
  private def sparkAvroPresent: Boolean = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[org.apache.spark.sql.sources.DataSourceRegister],
        Thread.currentThread().getContextClassLoader)
      .asScala.exists(_.shortName().equalsIgnoreCase("avro"))
  }

  test("format(\"avro\") roundtrips values and schema " +
    "[auto-skips while no spark-avro jar is on the classpath]") {
    assume(sparkAvroPresent, "spark-avro DataSource jar not present")
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "tag", "x")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    df.write.format("avro").mode("overwrite").save(dir)
    val back = spark.read.format("avro").load(dir)
    assert(back.schema === df.schema)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }
}
