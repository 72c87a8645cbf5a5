package graft.streaming

import graft.SparkSpecBase

/** Self-verifying gate for the `format("kafka")` drop-in claim
  * (SURVEY.md S5; HttpIngest scaladoc). No Kafka connector jar ships
  * in /opt/spark/jars in this environment, so the claim was previously
  * untestable prose. This spec makes it self-verifying: it CANCELS
  * (not passes, not fails) while the jar is absent, and the day a
  * `spark-sql-kafka-0-10` jar lands on the classpath it automatically
  * starts asserting that a kafka readStream resolves and exposes the
  * wire schema the streaming pipeline expects — plan-time only, no
  * broker needed.
  */
class KafkaDropInSpec extends SparkSpecBase {

  private def kafkaJarPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  test("format(\"kafka\") resolves and exposes the key/value/topic wire " +
    "schema [auto-skips while no connector jar is on the classpath]") {
    assume(kafkaJarPresent, "spark-sql-kafka-0-10 connector jar not present")
    val df = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", "localhost:19092")
      .option("subscribe", "graft-test-topic")
      .load()
    assert(df.isStreaming)
    val cols = df.schema.fieldNames.toSet
    for (c <- Seq("key", "value", "topic", "partition", "offset", "timestamp"))
      assert(cols.contains(c), s"kafka wire schema missing $c")
  }
}
