package graft

import java.sql.Timestamp

import graft.streaming.{Broker, FileTopicBroker, KafkaBroker}
import graft.streaming.EventStreaming.Event

/** The broker interface: producer → per-entity topic → consumer with
  * offset/ack semantics in the streaming checkpoint (the reference's
  * RabbitMQ contract, rabbitmq_client.py / producer.py / consumer.py). */
class BrokerSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(86400000L + min * 60000L)
  private val schema = org.apache.spark.sql.Encoders.product[Event].schema

  test("two topics: routed publishes stay isolated and consume to separate raw zones") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_broker").toFile.getAbsolutePath
    val broker = new FileTopicBroker(s"$root/q")

    // producer.py: each entity routes to its own queue
    broker.publish(Seq(
      Event(1, ts(1), 1, "customer_created", 1.0),
      Event(2, ts(2), 2, "customer_created", 2.0)).toDF(), "khach_hang")
    broker.publish(Seq(
      Event(10, ts(3), 1, "order_placed", 50.0)).toDF(), "dat_hang")

    val qC = broker.consume(spark, "khach_hang", schema,
      s"$root/raw/khach_hang", s"$root/cp/khach_hang", "run_b1")
    val qO = broker.consume(spark, "dat_hang", schema,
      s"$root/raw/dat_hang", s"$root/cp/dat_hang", "run_b1")
    try {
      qC.processAllAvailable(); qO.processAllAvailable()
      val c = spark.read.parquet(s"$root/raw/khach_hang")
      val o = spark.read.parquet(s"$root/raw/dat_hang")
      assert(c.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      assert(o.select("event_id").as[Long].collect().toSeq == Seq(10L))
      // staged metadata names the topic (the consumer's queue tag)
      assert(c.select("_source").distinct().as[String].collect().toSeq
        == Seq("topic:khach_hang"))
      assert(o.select("_source").distinct().as[String].collect().toSeq
        == Seq("topic:dat_hang"))
    } finally { qC.stop(); qO.stop() }
  }

  test("replay after restart: the checkpoint is the ack ledger — committed messages are not re-delivered") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_broker_rs").toFile.getAbsolutePath
    val broker = new FileTopicBroker(s"$root/q")

    broker.publish(Seq(Event(1, ts(1), 1, "a", 1.0)).toDF(), "khach_hang")
    broker.publish(Seq(Event(10, ts(2), 2, "b", 2.0)).toDF(), "dat_hang")
    val q1C = broker.consume(spark, "khach_hang", schema,
      s"$root/raw/c", s"$root/cp/c", "run_r1")
    val q1O = broker.consume(spark, "dat_hang", schema,
      s"$root/raw/o", s"$root/cp/o", "run_r1")
    q1C.processAllAvailable(); q1O.processAllAvailable()
    q1C.stop(); q1O.stop()

    // messages arrive while no consumer is running (queued durably),
    // including a replay of message 1 as a NEW file (at-least-once producer)
    broker.publish(Seq(
      Event(1, ts(1), 1, "a", 1.0),
      Event(2, ts(5), 3, "a", 3.0)).toDF(), "khach_hang")
    broker.publish(Seq(Event(11, ts(6), 4, "b", 4.0)).toDF(), "dat_hang")

    // restart with the SAME checkpoints: consumption resumes from the last
    // ack — already-committed files are skipped, queued files are delivered
    val q2C = broker.consume(spark, "khach_hang", schema,
      s"$root/raw/c", s"$root/cp/c", "run_r2")
    val q2O = broker.consume(spark, "dat_hang", schema,
      s"$root/raw/o", s"$root/cp/o", "run_r2")
    try {
      q2C.processAllAvailable(); q2O.processAllAvailable()
      val c = spark.read.parquet(s"$root/raw/c")
      // 1 from run_r1, then the broker-replayed 1 + new 2 from run_r2: the
      // raw zone is at-least-once (replays are a PRODUCER property; the
      // downstream dedupStream handles them) — but the run_r1 batch itself
      // must appear exactly once, proving the committed file wasn't re-read
      assert(c.where($"_run_id" === "run_r1").count() == 1)
      assert(c.where($"_run_id" === "run_r2").select("event_id")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      val o = spark.read.parquet(s"$root/raw/o")
      assert(o.where($"_run_id" === "run_r1").select("event_id").as[Long].collect().toSeq == Seq(10L))
      assert(o.where($"_run_id" === "run_r2").select("event_id").as[Long].collect().toSeq == Seq(11L))
    } finally { q2C.stop(); q2O.stop() }
  }

  test("transport flag: forUri picks the Kafka wiring or the file-topic queue") {
    assert(Broker.forUri("kafka:broker1:9092,broker2:9092").isInstanceOf[KafkaBroker])
    assert(Broker.forUri("/data/queues").isInstanceOf[FileTopicBroker])
    // the Kafka transport is compile-checked wiring: constructing it (and
    // its JSON encode plan on the publish side) must not require a broker
    val k = new KafkaBroker("localhost:9092")
    assert(k != null)
  }
}
