package graft.sources

import graft.streaming.MbStream

/** Broker-envelope bridges over the generic append API.
  *
  * The reference ships MQTT and Celery connectors whose engine-relevant
  * content is the MESSAGE ENVELOPE each one appends to the stream
  * (contrib/mqtt.py:62-69, contrib/celery.py:72-80); the broker client
  * itself is an external library it tests with a mock
  * (test_mqtt.py:21-43). Same trick here: the client is an injectable
  * trait, the envelope construction and append path are real and tested,
  * and a production deployment supplies a thin adapter over its broker
  * client of choice.
  */
object Envelopes {

  /** Minimal JSON string escaping for envelope fields we control. */
  private[sources] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** MQTT stream envelope (contrib/mqtt.py:62-69): `{topic, payload, qos,
    * retain}`. `payloadJson` rides as raw JSON (the reference json.loads the
    * broker payload before enveloping, mqtt.py:38-39 — i.e. the payload is a
    * nested JSON value, not a quoted string).
    */
  def mqttEnvelope(topic: String, payloadJson: String, qos: Int, retain: Boolean): String =
    s"""{"topic":${jstr(topic)},"payload":$payloadJson,"qos":$qos,"retain":$retain}"""

  /** Celery task-event envelope (contrib/celery.py:72-80): `{task_event,
    * task_name, task_id, task_info, task_state, task_runtime}`.
    * `taskInfoJson` is the task's info dict as raw JSON.
    */
  def celeryTaskEnvelope(
      taskEvent: String,
      taskName: String,
      taskId: String,
      taskInfoJson: String,
      taskState: String,
      taskRuntimeSeconds: Double): String =
    s"""{"task_event":${jstr(taskEvent)},"task_name":${jstr(taskName)},""" +
      s""""task_id":${jstr(taskId)},"task_info":$taskInfoJson,""" +
      s""""task_state":${jstr(taskState)},"task_runtime":$taskRuntimeSeconds}"""
}

/** The slice of an MQTT client the source/sink need (paho surface used by
  * the reference, contrib/mqtt.py:29-52). Injectable; tests use a fake.
  */
trait MqttClientLike {
  def connect(): Unit
  def subscribe(topic: String): Unit
  /** Register the inbound handler: (topic, payloadJson, qos, retain). */
  def onMessage(handler: (String, String, Int, Boolean) => Unit): Unit
  def publish(topic: String, payloadJson: String): Unit
  def disconnect(): Unit
}

/** MQTT → stream source (reference MQTTSource, contrib/mqtt.py:55-77):
  * subscribes on connect and appends one envelope per inbound message.
  * The reference's `loop_forever` is the client adapter's concern — the
  * injectable client delivers via callback.
  */
final class MqttSource(client: MqttClientLike, topic: String) {
  def stream(target: MbStream): Unit = {
    client.onMessage { (t, payloadJson, qos, retain) =>
      target.append(Envelopes.mqttEnvelope(t, payloadJson, qos, retain))
    }
    client.connect()
    client.subscribe(topic)
  }

  /** Reference `source.cancel()` (contrib/mqtt.py:76-77). */
  def cancel(): Unit = client.disconnect()
}

/** Window → MQTT sink (reference MQTTSink, contrib/mqtt.py:80-84): each
  * row of the forwarded window publishes as one JSON message — on the
  * EXECUTORS. `clientFactory` must be a serializable thunk (capture broker
  * config, not a live client); each non-empty partition builds its own
  * client, connects, publishes its rows, and disconnects, so the window
  * never funnels through the driver and a large forwarded batch publishes
  * in parallel. Cross-partition publish order is unordered — MQTT topics
  * carry no order guarantee across connections anyway. Empty partitions
  * open no connection.
  */
final class MqttSink(clientFactory: () => MqttClientLike, topic: String)
    extends Serializable {
  def put(df: org.apache.spark.sql.DataFrame): Unit = {
    val t = topic
    val mk = clientFactory
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      if (rows.hasNext) {
        val client = mk()
        client.connect()
        try rows.foreach(m => client.publish(t, m))
        finally client.disconnect()
      }
    }
  }
}

/** Celery-style app-event source (reference CeleryEventSource,
  * contrib/celery.py:50-98): task events append as task-info envelopes,
  * non-task events (no uuid) append verbatim. The broker receive loop is
  * the adapter's concern; this is the `_append` path (celery.py:82-93).
  */
final class CeleryEventSource {
  @volatile private var target: Option[MbStream] = None
  @volatile private var cancelled = false

  def stream(t: MbStream): Unit = { target = Some(t); cancelled = false }

  /** A task event (has a uuid): envelope per contrib/celery.py:72-80. */
  def taskEvent(
      event: String,
      name: String,
      uuid: String,
      infoJson: String,
      state: String,
      runtimeSeconds: Double): Unit =
    if (!cancelled) target.foreach(_.append(
      Envelopes.celeryTaskEnvelope(event, name, uuid, infoJson, state, runtimeSeconds)))

  /** A non-task event: appended verbatim (celery.py:92-93). */
  def rawEvent(eventJson: String): Unit =
    if (!cancelled) target.foreach(_.append(eventJson))

  /** Reference `cancel()` → receiver.should_stop (celery.py:95-98). */
  def cancel(): Unit = cancelled = true
}
