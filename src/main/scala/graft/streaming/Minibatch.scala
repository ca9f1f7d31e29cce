package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Front-door facade — the engine analogue of the reference's `@streaming`
  * decorator / `make_emitter` dispatch (minibatch/__init__.py:15-75,
  * 89-120): choose the emitter by configuration (`size=` → CountWindow;
  * `interval=` → RelaxedTimeWindow, or FixedTimeWindow when relaxed=false;
  * neither → size=1, __init__.py:94), wire an optional source bridge and
  * sink, then run.
  *
  * {{{
  * val mb = Minibatch(spark, "/tmp/streams")
  * val query = mb.streaming("sensor").size(2).keep(true)
  *   .emit((windowId, df) => ...)
  *   .start()
  * }}}
  */
final case class Minibatch(spark: SparkSession, root: String) {
  val registry = new StreamRegistry(spark, root)

  def stream(name: String): MbStream = registry.getOrCreate(name)

  def streaming(name: String): EmitterBuilder = EmitterBuilder(stream(name))
}

final case class EmitterBuilder(
    stream: MbStream,
    strategy: Option[EmitterRunner.Strategy] = None,
    keepWindows: Boolean = false,
    trigger: Trigger = Trigger.AvailableNow(),
    emitFn: Option[(Long, DataFrame) => Unit] = None,
    sinkFn: Option[DataFrame => Unit] = None,
    workers: Int = 1,
    filesPerTrigger: Option[Int] = None,
    batchSinkFn: Option[(DataFrame, Long) => Unit] = None) {

  /** max_workers= → parallel window emit within a micro-batch (reference
    * ProcessPoolExecutor, window.py:84).
    */
  def maxWorkers(n: Int): EmitterBuilder = copy(workers = n)

  /** Micro-batch size cap (reference Batcher/poll-batch size, A4/S3). */
  def maxFilesPerTrigger(n: Int): EmitterBuilder = copy(filesPerTrigger = Some(n))

  /** size= → CountWindow (reference __init__.py:107-115). */
  def size(n: Int): EmitterBuilder = copy(strategy = Some(EmitterRunner.CountWindow(n)))

  /** interval= → RelaxedTimeWindow, or FixedTimeWindow when relaxed=false. */
  def interval(seconds: Long, relaxed: Boolean = true): EmitterBuilder =
    copy(strategy = Some(
      if (relaxed) EmitterRunner.RelaxedTimeWindow
      else EmitterRunner.FixedTimeWindow(seconds)),
      trigger = Trigger.ProcessingTime(seconds * 1000))

  /** emitter= → custom strategy (reference custom WindowEmitter, A9). */
  def emitter(s: EmitterRunner.Strategy): EmitterBuilder = copy(strategy = Some(s))

  /** persist(keep=True) → window history table (reference __init__.py:116). */
  def keep(k: Boolean): EmitterBuilder = copy(keepWindows = k)

  def withTrigger(t: Trigger): EmitterBuilder = copy(trigger = t)

  def emit(fn: (Long, DataFrame) => Unit): EmitterBuilder = copy(emitFn = Some(fn))

  /** forward() → sink.put (reference window.py:155-157): the emitted window
    * is forwarded to the sink after the user emit function runs.
    */
  def sink(fn: DataFrame => Unit): EmitterBuilder = copy(sinkFn = Some(fn))

  /** Batch-level sink receiving the micro-batch id — use with
    * [[graft.sources.IdempotentTableSink]] for replay-safe output.
    */
  def batchSink(fn: (DataFrame, Long) => Unit): EmitterBuilder = copy(batchSinkFn = Some(fn))

  def start(): StreamingQuery = {
    // neither size nor interval given → size=1 (reference __init__.py:94)
    val strat = strategy.getOrElse(EmitterRunner.CountWindow(1))
    val emitter = emitFn.getOrElse((_: Long, _: DataFrame) => ())
    val combined: (Long, DataFrame) => Unit = (id, df) => {
      emitter(id, df)
      sinkFn.foreach(_(df))
    }
    EmitterRunner.start(stream, strat, combined, keepWindows, trigger,
      maxWorkers = workers, maxFilesPerTrigger = filesPerTrigger,
      batchSink = batchSinkFn)
  }

  /** Blocking drain (the reference's run(blocking=True) against a finite
    * buffer; deterministic in tests).
    */
  def run(): Unit = {
    val q = withTrigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
