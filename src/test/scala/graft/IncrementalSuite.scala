package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** Invariant specs for incremental aggregate maintenance
  * (operators/Incremental.scala). The agg_incremental oracle checks the
  * merged state equals a full recompute cross-engine; these check the
  * algebra (mergeability, associativity, sketch behavior) and the
  * versioned persistence contract.
  */
class IncrementalSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val KeyNames = Seq("k")

  private def rows(n: Int, keyMod: Int = 3, offset: Int = 0): DataFrame =
    (1 to n).map(i => (s"k${(i + offset) % keyMod}", (i.toLong * 7) % 1000, (i + offset).toLong % 97))
      .toDF("k", "v", "d")

  private def st(df: DataFrame): DataFrame =
    Incremental.state(df, Seq(col("k")), col("v"), col("d"))

  private def finished(state: DataFrame): Seq[(String, Long, Long, Long, Long, Double, Long)] =
    Incremental.finish(state, KeyNames).collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getLong(6))).toSeq.sorted

  test("merged deltas equal the one-shot state on the union, exactly") {
    val a = rows(500)
    val b = rows(400, offset = 500)
    val merged = finished(Incremental.merge(KeyNames, st(a), st(b)))
    val oneShot = finished(st(a.unionByName(b)))
    assert(merged === oneShot,
      "integer sums + min/max lattice + sketch union must reproduce the full recompute")
  }

  test("merge is associative and handles disjoint / brand-new groups") {
    val a = rows(300, keyMod = 2)          // groups k0, k1
    val b = rows(300, keyMod = 5, offset = 300) // introduces k2..k4
    val c = rows(100, keyMod = 3, offset = 600)
    val left = finished(Incremental.merge(KeyNames,
      Incremental.merge(KeyNames, st(a), st(b)), st(c)))
    val right = finished(Incremental.merge(KeyNames,
      st(a), Incremental.merge(KeyNames, st(b), st(c))))
    assert(left === right, "fold shape must not matter")
    val allKeys = left.map(_._1).toSet
    assert(allKeys === Set("k0", "k1", "k2", "k3", "k4"),
      s"groups from every delta must survive the merge: $allKeys")
  }

  test("HLL distinct survives merging within 5% of exact") {
    // 3 deltas with overlapping distinct ids: union must estimate the
    // UNION cardinality, not the sum of per-delta cardinalities
    val parts = Seq(0, 1, 2).map(p =>
      (1 to 4000).map(i => ("k0", i.toLong, ((i * (p + 1)) % 6000).toLong))
        .toDF("k", "v", "d"))
    val merged = Incremental.merge(KeyNames, parts.map(st): _*)
    val est = Incremental.finish(merged, KeyNames).collect()(0).getLong(6)
    val exact = parts.reduce(_.unionByName(_)).select(col("d")).distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"HLL union estimate $est vs exact $exact")
    // and the naive wrong answer would be ~3x the union size
    assert(est < 2 * exact, "sketch union must dedup across deltas")
  }

  test("maintain: versioned folds equal full recompute; replay-safe; _SUCCESS-gated") {
    val path = Files.createTempDirectory("graft-incr").toString + "/state"
    val deltas = Seq(rows(300), rows(300, offset = 300), rows(300, offset = 600))
    val versions = deltas.map(d => Incremental.maintain(spark, path, KeyNames, st(d)))
    assert(versions === Seq(0L, 1L, 2L), "versions must advance per step")
    val served = finished(Incremental.latestState(spark, path).get)
    val full = finished(st(deltas.reduce(_.unionByName(_))))
    assert(served === full, "three folds must equal the one-shot recompute")

    // replay the last step (crash-recovery double-run): a NEW version is
    // written from the same previous state — the answer must not change
    val v3 = Incremental.maintain(spark, path, KeyNames, st(deltas.last))
    assert(v3 === 3L)
    val replayed = Incremental.latestState(spark, path).get
    val g = Incremental.finish(replayed, KeyNames)
      .filter(col("k") === "k0").collect()(0)
    val before = Incremental.finish(st(deltas.reduce(_.unionByName(_))
        .unionByName(deltas.last)), KeyNames)
      .filter(col("k") === "k0").collect()(0)
    assert(g.getLong(1) === before.getLong(1),
      "a replayed fold double-counts ONLY its own delta — versioning keeps " +
        "each step isolated so the caller's idempotence contract (skip seen " +
        "batch ids) can be applied at the step level")

    // an incomplete version (no _SUCCESS) must be invisible to readers and
    // to version allocation: the next step folds from the last COMPLETE
    // state (v=3), not the crashed junk
    val dir = new java.io.File(s"$path/v=99"); dir.mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$path/v=99/part-junk.parquet"), "")
    val seen = Incremental.maintain(spark, path, KeyNames, st(rows(10)))
    assert(seen === 4L,
      "allocation advances from the last COMPLETE version — a re-run of a " +
        "crashed step overwrites its own dir, never a finished one")
    val latest = finished(Incremental.latestState(spark, path).get)
    assert(latest.nonEmpty && latest.map(_._2).sum ===
        finished(st(deltas.reduce(_.unionByName(_)).unionByName(deltas.last)
          .unionByName(rows(10)))).map(_._2).sum,
      "reader must serve the _SUCCESS-marked v=4, skipping the junk dir")
  }

  test("maintain with batchId: a retried fold is a no-op, not a double-count") {
    val path = Files.createTempDirectory("graft-incr-batch").toString + "/state"
    val d0 = rows(300)
    val d1 = rows(300, offset = 300)
    assert(Incremental.maintain(spark, path, KeyNames, st(d0), Some("b0")) === 0L)
    assert(Incremental.maintain(spark, path, KeyNames, st(d1), Some("b1")) === 1L)
    val before = finished(Incremental.latestState(spark, path).get)
    // at-least-once retry: the caller re-submits b1 after the publish
    // landed but before its own completion record was written
    val retried = Incremental.maintain(spark, path, KeyNames, st(d1), Some("b1"))
    assert(retried === 1L, "a folded batchId must return its version, not fold again")
    val after = finished(Incremental.latestState(spark, path).get)
    assert(after === before, "retry must leave the state bit-identical")
    assert(after === finished(st(d0.unionByName(d1))),
      "…and that state is the exact one-shot recompute, not a double-count")
    // a fresh batchId advances normally from the deduped state
    assert(Incremental.maintain(spark, path, KeyNames, st(rows(50, offset = 600)),
      Some("b2")) === 2L)
  }

  test("property: maintain is exactly-once under any random interleave of folds, retries, and prunes") {
    // protocol fuzz for the versioned-fold machinery: a random script of
    // in-order folds with RETRIES of random already-folded batch ids
    // injected anywhere (incl. after their folding version was pruned —
    // the ledger case) and pruneVersions(keep) calls at random points.
    // Whatever the interleave, the served state must equal the one-shot
    // recompute over the UNIQUE batches folded so far: no double-count,
    // no lost batch, prune never changes the answer. Fixed seeds, like
    // PropertySuite's generators — deterministic, reproducible cases.
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val path = Files.createTempDirectory(s"graft-incr-fuzz$seed").toString + "/state"
      val nB = 4 + rnd.nextInt(3)
      val deltas = (0 until nB).map(i => rows(60, offset = i * 60))
      var folded = Vector.empty[Int] // indices folded, in order, unique
      deltas.indices.foreach { i =>
        Incremental.maintain(spark, path, KeyNames, st(deltas(i)), Some(s"b$i"))
        folded :+= i
        if (rnd.nextBoolean()) { // retry a random already-folded id
          val j = folded(rnd.nextInt(folded.size))
          val before = finished(Incremental.latestState(spark, path).get)
          Incremental.maintain(spark, path, KeyNames, st(deltas(j)), Some(s"b$j"))
          assert(finished(Incremental.latestState(spark, path).get) === before,
            s"seed=$seed: retry of b$j after ${folded.size} folds changed the state")
        }
        if (rnd.nextInt(3) == 0) { // prune at a random point
          val keep = 1 + rnd.nextInt(2)
          Incremental.pruneVersions(spark, path, keep)
        }
      }
      // late retries of EVERY id ever folded — many of their versions are
      // pruned by now, so this drives the ledger path too
      rnd.shuffle(folded).foreach { j =>
        Incremental.maintain(spark, path, KeyNames, st(deltas(j)), Some(s"b$j"))
      }
      val served = finished(Incremental.latestState(spark, path).get)
      val oneShot = finished(st(deltas.reduce(_.unionByName(_))))
      assert(served === oneShot,
        s"seed=$seed (nB=$nB): served state diverged from the one-shot recompute")
    }
  }

  test("maintain is family-generic: KLL / top-k / theta states fold through the same protocol") {
    // the versioning machinery must not care WHAT the state is — each
    // family plugs its own merge in and the versioned fold must equal the
    // one-shot state over the union (exact regimes, so equality is exact)
    val base = Files.createTempDirectory("graft-incr-family").toString
    val deltas = Seq(rows(300), rows(300, offset = 300), rows(300, offset = 600))
    val union = deltas.reduce(_.unionByName(_))

    // KLL quantile states, k above every group size → exact order stats
    val kllPath = s"$base/kll"
    deltas.zipWithIndex.foreach { case (d, i) =>
      Incremental.maintain(spark, kllPath, KeyNames,
        Incremental.quantileState(d, Seq(col("k")), col("v"), k = 2048),
        Some(s"b$i"), (kn, ss) => Incremental.mergeQuantileStates(kn, ss: _*))
    }
    def quants(st: DataFrame) =
      Incremental.finishQuantiles(st, KeyNames, Seq(0.25, 0.5, 0.75))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    assert(quants(Incremental.latestState(spark, kllPath).get) ===
      quants(Incremental.quantileState(union, Seq(col("k")), col("v"), k = 2048)),
      "versioned KLL folds must serve the one-shot exact quantiles")
    // the batchId dedup machinery composes with a custom mergeFn
    val retried = Incremental.maintain(spark, kllPath, KeyNames,
      Incremental.quantileState(deltas.last, Seq(col("k")), col("v"), k = 2048),
      Some("b2"), (kn, ss) => Incremental.mergeQuantileStates(kn, ss: _*))
    assert(retried === 2L, "a folded batchId must dedup under any mergeFn")

    // top-k states: merge ≡ one-shot is a total-order identity, bit-exact
    val topkPath = s"$base/topk"
    deltas.foreach { d =>
      Incremental.maintain(spark, topkPath, KeyNames,
        Incremental.topKState(d, Seq(col("k")), col("v"), col("d"), k = 5),
        None, (kn, ss) => Incremental.mergeTopK(kn, 5, ss: _*))
    }
    def ranked(st: DataFrame) =
      Incremental.finishTopK(st, KeyNames).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    assert(ranked(Incremental.latestState(spark, topkPath).get) ===
      ranked(Incremental.topKState(union, Seq(col("k")), col("v"), col("d"), k = 5)),
      "versioned top-k folds must serve the one-shot ranking")

    // theta set states in the exact regime: union estimate == true distinct
    val thetaPath = s"$base/theta"
    deltas.foreach { d =>
      Incremental.maintain(spark, thetaPath, KeyNames,
        Incremental.setState(d, Seq(col("k")), col("d")),
        None, (kn, ss) => Incremental.mergeSetStatesLgK(kn, 12, ss: _*))
    }
    val est = Incremental.finishSetCounts(
        Incremental.latestState(spark, thetaPath).get, KeyNames)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val truth = union.groupBy("k").agg(countDistinct(col("d")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est === truth,
      "below capacity the maintained theta state must count distincts exactly")

    // Misra–Gries heavy hitters, capacity above the item domain (d < 97) →
    // no decrements anywhere, maintained counts are exact frequencies
    val mgPath = s"$base/mg"
    deltas.foreach { d =>
      Incremental.maintain(spark, mgPath, KeyNames,
        Incremental.heavyHittersState(d, Seq(col("k")),
          col("d").cast("string"), k = 128),
        None, (kn, ss) => Incremental.mergeHeavyHitters(kn, 128, ss: _*))
    }
    val counts = Incremental.finishHeavyHitters(
        Incremental.latestState(spark, mgPath).get, KeyNames, 128)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(3)).toMap
    val freqTruth = union.groupBy(col("k"), col("d").cast("string").as("d")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts === freqTruth,
      "capacity above the domain: maintained MG counts must be exact frequencies")
  }

  test("non-numeric v= junk is skipped, not fatal") {
    val path = Files.createTempDirectory("graft-incr-junk").toString + "/state"
    Incremental.maintain(spark, path, KeyNames, st(rows(100)))
    // a stray non-numeric version dir WITH a _SUCCESS marker must be ignored
    new java.io.File(s"$path/v=tmp").mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$path/v=tmp/_SUCCESS"), "")
    assert(Incremental.maintain(spark, path, KeyNames, st(rows(100, offset = 100))) === 1L)
    assert(finished(Incremental.latestState(spark, path).get) ===
      finished(st(rows(100).unionByName(rows(100, offset = 100)))))
  }

  test("pruneVersions keeps the newest K complete versions; reader still serves") {
    val path = Files.createTempDirectory("graft-incr-prune").toString + "/state"
    val deltas = (0 until 5).map(i => rows(200, offset = i * 200))
    deltas.foreach(d => Incremental.maintain(spark, path, KeyNames, st(d)))
    // an incomplete tip (no _SUCCESS) must survive pruning untouched
    new java.io.File(s"$path/v=9").mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$path/v=9/part-inflight.parquet"), "")
    val victims = Incremental.pruneVersions(spark, path, keep = 2)
    assert(victims === Seq(0L, 1L, 2L), "oldest complete versions go, oldest first")
    val left = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(left === Set("v=3", "v=4", "v=9"),
      s"newest 2 complete + the incomplete tip must remain, got $left")
    assert(finished(Incremental.latestState(spark, path).get) ===
      finished(st(deltas.reduce(_.unionByName(_)))),
      "the served state is still the full five-delta fold")
    // mid-prune crash simulation: deleting oldest-first means any prefix of
    // the victim list leaves the newest K readable — prune again is a no-op
    assert(Incremental.pruneVersions(spark, path, keep = 2) === Seq.empty)
  }

  test("pruneVersions moves _BATCH ids to the ledger: a late retry of a pruned batch cannot refold") {
    val path = Files.createTempDirectory("graft-incr-ledger").toString + "/state"
    val deltas = (0 until 4).map(i => rows(150, offset = i * 150))
    deltas.zipWithIndex.foreach { case (d, i) =>
      Incremental.maintain(spark, path, KeyNames, st(d), Some(s"b$i"))
    }
    assert(Incremental.pruneVersions(spark, path, keep = 1) === Seq(0L, 1L, 2L))
    val before = finished(Incremental.latestState(spark, path).get)
    // b0's folding version is gone — without the ledger this would refold
    val v = Incremental.maintain(spark, path, KeyNames, st(deltas(0)), Some("b0"))
    assert(v === 3L, "a pruned-but-folded batchId must answer with the newest version")
    assert(finished(Incremental.latestState(spark, path).get) === before,
      "…and must not touch the state")
    // fresh work still advances, and a second prune keeps the ledger intact
    assert(Incremental.maintain(spark, path, KeyNames,
      st(rows(60, offset = 600)), Some("b4")) === 4L)
    Incremental.pruneVersions(spark, path, keep = 1)
    assert(Incremental.maintain(spark, path, KeyNames, st(deltas(1)), Some("b1")) === 4L,
      "ledger survives re-pruning (b1 still refused)")
  }

  test("ledger is append-only and crash-recoverable: no rewrite window, tmp junk and legacy file honored") {
    val path = Files.createTempDirectory("graft-incr-ledger2").toString + "/state"
    (0 until 3).foreach { i =>
      Incremental.maintain(spark, path, KeyNames, st(rows(100, offset = i * 100)), Some(s"b$i"))
    }
    assert(Incremental.pruneVersions(spark, path, keep = 1) === Seq(0L, 1L))
    val dir = new java.io.File(s"$path/_BATCH_HISTORY.d")
    // skip Hadoop local-FS .crc siblings (hidden); the engine's own reader
    // (ChecksumFileSystem.listStatus) never sees them
    val firstEntries = dir.listFiles().filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> Files.readString(f.toPath)).toMap
    assert(firstEntries.values.toSet === Set("b0", "b1"), s"one file per pruned id: $firstEntries")
    // a crashed install leaves a .tmp- file: it must be ignored, not read
    Files.writeString(java.nio.file.Paths.get(dir.getPath, ".tmp-deadbeef"), "bogus")
    // a legacy single-file ledger from the old layout is still honored
    Files.writeString(java.nio.file.Paths.get(path, "_BATCH_HISTORY"), "legacy0\n")
    assert(Incremental.maintain(spark, path, KeyNames, st(rows(10, offset = 900)),
      Some("legacy0")) === 2L, "legacy-file ids must still dedupe")
    // another round of fold+prune APPENDS; the first prune's files are
    // untouched byte-for-byte (there is no delete-then-rename window at all)
    Incremental.maintain(spark, path, KeyNames, st(rows(50, offset = 500)), Some("b3"))
    assert(Incremental.pruneVersions(spark, path, keep = 1).nonEmpty)
    val after = dir.listFiles().filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> Files.readString(f.toPath)).toMap
    firstEntries.foreach { case (name, content) =>
      assert(after.get(name) === Some(content), s"prior ledger entry $name must survive verbatim")
    }
    // every previously pruned id still refuses to refold
    val tip = Incremental.latestState(spark, path).get
    val served = finished(tip)
    Seq("b0", "b1").foreach { id =>
      Incremental.maintain(spark, path, KeyNames, st(rows(100)), Some(id))
      assert(finished(Incremental.latestState(spark, path).get) === served,
        s"pruned id $id must stay refused after re-pruning")
    }
  }

  test("streaming maintain via foreachBatch: a replayed micro-batch folds exactly once") {
    val base = Files.createTempDirectory("graft-incr-e2e")
    val path = base.toString + "/state"
    val ckpt = base.toString + "/ckpt"
    val srcDir = base.toString + "/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    // a FILE source (not MemoryStream): the source retains its batch 0
    // files, so a forced replay re-reads the REAL delta — a sink without
    // batchId dedup would genuinely double-count it
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k string, v long, d long")
    def writeRows(name: String, rows: Seq[(String, Long, Long)]): Unit =
      Files.writeString(java.nio.file.Paths.get(srcDir, name),
        rows.map { case (k, v, d) => s"""{"k":"$k","v":$v,"d":$d}""" }.mkString("\n"))
    // the documented streaming usage: foreachBatch's REAL batchId is the
    // delta's stable identity, so at-least-once replays dedupe at the sink
    def start() = spark.readStream.schema(schema).json(srcDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Incremental.maintain(spark, path, KeyNames,
          st(batch), Some(batchId.toString)): Unit
      }
      .start()
    val a = (1 to 200).map(i => (s"k${i % 3}", (i.toLong * 7) % 1000, i.toLong % 97))
    val b = (201 to 300).map(i => (s"k${i % 3}", (i.toLong * 7) % 1000, i.toLong % 97))
    writeRows("a.json", a)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // crash-after-sink-publish simulation: drop batch 0's commit marker so
    // the restarted query REPLAYS batch 0 with the SAME batchId — Spark's
    // contract makes sink-side idempotence the sink's job, which is
    // exactly what maintain(batchId) provides. Delete through the Hadoop
    // FS so the checksum sibling goes too.
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commit0 = new org.apache.hadoop.fs.Path(s"$ckpt/commits/0")
    assert(fs.exists(commit0), "batch 0 must have committed")
    fs.delete(commit0, false)
    val q2 = start()
    try {
      q2.processAllAvailable() // replays batch 0: must answer from the marker
      writeRows("b.json", b)
      q2.processAllAvailable() // batch 1 folds normally
    } finally q2.stop()
    val served = finished(Incremental.latestState(spark, path).get)
    val oneShot = finished(st((a ++ b).toDF("k", "v", "d")))
    assert(served === oneShot,
      "replayed batch 0 must fold exactly once: state equals the one-shot recompute")
    val vers = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).toSet
    assert(vers === Set("v=0", "v=1"),
      s"the replay must not publish an extra version: $vers")
  }

  test("top-k state: merged folds equal the one-shot recompute, bit-exactly") {
    val a = rows(500)
    val b = rows(400, offset = 500)
    val score = col("v").cast("double")
    def topSt(df: DataFrame) =
      Incremental.topKState(df, Seq(col("k")), score, col("d"), k = 5)
    def fin(state: DataFrame) =
      Incremental.finishTopK(state, KeyNames).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val merged = fin(Incremental.mergeTopK(KeyNames, 5, topSt(a), topSt(b)))
    val oneShot = fin(topSt(a.unionByName(b)))
    assert(merged === oneShot,
      "top-k under the (score desc, id asc) total order is a monoid: " +
        "merge of per-delta states must equal the recompute exactly")
    assert(merged.nonEmpty && merged.groupBy(_._1).forall(_._2.size <= 5))
    // commutativity: fold order must not matter
    val swapped = fin(Incremental.mergeTopK(KeyNames, 5, topSt(b), topSt(a)))
    assert(swapped === merged)
  }

  test("heavy-hitter state: PODS-2012 merge keeps the n/(k+1) undercount bound") {
    // skewed stream: item "hot" dominates, a midsized band, a long tail
    val mk = (base: Int, n: Int) => (1 to n).map { i =>
      val item = if (i % 3 == 0) "hot"
        else if (i % 7 == 0) s"warm${i % 4}"
        else s"tail${(i + base) % 500}"
      ("k0", item)
    }
    val a = mk(0, 3000).toDF("k", "item")
    val b = mk(7000, 3000).toDF("k", "item")
    val k = 20
    def mgSt(df: DataFrame) =
      Incremental.heavyHittersState(df, Seq(col("k")), col("item"), k)
    val merged = Incremental.mergeHeavyHitters(KeyNames, k, mgSt(a), mgSt(b))
    val est = Incremental.finishHeavyHitters(merged, KeyNames, outK = k)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    val truth = a.unionByName(b).groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val bound = n / (k + 1)
    truth.foreach { case (item, t) =>
      val e = est.getOrElse(item, 0L)
      assert(e <= t, s"MG must only UNDERCOUNT: $item est $e > true $t")
      assert(t - e <= bound,
        s"merged undercount for $item is ${t - e}, bound is $bound (n=$n, k=$k)")
    }
    // every item with true count above the bound is guaranteed present
    truth.filter(_._2 > bound).keys.foreach(item =>
      assert(est.contains(item), s"guaranteed heavy hitter $item missing"))
    // commutativity: summed-counter merge + deterministic reduction order
    val swapped = Incremental.mergeHeavyHitters(KeyNames, k, mgSt(b), mgSt(a))
      .collect().map(_.toString).sorted.toSeq
    assert(swapped ===
      merged.collect().map(_.toString).sorted.toSeq, "merge order must not matter")
  }

  test("theta set states: exact below capacity; union/intersection/difference identities") {
    // group g: ids 1..3000 in A, 2001..5000 in B → |A|=3000 |B|=3000
    // |A∩B|=1000 |A∪B|=5000 |A\B|=2000 — all below the default sketch
    // capacity, where theta is EXACT, so these assert equality, not bounds
    val a = (1 to 3000).map(i => ("g", i.toLong)).toDF("k", "d")
    val b = (2001 to 5000).map(i => ("g", i.toLong)).toDF("k", "d")
    val sa = Incremental.setState(a, Seq(col("k")), col("d"), lgK = 14)
    val sb = Incremental.setState(b, Seq(col("k")), col("d"), lgK = 14)
    val o = Incremental.setOverlap(KeyNames2, sa, sb, lgK = 14).collect()(0)
    assert((o.getAs[Long]("n_a"), o.getAs[Long]("n_b"), o.getAs[Long]("n_both"),
      o.getAs[Long]("n_either"), o.getAs[Long]("n_only_a")) ===
      ((3000L, 3000L, 1000L, 5000L, 2000L)), s"$o")

    // merged deltas ≡ one-shot state: union-fold then estimate
    val merged = Incremental.mergeSetStatesLgK(KeyNames2, 14, sa, sb)
    val est = merged.select(theta_sketch_estimate(col("theta")).cast("long"))
      .collect()(0).getLong(0)
    assert(est === 5000L, s"union-merged state must count the union exactly: $est")
    // commutative
    val swapped = Incremental.mergeSetStatesLgK(KeyNames2, 14, sb, sa)
      .select(theta_sketch_estimate(col("theta")).cast("long")).collect()(0).getLong(0)
    assert(swapped === est)
  }

  private val KeyNames2 = Seq("k")

  test("KLL quantile states: merged daily folds keep the rank guarantee") {
    // skewed multiset split into 3 deltas; truth ranks computed exactly
    val all = (1 to 12000).map(i => ("k0", (i.toLong * i) % 10007))
    val deltas = all.grouped(4000).map(_.toDF("k", "v")).toSeq
    val states = deltas.map(d =>
      Incremental.quantileState(d, Seq(col("k")), col("v"), k = 200))
    val merged = Incremental.mergeQuantileStates(KeyNames2, states: _*)
    val probs = Seq(0.5, 0.95, 0.99)
    val row = Incremental.finishQuantiles(merged, KeyNames2, probs).collect()(0)
    val sortedVals = all.map(_._2).sorted
    val n = sortedVals.length
    probs.zipWithIndex.foreach { case (p, j) =>
      val est = row.getLong(1 + j)
      // normalized rank of the estimate vs the requested rank: KLL k=200
      // guarantees ~1.2% at 99% confidence, preserved under merge; 3%
      // leaves slack for the confidence tail without masking regressions
      val rank = sortedVals.count(_ <= est).toDouble / n
      assert(math.abs(rank - p) < 0.03,
        s"p$p estimate $est lands at rank $rank — outside the merged-KLL bound")
    }
    // one-shot state over the union obeys the same bound (merge ≈ direct)
    val direct = Incremental.finishQuantiles(
      Incremental.quantileState(all.toDF("k", "v"), Seq(col("k")), col("v"), k = 200),
      KeyNames2, probs).collect()(0)
    probs.zipWithIndex.foreach { case (p, j) =>
      val rank = sortedVals.count(_ <= direct.getLong(1 + j)).toDouble / n
      assert(math.abs(rank - p) < 0.03, s"direct p$p outside bound")
    }
  }

  test("streaming maintenance: foreachBatch folds equal the batch recompute") {
    val srcDir = Files.createTempDirectory("graft-incr-stream").toString + "/src"
    val path = Files.createTempDirectory("graft-incr-stream").toString + "/state"
    rows(400).write.parquet(srcDir)
    rows(400, offset = 400).write.mode("append").parquet(srcDir)
    val q = spark.readStream
      .schema("k STRING, v BIGINT, d BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      // foreachBatch's batchId is the exactly-once hook: passing it as the
      // maintain batchId makes a Spark-side batch RETRY fold once, not twice
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Incremental.maintain(spark, path, KeyNames, st(batch),
          Some(s"stream-b$batchId")): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val served = finished(Incremental.latestState(spark, path).get)
    val full = finished(st(spark.read.parquet(srcDir)))
    assert(served === full,
      "micro-batch folds through foreachBatch must equal the full recompute")
  }

  test("perceptual ingest gates validate the corpus artifact schema up front") {
    import graft.operators.Dedup
    val batch = Seq((1L, "x".getBytes("UTF-8"))).toDF("media_id", "content")
    // wrong id column name and wrong hash column name each fail LOUDLY at
    // plan-build time with the artifact convention in the message — not a
    // bare AnalysisException from the internal select (or a silent bind
    // to a same-named column in a wider table)
    val badId = Seq((1L, 0L)).toDF("image_id", "dhash")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.incrementalImageNew(batch, badId)
    }
    assert(e1.getMessage.contains("media_id") && e1.getMessage.contains("artifact"))
    val badHash = Seq((1L, 0L)).toDF("media_id", "hash64")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalAudioNew(batch, badHash)
    }
    assert(e2.getMessage.contains("audio_hash") && e2.getMessage.contains("artifact"))
  }

  test("perceptual ingest gates: corpus-side hot-bucket guard raises on a degenerate hash table") {
    import graft.operators.Dedup
    // a persisted corpus that collapsed onto one hash (all-black
    // thumbnails accumulated batch over batch) would make every gate
    // probe n^2 in corpus size — with maxBucket set, the corpus band
    // side raises with the observed bucket size instead
    val bmp = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }
    val batch = Seq((1L, bmp)).toDF("media_id", "content")
    val hotCorpus = (0L until 300L).map((_, 0L)).toDF("media_id", "dhash")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Dedup.incrementalImageNew(batch, hotCorpus, maxBucket = Some(100L)).count()
    }
    assert(msgs(ex).exists(m => m.contains("hottest band bucket") && m.contains("300")),
      s"expected the corpus-side hot-bucket guard, got: ${msgs(ex).take(3)}")
    // under the cap the gate is unchanged: the sole batch row survives a
    // diverse corpus probe
    // ids start at 1: the all-black batch image hashes to dHash 0, and
    // corpus id 0 would hash to 0 too — a real (if accidental) match
    val okCorpus = (1L to 300L).map(i => (i, i * 0x9E3779B97F4A7C15L))
      .toDF("media_id", "dhash")
    assert(Dedup.incrementalImageNew(batch, okCorpus, maxBucket = Some(100L))
      .count() === 1L)
  }
}
