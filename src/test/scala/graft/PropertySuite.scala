package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Pipeline, TextAnalysis, WindowAssign}

/** Property-based invariants for window assignment and dedup hashing
  * (SURVEY.md §5): these must hold for ANY input, not just the fixtures.
  * Generators are driven with fixed seeds (no scalatest-scalacheck bridge
  * in the offline dependency set) — deterministic, reproducible cases.
  */
class PropertySuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val params = Gen.Parameters.default

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(params, Seed(i.toLong)))

  test("intersect-count-sorted == size(array_intersect) for any sorted distinct arrays") {
    val gen = for {
      na <- Gen.chooseNum(0, 40)
      nb <- Gen.chooseNum(0, 40)
      a <- Gen.listOfN(na, Gen.chooseNum(-50L, 50L))
      b <- Gen.listOfN(nb, Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val cases = samples(gen, 40)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (a, b) => Row(a, b) }, 2),
      StructType(Seq(
        StructField("a", ArrayType(LongType)), StructField("b", ArrayType(LongType)))))
    val got = df.select(
        graft.functions.IntersectCountSorted.intersectCountSorted(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // and via the SQL registration
    graft.functions.GraftExtensions.register(spark)
    df.createOrReplaceTempView("ics_cases")
    spark.sql("SELECT graft_intersect_count(a, b) AS fast, size(array_intersect(a, b)) AS ref FROM ics_cases")
      .collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // the sorted/distinct precondition is visible to SQL callers, not
    // buried in scaladoc: DESCRIBE FUNCTION must state it
    val described = spark.sql("DESCRIBE FUNCTION graft_intersect_count")
      .collect().map(_.getString(0)).mkString("\n")
    assert(described.contains("sorted ascending"), s"usage missing precondition:\n$described")
  }

  test("count-window: every row in exactly one window; all full except the last") {
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      ids <- Gen.pick(n, 1L to 200L)
      size <- Gen.chooseNum(1, 10)
    } yield (ids.toList, size)
    samples(gen, 12).foreach { case (ids, size) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(Row(_)), 2),
        StructType(Seq(StructField("id", LongType))))
      val counts = WindowAssign.countWindow(df, size, Seq(col("id")))
        .groupBy("window_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(counts.map(_._1).toSeq === counts.indices.map(_.toLong),
        s"window ids contiguous from 0 (ids=${ids.size}, size=$size)")
      counts.dropRight(1).foreach { case (_, c) => assert(c === size.toLong) }
      assert(counts.last._2 <= size.toLong)
      assert(counts.map(_._2).sum === ids.size.toLong)
    }
  }

  test("session-window: intra-session gaps <= gap; sessions split by > gap") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))
      gap <- Gen.chooseNum(10L, 500L)
    } yield (ts.distinct.sorted, gap)
    samples(gen, 12).foreach { case (ts, gap) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(ts.map(t => Row(1L, t)), 2),
        StructType(Seq(StructField("k", LongType), StructField("ts_s", LongType))))
      val out = WindowAssign.sessionWindow(df, col("k"), col("ts_s"), col("ts_s"), gap)
        .select("ts_s", "session_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      out.sliding(2).foreach {
        case Array((t1, s1), (t2, s2)) =>
          if (t2 - t1 > gap) assert(s2 === s1 + 1, s"gap ${t2 - t1} > $gap must split")
          else assert(s2 === s1, s"gap ${t2 - t1} <= $gap must not split")
        case _ =>
      }
      assert(out.head._2 === 1L)
    }
  }

  test("minhash signature: length K, deterministic, equal for duplicate docs") {
    val gen = Gen.chooseNum(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
        .map(_.mkString(" ")))
    samples(gen, 10).foreach { text =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(text)), 1),
        StructType(Seq(StructField("t", StringType))))
      def sig() = df.select(
          Dedup.minhashSignature(TextAnalysis.shingles(col("t"), 3), 16).as("sig"))
        .collect()(0).getSeq[Long](0)
      val s1 = sig()
      assert(s1.length === 16)
      assert(s1 === sig(), "signature must be deterministic across evaluations")
    }
  }

  test("line-level dedup is idempotent: cleaning cleaned text removes nothing") {
    // kept lines had corpus count <= maxOcc; removal only lowers counts, so
    // a second pass must be a no-op — for ANY corpus and maxOcc
    val lineGen = Gen.listOfN(3, Gen.oneOf("aa", "bb", "cc", "dd", "ee", ""))
      .map(_.mkString(" "))
    val docGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val corpusGen = for {
      n <- Gen.chooseNum(2, 8)
      docs <- Gen.listOfN(n, docGen)
      maxOcc <- Gen.chooseNum(1, 3)
    } yield (docs, maxOcc)
    samples(corpusGen, 8).foreach { case (docs, maxOcc) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      val once = Dedup.lineLevelDedup(df, "doc_id", "text", maxOcc)
        .select(col("doc_id"), col("text_clean"))
      val twice = Dedup.lineLevelDedup(
          once.withColumnRenamed("text_clean", "text"), "doc_id", "text", maxOcc)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      twice.foreach { case (id, removed, _) =>
        assert(removed === 0L, s"second pass removed lines (doc $id, maxOcc $maxOcc)")
      }
      val onceMap = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      twice.foreach { case (id, _, text) => assert(text === onceMap(id)) }
    }
  }

  test("ratio4 equals exact decimal HALF_UP for any integer ratio (incl. tie denominators)") {
    val gen = for {
      num <- Gen.chooseNum(0L, 5000L)
      den <- Gen.chooseNum(1L, 2000L)
    } yield (num, den)
    // force the known-treacherous tie denominators into the sample
    val cases = samples(gen, 60) ++ Seq((1L, 160L), (3L, 160L), (1L, 32L), (7L, 800L), (1L, 3L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (n, d) => Row(n, d) }, 2),
      StructType(Seq(StructField("n", LongType), StructField("d", LongType))))
    val got = df.select(col("n"), col("d"),
        TextAnalysis.ratio4(col("n"), col("d")).as("r"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    cases.foreach { case (n, d) =>
      val expected = (BigDecimal(n) / BigDecimal(d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((n, d)) === expected, s"ratio4($n, $d)")
    }
  }

  test("text normalization is idempotent for any input") {
    val gen = Gen.listOfN(8, Gen.oneOf(
      "Café", "Café", "  spaced  ", "TAB\there", "ﬁ", "ok", "\r\n", "ümlaut"))
      .map(_.mkString(" "))
    samples(gen, 12).foreach { text =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(text)), 1),
        StructType(Seq(StructField("t", StringType))))
      val Array(once, twice) = df.select(
          TextAnalysis.normalizeText(col("t")).as("n1"))
        .select(col("n1"), TextAnalysis.normalizeText(col("n1")).as("n2"))
        .collect()(0).toSeq.map(_.asInstanceOf[String]).toArray
      assert(twice === once, s"normalize must be idempotent on: $text")
    }
  }

  test("substring audit and rewrite agree on which docs carry shared spans") {
    // exactSubstringDups flags doc D  <=>  removeSharedSpans cuts tokens
    // from D — the two views of the same ownership, for ANY corpus
    val docGen = Gen.chooseNum(4, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("w1", "w2", "w3", "w4", "w5")).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, docGen))
    samples(corpusGen, 6).foreach { docs =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      val flagged = Dedup.exactSubstringDups(df, "doc_id", "text", k = 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val cut = Dedup.removeSharedSpans(df, "doc_id", "text", k = 3)
        .filter(col("n_removed_tokens") > 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(cut === flagged,
        s"audit flags $flagged but rewrite cuts $cut (docs=$docs)")
    }
  }

  test("AVI frame walk never throws on hostile bytes; truncation yields a prefix of the frames") {
    import graft.operators.Multimodal
    // pure-fuzz: arbitrary byte blobs, including ones that start with the
    // RIFF/AVI magic and then lie about everything after it
    val junk = for {
      n <- Gen.chooseNum(0, 512)
      bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
      prefix <- Gen.oneOf(Array.emptyByteArray, "RIFF".getBytes("US-ASCII"),
        ("RIFF" + "\u0000\u0000\u0000\u0000" + "AVI ").getBytes("ISO-8859-1"))
    } yield prefix ++ bs
    samples(junk, 60).foreach { bytes =>
      val frames = Multimodal.aviJpegFrames(bytes, maxFrames = 8) // must not throw
      assert(frames.forall(f => (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8))
    }
    // a well-formed 3-frame MJPEG AVI truncated at any byte boundary must
    // never throw and only ever yields a prefix of the full frame list
    def jpeg(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (level << 16) | (level << 8) | level)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", b)
      b.toByteArray
    }
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    val frames = Seq(40, 130, 220).map(jpeg)
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      chunk("LIST", "movi".getBytes("US-ASCII") ++ frames.flatMap(chunk("00dc", _))))
    val full = Multimodal.aviJpegFrames(avi, 8)
    assert(full.size === 3)
    (0 to avi.length by 7).foreach { cut =>
      val got = Multimodal.aviJpegFrames(avi.take(cut), 8)
      assert(got.size <= full.size)
      got.zip(full).foreach { case (g, f) => assert(java.util.Arrays.equals(g, f)) }
    }
  }

  test("token-budget selection is the maximal in-budget prefix for any data") {
    val rowGen = for {
      id <- Gen.chooseNum(1L, 500L)
      key <- Gen.oneOf("k1", "k2", "k3")
      score <- Gen.chooseNum(0, 100)
      tok <- Gen.chooseNum(1L, 50L)
    } yield (id, key, score, tok)
    (1 to 6).foreach { seedBase =>
      val rows = samples(rowGen, 60).distinctBy(_._1)
      val budget = 40L + 17L * seedBase
      val df = spark.createDataFrame(rows).toDF("id", "key", "score", "tok")
      val kept = Pipeline.selectByTokenBudget(df, Seq(col("key")), col("score"),
          col("tok"), col("id"), budget)
        .select(col("id"), col("cum_tokens")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // expected: per key, walk (score desc, id asc) accumulating until the
      // budget would be exceeded; everything after the straddler is out
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val ordered = rs.sortBy(t => (-t._3, t._1))
        val cums = ordered.scanLeft(0L)(_ + _._4).tail
        ordered.zip(cums).takeWhile(_._2 <= budget).map { case (t, c) => t._1 -> c }
      }
      assert(kept == expected, s"budget=$budget")
    }
  }

  test("temperature rates: bounded, min-mass source uncut, monotone in mass and temperature") {
    val massGen = Gen.chooseNum(1L, 1000000L)
    (1 to 5).foreach { trial =>
      val masses = samples(massGen, 8).distinct.zipWithIndex
        .map { case (m, i) => (s"s$i", m) }
      val df = spark.createDataFrame(masses).toDF("src", "tok")
      val rates = Seq(2.0, 4.0).map { t =>
        t -> Pipeline.temperatureRates(df, col("src"), col("tok"), t)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      }.toMap
      rates.foreach { case (_, rs) =>
        assert(rs.forall { case (_, _, bp) => bp >= 0L && bp <= 10000L })
        assert(rs.minBy(_._2)._3 == 10000L)
        val sorted = rs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq((_, na, ra), (_, nb, rb)) => if (nb > na) assert(rb <= ra)
          case _ => ()
        }
      }
      val r2 = rates(2.0).map(r => r._1 -> r._3).toMap
      rates(4.0).foreach { case (s, _, bp4) => assert(bp4 <= r2(s)) }
    }
  }

  test("perplexity buckets: the ntile deal is balanced (±1) and score-monotone for any data") {
    val rowGen = for {
      id <- Gen.chooseNum(1L, 400L)
      key <- Gen.oneOf("a", "b")
      score <- Gen.chooseNum(0, 8) // narrow range forces boundary ties
    } yield (id, key, score)
    (1 to 5).foreach { _ =>
      val rows = samples(rowGen, 45).distinctBy(_._1)
      val df = spark.createDataFrame(rows).toDF("id", "key", "sc")
      val out = Pipeline.perplexityBuckets(df, Seq(col("key")), col("sc"), col("id"))
        .select(col("key"), col("bucket"), col("sc")).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      assert(out.length == rows.length)
      out.groupBy(_._1).foreach { case (key, rs) =>
        val sizes = rs.groupBy(_._2).view.mapValues(_.length).toMap
        assert(sizes.keySet.subsetOf(Set(1, 2, 3)))
        if (rs.length >= 3) {
          assert(sizes.size == 3, s"$key: $sizes")
          assert(sizes.values.max - sizes.values.min <= 1, s"$key: uneven $sizes")
        }
        for (b <- 1 to 2; hi <- sizes.get(b); lo <- sizes.get(b + 1)) {
          val _ = (hi, lo)
          assert(rs.filter(_._2 == b).map(_._3).min >= rs.filter(_._2 == b + 1).map(_._3).max,
            s"$key: bucket order violated at $b")
        }
      }
    }
  }

  test("keep-best: exactly one keeper per cluster, keeper maximizes (score, -id)") {
    val rowGen = for {
      id <- Gen.chooseNum(1L, 300L)
      ck <- Gen.chooseNum(0, 9)
      score <- Gen.chooseNum(0, 5) // small range forces score ties
    } yield (id, ck, score)
    (1 to 6).foreach { _ =>
      val rows = samples(rowGen, 50).distinctBy(_._1)
      val df = spark.createDataFrame(rows).toDF("id", "ck", "s")
      val out = Dedup.keepBestInCluster(df, col("ck"), col("id"), col("s"))
        .select(col("id"), col("ck"), col("keep")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      assert(out.length == rows.length)
      out.groupBy(_._2).foreach { case (ck, members) =>
        val keepers = members.filter(_._3).map(_._1)
        assert(keepers.length == 1, s"cluster $ck: $keepers")
        val want = rows.filter(_._2 == ck).maxBy(t => (t._3, -t._1))._1
        assert(keepers.head == want, s"cluster $ck")
      }
    }
  }

  test("upsert latest-wins equals the max-(ver, side) reference for any CDC batch") {
    import graft.operators.Relational
    val rowGen = for {
      k <- Gen.chooseNum(0L, 15L)
      ver <- Gen.chooseNum(0L, 5L)
      pay <- Gen.chooseNum(0, 99)
    } yield (k, s"p$pay", ver)
    (1 to 6).foreach { round =>
      // distinct (key, ver) per side keeps the winner unique up to (ver, side)
      val baseRows = samples(rowGen, 40).distinctBy(t => (t._1, t._3))
      val updRows = samples(rowGen.map(t => (t._1, t._2 + "u", t._3)), 40)
        .distinctBy(t => (t._1, t._3))
      val base = spark.createDataFrame(baseRows).toDF("k", "payload", "ver")
      val upd = spark.createDataFrame(updRows).toDF("k", "payload", "ver")
      val got = Relational.upsertLatest(base, upd, Seq("k"), "ver")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val want = (baseRows.map(t => (t, 0)) ++ updRows.map(t => (t, 1)))
        .groupBy(_._1._1)
        .map { case (k, cands) =>
          val w = cands.maxBy { case ((_, _, ver), side) => (ver, side) }
          k -> ((w._1._2, w._1._3))
        }
      assert(got === want, s"round $round")
    }
  }

  test("change intervals equal a run-length encoding of the sorted log for any input") {
    import graft.operators.Timeseries
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c")
      ts <- Gen.chooseNum(0L, 20L) // small range forces equal-ts ties
      v <- Gen.oneOf(Some("x"), Some("y"), Some("z"), None)
    } yield (k, ts, v)
    (1 to 6).foreach { round =>
      val rows = samples(rowGen, 60).zipWithIndex
        .map { case ((k, ts, v), id) => (k, ts, id.toLong, v.orNull) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromTuple), 3),
        StructType(Seq(StructField("k", StringType), StructField("ts", LongType),
          StructField("id", LongType), StructField("v", StringType))))
      val got = Timeseries.changeIntervals(df, col("k"), col("ts"), col("id"), col("v"))
        .collect()
        .map(r => (r.getString(0), Option(r.getString(1)),
          r.getLong(2), if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).toList).toMap
      // reference: per key, sort by (ts, id), run-length encode the value
      val want = rows.groupBy(_._1).view.mapValues { ks =>
        val sorted = ks.sortBy(t => (t._2, t._3)).toList
        val runs = sorted.foldLeft(List.empty[(Option[String], Long, Long)]) {
          case (acc, (_, ts, _, v)) => acc match {
            case (pv, from, n) :: rest if pv == Option(v) => (pv, from, n + 1) :: rest
            case _ => (Option(v), ts, 1L) :: acc
          }
        }.reverse
        runs.zip(runs.drop(1).map(r => Some(r._2)) :+ None).map {
          case ((v, from, n), to) => (v, from, to, n)
        }
      }.toMap
      want.foreach { case (k, wruns) =>
        val gruns = got(k).map(t => (t._2, t._3, t._4, t._5))
        assert(gruns === wruns, s"round $round key $k")
      }
      assert(got.keySet === want.keySet, s"round $round")
    }
  }

  test("misra-gries: never overcounts, undercount <= n/(k+1), frequent items present, for any stream") {
    import graft.functions.FrequentItems
    val streamGen = Gen.chooseNum(30, 120).flatMap(n =>
      // zipf-ish: hot item drawn often, tail sparse
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        3 -> Gen.chooseNum(0, 40).map(i => s"cold$i"))))
    samples(streamGen, 8).zipWithIndex.foreach { case (items, i) =>
      val k = 3 + (i % 5)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(items.map(Row(_)), 4),
        StructType(Seq(StructField("t", StringType))))
      val got = df.agg(FrequentItems.freqItems(col("t"), k, k).as("hh"))
        .select(explode(col("hh")).as("e")).select("e.item", "e.est_count")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toLong / (k + 1)
      got.foreach { case (item, est) =>
        assert(est <= exact(item), s"case $i: $item overcounted")
        assert(exact(item) - est <= bound, s"case $i: $item undercount beyond $bound")
      }
      exact.filter(_._2 > bound).keys.foreach(hot =>
        assert(got.contains(hot), s"case $i: $hot (count ${exact(hot)}) must be present"))
    }
  }

  test("jaccard identity: a document is a perfect duplicate of itself") {
    val gen = Gen.chooseNum(5, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("w1", "w2", "w3", "w4")).map(_.mkString(" ")))
    samples(gen, 8).foreach { text =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(1L, text, 0L), Row(2L, text, 0L)), 1),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType), StructField("blk", LongType))))
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq(col("blk")),
          shingleSize = 3, threshold = 0.99)
        .collect()
      assert(pairs.length === 1, s"self-duplicate must pair (text=$text)")
      assert(pairs(0).getDouble(2) === 1.0)
    }
  }

  test("property: canonicalizeUrl is idempotent and component-stable for ANY generated URL") {
    import graft.operators.Web
    val schemeGen = Gen.oneOf("http", "https", "HTTP", "Https", "ftp")
    val labelGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val hostGen = for {
      nl <- Gen.choose(1, 4)
      ls <- Gen.listOfN(nl, labelGen)
      sfx <- Gen.oneOf("", ".com", ".co.uk", ".org", ".example.co.uk")
    } yield (ls.mkString(".") + sfx)
    val urlGen = for {
      sch <- schemeGen
      hst <- hostGen
      prt <- Gen.oneOf("", ":80", ":443", ":8080", ":65000")
      pth <- Gen.oneOf("", "/", "/a", "/a/b.html", "/x%20y")
      q <- Gen.oneOf("", "?a=1", "?utm_source=x", "?b=2&a=1&utm_c=3", "?z&=v&k=")
      f <- Gen.oneOf("", "#f", "#a=b")
    } yield s"$sch://$hst$prt$pth$q$f"
    val urls = samples(urlGen, 120).distinct
    import spark.implicits._
    val df = urls.toDF("u")
    val rows = df.select(col("u"), Web.canonicalizeUrl(col("u")).as("c1"),
        Web.canonicalizeUrl(Web.canonicalizeUrl(col("u"))).as("c2"),
        Web.host(col("u")).as("h"),
        Web.registeredDomain(Web.host(col("u"))).as("rd"))
      .collect()
    for (r <- rows) {
      val (u, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c1 == c2, s"idempotence broke for $u: '$c1' vs '$c2'")
      if (c1 != null) {
        assert(c1 == c1.toLowerCase.take(c1.indexOf("://") + 3) + c1.drop(c1.indexOf("://") + 3),
          s"scheme must be lowercase: $c1")
        assert(!c1.contains("#"), s"fragment must not survive: $u -> $c1")
        assert(!c1.contains("utm_"), s"tracking params must not survive: $u -> $c1")
        val h = r.getString(3)
        assert(c1.contains(h), s"canonical must embed the lowercased host: $u -> $c1")
        val rd = r.getString(4)
        assert(h == rd || h.endsWith("." + rd) || !h.contains("."),
          s"registered domain must be a dot-boundary suffix of the host: $h vs $rd")
      }
    }
  }

  test("property: triangleCount equals brute-force 3-subset enumeration on random graphs") {
    import graft.operators.Graph
    import spark.implicits._
    val graphGen = for {
      nv <- Gen.choose(3, 9)
      ne <- Gen.choose(0, 18)
      es <- Gen.listOfN(ne, for {
        a <- Gen.choose(0L, nv.toLong - 1)
        b <- Gen.choose(0L, nv.toLong - 1)
      } yield (a, b))
    } yield es
    for ((edges, i) <- samples(graphGen, 12).zipWithIndex) {
      val simple = edges.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val adj = simple.toSet
      val verts = simple.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = verts.combinations(3).count { case Seq(a, b, c) =>
        adj((a, b)) && adj((b, c)) && adj((a, c))
      }
      if (simple.nonEmpty) {
        val got = Graph.triangleCount(edges.toDF("src", "dst")).collect()(0).getLong(2)
        assert(got === brute.toLong, s"case $i: graph $simple expected $brute got $got")
      }
    }
  }

  test("property: winsorizedStats boundaries equal driver-side nearest-rank on random data") {
    import graft.operators.Analytics
    import spark.implicits._
    val dataGen = for {
      n <- Gen.choose(1, 60)
      vs <- Gen.listOfN(n, Gen.choose(-50000, 50000).map(_ / 100.0))
    } yield vs
    for ((vs, i) <- samples(dataGen, 10).zipWithIndex) {
      val df = vs.map(("g", _)).toDF("g", "v")
      val r = Analytics.winsorizedStats(df, Seq(col("g")), col("v")).collect()(0)
      val sortedU = vs.map(v => math.round(v * 10000)).sorted
      def nr(p: Int) = sortedU((((sortedU.size.toLong * p + 99) / 100).toInt - 1).max(0))
      assert(math.round(r.getAs[Double]("lo") * 10000) === nr(5), s"case $i lo")
      assert(math.round(r.getAs[Double]("hi") * 10000) === nr(95), s"case $i hi")
      val clamped = sortedU.map(u => u.max(nr(5)).min(nr(95))).sum
      assert(r.getAs[Long]("sum_u") === clamped, s"case $i sum")
    }
  }

  test("property: streaming Bollinger equals the batch census for random series at random batch splits") {
    // the twin family's exactness claim is "a mid-series micro-batch split
    // cannot flip a flag" — so the split POSITION is the thing to randomize,
    // not just the fixture the example specs pin
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingBollinger
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(8, 30)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      split <- Gen.chooseNum(1, n - 1)
    } yield (vals.map(_ / 1000.0), split)
    for (((vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = vals.zipWithIndex.map { case (v, t) =>
        StreamingBollinger.Obs("k", (t + 1).toLong, v)
      }
      val input = MemoryStream[StreamingBollinger.Obs]
      val q = StreamingBollinger.flags(input.toDS(), frameRows = 5, k = 2)
        .writeStream.format("memory").queryName(s"graft_prop_boll_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        val streamed = spark.table(s"graft_prop_boll_$i")
          .collect().map(r => r.getLong(2) -> r.getBoolean(4)).toMap
        val batch = graft.operators.Analytics.bollingerCensus(
            obs.toDF("key", "ts_s", "v"), "key",
            Seq(col("ts_s"), col("v")), col("v"), frameRows = 5, k = 2)
          .collect()(0)
        val (nB, breachesB) = (batch.getLong(1), batch.getLong(2))
        assert(streamed.size.toLong === nB,
          s"case $i (n=${vals.size}, split=$split): evaluated-row count")
        assert(streamed.count(_._2).toLong === breachesB,
          s"case $i (n=${vals.size}, split=$split): breach count")
      } finally q.stop()
    }
  }

  test("property: streaming SPC equals the batch census for random series at random batch splits") {
    // same claim as the Bollinger property, for the twin with the most
    // intricate state (arrival counter + 7-value ring + four run rules):
    // a random mid-series micro-batch split must not flip any rule count
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingSpc
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(8, 30)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      split <- Gen.chooseNum(1, n - 1)
    } yield (vals.map(_ / 1000.0), split)
    for (((vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = vals.zipWithIndex.map { case (v, t) =>
        StreamingSpc.Obs("k", (t + 1).toLong, v)
      }
      // frozen limits = the series' own full exact moments, like the
      // pinned parity spec — that is what makes batch the oracle
      val cents = obs.map(o => java.math.BigDecimal.valueOf(o.v * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      val limits = Map("k" -> StreamingSpc.Limits(cents.size.toLong,
        cents.map(BigInt(_)).sum, cents.map(c => BigInt(c) * c).sum))
      val input = MemoryStream[StreamingSpc.Obs]
      val q = StreamingSpc.flags(input.toDS(), limits)
        .writeStream.format("memory").queryName(s"graft_prop_spc_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
        val streamed = spark.table(s"graft_prop_spc_$i")
          .groupBy(col("key")).agg(count(lit(1)).as("n"),
            cnt(col("r1")).as("r1"), cnt(col("r2")).as("r2"),
            cnt(col("r3")).as("r3"), cnt(col("r4")).as("r4"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
        val batch = graft.operators.Analytics.spcCensus(
            obs.toDF("key", "ts_s", "v"), "key",
            Seq(col("ts_s"), col("v")), col("v"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
        assert(streamed === batch,
          s"case $i (n=${vals.size}, split=$split): $streamed vs $batch")
      } finally q.stop()
    }
  }

  test("property: streaming rolling-median equals the batch census for random series at random batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingRollingMedian
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(10, 30)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      split <- Gen.chooseNum(1, n - 1)
    } yield (vals.map(_ / 1000.0), split)
    for (((vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = vals.zipWithIndex.map { case (v, t) =>
        StreamingRollingMedian.Obs("k", (t + 1).toLong, v)
      }
      val input = MemoryStream[StreamingRollingMedian.Obs]
      val q = StreamingRollingMedian.flags(input.toDS(), frameRows = 7, k = 3)
        .writeStream.format("memory").queryName(s"graft_prop_rollmed_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        val streamed = spark.table(s"graft_prop_rollmed_$i")
          .collect().map(r => r.getLong(2) -> r.getBoolean(4)).toMap
        val batch = graft.operators.Analytics.rollingMadCensus(
            obs.toDF("key", "ts_s", "v"), "key",
            Seq(col("ts_s"), col("v")), col("v"), frameRows = 7, k = 3)
          .collect()(0)
        val nB = batch.getAs[Long]("n_eval")
        val flagsB = batch.getAs[Long]("n_outliers")
        assert(streamed.size.toLong === nB,
          s"case $i (n=${vals.size}, split=$split): evaluated-row count")
        assert(streamed.count(_._2).toLong === flagsB,
          s"case $i (n=${vals.size}, split=$split): outlier count")
      } finally q.stop()
    }
  }

  test("property: streaming EWMA equals the batch column bit-for-bit for random series at random batch splits") {
    // scalar-recursion state shape (vs the ring twins above): every output
    // replays the batch weights in the batch order, so equality is per-row
    // and bit-exact, not aggregate
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingEwma
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(8, 30)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      split <- Gen.chooseNum(1, n - 1)
    } yield (vals.map(_ / 1000.0), split)
    for (((vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = vals.zipWithIndex.map { case (v, t) =>
        StreamingEwma.Obs("k", (t + 1).toLong, v)
      }
      val input = MemoryStream[StreamingEwma.Obs]
      val q = StreamingEwma.smooth(input.toDS(), alpha = 0.3, horizon = 8)
        .writeStream.format("memory").queryName(s"graft_prop_ewma_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        val streamed = spark.table(s"graft_prop_ewma_$i")
          .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
        val batch = obs.toDF("key", "ts_s", "v")
          .withColumn("e", graft.operators.Analytics.ewma("key",
            Seq(col("ts_s"), col("v")), "v", 0.3, 8))
          .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
        assert(streamed === batch,
          s"case $i (n=${vals.size}, split=$split): per-row bit parity")
      } finally q.stop()
    }
  }

  test("property: streaming TWAP stints reproduce the batch average for random irregular series at random batch splits") {
    // open-stint state shape: random gap lengths exercise the
    // holds-until-next weighting, random splits the cross-batch stint close
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingTwap
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(5, 25)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 2000000L))
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      split <- Gen.chooseNum(1, n - 1)
    } yield (gaps, vals.map(_ / 1000.0), split)
    for (((gaps, vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val ts = gaps.scanLeft(0L)(_ + _).tail // strictly increasing, >= 1
      val obs = ts.zip(vals).map { case (t, v) => StreamingTwap.Obs("k", t, v) }
      val input = MemoryStream[StreamingTwap.Obs]
      val q = StreamingTwap.stints(input.toDS())
        .writeStream.format("memory").queryName(s"graft_prop_twap_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        // the pinned parity spec's tail math over the streamed stints
        val streamed = spark.table(s"graft_prop_twap_$i")
          .groupBy(col("key")).agg(
            count(lit(1)).as("n_segments"),
            sum(col("dur_ms")).as("dur_ms"),
            sum(col("vu").cast("decimal(38,0)") * col("dur_ms")).as("num"))
          .filter(col("dur_ms") > 0)
          .select(col("key"), col("n_segments"), col("dur_ms"),
            (floor(col("num").cast("double") / col("dur_ms").cast("double")
              + 0.5d) / 10000d).as("twavg"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
        val batch = graft.operators.Timeseries.timeWeightedAvg(
            obs.toDF("key", "ts_us", "v"), col("key"), col("ts_us"),
            Seq(col("ts_us"), col("v")), col("v"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
        assert(streamed === batch,
          s"case $i (n=${vals.size}, split=$split): $streamed vs $batch")
      } finally q.stop()
    }
  }

  test("property: streaming anomalies equal the batch RANGE frame for random in-order series at random batch splits") {
    // in-order distinct-timestamp arrival is exactly the regime where the
    // twin's ring IS the batch RANGE frame — so both the frame COUNT and
    // the flag must match for any series and any micro-batch split
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(12, 30)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1, 50))      // distinct ts: gaps >= 1
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      split <- Gen.chooseNum(1, n - 1)
    } yield (gaps.scanLeft(0L)(_ + _).tail, vals.map(_ / 1000.0), split)
    for (((tss, vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = tss.zip(vals).map { case (t, v) => StreamingAnomaly.Obs("k", t, v) }
      val input = MemoryStream[StreamingAnomaly.Obs]
      // odd cases run under a far-beyond-the-series TTL: with strictly
      // increasing ts the watermark never drops a row and no key idles
      // past the horizon, so the EventTimeTimeout plan must be
      // output-neutral — parity is asserted for BOTH TwinRunner paths
      val ttl = if (i % 2 == 1) Some(365L * 24 * 3600 * 1000) else None
      val q = StreamingAnomaly.flags(input.toDS(), windowSeconds = 120, z = 2.0, minN = 3,
          maxIdleMs = ttl)
        .writeStream.format("memory").queryName(s"graft_prop_anom_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        val streamed = spark.table(s"graft_prop_anom_$i")
          .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getBoolean(4))).toMap
        val batch = graft.operators.Timeseries.rollingAnomalies(
            obs.toDF("key", "ts", "v"), col("key"), col("ts"), col("v"),
            windowSeconds = 120, z = 2.0, minN = 3)
          .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getBoolean(6))).toMap
        assert(streamed === batch,
          s"case $i (n=${vals.size}, split=$split): $streamed vs $batch")
      } finally q.stop()
    }
  }

  test("property: streaming CUSUM is split-invariant — any micro-batch cut yields the whole-series run bit-for-bit") {
    // the online form intentionally diverges from the batch final-mean
    // census (documented), so ITS exactness claim is state-carry: the
    // alarm rows of a split run must equal the single-batch run exactly,
    // floats included (same arithmetic in the same order)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingCusum
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(8, 30)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 100000))
      shiftAt <- Gen.chooseNum(2, n - 1)   // a level shift so alarms happen
      split <- Gen.chooseNum(1, n - 1)
    } yield (vals.zipWithIndex.map { case (v, t) =>
      v / 1000.0 + (if (t >= shiftAt) 60.0 else 0.0) }, split)
    for (((vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = vals.zipWithIndex.map { case (v, t) =>
        StreamingCusum.Obs("k", (t + 1).toLong, v)
      }
      // odd cases run the SPLIT side under a far-beyond-the-series TTL
      // (strictly increasing ts — watermark-safe): the whole-series run
      // stays TTL-off, so equality also proves the EventTimeTimeout plan
      // is output-neutral when the horizon is never hit
      def run(batches: Seq[Seq[StreamingCusum.Obs]], name: String,
          ttl: Option[Long]): Set[(Long, Double, Long, Double, Double, Boolean)] = {
        val input = MemoryStream[StreamingCusum.Obs]
        val q = StreamingCusum.alarms(input.toDS(), threshold = 25.0, slack = 0.5,
            maxIdleMs = ttl)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          batches.foreach { b => input.addData(b); q.processAllAvailable() }
          spark.table(name).collect().map(r => (r.getLong(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSet
        } finally q.stop()
      }
      val ttl = if (i % 2 == 1) Some(365L * 24 * 3600 * 1000) else None
      val whole = run(Seq(obs), s"graft_prop_cusum_w$i", None)
      val cut = run(Seq(obs.take(split), obs.drop(split)), s"graft_prop_cusum_c$i", ttl)
      assert(cut === whole,
        s"case $i (n=${vals.size}, split=$split): split run diverged from whole run")
      assert(whole.exists(_._6), s"case $i: the level shift must alarm at least once")
    }
  }

  test("property: streaming dwell stints reproduce the batch census for random tied-timestamp series at random batch splits") {
    // integer-exact end to end, and ts TIES are generated on purpose: the
    // (ts_us, seq) tie-break must segment identically to the batch
    // census's (ts, event_id) order whatever the micro-batch cut
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingDwell
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(6, 24)
      gaps <- Gen.listOfN(n, Gen.chooseNum(0, 20))      // 0-gaps = ts ties
      states <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      split <- Gen.chooseNum(1, n - 1)
    } yield (gaps.scanLeft(0L)(_ + _).tail, states, split)
    for (((tss, states, i0), i) <- samples(gen, 5).zipWithIndex) {
      val split = i0
      val obs = tss.zip(states).zipWithIndex.map { case ((t, st), j) =>
        StreamingDwell.Obs(if (j % 2 == 0) "u1" else "u2", t, j.toLong, st)
      }
      val input = MemoryStream[StreamingDwell.Obs]
      val q = StreamingDwell.stints(input.toDS())
        .writeStream.format("memory").queryName(s"graft_prop_dwell_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        val streamed = graft.operators.Timeseries
          .dwellCensusFromStints(spark.table(s"graft_prop_dwell_$i"),
            col("state"), col("dur_us"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val batch = graft.operators.Timeseries.dwellCensus(
            obs.toDF("k", "ts_us", "seq", "st"), "k", Seq(col("ts_us"), col("seq")),
            col("ts_us"), col("st"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        assert(streamed === batch,
          s"case $i (n=${obs.size}, split=$split): $streamed vs $batch")
      } finally q.stop()
    }
  }

  test("property: streaming SCD2 closed intervals equal the batch operator for random change logs at random batch splits") {
    // runs over a small value alphabet INCLUDING nulls (a null run is a
    // run); the open run per key must never be emitted, the closed set
    // must equal the batch gaps-and-islands derivation exactly
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.StreamingScd2
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      n <- Gen.chooseNum(6, 24)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 10L))
      vals <- Gen.listOfN(n, Gen.oneOf("x", "y", null))
      split <- Gen.chooseNum(1, n - 1)
    } yield (gaps.scanLeft(0L)(_ + _).tail, vals, split)
    for (((tss, vals, split), i) <- samples(gen, 5).zipWithIndex) {
      val obs = tss.zip(vals).zipWithIndex.map { case ((t, v), j) =>
        StreamingScd2.Change(if (j % 2 == 0) "k1" else "k2", t, j.toLong, v)
      }
      val input = MemoryStream[StreamingScd2.Change]
      // odd cases: far-beyond-the-series TTL (strictly increasing ts —
      // watermark-safe), asserting the EventTimeTimeout plan is
      // output-neutral when no key idles past the horizon
      val ttl = if (i % 2 == 1) Some(365L * 24 * 3600 * 1000) else None
      val q = StreamingScd2.intervals(input.toDS(), maxIdleMs = ttl)
        .writeStream.format("memory").queryName(s"graft_prop_scd2_$i")
        .outputMode("append").start()
      try {
        input.addData(obs.take(split))
        q.processAllAvailable()
        input.addData(obs.drop(split))
        q.processAllAvailable()
        val streamed = spark.table(s"graft_prop_scd2_$i")
          .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        val batchClosed = graft.operators.Timeseries.changeIntervals(
            obs.toDF("key", "ts", "seq", "value"), col("key"), col("ts"),
            col("seq"), col("value"))
          .filter(col("valid_to").isNotNull)
          .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
            r.getLong(4), r.getLong(3))).toSet
        assert(streamed === batchClosed,
          s"case $i (n=${obs.size}, split=$split):\n$streamed\nvs\n$batchClosed")
        // the key's OPEN run never leaks: no emitted interval reaches the
        // key's final event (its valid_to would have to lie beyond it)
        Seq("k1", "k2").filter(k => obs.exists(_.key == k)).foreach { k =>
          val lastTs = obs.filter(_.key == k).map(_.ts_s).max
          assert(streamed.filter(_._1 == k).forall(_._4 <= lastTs),
            s"case $i: an emitted interval for $k closes past the key's last event")
        }
      } finally q.stop()
    }
  }
}
