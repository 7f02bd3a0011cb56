package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MinRollingHash

/** Property-based invariants for the deterministic building blocks —
  * the properties the 100 TB story leans on (bit-stability under
  * partitioning, hash/fingerprint laws). Uses scalacheck generators
  * with fixed seeds (deterministic CI).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("topk_by equals the ordered window under any partitioning, " +
      "ties and duplicates included") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(30, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(1L, 4L)
        // coarse score grid → frequent exact ties, so the id
        // tie-break is actually exercised
        s <- Gen.chooseNum(-6, 6).map(_.toDouble / 2.0)
        id <- Gen.chooseNum(1L, 40L)
      } yield (g, s, id))
    } yield rows
    val k = 5
    samples(gen, 6).foreach { rows =>
      // many input partitions → partial buffers really merge
      val df = rows.toDF("query_id", "score", "cand_id").repartition(7)
      val agg = df.groupBy(col("query_id"))
        .agg(operators.Similarity.topKByAgg(
          col("score"), col("cand_id"), k).as("tk"))
        .select(col("query_id"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("query_id"), (col("p") + 1).cast("int").as("rank"),
          col("e.id").as("cand_id"), col("e.score").as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cand_id"))
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank").cast("int"),
          col("cand_id"), col("score"))
      val got = agg.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getDouble(3))).sorted
      val want = win.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getDouble(3))).sorted
      assert(got.toSeq == want.toSeq)
    }
  }

  test("rolling-hash fingerprint: suffix extension can only lower the min") {
    val pairs = samples(
      for {
        a <- Gen.alphaNumStr.suchThat(_.length >= 16)
        b <- Gen.alphaNumStr
      } yield (a, b), 60)
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val fa = MinRollingHash.minHash(a.getBytes("UTF-8"), 16)
      val fab = MinRollingHash.minHash((a + b).getBytes("UTF-8"), 16)
      assert(fab <= fa, s"a=$a b=$b") // all windows of a are windows of a+b
    }
  }

  test("rolling-hash: a shared 16-byte window bounds both documents' minima") {
    samples(Gen.alphaStr.suchThat(_.length >= 16), 60).foreach { shared =>
      val w = shared.take(16)
      val h = MinRollingHash.minHash(w.getBytes("UTF-8"), 16)
      assert(MinRollingHash.minHash(("XX" + w + "YY").getBytes("UTF-8"),
        16) <= h)
    }
  }

  test("decimal-exact aggregates are invariant under repartitioning") {
    val base = graft.sources.Tables.table(spark, sf, "lineitem")
    def total(parts: Int): String =
      (if (parts == 0) base else base.repartition(parts))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("string"))
        .head().getString(0)
    val expect = total(0)
    samples(Gen.chooseNum(1, 17), 5).foreach { p =>
      assert(total(p) == expect, s"parts=$p")
    }
  }

  test("surrogate keys are injective on the natural key encoding") {
    import spark.implicits._
    val xs = samples(Gen.alphaNumStr, 200).distinct
    val keys = xs.toDF("k")
      .select(operators.StarSchema.surrogateKey(col("k")).as("id"))
      .collect().map(_.getString(0)).toSet
    assert(keys.size == xs.size)
  }

  test("splitByHash partitions the key set for arbitrary positive weights") {
    import spark.implicits._
    val ids = (1L to 400L).toDF("id")
    samples(Gen.listOfN(3, Gen.chooseNum(1, 9)), 8).foreach { ws =>
      val weights = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val split = operators.Corpus.splitByHash(ids, "id", "p", weights)
      val byLabel = split.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byLabel.values.sum == 400, s"weights=$ws: not exhaustive")
      assert(byLabel.keySet.subsetOf(weights.map(_._1).toSet),
        s"weights=$ws: phantom label")
      // cross-check every assignment against an independent JVM-side
      // recomputation of the bucket → cumulative-weight-range label
      val den = ws.sum
      val md = java.security.MessageDigest.getInstance("SHA-256")
      def expectLabel(id: Long): String = {
        val hex = md.digest(s"$id:p".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        val bucket = java.lang.Long.parseLong(hex, 16) % den
        val cum = ws.scanLeft(0)(_ + _).tail
        weights(cum.indexWhere(bucket < _))._1
      }
      split.collect().foreach { r =>
        assert(r.getString(1) == expectLabel(r.getLong(0)),
          s"weights=$ws id=${r.getLong(0)}")
      }
    }
  }

  test("sampleByHash is monotone in the keep fraction") {
    import spark.implicits._
    val ids = (1L to 300L).toDF("id")
    val kept = (0 to 10).map(num => num ->
      operators.Corpus.sampleByHash(ids, "id", num, 10, "mono")
        .collect().map(_.getLong(0)).toSet)
    kept.sliding(2).foreach { case Seq((n1, s1), (n2, s2)) =>
      assert(s1.subsetOf(s2), s"num=$n1 sample not contained in num=$n2")
    }
    assert(kept.head._2.isEmpty && kept.last._2.size == 300)
  }

  test("asofJoin matches a naive quadratic reference on random event sets") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(5, 25)
      rows <- Gen.listOfN(n, for {
        key <- Gen.chooseNum(1L, 3L)
        ts <- Gen.chooseNum(0L, 50L)
      } yield (key, ts))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    samples(gen, 6).foreach { rows =>
      val left = rows.map { case (id, k, t) =>
        (id, k, new java.sql.Timestamp(t * 1000L)) }
        .toDF("event_id", "user_id", "ts")
      val right = rows.filter(_._1 % 3 == 0).map { case (id, k, t) =>
        (id + 1000L, k, new java.sql.Timestamp(t * 1000L), s"v$id") }
      val rightDf = right.toDF("event_id", "user_id", "ts", "label")
      val got = operators.Events
        .asofJoin(left, rightDf, "user_id", "ts", "event_id", Seq("label"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      rows.foreach { case (id, k, t) =>
        // naive reference: latest right row (same key, ts <= t),
        // ties broken by the (ts, event_id) order the operator declares
        val expect = right.filter(r => r._2 == k && r._3.getTime <= t * 1000L)
          .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._4)
        assert(got(id) == expect, s"row=$id key=$k t=$t")
      }
    }
  }

  test("packGreedy: preceding-cum of every doc in bin b lies in [b·B, (b+1)·B)") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.chooseNum(1L, 120L))
    samples(gen, 6).foreach { sizes =>
      val df = sizes.zipWithIndex.map { case (s, i) =>
        (i.toLong, s, i % 2) }.toDF("id", "n", "shard")
      val bins = operators.Corpus
        .packGreedy(df, "id", "n", "shard", Seq("id"), 100)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      (0 to 1).foreach { sh =>
        var cum = 0L
        sizes.zipWithIndex.filter(_._2 % 2 == sh).foreach { case (s, i) =>
          assert(bins(i.toLong) == cum / 100, s"doc $i cum=$cum")
          cum += s
        }
      }
    }
  }

  test("packPieces: bins exactly at budget, pieces tile every doc's span") {
    import spark.implicits._
    val gen = Gen.listOfN(24, Gen.chooseNum(0L, 250L))
    samples(gen, 6).foreach { sizes =>
      val B = 100
      val df = sizes.zipWithIndex.map { case (s, i) =>
        (i.toLong, s, i % 2) }.toDF("id", "n", "shard")
      val pieces = operators.Corpus
        .packPieces(df, "id", "n", "shard", Seq("id"), B)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      // (1) per (shard, bin) totals: exactly B everywhere except each
      // shard's final bin, which holds total mod B (when nonzero)
      (0 to 1).foreach { sh =>
        val total = sizes.zipWithIndex.filter(_._2 % 2 == sh).map(_._1).sum
        val byBin = pieces.filter(_._2 == sh).groupBy(_._3).view
          .mapValues(_.map(_._5).sum).toMap
        if (total > 0) {
          val lastBin = (total - 1) / B
          assert(byBin.keySet == (0L to lastBin).toSet)
          byBin.foreach { case (b, t) =>
            val want = if (b == lastBin && total % B != 0) total % B else B.toLong
            assert(t == want, s"shard=$sh bin=$b tokens=$t want=$want")
          }
        } else assert(byBin.isEmpty)
      }
      // (2) each doc's pieces, bin-ordered, tile [0, n) contiguously
      sizes.zipWithIndex.foreach { case (n, i) =>
        val ps = pieces.filter(_._1 == i.toLong).sortBy(_._3)
        if (n == 0) assert(ps.isEmpty, s"zero-token doc $i emitted pieces")
        else {
          assert(ps.head._4 == 0L && ps.map(_._5).sum == n)
          ps.sliding(2).foreach {
            case Array(a, b) =>
              assert(b._4 == a._4 + a._5, s"gap in doc $i pieces")
              assert(b._3 == a._3 + 1, s"doc $i skipped a bin")
            case _ =>
          }
        }
      }
    }
  }

  test("batchId: partition-invariant, order-invariant, set-sensitive") {
    import spark.implicits._
    val ids = (1L to 400L).map(i => i * 37 % 1009)
    val a = operators.Dedup.batchId(ids.toDF("id"), "id")
    // same set, different row order and partitioning → same id
    val b = operators.Dedup.batchId(
      scala.util.Random.shuffle(ids).toDF("id").repartition(7), "id")
    assert(a == b, "batch id depends on order/partitioning")
    // duplicates collapse: the id is a property of the SET
    assert(operators.Dedup.batchId((ids ++ ids.take(50)).toDF("id"),
      "id") == a)
    // any element change → different id (superset, subset, swap)
    assert(operators.Dedup.batchId((ids :+ 9999L).toDF("id"), "id") != a)
    assert(operators.Dedup.batchId(ids.tail.toDF("id"), "id") != a)
    assert(operators.Dedup.batchId(
      (ids.tail :+ 9998L).toDF("id"), "id") != a)
  }

  test("snapshotDiff partitions the key universe and inverts cleanly") {
    import spark.implicits._
    val gen = for {
      keys <- Gen.listOfN(60, Gen.chooseNum(0L, 30L)).map(_.distinct)
      split <- Gen.chooseNum(0, 100)
    } yield (keys, split)
    samples(gen, 12).foreach { case (keys, split) =>
      val before = keys.filter(k => (k * 7 + split) % 3 != 0)
        .map(k => (k, k * 2)).toDF("k", "v")
      val after = keys.filter(k => (k * 5 + split) % 3 != 0)
        .map(k => (k, if (k % 2 == 0) k * 2 else k * 3)).toDF("k", "v")
      val diff = operators.Incremental
        .snapshotDiff(before, after, Seq("k"))
        .select(col("k"), col("change")).as[(Long, String)].collect().toMap
      // every key of either side is classified exactly once
      val universe = (before.select("k").as[Long].collect() ++
        after.select("k").as[Long].collect()).toSet
      assert(diff.keySet == universe)
      // swapping the snapshots swaps added <-> removed and keeps the rest
      val inv = operators.Incremental
        .snapshotDiff(after, before, Seq("k"))
        .select(col("k"), col("change")).as[(Long, String)].collect().toMap
      diff.foreach { case (k, c) =>
        val expect = c match {
          case "added" => "removed"
          case "removed" => "added"
          case other => other
        }
        assert(inv(k) == expect, s"k=$k: $c vs ${inv(k)}")
      }
    }
  }

  test("scd2 versions tile each key's timeline exactly") {
    import spark.implicits._
    val gen = Gen.listOfN(40,
      for { k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 1000000L) }
        yield (k, t))
    samples(gen, 10).foreach { raw =>
      val changes = raw.distinct.zipWithIndex.map { case ((k, t), i) =>
        (k, new java.sql.Timestamp(t), i.toLong)
      }.toDF("k", "ts", "chg")
      val v = operators.StarSchema
        .scd2(changes, "k", "ts", col("chg"), Seq("chg"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(2),
          Option(r.getTimestamp(3))))
      v.groupBy(_._1).foreach { case (_, vs) =>
        val sorted = vs.sortBy(_._2.getTime)
        // one open version per key, each closed version abuts the next
        assert(sorted.init.forall(_._3.isDefined))
        assert(sorted.last._3.isEmpty)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3.contains(b._2))
          case _ => ()
        }
      }
    }
  }

  test("sampleWeighted: zero weight drops all, full weight keeps all, monotone between") {
    import spark.implicits._
    val df = (0L until 500L).map(k => (k, (k % 21).toInt)).toDF("k", "w")
    def kept(w: org.apache.spark.sql.Column) = operators.Corpus
      .sampleWeighted(df, "k", "s", w, 20).select("k").as[Long]
      .collect().toSet
    assert(kept(lit(0)) == Set.empty)
    assert(kept(lit(20)).size == 500)
    assert(kept(lit(25)).size == 500) // over-weight clamps to keep-all
    // per-row weights: survivors of weight w are a subset of w+1's
    val lo = kept(col("w"))
    val hi = kept(col("w") + 1)
    assert(lo.subsetOf(hi))
    // survival rate tracks the weight (rough sanity, deterministic)
    val half = kept(lit(10)).size
    assert(half > 150 && half < 350, s"half=$half")
  }

  test("bloom prefilter never rejects a true build key") {
    import spark.implicits._
    samples(Gen.listOfN(200, Gen.chooseNum(Long.MinValue,
      Long.MaxValue)), 8).foreach { keys =>
      val build = keys.toDF("k")
      val bf = build.agg(
        operators.Bloom.keyBloomAgg(col("k"), 1000L).as("bf"))
      // no false negatives, whatever the key distribution: every row
      // carries a true member, so every row must pass
      val kept = build
        .filter(operators.Bloom.mightContain(bf, col("k"))).count()
      assert(kept == keys.length.toLong)
    }
  }

  test("vector_dot equals a scala-fold reference on random vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    val cases = samples(for { a <- gen; b <- gen } yield (a, b), 40)
    val df = cases.map { case (a, b) => (a.toArray, b.toArray) }
      .toDF("a", "b")
    val got = df.select(graft.plans.VectorDot.vector_dot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      val expect = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      assert(g == expect)
    }
  }

  test("token-stat kernels equal scala references on arbitrary unicode") {
    import graft.plans.{CountInSet, SumStringLengths}
    // includes multi-byte and surrogate-pair code points, where a
    // UTF-8 byte count and a code-point count diverge
    val uniGen = Gen.listOf(
      Gen.oneOf("a", "Z", "0", "é", "ß", "之", "中", "🎉"))
      .map(_.mkString)
    val tokGen = Gen.oneOf(uniGen, Gen.alphaNumStr,
      Gen.oneOf("the", "der", "la", "之", ""))
    val cases = samples(for {
      toks <- Gen.listOf(tokGen)
      words <- Gen.listOf(Gen.oneOf("the", "der", "la", "之", "x"))
    } yield (toks, words.distinct), 80)
    assert(cases.nonEmpty)
    cases.foreach { case (toks, words) =>
      val set = CountInSet.buildSet(words)
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      assert(CountInSet.countIn(arr, set) == toks.count(words.contains))
      assert(SumStringLengths.sumLengths(arr) ==
        toks.map(t => t.codePointCount(0, t.length)).sum)
    }
  }

  test("dueRuns: grid alignment, bounds, and catchup-suffix law") {
    val start = java.time.Instant.parse("2026-01-01T00:00:00Z")
    val stepMs = 86400000L
    val cases = samples(for {
      lastOff <- Gen.chooseNum(-3L * stepMs, 40L * stepMs)
      haveLast <- Gen.oneOf(true, false)
      nowOff <- Gen.chooseNum(0L, 45L * stepMs)
    } yield (if (haveLast) Some(start.plusMillis(lastOff)) else None,
      start.plusMillis(nowOff)), 120)
    cases.foreach { case (last, now) =>
      val due = Pipeline.dueRuns("@daily", start, last, now)
      due.foreach { r =>
        // on the grid, within (lastRun, now]
        assert(java.time.Duration.between(start, r).toMillis % stepMs == 0)
        assert(!r.isAfter(now) && !r.isBefore(start))
        last.foreach(lr => assert(r.isAfter(lr)))
      }
      // contiguous cadence: consecutive runs are exactly one step apart
      due.sliding(2).foreach {
        case Seq(a, b) => assert(
          java.time.Duration.between(a, b).toMillis == stepMs)
        case _ =>
      }
      // catchup=false is exactly the last element of the backlog
      val latest = Pipeline.dueRuns("@daily", start, last, now,
        catchup = false)
      assert(latest == due.takeRight(1))
    }
  }

  test("saltedJoinHotKeys equals the plain join on random skewed data") {
    import spark.implicits._
    import graft.operators.Skew
    // heavy-tailed keys: ~half the rows land on key 0
    val rows = samples(for {
      k <- Gen.frequency((5, Gen.const(0L)), (5, Gen.chooseNum(1L, 20L)))
      v <- Gen.chooseNum(-1000, 1000)
    } yield (k, v), 400)
    val left = rows.toDF("k", "v")
    val right = samples(Gen.chooseNum(0L, 25L), 60).distinct
      .map(k => (k, s"attr$k")).toDF("k", "a")
    val plain = left.join(right, Seq("k"))
    samples(for {
      b <- Gen.chooseNum(1, 9)
      t <- Gen.chooseNum(1L, 300L)
    } yield (b, t), 4).foreach { case (buckets, thresh) =>
      val got = Skew.saltedJoinHotKeys(left, right, "k", col("v"),
        saltBuckets = buckets, hotThreshold = thresh)
      assert(got.count() == plain.count(), s"b=$buckets t=$thresh")
      assert(got.except(plain).count() == 0 &&
        plain.except(got).count() == 0, s"b=$buckets t=$thresh")
    }
  }

  test("resolveGroups equals union-find on random pair graphs") {
    import spark.implicits._
    // pointer-jumped min-label propagation vs a sequential union-find
    // reference: same components, same min-id labels, on graphs with
    // rings, chains, stars and isolated nodes mixed in
    val gen = for {
      n <- Gen.chooseNum(6, 40)
      m <- Gen.chooseNum(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(1L, n.toLong)
        b <- Gen.chooseNum(1L, n.toLong)
      } yield (a, b))
    } yield (n, edges.filter { case (a, b) => a != b })
    samples(gen, 6).foreach { case (n, edges) =>
      val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = (1L to n.toLong).map(i => i -> find(i)).toMap
      val got = operators.Dedup.resolveGroups(
          (1L to n.toLong).toDF("id"),
          edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"n=$n edges=$edges")
    }
  }

  test("Misra–Gries: counters are lower bounds within n/(k+1); " +
      "heavy items always survive; heavyHitters == exact HAVING") {
    import spark.implicits._
    // zipf-ish random streams: a few hot items + a long tail, so the
    // sketch is exercised both under and over its capacity
    val gen = for {
      nHot <- Gen.chooseNum(1, 4)
      hotRep <- Gen.chooseNum(20, 60)
      tail <- Gen.listOfN(300, Gen.chooseNum(0, 200).map("t" + _))
    } yield (1 to nHot).flatMap(h =>
      List.fill(hotRep)("hot" + h)) ++ tail
    samples(gen, 5).foreach { stream =>
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (s, xs) =>
        s -> xs.size.toLong }
      for (k <- Seq(3, 10, 50)) {
        // shard the stream 3 ways, sketch each, MG-merge the shards —
        // the distributed shape (partial agg + merge) in miniature
        val df = stream.zipWithIndex
          .map { case (s, i) => (i % 3, s) }.toDF("shard", "item")
        val merged = operators.Profiling.freqSketches(df, col("shard"),
            col("item"), k)
          .agg(operators.Profiling.freqSketchMergeAgg(col("sketch"), k).as("sk"))
          .select(explode(col("sk")).as(Seq("item", "est")))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(merged.size <= k)
        merged.foreach { case (item, est) =>
          val ex = exact.getOrElse(item, 0L)
          assert(est <= ex, s"k=$k $item overcounts: $est > $ex")
          assert((ex - est) * (k + 1) <= n,
            s"k=$k $item est=$est exact=$ex n=$n")
        }
        // every item above the guarantee line survives the merge
        exact.filter { case (_, c) => c * (k + 1) > n }.foreach {
          case (item, c) =>
            assert(merged.contains(item), s"k=$k lost $item (count $c)")
        }
        // two-pass operator == plain GROUP BY ... HAVING
        val hh = operators.Profiling.heavyHitters(df, col("item"), k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(hh == exact.filter { case (_, c) => c * k > n },
          s"k=$k")
      }
    }
  }

  test("pending-delete marker protocol matches a reference model " +
      "under random op interleavings; committed dirs never reaped, " +
      "promised windows never truncated") {
    import graft.operators.IndexProtocol
    val base = java.nio.file.Files
      .createTempDirectory("graft-marker-prop").toFile
    val fs = new org.apache.hadoop.fs.Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val ids = Seq("a", "b", "c", "d")
      // op 0 publish (dir appears, marker cleared — publishBatch's
      // contract); 1 commit (post-swap clear); 2 delist/drop (reset:
      // clear + mark with the promised window); 3 orphan-mark (a
      // sweep classifying an unlisted dir — first-marker-wins);
      // 4 sweep (rails on the current committed set); 5 clock tick
      val opsGen = Gen.listOfN(60, for {
        op <- Gen.chooseNum(0, 5)
        id <- Gen.oneOf(ids)
        amt <- Gen.chooseNum(0L, 30L)
      } yield (op, id, amt))
      samples(opsGen, 8).zipWithIndex.foreach { case (ops, i) =>
        val root = s"$base/run$i"
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/batches"))
        // reference model: what each observable MUST be after each op
        var clock = 1000L
        val dirs = scala.collection.mutable.Set.empty[String]
        val committed = scala.collection.mutable.Set.empty[String]
        val markers = scala.collection.mutable.Map.empty[String, Long]
        def dirOf(id: String) = new java.io.File(s"$root/batches/$id")
        ops.foreach { case (op, id, amt) =>
          op match {
            case 0 =>
              fs.mkdirs(new org.apache.hadoop.fs.Path(
                s"$root/batches/$id"))
              IndexProtocol.clearPendingDelete(fs, root, id)
              dirs += id; markers -= id
            case 1 if dirs(id) =>
              committed += id
              IndexProtocol.clearPendingDelete(fs, root, id)
              markers -= id
            case 2 if committed(id) =>
              committed -= id
              IndexProtocol.resetPendingDelete(fs, root, id, clock, amt)
              markers(id) = clock + amt
            case 3 if dirs(id) && !committed(id) =>
              IndexProtocol.markPendingDelete(fs, root, id, clock, amt)
              if (!markers.contains(id)) markers(id) = clock + amt
            case 4 =>
              val deleted = IndexProtocol.sweepPendingDeletes(fs, root,
                clock, committed.toSet)
              val expect = markers.toSeq.flatMap { case (mid, d) =>
                if (committed(mid)) { markers -= mid; Seq.empty }
                else if (clock >= d) {
                  markers -= mid; dirs -= mid; Seq(mid)
                } else Seq.empty
              }
              assert(deleted.toSet == expect.toSet,
                s"run$i sweep@$clock: $deleted vs model $expect")
            case 5 => clock += amt
            case _ => () // op precondition not met: no-op
          }
          // SUT observables == model after EVERY op
          ids.foreach { x =>
            assert(IndexProtocol.pendingDeadline(fs, root, x) ==
              markers.get(x),
              s"run$i marker($x) after op($op,$id,$amt)@$clock")
            assert(dirOf(x).exists() == dirs(x),
              s"run$i dir($x) after op($op,$id,$amt)@$clock")
          }
          // the two load-bearing invariants, re-stated directly:
          // a committed batch's directory always exists, and every
          // live marker's deadline honors the window promised at its
          // creation (first-marker-wins can only keep, reset only
          // restarts at a NEW delisting)
          committed.foreach(c => assert(dirOf(c).exists(),
            s"run$i committed $c lost its directory"))
        }
      }
    } finally SparkTestSession.rmTree(base)
  }

  test("manifest-table protocol matches a reference model under " +
      "random full/partial/merge/crash/read/tag/branch " +
      "interleavings; untouched partitions' files are reused and " +
      "tag pins hold through every step") {
    import graft.sources.ManifestStore
    import graft.operators.IndexAudit
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-mani-prop").toFile
    try {
      // 4 partitions × 3 content variants; the id set is FIXED per
      // partition (payload varies), so a whole-partition merge equals
      // a partition replace — every batch row's key collides
      def fullDf(v: Int) = (0 until 4).flatMap(p =>
          (0 until 3).map(i => (p.toLong * 100 + i, s"p$p-v$v-$i",
            p.toLong)))
        .toDF("id", "payload", "part")
      val variants = (0 to 2).map(v => fullDf(v).localCheckpoint())
      val expectRows = (0 until 4).map(p => (0 to 2).map(v =>
        variants(v).filter(col("part") === p)
          .collect().map(_.toSeq).toSet))
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      // op 0 full publish (replaceAll); 1 partial publish (one
      // partition); 2 whole-partition MERGE (same outcome as 1 by
      // construction); 3 crash-publish (dies before repoint);
      // 4 serving read; 5 time travel incl. pruned/residue gens;
      // 6 structural partition read; 7 tag current (pin) — re-tag
      // refuses; 8 full WAP-on-branch cycle (branch → publish →
      // fast-forward → drop); 9 drop a tag (un-pin)
      val opsGen = Gen.listOfN(10, for {
        op <- Gen.chooseNum(0, 9)
        amt <- Gen.chooseNum(0, 11)
      } yield (op, amt))
      class Boom extends RuntimeException("injected")
      samples(opsGen, 5).zipWithIndex.foreach { case (ops, i) =>
        val root = s"$base/run$i"
        var cur = 0L
        // model: per-gen partition→variant maps for retained gens,
        // plus the tag pins (a tagged gen never evicts while tagged —
        // prune's ref-pin rule)
        val gens =
          scala.collection.mutable.Map.empty[Long, Map[Int, Int]]
        val tags = scala.collection.mutable.Map.empty[String, Long]
        def evict(gen: Long, keep: Int): Unit =
          gens.keys.toSeq.foreach(g =>
            if (g <= gen - keep && !tags.values.exists(_ == g))
              gens -= g)
        def parts = gens.getOrElse(cur, Map.empty)
        def expectedTable(m: Map[Int, Int]) =
          m.toSeq.flatMap { case (p, v) => expectRows(p)(v) }.toSet
        ops.foreach { case (op, amt) =>
          val v = amt % 3
          val p = amt % 4
          val keep = 2 + (amt % 2)
          def reuseCheck(before: Map[String, String]): Unit = {
            // every carried partition's file entries are IDENTICAL
            // relPaths — file-level reuse holds at every step
            val after = ManifestStore.manifestAt(spark, root, cur)
              .entries.filterNot(_.partition == p.toString)
              .map(e => e.relPath -> e.partition).toMap
            after.foreach { case (rel, part) =>
              assert(before.get(rel).contains(part),
                s"run$i: carried partition $part file $rel is new")
            }
          }
          op match {
            case 0 =>
              val gen = ManifestStore.publish(spark, variants(v), root,
                "part", Nil, keep, replaceAll = true)
              assert(gen == cur + 1, s"run$i gen alloc")
              cur = gen
              gens(gen) = (0 until 4).map(_ -> v).toMap
              evict(gen, keep)
            case 1 | 2 if cur > 0 =>
              val before = ManifestStore.manifestAt(spark, root, cur)
                .entries.map(e => e.relPath -> e.partition).toMap
              val batch = variants(v).filter(col("part") === p)
              val gen =
                if (op == 1) ManifestStore.publish(spark, batch, root,
                  "part", Nil, keep)
                else ManifestStore.mergePartitions(spark, batch, root,
                  Seq("id"), Nil, keep)
              assert(gen == cur + 1, s"run$i gen alloc ($op)")
              cur = gen
              gens(gen) = gens(gen - 1).updated(p, v)
              evict(gen, keep)
              reuseCheck(before)
            case 3 =>
              intercept[Boom] {
                ManifestStore.publishImpl(spark, variants(v), root,
                  "part", Nil, 3, false, true, () => throw new Boom)
              }
            case 4 if cur > 0 =>
              assert(rowsOf(ManifestStore.readCurrent(spark, root)) ==
                expectedTable(parts), s"run$i serving read")
            case 5 if cur > 0 =>
              val g = (amt % (cur + 1)) + 1L
              if (gens.contains(g))
                assert(rowsOf(ManifestStore.readAt(spark, root, g)) ==
                  expectedTable(gens(g)), s"run$i readAt($g)")
              else intercept[SnapshotUnavailable] {
                ManifestStore.readAt(spark, root, g).collect()
              }
            case 6 if cur > 0 && parts.contains(p) =>
              assert(rowsOf(ManifestStore.readPartitions(spark, root,
                Seq(p.toString))) == expectRows(p)(parts(p)),
                s"run$i readPartitions($p)")
            case 7 if cur > 0 =>
              val name = s"t${amt % 3}"
              if (tags.contains(name))
                intercept[IllegalStateException] {
                  ManifestStore.tag(spark, root, name)
                }
              else {
                assert(ManifestStore.tag(spark, root, name) == cur)
                tags(name) = cur
                assert(rowsOf(ManifestStore.readRef(spark, root, name))
                  == expectedTable(parts), s"run$i tag read $name")
              }
            case 8 if cur > 0 =>
              val name = s"b$amt"
              val before = ManifestStore.manifestAt(spark, root, cur)
                .entries.map(e => e.relPath -> e.partition).toMap
              ManifestStore.branch(spark, root, name)
              ManifestStore.publishToBranch(spark,
                variants(v).filter(col("part") === p), root, name)
              // main is untouched until the fast-forward
              assert(rowsOf(ManifestStore.readCurrent(spark, root)) ==
                expectedTable(parts), s"run$i branch isolation")
              val gen = ManifestStore.fastForward(spark, root, name,
                Nil, keep)
              assert(gen == cur + 1, s"run$i ff gen alloc")
              cur = gen
              gens(gen) = gens(gen - 1).updated(p, v)
              evict(gen, keep)
              reuseCheck(before)
              ManifestStore.dropRef(spark, root, name)
            case 9 =>
              val name = s"t${amt % 3}"
              tags.get(name).foreach { g =>
                assert(rowsOf(ManifestStore.readRef(spark, root, name))
                  == expectedTable(gens(g)),
                  s"run$i pinned read before drop $name")
              }
              ManifestStore.dropRef(spark, root, name)
              tags -= name
            case _ => () // op precondition unmet: no-op
          }
          assert(ManifestStore.currentGen(spark, root)
            .getOrElse(0L) == cur, s"run$i pointer after ($op,$amt)")
          assert(IndexAudit.isManifestTableHealthy(spark, root),
            s"run$i health after ($op,$amt)")
        }
      }
    } finally SparkTestSession.rmTree(base)
  }

  test("snapshot-table pointer protocol matches a reference model " +
      "under random publish/crash/read interleavings; never a " +
      "serving gap, never a wrong serve") {
    import graft.sources.SnapshotStore
    import graft.operators.IndexAudit
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-snap-prop").toFile
    try {
      // three distinguishable contents; expected row sets precomputed
      val variants = (0 to 2).map(v =>
        (0 until 4).map(i => (v.toLong * 100 + i, s"v$v-$i"))
          .toDF("id", "payload").localCheckpoint())
      val expect = variants.map(_.collect().map(_.toSeq).toSet)
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      // op 0 publish (variant amt%3, keep 2|3 — retention prunes);
      // 1 crash-publish (staged + audited, dies before the repoint);
      // 2 serving read; 3 time travel across the whole gen range,
      // including pruned and never-committed gens
      val opsGen = Gen.listOfN(12, for {
        op <- Gen.chooseNum(0, 3)
        amt <- Gen.chooseNum(0, 5)
      } yield (op, amt))
      class Boom extends RuntimeException("injected")
      samples(opsGen, 5).zipWithIndex.foreach { case (ops, i) =>
        val root = s"$base/run$i"
        // reference model: the pointer gen and each retained gen's
        // content after every op
        var cur = 0L
        val content = scala.collection.mutable.Map.empty[Long, Int]
        ops.foreach { case (op, amt) =>
          val v = amt % 3
          op match {
            case 0 =>
              val keep = 2 + (amt % 2)
              val gen = SnapshotStore.publish(spark, variants(v), root,
                Nil, keep)
              // gens allocate cur+1 even over crash residue (the
              // overwrite consumes it)
              assert(gen == cur + 1, s"run$i gen alloc")
              cur = gen
              content(gen) = v
              content.keys.toSeq.foreach(g =>
                if (g <= gen - keep) content -= g)
            case 1 =>
              // the crash changes NOTHING a reader can see
              intercept[Boom] {
                SnapshotStore.publishImpl(spark, variants(v), root,
                  Nil, 3, () => throw new Boom)
              }
            case 2 if cur > 0 =>
              assert(rowsOf(SnapshotStore.readCurrent(spark, root)) ==
                expect(content(cur)), s"run$i serving read")
            case 3 if cur > 0 =>
              val g = (amt % (cur + 1)) + 1L // 1..cur+1
              if (content.contains(g))
                assert(rowsOf(SnapshotStore.readAt(spark, root, g)) ==
                  expect(content(g)), s"run$i readAt($g)")
              else intercept[SnapshotUnavailable] {
                // pruned, or the crash residue at cur+1: typed
                // refusal, never a wrong serve
                SnapshotStore.readAt(spark, root, g).collect()
              }
            case _ => () // read before the first publish: no-op
          }
          // SUT observables == model after EVERY op, and the store
          // audits healthy through every interleaving (crash residue
          // is a healthy lifecycle state the next publish consumes)
          assert(SnapshotStore.currentGen(spark, root)
            .getOrElse(0L) == cur, s"run$i pointer after ($op,$amt)")
          assert(IndexAudit.isSnapshotsHealthy(spark, root),
            s"run$i health after ($op,$amt)")
        }
      }
    } finally SparkTestSession.rmTree(base)
  }

  test("snapshot-table BRANCH protocol matches a reference model " +
      "under random publish/branch/fast-forward interleavings; " +
      "isolation, pinning, and refusals hold at every step") {
    import graft.sources.SnapshotStore
    import graft.operators.IndexAudit
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-snapbr-prop").toFile
    try {
      val variants = (0 to 2).map(v =>
        (0 until 4).map(i => (v.toLong * 100 + i, s"v$v-$i"))
          .toDF("id", "payload").localCheckpoint())
      val expect = variants.map(_.collect().map(_.toSeq).toSet)
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      // ops: 0 main publish (keep=3); 1 branch create; 2 branch
      // publish; 3 fast-forward; 4 serving read; 5 readRef
      val opsGen = Gen.listOfN(14, for {
        op <- Gen.chooseNum(0, 5)
        amt <- Gen.chooseNum(0, 5)
      } yield (op, amt))
      samples(opsGen, 5).zipWithIndex.foreach { case (ops, i) =>
        val root = s"$base/run$i"
        var cur = 0L
        val content = scala.collection.mutable.Map.empty[Long, Int]
        // the one branch's model: (head seq, base gen, head variant)
        var branch: Option[(Long, Long, Int)] = None
        def pinnedBase: Set[Long] = branch.collect {
          case (0L, b, _) => b }.toSet
        def pruneModel(gen: Long): Unit =
          content.keys.toSeq.foreach(g =>
            if (g <= gen - 3 && !pinnedBase(g)) content -= g)
        ops.foreach { case (op, amt) =>
          val v = amt % 3
          op match {
            case 0 =>
              val gen = SnapshotStore.publish(spark, variants(v), root)
              assert(gen == cur + 1, s"run$i gen alloc")
              cur = gen
              content(gen) = v
              pruneModel(gen)
            case 1 if cur > 0 =>
              if (branch.isEmpty) {
                SnapshotStore.branch(spark, root, "b")
                branch = Some((0L, cur, -1))
              } else intercept[IllegalStateException] {
                SnapshotStore.branch(spark, root, "b")
              }
            case 2 if cur > 0 =>
              branch match {
                case Some((h, b, _)) =>
                  val seq = SnapshotStore.publishToBranch(spark,
                    variants(v), root, "b")
                  assert(seq == h + 1, s"run$i branch seq")
                  branch = Some((seq, b, v))
                  // branch publishes are INVISIBLE to main
                  assert(rowsOf(SnapshotStore.readCurrent(spark, root))
                    == expect(content(cur)), s"run$i isolation")
                case None => intercept[SnapshotUnavailable] {
                  SnapshotStore.publishToBranch(spark, variants(v),
                    root, "b")
                }
              }
            case 3 if cur > 0 =>
              branch match {
                case Some((h, b, hv)) if h > 0 && b == cur =>
                  val gen = SnapshotStore
                    .fastForwardBranch(spark, root, "b")
                  assert(gen == cur + 1, s"run$i ff gen")
                  cur = gen
                  content(gen) = hv
                  branch = Some((0L, gen, -1))
                  pruneModel(gen)
                case Some((0L, _, _)) =>
                  intercept[IllegalStateException] {
                    SnapshotStore.fastForwardBranch(spark, root, "b")
                  }
                case Some(_) => // diverged base: refuses un-forced
                  intercept[IllegalStateException] {
                    SnapshotStore.fastForwardBranch(spark, root, "b")
                  }
                case None => intercept[SnapshotUnavailable] {
                  SnapshotStore.fastForwardBranch(spark, root, "b")
                }
              }
            case 4 if cur > 0 =>
              assert(rowsOf(SnapshotStore.readCurrent(spark, root)) ==
                expect(content(cur)), s"run$i serving read")
            case 5 if cur > 0 => branch match {
              case Some((0L, b, _)) =>
                // head 0 serves the base — which the prune PINNED
                assert(rowsOf(SnapshotStore.readRef(spark, root, "b"))
                  == expect(content(b)), s"run$i readRef base")
              case Some((_, _, hv)) =>
                assert(rowsOf(SnapshotStore.readRef(spark, root, "b"))
                  == expect(hv), s"run$i readRef head")
              case None => intercept[SnapshotUnavailable] {
                SnapshotStore.readRef(spark, root, "b").collect()
              }
            }
            case _ => () // op before the first publish: no-op
          }
          assert(SnapshotStore.currentGen(spark, root)
            .getOrElse(0L) == cur, s"run$i pointer after ($op,$amt)")
          assert(IndexAudit.isSnapshotsHealthy(spark, root),
            s"run$i health after ($op,$amt)")
        }
      }
    } finally SparkTestSession.rmTree(base)
  }

  test("property: hierarchical tupleKey is injective — two different " +
      "component tuples never collide, whatever the components " +
      "contain (separators, percents, empties, nulls)") {
    import graft.sources.ManifestStore
    // components drawn from the adversarial alphabet: the separator
    // itself, the escape marker, empties/nulls, and plain text
    val comp: Gen[String] = Gen.oneOf(
      Gen.const(null: String), Gen.const(""),
      Gen.const("\u001f"), Gen.const("%"), Gen.const("%1F"),
      Gen.const("%25"), Gen.const("a\u001fb"), Gen.const("a%b"),
      Gen.alphaNumStr.map(_.take(8)))
    val tuple: Gen[List[String]] =
      Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, comp))
    val params = Gen.Parameters.default
    var seed = Seed(0xC0FFEE)
    val pairs = (1 to 300).map { _ =>
      val a = tuple(params, seed).get; seed = seed.next
      val b = tuple(params, seed).get; seed = seed.next
      (a, b)
    }
    pairs.foreach { case (a, b) =>
      val (ka, kb) = (ManifestStore.tupleKey(a),
        ManifestStore.tupleKey(b))
      // null and "" are the SAME partition address by contract (the
      // hive sentinel), so normalize before comparing tuples
      def norm(t: List[String]) =
        t.map(c => if (c == null || c.isEmpty) "" else c)
      if (norm(a) != norm(b))
        assert(ka != kb, s"collision: $a vs $b -> $ka")
      else assert(ka == kb, s"same tuple, different keys: $a vs $b")
    }
  }
}
