package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("two-phase running total == driver scanLeft, across many partitions") {
    import spark.implicits._
    // adversarial sizes: skewed values, ids out of insertion order, and
    // far more rows than partitions so every partition contributes
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((0L until 5000L).toVector).map(id => (id, rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "v").repartition(32)
    val got = PrefixSum.runningTotal(df, "id", "v", "run")
      .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, v) =>
      acc += v
      assert(got(id) == acc, s"running total diverged at id $id")
    }
    assert(got.size == rows.size)
  }

  test("running total is exact with negative values (offsets are sums, not scan maxima)") {
    import spark.implicits._
    // signed values make max(localScan) != partitionTotal: any offset
    // derived from the scan's maximum would shift every later bucket
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0L until 3000L).toVector).map(id => (id, rnd.nextInt(1000) - 500L))
    val df = rows.toDF("id", "v").repartition(16)
    val got = PrefixSum.runningTotal(df, "id", "v", "run")
      .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, v) =>
      acc += v
      assert(got(id) == acc, s"running total diverged at id $id")
    }
  }

  test("string order keys: bucket boundaries compare as literals of the key type") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0 until 2000).toVector)
      .map(i => (f"doc_$i%06d", rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "v").repartition(16)
    val got = PrefixSum.runningTotal(df, "id", "v", "run")
      .select("id", "run").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, v) =>
      acc += v
      assert(got(id) == acc, s"running total diverged at id $id")
    }
  }

  test("token shards: whole docs, contiguous shards, each shard within budget + one doc") {
    import spark.implicits._
    val docs = (0L until 300L)
      .map(i => (i, Seq.fill(1 + (i % 37).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 100L
    val shards = PrefixSum.tokenBudgetShards(docs, budget)
      .select("doc_id", "n_tokens", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(shards.length == 300, "every doc must land in exactly one shard")
    // shard ids are non-decreasing in doc order and skip nothing
    val ids = shards.map(_._3)
    assert(ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 || b > a },
      "shard ids must be non-decreasing in id order")
    assert(ids.distinct.sorted.sameElements(ids.min to ids.max), "shard ids must be contiguous")
    // every shard holds >= budget tokens before spilling to the next
    // (except the last), and starts within one doc of its boundary
    shards.groupBy(_._3).toSeq.sortBy(_._1).dropRight(1).foreach { case (s, ds) =>
      assert(ds.map(_._2).sum >= budget - ds.map(_._2).max,
        s"shard $s underfilled: ${ds.map(_._2).sum} of $budget")
    }
  }

  test("seqPack: offsets are the exclusive running total; sequence ranges tile the stream") {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill((i % 13).toInt)("tok").mkString(" "))) // includes 0-token docs
      .toDF("doc_id", "text").repartition(16)
    val seqLen = 10L
    val got = PrefixSum.seqPack(docs, seqLen)
      .select("doc_id", "n_tokens", "offset", "first_seq", "last_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // offsets: doc k starts exactly where doc k-1 ended
    var expect = 0L
    got.foreach { case (id, n, off, first, last) =>
      assert(off == expect, s"doc $id offset $off != running total $expect")
      expect += n
      assert(first == off / seqLen)
      assert(last == (off + math.max(n - 1, 0)) / seqLen)
      assert(first <= last)
      // a doc spans exactly the sequences its token range covers
      if (n > 0) assert((last - first) * seqLen < off % seqLen + n,
        s"doc $id claims more sequences than its span")
    }
    // total stream length consistent with the last doc
    val (_, lastN, lastOff, _, _) = got.last
    assert(lastOff + lastN == got.map(_._2).sum)
  }
}
