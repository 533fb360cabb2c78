package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style proofs (seeded randomized partitionings — deterministic,
  * no flakiness) of the ALGEBRAIC contracts the mergeable aggregators
  * stand on at scale. Spark is free to partition the input any way, apply
  * `reduce` in any per-partition order, and `merge` partials in any tree
  * shape — so each property quantifies over random partitionings and
  * checks the result against the sequential ground truth. These are the
  * claims the scaladocs make (TopKAggregator exactness; Misra–Gries
  * bounded error, Agarwal et al. PODS 2012) exercised as laws rather than
  * single examples.
  */
class AggregatorPropsSpec extends AnyFunSuite {

  /** Fold `items` through reduce/merge under a random partitioning and a
    * random merge order — the degrees of freedom Spark actually has.
    */
  private def runPartitioned[B](
      rnd: Random,
      items: Seq[Long],
      zero: B,
      reduce: (B, Long) => B,
      merge: (B, B) => B): B = {
    val nParts = 1 + rnd.nextInt(7)
    val parts = items.groupBy(_ => rnd.nextInt(nParts)).values.toVector
    val partials = parts.map(_.foldLeft(zero)(reduce))
    rnd.shuffle(partials).reduceLeft(merge)
  }

  test("TopKAggregator: any partitioning/merge order yields EXACTLY the global top-k") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(12)
      val agg = new TopKAggregator(k)
      val n = 1 + rnd.nextInt(200)
      // duplicate scores on purpose: ties must resolve by id, identically
      val items = Vector.fill(n)(Scored(rnd.nextInt(40).toLong, rnd.nextInt(10).toDouble))
      val got = runPartitioned[Seq[Scored]](
        rnd, items.indices.map(_.toLong),
        agg.zero, (b, i) => agg.reduce(b, items(i.toInt)), agg.merge)
      val want = items.sortBy(s => (-s.score, s.id)).take(k)
      assert(got == want, s"trial $trial (k=$k, n=$n)")
      assert(got.size <= k)
    }
  }

  test("TopKAggregator: merge is commutative and associative on arbitrary buffers") {
    val rnd = new Random(7L)
    val agg = new TopKAggregator(8)
    def buf(): Seq[Scored] =
      Vector.fill(rnd.nextInt(12))(Scored(rnd.nextInt(30).toLong, rnd.nextInt(9).toDouble))
        .foldLeft(agg.zero)(agg.reduce)
    for (_ <- 1 to 100) {
      val (a, b, c) = (buf(), buf(), buf())
      assert(agg.merge(a, b) == agg.merge(b, a), "commutativity")
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)),
        "associativity")
    }
  }

  test("Misra–Gries: fixed memory, bounded error, and the presence guarantee " +
    "hold under every random partitioning") {
    val rnd = new Random(42L)
    for (trial <- 1 to 50) {
      val k = 2 + rnd.nextInt(10)
      val agg = new FrequentItemsAggregator(k)
      val nTypes = 1 + rnd.nextInt(30)
      val n = 1 + rnd.nextInt(500)
      // Zipf-ish skew so some items genuinely clear the N/(k+1) bar
      val stream = Vector.fill(n)(s"t${(math.sqrt(rnd.nextInt(nTypes * nTypes)).toInt)}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // reduce-only memory bound: every intermediate buffer stays ≤ k
      val seqBuf = stream.foldLeft(agg.zero) { (b, t) =>
        val nb = agg.reduce(b, t); assert(nb.size <= k, "reduce memory bound"); nb
      }
      assert(seqBuf.size <= k)
      // partitioned run: same laws as the cluster applies
      val merged = runPartitioned[Map[String, Long]](
        rnd, stream.indices.map(_.toLong),
        agg.zero, (b, i) => agg.reduce(b, stream(i.toInt)), agg.merge)
      assert(merged.size <= k, "merge memory bound")
      val slack = n.toLong / (k + 1)
      truth.foreach { case (t, c) =>
        val est = merged.getOrElse(t, 0L)
        assert(est <= c, s"trial $trial: overestimate for $t ($est > $c)")
        assert(est >= c - slack,
          s"trial $trial: error bound broken for $t ($est < $c - $slack)")
        if (c > slack)
          assert(merged.contains(t),
            s"trial $trial: $t has true count $c > N/(k+1)=$slack but is absent")
      }
      merged.keys.foreach(t => assert(truth.contains(t), "phantom item"))
    }
  }
}
