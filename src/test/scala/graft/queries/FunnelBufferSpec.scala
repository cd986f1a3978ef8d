package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** [[FunnelBuffer]] is the order-tolerance kernel of st17 — pure
  * array-in/array-out, so it gets hammered directly: hand-picked
  * adversarial orderings that defeat the first-sight st13 fold, plus a
  * seeded randomized sweep proving arrival-order INVARIANCE against the
  * brute-force q26 chain on the full event list. */
class FunnelBufferSpec extends AnyFunSuite {

  private def run(events: Seq[(String, Long)]): (Long, Long, Long) =
    FunnelBuffer.resolve(events.foldLeft(FunnelBuffer.Empty) {
      case (s, (t, ts)) => FunnelBuffer.update(s, t, ts)
    })

  /** q26's chain on the complete list: t1 = min view, t2 = min click
    * strictly after t1, t3 = min purchase strictly after t2. */
  private def brute(events: Seq[(String, Long)]): (Long, Long, Long) = {
    def minOf(t: String, after: Long): Long = {
      val c = events.collect { case (`t`, ts) if ts > after => ts }
      if (c.isEmpty) 0L else c.min
    }
    val views = events.collect { case ("view", ts) => ts }
    val t1 = if (views.isEmpty) 0L else views.min
    val t2 = if (t1 == 0L) 0L else minOf("click", t1)
    val t3 = if (t2 == 0L) 0L else minOf("purchase", t2)
    (t1, t2, t3)
  }

  test("in-order chain resolves and stays O(1)") {
    val s = Seq(("view", 100L), ("click", 200L), ("purchase", 300L))
      .foldLeft(FunnelBuffer.Empty) { case (a, (t, ts)) =>
        FunnelBuffer.update(a, t, ts) }
    assert(FunnelBuffer.resolve(s) == ((100L, 200L, 300L)))
    // [nUpd, minView, nClicks, click, purchase] — no straddler growth
    assert(s.length == 5)
  }

  test("fully reversed arrival resolves the same chain") {
    assert(run(Seq(("purchase", 300L), ("click", 200L), ("view", 100L)))
      == ((100L, 200L, 300L)))
  }

  test("a late earlier view re-qualifies a buffered click") {
    // At view@100 the click@50 is a useless straddler — unless the
    // user's REAL first view (40) arrives later. st13's fold answers
    // 150 here; q26 answers 50.
    val ev = Seq(("view", 100L), ("click", 50L), ("click", 150L),
      ("click", 200L), ("view", 40L))
    assert(run(ev) == brute(ev))
    assert(run(ev) == ((40L, 50L, 0L)))
  }

  test("dominated straddlers are pruned, the needed one survives") {
    val s = Seq(("view", 100L), ("click", 50L), ("click", 150L),
      ("click", 200L))
      .foldLeft(FunnelBuffer.Empty) { case (a, (t, ts)) =>
        FunnelBuffer.update(a, t, ts) }
    // clicks kept: 50 (≤ minView) and 150 (first above); 200 dropped
    assert(s(2) == 2L && s.slice(3, 5).toSeq == Seq(50L, 150L))
  }

  test("equal timestamps never advance a step (strict >)") {
    assert(run(Seq(("view", 100L), ("click", 100L))) == ((100L, 0L, 0L)))
    assert(run(Seq(("view", 100L), ("click", 200L), ("purchase", 200L)))
      == ((100L, 200L, 0L)))
  }

  test("randomized arrival-order invariance vs the brute-force chain") {
    val rnd = new scala.util.Random(0xF0531)
    val types = Array("view", "click", "purchase")
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(12)
      val events = Seq.fill(n)(
        (types(rnd.nextInt(3)), (1 + rnd.nextInt(20)).toLong))
      val shuffled = rnd.shuffle(events)
      assert(run(shuffled) == brute(events),
        s"trial $trial: events=$events shuffled=$shuffled")
    }
  }
}
