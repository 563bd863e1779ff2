package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest.{FunnelWindow, MaxFunnelTimestamps, pruneFunnel}

/** Property tests for the funnel state pruning (round-8): seal-time
  * resolution on the pruned state must equal resolution on the full
  * event history, for any arrival order and any batch boundaries —
  * pruning runs after every merge, exactly as `streamingFunnel` applies
  * it, so the property covers prune-of-pruned state too. Pure JVM (no
  * Spark): `pruneFunnel` is a pure function on the state case class.
  */
class FunnelPruneSpec extends AnyFunSuite {

  /** The q52 resolution run by streamingFunnel at seal time. */
  private def resolve(s: FunnelWindow): (Int, Option[Long], Option[Long], Option[Long]) = {
    val tv = s.views.minOption
    val tc = tv.flatMap(v => s.clicks.filter(_ > v).minOption)
    val tp = tc.flatMap(c => s.purchases.filter(_ > c).minOption)
    val stage =
      if (tp.isDefined) 3 else if (tc.isDefined) 2 else if (tv.isDefined) 1 else 0
    (stage, tv, tc, tp)
  }

  private def merge(s: FunnelWindow, et: Int, ts: Long): FunnelWindow = et match {
    case 0 => s.copy(views = ts :: s.views, lastTs = math.max(s.lastTs, ts))
    case 1 => s.copy(clicks = ts :: s.clicks, lastTs = math.max(s.lastTs, ts))
    case _ => s.copy(purchases = ts :: s.purchases, lastTs = math.max(s.lastTs, ts))
  }

  test("pruned resolution equals full-history resolution on random event streams") {
    val rnd = new scala.util.Random(8)
    for (trial <- 1 to 300) {
      val n = 1 + rnd.nextInt(60)
      // small timestamp domain → plenty of duplicates and ties;
      // type skew varies per trial so some trials have no views at all
      val events = Seq.fill(n)((rnd.nextInt(3), (rnd.nextInt(25) + 1).toLong))
      var full = FunnelWindow(Nil, Nil, Nil, Long.MinValue)
      var pruned = FunnelWindow(Nil, Nil, Nil, Long.MinValue)
      // random batch boundaries: prune after each batch, like the stream
      var batch = List.empty[(Int, Long)]
      def flush(): Unit = {
        batch.reverse.foreach { case (et, ts) =>
          full = merge(full, et, ts)
          pruned = merge(pruned, et, ts)
        }
        pruned = pruneFunnel(pruned)
        batch = Nil
      }
      events.foreach { e =>
        batch ::= e
        if (rnd.nextInt(4) == 0) flush()
      }
      flush()
      assert(resolve(pruned) == resolve(full),
        s"trial $trial: pruned ${resolve(pruned)} != full ${resolve(full)} for $events")
      assert(pruned.lastTs == full.lastTs, s"trial $trial: lastTs diverged")
    }
  }

  test("pruning retains exactly min view plus the undominated click/purchase sets") {
    // views 5,9 → min view 5; clicks {3,4 (≤5, both kept), 7 (min above 5,
    // kept), 8 (dominated by 7, dropped)}; tc upper bound = 7; purchases
    // {6 (≤7 kept), 9 (min above, kept), 11 (dominated, dropped)}
    val s = FunnelWindow(List(9L, 5L), List(8L, 7L, 4L, 3L), List(11L, 9L, 6L), 11L)
    val p = pruneFunnel(s)
    assert(p.views == List(5L))
    assert(p.clicks == List(3L, 4L, 7L))
    assert(p.purchases == List(6L, 9L))
  }

  test("duplicates collapse and the hard cap bounds list length") {
    val dup = FunnelWindow(Nil, List.fill(100)(7L), Nil, 7L)
    assert(pruneFunnel(dup).clicks == List(7L))

    // no views → no dominance bound on clicks; the cap is the only
    // bound, and it keeps the SMALLEST timestamps (documented policy)
    val many = FunnelWindow(Nil,
      (1L to (MaxFunnelTimestamps + 500L)).toList.reverse, Nil, 0L)
    val capped = pruneFunnel(many)
    assert(capped.clicks.length == MaxFunnelTimestamps)
    assert(capped.clicks.head == 1L && capped.clicks.last == MaxFunnelTimestamps.toLong)
  }
}
