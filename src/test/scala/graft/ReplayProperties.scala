package graft

import graft.streaming.{FunnelEvent, FunnelStream, PageEvent, PageTrackReplay}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck differentials for the cogroup replay operators: random
  * event streams split at random TIME boundaries (so per-user order
  * across batches holds, the replay precondition) against in-memory
  * sequential folds. Pins that batching never moves the carried
  * state, for stream shapes no fixed fixture contains. */
object ReplayProperties extends Properties("graft.replay") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestSession.spark

  private val H = FunnelStream.HourNs

  private val genFunnel: Gen[List[FunnelEvent]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 5L)
      k <- Gen.oneOf("view", "click", "purchase", "noise")
      // timestamps inside ~3 deadline windows so deadline edges and
      // strict-inequality boundaries are actually exercised
      t <- Gen.choose(0L, 3L * H)
    } yield FunnelEvent(u, k, t))
  } yield evs.distinct

  /** In-memory funnel fold, FunnelStream.applyEvent semantics. */
  private def refHits(evs: Seq[FunnelEvent])
      : Map[(Long, String), Long] = {
    val out = scala.collection.mutable.Map[(Long, String), Long]()
    evs.groupBy(_.user_id).foreach { case (u, es) =>
      var t1, t2, t3 = Option.empty[Long]
      es.sortBy(_.ts).foreach { e =>
        e.event_type match {
          case "view" if t1.isEmpty =>
            t1 = Some(e.ts); out((u, "1_view")) = e.ts
          case "click" if t1.nonEmpty && t2.isEmpty &&
              e.ts > t1.get && e.ts < t1.get + H =>
            t2 = Some(e.ts); out((u, "2_click")) = e.ts
          case "purchase" if t2.nonEmpty && t3.isEmpty &&
              e.ts > t2.get && e.ts < t2.get + H =>
            t3 = Some(e.ts); out((u, "3_purchase")) = e.ts
          case _ => ()
        }
      }
    }
    out.toMap
  }

  property("funnel replay over random time splits equals the one-shot " +
    "fold on every prefix") =
    Prop.forAll(genFunnel, Gen.choose(1L, 3L * H),
      Gen.choose(1L, 3L * H)) { (evs, c1, c2) =>
      val s = spark
      import s.implicits._
      val cuts = Seq(c1 min c2, c1 max c2, Long.MaxValue)
      val batches = cuts.zip(Long.MinValue +: cuts.dropRight(1)).map {
        case (hi, lo) => evs.filter(e => e.ts > lo && e.ts <= hi).toDS()
      }
      val perBatch = FunnelStream.replayStageHits(batches)
      val props = (0 until 3).map { b =>
        val got = perBatch.take(b + 1)
          .flatMap(_.collect())
          .map(h => (h.user_id, h.stage) -> h.ts).toMap
        val want = refHits(evs.filter(_.ts <= cuts(b)))
        Prop(got == want) :| s"prefix $b: got=$got want=$want"
      }
      props.reduce(_ && _)
    }

  private val genPage: Gen[List[PageEvent]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 1000L)
      d <- Gen.oneOf(-1, 0, 1)
      rst <- Gen.frequency(5 -> Gen.const(0), 1 -> Gen.const(1))
    } yield PageEvent(u, t, 0L, d, rst))
    // globally unique event_id: equal-(ts, event_id) rows with
    // different deltas would make the fold order — and the clamped
    // result — genuinely ambiguous
  } yield evs.zipWithIndex.map { case (e, i) =>
    e.copy(event_id = i.toLong) }

  property("page-tracker replay over random time splits equals the " +
    "sequential walk on every prefix") =
    Prop.forAll(genPage, Gen.choose(0L, 1000L), Gen.choose(0L, 1000L)) {
      (evs, c1, c2) =>
        val s = spark
        import s.implicits._
        val cuts = Seq(c1 min c2, c1 max c2, Long.MaxValue)
        val batches = cuts.zip(Long.MinValue +: cuts.dropRight(1)).map {
          case (hi, lo) =>
            evs.filter(e => e.ts > lo && e.ts <= hi).toDS()
        }
        val snaps = PageTrackReplay.replay(batches)
        val props = (0 until 3).map { b =>
          val got = snaps(b).collect()
            .map(p => p.user_id -> p.page).toMap
          val prefix = evs.filter(_.ts <= cuts(b))
          val want = prefix.groupBy(_.user_id).map { case (u, es) =>
            var page = 0L
            es.sortBy(e => (e.ts, e.event_id)).foreach { e =>
              if (e.rst == 1) page = 0L
              page = math.max(0L, page + e.d)
            }
            u -> page
          }
          Prop(got == want) :| s"prefix $b: got=$got want=$want"
        }
        props.reduce(_ && _)
    }
}
