package graft

import graft.io.EventLogReader
import graft.queries.AnalyzeQuery
import org.scalatest.funsuite.AnyFunSuite

class AnalyzeQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Eps = 1e-9

  private def goldenChecks(result: graft.queries.AnalysisResult): Unit = {
    assert(result.totalCommits === 14)
    assert(result.totalSelections === 9)
    assert(result.rawInputCommits === 3)
    assert(result.firstChoiceCount === 4)
    assert(result.top3Count === 7)
    assert(math.abs(result.averageRank.get - 14.0 / 9) < Eps)
    assert(math.abs(result.overallAccuracyScore.get -
      (4.0 + 1.0 + 1.0 / 3 + 1.0 / 4 + 1.0 / 8) / 9) < Eps)
    assert(math.abs(result.firstChoiceHitRate.get - 4.0 / 9) < Eps)
    assert(math.abs(result.top3HitRate.get - 7.0 / 9) < Eps)
    assert(math.abs(result.directInputRate.get - 300.0 / 14) < Eps)
  }

  test("golden metrics from the JSONL fixture (reader path)") {
    val path = Fixtures.writeJsonl(Fixtures.mixedLog).toString
    val commits = EventLogReader.readCommits(spark, path)
    goldenChecks(AnalyzeQuery.run(commits).get)
  }

  test("golden metrics from typed Dataset (encoder path)") {
    val s = spark
    import s.implicits._
    goldenChecks(AnalyzeQuery.run(Fixtures.commitEvents.toDF()).get)
  }

  test("empty input returns None (early-return guard)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[graft.model.LogEvent].toDF()
    assert(AnalyzeQuery.run(empty).isEmpty)
  }

  test("commits without valid selections: counts present, rates absent") {
    val s = spark
    import s.implicits._
    val directOnly = Fixtures.commitEvents
      .filter(_.selected_candidate_rank.forall(_ == -1))
    val r = AnalyzeQuery.run(directOnly.toDF()).get
    assert(r.totalCommits === 5) // 2 null-rank + 3 direct
    assert(r.totalSelections === 0)
    assert(r.averageRank.isEmpty)
    assert(r.overallAccuracyScore.isEmpty)
    assert(r.firstChoiceHitRate.isEmpty)
  }

  test("differential: metricsFrame matches a scala reference on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 15) {
      val ranks: Seq[Option[Int]] = Seq.fill(rnd.nextInt(40) + 1) {
        rnd.nextInt(4) match {
          case 0 => None
          case 1 => Some(-1)
          case _ => Some(rnd.nextInt(9))
        }
      }
      val events = ranks.zipWithIndex.map { case (r, i) =>
        graft.model.LogEvent("text_committed", s"t$i", Some(s"w$i"), None,
          None, r, Some(s"in$i"), None, None)
      }
      val got = AnalyzeQuery.run(events.toDF()).get
      val sel = ranks.flatten.filter(_ >= 0)
      assert(got.totalCommits === ranks.size)
      assert(got.totalSelections === sel.size)
      assert(got.rawInputCommits === ranks.flatten.count(_ == -1))
      assert(got.firstChoiceCount === sel.count(_ == 0))
      assert(got.top3Count === sel.count(_ < 3))
      if (sel.nonEmpty) {
        assert(math.abs(got.averageRank.get -
          sel.map(_.toDouble).sum / sel.size) < Eps)
        assert(math.abs(got.overallAccuracyScore.get -
          sel.map(r => 1.0 / (r + 1)).sum / sel.size) < 1e-6)
      } else assert(got.averageRank.isEmpty)
      // invariants: first_choice ≤ top3 ≤ selections ≤ commits
      assert(got.firstChoiceCount <= got.top3Count)
      assert(got.top3Count <= got.totalSelections)
      assert(got.totalSelections + got.rawInputCommits <= got.totalCommits)
    }
  }
}
