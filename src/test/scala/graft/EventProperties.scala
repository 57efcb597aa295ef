package graft

import graft.model.LogEvent
import graft.queries.{AnalyzeQuery, ExportMissesQuery}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties over generated event logs (SURVEY §5 item 3).
  * Each case runs real Spark jobs, so the suite keeps the sample count
  * small — the seeded differential loop in AnalyzeQuerySpec adds bulk
  * coverage. */
object EventProperties extends Properties("graft.events") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestSession.spark

  private val genRank: Gen[Option[Int]] = Gen.frequency(
    2 -> Gen.const(None),
    2 -> Gen.const(Some(-1)),
    3 -> Gen.const(Some(0)),
    4 -> Gen.choose(0, 12).map(Some(_)))

  private val genEvents: Gen[List[LogEvent]] =
    Gen.choose(1, 30).flatMap { n =>
      Gen.sequence[List[Option[Int]], Option[Int]](
        List.fill(n)(genRank)).map { ranks =>
        ranks.zipWithIndex.map { case (r, i) =>
          LogEvent("text_committed", s"t$i", Some(s"w${i % 5}"), None, None,
            r, Some(s"in${i % 7}"), None, Some(s"w${i % 3}"))
        }
      }
    }

  private def df(events: List[LogEvent]) = {
    val s = spark
    import s.implicits._
    events.toDF()
  }

  property("count invariants: first<=top3<=selections; sel+direct<=commits") =
    Prop.forAll(genEvents) { events =>
      val r = AnalyzeQuery.run(df(events)).get
      r.firstChoiceCount <= r.top3Count &&
        r.top3Count <= r.totalSelections &&
        r.totalSelections + r.rawInputCommits <= r.totalCommits
    }

  property("accuracy score in (0, 1] iff selections exist; 1 iff all rank 0") =
    Prop.forAll(genEvents) { events =>
      val r = AnalyzeQuery.run(df(events)).get
      val sel = events.flatMap(_.selected_candidate_rank).filter(_ >= 0)
      if (sel.isEmpty) r.overallAccuracyScore.isEmpty
      else {
        val a = r.overallAccuracyScore.get
        a > 0 && a <= 1 + 1e-12 &&
          ((a >= 1 - 1e-12) == sel.forall(_ == 0))
      }
    }

  property("export rows == miss count; frequencies sum back to row count") =
    Prop.forAll(genEvents) { events =>
      val out = ExportMissesQuery.run(df(events)).collect()
      val misses = events.flatMap(_.selected_candidate_rank).count(_ > 0)
      out.length == misses && {
        val freqs = out.groupBy(_.getAs[String](ExportMissesQuery.ColActual))
        freqs.forall { case (_, rows) =>
          rows.forall(_.getAs[Long](ExportMissesQuery.ColFreq) == rows.length)
        }
      }
    }

  property("export is (freq desc, input asc)-ordered") =
    Prop.forAll(genEvents) { events =>
      val out = ExportMissesQuery.run(df(events)).collect()
        .map(r => (r.getAs[Long](ExportMissesQuery.ColFreq),
          r.getAs[String](ExportMissesQuery.ColInput)))
      out.sliding(2).forall {
        case Array((f1, i1), (f2, i2)) =>
          f1 > f2 || (f1 == f2 && i1 <= i2)
        case _ => true
      }
    }

  property("corrupt lines never change commit analytics") =
    Prop.forAll(genEvents) { events =>
      val valid = events.map(e =>
        s"""{"event_type":"text_committed","timestamp":"${e.timestamp}"""" +
          e.selected_candidate_rank.map(r =>
            s""","selected_candidate_rank":$r""").getOrElse("") +
          s""","committed_text":"${e.committed_text.get}"}""")
      val withCorrupt = valid.flatMap(l =>
        Seq(l, "{corrupt", "")).toSeq
      val a = AnalyzeQuery.run(graft.io.EventLogReader.readCommits(
        spark, Fixtures.writeJsonl(valid).toString))
      val b = AnalyzeQuery.run(graft.io.EventLogReader.readCommits(
        spark, Fixtures.writeJsonl(withCorrupt).toString))
      a == b
    }

  property("split assignment: total, deterministic, corpus-independent") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(0L, 1000000L))) { ids =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions.col
      def assign(xs: List[Long]): Map[Long, String] =
        xs.toDF("doc_id")
          .withColumn("split", graft.pipeline.Curation.splitName(
            col("doc_id")))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val full = assign(ids)
      val half = assign(ids.take(ids.length / 2))
      // every id gets exactly one of the three splits, and removing
      // half the corpus never changes any remaining assignment
      full.values.forall(Set("train", "val", "test")) &&
        half.forall { case (id, sp) => full(id) == sp }
    }
}
