package graft

import graft.queries.{AnalyzeQuery, ConsoleReport}
import org.scalatest.funsuite.AnyFunSuite

class ConsoleReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("K2 console block matches the reference format on the golden fixture") {
    val s = spark
    import s.implicits._
    val r = AnalyzeQuery.run(Fixtures.commitEvents.toDF())
    val out = ConsoleReport.format(r)
    assert(out.contains("## 预测准确度指标"))
    assert(out.contains("## 常规统计"))
    assert(out.contains("总候选词选择数: 9"))
    assert(out.contains("首选命中率:      44.44%"))  // 4/9, :.2%
    assert(out.contains("前三候选命中率:   77.78%")) // 7/9
    assert(out.contains("平均选择排名:     1.56"))   // 14/9, :.2f
    assert(out.contains("综合预测得分:   0.634 / 1.000"))
    assert(out.contains("总上屏次数 (包括直接上屏): 14"))
    assert(out.contains("直接上屏率 (非候选词): 21.43%"))
  }

  test("empty and no-selection messages") {
    val s = spark
    import s.implicits._
    assert(ConsoleReport.format(None).contains("未找到"))
    val direct = Fixtures.commitEvents
      .filter(_.selected_candidate_rank.forall(_ == -1))
    val out = ConsoleReport.format(AnalyzeQuery.run(direct.toDF()))
    assert(out.contains("未找到可供分析的有效候选词选择。"))
    assert(out.contains("总上屏次数 (包括直接上屏): 5"))
  }
}
