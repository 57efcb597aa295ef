package graft.queries

/** K2: the console metrics report (`cli.py:284-309`,
  * `cli-go/cmd/analyze.go:56-76` + `ui.go:65-71`) — same blocks,
  * headings, and number formats (`:.2%`, `:.2f`, `:.3f / 1.000`). */
object ConsoleReport {

  private def pct(x: Double): String = f"${x * 100}%.2f%%"

  def format(result: Option[AnalysisResult]): String = result match {
    case None =>
      "--- 输入习惯分析 ---\n日志文件中未找到“text_committed”事件。"
    case Some(r) =>
      val sb = new StringBuilder
      sb.append("--- 输入习惯分析 ---\n")
      sb.append("\n## 预测准确度指标\n")
      if (r.totalSelections == 0)
        sb.append("未找到可供分析的有效候选词选择。\n")
      else {
        sb.append(f"  - 总候选词选择数: ${r.totalSelections}%d\n")
        sb.append(s"  - 首选命中率:      ${pct(r.firstChoiceHitRate.get)}\n")
        sb.append(s"  - 前三候选命中率:   ${pct(r.top3HitRate.get)}\n")
        sb.append(f"  - 平均选择排名:     ${r.averageRank.get}%.2f\n")
        sb.append(f"  - 综合预测得分:   ${r.overallAccuracyScore.get}%.3f / 1.000\n")
      }
      sb.append("\n## 常规统计\n")
      sb.append(s"  - 总上屏次数 (包括直接上屏): ${r.totalCommits}\n")
      if (r.totalCommits > 0)
        sb.append(f"  - 直接上屏率 (非候选词): ${r.directInputRate.get}%.2f%%\n")
      sb.toString
  }
}
