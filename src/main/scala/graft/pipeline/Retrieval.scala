package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical and hybrid retrieval over the documents table: BM25
  * scoring (Robertson k1/b form with the always-positive Lucene idf)
  * and reciprocal-rank fusion of heterogeneous rankings — the shapes
  * a training-data pipeline uses for targeted corpus search and for
  * fusing lexical hits with embedding neighbors.
  */
object Retrieval {

  /** BM25 top-k for a bag-of-words query. One corpus aggregation for
    * (N, avgdl); document frequency counted over the QUERY TERMS'
    * postings only; per-doc scoring touches only docs holding ≥1
    * query term — the explode is filtered to the query vocabulary
    * BEFORE any shuffle (the inverted-index probe shape; at corpus
    * scale the (term, doc, tf) postings frame is materialized once,
    * partitioned by term, exactly as d19 builds it for TF-IDF, and
    * this probe reads |query| term partitions). The tiny per-term idf
    * table and the 1-row stats broadcast; scores round to 6 digits
    * before ranking (the d19 ln() discipline), and the top-k is a
    * TakeOrderedAndProject. idf = ln(1 + (N − df + ½)/(df + ½)) > 0
    * always, so a term in every document still contributes.
    *
    * Output: (id, bm25). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val postings = docs
      .select(col(idCol).as("id"),
        explode(TextStats.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val lens = docs.select(col(idCol).as("id"),
      TextStats.tokenCount(col(textCol)).as("dl"))
    // avgdl as an explicit sum/count division: both engines compute
    // the same two integers and one divide (a streaming AVG could
    // accumulate differently engine-to-engine)
    val stats = docs
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col(textCol))).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
      .withColumn("join_one", pmod(col("n_docs"), lit(1L)).cast("int"))
    val idf = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("join_one", pmod(col("df"), lit(1L)).cast("int"))
      .join(broadcast(stats), "join_one")
      .select(col("term"),
        log(lit(1.0) +
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          .as("idf"),
        col("avgdl"))
    postings
      .join(broadcast(idf), "term")
      .join(lens, "id")
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id").agg(round(sum(col("contrib")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion: score(id) = Σ over rankings of
    * 1/(k0 + rank). Robust to incomparable score scales (BM25 vs
    * cosine) because only ranks enter; ids absent from a ranking
    * simply contribute nothing. Each input is an (id, rank) frame —
    * already top-n bounded by construction — so the union and the
    * fused aggregation are list-sized, not corpus-sized. Output:
    * (id, rrf, n_lists), ranked (rrf desc, id asc), rrf rounded to 6
    * digits before the cut. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings.map(_.select(col("id"), col("rank")))
      .reduce(_ unionAll _)
      .groupBy("id")
      .agg(round(sum(lit(1.0) / (col("rank") + k0)), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }

  /** RM3-style pseudo-relevance feedback (Lavrenko & Croft 2001 /
    * the Indri RM3 recipe, rank-weighted integer form): run BM25,
    * mine the top `feedbackDocs` results for the terms that
    * characterize them, and re-run BM25 with the query EXPANDED by
    * the top `expansion` such terms — the classic recall lever when
    * the original query undershoots (the corpus-search loop a
    * curation pipeline runs to grow a seed set).
    *
    * Expansion weights are INTEGER-exact: each token occurrence in a
    * feedback doc contributes (feedbackDocs + 1 − rank_of_doc), i.e.
    * weight(t) = Σ_d tf(t,d)·(n+1−rank_d) — a rank-discounted term
    * frequency with no float relevance model to diverge on — and the
    * top-m cut is (weight desc, term asc). Original query terms are
    * excluded from expansion. The m terms are a bounded data-derived
    * parameter fetch (the PPR-seed convention; the oracle re-derives
    * them in SQL), and both BM25 rounds are [[bm25TopK]] verbatim —
    * the posting probe stays filtered to |Q| + m terms before any
    * shuffle. Returns the round-2 (id, bm25) top-k. */
  def rm3TopK(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], k: Int,
              feedbackDocs: Int = 10, expansion: Int = 5,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(feedbackDocs >= 1 && feedbackDocs <= 100,
      s"feedbackDocs must be in [1, 100] (got $feedbackDocs)")
    require(expansion >= 1 && expansion <= 50,
      s"expansion must be in [1, 50] (got $expansion)")
    val ranked = asRanking(
      bm25TopK(docs, idCol, textCol, queryTerms, feedbackDocs, k1, b),
      "id", "bm25")
    // bounded parameter fetch: the m expansion terms
    val terms = docs
      .select(col(idCol).as("id"),
        explode(TextStats.tokens(col(textCol))).as("term"))
      .join(broadcast(ranked), "id")
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy("term")
      .agg(sum(lit(feedbackDocs.toLong + 1L) - col("rank")).as("w"))
      .orderBy(col("w").desc, col("term").asc).limit(expansion)
      .collect().map(_.getString(0)).toSeq
    bm25TopK(docs, idCol, textCol, queryTerms ++ terms, k, k1, b)
  }

  /** Attach a dense 1-based rank to an ALREADY top-n-bounded scored
    * frame: row_number over (score desc, id asc). The single-partition
    * window is bounded by the list length (n rows post-limit), the
    * same post-aggregation-sized-window argument as d20's mixture
    * share. */
  def asRanking(scored: DataFrame, idCol: String,
                scoreCol: String): DataFrame =
    scored.select(col(idCol).as("id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol).asc)).as("rank"))

  /** Maximal Marginal Relevance top-k (Carbonell & Goldstein, SIGIR
    * 1998) — DIVERSIFIED nearest-neighbor retrieval: greedily select
    * the candidate maximizing λ·relevance − (1−λ)·max-similarity-to-
    * already-selected, so near-duplicate neighbors stop crowding the
    * result list (the re-rank every RAG/search stack runs after ANN).
    *
    * Exactness discipline: relevance and pairwise cosines quantize to
    * MICRO integers per value — round(1e6·dot of unit vectors) — and
    * λ rides as tenths (`lambda10`), so each greedy step's argmax is
    * over score10 = λ10·rel − (10−λ10)·pen, an exact integer with the
    * (score desc, id asc) tie-break: no float accumulation or
    * comparison can diverge between engines. The oracle replays all k
    * steps as unrolled chained CTEs (the d55 discipline).
    *
    * Shape at scale: one corpus scan scores relevance and takes the
    * top-`pool` re-rank window (TakeOrdered); the greedy runs k
    * bounded argmax fetches over that localCheckpointed pool-row
    * frame, with selected vectors folded back as literals (the BPE
    * iterative-top-1 convention — driver state is k unit vectors,
    * never data). Returns
    * (mmr_rank, vec_id, rel_micro, pen_micro, score10_micro). */
  def mmrTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, pool: Int,
              lambda10: Int = 7): DataFrame = {
    require(k >= 1 && pool >= k && pool <= 1000,
      "need 1 <= k <= pool <= 1000 (the bounded re-rank window)")
    require(lambda10 >= 0 && lambda10 <= 10, "lambda10 in [0, 10]")
    // the greedy loop reads ids back as longs: demand an integral id
    // up front instead of a mid-loop ClassCastException, and a
    // NONZERO query instead of NaN relevance sorting silently last
    // (round-11 review). Zero-norm stored vectors have no direction
    // and are excluded below for the same reason.
    require(Seq("bigint", "int", "smallint")
        .contains(emb.schema(idCol).dataType.simpleString),
      s"mmrTopK needs an integral id column; '$idCol' is " +
        emb.schema(idCol).dataType.simpleString)
    val qn = {
      val n = math.sqrt(query.map(x => x * x).sum)
      require(n > 0, "query vector must be nonzero")
      query.map(_ / n)
    }
    val cand = emb
      .filter(ExprUtils.let(Similarity.toDouble(col(vecCol))) { v =>
        Similarity.dot(v, v) > 0 })
      .select(col(idCol).cast("long").as("vec_id"),
        ExprUtils.let(Similarity.toDouble(col(vecCol))) { v =>
          ExprUtils.let(Similarity.norm(v)) { n =>
            transform(v, x => x / n)
          }
        }.as("nv"))
      .withColumn("rel_m",
        round(Similarity.dot(col("nv"), typedlit(qn)) * lit(1e6))
          .cast("long"))
      .orderBy(col("rel_m").desc, col("vec_id").asc).limit(pool)
      .localCheckpoint()
    val lam = lambda10.toLong
    var selected = Vector.empty[(Long, Seq[Double], Long, Long)]
    (1 to k).foreach { _ =>
      val base =
        if (selected.isEmpty) cand
        else cand.filter(!col("vec_id").isin(selected.map(_._1): _*))
      val penCols = selected.map(s =>
        round(Similarity.dot(col("nv"), typedlit(s._2)) * lit(1e6))
          .cast("long"))
      val pen = penCols match {
        case Seq() => lit(0L)
        case Seq(one) => one
        case more => greatest(more: _*)
      }
      val top = base
        .select(col("vec_id"), col("nv"), col("rel_m"),
          pen.as("pen_m"))
        .withColumn("score10",
          lit(lam) * col("rel_m") - lit(10L - lam) * col("pen_m"))
        .orderBy(col("score10").desc, col("vec_id").asc)
        .limit(1).collect().headOption
      top.foreach { r =>
        selected :+= ((r.getLong(0), r.getSeq[Double](1),
          r.getLong(2), r.getLong(3)))
      }
    }
    val spark = emb.sparkSession
    import spark.implicits._
    selected.zipWithIndex.map { case ((id, _, rel, pen), i) =>
      (i + 1L, id, rel, pen, lam * rel - (10L - lam) * pen)
    }.toDF("mmr_rank", "vec_id", "rel_micro", "pen_micro",
      "score10_micro")
  }
}
