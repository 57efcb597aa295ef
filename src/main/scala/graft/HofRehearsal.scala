package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, TextStats}

/** Dev/audit tool: the interpreted-HOF tax sweep (round-11 verdict
  * task 6). The d54 lesson hit three times — interpreted higher-order
  * lambdas on a hot column (minhash fold, token-entropy, simhash) cost
  * multiples of a codegen'd kernel computing the same bits. This
  * measures every remaining declarative/native pair on a FULL-column
  * scan over the sf documents table, plus the absolute cost of the
  * one hot HOF family without a native twin (the 13-gram
  * position/hash builders behind d24/d27/d62/curate).
  *
  * Method: each expression is forced through an aggregation over its
  * VALUE (never a bare count — Catalyst prunes columns a count does
  * not need), one warm-up run, then the median of 3 timed runs.
  * Results recorded in PLANS.md ("HOF tax table").
  *
  * Usage: sbt "runMain graft.HofRehearsal [sfDir]"
  */
object HofRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint() // pin the input: scans must not re-read parquet

    def timed(label: String)(df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val runs = Seq.fill(3)(once()).sorted
      val med = runs(1)
      println(f"[hof] $label%-28s ${med}%6.2f s  (runs ${runs.map(r => f"$r%.2f").mkString(", ")})")
      med
    }

    // 1. portable MinHash signature: interpreted k-minima fold over
    //    md5 shingle hashes vs the Md5MinHashSig kernel (same bits)
    val mhDecl = timed("minhash12_declarative") {
      docs.select(Dedup.minhashSignaturePortable(
          Dedup.shingles(col("text"), 3), 12).as("sig"))
        .agg(sum(element_at(col("sig"), 1).cast("decimal(38,0)")))
    }
    val mhNat = timed("minhash12_native") {
      docs.select(Dedup.minhashSignaturePortableNative(
          col("text"), 12, 3).as("sig"))
        .agg(sum(element_at(col("sig"), 1).cast("decimal(38,0)")))
    }

    // 2. token entropy: interpreted per-distinct-token lambda sum vs
    //    the TokenEntropyMicro kernel (same bits)
    val teDecl = timed("token_entropy_declarative") {
      docs.select(TextStats.tokenEntropyMicro(col("text")).as("e"))
        .agg(sum(col("e").cast("decimal(38,0)")))
    }
    val teNat = timed("token_entropy_native") {
      docs.select(TextStats.tokenEntropyMicroNative(col("text")).as("e"))
        .agg(sum(col("e").cast("decimal(38,0)")))
    }

    // 3. simhash-60: the round-10 pair, re-measured under this
    //    harness so the table is one method end to end
    val shDecl = timed("simhash60_declarative") {
      docs.select(Dedup.simhash60Portable(split(col("text"), " "))
          .as("h"))
        .agg(sum(col("h").cast("decimal(38,0)")))
    }
    val shNat = timed("simhash60_native") {
      docs.select(Dedup.simhash60PortableNative(split(col("text"), " "))
          .as("h"))
        .agg(sum(col("h").cast("decimal(38,0)")))
    }

    // 4. the remaining kernel-less hot HOF: 13-gram construction.
    //    (a) the d24/curate shape — per-doc DISTINCT gram strings,
    //    exploded and hashed; (b) the d62 shape — positioned gram
    //    hashes. Absolute cost only: no native twin exists yet, the
    //    table decides whether one is warranted (>= 2x rule).
    val ng24 = timed("ngram13_distinct_hash") {
      docs.select(col("doc_id"), explode(array_distinct(
          Curation.wordNgrams(col("text"), 13))).as("gram"))
        .select(xxhash64(col("gram")).as("g"))
        .agg(count(lit(1)), sum(col("g").cast("decimal(38,0)")))
    }
    // lower-bound proxy: same explode volume, no per-position slicing
    // lambda — splits the HOF's share out of (a)'s total
    val ngTok = timed("token_explode_hash_floor") {
      docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .select(xxhash64(col("tok")).as("g"))
        .agg(count(lit(1)), sum(col("g").cast("decimal(38,0)")))
    }

    println(f"[hof] ratios: minhash ${mhDecl / mhNat}%.1fx, " +
      f"entropy ${teDecl / teNat}%.1fx, simhash ${shDecl / shNat}%.1fx, " +
      f"ngram13 vs token floor ${ng24 / ngTok}%.1fx")
    spark.stop()
  }
}
