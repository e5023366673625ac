package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Interpreter-tax audit of the top compute-bound catalog rows (r14
  * verdict item 6): for each suspect stage, time the CURRENT form
  * against a semantically identical rewrite that keeps the per-element
  * work in whole-stage codegen (higher-order-function lambdas are
  * interpreted — Spark evaluates the lambda body per element through
  * the Catalyst interpreter, the 10-30× class that cost x179/x253).
  *
  * Stages audited (the x174/x170/x182/x233/x200 inventory):
  *   - tokHash  (x182/x88/x145 shape): transform(tokens, md5Hash60)
  *     per token vs explode-first + top-level md5 (codegen).
  *   - kgram    (x233 shape): transform(sequence, i => md5(concat(
  *     slice)))) vs explode-first + top-level slice/concat/md5.
  *   - entropy  (x170 shape): per-doc aggregate() fold over the
  *     distinct-token struct list vs a groupBy sum over exploded rows.
  *   - x174     (token budget): all-builtin scan — measured to confirm
  *     the all-clear, no rewrite exists because there is no lambda.
  *
  * Each stage is consumed by an order-insensitive agg so the timing is
  * the stage, not a collect. min-of-3 per variant, variants
  * interleaved so host drift hits both. */
object HofAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    docs.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def ab(name: String, cur: => Long, rw: => Long): Unit = {
      val cs = collection.mutable.ArrayBuffer.empty[Double]
      val rs = collection.mutable.ArrayBuffer.empty[Double]
      var (cn, rn) = (0L, 0L)
      (1 to 3).foreach { _ =>
        val (ct, cv) = time(cur); cs += ct; cn = cv
        val (rt, rv) = time(rw); rs += rt; rn = rv
      }
      require(cn == rn, s"$name: variants disagree ($cn vs $rn)")
      println(f"[hof] $name%-10s current=${cs.min}%6.2f s rewrite=${rs.min}%6.2f s tax=${cs.min / rs.min}%5.2fx (check=$cn)")
    }

    // ---- tokHash: the bigramBits family's hashed-token stage ----
    val tokHashCur = () => docs.select(
        transform(TextFunctions.tokens(lower(col("text"))),
          t => TextFunctions.md5Hash60(t)).as("hs"))
      .select(explode(col("hs")).as("h"))
      .agg(count(lit(1)), sum(col("h") % 997)).head().getLong(0)
    val tokHashRw = () => docs.select(
        explode(TextFunctions.tokens(lower(col("text")))).as("t"))
      .select(TextFunctions.md5Hash60(col("t")).as("h"))
      .agg(count(lit(1)), sum(col("h") % 997)).head().getLong(0)
    ab("tokHash", tokHashCur(), tokHashRw())

    // ---- kgram: x233's k-gram hash fan-out (k = 8) ----
    val k = 8
    val base = docs.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= k)
    val kgramCur = () => base.select(explode(
        transform(sequence(lit(0), size(col("tk")) - k),
          i => TextFunctions.md5Hash60(
            concat_ws(" ", slice(col("tk"), i + 1, lit(k)))))).as("h"))
      .agg(count(lit(1)), sum(col("h") % 997)).head().getLong(0)
    val kgramRw = () => base
      .select(col("tk"), explode(sequence(lit(0), size(col("tk")) - k)).as("i"))
      .select(TextFunctions.md5Hash60(
        concat_ws(" ", slice(col("tk"), col("i") + 1, lit(k)))).as("h"))
      .agg(count(lit(1)), sum(col("h") % 997)).head().getLong(0)
    ab("kgram", kgramCur(), kgramRw())

    // ---- entropy: x170's per-doc fold over (h, c, cnt) structs ----
    val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("term"))
      .select(col("doc_id"), TextFunctions.md5Hash60(col("term")).as("h"))
      .localCheckpoint()
    val g = toks.groupBy("h").agg(count(lit(1)).as("cnt")).localCheckpoint()
    val dc = toks.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val entropyCur = () => dc.join(g, Seq("h"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("h"), col("c"), col("cnt"))))
        .as("arr"))
      .select((lit(0.0) - aggregate(col("arr"), lit(0.0), (acc, s) =>
        acc + s.getField("c").cast("double") *
          log2((s.getField("cnt").cast("double") + lit(1.0)) /
            lit(1e7)))).as("e"))
      .agg(count(lit(1)), sum(floor(col("e") * 100))).head().getLong(0)
    val entropyRw = () => dc.join(g, Seq("h"))
      .groupBy("doc_id")
      .agg((lit(0.0) - sum(col("c").cast("double") *
        log2((col("cnt").cast("double") + lit(1.0)) / lit(1e7)))).as("e"))
      .agg(count(lit(1)), sum(floor(col("e") * 100))).head().getLong(0)
    ab("entropy", entropyCur(), entropyRw())

    // ---- x174's scan stage: all-builtin, no lambda — absolute cost
    //      only, to document the all-clear ----
    val (t174, n174) = time {
      docs.select(
          TextFunctions.qualityScore(col("text")).as("q"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("nt"))
        .agg(count(lit(1)), sum(col("nt")), sum(floor(col("q") * 1000)))
        .head().getLong(0)
    }
    println(f"[hof] x174scan   current=$t174%6.2f s (all builtin, no lambda; rows=$n174)")
    spark.stop()
  }
}
