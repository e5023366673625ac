package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication for training-data pipelines, designed for 100 TB:
  * every variant is blocked/bucketed so candidate generation is a
  * shuffle-on-key join, never an O(n²) cross product. Hashes are
  * md5-derived (portable, deterministic) so the DuckDB oracle can
  * reproduce every signature bit-for-bit.
  *
  * Implementation note — explode + hash-aggregate, not array lambdas:
  * signature computation (minhash mins, simhash bit votes, shared-gram
  * counts) runs as codegen'd aggregates over exploded (doc, token) rows.
  * The tempting array-lambda form (`transform`/`aggregate` over a
  * shingle array) evaluates interpreted closures AND re-inlines the
  * shingle-hash expression once per hash function — measured ~50×
  * slower at sf0.1. The exploded form is also the shape that scales:
  * rows are (doc, shingle) — flat, partitionable, spillable.
  *
  * Scale shapes:
  *   - exact:   one hash-shuffle groupBy (map-side partial agg).
  *   - minhash: explode shingles → 1 md5/shingle → groupBy doc with
  *     numHashes min-aggs → explode B band keys → groupBy band key →
  *     pairs within bucket. Bucket sizes concentrate near 1 for non-dup
  *     corpora; skewed buckets (boilerplate) are exactly the dups we want.
  *   - simhash: explode tokens → 32 conditional-sum aggs → bit pack;
  *     near-dup candidates block on signature bytes (pigeonhole).
  *   - ngram:   shared-gram counting via a (block, gram) equi-join —
  *     codegen'd hash join + agg, no per-pair array intersections.
  */
object Dedup {

  /** Exact dedup: group identical texts, keep the smallest id.
    * One shuffle on the 128-bit text hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Template/bot detection by skeleton fingerprint: a doc's SKELETON
    * is its distinct lines that recur across the corpus (line
    * df ≥ `minLineDf` — boilerplate by definition), and docs sharing
    * the exact same skeleton set are instances of one template
    * (mass-produced pages, bot posts, mirrored boilerplate with a
    * variable field). The structural sibling of [[exact]]: exact
    * dedup needs byte equality; this clusters docs whose FRAME is
    * identical while the variable lines differ.
    *
    * Scale shape: one line explode + line-df count (hash shuffle),
    * one per-doc sorted-hash fold into a 60-bit fingerprint, one
    * fingerprint groupBy — all map-side combined; no pairwise
    * anything. Docs with an empty skeleton (no recurring lines) are
    * excluded — they have no template identity, and a shared "empty"
    * fingerprint would be one giant false cluster.
    * Output: (fingerprint, n_docs, keep_id) for clusters of ≥ 2. */
  def templateClusters(df: DataFrame, idCol: String, textCol: String,
                       minLineDf: Int = 2): DataFrame = {
    val lines = df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("line"))
      .filter(length(col("line")) > 0)
      .distinct()
    val freq = lines.groupBy("line")
      .agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minLineDf)
    val skel = lines.join(freq.select("line"), Seq("line"))
      .select(col("doc_id"), TextFunctions.md5Hash60(col("line")).as("h"))
    val fp = skel.groupBy("doc_id")
      .agg(array_sort(collect_set(col("h"))).as("hs"))
      .select(col("doc_id"),
        TextFunctions.md5Hash60(
          array_join(transform(col("hs"), _.cast("string")), ","))
          .as("fingerprint"))
    fp.groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("keep_id")
  }

  /** Word n-shingles (distinct) of a text column — codegen'd one-pass
    * expression (set-identical to the tokens→transform→slice lambda
    * form, ~10× faster; see graft.plans.WordShingles). */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.WordShingles(
        org.apache.spark.sql.graft.bridge.expression(text), n))

  /** Modular-hash parameters shared with the oracle SQL. */
  val MinhashP = 1000000007L
  def minhashA(i: Int): Long = 2L * i + 1
  def minhashB(i: Int): Long = (98765L * i + 12345L) % MinhashP

  /** MinHash signatures as a table: (doc_id_, sig array<long>).
    * h_i(doc) = min over shingles s of (a_i·(md5_60(s) mod p) + b_i) mod p.
    *
    * ONE codegen'd pass per document ([[graft.plans.MinhashSig]]) — no
    * explode, no shuffle, no aggregation. The previous explode → 32
    * min-aggregates form produced the same values but materialized
    * ~|shingles|·|docs| intermediate rows through a wide partial-agg
    * exchange — the stage most sensitive to executor memory pressure
    * (it spills first; a per-row loop cannot). Docs with no shingles
    * (empty/whitespace-only text) are absent, as they were under
    * explode. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id_"),
        minhashSigColumn(col(textCol), numHashes, shingleN).as("sig"))
      .filter(size(col("sig")) > 0)

  /** The signature as a bare Column — for callers that fuse the
    * minhash pass into a wider batch scan (StreamCuration computes
    * quality, language AND signatures in the one checkpointed pass
    * over the batch text) instead of paying a second scan through
    * [[minhashSignatures]]. Same codegen expression either way. */
  def minhashSigColumn(text: org.apache.spark.sql.Column, numHashes: Int,
                       shingleN: Int = 3): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.MinhashSig(
        org.apache.spark.sql.graft.bridge.expression(text),
        numHashes, shingleN))

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * `rowsPerBand`; docs sharing any band bucket become a candidate pair
    * with estimated Jaccard = matching signature positions / numHashes.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 bands: Int = 8, rowsPerBand: Int = 4,
                 minEstJaccard: Double = 0.0,
                 maxBucket: Int = 10000,
                 sigs: Option[DataFrame] = None,
                 edges: String = "all"): DataFrame = {
    require(edges == "all" || edges == "spanning",
      s"edges must be 'all' or 'spanning', got '$edges'")
    val numHashes = bands * rowsPerBand
    // `sigs` lets pipelines that run several dedup stages over one corpus
    // (candidates → verify → clusters → curated corpus) compute or cache
    // the signature table once: it must be (doc_id_, sig) with
    // numHashes-long signatures for exactly the docs of `df` that have
    // ≥1 shingle — e.g. a cached minhashSignatures output, or that
    // output semi-joined to a filtered subset (signatures are per-doc,
    // so restriction commutes with computation).
    val withSig = sigs.getOrElse(minhashSignatures(df, idCol, textCol, numHashes))
    val banded = capBuckets(bandKeys(withSig, bands, rowsPerBand),
      "band_key", maxBucket)
    // Match-count is computed BEFORE the pair dedup, so the
    // dropDuplicates shuffle carries (id_a, id_b, n_match) — 24 bytes —
    // instead of two full 32-long signature arrays per candidate
    // occurrence (the arrays made the dedup exchange the dominant cost).
    // n_match is deterministic per pair, so the deduped result is
    // identical. Codegen'd positional merge, not aggregate(zip_with(…)).
    def eqCount(aSig: Column, bSig: Column): Column =
      org.apache.spark.sql.graft.bridge.column(
        graft.plans.ArrayEqCount(
          org.apache.spark.sql.graft.bridge.expression(aSig),
          org.apache.spark.sql.graft.bridge.expression(bSig)))
    val raw = edges match {
      case "all" =>
        val a = banded.as("a")
        val b = banded.as("b")
        a.join(b,
            col("a.band_key") === col("b.band_key") &&
              col("a.doc_id_") < col("b.doc_id_"))
          .select(col("a.doc_id_").as("id_a"), col("b.doc_id_").as("id_b"),
            eqCount(col("a.sig"), col("b.sig")).as("n_match"))
      case "spanning" =>
        // Star edges to the bucket representative (min doc id): a
        // bucket of n near-identical docs emits n−1 edges instead of
        // C(n,2) — replica cliques (the pathological dedup input) go
        // from quadratic to linear pair counts, and the downstream
        // verify stage's cost drops with them. Connectivity is
        // preserved (every member reaches the rep, so min-label
        // clusters are identical when verification passes star edges —
        // the replica case by construction); what's lost is the
        // NON-representative pair list, so use "all" when the pairs
        // themselves are the product (similarity reports), "spanning"
        // when clusters/keepers are (dedup). One extra min_by agg on
        // the same band_key shuffle key — no new shuffle dimension.
        val reps = banded.groupBy("band_key")
          .agg(min_by(struct(col("doc_id_"), col("sig")), col("doc_id_"))
            .as("rep"))
          .select(col("band_key"), col("rep.doc_id_").as("rep_id"),
            col("rep.sig").as("rep_sig"))
        banded.join(reps, "band_key")
          .filter(col("doc_id_") > col("rep_id"))
          .select(col("rep_id").as("id_a"), col("doc_id_").as("id_b"),
            eqCount(col("rep_sig"), col("sig")).as("n_match"))
    }
    raw
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_match").cast("double") / lit(numHashes.toDouble))
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Band keys for a signature table (doc_id_, sig): one row per
    * (doc, band), key = md5 over the band's signature slice. Shared by
    * [[minhashLsh]] and [[IncrementalDedup]] so from-scratch and
    * incremental candidate generation bucket identically. */
  private[operators] def bandKeys(withSig: DataFrame, bands: Int,
                                  rowsPerBand: Int): DataFrame =
    withSig.select(col("doc_id_"), col("sig"),
      explode(array((0 until bands).map { b =>
        md5(concat_ws(",",
          lit(b) +: (0 until rowsPerBand).map(r =>
            col("sig").getItem(b * rowsPerBand + r)): _*))
      }: _*)).as("band_key"))

  /** 32-bit SimHash per row (Column form — interpreted; fine for small
    * inputs and unit tests; bulk jobs use [[simhashTable]]). */
  def simhash32(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text),
      t => TextFunctions.md5Hash60(t) % lit(4294967296L))
    (0 until 32).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bulk SimHash in one codegen'd pass per document
    * ([[graft.plans.SimhashSig]] — same fusion story as
    * [[minhashSignatures]]: the explode → 32 conditional-sum form
    * produced identical values through a wide agg exchange; this is a
    * scan-time projection). Returns (doc_id_, simhash). Documents whose
    * token set is empty — including NULL text, matching the old
    * explode+rejoin form's left-join default — get signature 0
    * (matching simhash32 over no tokens). */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = rawSimhash(textCol)
    df.select(col(idCol).as("doc_id_"),
      when(sig.isNull || sig === lit(graft.plans.SimhashSig.Empty), lit(0L))
        .otherwise(sig).as("simhash"))
  }

  private def rawSimhash(textCol: String): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.SimhashSig(
        org.apache.spark.sql.graft.bridge.expression(col(textCol))))

  /** Signatures for docs with ≥1 token (no empty-doc rows). */
  private def simhashSigs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id_"),
        rawSimhash(textCol).as("simhash"))
      .filter(col("simhash") =!= lit(graft.plans.SimhashSig.Empty))

  /** The canonical two-stage near-dup pipeline: cheap MinHash-LSH
    * candidate generation → exact n-gram-Jaccard verification on the
    * candidates only. This is the shape that holds at 100 TB: stage 1
    * is shuffle-on-band-key (near-linear), stage 2 touches only the
    * candidate pairs — never all pairs. Returns
    * (id_a, id_b, est_jaccard, jaccard). */
  def nearDupPipeline(df: DataFrame, idCol: String, textCol: String,
                      bands: Int = 8, rowsPerBand: Int = 4,
                      minEstJaccard: Double = 0.25,
                      minJaccard: Double = 0.4, ngramN: Int = 3,
                      sigs: Option[DataFrame] = None,
                      edges: String = "all"): DataFrame =
    verifyCandidates(df, idCol, textCol,
      minhashLsh(df, idCol, textCol, bands, rowsPerBand, minEstJaccard,
        sigs = sigs, edges = edges),
      minJaccard, ngramN)

  /** Stage 2 of [[nearDupPipeline]] alone: exact n-gram-Jaccard
    * verification of a candidate-pair table (id_a, id_b, est_jaccard).
    * Exposed so pipelines that already hold candidate pairs (cached LSH
    * output shared across several downstream stages) don't regenerate
    * them. Touches only the candidates — never all pairs. */
  def verifyCandidates(df: DataFrame, idCol: String, textCol: String,
                       cands: DataFrame, minJaccard: Double = 0.4,
                       ngramN: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id_"),
      org.apache.spark.sql.graft.bridge.column(graft.plans.NgramsLong(
        org.apache.spark.sql.graft.bridge.expression(col(textCol)), ngramN))
        .as("grams"))
    val jac = org.apache.spark.sql.graft.bridge.column(
      graft.plans.SortedJaccard(
        org.apache.spark.sql.graft.bridge.expression(col("ga.grams")),
        org.apache.spark.sql.graft.bridge.expression(col("gb.grams"))))
    cands
      .join(grams.as("ga"), col("id_a") === col("ga.doc_id_"))
      .join(grams.as("gb"), col("id_b") === col("gb.doc_id_"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Resolve near-dup pairs into clusters: connected components by
    * iterative min-label propagation to fixpoint (cluster id = smallest
    * doc id reachable through pair edges; transitive — A~B, B~C puts A,
    * B, C in one cluster even with no direct A~C pair). `keep` marks the
    * canonical document per cluster.
    *
    * Scale: each iteration is one join+agg shuffle; iterations needed =
    * O(log(component diameter)), and dup clusters are shallow in
    * practice. Every doc in `allDocs` appears in the output (singletons
    * cluster with themselves). */
  def resolveClusters(allDocs: DataFrame, idCol: String,
                      pairs: DataFrame, maxIter: Int = 20,
                      driverMaxEdges: Long = 1000000): DataFrame = {
    val nodes = allDocs.select(col(idCol).cast("long").as("node"))
    // materialize the (directed) pair list ONCE — `pairs` may carry an
    // expensive lineage (the whole minhash+verify pipeline); the
    // mirrored edge list is derived from this cache, and only when the
    // distributed path actually needs it (the driver path mirrors in
    // memory — union-find is direction-blind anyway)
    val p = pairs.select(col("id_a").cast("long").as("src"),
      col("id_b").cast("long").as("dst")).cache()
    val nEdges = p.count() * 2

    // Small-graph fast path: verified near-dup pairs are SPARSE (the
    // pipeline's whole point), so the edge list usually fits the driver
    // comfortably — a union-find there beats 10+ distributed fixpoint
    // rounds. The iterative path below remains for genuinely huge pair
    // sets. Both produce identical labels: min id per component of the
    // subgraph INDUCED on allDocs — the fixpoint only propagates
    // through nodes that have labels, so an edge touching an id absent
    // from allDocs is inert there, and the union-find must drop it too
    // (else a foreign id could become a cluster label, or bridge two
    // docs the distributed path keeps separate).
    if (nEdges <= driverMaxEdges) {
      val rawEs = p.collect().map(r => (r.getLong(0), r.getLong(1)))
      p.unpersist()
      val session = allDocs.sparkSession
      import session.implicits._
      // membership of just the (small) endpoint set: one broadcast-probe
      // scan of the docs — no shuffle, no full id collect
      val endpoints = rawEs.flatMap(e => Seq(e._1, e._2)).distinct.toSeq
      val known = nodes
        .join(broadcast(endpoints.toDF("node")), Seq("node"), "left_semi")
        .as[Long].collect().toSet
      val es = rawEs.filter(e => known(e._1) && known(e._2))
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      es.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { // min id becomes the root
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      // SNAPSHOT the keys before mapping (r15 correctness fix): find()
      // path-compresses — a put() on mutable.HashMap can growTable even
      // for an EXISTING key (2.13 checks the load factor before the
      // key), so mapping over the LIVE keySet while find() writes can
      // rehash mid-iteration and silently skip entries. Reproduced
      // deterministically: a 24-edge label graph yielded 13 of 23
      // mapping rows, every skipped node silently falling back to a
      // self label downstream (DedupSpec pins the regression).
      val mapping = parent.keysIterator.toArray.map(n => n -> find(n))
        .toSeq.toDF("node", "label")
      return nodes.join(broadcast(mapping), Seq("node"), "left")
        .select(col("node").as("doc_id"),
          coalesce(col("label"), col("node")).as("cluster_id"),
          (coalesce(col("label"), col("node")) === col("node")).as("keep"))
    }

    // distributed fixpoint: mirror the cached pairs into undirected
    // edges (reads the p cache twice — cheap — not the pair lineage)
    val edges = p.unionByName(p.select(col("dst").as("src"),
      col("src").as("dst"))).cache()
    edges.count()
    p.unpersist()
    var labels = nodes.select(col("node"), col("node").as("label")).cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("src") === labels("node"))
        .groupBy(col("dst").as("node_"))
        .agg(min("label").as("nbr_label"))
      // pointer doubling — label(label(node)) — alongside the one-hop
      // neighbor min: plain propagation needs O(component diameter)
      // rounds, the indirection step contracts that to O(log diameter),
      // so maxIter=20 covers diameters near 2^20
      val dbl = labels.as("l1")
        .join(labels.as("l2"), col("l1.label") === col("l2.node"))
        .select(col("l1.node").as("node__"), col("l2.label").as("dbl_label"))
      // localCheckpoint, NOT cache: each step references `labels` three
      // times (self-join + neighbor join), so the logical plan grows
      // ~4^iter under cache (which truncates execution, never lineage)
      // — by iteration ~10 even RENDERING the plan string OOMs the
      // driver (observed at the factor-30 stress). Checkpointing cuts
      // the lineage to the materialized partitions each round.
      val next = labels.join(nbrMin, labels("node") === nbrMin("node_"), "left")
        .join(dbl, labels("node") === col("node__"), "left")
        .select(col("node"),
          least(col("label"),
            coalesce(col("nbr_label"), col("label")),
            coalesce(col("dbl_label"), col("label")))
            .as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "old_label"),
        "node").filter(col("label") < col("old_label")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // silent non-convergence would hand out WRONG cluster ids — fail loudly
    if (!converged) {
      edges.unpersist()
      labels.unpersist()
      throw new IllegalStateException(
        s"resolveClusters: min-label propagation not converged after " +
          s"$maxIter rounds — component diameter exceeds 2^$maxIter?")
    }
    // detach the result from the cached lineage so edges can be freed
    val out = labels.select(col("node").as("doc_id"),
      col("label").as("cluster_id"),
      (col("node") === col("label")).as("keep")).localCheckpoint()
    edges.unpersist()
    labels.unpersist()
    out
  }

  /** Pigeonhole block layout: `numBlocks` near-even chunks of the
    * 32-bit signature as (index, shift, width). Pairs with hamming ≤
    * numBlocks − 1 are GUARANTEED to share at least one exact block —
    * so blocking with maxHamming+1 blocks is lossless, and wider blocks
    * (fewer docs per bucket) cut candidates vs fixed byte blocks
    * (measured 3.2× at sf0.1 for hamming ≤ 2). */
  def simhashBlocks(numBlocks: Int, bits: Int = 32): Seq[(Int, Int, Int)] = {
    val base = bits / numBlocks
    val extra = bits % numBlocks
    var shift = 0
    (0 until numBlocks).map { k =>
      val w = base + (if (k < extra) 1 else 0)
      val spec = (k, shift, w)
      shift += w
      spec
    }
  }

  /** Candidate-bucket safety valve: blocked pair generation is Σ k² over
    * bucket sizes k, so one mega-bucket (boilerplate cluster at corpus
    * scale) turns a linear pass quadratic. Buckets above `maxBucket`
    * are dropped — the standard recall-for-survival tradeoff; at the
    * test scale factors no bucket comes near the default cap, so
    * results (and oracles) are unchanged. */
  private[operators] def capBuckets(banded: DataFrame, keyCol: String,
                                    maxBucket: Int): DataFrame = {
    if (maxBucket <= 0) return banded
    // groupBy + anti-join, not a window: a window over the banded rows
    // re-shuffles both self-join branches and blocks broadcast planning
    // downstream (measured 5× slower at 50k docs). No broadcast hint —
    // the oversized set is usually tiny, but on the boilerplate-heavy
    // corpora this guard exists for it can be large; let AQE pick.
    val oversized = banded.groupBy(keyCol).count()
      .filter(col("count") > maxBucket).select(keyCol)
    banded.join(oversized, Seq(keyCol), "left_anti")
  }

  /** No-silent-caps companion to [[minhashLsh]]: the band buckets its
    * `maxBucket` valve excludes, as (band_key, n_docs) — run it with
    * the SAME banding parameters (and the same cached `sigs`, if any)
    * and log the result next to the pair count, so a capped run says
    * WHAT it skipped instead of silently under-reporting near-dups.
    * A mega-bucket here is a boilerplate cluster the valve protected
    * the pair join from (n_docs² candidate pairs); exact dedup and
    * [[lineBoilerplate]] are the right tools for what's inside it.
    * Empty when nothing was dropped. */
  def lshDroppedBuckets(df: DataFrame, idCol: String, textCol: String,
                        bands: Int = 8, rowsPerBand: Int = 4,
                        maxBucket: Int = 10000,
                        sigs: Option[DataFrame] = None): DataFrame = {
    val withSig = sigs.getOrElse(
      minhashSignatures(df, idCol, textCol, bands * rowsPerBand))
    bandKeys(withSig, bands, rowsPerBand)
      .groupBy("band_key").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, blocked by
    * maxHamming+1 signature chunks (exact — see [[simhashBlocks]]). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    // empty-token docs are excluded (a pair of empty docs is vacuous)
    val sigs = simhashSigs(df, idCol, textCol)
    val blocks = simhashBlocks(maxHamming + 1)
    val banded0 = sigs.select(col("doc_id_"), col("simhash"),
      explode(array(blocks.map { case (k, shift, w) =>
        concat_ws(":", lit(k),
          shiftright(col("simhash"), shift) % (1L << w))
      }: _*)).as("block_key"))
    val banded = capBuckets(banded0, "block_key", maxBucket)
    banded.as("a").join(banded.as("b"),
        col("a.block_key") === col("b.block_key") &&
          col("a.doc_id_") < col("b.doc_id_"))
      .select(col("a.doc_id_").as("id_a"), col("b.doc_id_").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // filter BEFORE dropDuplicates: hamming is deterministic per pair,
      // so filtering first is result-identical, and the dedup shuffle
      // carries only the (rare) matching pairs instead of every
      // block-collision candidate (hamming-31 junk included)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact character-n-gram Jaccard within (blockCol, length-bucket)
    * blocks. Each doc's sorted distinct gram set is computed ONCE; the
    * blocked pair join then counts overlaps with the codegen'd
    * [[graft.plans.SortedIntersectCount]] merge (|A∪B| = |A|+|B|−|A∩B|).
    * A (block, gram) join would square on corpus-common grams; the
    * interpreted `array_intersect` hashes per pair — both measured far
    * slower at sf0.1. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int = 3, bucketChars: Int = 50,
                   minJaccard: Double = 0.0): DataFrame = {
    // Each n-gram is encoded bijectively into one long (21 bits per
    // codepoint — full Unicode): set sizes and intersections are
    // IDENTICAL to string grams, so the oracle can keep string grams,
    // while the pair merge runs on primitive long arrays. Gram arrays
    // are built by the codegen'd NgramsLong (one pass + primitive sort).
    val gramExpr = org.apache.spark.sql.graft.bridge.column(
      graft.plans.NgramsLong(
        org.apache.spark.sql.graft.bridge.expression(col(textCol)), n))
    val prepped = df.select(col(idCol).as("doc_id_"), col(blockCol).as("block_"),
      (length(col(textCol)).cast("long") / lit(bucketChars)).cast("long").as("lbucket_"),
      gramExpr.as("grams"))
    val jac = org.apache.spark.sql.graft.bridge.column(
      graft.plans.SortedJaccard(
        org.apache.spark.sql.graft.bridge.expression(col("a.grams")),
        org.apache.spark.sql.graft.bridge.expression(col("b.grams"))))
    prepped.as("a").join(prepped.as("b"),
        col("a.block_") === col("b.block_") &&
          col("a.lbucket_") === col("b.lbucket_") &&
          col("a.doc_id_") < col("b.doc_id_"))
      .select(col("a.doc_id_").as("id_a"), col("b.doc_id_").as("id_b"),
        jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** [[ngramJaccard]] restricted to a candidate pair list — the
    * 100 TB flagship form. Same blocking (blockCol × length bucket),
    * same codegen'd [[graft.plans.SortedJaccard]] merge, same
    * threshold semantics, but instead of squaring on block occupancy
    * the pair stage is two equi joins of `pairs` (typically the banded
    * MinHash candidates, linear-ish in the corpus) against the per-doc
    * gram table: result = ngramJaccard(df) ∩ pairs. Pairs outside the
    * block (different blockCol value or length bucket) are dropped —
    * exactly the pairs the full form never examines. `pairs` must carry
    * (id_a, id_b) with id_a < id_b (minhashLsh's contract). */
  def ngramJaccardOnPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCol: String, pairs: DataFrame, n: Int = 3,
                          bucketChars: Int = 50,
                          minJaccard: Double = 0.0): DataFrame = {
    val gramExpr = org.apache.spark.sql.graft.bridge.column(
      graft.plans.NgramsLong(
        org.apache.spark.sql.graft.bridge.expression(col(textCol)), n))
    val prepped = df.select(col(idCol).as("doc_id_"), col(blockCol).as("block_"),
      (length(col(textCol)).cast("long") / lit(bucketChars)).cast("long").as("lbucket_"),
      gramExpr.as("grams"))
    val jac = org.apache.spark.sql.graft.bridge.column(
      graft.plans.SortedJaccard(
        org.apache.spark.sql.graft.bridge.expression(col("a.grams")),
        org.apache.spark.sql.graft.bridge.expression(col("b.grams"))))
    pairs.select("id_a", "id_b")
      .join(prepped.as("a"), col("id_a") === col("a.doc_id_"))
      .join(prepped.as("b"), col("id_b") === col("b.doc_id_"))
      .filter(col("a.block_") === col("b.block_") &&
        col("a.lbucket_") === col("b.lbucket_"))
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** LSH candidate-recall harness: of the pairs blocked EXACT
    * word-3-shingle Jaccard finds at `minJaccard`, what fraction does
    * the banded MinHash index surface as candidates? One row:
    * (n_truth, n_cand, n_hit, recall) — recall NULL when no truth
    * pairs exist. Truth runs on hashed-long shingle sets (md5-60
    * mod p) so the pair stage is [[graft.plans.SortedJaccard]]'s
    * primitive merge.
    *
    * The truth join is quadratic in block occupancy — affordable at
    * verification scale, not at 100 TB. `sampleMod` > 1 restricts the
    * TRUTH side (both pair endpoints) to the deterministic doc sample
    * h60("recall:" + id) % sampleMod == 0: recall is a per-pair
    * property, so an unbiased doc sample is an unbiased sample of the
    * pair population, and the truth-join cost drops ~sampleMod².
    * The candidate INDEX always stays full-corpus — the harness
    * measures the index as deployed, on a sample of questions
    * (n_cand is restricted to in-sample pairs so the three counts
    * share one scope). */
  def lshRecall(df: DataFrame, idCol: String, textCol: String,
                blockCol: String, bands: Int = 8, rowsPerBand: Int = 4,
                minJaccard: Double = 0.4, bucketChars: Int = 25,
                sampleMod: Int = 1,
                cands: Option[DataFrame] = None): DataFrame = {
    val sampled = if (sampleMod > 1)
      df.filter(TextFunctions.md5Hash60(
        concat(lit("recall:"), col(idCol).cast("string")))
        % lit(sampleMod.toLong) === 0)
    else df
    val sh = sampled.select(col(idCol).as("doc_id_"),
        col(blockCol).as("block_"),
        (length(col(textCol)).cast("long") / lit(bucketChars)).cast("long")
          .as("lbucket_"),
        array_sort(array_distinct(transform(shingles(col(textCol), 3),
          sgl => TextFunctions.md5Hash60(sgl) % lit(MinhashP)))).as("hs"))
      .filter(size(col("hs")) > 0)
    val wjac = org.apache.spark.sql.graft.bridge.column(
      graft.plans.SortedJaccard(
        org.apache.spark.sql.graft.bridge.expression(col("a.hs")),
        org.apache.spark.sql.graft.bridge.expression(col("b.hs"))))
    val truth = sh.as("a").join(sh.as("b"),
        col("a.block_") === col("b.block_") &&
          col("a.lbucket_") === col("b.lbucket_") &&
          col("a.doc_id_") < col("b.doc_id_"))
      .select(col("a.doc_id_").as("id_a"), col("b.doc_id_").as("id_b"),
        wjac.as("wjaccard"))
      .filter(col("wjaccard") >= minJaccard)
      .select("id_a", "id_b")
    val candAll = cands.getOrElse(
      minhashLsh(df, idCol, textCol, bands, rowsPerBand))
      .select("id_a", "id_b")
    val candScoped = if (sampleMod > 1) {
      val ids = sampled.select(col(idCol).as("sid"))
      candAll.join(ids, candAll("id_a") === col("sid"), "left_semi")
        .join(sampled.select(col(idCol).as("sid")),
          candAll("id_b") === col("sid"), "left_semi")
    } else candAll
    val hit = truth.join(candScoped, Seq("id_a", "id_b"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(candScoped.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(TextFunctions.portableRound(
            col("n_hit").cast("double") / col("n_truth").cast("double"), 4))
          .as("recall"))
  }

  /** Winnowing fingerprints (rolling k-gram hashes → per-window minima;
    * see [[graft.plans.WinnowFingerprint]]): (doc_id_, fp array<long>).
    * Docs shorter than k characters have an empty fingerprint. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol).as("doc_id_"),
      org.apache.spark.sql.graft.bridge.column(
        graft.plans.WinnowFingerprint(
          org.apache.spark.sql.graft.bridge.expression(col(textCol)), k, w))
        .as("fp"))

  /** Copy-detection pairs à la MOSS: hashes appearing in more than
    * `maxDocFreq` documents are boilerplate and IGNORED (standard MOSS
    * practice — and the scale guarantee: with bucket sizes capped at a
    * constant, candidate pairs are ≤ maxDocFreq · |rows|, linear in the
    * corpus where the uncapped join grows quadratically — measured
    * 135M candidate pairs from 5k template docs at sf0.1). Containment
    * = shared / min rare-set size over the SURVIVING (rare) fingerprint
    * sets on both sides, with `minShared` guarding the tiny-denominator
    * pairs a handful of rare hashes would otherwise promote.
    * Trade-off, documented: overlap that consists ENTIRELY of
    * corpus-wide boilerplate is invisible — by design, that overlap is
    * the template, not a copy. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 4,
                         maxDocFreq: Int = 20, minShared: Int = 3,
                         minContainment: Double = 0.5): DataFrame = {
    val ex0 = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("doc_id_"), explode(col("fp")).as("h"))
    val hot = ex0.groupBy("h").count()
      .filter(col("count") > maxDocFreq).select("h")
    val ex = ex0.join(hot, Seq("h"), "left_anti")
    // rare-set size rides every row via one window pass (shuffle on
    // doc), then the pair join carries it as a 4-byte grouping key —
    // no per-pair fingerprint-count join-back
    val nf = ex.withColumn("nfp",
      count(lit(1)).over(Window.partitionBy("doc_id_")))
    nf.as("a").join(nf.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id_") < col("b.doc_id_"))
      .groupBy(col("a.doc_id_").as("id_a"), col("b.doc_id_").as("id_b"),
        col("a.nfp").as("nfp_a"), col("b.nfp").as("nfp_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        TextFunctions.portableRound(
          col("n_shared").cast("double") / least(col("nfp_a"), col("nfp_b")),
          4).as("containment"))
      .filter(col("containment") >= minContainment)
  }

  /** Corpus-level line deduplication — the MassiveText/CCNet
    * "boilerplate removal" pass: any non-blank line appearing in at
    * least `minDocs` DISTINCT documents (cookie banners, nav menus,
    * copyright footers) is stripped from every document.
    *
    * Scale shape: lines reduce to 60-bit md5 hashes at scan time, so
    * the document-frequency aggregation and the boilerplate anti-join
    * both shuffle ~16-byte keys, never line text; per-doc reassembly is
    * one groupBy collecting (pos, line) structs sorted by position —
    * state bounded by the document's own line count. Blank lines are
    * never counted and never removed (they carry document structure).
    * A 60-bit collision could strip an innocent line — the same
    * accepted odds as every other hash-keyed operator here
    * ([[Contamination]], [[winnowFingerprints]]).
    *
    * Output: (doc_id, n_lines, n_kept, clean_text) for every input row,
    * clean_text = kept lines joined by '\n' in original order. */
  def lineBoilerplate(df: DataFrame, idCol: String, textCol: String,
                      minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("h", TextFunctions.md5Hash60(col("line")))
    val bl = lines.filter(length(trim(col("line"))) > 0)
      .select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= minDocs)
      .select(col("h"), lit(true).as("is_bl"))
    lines.join(bl, Seq("h"), "left")
      .withColumn("keep", col("is_bl").isNull)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("clean_text"))
  }

  /** Asymmetric near-duplication: containment |A∩B| / min(|A|,|B|)
    * over char n-gram SETS of candidate pairs — catches a short
    * document EMBEDDED in a long one (quote pages, aggregators,
    * snippet farms), which symmetric Jaccard misses because the union
    * is dominated by the longer side.
    *
    * Runs only on `cands` (id_a, id_b) from an upstream blocked
    * generator (LSH bands etc.), so the text work is O(|candidates|),
    * never all-pairs. Grams are the long-packed char n-grams of
    * [[ngramJaccard]] (codegen'd one pass, primitive arrays);
    * intersection is a hash probe over two ≤doc-length arrays.
    *
    * Output per surviving pair: ids, set sizes, intersection size,
    * containment (portable-rounded), and `contained_id` — the smaller
    * set, i.e. the document that is (mostly) inside the other;
    * size ties resolve to id_a (`<=`). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       cands: DataFrame, minContainment: Double,
                       n: Int = 3, roundTo: Int = 4): DataFrame = {
    val gramExpr = org.apache.spark.sql.graft.bridge.column(
      graft.plans.NgramsLong(
        org.apache.spark.sql.graft.bridge.expression(col(textCol)), n))
    val grams = df.select(col(idCol).as("doc_id_"), gramExpr.as("grams"))
    cands.select("id_a", "id_b")
      .join(grams.select(col("doc_id_").as("id_a"),
        col("grams").as("ga")), Seq("id_a"))
      .join(grams.select(col("doc_id_").as("id_b"),
        col("grams").as("gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(col("ga")).cast("long").as("n_a"),
        size(col("gb")).cast("long").as("n_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long")
          .as("n_inter"))
      .withColumn("containment", TextFunctions.portableRound(
        col("n_inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), roundTo))
      .filter(col("containment") >= minContainment)
      .withColumn("contained_id",
        when(col("n_a") <= col("n_b"), col("id_a")).otherwise(col("id_b")))
  }

  /** Corpus-wide FIRST-OCCURRENCE line deduplication — the Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better")
    * keep-one policy at line granularity: every later occurrence of a
    * line already seen earlier in the corpus (order = (doc_id, pos)) is
    * removed; exactly one copy survives. Complements
    * [[lineBoilerplate]], whose doc-frequency rule strips ALL copies of
    * frequent lines and none of rare ones — keep-first removes the
    * copies but preserves the content itself.
    *
    * Scale shape: lines reduce to 60-bit domain-separated md5 hashes at
    * scan time; choosing the survivor is ONE window pass partitioned by
    * hash (each partition holds only the copies of one line — bounded
    * by that line's corpus frequency, the same skew bound as any keyed
    * window; a pathological universal line is exactly what
    * [[lineBoilerplate]] strips first in a production funnel). Blank
    * lines hash on (doc, pos) so each is its own partition — always
    * kept, never a hot key. Reassembly is the [[lineBoilerplate]]
    * per-doc struct sort.
    *
    * Output: (doc_id, n_lines, n_kept, clean_text) for every input
    * row; clean_text = surviving lines joined by '\n' in original
    * order. */
  def keepFirstLines(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("h",
        when(length(trim(col("line"))) > 0,
          TextFunctions.md5Hash60(concat(lit("line:"), col("line"))))
          .otherwise(TextFunctions.md5Hash60(concat(lit("blank:"),
            col("doc_id").cast("string"), lit(":"),
            col("pos").cast("string")))))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("doc_id"), col("pos"))
    lines.withColumn("keep", row_number().over(w) === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("clean_text"))
  }

  /** Weighted (multiset) Jaccard over verified candidate pairs:
    * Σ_t min(c_a(t), c_b(t)) / Σ_t max(c_a(t), c_b(t)) on TOKEN
    * COUNTS — the refinement pass after [[verifyCandidates]]'s
    * set-Jaccard: two documents sharing the same vocabulary at very
    * different frequencies (a page vs the page with one paragraph
    * looped 50×) score identically under set semantics and correctly
    * low here, and vice versa for the looped-boilerplate pair set
    * semantics under-scores.
    *
    * Scale shape: tokenization runs ONLY over documents that appear in
    * a pair (semi-join first), so cost follows the verified-pair
    * subset, not the corpus; each side keys its per-doc token counts
    * by the pair id and a full outer join on (pair, token-hash) makes
    * min/max exact integer sums over the token UNION. Pairs are the
    * bounded output of the LSH→verify pipeline by contract.
    *
    * Returns (id_a, id_b, sum_min, sum_max, w_jaccard). */
  def weightedJaccard(df: DataFrame, idCol: String, textCol: String,
                      pairs: DataFrame, roundTo: Int = 4): DataFrame = {
    // distinct FIRST: a duplicated (id_a, id_b) input row would join
    // ga×gb quadratically — sum_min/sum_max inflate (w_jaccard's ratio
    // survives but the documented exact sums go wrong) and the output
    // emits duplicate pair rows
    val p = pairs.select(col("id_a"), col("id_b")).distinct()
    val ids = p.select(col("id_a").as("doc_id"))
      .union(p.select(col("id_b").as("doc_id"))).distinct()
    val tc = df.select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(TextFunctions.hashedTokens(col("_t"))).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val ga = p.join(tc, col("id_a") === col("doc_id"))
      .select(col("id_a"), col("id_b"), col("h"), col("c").as("ca"))
    val gb = p.join(tc, col("id_b") === col("doc_id"))
      .select(col("id_a").as("ba"), col("id_b").as("bb"),
        col("h").as("bh"), col("c").as("cb"))
    val per = ga.join(gb,
        col("id_a") === col("ba") && col("id_b") === col("bb") &&
        col("h") === col("bh"), "full")
      .select(coalesce(col("id_a"), col("ba")).as("id_a"),
        coalesce(col("id_b"), col("bb")).as("id_b"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .groupBy("id_a", "id_b")
      .agg(sum(least(col("ca"), col("cb"))).as("sum_min"),
        sum(greatest(col("ca"), col("cb"))).as("sum_max"))
    // left join back to the pair list: a pair whose BOTH sides
    // tokenize to nothing has no token rows at all and must still
    // report (0, 0, 0.0) — silently dropping it would leave a caller's
    // score join with nulls
    p.join(per, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("sum_min"), lit(0L)).as("sum_min"),
        coalesce(col("sum_max"), lit(0L)).as("sum_max"),
        when(coalesce(col("sum_max"), lit(0L)) === 0L, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            col("sum_min").cast("double") / col("sum_max").cast("double"),
            roundTo)).as("w_jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** LSH design sweep: for every (bands, rowsPerBand) factorization of
    * the signature budget, the EXPECTED recall over this corpus's
    * verified near-dup population — E[1 − (1 − j^r)^b] with the
    * expectation taken over the verified pairs' exact Jaccards. The
    * analytic complement of x121 (measured recall of the deployed
    * config) and x138 (estimator calibration): this is the table a
    * team reads to re-budget bands/rows BEFORE re-indexing a 100 TB
    * corpus, priced against its own duplicate population instead of a
    * textbook S-curve at one j.
    *
    * Scale shape: the config grid is a handful of literal rows
    * broadcast against the (already slim) verified-pair list — one
    * pass, one ≤|grid|-group aggregate.
    *
    * Returns (bands, rows_per_band, n_pairs, expected_recall). */
  def lshDesignSweep(verified: DataFrame, jaccardCol: String = "jaccard",
                     totalHashes: Int = 32, roundTo: Int = 4): DataFrame = {
    require(totalHashes >= 1, "totalHashes >= 1")
    val configs = (1 to totalHashes)
      .filter(totalHashes % _ == 0)
      .map(b => struct(lit(b).as("bands"),
        lit(totalHashes / b).as("rows_per_band")))
    val detect = lit(1.0) -
      pow(lit(1.0) - pow(col(jaccardCol).cast("double"),
        col("rows_per_band").cast("double")), col("bands").cast("double"))
    // per-pair terms quantize to ×10⁸ longs so the mean is an exact
    // integer ratio — the x212 discipline: summation order can never
    // move the rounded result
    val detectQ = floor(detect * lit(1e8) + lit(0.5)).cast("long")
    verified.select(col(jaccardCol))
      .withColumn("cfg", explode(array(configs: _*)))
      .select(col("cfg.bands").as("bands"),
        col("cfg.rows_per_band").as("rows_per_band"), col(jaccardCol))
      .groupBy("bands", "rows_per_band")
      .agg(count(lit(1)).as("n_pairs"),
        TextFunctions.portableRound(
          sum(detectQ).cast("double") /
            (count(lit(1)).cast("double") * lit(1e8)), roundTo)
          .as("expected_recall"))
      .orderBy("bands")
  }
}
