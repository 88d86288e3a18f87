package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, an IVF-style
  * cluster-probed variant as the scale path, and cosine near-duplicate
  * pairs with cluster blocking.
  *
  * Numeric contract: every reduction is a *sequential in-array fold over
  * doubles* (`aggregate(zip_with(...))`), so the result is a fixed IEEE
  * expression tree — bit-identical across engines (the DuckDB oracle uses
  * `list_reduce` the same way), which is what makes exact score compare
  * possible. At scale the fold is a per-row O(d) projection that pipelines
  * with the scan; top-k is a per-query-partition window after a broadcast
  * of the (small) query set — the corpus never shuffles.
  */
object Similarity {

  /** Sequential double fold of elementwise products — deterministic dot.
    * Since r18 this is the fused native [[graft.functions.DotProduct]]
    * (one codegen'd loop, no per-row product-array allocation); it is
    * bit-identical to the composed
    * `aggregate(zip_with(...), 0.0, _ + _)` fold it replaces — same
    * widen-to-double, same sequential index-order accumulation from the
    * 0.0 seed — so every `list_reduce` oracle keeps hash-matching.
    */
  def dot(a: Column, b: Column): Column = call_function("dot_product", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composed-builtin cosine (portable: needs no session extension). */
  def cosineFold(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused native cosine ([[graft.functions.CosineSimilarity]], registered
    * by GraftExtensions): one codegen'd loop, no intermediate arrays, same
    * IEEE result as [[cosineFold]] bit for bit.
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Brute-force exact top-k by cosine for a (small, broadcast) query set.
    * Returns (query_id, vec_id, rank, cos).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cos")
  }

  /** The centroid table as ONE literal array<struct<cid, cv>> column.
    * Centroids are small by construction (they fit a driver list the same
    * way they'd fit an executor broadcast), so inlining them turns cluster
    * assignment into a pure per-row expression.
    */
  def centroidArray(cents: Seq[(Long, Array[Float])]): Column =
    centroidArrayD(cents.map { case (id, v) => (id, v.map(_.toDouble)) })

  /** Double-precision variant: k-means iterations produce double centroids
    * (decimal-exact means), which must NOT round-trip through float or the
    * oracle diverges.
    */
  def centroidArrayD(cents: Seq[(Long, Array[Double])]): Column =
    array(cents.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit(_)): _*).as("cv"))
    }: _*)

  /** IVF assignment: nearest centroid (by cosine, ties -> lower centroid id)
    * for every corpus vector — a narrow per-row argmax over the inlined
    * centroid array. NO join, NO shuffle, NO window: the corpus streams
    * through one codegen'd projection. This is the 100 TB path.
    */
  def assignToCentroids(corpus: DataFrame, cents: Seq[(Long, Array[Float])]): DataFrame =
    assignToCentroidsD(corpus, cents.map { case (id, v) => (id, v.map(_.toDouble)) })

  def assignToCentroidsD(corpus: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val scored = transform(centroidArrayD(cents), c =>
      struct(cosine(c.getField("cv"), col("embedding")).as("ccos"),
        (-c.getField("cid")).as("neg_cid")))
    // lexicographic struct max: highest cosine, then lowest centroid id
    val best = array_max(scored)
    corpus.withColumn("ccos", best.getField("ccos"))
      .withColumn("centroid_id", -best.getField("neg_cid"))
  }

  /** IVF-probed approximate top-k: queries probe their `nprobe` nearest
    * clusters and rank only those clusters' members by exact cosine.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val cents = centroids.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val assigned = assignToCentroids(corpus, cents)
    val c = broadcast(centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").as("c_emb")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("centroid_id").asc)
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(c)
      .withColumn("pcos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("centroid_id"))
    val cands = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cos")
  }

  /** Random-hyperplane LSH signature: bit i = (dot(emb, plane_i) >= 0),
    * rendered as a bit string. With planes drawn from the corpus itself the
    * signature is fully deterministic and reproducible by an external engine.
    */
  def rhpSignature(emb: Column, planes: Seq[Array[Float]]): Column =
    concat(planes.map { p =>
      val pl = array(p.map(x => lit(x.toDouble)): _*)
      // the composed fold, NOT the native dot: A/B'd both ways in r18 —
      // in this 16-planes-per-row signature regime the HOF fold measured
      // ~10% faster end-to-end (ann_rhp_topk 1.12 vs 1.24 s,
      // emb_dedup_clusters 1.91 vs 2.08 s), the opposite of every other
      // dot call site. Same IEEE tree either way, so swapping is free if
      // a future profile disagrees.
      when(aggregate(zip_with(emb, pl,
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x) >= 0.0, "1").otherwise("0")
    }: _*)

  /** Shared banding step of both LSH paths (top-k and near-dup): signature
    * as a pure projection, then (id, band, key) rows — the only thing that
    * rides the collision shuffle.
    */
  private def explodedBands(df: DataFrame, outId: String,
                            planes: Seq[Array[Float]], bandBits: Int): DataFrame = {
    val nBands = planes.size / bandBits
    val bandArr = array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        substring(col("sig"), b * bandBits + 1, bandBits).as("key"))): _*)
    df.withColumn("sig", rhpSignature(col("embedding"), planes))
      .select(col("vec_id").as(outId), explode(bandArr).as("bk"))
      .select(col(outId), col("bk.band"), col("bk.key"))
  }

  /** Random-hyperplane LSH approximate top-k — the second scale path next to
    * IVF: corpus and queries get `planes.size`-bit signatures (a pure per-row
    * projection, no shuffle), candidates are pairs sharing any
    * `bandBits`-bit signature band, and only candidates are exactly reranked.
    * The band join shuffles (id, band key) rows; embeddings re-attach to the
    * deduped candidate ids afterwards, so vectors never ride the collision
    * shuffle.
    */
  def rhpTopK(corpus: DataFrame, planes: Seq[Array[Float]], queries: DataFrame,
              k: Int, bandBits: Int = 4): DataFrame = {
    val cBands = explodedBands(corpus, "vec_id", planes, bandBits)
    val qBands = explodedBands(queries, "query_id", planes, bandBits)
    val candIds = cBands.join(broadcast(qBands), Seq("band", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val cands = candIds
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(q, Seq("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cos")
  }

  /** K-means over the embedding corpus (cosine assignment, Lloyd updates),
    * `iters` fixed iterations from a deterministic seed — the clustering
    * half of SemDeDup-style semantic curation, and the trainer for the IVF
    * index [[ivfTopK]] probes.
    *
    * Determinism discipline (the oracle recomputes every iteration
    * independently): centroid means use exact DECIMAL sums — order-free, so
    * Spark's reduction order cannot perturb them — divided once in double
    * and rounded to 4, which absorbs any sub-ulp cast residue; the cosine
    * itself is the sequential-fold [[cosine]] both engines reproduce bit
    * for bit. Seeds are the k lowest vec_ids (a fixed sample, as a
    * production seeded-rng init would be). Empty clusters keep their
    * centroid.
    *
    * Scale shape per iteration: assignment is a narrow per-row argmax over
    * the inlined centroid array (no join/shuffle — the
    * [[assignToCentroidsD]] path); the update is one (centroid, dim)
    * aggregation with map-side partials whose result is k*dim rows —
    * O(config), collected like a broadcast-variable refresh, never
    * O(data). Lloyd's is inherently iterative; k*dim driver rows per round
    * is the minimum coordination any implementation pays.
    */
  def kMeans(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    assignToCentroidsD(corpus, kMeansCentroids(corpus, k, iters))
      .select(col("vec_id"), col("centroid_id").as("cluster_id"),
        round(col("ccos"), 6).as("cos_to_centroid"))

  /** The Lloyd loop itself, exposed so downstream operators ([[semDeDup]],
    * an IVF build) can reuse the trained centroids without re-joining the
    * assignment frame back to the corpus.
    */
  def kMeansCentroids(corpus: DataFrame, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    import org.apache.spark.sql.types.DecimalType
    // seeds = the k LOWEST vec_ids (as documented) — not `vec_id < k`,
    // which silently under-seeds any corpus whose ids aren't dense from 0.
    // For dense 0-based ids (the testdata, and the oracle's `vec_id < k`
    // seed CTE) the two definitions coincide.
    var cents: Seq[(Long, Array[Double])] = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toSeq
    require(cents.nonEmpty, "empty corpus: no seed vectors")
    for (_ <- 1 to iters) {
      val means = assignToCentroidsD(corpus, cents)
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("centroid_id", "i")
        .agg(sum(col("x").cast(DecimalType(27, 9))).as("sx"), count(lit(1)).as("n"))
        .select(col("centroid_id"), col("i"),
          round(col("sx").cast("double") / col("n"), 4).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the corpus, then inside each cluster
    * drop every vector DOMINATED by a higher-priority near-duplicate
    * (cosine >= threshold), where priority = least similar to the centroid
    * first (the paper's diversity rule), ties to the lower vec_id. The rule
    * is strictly per-pair — the dominating vector may itself be dropped by
    * a third (a dup-chain c>a>b with cos(c,b) < threshold keeps only c,
    * where the paper's greedy scan would also keep b) — which is what makes
    * membership recomputable row-locally by an external oracle, no
    * transitive closure or sequential scan.
    *
    * Scale shape: assignment is the inlined-centroid per-row argmax (no
    * shuffle); the only shuffle is the cluster-keyed self-join. Within-block
    * pairs are quadratic in block size N/k — k is the scale knob (the paper
    * runs k ~ sqrt(N); keep k growing with the corpus so blocks stay
    * bounded), and `maxBlockSize` hard-caps degenerate clusters the same way
    * the LSH band caps do (oversized clusters pass through undeduped rather
    * than detonating the join).
    */
  def semDeDup(corpus: DataFrame, k: Int, iters: Int, threshold: Double,
               maxBlockSize: Option[Int] = None): DataFrame = {
    val cents = kMeansCentroids(corpus, k, iters)
    val assigned = assignToCentroidsD(corpus, cents)
      .select(col("vec_id"), col("embedding"),
        col("centroid_id").as("cluster_id"),
        round(col("ccos"), 6).as("cos_to_centroid"))
    val blocked = maxBlockSize match {
      case Some(cap) =>
        val keep = assigned.groupBy("cluster_id")
          .agg(count(lit(1)).as("_bs")).filter(col("_bs") <= cap)
        assigned.join(keep.select("cluster_id"), Seq("cluster_id"), "left_semi")
      case None => assigned
    }
    val a = blocked.select(col("cluster_id"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("cos_to_centroid").as("cc_a"))
    val b = blocked.select(col("cluster_id"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("cos_to_centroid").as("cc_b"))
    val dropped = a.join(b, Seq("cluster_id"))
      .filter(col("cc_a") < col("cc_b") ||
        (col("cc_a") === col("cc_b") && col("vec_a") < col("vec_b")))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select("vec_id", "cluster_id", "cos_to_centroid")
  }

  /** Product-quantization codes (spherical variant — cosine assignment,
    * consistent with [[kMeans]]): the embedding splits into `m` contiguous
    * subspaces of dim/m; each subspace trains its own k-means codebook
    * ([[kMeansCentroids]] on the slice) and every vector's code is its
    * per-subspace nearest-centroid id. This is the compression that makes
    * billion-vector ANN indexes fit in memory: dim*4 bytes per vector
    * become m codes (1 byte each at k<=256), reconstructable from the m
    * codebooks (Jégou et al. 2011, "Product Quantization for Nearest
    * Neighbor Search").
    *
    * Scale shape: codebook training is m small driver-coordinated Lloyd
    * loops (k*subdim rows each — O(config)); code assignment is ONE
    * projection pass over the corpus with all m inlined codebooks — no
    * join, no shuffle, no window.
    */
  def pqCodes(corpus: DataFrame, m: Int, dim: Int, k: Int, iters: Int): DataFrame =
    pqCodesFor(corpus, pqCodebooks(corpus, m, dim, k, iters), dim)

  /** Code assignment for trained codebooks — ONE definition shared by the
    * index build ([[pqCodes]]) and the search ([[pqTopK]]) so the two can
    * never drift on what a code means.
    */
  private def pqCodesFor(corpus: DataFrame, cbs: Seq[Seq[(Long, Array[Double])]],
                         dim: Int): DataFrame = {
    val sub = dim / cbs.size
    val codeCols = cbs.indices.map { j =>
      pqCodeExpr(cbs(j), slice(col("embedding"), j * sub + 1, sub)).as(s"code$j")
    }
    corpus.select(col("vec_id") +: codeCols: _*)
  }

  /** The m per-subspace codebooks, trained JOINTLY: one corpus pass per
    * Lloyd iteration assigns all m subspaces (m inlined-codebook argmax
    * expressions) and one (subspace, centroid, dim) aggregation updates
    * every codebook — m times fewer corpus scans than training each
    * subspace separately, the number that matters when the corpus is the
    * cost. Numerically identical to per-subspace training: decimal sums
    * are order-free and the per-cell arithmetic is unchanged, so the
    * per-subspace oracle CTEs verify this implementation bit for bit.
    */
  def pqCodebooks(corpus: DataFrame, m: Int, dim: Int, k: Int,
                  iters: Int): Seq[Seq[(Long, Array[Double])]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    import org.apache.spark.sql.types.DecimalType
    val sub = dim / m
    val seedRows = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(k).collect()
    require(seedRows.nonEmpty, "empty corpus: no seed vectors")
    var cbs: Seq[Seq[(Long, Array[Double])]] = (0 until m).map { j =>
      seedRows.map { r =>
        (r.getLong(0),
          r.getSeq[Float](1).slice(j * sub, (j + 1) * sub).map(_.toDouble).toArray)
      }.sortBy(_._1).toSeq
    }
    for (_ <- 1 to iters) {
      val assignCols = (0 until m).map { j =>
        pqCodeExpr(cbs(j), slice(col("embedding"), j * sub + 1, sub)).as(s"_c$j")
      }
      val assigned = corpus.select(col("embedding") +: assignCols: _*)
      val cidOfDim = element_at(
        array((0 until m).map(j => col(s"_c$j")): _*), (col("i") / sub).cast("int") + 1)
      val means = assigned
        .select(posexplode(col("embedding")).as(Seq("i", "x")) +:
          (0 until m).map(j => col(s"_c$j")): _*)
        .select((col("i") / sub).cast("int").as("j"), cidOfDim.as("cid"),
          (col("i") % sub).as("di"), col("x"))
        .groupBy("j", "cid", "di")
        .agg(sum(col("x").cast(DecimalType(27, 9))).as("sx"), count(lit(1)).as("n"))
        .select(col("j"), col("cid"), col("di"),
          round(col("sx").cast("double") / col("n"), 4).as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case ((j, cid), rows) =>
          (j, cid) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
      cbs = cbs.zipWithIndex.map { case (cb, j) =>
        cb.map { case (cid, old) => (cid, means.getOrElse((j, cid), old)) }
      }
    }
    cbs
  }

  /** Nearest-codebook-entry id for one subspace slice (shared by code
    * assignment and ADC search).
    */
  private def pqCodeExpr(cents: Seq[(Long, Array[Double])], sl: Column): Column = {
    val scored = transform(centroidArrayD(cents), c =>
      struct(cosine(c.getField("cv"), sl).as("ccos"),
        (-c.getField("cid")).as("neg_cid")))
    -array_max(scored).getField("neg_cid")
  }

  /** PQ-ADC approximate top-k: queries score against the CODES table
    * through codebook reconstructions — the original corpus vectors are
    * never touched at search time, which is the whole point of a PQ index
    * (the asymmetric distance computation of Jégou et al. 2011, here in
    * its cosine form: dot(q, recon) decomposes into per-subspace dots
    * against the coded centroid; |recon|² into per-subspace centroid
    * norms). Scale shape: the codes frame (m small ints per vector) cross
    * joins the broadcast query set in one projection — per row it is an
    * O(m) codebook lookup + O(dim) fold, no shuffle of anything
    * vector-sized.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, m: Int, dim: Int,
             k: Int, iters: Int, topK: Int): DataFrame = {
    val cbs = pqCodebooks(corpus, m, dim, k, iters)
    val sub = dim / m
    val codes = pqCodesFor(corpus, cbs, dim)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    def cvOf(j: Int): Column =
      element_at(filter(centroidArrayD(cbs(j)),
        c => c.getField("cid") === col(s"code$j")), 1).getField("cv")
    val dots = (0 until m).map(j =>
      dot(slice(col("q_emb"), j * sub + 1, sub), cvOf(j))).reduce(_ + _)
    val reconNorm = sqrt((0 until m).map(j => dot(cvOf(j), cvOf(j))).reduce(_ + _))
    val scored = codes.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dots / (norm(col("q_emb")) * reconNorm))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "vec_id", "rank", "cos")
  }

  /** L2-normalize an embedding (unit vector, double precision) — the
    * standard pre-step that turns cosine search into dot-product search.
    * Zero vectors pass through as zeros (no ANSI divide-by-zero).
    */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, _ => lit(0.0)))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Symmetric int8 quantization of a unit vector: floor(x*127 + 0.5)
    * (identical literal arithmetic in the oracle; `round` differs between
    * engines at exact .5 boundaries, floor(+0.5) does not).
    */
  def quantizeInt8(a: Column): Column =
    transform(a, x => floor(x.cast("double") * lit(127.0) + lit(0.5)).cast("int"))

  /** Label-free near-duplicate pairs via RHP-LSH blocking: pairs sharing any
    * signature band are exactly verified by cosine. No labels, no clustering
    * pre-pass — the blocking structure comes from the data itself, which is
    * the realistic unsupervised setting at corpus scale. Recall covers any
    * pair differing in fewer than `nBands` sign bits (pigeonhole); precision
    * is exact (candidates are verified). One-shot convenience that leaves
    * the banded signatures pinned; long-lived sessions should use
    * [[nearDupPairsLshWithCleanup]] and release them (same contract as the
    * [[Dedup]] one-shots).
    */
  def nearDupPairsLsh(corpus: DataFrame, planes: Seq[Array[Float]],
                      threshold: Double, bandBits: Int = 4,
                      maxBandDf: Option[Int] = None): DataFrame =
    nearDupPairsLshWithCleanup(corpus, planes, threshold, bandBits, maxBandDf)._1

  def nearDupPairsLshWithCleanup(corpus: DataFrame, planes: Seq[Array[Float]],
                                 threshold: Double, bandBits: Int = 4,
                                 maxBandDf: Option[Int] = None)
      : (DataFrame, () => Unit) = {
    // pinned: the band-frequency pass (capBands) and BOTH self-join sides
    // read this frame — persisting evaluates the full-corpus signature
    // projection once, not three times (same discipline as the Dedup paths)
    val exploded = explodedBands(corpus, "vec_id", planes, bandBits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hot-band guard (same shape as Dedup.capBands): a degenerate band key
    // (e.g. every near-zero vector signing identically) would otherwise make
    // the collision self-join quadratic in that key's member count
    val bands = Dedup.capBands(exploded, "vec_id", maxBandDf)
    // ids-only collision join + pair dedup; embeddings re-attach after
    val candIds = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val e = corpus.select(col("vec_id"), col("embedding"))
    val out = candIds
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
    (out, () => { exploded.unpersist(); () })
  }

  /** Embedding-cosine near-duplicate pairs with blocking: only pairs inside
    * the same block (here: a cluster/label id) are compared.
    *
    * Scale caveat: with a FIXED label set, block size grows linearly with
    * the corpus and within-block pairs quadratically — label blocking is the
    * bounded-block-only variant; [[nearDupPairsLsh]] is the unsupervised
    * scale path (block count grows with the data). `maxBlockSize` enforces
    * the bound: blocks larger than the cap are excluded from pair
    * generation (same drop-the-hot-key semantics as the LSH band caps).
    */
  def nearDupPairs(corpus: DataFrame, blockCol: String, threshold: Double,
                   maxBlockSize: Option[Int] = None): DataFrame = {
    val a = corpus.select(col(blockCol).as("blk"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val blocked = maxBlockSize match {
      case Some(cap) =>
        val keep = a.groupBy("blk").agg(count(lit(1)).as("_bs")).filter(col("_bs") <= cap)
        a.join(keep.select("blk"), Seq("blk"), "left_semi")
      case None => a
    }
    val b = corpus.select(col(blockCol).as("blk"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    blocked.join(b, Seq("blk")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }
}
