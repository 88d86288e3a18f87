package graft.spark

import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Planning-time equi-height histograms ([[GraftScan.equiHeightBins]]):
  * synthesized from per-file zone-map stats — no ANALYZE pass, no sample
  * job — reported through DSv2 `columnStats().histogram()`, and consumed
  * by the CBO's range-selectivity estimation. The point: across-file
  * skew (the signal a key-clustered layout records for free) survives
  * into the optimizer, where min/max-uniform estimation loses it.
  */
class HistogramStatsSpec extends SparkSpec {
  import spark.implicits._

  test("equiHeightBins: uniform, skewed, point masses, degenerate inputs") {
    // one uniform file: bins split [0, 100] evenly
    val Some((h1, b1)) = GraftScan.equiHeightBins(Seq((0.0, 100.0, 1000L)), 4)
    assert(h1 === 250.0)
    assert(b1.map(_._2) === Seq(25.0, 50.0, 75.0, 100.0))
    assert(b1.head._1 === 0.0)

    // skew: 900 rows in [0, 9], 100 rows in [1000, 1010] — 9 of 10 cuts
    // land inside the dense block
    val Some((h2, b2)) = GraftScan.equiHeightBins(
      Seq((0.0, 9.0, 900L), (1000.0, 1010.0, 100L)), 10)
    assert(h2 === 100.0)
    assert(b2.count(_._2 <= 9.0) === 9, s"bins=$b2")
    assert(b2.last._2 === 1010.0)

    // a point mass straddling several targets: zero-width bins at it
    val Some((_, b3)) = GraftScan.equiHeightBins(
      Seq((5.0, 5.0, 900L), (0.0, 10.0, 100L)), 10)
    assert(b3.count(b => b._1 == 5.0 && b._2 == 5.0) >= 7, s"bins=$b3")

    // bins are contiguous and monotone for any mix
    val Some((_, b4)) = GraftScan.equiHeightBins(
      Seq((0.0, 50.0, 10L), (40.0, 60.0, 500L), (55.0, 55.0, 200L),
        (90.0, 99.0, 30L)), 7)
    b4.sliding(2).foreach { case Seq(a, b) => assert(a._2 === b._1) }
    b4.foreach { case (lo, hi) => assert(lo <= hi) }

    // degenerate: no rows / no bins
    assert(GraftScan.equiHeightBins(Nil, 4).isEmpty)
    assert(GraftScan.equiHeightBins(Seq((0.0, 1.0, 0L)), 4).isEmpty)
    assert(GraftScan.equiHeightBins(Seq((0.0, 1.0, 5L)), 0).isEmpty)
  }

  test("histograms reach attributeStats and fix skewed range estimates") {
    val root = Files.createTempDirectory("histstats").toString
    val st = new ManifestStore(root, spark, "id")
    // 8000 dense keys [0, 8000) + 8000 sparse keys 1000x up-range. The
    // gate predicate is an OR (dense range OR one far key): a bare range
    // is DECIDED whole-file by the engine's own pushdown — the residual
    // Filter vanishes and both estimates are exact. The histogram earns
    // its keep on exactly the predicates file stats can't decide.
    val dense = (0L until 8000L).map(i => (i, i % 50L))
    val sparse = (0L until 8000L).map(i => (8000000L + i * 1000L, i % 50L))
    st.commit((dense ++ sparse).toDF("id", "grp"), batchId = 0, nFiles = 16,
      statsCols = Seq("grp"))
    val pred = col("id") < 8000L || col("id") === 15999000L
    val truth = 8001L

    def estimate(bins: String): (BigDecimal, Boolean) = {
      val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.graft.stats.histogramBins", bins)
      try {
        val plan = spark.read.format("graft").load(root)
          .filter(pred).queryExecution.optimizedPlan
        // histogram presence on the SCAN's stats (the Filter node above
        // it re-estimates its own attributeStats)
        val hasHist = plan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation => r
        }.exists(_.stats.attributeStats.toSeq.exists {
          case (a, cs) => a.name == "id" && cs.histogram.isDefined })
        (plan.stats.rowCount.map(BigDecimal(_)).getOrElse(BigDecimal(-1)),
          hasHist)
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", prevCbo)
        spark.conf.unset("spark.graft.stats.histogramBins")
      }
    }
    val (estHist, hasHist) = estimate("64")
    val (estUniform, hasUniformHist) = estimate("0")
    assert(hasHist, "histogram must land in the scan's column stat")
    assert(!hasUniformHist, "histogramBins=0 must disable synthesis")
    assert(estHist >= truth / 3 && estHist <= truth * 3,
      s"histogram estimate must sit near the true $truth, got $estHist")
    assert(estUniform >= 0 && estUniform < truth / 10,
      s"uniform estimate must show the skew blindness, got $estUniform")

    // answers are estimate-independent
    assert(spark.read.format("graft").load(root)
      .filter(pred).count() === truth)

    // junk conf values fall back to the default instead of throwing
    spark.conf.set("spark.graft.stats.histogramBins", "many")
    try assert(spark.read.format("graft").load(root)
      .filter(pred).count() === truth)
    finally spark.conf.unset("spark.graft.stats.histogramBins")
  }

  test("histogram estimate flips a real join decision") {
    val root = Files.createTempDirectory("histjoin").toString
    val st = new ManifestStore(root, spark, "id")
    val dense = (0L until 8000L).map(i => (i, i % 50L))
    val sparse = (0L until 8000L).map(i => (8000000L + i * 1000L, i % 50L))
    st.commit((dense ++ sparse).toDF("id", "grp"), batchId = 0, nFiles = 16,
      statsCols = Seq("grp"))
    val other = spark.range(0L, 50000L).toDF("id")
    val pred = col("id") < 8000L || col("id") === 15999000L
    def joinPlan(bins: String): String = {
      val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
      val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.graft.stats.histogramBins", bins)
      // a threshold BETWEEN the two estimates: ~9 filtered rows under
      // uniform estimation sit far below it, the true ~8001 far above
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
      try spark.read.format("graft").load(root).filter(pred)
        .join(other, "id").queryExecution.executedPlan.toString
      finally {
        spark.conf.set("spark.sql.cbo.enabled", prevCbo)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
        spark.conf.unset("spark.graft.stats.histogramBins")
      }
    }
    val without = joinPlan("0")
    assert(without.contains("BroadcastHashJoin"),
      s"uniform underestimation must (wrongly) broadcast the filtered " +
        s"side:\n$without")
    val withHist = joinPlan("64")
    assert(!withHist.contains("BroadcastHashJoin") &&
      withHist.contains("SortMergeJoin"),
      s"the histogram's near-truth estimate must flip the same join to " +
        s"sort-merge:\n$withHist")
  }

  test("per-bin NDV from KMV unions tracks a 100x multiplicity skew") {
    val root = Files.createTempDirectory("histndv").toString
    val st = new ManifestStore(root, spark, "id")
    // hot value range: 8000 rows over only 80 distinct v (each ~100x);
    // sparse tail: 8000 rows all-distinct v. The r14 even apportioning
    // gave every bin ndv = (80 + 8000) / 64 ~ 126 — ~50x over for hot
    // bins, 2x under for tail bins; the KMV-union estimate must track
    // both within 2x.
    val dense = (0L until 8000L).map(i => (i, i % 80L))
    val sparse = (0L until 8000L).map(i => (8000L + i, 100000L + i))
    st.commit((dense ++ sparse).toDF("id", "v"), batchId = 0, nFiles = 16,
      statsCols = Seq("v"))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
      val hist = stats.collectFirst {
        case (a, cs) if a.name == "v" && cs.histogram.isDefined =>
          cs.histogram.get
      }.getOrElse(fail("v must carry a histogram"))
      val h = hist.height // 16000 / 64 = 250 rows per bin
      // bins fully inside the hot value range [0, 80): true ndv ~ the
      // bin's integer span (~2.5) — the union-scaled estimate must sit
      // within 2x of it, nowhere near the even-apportioned ~126
      val hot = hist.bins.filter(_.hi <= 80.0)
      val tail = hist.bins.filter(_.lo >= 100000.0)
      assert(hot.length >= 8 && tail.length >= 8,
        s"fixture: both regimes need bins, got ${hot.length}/${tail.length}")
      hot.foreach { b =>
        val span = math.max(1.0, b.hi - b.lo + 1)
        assert(b.ndv <= math.ceil(2 * span).toLong,
          s"hot bin [${b.lo},${b.hi}] ndv=${b.ndv} must track ~$span, " +
            s"not the even-apportioned ${16080 / 64}")
      }
      // all-distinct tail: true ndv per bin = its mass (~250)
      tail.foreach { b =>
        assert(b.ndv >= (h / 2).toLong && b.ndv <= (h * 2).toLong,
          s"tail bin [${b.lo},${b.hi}] ndv=${b.ndv} must track ~$h")
      }
      // the skew itself is visible: tail bins hold >= 10x the hot bins'
      // distincts
      assert(tail.map(_.ndv).min >= 10 * hot.map(_.ndv).max,
        s"per-bin ndv must separate the regimes: " +
          s"hot max ${hot.map(_.ndv).max}, tail min ${tail.map(_.ndv).min}")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("1000-file wide-overlap layout: overlap clusters keep per-bin " +
    "NDV tracking a 10x skew (no even-apportion fallback)") {
    // the merge-grown, un-clustered shape: 500 files whose v-range each
    // spans the WHOLE hot domain (every hot bin overlaps all 500 — past
    // the r15 256-per-bin merge cap, where it fell back to even
    // apportioning and erased the skew), plus 500 key-local tail files.
    // The overlap-cluster estimator unions the 500 hull-sharing dense
    // files ONCE and sums the disjoint tail clusters per bin; estimates
    // must still separate the regimes.
    val root = Files.createTempDirectory("histcoarse").toString
    val st = new ManifestStore(root, spark, "id")
    // dense: 8000 rows, 80 distinct v, SCATTERED so every 16-row file
    // spans ~the full hot range; tail: 8000 all-distinct, key-local
    // stride 37 (coprime to 80, wraps ~7x per 16-row file) so each
    // key-local file's v-range spans ~the whole hot domain
    val dense = (0L until 8000L).map(i => (i, (i * 37L) % 80L))
    val sparse = (0L until 8000L).map(i => (8000L + i, 100000L + i))
    st.commit((dense ++ sparse).toDF("id", "v"), batchId = 0,
      nFiles = 1000, statsCols = Seq("v"))
    val m = st.currentManifest.get
    assert(m.files.size >= 900, s"fixture: want ~1000 files, got " +
      s"${m.files.size}")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
      val hist = stats.collectFirst {
        case (a, cs) if a.name == "v" && cs.histogram.isDefined =>
          cs.histogram.get
      }.getOrElse(fail("v must carry a histogram"))
      val h = hist.height
      val hot = hist.bins.filter(_.hi <= 80.0)
      val tail = hist.bins.filter(_.lo >= 100000.0)
      assert(hot.length >= 8 && tail.length >= 8,
        s"fixture: both regimes need bins, got ${hot.length}/${tail.length}")
      // fixture really exercises the wide-overlap regime: a hot bin
      // overlaps every wide dense file — past the r15 256-sketch
      // per-bin cap that used to force even apportioning
      val wideDense = m.files.count { f =>
        f.cols.get("v").exists { case (lo, hi) =>
          lo != null && hi != null && lo.toLong < 10L && hi.toLong > 70L }
      }
      assert(wideDense > 256,
        s"fixture: hot bins must overlap >256 files, got $wideDense")
      hot.foreach { b =>
        val span = math.max(1.0, b.hi - b.lo + 1)
        assert(b.ndv <= math.ceil(2 * span).toLong,
          s"hot bin [${b.lo},${b.hi}] ndv=${b.ndv} must track ~$span " +
            s"through the hull cluster, not even-apportioned " +
            s"${16080 / 64}")
      }
      tail.foreach { b =>
        assert(b.ndv >= (h / 2).toLong && b.ndv <= (h * 2).toLong,
          s"tail bin [${b.lo},${b.hi}] ndv=${b.ndv} must track ~$h")
      }
      assert(tail.map(_.ndv).min >= 10 * hot.map(_.ndv).max,
        s"per-bin ndv must separate the regimes at 1000 files: " +
          s"hot max ${hot.map(_.ndv).max}, tail min ${tail.map(_.ndv).min}")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("40%-overlap staircase: partial-overlap clusters double-count " +
    "only their shared sliver — bounded under 2x, never an erasure") {
    // ADVERSARIAL case for the >=half-hull join rule (the documented
    // frontier): equal-width hulls shifted by 0.6·W never join (pairwise
    // overlap 0.4·W < 0.5·W, and the chain check compares against the
    // file width as the narrower hull), yet each neighbor pair SHARES
    // the overlap's 400 distinct values — so per-bin sums count every
    // shared sliver once per side. The join threshold itself bounds the
    // staircase: a value can lie in at most ceil(1/0.6) = 2 hulls (any
    // shift below 0.5·W would join the hulls instead), so the
    // over-estimate is <= 2x BY CONSTRUCTION for equal-width chains;
    // measured here: 1.51x global (22408 counted of 14800 true — the
    // info() line re-measures it every run, the 2x assert pins the
    // bound). Weighting cluster contributions by overlap mass was the
    // fallback fix if this exceeded ~2x — it cannot, so the bounded
    // over-estimate is documented instead (an over-estimate makes CBO
    // UNDER-estimate equality selectivity benefit: conservative).
    val root = Files.createTempDirectory("histstair").toString
    val st = new ManifestStore(root, spark, "id")
    val n = 24; val w = 1000; val shift = 600
    // key-local layout: file i holds exactly v in [600i, 600i+999], all
    // distinct within the file; overlap values appear in BOTH neighbors
    val rows = (0L until (n * w).toLong).map { j =>
      (j, (j / w) * shift + (j % w))
    }
    st.commit(rows.toDF("id", "v"), batchId = 0, nFiles = n,
      statsCols = Seq("v"))
    val m = st.currentManifest.get
    assert(m.files.size == n, s"fixture: want $n files, got ${m.files.size}")
    // the staircase really is the non-joining shape (the range
    // partitioner's sampled boundaries jitter the exact cuts): every
    // hull is ~w wide and every adjacent pair overlaps by LESS than
    // half the narrower hull, so no two files cluster together
    val hulls = m.files.flatMap(_.cols.get("v")).map {
      case (lo, hi) => (lo.toLong, hi.toLong)
    }.sortBy(_._1)
    assert(hulls.forall { case (lo, hi) =>
      hi - lo + 1 >= w * 3 / 5 && hi - lo + 1 <= w * 6 / 5 },
      s"fixture: ~$w-wide staircase hulls expected, got $hulls")
    hulls.sliding(2).foreach {
      case Seq((lo1, hi1), (lo2, hi2)) =>
        val ov = math.max(0L, math.min(hi1, hi2) - math.max(lo1, lo2) + 1)
        val minW = math.min(hi1 - lo1 + 1, hi2 - lo2 + 1)
        assert(ov.toDouble / minW < 0.5,
          s"fixture: adjacent hulls must stay below the join threshold, " +
            s"got $ov/$minW for ($lo1,$hi1)-($lo2,$hi2)")
      case _ => ()
    }
    val trueNdv = shift.toLong * (n - 1) + w // 14800
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
      val hist = stats.collectFirst {
        case (a, cs) if a.name == "v" && cs.histogram.isDefined =>
          cs.histogram.get
      }.getOrElse(fail("v must carry a histogram"))
      val est = hist.bins.map(_.ndv).sum
      info(f"staircase measured: counted $est of $trueNdv true " +
        f"distincts (${est.toDouble / trueNdv}%.2fx)")
      assert(est <= 2L * trueNdv,
        s"staircase double-count must stay under the 2x construction " +
          s"bound: counted $est of $trueNdv true distincts")
      assert(est >= (trueNdv * 8) / 10,
        s"the sliver double-count must never become an ERASURE: " +
          s"counted $est of $trueNdv")
      // per-bin: an interior bin's true ndv is ~its integer span (all
      // values distinct, multiplicity 1-2); the estimate may double the
      // shared slivers but never runs away past the 2x bound (+KMV
      // slack)
      val interior = hist.bins.filter(b =>
        b.lo > w && b.hi < shift.toLong * (n - 1))
      assert(interior.length >= 8, s"fixture: want interior bins")
      interior.foreach { b =>
        val span = math.max(1.0, b.hi - b.lo + 1)
        assert(b.ndv <= math.ceil(2.5 * span).toLong,
          s"interior bin [${b.lo},${b.hi}] ndv=${b.ndv} must stay near " +
            s"its ~$span true distincts (2x sliver bound + KMV slack)")
      }
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("straddler file: overlap clusters keep tail bins honest where " +
    "union-hull scaling collapsed them") {
    // the shape the sf0.1 full-session oracle stress caught (r16): a
    // key-clustered commit whose file count doesn't align with the
    // hot/tail key boundary leaves ONE file whose v-hull spans BOTH
    // regimes ([0, ~10^6]). r15's single union-hull span scaling let
    // that straddler drag every tail bin it unioned with toward zero
    // (bin/10^6 hull fraction); clustering quarantines it — it unions
    // with the hot files it genuinely overlaps and contributes to a
    // tail bin only its own (negligible) hull share.
    val root = Files.createTempDirectory("histstrad").toString
    val st = new ManifestStore(root, spark, "id")
    val dense = (0L until 8000L).map(i => (i, i % 80L))
    val sparse = (0L until 8000L).map(i => (8000L + i, 1000000L + 8000L + i))
    // 7 files over a boundary at key 8000 -> one file must straddle
    st.commit((dense ++ sparse).toDF("id", "v"), batchId = 0, nFiles = 7,
      statsCols = Seq("v"))
    val m = st.currentManifest.get
    val straddlers = m.files.count(_.cols.get("v").exists { case (lo, hi) =>
      lo != null && hi != null && lo.toLong < 80L && hi.toLong > 1000000L
    })
    assert(straddlers >= 1,
      s"fixture: a file must straddle both regimes, got " +
        m.files.flatMap(_.cols.get("v")))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
      val hist = stats.collectFirst {
        case (a, cs) if a.name == "v" && cs.histogram.isDefined =>
          cs.histogram.get
      }.getOrElse(fail("v must carry a histogram"))
      val h = hist.height
      val hot = hist.bins.filter(_.hi <= 80.0)
      val tail = hist.bins.filter(_.lo >= 1000000.0)
      assert(hot.length >= 4 && tail.length >= 4,
        s"fixture: both regimes need bins, got ${hot.length}/${tail.length}")
      tail.foreach { b =>
        assert(b.ndv >= (h / 2).toLong && b.ndv <= (h * 2).toLong,
          s"tail bin [${b.lo},${b.hi}] ndv=${b.ndv} must track ~$h — " +
            s"the straddler must not collapse it")
      }
      hot.foreach { b =>
        val span = math.max(1.0, b.hi - b.lo + 1)
        assert(b.ndv <= math.ceil(2 * span).toLong,
          s"hot bin [${b.lo},${b.hi}] ndv=${b.ndv} must track ~$span")
      }
      assert(tail.map(_.ndv).min >= 10 * hot.map(_.ndv).max,
        s"regimes must separate through the straddler: " +
          s"hot max ${hot.map(_.ndv).max}, tail min ${tail.map(_.ndv).min}")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("histogram skips columns without full stats coverage; ndv bounded") {
    val root = Files.createTempDirectory("histcov").toString
    val st = new ManifestStore(root, spark, "id")
    // strings can't histogram (no exact numeric form); grp and the DATE
    // column can (ISO yyyy-MM-dd stats round-trip exactly to epoch days)
    st.commit((0L until 4000L).map(i => (i, i % 10L, s"s$i"))
      .toDF("id", "grp", "name")
      .withColumn("d", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 30L).cast("int")))
      .withColumn("dec", ((col("id") % 100L) + lit(0.5)).cast("decimal(10,2)")),
      batchId = 0, nFiles = 4, statsCols = Seq("grp", "name", "d", "dec"))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
      val byName = stats.map { case (a, cs) => a.name -> cs }.toMap
      assert(byName("id").histogram.isDefined)
      assert(byName("grp").histogram.isDefined)
      // the refusal is a MEASURED crash guard, not a discipline choice:
      // with a histogram present, FilterEstimation.evaluateEquality calls
      // computeEqualityPossibilityByHistogram -> EstimationUtils.toDouble,
      // which has no StringType case — a string equality under CBO threw
      // `MatchError: StringType` at planning when this was tried (r15)
      assert(byName.get("name").forall(_.histogram.isEmpty),
        "string columns must not synthesize histograms")
      // DATE min/max land as exact epoch days, with a histogram
      val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay.toInt
      assert(byName("d").min.contains(d0) &&
        byName("d").max.contains(d0 + 29),
        s"date min/max=${(byName("d").min, byName("d").max)}")
      assert(byName("d").histogram.isDefined)
      // DECIMAL min/max land as exact catalyst Decimals, with a histogram
      import org.apache.spark.sql.types.Decimal
      assert(byName("dec").min.contains(Decimal("0.50")) &&
        byName("dec").max.contains(Decimal("99.50")),
        s"decimal min/max=${(byName("dec").min, byName("dec").max)}")
      assert(byName("dec").histogram.isDefined)
      // per-bin ndv never exceeds the bin mass and never hits zero
      val bins = byName("grp").histogram.get.bins
      val h = byName("grp").histogram.get.height
      assert(bins.forall(b => b.ndv >= 1 && b.ndv <= math.ceil(h).toLong))
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }
}
