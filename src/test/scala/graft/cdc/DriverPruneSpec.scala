package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Driver-side zone-map pruning (r16): `ManifestStore.prunedFiles` now
  * evaluates range / prefix / IN / Bloom containment directly over the
  * driver-held stat strings — no local Spark job — and falls back to the
  * legacy Column-expression path whenever any leaf's typed semantics
  * can't be guaranteed identical. The contract this spec pins:
  *
  *   1. KEPT-SET EQUALITY: across a grid of every supported op on every
  *      supported type (dotted struct leaves, nulls, NaN, truncated
  *      string stats, OR trees, Bloom-backed = / IN included), the
  *      driver path and the forced Spark-job path
  *      (`spark.graft.prune.driverEval=false`) keep EXACTLY the same
  *      files, in order.
  *   2. JOBLESSNESS: the whole supported grid runs ZERO Spark jobs under
  *      the driver path — the ~0.5 s per-plan constant is gone.
  *   3. Fallback soundness: unsupported value shapes (e.g. a String
  *      probe on a numeric column) quietly take the legacy path and the
  *      two modes still agree.
  */
class DriverPruneSpec extends SparkSpec {
  import spark.implicits._

  private val N = 800L

  /** Mixed-type fixture: disjoint key ranges per file, per-type stats
    * columns, nulls in `s`, NaN islands in `d`, scattered `meta.tag`
    * with its own Bloom sidecar, and a key Bloom.
    */
  private def mkTyped(truncate: Option[Int]): (String, ManifestStore) = {
    val root = Files.createTempDirectory("drvprune").toString
    ManifestStore.writeTableProps(root,
      Map("bloomfilter" -> "8192",
        "bloomfiltercols" -> "s,meta.tag,z,nt,dy") ++
        truncate.map(n => "stats.truncate" -> n.toString))
    val st = new ManifestStore(root, spark, "id")
    val base = (0L until N).map { i =>
      (i,
        if (i % 17 == 0) null else f"str-$i%03d",
        if (i % 97 == 0) Double.NaN else i / 7.0,
        (i % 50).toFloat / 4.0f,
        // NEGATIVE ZERO island: files 0-3 carry min == max == -0.0f —
        // Spark's own comparisons say -0.0 == 0.0, so `z >= 0.0f` must
        // KEEP these files (the pre-fix TotalOrdering dropped them)
        if (i < N / 2) -0.0f else 1.0f,
        (i % 1000).toInt,
        (i % 365).toInt,
        i * 3600L,
        i,
        i % 2 == 0,
        s"tag-${(i * 2654435761L) % 1000}",
        i % 5)
    }.toDF("id", "s", "d", "fl", "z", "i32", "dayoff", "secoff", "cents",
      "b", "tag", "n")
    val df = base.select(col("id"), col("s"), col("d"), col("fl"), col("z"),
      col("i32"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("dayoff")).as("dt"),
      timestamp_seconds(lit(1704067200L) + col("secoff")).as("ts"),
      timestamp_seconds(lit(1704067200L) + col("secoff"))
        .cast("timestamp_ntz").as("nt"),
      // EXTREME years: files 0-3 sit around year -0768, files 4-7 around
      // year +10000 — the renderings ("-0768-…", "+10000-…") a
      // hand-rolled ISO writer refused; Spark's own DateFormatter
      // renders and Bloom-probes them driver-side since r17
      date_add(lit(java.sql.Date.valueOf("1970-01-01")),
        when(col("id") < N / 2, lit(-1000000) + col("dayoff"))
          .otherwise(lit(2932897) + col("dayoff"))).as("dy"),
      (col("cents").cast("decimal(12,2)") / 100)
        .cast("decimal(10,2)").as("dec"),
      col("b"),
      struct(col("tag"), col("n").as("n")).as("meta"))
    st.commit(df, batchId = 0, nFiles = 8,
      statsCols = Seq("s", "d", "fl", "z", "i32", "dt", "ts", "nt", "dy",
        "dec", "b", "meta.tag", "meta.n"))
    (root, st)
  }

  private def grid: Seq[(String, Seq[(String, String, Any)])] = {
    def p(preds: (String, String, Any)*): Seq[(String, String, Any)] =
      preds.toSeq
    Seq(
      "key eq" -> p(("id", "=", 123L)),
      "key gt" -> p(("id", ">", 500L)),
      "key le" -> p(("id", "<=", 250L)),
      "key ne single" -> p(("id", "!=", 0L)),
      "key in small" -> p(("id", "in", Seq(3L, 450L, 799L, 9999L))),
      "string eq (bloomed)" -> p(("s", "=", "str-250")),
      "string eq absent" -> p(("s", "=", "zzz-nope")),
      "string prefix" -> p(("s", "startswith", "str-2")),
      "string in" -> p(("s", "in", Seq("str-010", "str-777", "nope"))),
      "string isnull" -> p(("s", "isnull", null)),
      "string notnull + range" ->
        p(("s", "notnull", null), ("id", "<", 400L)),
      "double gt" -> p(("d", ">", 50.0d)),
      "double eq" -> p(("d", "=", 14.0d)),
      "double le NaN (NaN greatest)" -> p(("d", "<=", Double.NaN)),
      "float eq" -> p(("fl", "=", 2.5f)),
      "float gt all" -> p(("fl", ">", 100.0f)),
      "int in" -> p(("i32", "in", Seq(5, 10, 700))),
      "int ge" -> p(("i32", ">=", 500)),
      "date eq (java.sql)" ->
        p(("dt", "=", java.sql.Date.valueOf("2024-03-01"))),
      "date lt (LocalDate)" ->
        p(("dt", "<", java.time.LocalDate.of(2024, 2, 1))),
      "ts gt (java.sql)" ->
        p(("ts", ">", java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-20T00:00:00Z")))),
      "ts le (Instant)" ->
        p(("ts", "<=", java.time.Instant.parse("2024-01-05T12:00:00Z"))),
      // timestamp_ntz: Spark's own parse/convert/format functions make
      // ranges AND Bloomed equality jobless — including the trimmed
      // fraction renderings (".123456" probes against whole-second
      // builds must MISS, identically in both modes)
      "ntz gt" -> p(("nt", ">", java.time.LocalDateTime
        .ofEpochSecond(1704067200L + 400L * 3600L, 0,
          java.time.ZoneOffset.UTC))),
      "ntz le" -> p(("nt", "<=", java.time.LocalDateTime
        .ofEpochSecond(1704067200L + 100L * 3600L, 0,
          java.time.ZoneOffset.UTC))),
      "ntz eq (bloomed)" -> p(("nt", "=", java.time.LocalDateTime
        .ofEpochSecond(1704067200L + 250L * 3600L, 0,
          java.time.ZoneOffset.UTC))),
      "ntz eq fractional absent (bloomed)" ->
        p(("nt", "=", java.time.LocalDateTime.ofEpochSecond(
          1704067200L + 250L * 3600L, 123456000,
          java.time.ZoneOffset.UTC))),
      // extreme-year dates: ranges AND Bloom probes through the exotic
      // sign/width renderings, kept-set-equal at zero jobs
      "extreme date eq (bloomed)" ->
        p(("dy", "=", java.time.LocalDate.ofEpochDay(-999850L))),
      "extreme date gt" ->
        p(("dy", ">", java.time.LocalDate.ofEpochDay(0L))),
      "extreme date in (bloomed)" ->
        p(("dy", "in", Seq(java.time.LocalDate.ofEpochDay(2932897L + 50L),
          java.time.LocalDate.ofEpochDay(12345L)))),
      "decimal eq" -> p(("dec", "=", new java.math.BigDecimal("1.23"))),
      "decimal lt" -> p(("dec", "<", new java.math.BigDecimal("4.00"))),
      // off-grid decimal probes: canonicalized onto the (10,2) grid so
      // both paths prune EXACTLY (`> 1.225` ≡ `> 1.22` over scale-2
      // values; the old Column-path HALF_UP cast would test `> 1.23`
      // and over-prune a file whose max is 1.23)
      "decimal gt off-grid" ->
        p(("dec", ">", new java.math.BigDecimal("1.225"))),
      "decimal ge off-grid" ->
        p(("dec", ">=", new java.math.BigDecimal("1.225"))),
      "decimal lt off-grid" ->
        p(("dec", "<", new java.math.BigDecimal("3.745"))),
      "decimal le off-grid" ->
        p(("dec", "<=", new java.math.BigDecimal("3.745"))),
      "decimal eq off-grid (no row can match)" ->
        p(("dec", "=", new java.math.BigDecimal("1.225"))),
      "decimal in mixed grid" ->
        p(("dec", "in", Seq(new java.math.BigDecimal("1.23"),
          new java.math.BigDecimal("1.225"),
          new java.math.BigDecimal("7.99")))),
      "decimal beyond max lt (keeps non-null)" ->
        p(("dec", "<", new java.math.BigDecimal("99999999999"))),
      "decimal beyond max gt (no row can match)" ->
        p(("dec", ">", new java.math.BigDecimal("99999999999"))),
      "decimal integral probe" -> p(("dec", "=", 3L)),
      // ±0.0: stats serialize -0.0 as "0.0", the driver ordering treats
      // the zeros as equal (Spark semantics), and Bloom probes render
      // the normalized form — all four ops agree across paths
      "float zero ge (+0 probe on -0 stats)" -> p(("z", ">=", 0.0f)),
      "float zero le (-0 probe)" -> p(("z", "<=", -0.0f)),
      "float zero eq (bloomed)" -> p(("z", "=", 0.0f)),
      "float zero eq neg (bloomed)" -> p(("z", "=", -0.0f)),
      "float zero in" -> p(("z", "in", Seq(-0.0f, 5.0f))),
      "bool eq" -> p(("b", "=", true)),
      "struct leaf eq (bloomed)" ->
        p(("meta.tag", "=", s"tag-${(123L * 2654435761L) % 1000}")),
      "struct leaf in" ->
        p(("meta.tag", "in",
          Seq(s"tag-${(5L * 2654435761L) % 1000}", "tag-absent"))),
      "struct leaf range" -> p(("meta.n", ">=", 3L)),
      "conjunction mixed" ->
        p(("id", ">", 100L), ("id", "<", 300L), ("b", "=", false),
          ("s", "notnull", null)),
      "or two ranges" ->
        p(("", "or", Seq(Seq(("id", "<", 100L)),
          Seq(("id", ">=", 700L))))),
      "or with bloom branch" ->
        p(("", "or", Seq(Seq(("id", "=", 42L)),
          Seq(("s", "=", "str-650"))))),
      "or nested" ->
        p(("", "or", Seq(
          Seq(("", "or", Seq(Seq(("id", "<", 50L)),
            Seq(("id", ">", 760L)))), ("b", "=", true)),
          Seq(("i32", "=", 400)))))
    )
  }

  private def keptNames(st: ManifestStore, m: ManifestStore.Manifest,
                        preds: Seq[(String, String, Any)],
                        driver: Boolean): Seq[String] = {
    spark.conf.set("spark.graft.prune.driverEval", driver.toString)
    try st.prunedFiles(m, preds).map(_.name)
    finally spark.conf.set("spark.graft.prune.driverEval", "true")
  }

  test("kept sets identical driver-vs-Spark across the typed grid; " +
    "the driver path runs ZERO Spark jobs") {
    val (_, st) = mkTyped(truncate = None)
    val m = st.currentManifest.get
    assert(m.files.size == 8)
    // warm the Bloom sidecar cache OUTSIDE the job gate (loads are pure
    // file I/O, no jobs — but keep the measurement clean anyway)
    ManifestStore.clearBloomCache()
    val jobs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val driverKept = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[String]]
    spark.sparkContext.addSparkListener(listener)
    try grid.foreach { case (name, preds) =>
      driverKept(name) = keptNames(st, m, preds, driver = true)
    } finally {
      Thread.sleep(500) // listener bus drains async
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() == 0,
      s"driver-side pruning must plan with ZERO Spark jobs, ran " +
        s"${jobs.get()} across the grid")
    grid.foreach { case (name, preds) =>
      val slow = keptNames(st, m, preds, driver = false)
      assert(driverKept(name) == slow,
        s"[$name] kept-set mismatch: driver=${driverKept(name)} " +
          s"spark=$slow")
    }
    // sanity: the grid actually prunes (not vacuously all-keep)
    assert(driverKept("key eq").size == 1)
    assert(driverKept("string eq absent").size <= 2) // bloom cut
    assert(driverKept("or two ranges").size < m.files.size)
    // ±0.0: the -0.0-statted files 0-3 are KEPT against a +0.0 probe
    // (all 8 survive `>= 0.0`), and only they survive `<= -0.0` / `= 0.0`
    assert(driverKept("float zero ge (+0 probe on -0 stats)").size == 8)
    assert(driverKept("float zero le (-0 probe)").size == 4)
    assert(driverKept("float zero eq (bloomed)").size == 4)
    assert(driverKept("float zero eq neg (bloomed)").size == 4)
    // off-grid decimals prune EXACTLY: `> 1.225` keeps the file whose
    // max is on-grid 1.23+ (7 of 8), an off-grid `=` keeps nothing, a
    // beyond-range `<` keeps everything, an integral probe lands on-grid
    assert(driverKept("decimal gt off-grid").size == 7)
    assert(driverKept("decimal lt off-grid").size == 4)
    assert(driverKept("decimal eq off-grid (no row can match)").isEmpty)
    assert(driverKept("decimal beyond max lt (keeps non-null)").size == 8)
    assert(driverKept("decimal beyond max gt (no row can match)").isEmpty)
    assert(driverKept("decimal integral probe").size == 1)
    // extreme-year date renderings really probe (not vacuous keeps)
    assert(driverKept("extreme date eq (bloomed)").size == 1)
    assert(driverKept("extreme date gt").size == 4)
    assert(driverKept("ntz eq fractional absent (bloomed)").size <= 1)
  }

  test("truncated string stats: both paths agree and stay sound") {
    val (root, st) = mkTyped(truncate = Some(6))
    val m = st.currentManifest.get
    val preds = Seq(
      Seq(("s", "=", "str-250"): (String, String, Any)),
      Seq(("s", "startswith", "str-7"): (String, String, Any)),
      Seq(("s", "<", "str-400"): (String, String, Any)),
      Seq(("s", "in", Seq("str-001", "str-799")): (String, String, Any)))
    preds.foreach { ps =>
      assert(keptNames(st, m, ps, driver = true) ==
        keptNames(st, m, ps, driver = false), s"mismatch on $ps")
    }
    // soundness through truncation: the hit row is still found
    assert(spark.read.format("graft").load(root)
      .filter(col("s") === "str-250").count() == 1)
  }

  test("unsupported value shapes fall back and still agree") {
    val (_, st) = mkTyped(truncate = None)
    val m = st.currentManifest.get
    // a String probe on the Long key: driver conversion refuses, the
    // legacy path computes — and both modes return the same set
    val odd: Seq[(String, String, Any)] = Seq(("id", "=", "123"))
    assert(keptNames(st, m, odd, driver = true) ==
      keptNames(st, m, odd, driver = false))
    // a raw Long probe on a TIMESTAMP column: the Column path evaluates
    // `lit(long).cast(timestamp)` as epoch SECONDS — the driver domain
    // REFUSES the Long (treating it as internal micros would disagree by
    // 10^6) and both modes compute the identical, Column-decided set
    val tsLong: Seq[(String, String, Any)] =
      Seq(("ts", ">", java.lang.Long.valueOf(1704067200L + 400L * 3600L)))
    assert(keptNames(st, m, tsLong, driver = true) ==
      keptNames(st, m, tsLong, driver = false))
    assert(keptNames(st, m, tsLong, driver = true).size == 4)
  }

  test("stats-answered aggregates fold driver-side: same answers as " +
    "the Spark fold, zero jobs") {
    import ManifestStore.StatAgg
    val (_, st) = mkTyped(truncate = None)
    val m = st.currentManifest.get
    val cases: Seq[(Seq[(String, String, Any)], Seq[ManifestStore.StatAgg])] =
      Seq(
        (Nil, Seq(StatAgg.CountStar, StatAgg.MinCol("id"),
          StatAgg.MaxCol("id"))),
        (Nil, Seq(StatAgg.MinCol("dt"), StatAgg.MaxCol("ts"),
          StatAgg.MinCol("dec"), StatAgg.MaxCol("fl"),
          StatAgg.MinCol("d"), StatAgg.MaxCol("i32"),
          StatAgg.MinCol("nt"), StatAgg.MaxCol("nt"))),
        (Nil, Seq(StatAgg.CountCol("s"), StatAgg.MinCol("s"),
          StatAgg.MaxCol("b"))),
        // exactness fallback parity: a predicate no file is pure under
        // must refuse in BOTH modes
        (Seq(("b", "=", true)), Seq(StatAgg.CountStar)),
        // a range predicate (file-aligned or not, both modes must agree)
        (Seq(("id", "<", 400L)), Seq(StatAgg.CountStar)),
        (Seq(("id", ">=", 100L), ("id", "<", 300L)),
          Seq(StatAgg.CountStar, StatAgg.CountCol("s"))))
    def run(driver: Boolean): Seq[Option[Seq[Any]]] = {
      spark.conf.set("spark.graft.prune.driverEval", driver.toString)
      try cases.map { case (preds, aggs) => st.aggFromStats(m, preds, aggs) }
      finally spark.conf.set("spark.graft.prune.driverEval", "true")
    }
    val jobs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fast = try run(driver = true)
    finally {
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() == 0,
      s"driver-side agg answers must run ZERO Spark jobs, ran ${jobs.get()}")
    val slow = run(driver = false)
    cases.indices.foreach { i =>
      assert(fast(i) == slow(i),
        s"case $i answer mismatch: driver=${fast(i)} spark=${slow(i)}")
    }
    // sanity: the unfiltered answers actually computed (not all-None)
    assert(fast(0).isDefined && fast(1).isDefined && fast(2).isDefined)
    assert(fast(0).get.head == 800L)
  }

  test("grouped stats-answered aggregates fold driver-side: same rows, " +
    "zero jobs") {
    import ManifestStore.StatAgg
    val root = Files.createTempDirectory("drvagg").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "part"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 800L).map { i =>
      (i, i / 200L,
        if (i % 17 == 0) null else f"str-$i%03d",
        i / 7.0, i * 3600L)
    }.toDF("id", "part", "s", "d", "secoff")
      .select(col("id"), col("part"), col("s"), col("d"),
        timestamp_seconds(lit(1704067200L) + col("secoff")).as("ts"))
    st.commit(df, batchId = 0, nFiles = 8,
      statsCols = Seq("part", "s", "d", "ts"))
    val m = st.currentManifest.get
    val aggs = Seq(StatAgg.CountStar, StatAgg.CountCol("s"),
      StatAgg.MinCol("d"), StatAgg.MaxCol("ts"), StatAgg.MinCol("s"))
    def run(driver: Boolean): Option[Set[Seq[Any]]] = {
      spark.conf.set("spark.graft.prune.driverEval", driver.toString)
      try st.aggFromStatsGrouped(m, Nil, Seq("part"), aggs)
        .map(_.map(_.toSeq).toSet)
      finally spark.conf.set("spark.graft.prune.driverEval", "true")
    }
    val jobs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fast = try run(driver = true)
    finally {
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() == 0,
      s"driver-side grouped answers must run ZERO Spark jobs, " +
        s"ran ${jobs.get()}")
    val slow = run(driver = false)
    assert(fast.isDefined, "partition-pure fixture must answer")
    assert(fast == slow, s"grouped mismatch: driver=$fast spark=$slow")
    assert(fast.get.size == 4) // part in 0..3
  }

  test("canonDecimalPreds rewrite table: grid-exact ops, constants, " +
    "pass-throughs") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("dec", DecimalType(10, 2)),
      StructField("s", StringType),
      StructField("d", DoubleType)))
    def canon(p: (String, String, Any)): (String, String, Any) =
      ManifestStore.canonDecimalPreds(schema, Seq(p)).head
    def bd(s: String) = new java.math.BigDecimal(s)
    // off-grid strict/non-strict: FLOOR for >/<=, CEILING for >=/<
    assert(canon(("dec", ">", bd("1.225"))) == (("dec", ">", bd("1.22"))))
    assert(canon(("dec", "<=", bd("1.225"))) == (("dec", "<=", bd("1.22"))))
    assert(canon(("dec", ">=", bd("1.225"))) == (("dec", ">=", bd("1.23"))))
    assert(canon(("dec", "<", bd("1.225"))) == (("dec", "<", bd("1.23"))))
    // on-grid values rescale only (scale 2), ops unchanged
    assert(canon(("dec", ">", bd("1.2"))) == (("dec", ">", bd("1.20"))))
    // equality off the grid can match nothing; != off the grid matches
    // every NON-null row
    assert(canon(("dec", "=", bd("1.225"))) == (("dec", "alwaysfalse", null)))
    assert(canon(("dec", "!=", bd("1.225"))) == (("dec", "notnull", null)))
    assert(canon(("dec", "=", bd("1.23"))) == (("dec", "=", bd("1.23"))))
    // beyond the type's range: constants by sign and op direction
    val huge = bd("99999999999"); val nhuge = bd("-99999999999")
    assert(canon(("dec", ">", huge)) == (("dec", "alwaysfalse", null)))
    assert(canon(("dec", ">=", huge)) == (("dec", "alwaysfalse", null)))
    assert(canon(("dec", "<", huge)) == (("dec", "notnull", null)))
    assert(canon(("dec", "<=", huge)) == (("dec", "notnull", null)))
    assert(canon(("dec", "<", nhuge)) == (("dec", "alwaysfalse", null)))
    assert(canon(("dec", ">", nhuge)) == (("dec", "notnull", null)))
    // integral probes land on the grid; IN lists keep only exact fits
    assert(canon(("dec", "=", java.lang.Long.valueOf(3L))) ==
      (("dec", "=", bd("3.00"))))
    assert(canon(("dec", "in", Seq(bd("1.23"), bd("1.225"), bd("7.99")))) ==
      (("dec", "in", Seq(bd("1.23"), bd("7.99")))))
    assert(canon(("dec", "in", Seq(bd("1.225")))) ==
      (("dec", "alwaysfalse", null)))
    // pass-throughs: non-decimal leaves, non-numeric probes (today's
    // fallback behavior), and OR trees rewrite inside branches only
    assert(canon(("s", ">", "x")) == (("s", ">", "x")))
    assert(canon(("dec", ">", java.lang.Double.valueOf(1.225))) ==
      (("dec", ">", java.lang.Double.valueOf(1.225))))
    val or = ("", "or", Seq(
      Seq(("dec", ">", bd("1.225")): (String, String, Any)),
      Seq(("s", "=", "x"): (String, String, Any))))
    assert(canon(or) == (("", "or", Seq(
      Seq(("dec", ">", bd("1.22")): (String, String, Any)),
      Seq(("s", "=", "x"): (String, String, Any))))))
  }

  test("oversized IN rides the shared phase-3 fold in both modes") {
    val (_, st) = mkTyped(truncate = None)
    val m = st.currentManifest.get
    val vs: Seq[Any] = (0L until 10050L).map(i => i * 2 + 1) // mostly absent
    val ps: Seq[(String, String, Any)] = Seq(("id", "in", vs))
    assert(keptNames(st, m, ps, driver = true) ==
      keptNames(st, m, ps, driver = false))
  }
}
