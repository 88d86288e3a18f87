package graft

import org.apache.spark.sql.functions._

/** Scale-up stress corpus generator: replicate the driver's sf0.1 tables
  * `copies`-fold into a scratch dir, with ids remapped to stay unique and
  * document text given a tiny per-copy suffix. Copies are therefore
  * NEAR-DUPLICATES of their originals — deliberately: mirrored/boilerplate
  * pages are exactly the regime a web-scale dedup pass faces, and the one
  * where an uncapped candidate join goes quadratic. Used by the per-round
  * stress pass (Verify + oracle at ~sf1) to confirm the band/prefix caps
  * actually bound the heavy joins at 10x bench scale.
  *
  * Everything is deterministic (pure column arithmetic on driver data, no
  * randomness), so the DuckDB oracle recomputes the same tables' answers
  * exactly.
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "mirror"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "boiler") {
      // hot-shingle skew WITHOUT scale-up: append one shared template
      // block to EVERY doc — the site-template/cookie-banner regime a web
      // corpus lives in. Those ~20 shingles get df = N, so the brute
      // inverted-index join generates ~20 * N^2/2 pair rows from the
      // template alone, while prefix filtering never admits them (max-df
      // shingles are in no doc's rarest-30% prefix)
      val boiler = " this website uses cookies to improve your experience" +
        " please accept our terms of service and privacy policy before" +
        " continuing to the requested page thank you for visiting"
      spark.read.parquet(s"$src/documents.parquet")
        .withColumn("text", concat(col("text"), lit(boiler)))
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"[stressgen] wrote boilerplate-skewed documents from $src to $out")
      spark.stop()
      return
    }

    if (mode == "webscale") {
      // copies x the corpus with per-copy CONTENT (every 3rd word tagged
      // with the copy id, so every 3-gram shingle differs across copies
      // and content df stays at its sf0.1 value) PLUS the shared template
      // block on all N*copies docs (df = N*copies). The regime that
      // separates the two exact-Jaccard plans: the brute inverted-index
      // join owes ~20 * (N*copies)^2 / 2 pair rows to the template alone,
      // while prefix filtering's candidate volume scales with CONTENT
      // similarity only.
      val boiler = " this website uses cookies to improve your experience" +
        " please accept our terms of service and privacy policy before" +
        " continuing to the requested page thank you for visiting"
      spark.read.parquet(s"$src/documents.parquet")
        .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("_c"))
        .withColumn("doc_id", col("doc_id") * copies + col("_c"))
        .withColumn("text", concat(
          array_join(transform(split(col("text"), " "),
            (w, i) => when(i % 3 === 0, concat(lit("c"), col("_c"), w))
              .otherwise(w)), " "),
          lit(boiler)))
        .withColumn("n_chars", length(col("text")))
        .drop("_c")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"[stressgen] wrote ${copies}x webscale (template-skewed) documents to $out")
      spark.stop()
      return
    }

    val dup = explode(sequence(lit(0), lit(copies - 1))).as("_c")

    spark.read.parquet(s"$src/documents.parquet")
      .select(col("*"), dup)
      .withColumn("doc_id", col("doc_id") * copies + col("_c"))
      // near-dup mirror: a short per-copy suffix shifts only the trailing
      // shingles, keeping copy-pairs above any high similarity threshold
      .withColumn("text", concat(col("text"), lit(" mirror"), col("_c")))
      .withColumn("n_chars", length(col("text")))
      .drop("_c")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("*"), dup)
      .withColumn("vec_id", col("vec_id") * copies + col("_c"))
      .drop("_c")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[stressgen] wrote ${copies}x documents+embeddings from $src to $out")
    spark.stop()
  }
}
