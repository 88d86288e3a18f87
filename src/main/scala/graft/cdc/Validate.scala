package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine source↔target consistency validator: column-set diff, key-set
  * diff, and NaN/null-tolerant per-cell compare, as one long-format
  * DataFrame a user can run against any snapshot the engine maintains.
  *
  * ref: test/validate_cdc_data.py:130-188 (pandas implementation — key-set
  * diff, common-column cell compare with NaN==NaN tolerated, first
  * mismatched column reported per record) and the embeddable variant in
  * archive/streaming_from_kafka_to_minio_stable_v3.py:406-535. This
  * formulation is distributed: ONE full-outer join on the key, the
  * first-differing-column search as a per-row array expression — no
  * driver-side row loop, so it runs at snapshot scale.
  */
object Validate {

  /** Column-set diff (driver-side — O(#columns) metadata, not data). */
  final case class ColumnDiff(missingInTarget: Seq[String],
                              extraInTarget: Seq[String],
                              common: Seq[String])

  def columnDiff(source: DataFrame, target: DataFrame,
                 ignore: Set[String] = Set.empty): ColumnDiff = {
    val sc = source.columns.filterNot(ignore).toSeq
    val tc = target.columns.filterNot(ignore).toSeq
    ColumnDiff(sc.filterNot(tc.contains), tc.filterNot(sc.contains),
      sc.filter(tc.contains)) // common keeps SOURCE column order (ref parity)
  }

  /** Long-format diff, one row per discrepancy:
    *   - kind `missing`  — key present in source, absent in target;
    *   - kind `extra`    — key present in target, absent in source;
    *   - kind `mismatch` — key in both, with the FIRST differing common
    *     column (source column order, like the ref's per-record break) and
    *     both values rendered as strings;
    *   - kind `column_missing` / `column_extra` — schema-level drift rows
    *     (key and values null).
    *
    * Cell equality is null-safe and NaN-tolerant (`<=>`; Spark and the
    * DuckDB oracle both treat NaN as equal to NaN). Columns in `ignore`
    * (e.g. a load timestamp) are excluded everywhere.
    *
    * Output schema: (kind, <key>, col_name, source_val, target_val) — an
    * empty result means the tables are consistent.
    */
  def diff(source: DataFrame, target: DataFrame, key: String,
           ignore: Set[String] = Set.empty): DataFrame = {
    require(source.columns.contains(key) && target.columns.contains(key),
      s"key column '$key' must exist in both source and target")
    // reserved-name guard (same policy as SkewUtil's _salt): the diff output
    // and the join-side rename own these names; a colliding input column
    // would silently corrupt the comparison
    val reserved = Set("kind", "col_name", "source_val", "target_val")
    (source.columns ++ target.columns).filterNot(ignore).foreach { c =>
      require(!reserved.contains(c) && !c.startsWith("_t_"),
        s"Validate.diff reserves column name '$c' (kind/col_name/source_val/" +
          "target_val and the _t_ prefix); rename or add it to `ignore`")
    }
    val cd = columnDiff(source, target, ignore + key)
    val common = cd.common
    val s = source.select((key +: common).map(col): _*)
    val t = target.select((key +: common).map(col): _*)
      .toDF((s"_t_$key" +: common.map("_t_" + _)): _*)
    val joined = s.join(t, col(key) === col(s"_t_$key"), "full_outer")

    val sk = col(key)
    val tk = col(s"_t_$key")
    // per-row array of (differs, name, source, target); the first element
    // whose `differs` is set names the mismatch — one codegen'd projection.
    // With NO common columns (disjoint schemas) there is nothing to
    // mismatch, and an empty array() literal would be untyped anyway.
    val firstDiff =
      if (common.isEmpty)
        lit(null).cast("struct<differs:boolean,name:string,s:string,t:string>")
      else {
        val cells = array(common.map { c =>
          struct((!(col(c) <=> col(s"_t_$c"))).as("differs"),
            lit(c).as("name"),
            col(c).cast("string").as("s"),
            col(s"_t_$c").cast("string").as("t"))
        }: _*)
        // try_element_at: ANSI mode makes plain element_at throw on the
        // empty (all-equal) array; null simply means "no mismatch"
        try_element_at(filter(cells, _.getField("differs")), lit(1))
      }

    val rowKind = when(tk.isNull, "missing")
      .when(sk.isNull, "extra")
      .when(firstDiff.isNotNull, "mismatch")
    val rows = joined
      .withColumn("kind", rowKind)
      .filter(col("kind").isNotNull)
      .select(col("kind"),
        coalesce(sk, tk).as(key),
        when(col("kind") === "mismatch", firstDiff.getField("name")).as("col_name"),
        when(col("kind") === "mismatch", firstDiff.getField("s")).as("source_val"),
        when(col("kind") === "mismatch", firstDiff.getField("t")).as("target_val"))

    val spark = source.sparkSession
    import spark.implicits._
    val colRows = (cd.missingInTarget.map(("column_missing", _)) ++
      cd.extraInTarget.map(("column_extra", _)))
      .toDF("kind", "col_name")
      .select(col("kind"), lit(null).cast(rows.schema(key).dataType).as(key),
        col("col_name"), lit(null).cast("string").as("source_val"),
        lit(null).cast("string").as("target_val"))
    rows.unionByName(colRows)
  }

  /** Roll the long-format diff up to the ref's summary counts.
    * `is_consistent` mirrors [[diff]]'s contract exactly: true only when
    * the diff is EMPTY — schema drift counts as inconsistency too (a
    * dropped column loses every value in it).
    */
  def summary(diffRows: DataFrame): DataFrame = {
    // coalesce: sum over an empty (fully consistent) diff is null, not 0
    val counts = Seq("missing", "extra", "mismatch", "column_missing", "column_extra")
      .map(k => coalesce(sum(when(col("kind") === k, 1L).otherwise(0L)), lit(0L)).as(s"n_$k"))
    diffRows.agg(counts.head, counts.tail: _*)
      .withColumn("is_consistent",
        (col("n_missing") + col("n_extra") + col("n_mismatch") +
          col("n_column_missing") + col("n_column_extra")) === 0)
  }
}
