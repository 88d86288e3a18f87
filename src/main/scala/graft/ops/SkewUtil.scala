package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew mitigation for joins — the manual fallback when AQE's runtime
  * skew-join splitting can't apply (non-shuffle-join plans, or skew known
  * ahead of time).
  *
  * `saltedJoin` implements the classic replicate-and-salt scheme for a
  * large skewed fact joined to a smaller dimension:
  *   - fact rows get a random-but-deterministic salt in [0, salts)
  *     (hash of a tiebreaker column, so replays stay stable);
  *   - the dimension replicates `salts` times via a generator column;
  *   - the join key becomes (key, salt), splitting one hot key's row set
  *     across `salts` reducers instead of one.
  * Aggregations do NOT need this: Catalyst's partial aggregation already
  * combines map-side per partition before the shuffle.
  */
object SkewUtil {

  /** Inner-join `fact` to `dim` on `key`, spreading each fact key across
    * `salts` reducers. `tiebreaker` is any fact column with per-row variety
    * (an id); determinism of the salt makes checkpoint replays idempotent.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 tiebreaker: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // reserved-name guard (mirrors AsofJoin's _side check): withColumn would
    // silently overwrite a caller's _salt and drop it from the output
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedJoin reserves the column name '_salt'")
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(tiebreaker)), lit(salts)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-N heavy keys of a column — the scout pass that decides whether
    * salting (or a broadcast) is warranted. One partial-aggregated shuffle.
    */
  def heavyKeys(df: DataFrame, key: Column, topN: Int): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
}
