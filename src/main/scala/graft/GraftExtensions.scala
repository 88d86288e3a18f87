package graft

import graft.functions.{BloomBuild, BloomMaybeContains, BsonNormalize, CosineSimilarity, DotProduct, MisraGries}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's native expressions in the
  * FunctionRegistry, so they work from both the Column API
  * (`call_function("cosine_sim", ...)`) and plain SQL.
  *
  * Install via `spark.sql.extensions=graft.GraftExtensions`
  * (done by [[Verify.session]] and the test harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      children => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      children => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bson_normalize"),
      new ExpressionInfo(classOf[BsonNormalize].getName, "bson_normalize"),
      children => BsonNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      children => MisraGries(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuild].getName, "bloom_build"),
      children => BloomBuild(children(0), children(1), children(2))
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("bloom_maybe_contains"),
      new ExpressionInfo(classOf[BloomMaybeContains].getName, "bloom_maybe_contains"),
      children => BloomMaybeContains(children(0), children(1))))
  }
}
