package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProductF, JaccardSorted}

/**
 * Session extensions for the graft engine: registers the native vector
 * expressions so they are usable from SQL and via
 * `functions.call_function(...)` in the DataFrame API.
 *
 * Install with:
 * {{{
 *   SparkSession.builder().config("spark.sql.extensions", "graft.GraftExtensions")
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  private def binary(name: String)(build: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    if (args.length != 2) {
      throw new IllegalArgumentException(
        s"Function $name requires exactly 2 arguments, got ${args.length}")
    }
    build(args(0), args(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSimilarity], "cosine_sim"),
      binary("cosine_sim")(CosineSimilarity)))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      info(classOf[DotProductF], "dot_f"),
      binary("dot_f")(DotProductF)))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sorted"),
      info(classOf[JaccardSorted], "jaccard_sorted"),
      binary("jaccard_sorted")(JaccardSorted)))
  }
}
