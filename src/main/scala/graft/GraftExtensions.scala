package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProductF}

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSimilarity], "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      info(classOf[DotProductF], "dot_f"),
      (args: Seq[Expression]) => DotProductF(args(0), args(1))))
  }
}
