package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CharNgramsExpr, CosineSimilarity, DotProductF, JaccardSorted, L2Normalize, MinHashSig, SimHash64F, TopKByScore, WordNgramsF}
import graft.ops.Layout

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

  /** Second argument must be a foldable INT literal (e.g. the n-gram
    * width); constants are baked into the expression at resolution time. */
  private def withIntLit(name: String)(build: (Expression, Int) => Expression)
      : Seq[Expression] => Expression = { args =>
    if (args.length != 2) {
      throw new IllegalArgumentException(
        s"Function $name requires exactly 2 arguments, got ${args.length}")
    }
    args(1) match {
      case Literal(v: Int, IntegerType) => build(args(0), v)
      case other => throw new IllegalArgumentException(
        s"Function $name requires a literal INT second argument, got $other")
    }
  }

  private def unary(name: String)(build: Expression => Expression)
      : Seq[Expression] => Expression = { args =>
    if (args.length != 1) {
      throw new IllegalArgumentException(
        s"Function $name requires exactly 1 argument, got ${args.length}")
    }
    build(args(0))
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
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      info(classOf[CharNgramsExpr], "char_ngrams"),
      withIntLit("char_ngrams")(CharNgramsExpr)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig"),
      withIntLit("minhash_sig")(MinHashSig)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info(classOf[SimHash64F], "simhash64"),
      unary("simhash64")(SimHash64F)))
    ext.injectFunction((
      FunctionIdentifier("l2_normalize"),
      info(classOf[L2Normalize], "l2_normalize"),
      unary("l2_normalize")(L2Normalize)))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info(classOf[WordNgramsF], "word_ngrams"),
      withIntLit("word_ngrams")(WordNgramsF)))
    // composed BUILTIN trees (not custom expressions): the Column-level
    // helpers expand into pure builtin bit arithmetic, so the SQL surface
    // rebuilds the identical tree at catalyst level (Column->Expression
    // bridging mid-analysis would leave unresolved function nodes)
    def spreadExpr(e: Expression): Expression = {
      import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, ShiftLeft}
      import org.apache.spark.sql.types.LongType
      val masked = BitwiseAnd(Cast(e, LongType), Literal(0x7FFFFFFFL))
      Layout.steps.foldLeft(masked: Expression) { case (x, (s, m)) =>
        BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(s))), Literal(m))
      }
    }
    ext.injectFunction((
      FunctionIdentifier("zvalue2"),
      info(Layout.getClass, "zvalue2"),
      binary("zvalue2") { (a, b) =>
        import org.apache.spark.sql.catalyst.expressions.{BitwiseOr, ShiftLeft}
        BitwiseOr(spreadExpr(a), ShiftLeft(spreadExpr(b), Literal(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("hamming64"),
      info(graft.ops.Dedup.getClass, "hamming64"),
      binary("hamming64") { (a, b) =>
        import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor}
        BitwiseCount(BitwiseXor(a, b))
      }))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8"),
      info(classOf[graft.functions.QuantizeFixedPoint], "quantize_i8"),
      withIntLit("quantize_i8")(graft.functions.QuantizeFixedPoint)))
    ext.injectFunction((
      FunctionIdentifier("dot_i"),
      info(classOf[graft.functions.DotProductI], "dot_i"),
      binary("dot_i")(graft.functions.DotProductI)))
    ext.injectFunction((
      FunctionIdentifier("random_project"),
      info(classOf[graft.functions.RandomProject], "random_project"),
      withIntLit("random_project")(graft.functions.RandomProject)))
    ext.injectFunction((
      FunctionIdentifier("freq_sketch"),
      info(classOf[graft.functions.FreqSketch], "freq_sketch"),
      withIntLit("freq_sketch") { (item, cap) =>
        graft.functions.FreqSketch(item, cap)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_collision_micro"),
      info(classOf[graft.functions.CollisionScoreExpr], "char_collision_micro"),
      unary("char_collision_micro")(graft.functions.CollisionScoreExpr)))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      info(classOf[graft.functions.CdcChunksExpr], "cdc_chunks"),
      { args =>
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"Function cdc_chunks requires exactly 3 arguments, got ${args.length}")
        }
        (args(1), args(2)) match {
          case (Literal(w: Int, IntegerType), Literal(d: Int, IntegerType)) =>
            graft.functions.CdcChunksExpr(args(0), w, d)
          case other => throw new IllegalArgumentException(
            s"Function cdc_chunks requires literal INT window/divisor arguments, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("sbbf_hash"),
      info(classOf[graft.functions.SbbfHash], "sbbf_hash"),
      unary("sbbf_hash")(graft.functions.SbbfHash)))
    ext.injectFunction((
      FunctionIdentifier("sbbf_might_contain"),
      info(classOf[graft.functions.SbbfMightContain], "sbbf_might_contain"),
      binary("sbbf_might_contain")(graft.functions.SbbfMightContain)))
    ext.injectFunction((
      FunctionIdentifier("plain_dict_strings"),
      info(classOf[graft.functions.PlainDictStrings], "plain_dict_strings"),
      unary("plain_dict_strings")(graft.functions.PlainDictStrings)))
    ext.injectFunction((
      FunctionIdentifier("plain_int64_sum"),
      info(classOf[graft.functions.PlainInt64Sum], "plain_int64_sum"),
      unary("plain_int64_sum")(graft.functions.PlainInt64Sum)))
    ext.injectFunction((
      FunctionIdentifier("plain_int64_longs"),
      info(classOf[graft.functions.PlainInt64Longs], "plain_int64_longs"),
      unary("plain_int64_longs")(graft.functions.PlainInt64Longs)))
    ext.injectFunction((
      FunctionIdentifier("bytes_crc32"),
      info(classOf[graft.functions.BytesCrc32], "bytes_crc32"),
      unary("bytes_crc32")(graft.functions.BytesCrc32)))
    ext.injectFunction((
      FunctionIdentifier("iceberg_bucket"),
      info(classOf[graft.functions.IcebergBucketF], "iceberg_bucket"),
      withIntLit("iceberg_bucket")(graft.functions.IcebergBucketF)))
    ext.injectFunction((
      FunctionIdentifier("plain_stat_long"),
      info(classOf[graft.functions.PlainStatLong], "plain_stat_long"),
      binary("plain_stat_long")(graft.functions.PlainStatLong)))
    ext.injectFunction((
      FunctionIdentifier("plain_stat_double"),
      info(classOf[graft.functions.PlainStatDouble], "plain_stat_double"),
      binary("plain_stat_double")(graft.functions.PlainStatDouble)))
    ext.injectFunction((
      FunctionIdentifier("page_inflate"),
      info(classOf[graft.functions.PageInflate], "page_inflate"),
      { args =>
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"Function page_inflate requires exactly 3 arguments, got ${args.length}")
        }
        graft.functions.PageInflate(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bool_true_count"),
      info(classOf[graft.functions.BoolTrueCount], "bool_true_count"),
      { args =>
        if (args.length != 4) {
          throw new IllegalArgumentException(
            s"Function bool_true_count requires exactly 4 arguments, got ${args.length}")
        }
        graft.functions.BoolTrueCount(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("plain_fp_stats"),
      info(classOf[graft.functions.PlainFpStats], "plain_fp_stats"),
      { args =>
        if (args.length != 4) {
          throw new IllegalArgumentException(
            s"Function plain_fp_stats requires exactly 4 arguments, got ${args.length}")
        }
        graft.functions.PlainFpStats(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("bss_fp_stats"),
      info(classOf[graft.functions.BssFpStats], "bss_fp_stats"),
      { args =>
        if (args.length != 4) {
          throw new IllegalArgumentException(
            s"Function bss_fp_stats requires exactly 4 arguments, got ${args.length}")
        }
        graft.functions.BssFpStats(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("delta_strings"),
      info(classOf[graft.functions.DeltaStringsExpr], "delta_strings"),
      binary("delta_strings")(graft.functions.DeltaStringsExpr)))
    ext.injectFunction((
      FunctionIdentifier("delta_int_sum"),
      info(classOf[graft.functions.DeltaIntSum], "delta_int_sum"),
      binary("delta_int_sum")(graft.functions.DeltaIntSum)))
    ext.injectFunction((
      FunctionIdentifier("page_values_v2"),
      info(classOf[graft.functions.PageValuesV2], "page_values_v2"),
      { args =>
        if (args.length != 4) {
          throw new IllegalArgumentException(
            s"Function page_values_v2 requires exactly 4 arguments, got ${args.length}")
        }
        graft.functions.PageValuesV2(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("page_decode"),
      info(classOf[graft.functions.PageDecodeExpr], "page_decode"),
      { args =>
        if (args.length != 12) {
          throw new IllegalArgumentException(
            s"Function page_decode requires exactly 12 arguments, got ${args.length}")
        }
        graft.functions.PageDecodeExpr(args)
      }))
    ext.injectFunction((
      FunctionIdentifier("plain_int96_stats"),
      info(classOf[graft.functions.PlainInt96Stats], "plain_int96_stats"),
      { args =>
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"Function plain_int96_stats requires exactly 3 arguments, got ${args.length}")
        }
        graft.functions.PlainInt96Stats(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("plain_flba_sum"),
      info(classOf[graft.functions.PlainFlbaSum], "plain_flba_sum"),
      { args =>
        if (args.length != 4) {
          throw new IllegalArgumentException(
            s"Function plain_flba_sum requires exactly 4 arguments, got ${args.length}")
        }
        graft.functions.PlainFlbaSum(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("page_levels"),
      info(classOf[graft.functions.PageLevels], "page_levels"),
      { args =>
        if (args.length != 4) {
          throw new IllegalArgumentException(
            s"Function page_levels requires exactly 4 arguments, got ${args.length}")
        }
        graft.functions.PageLevels(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("page_levels_v2"),
      info(classOf[graft.functions.PageLevelsV2], "page_levels_v2"),
      { args =>
        if (args.length != 6) {
          throw new IllegalArgumentException(
            s"Function page_levels_v2 requires exactly 6 arguments, got ${args.length}")
        }
        graft.functions.PageLevelsV2(args(0), args(1), args(2), args(3),
          args(4), args(5))
      }))
    ext.injectFunction((
      FunctionIdentifier("dict_indexes"),
      info(classOf[graft.functions.DictIndexes], "dict_indexes"),
      { args =>
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"Function dict_indexes requires exactly 3 arguments, got ${args.length}")
        }
        graft.functions.DictIndexes(args(0), args(1), args(2))
      }))
    // aggregate: the analyzer wraps a returned AggregateFunction into an
    // AggregateExpression, so SQL `top_k_by_score(score, id, 5)` works in
    // GROUP BY queries like any builtin aggregate
    ext.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      info(classOf[TopKByScore], "top_k_by_score"),
      { args =>
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"Function top_k_by_score requires exactly 3 arguments, got ${args.length}")
        }
        args(2) match {
          case Literal(k: Int, IntegerType) => TopKByScore(args(0), args(1), k)
          case other => throw new IllegalArgumentException(
            s"Function top_k_by_score requires a literal INT third argument, got $other")
        }
      }))
  }
}
