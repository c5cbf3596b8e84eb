package graft.meta

import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the three-valued pushdown-filter evaluator: pruning
  * soundness must hold for arbitrary filter trees, not just the shapes the
  * example-based specs cover. */
class FilePruningPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genFile: Gen[FileSlice] = for {
    name <- Gen.alphaNumStr.map(_.take(12) + ".parquet")
    dir <- Gen.oneOf("a", "b", "c")
    size <- Gen.chooseNum(0L, 1L << 40)
    mtime <- Gen.chooseNum(0L, 2000000000000L)
  } yield FileSlice(s"file:/$dir/$name", name, size, mtime, Map.empty)

  private val genLeaf: Gen[Filter] = {
    val attrs = Gen.oneOf("filepath", "filename", "size", "mtime", "num_rows")
    Gen.oneOf(
      for { a <- attrs; v <- Gen.chooseNum(0L, 1L << 40) } yield EqualTo(a, v): Filter,
      for { a <- attrs; v <- Gen.chooseNum(0L, 1L << 40) } yield GreaterThan(a, v): Filter,
      for { a <- attrs; v <- Gen.chooseNum(0L, 1L << 40) } yield LessThanOrEqual(a, v): Filter,
      for { a <- attrs; p <- Gen.alphaNumStr.map(_.take(4)) } yield StringStartsWith(a, p): Filter,
      attrs.map(IsNotNull(_): Filter),
      attrs.map(IsNull(_): Filter))
  }

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.lzy(for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield And(l, r): Filter),
      1 -> Gen.lzy(for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield Or(l, r): Filter),
      1 -> Gen.lzy(genFilter(depth - 1).map(Not(_): Filter)))

  private val genF: Gen[Filter] = genFilter(3)

  test("Not is an involution and respects three-valued logic") {
    check(Prop.forAll(genF, genFile) { (f, fs) =>
      FilePruning.eval(Not(f), fs) == FilePruning.eval(f, fs).map(!(_: Boolean)) &&
        FilePruning.eval(Not(Not(f)), fs) == FilePruning.eval(f, fs)
    })
  }

  test("And/Or are commutative") {
    check(Prop.forAll(genF, genF, genFile) { (l, r, fs) =>
      FilePruning.eval(And(l, r), fs) == FilePruning.eval(And(r, l), fs) &&
        FilePruning.eval(Or(l, r), fs) == FilePruning.eval(Or(r, l), fs)
    })
  }

  test("unknown attributes never decide a filter") {
    check(Prop.forAll(genFile) { fs =>
      FilePruning.eval(EqualTo("num_rows", 1L), fs).isEmpty &&
        FilePruning.eval(And(IsNotNull("filepath"), EqualTo("num_rows", 1L)), fs).isEmpty &&
        // but a definite false on one And side decides regardless of the unknown
        FilePruning.eval(
          And(EqualTo("filename", fs.name + "X"), EqualTo("num_rows", 1L)), fs).contains(false)
    })
  }

  test("keep() never drops a file any filter is unknown or true for") {
    check(Prop.forAll(genF, genFile) { (f, fs) =>
      val kept = FilePruning.keep(Seq(f), fs)
      FilePruning.eval(f, fs) match {
        case Some(false) => !kept
        case _ => kept
      }
    })
  }

  test("numeric comparisons agree with plain Long ordering") {
    check(Prop.forAll(Gen.chooseNum(0L, 1L << 41), genFile) { (v, fs) =>
      FilePruning.eval(GreaterThan("size", v), fs).contains(fs.size > v) &&
        FilePruning.eval(LessThanOrEqual("mtime", v), fs).contains(fs.mtime <= v) &&
        FilePruning.eval(In("size", Array(v, fs.size)), fs).contains(true)
    })
  }
}
