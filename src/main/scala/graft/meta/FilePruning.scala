package graft.meta

import org.apache.spark.sql.sources._

/**
 * Conservative three-valued evaluation of pushed-down filters against the
 * per-file attributes known at planning time (`filepath`, `filename`,
 * `size`, `mtime`). Used to prune FILES on the driver before any executor
 * I/O: for a page-level scan over millions of files, a
 * `filepath like 'part-0001%'` predicate skips the footer read and page
 * walk of every non-matching file entirely.
 *
 * Pruning is best-effort and sound: a file is dropped only when a pushed
 * filter definitively evaluates to false for it (`Some(false)`); unknown
 * predicates (`None`) keep the file, and Spark still re-applies every
 * filter post-scan, so over-keeping can never change query results.
 */
object FilePruning {

  /** Columns evaluable per level: file-level scans expose all four file
    * attributes; deeper levels only carry `filepath`. */
  def evaluableAttrs(level: MetaLevel): Set[String] = level match {
    case MetaLevel.FsFile | MetaLevel.ParquetFile | MetaLevel.AnyFile |
        MetaLevel.DeltaSnapshot | MetaLevel.HudiTimeline =>
      Set("filepath", "filename", "size", "mtime")
    case _ => Set("filepath")
  }

  /** True if every attribute the filter references is evaluable. */
  def canEvaluate(f: Filter, attrs: Set[String]): Boolean =
    f.references.forall(attrs.contains)

  /** True if the file survives every pushed filter (keep on unknown). */
  def keep(filters: Seq[Filter], file: FileSlice): Boolean =
    filters.forall(f => !eval(f, file).contains(false))

  private def attr(name: String, f: FileSlice): Option[Any] = name match {
    case "filepath" => Some(f.path)
    case "filename" => Some(f.name)
    case "size" => Some(f.size)
    case "mtime" => Some(f.mtime)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Number) => Some(java.lang.Long.compare(x, y.longValue))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** Three-valued logic: Some(bool) when decidable, None when unknown. */
  def eval(filter: Filter, f: FileSlice): Option[Boolean] = filter match {
    case EqualTo(a, v) => attr(a, f).flatMap(x => cmp(x, v)).map(_ == 0)
    case EqualNullSafe(a, v) => attr(a, f).flatMap(x => cmp(x, v)).map(_ == 0)
    case GreaterThan(a, v) => attr(a, f).flatMap(x => cmp(x, v)).map(_ > 0)
    case GreaterThanOrEqual(a, v) => attr(a, f).flatMap(x => cmp(x, v)).map(_ >= 0)
    case LessThan(a, v) => attr(a, f).flatMap(x => cmp(x, v)).map(_ < 0)
    case LessThanOrEqual(a, v) => attr(a, f).flatMap(x => cmp(x, v)).map(_ <= 0)
    case In(a, vs) =>
      // SQL three-valued IN: a match is true; no match is only FALSE when
      // every element compared definitively (a null/incomparable element
      // makes a non-match UNKNOWN, so Not(In(...)) stays unclaimed-correct)
      attr(a, f).flatMap { x =>
        val cmps = vs.toSeq.map(v => if (v == null) None else cmp(x, v))
        if (cmps.exists(_.contains(0))) Some(true)
        else if (cmps.forall(_.isDefined)) Some(false)
        else None
      }
    case StringStartsWith(a, p) =>
      attr(a, f).collect { case s: String => s.startsWith(p) }
    case StringEndsWith(a, p) =>
      attr(a, f).collect { case s: String => s.endsWith(p) }
    case StringContains(a, p) =>
      attr(a, f).collect { case s: String => s.contains(p) }
    // filepath/filename/size/mtime are never null in a listing
    case IsNull(a) => attr(a, f).map(_ => false)
    case IsNotNull(a) => attr(a, f).map(_ => true)
    case And(l, r) => (eval(l, f), eval(r, f)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, f), eval(r, f)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(inner) => eval(inner, f).map(!_)
    case _ => None
  }
}
