package graft

/** Validation-error analogs of the reference's `TypeError` / `ValueError`
  * (mack/__init__.py:84-87, :156-160, :585 …). Message shapes mirror the
  * reference, including the Python-repr column lists its tests match on.
  */
class GraftTypeError(msg: String) extends RuntimeException(msg)
class GraftValueError(msg: String) extends RuntimeException(msg)

object errors {
  /** Python `repr(list_of_str)` formatting used in reference messages. */
  def pyRepr(cols: Seq[String]): String =
    cols.map(c => s"'$c'").mkString("[", ", ", "]")
}
