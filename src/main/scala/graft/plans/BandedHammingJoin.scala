package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive Hamming-distance join —
  *
  * {{{ a JOIN b ON bit_count(a.fp ^ b.fp) <= k [AND other preds] }}}
  *
  * — into the pigeonhole band join the hand-written near-dup operators
  * use ([[graft.text.SimHashDedup]]). Without the rewrite the condition
  * has no equality conjunct, so Spark can only plan a nested-loop /
  * cartesian join: O(n²) fingerprint comparisons, the plan that stops
  * scaling at exactly the corpus sizes where fingerprint dedup matters.
  * With it, both sides explode into `k+1` bit-chunks of the fingerprint
  * (any pair within Hamming distance k agrees on at least one chunk —
  * pigeonhole) and the join becomes an EQUI-join on (chunkIdx,
  * chunkValue), shuffled/hashed like any other, with the original
  * predicate kept as the exact post-filter.
  *
  * Duplicate elimination without changing multiplicities: a qualifying
  * pair can share several chunks, which would duplicate its output row.
  * Instead of a Distinct (which would ALSO collapse legitimate
  * duplicate input rows), the rewrite keeps exactly the copy whose
  * chunk index is the FIRST index at which the two fingerprints agree —
  * a row-local expression of both fingerprints (`firstEq(a.fp ^ b.fp)`)
  * — so per input-row-pair multiplicity is exactly 1× the original
  * join's, whatever the inputs contain. NULL fingerprints never match
  * (chunk equality is null-rejecting), same as the original predicate.
  *
  * Fires only when: the join is INNER; the condition has a
  * `bit_count(l ^ r) <= k` (or `<`, or the mirrored `>=`/`>`) conjunct
  * with one side's references entirely from each input; both sides are
  * LongType; `0 <= k <= 16` (beyond that the bands are too short to
  * select); and there is NO existing cross-side equality conjunct —
  * if there is, Spark already has an equi-join to hash on, and the
  * rewritten join's own (idx, val) equalities also make the rule
  * self-terminating on its output.
  */
object BandedHammingJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this distance the 64/(k+1)-bit bands stop being selective. */
  val MaxDist = 16

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEquality(conjuncts, j)) j
      else findHamming(conjuncts, j) match {
        case Some((lExpr, rExpr, k)) => rewrite(j, lExpr, rExpr, k)
        case None => j
      }
  }

  private def hasCrossEquality(conjuncts: Seq[Expression], j: Join): Boolean =
    conjuncts.exists {
      case EqualTo(x, y) => crossSides(x, y, j).isDefined
      case EqualNullSafe(x, y) => crossSides(x, y, j).isDefined
      case _ => false
    }

  /** Orient (x, y) as (leftSide, rightSide) if each references exactly
    * one distinct input.
    */
  private def crossSides(x: Expression, y: Expression,
                         j: Join): Option[(Expression, Expression)] = {
    def onLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    def onRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)
    if (onLeft(x) && onRight(y)) Some((x, y))
    else if (onLeft(y) && onRight(x)) Some((y, x))
    else None
  }

  private object DistLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  /** Extract (leftFp, rightFp, maxDist) from a hamming conjunct. */
  private def findHamming(conjuncts: Seq[Expression],
                          j: Join): Option[(Expression, Expression, Int)] = {
    def fromCount(bc: Expression, k: Int) = bc match {
      case BitwiseCount(BitwiseXor(a, b))
          if a.dataType == LongType && b.dataType == LongType =>
        crossSides(a, b, j).map { case (l, r) => (l, r, k) }
      case _ => None
    }
    conjuncts.iterator.map {
      case LessThanOrEqual(bc, DistLiteral(k)) => fromCount(bc, k)
      case LessThan(bc, DistLiteral(k)) => fromCount(bc, k - 1)
      case GreaterThanOrEqual(DistLiteral(k), bc) => fromCount(bc, k)
      case GreaterThan(DistLiteral(k), bc) => fromCount(bc, k - 1)
      case _ => None
    }.collectFirst {
      case Some((l, r, k)) if k >= 0 && k <= MaxDist => (l, r, k)
    }
  }

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression,
                      k: Int): LogicalPlan = {
    val chunks = k + 1
    val bits = 64 / chunks
    // chunk i = bits [i·bits, (i+1)·bits) of the value; the LAST chunk
    // absorbs the 64 % chunks remainder (unsigned shift, no mask needed)
    def chunkOf(e: Expression, i: Int): Expression =
      if (i == chunks - 1) ShiftRightUnsigned(e, Literal(i * bits))
      else BitwiseAnd(ShiftRightUnsigned(e, Literal(i * bits)),
        Literal((1L << bits) - 1))

    def gen(child: LogicalPlan, fp: Expression,
            tag: String): (LogicalPlan, Attribute, Attribute) = {
      val idx = AttributeReference(s"__band_idx_$tag", IntegerType,
        nullable = false)()
      val value = AttributeReference(s"__band_val_$tag", LongType,
        nullable = true)()
      val g = Generate(
        PosExplode(CreateArray((0 until chunks).map(chunkOf(fp, _)))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(idx, value), child = child)
      (g, idx, value)
    }

    val (lGen, lIdx, lVal) = gen(j.left, lExpr, "l")
    val (rGen, rIdx, rVal) = gen(j.right, rExpr, "r")

    // first index at which the fingerprints agree — row-local, so the
    // surviving copy needs no global dedup
    val diff = BitwiseXor(lExpr, rExpr)
    val firstEq = CaseWhen(
      (0 until chunks).map(i =>
        (EqualTo(chunkOf(diff, i), Literal(0L)), Literal(i))),
      Some(Literal(-1)))

    val newCond = Seq(
      EqualTo(lIdx, rIdx),
      EqualTo(lVal, rVal),
      EqualTo(lIdx, firstEq),
      j.condition.get).reduce(And)

    Project(j.output, Join(lGen, rGen, Inner, Some(newCond), j.hint))
  }
}
