package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule (SURVEY.md §2/§8 escalation ladder step (c)): rewrites
  * a naive band join
  *
  *   A JOIN B ON abs(a.x - b.y) <= w        -- no equi keys
  *
  * which Spark can only execute as an O(|A|·|B|) broadcast-nested-loop /
  * cartesian join, into an EQUI join on a quantized band id:
  *
  *   A' = A + band_l = floor(x / w)
  *   B' = B × explode([floor(y/w)-1, floor(y/w), floor(y/w)+1]) as band_r
  *   A' JOIN B' ON band_l = band_r AND abs(x - y) <= w
  *
  * Correct because |x - y| ≤ w ⟹ floor(x/w) ∈ {floor(y/w)-1, floor(y/w),
  * floor(y/w)+1}; each qualifying pair matches in exactly one band (B's
  * row carries three candidate bands, A's exactly one). The residual
  * original predicate keeps exactness. The join becomes
  * shuffle-partitionable on the band id — at 100 TB this is the
  * difference between a runnable plan and an n² one.
  *
  * Fires only on: inner joins, a single abs(l - r) <= literal conjunct,
  * no existing equi condition (Catalyst's ExtractEquiJoinKeys would
  * already handle those), both sides of the subtraction resolving to one
  * side of the join each. The rewritten plan has an equi conjunct, so
  * the rule cannot re-fire on its own output.
  *
  * Register on an existing session via
  * `spark.experimental.extraOptimizations ++= Seq(BandJoinRewrite)` or
  * at build time through graft.GraftExtensions.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  /** abs(lhs - rhs) <= w, returned as (leftExpr, rightExpr, w).
    *
    * Width widening to Double must be EXACT, or the band grid is
    * narrower than the residual predicate and qualifying pairs are
    * silently dropped: Float/Int/Short widen exactly always; Long only
    * when the value round-trips (|w| ≤ 2^53-ish — checked); Decimal
    * (what a SQL-text literal like `1.0` parses as) only when its
    * BigDecimal round-trips through Double — checked, else the rule
    * declines and the join keeps its (correct, slow) BNL plan.
    *
    * Magnitude envelope: band ids are floor(x / w) computed in Double,
    * exact while |x / w| < 2^52. Callers with operand/width ratios
    * beyond that (astronomically wide bands over astronomically large
    * values) are outside this rule's envelope — the quotient's ULP
    * exceeds 1 and a qualifying pair's band ids can differ by 2. */
  private def asBandPredicate(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(w, t)) =>
      val width = t match {
        case DoubleType => w.asInstanceOf[Double]
        // exact widening — "0.1f".toString.toDouble would be SMALLER than
        // the float's exact value, making the band narrower than the
        // residual predicate and silently dropping qualifying pairs
        case org.apache.spark.sql.types.FloatType => w.asInstanceOf[Float].toDouble
        case org.apache.spark.sql.types.IntegerType => w.asInstanceOf[Int].toDouble
        case org.apache.spark.sql.types.LongType =>
          val l = w.asInstanceOf[Long]
          if (l.toDouble.toLong != l) return None // inexact beyond 2^53
          l.toDouble
        case org.apache.spark.sql.types.ShortType => w.asInstanceOf[Short].toDouble
        case _: org.apache.spark.sql.types.DecimalType =>
          // SQL-text literals ('1.0') parse as DECIMAL(2,1) — without this
          // case an SQL-authored band predicate silently keeps the O(n²)
          // BNL plan. Only exact Double round-trips qualify. A null
          // decimal literal (possible on the direct-application path,
          // before null-propagation folds it) declines like every other
          // branch instead of NPE-ing inside the optimizer.
          if (w == null) return None
          val bd = w.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal
          val d = bd.toDouble
          if (!java.lang.Double.isFinite(d) || BigDecimal(d).compare(bd) != 0) return None
          d
        case _ => return None
      }
      if (width > 0) Some((a, b, width)) else None
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjuncts(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      val band = conjuncts.iterator.flatMap { c =>
        asBandPredicate(c).flatMap { case (a, b, w) =>
          if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
            Some((a, b, w))
          else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
            Some((b, a, w))
          else None
        }
      }.toSeq.headOption
      (hasEqui, band) match {
        case (false, Some((lExpr, rExpr, w))) =>
          val wLit = Literal(w, DoubleType)
          def bandOf(e: Expression): Expression =
            Floor(Divide(Cast(e, DoubleType), wLit))
          // left: one band column
          val bandL = Alias(bandOf(lExpr), "__band_l")()
          val newLeft = Project(left.output :+ bandL, left)
          // right: three candidate bands via explode
          val rBand = bandOf(rExpr)
          val bandsArr = CreateArray(Seq(
            Subtract(rBand, Literal(1L, LongType)), rBand,
            Add(rBand, Literal(1L, LongType))))
          val bandR = AttributeReference("__band_r", LongType, nullable = true)()
          val newRight = Generate(Explode(bandsArr), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(bandR), right)
          val newCond = And(EqualTo(bandL.toAttribute, bandR), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
