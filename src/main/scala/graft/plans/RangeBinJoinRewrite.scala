package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Session extension installing the engine's Catalyst rules — the
  * `SparkSessionExtensions` registration point (production:
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `GraftSession.builder` which wires it by default; tests reach the
  * same Rule object through `spark.experimental.extraOptimizations`,
  * since `getOrCreate` on an existing session cannot re-run extension
  * injection).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeBinJoinRewrite)
    GraftExtensions.functions.foreach(e.injectFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}
  import org.apache.spark.sql.types.StringType

  /** SQL-callable engine functions — the triples `injectFunction`
    * takes, shared with tests (a shared session cannot re-run
    * extension injection, but can register the same triples directly).
    * `graft_hash64(any)`: the engine-wide portable 60-bit hash
    * ([[graft.functions.Md5Prefix64]]) — lets `spark.sql` users write
    * the same content keys the Scala operators produce. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    (new FunctionIdentifier("graft_hash64"),
     new ExpressionInfo(classOf[graft.functions.Md5Prefix64].getName, "graft_hash64"),
     (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
       require(children.size == 1, "graft_hash64 takes exactly one argument")
       // analyzer's ResolveTimeZone fills the zone for temporal inputs
       graft.functions.Md5Prefix64(Cast(children.head, StringType))
     }))
}

/** Rewrites a bounded-width range join into the binned equi join that
  * [[graft.operators.TemporalJoin.pointInRange]] builds by hand —
  * automatically, for any naive SQL/DataFrame join of the shape
  *
  *   A JOIN B ON  [k_a = k_b AND]  p >= s AND p <= s + W
  *
  * (`p` a long from one side, `s` a long from the other, `W` a
  * positive literal — the "events inside each W-wide window" join).
  * Without keys Spark plans this as a BroadcastNestedLoopJoin — an
  * O(|A|·|B|) scan that is the single worst plan a 100 TB query can
  * produce; with low-cardinality keys it still degenerates to
  * per-key quadratic matching. The rewrite bins both sides by `W`
  * (each range spans at most 2 bins, so the explode at most doubles
  * the range side), joins on `[keys +] bin`, and keeps the original
  * predicates as the exactness filter — same rows out, hash join in.
  *
  * Fires only on Inner joins whose range pattern it fully recognizes
  * (`DIV` truncation assumes non-negative domains — epoch
  * micros/nanos, sequence numbers, LSNs); the `__graft_bin` marker
  * keeps the fixed-point optimizer from re-binning its own output.
  * Everything it emits is stock Catalyst (Generate/Project/Join), so
  * column pruning, pushdown, and AQE apply as usual downstream.
  */
object RangeBinJoinRewrite extends Rule[LogicalPlan] {

  private val BinTag = "__graft_bin"

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** p >= s (any written orientation) with p, s long-typed. */
  private object Lower {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case LessThanOrEqual(s, p) => Some((p, s))
      case _ => None
    }
  }

  /** p <= s + W (any orientation of the comparison and the Add). */
  private object Upper {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(p, Add(s, Literal(w: Long, LongType), _)) => Some((p, s, w))
      case LessThanOrEqual(p, Add(Literal(w: Long, LongType), s, _)) => Some((p, s, w))
      case GreaterThanOrEqual(Add(s, Literal(w: Long, LongType), _), p) => Some((p, s, w))
      case GreaterThanOrEqual(Add(Literal(w: Long, LongType), s, _), p) => Some((p, s, w))
      case _ => None
    }
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !left.output.exists(_.name.startsWith(BinTag)) &&
          !right.output.exists(_.name.startsWith(BinTag)) =>
      val conjuncts = splitConj(cond)
      val pattern = (for {
        Lower(p1, s1) <- conjuncts
        Upper(p2, s2, w) <- conjuncts
        if w > 0 && p1.semanticEquals(p2) && s1.semanticEquals(s2) &&
          p1.dataType == LongType && s1.dataType == LongType
        // p and s must come from OPPOSITE sides, each entirely
        pSide <- sideOf(p1, left, right).toSeq
        sSide <- sideOf(s1, left, right).toSeq
        if pSide != sSide
      } yield (p1, s1, w, pSide)).headOption
      pattern match {
        case Some((p, s, w, pOnLeft)) =>
          val width = Literal(w, LongType)
          // range side: explode its (at most 2) covered bins
          val binAttr = AttributeReference(BinTag, LongType)()
          // Sequence is TimeZoneAwareExpression — without a zone id it
          // reports unresolved even over longs
          val seqExpr = new Sequence(
            new IntegralDivide(s, width),
            new IntegralDivide(Add(s, width), width),
            Literal(1L, LongType)).withTimeZone(conf.sessionLocalTimeZone)
          def withRangeBins(side: LogicalPlan) = Generate(
            Explode(seqExpr), unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(binAttr), child = side)
          // point side: its single bin
          val pbAlias = Alias(new IntegralDivide(p, width), BinTag + "p")()
          def withPointBin(side: LogicalPlan) =
            Project(side.output :+ pbAlias, side)
          val (newLeft, newRight) =
            if (pOnLeft) (withPointBin(left), withRangeBins(right))
            else (withRangeBins(left), withPointBin(right))
          val newCond = And(cond, EqualTo(pbAlias.toAttribute, binAttr))
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
