package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.sources._

import graft.sources.v2.OrcStatsEval
import graft.sources.v2.OrcStatsEval.StatRange

/** Generative soundness of the tri-state stats evaluator that drives both
  * partition pruning and the stripe-prune metrics. The property that
  * matters: `Some(false)` ("prune") must NEVER fire when some row in the
  * range actually matches — a false prune is silent data loss. Dually,
  * `Some(true)` must imply every row matches.
  */
class OrcStatsEvalSpec extends AnyFunSuite {

  // direct evaluation of a filter against one concrete row value
  private def rowMatches(f: Filter, v: Option[Long]): Boolean = f match {
    case EqualTo(_, x) => v.contains(x.asInstanceOf[Long])
    case EqualNullSafe(_, null) => v.isEmpty
    case EqualNullSafe(_, x) => v.contains(x.asInstanceOf[Long])
    case GreaterThan(_, x) => v.exists(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual(_, x) => v.exists(_ >= x.asInstanceOf[Long])
    case LessThan(_, x) => v.exists(_ < x.asInstanceOf[Long])
    case LessThanOrEqual(_, x) => v.exists(_ <= x.asInstanceOf[Long])
    case In(_, xs) => v.exists(vv => xs.contains(vv))
    case IsNull(_) => v.isEmpty
    case IsNotNull(_) => v.nonEmpty
    case And(l, r) => rowMatches(l, v) && rowMatches(r, v)
    case Or(l, r) => rowMatches(l, v) || rowMatches(r, v)
    case Not(inner) => !rowMatches(inner, v)
    case _ => true
  }

  private val genValue: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.choose(-50L, 50L).map(Some(_)), 1 -> Gen.const(None))

  private val genFilter: Gen[Filter] = {
    val lit = Gen.choose(-50L, 50L)
    val leaf: Gen[Filter] = Gen.oneOf(
      lit.map(x => EqualTo("c", x)),
      lit.map(x => GreaterThan("c", x)),
      lit.map(x => GreaterThanOrEqual("c", x)),
      lit.map(x => LessThan("c", x)),
      lit.map(x => LessThanOrEqual("c", x)),
      Gen.listOfN(3, lit).map(xs => In("c", xs.map(_.asInstanceOf[Any]).toArray)),
      Gen.const(IsNull("c")),
      Gen.const(IsNotNull("c")),
      lit.map(x => EqualNullSafe("c", x)))
    for {
      a <- leaf; b <- leaf
      f <- Gen.oneOf(Gen.const(a), Gen.const(And(a, b)),
        Gen.const(Or(a, b)), Gen.const(Not(a)))
    } yield f
  }

  private def cases(n: Int, seed: Long): Seq[(Seq[Option[Long]], Filter)] = {
    val gen = for {
      vs <- Gen.nonEmptyListOf(genValue).map(_.take(8))
      f <- genFilter
    } yield (vs, f)
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))
  }

  private def rangeOf(vs: Seq[Option[Long]]): StatRange = {
    val present = vs.flatten
    StatRange(
      present.minOption.map(OrcStatsEval.norm),
      present.maxOption.map(OrcStatsEval.norm),
      hasNull = vs.contains(None), hasValues = present.nonEmpty)
  }

  test("property: Some(false) never prunes a matching row; Some(true) implies all match") {
    val all = cases(3000, seed = 42)
    assert(all.size > 2500) // generators must actually produce cases
    all.foreach { case (vs, f) =>
      val lookup: String => Option[StatRange] = _ => Some(rangeOf(vs))
      val verdict = OrcStatsEval.eval(f, lookup)
      val actual = vs.map(v => rowMatches(f, v))
      if (verdict.contains(false))
        assert(!actual.exists(identity),
          s"FALSE PRUNE: filter=$f values=$vs range=${rangeOf(vs)}")
      if (verdict.contains(true))
        assert(actual.forall(identity),
          s"WRONG all-match: filter=$f values=$vs")
    }
  }

  test("property: single-value ranges (partition pruning) — never prune the matching file") {
    val all = cases(2000, seed = 7)
    all.foreach { case (vs, f) =>
      val v = vs.head
      val lookup: String => Option[StatRange] =
        _ => Some(OrcStatsEval.valueRange(v.map(Long.box).orNull))
      val verdict = OrcStatsEval.eval(f, lookup)
      if (rowMatches(f, v))
        assert(!verdict.contains(false),
          s"FALSE PARTITION PRUNE: filter=$f value=$v")
    }
  }

  test("string and date ranges compare correctly") {
    def r(mn: String, mx: String) = StatRange(Some(mn), Some(mx),
      hasNull = false, hasValues = true)
    assert(OrcStatsEval.eval(EqualTo("c", "R"),
      _ => Some(r("A", "N"))) === Some(false))
    assert(OrcStatsEval.eval(EqualTo("c", "B"),
      _ => Some(r("A", "N"))) === None)
    assert(OrcStatsEval.eval(StringStartsWith("c", "NAT"),
      _ => Some(r("AAA", "MZZ"))) === Some(false))
    assert(OrcStatsEval.eval(StringStartsWith("c", "NAT"),
      _ => Some(r("NATION_1", "NATION_9"))) !== Some(false))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-06-01")
    val probe = java.sql.Date.valueOf("2024-07-01")
    val dr = StatRange(Some(OrcStatsEval.norm(d1)), Some(OrcStatsEval.norm(d2)),
      hasNull = false, hasValues = true)
    assert(OrcStatsEval.eval(GreaterThan("c", probe), _ => Some(dr)) === Some(false))
    assert(OrcStatsEval.eval(LessThan("c", probe), _ => Some(dr)) === Some(true))
  }
}
