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

  // SQL three-valued evaluation of a filter against one concrete row
  // value: a NULL operand makes a comparison NULL (None), NOT(NULL) is
  // NULL, AND/OR follow Kleene logic. A row MATCHES only when the
  // predicate is true — NOT merely "not false". The earlier two-valued
  // model here hid exactly the Not-promotion bug the round-10 ADVICE
  // flagged (NOT(c = v) "matching" NULL rows).
  private def sqlEval(f: Filter, v: Option[Long]): Option[Boolean] = f match {
    case EqualTo(_, x) => v.map(_ == x.asInstanceOf[Long])
    case EqualNullSafe(_, null) => Some(v.isEmpty)
    case EqualNullSafe(_, x) => Some(v.contains(x.asInstanceOf[Long]))
    case GreaterThan(_, x) => v.map(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual(_, x) => v.map(_ >= x.asInstanceOf[Long])
    case LessThan(_, x) => v.map(_ < x.asInstanceOf[Long])
    case LessThanOrEqual(_, x) => v.map(_ <= x.asInstanceOf[Long])
    case In(_, xs) => v.map(vv => xs.contains(vv))
    case IsNull(_) => Some(v.isEmpty)
    case IsNotNull(_) => Some(v.nonEmpty)
    case And(l, r) => (sqlEval(l, v), sqlEval(r, v)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (sqlEval(l, v), sqlEval(r, v)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(inner) => sqlEval(inner, v).map(!_)
    case _ => Some(true)
  }

  private def rowMatches(f: Filter, v: Option[Long]): Boolean =
    sqlEval(f, v).contains(true)

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
        Gen.const(Or(a, b)), Gen.const(Not(a)),
        Gen.const(Not(And(a, b))), Gen.const(Not(Or(a, b))),
        Gen.const(Not(Not(a))))
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

  test("NOT over a null-bearing range never claims all-match (r10 ADVICE)") {
    // file holds {1, NULL}; range excludes 5 so EqualTo(c,5) is a clean
    // prune — but NOT(c = 5) is NULL for the NULL row (row NOT matched),
    // so "every row matches" would misclassify the file as a full drop
    // in metadata DELETE and physically delete the NULL row SQL keeps.
    val withNull = StatRange(Some(OrcStatsEval.norm(1L)),
      Some(OrcStatsEval.norm(1L)), hasNull = true, hasValues = true)
    assert(OrcStatsEval.eval(Not(EqualTo("c", 5L)), _ => Some(withNull)) === None)
    // prune direction unaffected: every row equals 5 ⇒ NOT(c=5) matches none
    val allFive = StatRange(Some(OrcStatsEval.norm(5L)),
      Some(OrcStatsEval.norm(5L)), hasNull = false, hasValues = true)
    assert(OrcStatsEval.eval(Not(EqualTo("c", 5L)), _ => Some(allFive)) === Some(false))
    // null-free ranges keep the exact inversion
    val noNull = withNull.copy(hasNull = false)
    assert(OrcStatsEval.eval(Not(EqualTo("c", 5L)), _ => Some(noNull)) === Some(true))
    // references of a NESTED filter are all checked, not just the top
    assert(OrcStatsEval.eval(Not(Or(EqualTo("c", 5L), EqualTo("d", 5L))),
      c => if (c == "c") Some(noNull) else Some(withNull)) === None)
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
