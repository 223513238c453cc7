package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.KeyBounds
import org.apache.spark.sql.sources._

/**
 * Pruning SOUNDNESS, property-checked: for any pushed filter set and any file
 * key range, if some key inside the file's [lo, hi] satisfies every filter,
 * the file must be KEPT. (Completeness — pruning as much as possible — is a
 * quality concern; soundness is the correctness invariant the connector's
 * split pruning rests on, since dropped files are never re-read.)
 */
class KeyBoundsPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, res.status.toString)
  }

  private val key = "k"
  private val keyGen: Gen[Long] = Gen.chooseNum(-1000L, 1000L)

  private val filterGen: Gen[Filter] = Gen.oneOf(
    keyGen.map(v => EqualTo(key, v)),
    keyGen.map(v => GreaterThan(key, v)),
    keyGen.map(v => GreaterThanOrEqual(key, v)),
    keyGen.map(v => LessThan(key, v)),
    keyGen.map(v => LessThanOrEqual(key, v)),
    Gen.nonEmptyListOf(keyGen).map(vs => In(key, vs.toArray.map(_.asInstanceOf[Any]))),
    // filters on other columns must never prune by key
    keyGen.map(v => EqualTo("other", v)),
    // conjunctions nest
    for (a <- keyGen; b <- keyGen) yield And(GreaterThanOrEqual(key, a), LessThan(key, b)),
    // disjunctions are ignored (no constraint) — must stay sound
    for (a <- keyGen; b <- keyGen) yield Or(EqualTo(key, a), EqualTo(key, b)))

  private def eval(f: Filter, k: Long): Boolean = f match {
    case EqualTo(`key`, v) => k == v.asInstanceOf[Long]
    case GreaterThan(`key`, v) => k > v.asInstanceOf[Long]
    case GreaterThanOrEqual(`key`, v) => k >= v.asInstanceOf[Long]
    case LessThan(`key`, v) => k < v.asInstanceOf[Long]
    case LessThanOrEqual(`key`, v) => k <= v.asInstanceOf[Long]
    case In(`key`, vs) => vs.contains(k)
    case And(l, r) => eval(l, k) && eval(r, k)
    case Or(l, r) => eval(l, k) || eval(r, k)
    case _ => true // non-key filters: the key alone never refutes them
  }

  test("a file containing any key satisfying all filters is never pruned") {
    check(Prop.forAll(Gen.listOfN(3, filterGen), keyGen, keyGen, keyGen) {
      (filters, a, b, k) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val bounds = KeyBounds.fromFilters(filters.toArray, key)
        val containsMatch = (k >= lo && k <= hi) && filters.forall(eval(_, k))
        // soundness: a witness key inside the file forces intersects == true
        !containsMatch || bounds.intersects(BigDecimal(lo), BigDecimal(hi))
    })
  }

  test("string keys: a file containing a matching key is never pruned") {
    val sKeyGen = Gen.oneOf("aa", "ab", "ba", "bb", "ca", "cb", "da")
    val sFilterGen: Gen[Filter] = Gen.oneOf(
      sKeyGen.map(v => EqualTo(key, v)),
      sKeyGen.map(v => GreaterThanOrEqual(key, v)),
      sKeyGen.map(v => LessThan(key, v)),
      Gen.oneOf("a", "b", "c").map(p => StringStartsWith(key, p)),
      Gen.nonEmptyListOf(sKeyGen).map(vs => In(key, vs.toArray.map(_.asInstanceOf[Any]))))
    def evalS(f: Filter, k: String): Boolean = f match {
      case EqualTo(`key`, v) => k == v
      case GreaterThanOrEqual(`key`, v) => k >= v.asInstanceOf[String]
      case LessThan(`key`, v) => k < v.asInstanceOf[String]
      case StringStartsWith(`key`, p) => k.startsWith(p)
      case In(`key`, vs) => vs.contains(k)
      case _ => true
    }
    check(Prop.forAll(Gen.listOfN(3, sFilterGen), sKeyGen, sKeyGen, sKeyGen) {
      (filters, a, b, k) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val bounds = KeyBounds.fromFilters(filters.toArray, key)
        val containsMatch = (k >= lo && k <= hi) && filters.forall(evalS(_, k))
        !containsMatch || bounds.intersects(lo, hi)
    })
  }
}
