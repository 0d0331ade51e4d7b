package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => PropTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5) for the custom expression kernels, evaluated
  * directly (no Spark jobs — these laws are row-local by construction).
  */
class HashingLawsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val ws: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n')).map(_.mkString)
  private val text: Gen[String] = for {
    words <- Gen.listOf(word)
    seps <- Gen.listOfN(words.length + 1, ws)
  } yield seps.zipAll(words, " ", "").map { case (s, w) => s + w }.mkString

  private def utf8(s: String) = UTF8String.fromString(s)
  private def longs(a: Any): Seq[Long] = {
    val arr = a.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getLong)
  }
  private def strings(a: Any): Seq[String] = {
    val arr = a.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("fused hashed shingles ≡ hash ∘ shingle for arbitrary whitespace") {
    val fused = HashedWordShingles(Literal("x"), 3)
    val sh = WordShingles(Literal("x"), 3)
    val hash = HashedShingles(Literal("x"))
    check(Prop.forAll(text) { s =>
      val viaChain = longs(hash.nullSafeEval(
        sh.nullSafeEval(utf8(s)).asInstanceOf[ArrayData]))
      longs(fused.nullSafeEval(utf8(s))) == viaChain
    })
  }

  test("shingle count law: distinct windows of the token stream") {
    val sh = WordShingles(Literal("x"), 2)
    check(Prop.forAll(text) { s =>
      val tokens = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val expected =
        if (tokens.length < 2) Seq.empty
        else tokens.sliding(2).map(_.mkString(" ")).toSeq.distinct
      strings(sh.nullSafeEval(utf8(s))) == expected
    })
  }

  test("sorted intersect size ≡ set intersection size") {
    val ix = SortedIntersectSize(Literal(1L), Literal(1L))
    val setGen = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.toSet)
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      val ad = new GenericArrayData(a.toArray.sorted)
      val bd = new GenericArrayData(b.toArray.sorted)
      ix.nullSafeEval(ad, bd) == (a & b).size
    })
  }

  test("simhash is a bag-of-tokens signature: order-invariant") {
    val sig = SimHash64(Literal("x"))
    check(Prop.forAll(Gen.nonEmptyListOf(word), Gen.long) { (words, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(words)
      sig.nullSafeEval(utf8(words.mkString(" "))) ==
        sig.nullSafeEval(utf8(shuffled.mkString(" ")))
    })
  }

  test("simhash-of-hashes: order-invariant, majority law, empty → null") {
    val sig = SimHashOfHashes(Literal("x"))
    def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray[Any])
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.long), Gen.long) { (hs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(hs)
      sig.nullSafeEval(arr(hs)) == sig.nullSafeEval(arr(shuffled))
    })
    // unanimous bits: a single element's signature is the element itself
    check(Prop.forAll(Gen.long) { h =>
      sig.nullSafeEval(arr(Seq(h))) == h
    })
    assert(sig.nullSafeEval(arr(Nil)) == null)
  }

  test("minhash signature is order-invariant and k-length") {
    val mh = MinHashSig(Literal("x"), 16)
    val shinglesGen = Gen.nonEmptyListOf(word)
    check(Prop.forAll(shinglesGen, Gen.long) { (ss, seed) =>
      def arr(xs: Seq[String]) =
        new GenericArrayData(xs.map(utf8).toArray[Any])
      val shuffled = new scala.util.Random(seed).shuffle(ss)
      val a = longs(mh.nullSafeEval(arr(ss)))
      val b = longs(mh.nullSafeEval(arr(shuffled)))
      a == b && a.length == 16
    })
  }

  test("rolling hash min ≡ per-window polynomial recompute") {
    val w = 8
    val rh = RollingHashMin(Literal("x"), w)
    def naive(s: String): Option[Long] = {
      val b = s.getBytes("UTF-8")
      if (b.length < w) None
      else Some((0 to b.length - w).map { i =>
        b.slice(i, i + w).foldLeft(0L)((h, x) => h * 257L + (x & 0xffL))
      }.min)
    }
    check(Prop.forAll(text) { s =>
      Option(rh.nullSafeEval(utf8(s))).map(_.asInstanceOf[Long]) == naive(s)
    })
  }

  test("dot product ≡ sequential fold, left-to-right; null on mismatch") {
    val dp = DotProduct(Literal(1.0), Literal(1.0))
    val vec = Gen.listOf(Gen.chooseNum(-10.0, 10.0))
    check(Prop.forAll(vec, vec) { (x, y) =>
      val xd = new GenericArrayData(x.toArray)
      val yd = new GenericArrayData(y.toArray)
      if (x.length != y.length) dp.nullSafeEval(xd, yd) == null
      else {
        val expected =
          x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
        dp.nullSafeEval(xd, yd) == expected
      }
    })
  }
}
