package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the engine's native expressions, so SQL models
  * (the reference's primary authoring surface) can call them directly:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT doc_id, simhash64(text) FROM docs")
  * }}}
  *
  * `GraftExtensions` is the library-installation path:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` injects
  * the same functions into every session of a cluster.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be a literal int, got: $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (es => SimHash64(es.head)),
    "simhash_of_hashes" -> (es => SimHashOfHashes(es.head)),
    "word_shingles" ->
      (es => WordShingles(es.head, intArg(es(1), "n"))),
    "hashed_shingles" -> (es => HashedShingles(es.head)),
    "hashed_word_shingles" ->
      (es => HashedWordShingles(es.head, intArg(es(1), "n"))),
    "minhash_sig" -> (es => MinHashSig(es.head, intArg(es(1), "k"))),
    "sorted_intersect_size" ->
      (es => SortedIntersectSize(es.head, es(1))),
    "dot_product" -> (es => DotProduct(es.head, es(1))),
    "byte_histogram" ->
      (es => ByteHistogram(es.head, intArg(es(1), "buckets"))),
    "hyperplane_sig" ->
      (es => HyperplaneSig(es.head, intArg(es(1), "bits"))),
    "rolling_hash_min" ->
      (es => RollingHashMin(es.head, intArg(es(1), "window"))),
    "char_entropy" -> (es => CharEntropy(es.head)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point injecting the graft functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
}
