package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text/vector kernels Spark lacks —
  * native Expressions, not Scala UDFs, so they stay inside Catalyst
  * planning (SURVEY §7.6; SNIPPETS.md[1] pattern). Registered under the
  * session function registry for use via expr()/SQL.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      TextHashes.simHash64(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(c)
  override def prettyName: String = "simhash64"
}

case class Fnv64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(TextHashes.fnv64(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): Fnv64Expr = copy(c)
  override def prettyName: String = "fnv64"
}

/** minhash_sig(text, k, shingleN) → array<long>. */
case class MinHashSigExpr(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextHashes.minHashSig(v.asInstanceOf[UTF8String].toString, k, shingleN))
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** lsh_bucket(embedding: array<float>, nbits, seed) → long. */
case class LshSignBucketExpr(child: Expression, nbits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    java.lang.Long.valueOf(TextHashes.lshSignBucket(arr, nbits, seed))
  }
  override protected def withNewChildInternal(c: Expression): LshSignBucketExpr =
    copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

/** dot_i64(a: array<long>, b: array<long>) → long — integer dot product
  * on primitive arrays. The hot inner loop of every embedding operator
  * (dedup verify, KNN, ANN re-rank): a native Expression instead of
  * aggregate(zip_with(...)), whose higher-order lambdas evaluate
  * interpreted per element. */
case class DotI64Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    require(a.length == b.length,
      s"dot_i64: length mismatch ${a.length} vs ${b.length}")
    var acc = 0L
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    java.lang.Long.valueOf(acc)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotI64Expr = copy(l, r)
  override def prettyName: String = "dot_i64"
}

/** shingles_sorted(text, n) → array<long>: sorted distinct word n-gram
  * shingle hashes. The tokenize-once column behind d7's candidate
  * verification: each document hashes its shingles exactly once, however
  * many candidate buckets it lands in. */
case class ShinglesSortedExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextHashes.shingleHashesSorted(v.asInstanceOf[UTF8String].toString, n))
  override protected def withNewChildInternal(c: Expression): ShinglesSortedExpr =
    copy(child = c)
  override def prettyName: String = "shingles_sorted"
}

/** minhash_from_shingles(sh: array<long>, k) → array<long>: MinHash
  * signature derived from a precomputed shingle-hash column, so sig and
  * verification share ONE tokenization pass per document. */
case class MinHashFromShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextHashes.minHashFromShingles(v.asInstanceOf[ArrayData].toLongArray(), k))
  override protected def withNewChildInternal(c: Expression): MinHashFromShinglesExpr =
    copy(child = c)
  override def prettyName: String = "minhash_from_shingles"
}

/** intersect_count_sorted(a, b) → long: common-element count of two
  * SORTED distinct long arrays — a linear merge walk on primitive arrays
  * (array_intersect + size would hash-build per row; this is the d7
  * verify hot loop). */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(TextHashes.sortedIntersectCount(
      l.asInstanceOf[ArrayData].toLongArray(),
      r.asInstanceOf[ArrayData].toLongArray()))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCountExpr = copy(l, r)
  override def prettyName: String = "intersect_count_sorted"
}

/** fingerprint64(text, window) → long (winnowing-style min rolling hash). */
case class FingerprintExpr(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      TextHashes.fingerprint(v.asInstanceOf[UTF8String].toString, window))
  override protected def withNewChildInternal(c: Expression): FingerprintExpr =
    copy(child = c)
  override def prettyName: String = "fingerprint64"
}

object GraftFunctions {
  /** Idempotent session registration; call before using expr("simhash64(...)")
    * etc. Integer args must be foldable literals. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def lit(e: Expression): Int =
      e.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"expected int literal, got $other")
      }
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("fnv64",
      es => Fnv64Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSigExpr(es.head, lit(es(1)), lit(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_bucket",
      es => LshSignBucketExpr(es.head, lit(es(1)), lit(es(2)).toLong), "scala_udf")
    reg.createOrReplaceTempFunction("fingerprint64",
      es => FingerprintExpr(es.head, lit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("dot_i64",
      es => DotI64Expr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("shingles_sorted",
      es => ShinglesSortedExpr(es.head, lit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_from_shingles",
      es => MinHashFromShinglesExpr(es.head, lit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("intersect_count_sorted",
      es => SortedIntersectCountExpr(es.head, es(1)), "scala_udf")
  }
}
