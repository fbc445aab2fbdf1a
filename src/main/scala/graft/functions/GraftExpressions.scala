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
    // no toLongArray: reading in place skips two 64-long array copies
    // per evaluation — this is the hottest interpreted loop in the
    // embedding operators (r6, guide §1.2 per-task work)
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot_i64: length mismatch $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
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

/** cos04_ge(a, b, na, nb) → boolean: the exact integer cos >= 0.40
  * predicate dot(a,b) > 0 ∧ 25·dot² >= 4·na·nb with the dot product
  * evaluated ONCE. Written as separate dot_i64 conjuncts, the optimizer
  * inlines the dot into the join condition and evaluates it 3x per
  * candidate pair — the dominant per-pair cost of d9/d10's bucket joins
  * (r6 plan audit; guide §1.2 per-task work). Same integers, same
  * boundary, so the surviving pair set is bit-identical. */
case class Cos04GeExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 4, "cos04_ge(a, b, na, nb)")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val av = children(0).eval(input)
    val bv = children(1).eval(input)
    val nav = children(2).eval(input)
    val nbv = children(3).eval(input)
    if (av == null || bv == null || nav == null || nbv == null) return null
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(n == b.numElements(),
      s"cos04_ge: length mismatch $n vs ${b.numElements()}")
    var dot = 0L
    var i = 0
    while (i < n) { dot += a.getLong(i) * b.getLong(i); i += 1 }
    java.lang.Boolean.valueOf(
      dot > 0L &&
      dot * dot * 25L >= nav.asInstanceOf[Long] * nbv.asInstanceOf[Long] * 4L)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Cos04GeExpr = copy(cs)
  override def prettyName: String = "cos04_ge"
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
    reg.createOrReplaceTempFunction("cos04_ge",
      es => Cos04GeExpr(es), "scala_udf")
  }
}
