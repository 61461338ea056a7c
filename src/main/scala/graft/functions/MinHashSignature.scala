package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a K-wide MinHash signature of a
  * set of 64-bit element fingerprints: out[j] = min over elements x of
  * (a[j]·(x mod p) + b[j]) mod p.
  *
  * This is the one hot loop in the engine where a higher-order-function
  * formulation (`aggregate` + `zip_with` over a literal coefficient
  * array) measurably hurts: HOF lambdas are interpreted and box every
  * intermediate, turning K×|set| primitive multiply-mods into tens of
  * millions of boxed ops per bench run. The brief's preference ladder
  * (compose built-ins → native `Expression` with `doGenCode` → UDF)
  * lands here on the middle rung: `doGenCode` emits the two-level
  * primitive loop directly into whole-stage codegen, with
  * `nullSafeEval` as the interpreted fallback. Semantics are identical
  * to the fold it replaces (MinHashSpec asserts equality on both
  * paths).
  *
  * Wired in via the session `FunctionRegistry`
  * ([[MinHashSignature.register]]) — the runtime form of the
  * `SparkSessionExtensions.injectFunction` extension point.
  */
final case class MinHashSignature(child: Expression,
    a: Array[Long], b: Array[Long], p: Long)
  extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty, "coefficient arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs ARRAY<BIGINT>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = a.length
    val out = Array.fill(k)(p)
    var i = 0
    while (i < arr.numElements()) {
      val x = arr.getLong(i) % p
      var j = 0
      while (j < k) {
        val h = (a(j) * x + b(j)) % p
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("mhOut")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $out = new long[${a.length}];
         |java.util.Arrays.fill($out, ${p}L);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $x = $c.getLong($i) % ${p}L;
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    long $h = ($aRef[$j] * $x + $bRef[$j]) % ${p}L;
         |    if ($h < $out[$j]) $out[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val FUNC_NAME = "graft_minhash"

  /** Idempotently registers `graft_minhash(arr)` with the given
    * coefficients in the session's FunctionRegistry; call before using
    * `expr("graft_minhash(col)")`. */
  def register(spark: SparkSession, a: Array[Long], b: Array[Long], p: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FUNC_NAME,
      exprs => MinHashSignature(exprs.head, a, b, p),
      "built-in")
}
