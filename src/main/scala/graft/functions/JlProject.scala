package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss ±1 projection of an `array<double>` column to
  * `outDim` dimensions as a native Catalyst expression.
  *
  * Semantics are EXACTLY `Similarity.randomProject`'s interpreted form
  * (which remains the oracle contract):
  *
  *   sign(j, i) = 1 − 2·(((536870923·(j·33 + i) + 337) mod P) mod 2)
  *   y_j        = (Σ_{i=1..inDim} sign(j, i) · x_{i−1}) / √outDim
  *
  * `inDim` is EXPLICIT, not the array length: the x69 contract (and its
  * oracle's `range(1, 33)`) projects the FIRST `inDim` components of
  * the input — on the 64-wide embeddings table that is a deliberate
  * first-half truncation, part of the pinned semantics.
  *
  * with P = 1000000007 (`Dedup.HashP`) and a STRICTLY sequential
  * left-to-right accumulation — the loop below adds in the same index
  * order as the SQL `aggregate` fold, so the unrounded components are
  * bit-identical to the composed `transform(sequence(...), aggregate(...))`
  * form and to DuckDB's `list_reduce`. The 6-dp rounding is deliberately
  * NOT replicated here: the caller applies Spark's own `round`, keeping
  * one rounding implementation in the contract.
  *
  * Why native: the composed form evaluates outDim × len interpreted
  * lambda calls per row (higher-order functions fall out of whole-stage
  * codegen) — the builder's sf1 bench measured it as the suite's CPU
  * soak (~50M lambda evals, 16.2 s for 160k vectors). This is the same
  * hot-lambda-to-tight-loop port as [[DotProduct]]: a primitive-double
  * nested loop, codegen'd, zero allocation beyond the output array. */
case class JlProject(child: Expression, outDim: Int, inDim: Int)
    extends UnaryExpression {

  require(outDim > 0, s"JlProject: outDim=$outDim must be positive")
  require(inDim > 0, s"JlProject: inDim=$inDim must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  private val P: Long = 1000000007L // Dedup.HashP — inlined for codegen

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(inDim, x.numElements())
    val root = math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 1
      while (i <= n) {
        val par = ((536870923L * (j * 33L + i) + 337L) % P) % 2L
        acc += (1.0 - 2.0 * par) * x.getDouble(i - 1)
        i += 1
      }
      out(j) = acc / root
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val par = ctx.freshName("par")
      val out = ctx.freshName("out")
      val root = ctx.freshName("root")
      s"""
         |int $n = java.lang.Math.min($inDim, $a.numElements());
         |double $root = java.lang.Math.sqrt((double) $outDim);
         |double[] $out = new double[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 1; $i <= $n; $i++) {
         |    long $par = ((536870923L * ($j * 33L + $i) + 337L) % ${P}L) % 2L;
         |    $acc += (1.0 - 2.0 * $par) * $a.getDouble($i - 1);
         |  }
         |  $out[$j] = $acc / $root;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {
  def jl_project(emb: Column, outDim: Int, inDim: Int): Column =
    GraftSqlBridge.column(JlProject(GraftSqlBridge.expression(emb), outDim, inDim))
}
