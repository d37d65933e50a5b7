package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, NamedExpression, UnsafeProjection}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Prototype of the SURVEY.md §7 phase-6 accelerator seam: a plan
  * rewrite that swaps a `ProjectExec` whose projection carries
  * [[DotProduct]] for a batch-at-a-time kernel operator — the exact
  * substitution shape the reference performs when it routes a map
  * UDF to a TornadoVM GPU kernel (`/root/reference` TornadoVM
  * drivers/opencl graal phases; MapDriver.java offload path), minus
  * the device: the "kernel" here is a contiguous primitive JVM loop
  * over a 1024-pair batch, which is what a real ColumnarRule plugin
  * would hand to cuBLAS/OpenCL.
  *
  * Deliberately OPT-IN (`spark.graft.kernelProject.enabled=true`):
  * on CPU, whole-stage codegen over [[DotProduct.doGenCode]] is
  * already the fast path, and this operator exists to prove the
  * plugin seam works and stays numerically honest — DotKernelSpec
  * runs the same query both ways and asserts the reference's dual-run
  * tolerance (TestMatrixMultiplication.java:80-101, 0.01), which the
  * identical ascending fold order tightens to bit equality.
  */
object DotKernel {

  val BatchSize = 1024

  /** The stand-in device kernel: one contiguous sweep over a batch of
    * vector pairs, double accumulator, ascending index order (the
    * engine-wide fold-order contract). */
  def dotBatch(lefts: Array[Array[Float]], rights: Array[Array[Float]], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var r = 0
    while (r < n) {
      val a = lefts(r)
      val b = rights(r)
      val m = math.min(a.length, b.length)
      var s = 0.0
      var i = 0
      while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      out(r) = s
      r += 1
    }
    out
  }

  /** Second kernel behind the same seam: fused cosine — dot and both
    * squared norms in one sweep per pair, then the exactly-rounded
    * sqrt/divide, zero-norm → 0.0. Identical ascending fold order to
    * [[CosineSim.nullSafeEval]]/doGenCode, so A/B runs are bit-equal. */
  def cosineBatch(lefts: Array[Array[Float]], rights: Array[Array[Float]], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var r = 0
    while (r < n) {
      val a = lefts(r)
      val b = rights(r)
      val m = math.min(a.length, b.length)
      var s = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < m) {
        val xi = a(i).toDouble
        val yi = b(i).toDouble
        s += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      out(r) = if (na == 0.0 || nb == 0.0) 0.0
        else s / (math.sqrt(na) * math.sqrt(nb))
      r += 1
    }
    out
  }

  /** The kernel registry the seam dispatches on: a real accelerator
    * plugin would map each entry to a device kernel handle. */
  private[plans] def kernelFor(e: Expression)
      : Option[(Expression, Expression, (Array[Array[Float]], Array[Array[Float]], Int) => Array[Double])] =
    e match {
      case d: DotProduct => Some((d.left, d.right, dotBatch))
      case c: CosineSim => Some((c.left, c.right, cosineBatch))
      case _ => None
    }

  private[plans] def isKernelExpr(e: Expression): Boolean = kernelFor(e).isDefined
}

/** Physical project that evaluates top-level aliases of registered
  * kernel expressions ([[DotProduct]] → dotBatch, [[CosineSim]] →
  * cosineBatch) through [[DotKernel]] and everything else through
  * an ordinary unsafe projection against the batched input rows. */
case class DotKernelProjectExec(projectList: Seq[NamedExpression], child: SparkPlan)
    extends UnaryExecNode
    with org.apache.spark.sql.execution.PartitioningPreservingUnaryExecNode
    with org.apache.spark.sql.execution.OrderPreservingUnaryExecNode {

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  // same alias-aware partitioning/ordering projection as ProjectExec:
  // never advertise attributes the projection dropped or renamed
  // (matters if AQE stage reuse or a later rule consults this node)
  override protected def outputExpressions: Seq[NamedExpression] = projectList
  override protected def orderingExpressions
      : Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pl = projectList
    child.execute().mapPartitionsWithIndex { (partIdx, it) =>
      // kernel slots, in projection order: (bound left, bound right, batch fn)
      val kernels = pl.collect {
        case Alias(e, _) if DotKernel.isKernelExpr(e) => DotKernel.kernelFor(e).get
      }
      val kernelInputs = kernels.map { case (l, r, fn) =>
        (BindReferences.bindReference(l, childOutput),
          BindReferences.bindReference(r, childOutput), fn)
      }
      // the output projection reads kernel results from slots appended
      // after the child row (JoinedRow), everything else as usual
      var slot = childOutput.size
      val rewritten: Seq[Expression] = pl.map {
        case Alias(e, _) if DotKernel.isKernelExpr(e) =>
          val b = BoundReference(slot, DoubleType, nullable = true)
          slot += 1
          b
        case e => BindReferences.bindReference(e, childOutput)
      }
      val outProj = UnsafeProjection.create(rewritten)
      outProj.initialize(partIdx)
      val joined = new JoinedRow

      // copy BEFORE grouped(): the child's iterator reuses one
      // UnsafeRow buffer, and grouped() holds n references to it —
      // copying after buffering would alias every row in the batch
      // to the last one drawn
      it.map(_.copy()).grouped(DotKernel.BatchSize).flatMap { batch =>
        val rows = batch.toArray
        val n = rows.length
        val results = kernelInputs.map { case (l, r, kernel) =>
          val lefts = new Array[Array[Float]](n)
          val rights = new Array[Array[Float]](n)
          var i = 0
          while (i < n) {
            val lv = l.eval(rows(i))
            val rv = r.eval(rows(i))
            // nullIntolerant contract: a null side yields an empty pair
            // and the slot is nulled below
            lefts(i) = if (lv == null) null
              else lv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
            rights(i) = if (rv == null) null
              else rv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
            i += 1
          }
          val safeL = lefts.map(a => if (a == null) Array.empty[Float] else a)
          val safeR = rights.map(a => if (a == null) Array.empty[Float] else a)
          val out = kernel(safeL, safeR, n)
          (out, lefts, rights)
        }
        Iterator.tabulate(n) { i =>
          val slots = new Array[Any](kernels.length)
          var d = 0
          while (d < kernels.length) {
            val (out, lefts, rights) = results(d)
            slots(d) = if (lefts(i) == null || rights(i) == null) null else out(i)
            d += 1
          }
          outProj(joined(rows(i), new GenericInternalRow(slots)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): DotKernelProjectExec =
    copy(child = newChild)
}

/** Post-columnar-transition rule: ProjectExec → [[DotKernelProjectExec]]
  * when (and only when) every kernel expression (DotProduct /
  * CosineSim) in the projection is a top-level alias — nested uses
  * keep the codegen path, where `doGenCode` already fuses into the
  * surrounding expression tree. Gated off by default; see [[DotKernel]]. */
object DotKernelProjectRule extends Rule[SparkPlan] {

  val EnabledKey = "spark.graft.kernelProject.enabled"

  private def eligible(pl: Seq[NamedExpression]): Boolean = {
    val topLevel = pl.count {
      case Alias(e, _) => DotKernel.isKernelExpr(e); case _ => false
    }
    val nested = pl.exists {
      case Alias(e, _) if DotKernel.isKernelExpr(e) => false
      case e => e.exists(DotKernel.isKernelExpr)
    }
    // nondeterministic expressions need ProjectExec's per-partition
    // initialize contract — leave them on the stock path
    topLevel > 0 && !nested && pl.forall(_.deterministic)
  }

  override def apply(plan: SparkPlan): SparkPlan =
    if (org.apache.spark.sql.internal.SQLConf.get
        .getConfString(EnabledKey, "false") != "true") plan
    else plan.transformUp {
      case p: ProjectExec if eligible(p.projectList) =>
        DotKernelProjectExec(p.projectList, p.child)
    }
}
