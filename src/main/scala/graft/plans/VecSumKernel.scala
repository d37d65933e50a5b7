package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, NamedExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Partial, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise vector sum over an `array<float>` or `array<double>`
  * column — the KMeans centroid-accumulate shape (reference TornadoVM
  * `ChainedAllReduceDriver.java:852`: the per-cluster centroid
  * partial reduction the artifact offloads to the device; the same
  * shape as the LogReg gradient partial-sum,
  * `ChainedAllReduceDriver.java:563-600`). Buffer = `Array[Double]`
  * of component sums (length 0 = nothing consumed → result NULL);
  * a NON-EMPTY input whose length differs from the dimension already
  * accumulated FAILS FAST (callers feed fixed-dimension vectors — a
  * ragged input is an upstream data bug, and zero-padding it would
  * yield plausible-looking wrong sums; round-8 advice); empty arrays
  * are ignored like nulls, so the check never depends on row order. Ascending
  * component order, double accumulators — the engine-wide fold-order
  * contract, so the kernel-exec path below is bit-equal per partial
  * buffer.
  *
  * Exposed to SQL as `graft_vecsum` via [[Functions.register]] /
  * [[graft.engine.GraftExtensions]]. Planned through
  * ObjectHashAggregateExec (typed-imperative, binary-serialized
  * partials — the standard two-stage partial/final split, so the
  * map-side combine runs before the shuffle like any built-in agg).
  */
case class VecSum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum expects array<float> or array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vecsum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else VecSum.accumulate(buf, VecSum.toDoubles(v.asInstanceOf[ArrayData],
      child.dataType))
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    VecSum.accumulate(buf, other)

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}

object VecSum {

  private[plans] def checkDim(have: Int, got: Int): Unit =
    if (have != got) throw new IllegalArgumentException(
      s"graft_vecsum: ragged input — accumulated dimension $have, " +
        s"incoming vector length $got (fixed-dimension vectors required)")

  /** Element extraction per declared input type; float components
    * widen exactly, so both input types share one double fold. */
  private[plans] def toDoubles(ad: ArrayData, dt: DataType): Array[Double] =
    dt match {
      case ArrayType(FloatType, _) =>
        val f = ad.toFloatArray()
        val d = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
        d
      case _ => ad.toDoubleArray()
    }

  /** Scalar accumulate: acc += v, ascending component order; the
    * first NON-EMPTY vector fixes the dimension, later non-empty
    * lengths must match. Empty vectors contribute nothing (like
    * nulls) regardless of where they land in the fold — dimension
    * checking must not depend on row order, which is free across
    * runs. Also the partial-merge fold (a 0-length partial buffer is
    * "nothing consumed"). Returns the (possibly re-allocated)
    * buffer. */
  def accumulate(acc0: Array[Double], v: Array[Double]): Array[Double] = {
    if (v.isEmpty) acc0
    else if (acc0.isEmpty) v.clone()
    else {
      checkDim(acc0.length, v.length)
      var i = 0
      while (i < v.length) { acc0(i) += v(i); i += 1 }
      acc0
    }
  }

  /** The stand-in device kernel: one contiguous sweep over a batch of
    * rows whose accumulator slots were resolved host-side —
    * the shape of the reference's per-work-group centroid reduction
    * (slot resolution = the sort/bucket step a real device impl does
    * before its segmented reduce). `slots(i)(f)` is row i's
    * accumulator for function f; re-allocated in place on growth. */
  def accumulateBatch(slots: Array[Array[Array[Double]]], f: Int,
      vecs: Array[Array[Double]], n: Int): Unit = {
    var i = 0
    while (i < n) {
      val v = vecs(i)
      if (v != null) slots(i)(f) = accumulate(slots(i)(f), v)
      i += 1
    }
  }
}

/** Physical stand-in for a device-side partial aggregation: replaces
  * the PARTIAL [[ObjectHashAggregateExec]] of a pure-[[VecSum]]
  * aggregate with a per-partition batch kernel — rows are drained in
  * [[DotKernel.BatchSize]] batches, each row's accumulator slot is
  * resolved against the partition's group map, then one contiguous
  * primitive sweep per function accumulates the batch (the
  * ChainedAllReduceDriver shape: device partial reduction, host
  * merge). Emits exactly the stock partial output — grouping columns
  * plus each function's serialized buffer — so the unmodified FINAL
  * ObjectHashAggregateExec merges the partials; the seam swaps one
  * stage, not the contract. */
case class VecSumKernelExec(
    groupingExpressions: Seq[NamedExpression],
    aggregateExpressions: Seq[AggregateExpression],
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gEx = groupingExpressions
    val fnExprs = aggregateExpressions
      .map(_.aggregateFunction.asInstanceOf[VecSum])
    val outAttrs = output
    val maxGroups = conf.getConfString(VecSumKernelExec.MaxGroupsKey,
      VecSumKernelExec.MaxGroups.toString).toInt
    child.execute().mapPartitionsWithIndex { (partIdx, it) =>
      val keyProj = UnsafeProjection.create(gEx, childOutput)
      keyProj.initialize(partIdx)
      val fns = fnExprs.toArray
      val bound = fns.map(f => BindReferences.bindReference(f.child, childOutput))
      val nF = bound.length
      // insertion-ordered so partial output order is deterministic
      // given the partition's row order (same property as the stock
      // ObjectAggregationMap iteration for these sizes)
      val groups = new java.util.LinkedHashMap[UnsafeRow, Array[Array[Double]]]()
      val vecs = new Array[Array[Double]](DotKernel.BatchSize)
      val slots = new Array[Array[Array[Double]]](DotKernel.BatchSize)
      val outProj = UnsafeProjection.create(outAttrs.zipWithIndex.map {
        case (a, i) => BoundReference(i, a.dataType, a.nullable)
      })
      outProj.initialize(partIdx)
      val joined = new JoinedRow
      // drain the map as PARTIAL rows and reset — multiple partials
      // per key are legal input to the final stage, which merges
      // them, so memory stays bounded at MaxGroups accumulators the
      // way the stock partial stage bounds itself by spilling to
      // sort-based aggregation
      def flush(): Iterator[InternalRow] = {
        val drained = groups.entrySet().toArray(
          new Array[java.util.Map.Entry[UnsafeRow, Array[Array[Double]]]](0))
        groups.clear()
        drained.iterator.map { e =>
          val bufs = new Array[Any](nF)
          var f = 0
          while (f < nF) { bufs(f) = fns(f).serialize(e.getValue()(f)); f += 1 }
          outProj(joined(e.getKey, new GenericInternalRow(bufs)))
        }
      }
      // copy BEFORE grouped(): the child iterator reuses one UnsafeRow
      // buffer and grouped() holds n references to it (the DotKernel
      // aliasing hazard)
      it.map(_.copy()).grouped(DotKernel.BatchSize).flatMap { batch =>
        val rows = batch.toArray
        val n = rows.length
        // host side: resolve each row's accumulator slot
        var i = 0
        while (i < n) {
          val k = keyProj(rows(i))
          var g = groups.get(k)
          if (g == null) {
            g = Array.fill(nF)(Array.emptyDoubleArray)
            groups.put(k.copy(), g)
          }
          slots(i) = g
          i += 1
        }
        // device-shaped part: gather the batch's vectors, then one
        // contiguous sweep per function
        var f = 0
        while (f < nF) {
          val dt = fns(f).child.dataType
          var j = 0
          while (j < n) {
            val v = bound(f).eval(rows(j))
            vecs(j) = if (v == null) null
              else VecSum.toDoubles(v.asInstanceOf[ArrayData], dt)
            j += 1
          }
          VecSum.accumulateBatch(slots, f, vecs, n)
          f += 1
        }
        if (groups.size() >= maxGroups) flush()
        else Iterator.empty
      } ++ flush()
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): VecSumKernelExec =
    copy(child = newChild)
}

object VecSumKernelExec {
  /** Per-partition accumulator-map bound: past this many live groups
    * the map is flushed as partial rows (the final stage merges
    * same-key partials), bounding memory the way the stock partial
    * stage's sort-based fallback does. Overridable for tests via
    * [[MaxGroupsKey]]. */
  val MaxGroups = 4096
  val MaxGroupsKey = "spark.graft.kernelAgg.maxGroups"
}

/** Post-columnar-transition rule (the same seam as
  * [[DotKernelProjectRule]], second kernel class): swap the partial
  * ObjectHashAggregateExec for [[VecSumKernelExec]] when every
  * aggregate is a plain Partial-mode [[VecSum]] (no DISTINCT, no
  * FILTER) and the result expressions are the pass-through
  * grouping ++ buffer attributes partial aggregates always emit.
  * Opt-in via `spark.graft.kernelAgg.enabled`; the FINAL stage and
  * the shuffle between them stay stock. */
object VecSumKernelRule extends Rule[SparkPlan] {

  val EnabledKey = "spark.graft.kernelAgg.enabled"

  private def eligible(agg: ObjectHashAggregateExec): Boolean =
    agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(ae =>
        ae.mode == Partial && !ae.isDistinct && ae.filter.isEmpty &&
          ae.aggregateFunction.isInstanceOf[VecSum]) &&
      agg.resultExpressions.forall(_.isInstanceOf[Attribute]) &&
      agg.resultExpressions.length ==
        agg.groupingExpressions.length + agg.aggregateExpressions.length &&
      agg.groupingExpressions.forall(_.deterministic)

  override def apply(plan: SparkPlan): SparkPlan =
    if (org.apache.spark.sql.internal.SQLConf.get
        .getConfString(EnabledKey, "false") != "true") plan
    else plan.transformUp {
      case agg: ObjectHashAggregateExec if eligible(agg) =>
        VecSumKernelExec(agg.groupingExpressions, agg.aggregateExpressions,
          agg.output, agg.child)
    }
}
