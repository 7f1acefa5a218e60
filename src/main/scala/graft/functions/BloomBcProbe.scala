package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom probe over a BROADCAST filter — the shipping shape of
  * the r9 Scala UDF with the execution shape of a native expression.
  *
  * Measured motivation (SCALING.md r10): the first native attempt
  * embedded the serialized filter as a binary literal (the shape of
  * Spark's own injected runtime filters). At the 30× probe the filter is
  * ~8 MB, and a literal that size rides the per-stage task binary —
  * every task deserializes it, and every plan transform hashes it:
  * 9.1s warm vs the interpreted UDF's 4.3s. This is exactly why Spark
  * caps its injected filters at `runtime.bloomFilter.maxNumBits` (8 MB).
  * A Broadcast ships once per executor and the expression's references
  * array carries only the stub — while `mightContainLong` compiles into
  * the scan's WholeStageCodegen span (no per-row boxing, no
  * ScalaUDF interpreter).
  *
  * Construction: the filter is a RUNTIME object, so the function-registry
  * builder cannot receive it directly; [[BloomBcProbe.column]] parks the
  * broadcast in a driver-side registry under a fresh id and the builder
  * rehydrates it from the id literal at analysis time (analysis runs on
  * the driver; executors only ever see the serialized expression, which
  * carries the broadcast handle itself).
  */
case class BloomBcMightContain(bcId: Long,
    bc: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe requires a BIGINT argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def nullSafeEval(input: Any): Any =
    bc.value.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bc,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBcMightContain =
    copy(child = newChild)
}

object BloomBcProbe {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[Long, Broadcast[BloomFilter]]
  private val nextId = new java.util.concurrent.atomic.AtomicLong()

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_bloom_probe")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BloomBcMightContain].getName, "graft_bloom_probe")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_bloom_probe takes (broadcast id, value)")
    val id = children.head match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"graft_bloom_probe expects a literal broadcast id, got $other")
    }
    val bc = registry.get(id)
    require(bc != null, s"graft_bloom_probe: unknown broadcast id $id")
    BloomBcMightContain(id, bc, children(1))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)

  /** Probe column `might_contain(filter, valueCol)` with the filter
    * broadcast once per executor. The registry entry serves driver-side
    * analysis (including any later re-analysis of the same plan); one
    * small handle is retained per built query — bounded by builds, not
    * by data.
    */
  def column(spark: SparkSession, filter: BloomFilter,
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    ensureRegistered(spark)
    val bc = spark.sparkContext.broadcast(filter)
    val id = nextId.incrementAndGet()
    registry.put(id, bc)
    org.apache.spark.sql.functions.call_function("graft_bloom_probe",
      org.apache.spark.sql.functions.lit(id), value)
  }

  // cacheKey → registry id, scoped to a SparkContext incarnation so a
  // restarted context never resurrects a dead broadcast handle
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]

  /** [[column]] with the filter BUILT AND BROADCAST at most once per
    * (SparkContext, cacheKey). A bare `column` call per query build
    * leaks one multi-MB broadcast per rebuild in a long-lived session
    * (~8 MB each at the 30× probe) — and the filter construction itself
    * is a full scan of the probe side. Rebuilding the same query reuses
    * both. `release()` drops everything deterministically.
    */
  def cachedColumn(spark: SparkSession, cacheKey: String,
      value: org.apache.spark.sql.Column)(
      build: => BloomFilter): org.apache.spark.sql.Column = {
    ensureRegistered(spark)
    val sc = spark.sparkContext
    val k = s"${sc.applicationId}/${sc.startTime}:$cacheKey"
    val id = cache.computeIfAbsent(k, _ => {
      val bc = sc.broadcast(build)
      val i = nextId.incrementAndGet()
      registry.put(i, bc)
      i
    })
    org.apache.spark.sql.functions.call_function("graft_bloom_probe",
      org.apache.spark.sql.functions.lit(id), value)
  }

  /** Destroy every parked broadcast and clear the registry/cache — the
    * cleanup hook for a long-lived session between pipeline runs (the
    * analogue of [[graft.Memo.release]]). Plans already analyzed keep
    * their own broadcast handle inside the expression; only UN-analyzed
    * plans referencing a released id would fail, loudly, at analysis.
    */
  def release(): Unit = {
    cache.clear()
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); it.remove()
      try e.getValue.destroy() catch { case _: Throwable => }
    }
  }

  /** Registry size (specs: proves cachedColumn bounds handle growth). */
  def registeredCount: Int = registry.size()
}
