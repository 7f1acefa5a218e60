package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Codegen-preserving Bloom-filter probe: exposes Spark's internal
  * `BloomFilterMightContain` (the expression behind Catalyst's injected
  * runtime bloom filters) under a callable name, plus the byte
  * serialization that expression deserializes.
  *
  * Why (SURVEY.md §2.10 preference order, VERDICT r9 #3): the
  * decontamination prefilter probed via a per-row Scala UDF, which runs
  * interpreted and breaks the enclosing WholeStageCodegen span exactly on
  * the 100 TB side of the join (every train shingle). `might_contain` is
  * a native `Predicate` with `doGenCode` — the probe compiles into the
  * scan's codegen stage. The filter bytes ride the plan as a foldable
  * binary literal, the same shipping shape as Spark's own runtime-filter
  * subquery results (which is why Spark caps its injected filters at
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, 8 MiB default —
  * a deployment dials the estimate cap the same way).
  *
  * Not a custom Expression: the builtin has the exact semantics and
  * codegen; only the registry entry is missing (it is internal-only).
  *
  * MEASURED CAVEAT (r10, SCALING.md): a multi-MB literal rides the
  * per-stage task binary and is hashed by every plan transform — at the
  * 30× probe the 8 MB filter literal made the query 2× SLOWER than the
  * interpreted broadcast UDF. For filters past ~1 MB use
  * [[BloomBcProbe]], which keeps the codegen'd probe but ships the
  * filter as a Broadcast; this literal form remains correct (and fine
  * for small filters / SQL-text contexts).
  */
object BloomProbe {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_might_contain")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "graft_might_contain")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_might_contain takes exactly 2 arguments (bloom bytes, value)")
    BloomFilterMightContain(children.head, children(1))
  }

  /** Idempotent registration into an existing session (same contract as
    * [[FixedDot.ensureRegistered]]).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)

  /** Serialize a sketch BloomFilter to the byte form
    * `BloomFilterMightContain.deserialize` reads (`BloomFilter.readFrom`).
    */
  def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
