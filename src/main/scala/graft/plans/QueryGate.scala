package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SQLExecution
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd

import graft.engine.Admission

/** Per-statement admission control for the SQL daemon — the analog of
  * the reference shedding load with [426] on every RPC entry
  * (/root/reference/internal/rez/mercy.go: bounded pools, bounded
  * waiter queues, fail-fast beyond). The reference's unit of admission
  * is the gRPC call; ours is the JDBC STATEMENT: its first pass
  * through the optimizer takes one permit of the engine's
  * [[graft.engine.Admission]] "query" pool — a saturated pool QUEUES
  * the calling Thrift worker, a full waiter queue SHEDS the statement
  * with the retryable [426] error — and the permit is released when
  * the Thrift server posts the operation's finish/error/cancel event.
  * One permit covers the statement's whole lifetime, however many
  * Spark executions and jobs it spawns.
  *
  * Anchoring on the statement's JOB GROUP (the Thrift operation sets
  * one per statement before touching the session) rather than the SQL
  * execution id is deliberate: the Thrift layer materializes the
  * query plan at statement prep, OUTSIDE any execution, so an
  * execution-scoped hook never fires for it. Plain in-session actions
  * (no job group) are gated per SQL execution instead, released on
  * the execution-end event.
  *
  * Installed only on sessions that opt in ([[QueryGate.install]] —
  * `graft.Service` does); every other session sees a no-op rule. The
  * rule itself never alters the plan.
  */
object QueryGate {

  private val registry =
    new ConcurrentHashMap[SparkSession, (Admission, String)]()
  /** (session, permit key) currently holding a pool permit; keys are
    * "g:<jobGroup>" (statement-scoped) or "e:<executionId>". */
  private val held =
    ConcurrentHashMap.newKeySet[(SparkSession, String)]()
  /** thrift operation id → its statement's job group (populated from
    * the operation-start event, consumed by the end events). */
  private val opGroup = new ConcurrentHashMap[String, String]()

  /** Gate `spark`'s statements on `admission`'s `pool`. Registers the
    * release listener; call once per session. */
  def install(spark: SparkSession, admission: Admission,
              pool: String = Admission.Query): Unit = {
    registry.put(spark, (admission, pool))
    spark.sparkContext.addSparkListener(new SparkListener {
      private def release(key: String): Unit =
        if (held.remove((spark, key))) admission.exit(pool)
      private def releaseOp(opId: String): Unit = {
        val g = opGroup.remove(opId)
        if (g != null) release(s"g:$g")
      }
      // The Thrift operation events
      // (o.a.s.sql.hive.thriftserver.ui.SparkListenerThriftServer
      // Operation{Start,Finish,Error,Canceled,Closed}) are
      // `private[thriftserver]` in their Scala signature, so they are
      // matched structurally: JVM-public case-class accessors `id()`
      // and `groupId()` via reflection. Listener events are low-rate
      // (a handful per statement), so reflection cost is noise.
      private def strField(e: SparkListenerEvent, f: String): String =
        e.getClass.getMethod(f).invoke(e).asInstanceOf[String]
      override def onOtherEvent(event: SparkListenerEvent): Unit =
        event match {
          case e: SparkListenerSQLExecutionEnd => release(s"e:${e.executionId}")
          case e =>
            e.getClass.getSimpleName match {
              case "SparkListenerThriftServerOperationStart" =>
                opGroup.put(strField(e, "id"), strField(e, "groupId"))
              case "SparkListenerThriftServerOperationFinish" |
                   "SparkListenerThriftServerOperationError" |
                   "SparkListenerThriftServerOperationCanceled" |
                   "SparkListenerThriftServerOperationClosed" =>
                releaseOp(strField(e, "id"))
              case _ => ()
            }
        }
    })
  }

  /** Stop gating `spark` (in-flight permits still drain through the
    * release listener, which captured its admission directly). */
  def uninstall(spark: SparkSession): Unit = registry.remove(spark)

  /** Test/monitoring hook: permits currently held by `spark`. */
  def heldBy(spark: SparkSession): Int = {
    val it = held.iterator()
    var n = 0
    while (it.hasNext) if (it.next()._1 eq spark) n += 1
    n
  }

  /** Admit the work the current optimizer pass belongs to (idempotent
    * per statement / execution — the optimizer batch may iterate).
    * Blocks while queued; throws
    * [[graft.engine.ResourceExhaustedException]] on shed. Plans built
    * outside both a job group and an execution (plain analysis,
    * explain, plan-shape asserts) pass unguarded. */
  private[plans] def admit(session: SparkSession): Unit = {
    val reg = registry.get(session)
    if (reg == null) return
    val sc = session.sparkContext
    val key =
      Option(sc.getLocalProperty("spark.jobGroup.id")).map(g => s"g:$g")
        .orElse(Option(sc.getLocalProperty(SQLExecution.EXECUTION_ID_KEY))
          .map(e => s"e:$e"))
        .orNull
    if (key == null) return
    val k = (session, key)
    if (held.contains(k)) return
    val (adm, pool) = reg
    if (adm.enter(pool) && !held.add(k))
      adm.exit(pool) // lost an admit race for the same statement
  }
}

/** The injected optimizer rule carrying [[QueryGate.admit]] — a
  * plan-identity rule whose only effect is the admission side channel.
  */
final class QueryGateRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    QueryGate.admit(session)
    plan
  }
}
