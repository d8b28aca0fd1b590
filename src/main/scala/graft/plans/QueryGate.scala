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
  * Release rides the ASYNC listener bus, which can drop events under
  * queue overflow — a dropped finish event must never leak a permit
  * forever (a leaked permit shrinks the pool until every statement
  * sheds [426]). Two backstops close that hole:
  *   - [[install]] is idempotent: re-installing on a session removes
  *     the previous release listener first, so a stale listener can
  *     never win the `held` race and release into the OLD pool;
  *   - a reconciliation sweep ([[reconcile]], run opportunistically
  *     from [[admit]]) releases held entries older than a TTL whose
  *     work is provably finished — an execution-keyed entry whose
  *     execution id no longer resolves, or any entry past the hard
  *     TTL (a long-lived legitimate statement loses its permit early,
  *     which briefly oversubscribes the pool — strictly better than a
  *     permanent leak, and the double-release guard in `release`
  *     keeps the eventual real finish event a no-op).
  *
  * Installed only on sessions that opt in ([[QueryGate.install]] —
  * `graft.Service` does); every other session sees a no-op rule. The
  * rule itself never alters the plan.
  */
object QueryGate {

  private final case class Gate(admission: Admission, pool: String,
                                listener: SparkListener)

  private val registry = new ConcurrentHashMap[SparkSession, Gate]()
  /** (session, permit key) → acquire time (ms); keys are
    * "g:<jobGroup>" (statement-scoped) or "e:<executionId>". */
  private val held =
    new ConcurrentHashMap[(SparkSession, String), java.lang.Long]()
  /** thrift operation id → its statement's job group (populated from
    * the operation-start event, consumed by the end events). */
  private val opGroup = new ConcurrentHashMap[String, String]()

  /** Hard TTL for the reconciliation sweep: a held permit older than
    * this is released even if liveness can't be disproven. */
  @volatile private[plans] var reconcileTtlMs: Long = 10L * 60 * 1000
  private val lastSweep = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Gate `spark`'s statements on `admission`'s `pool`. Registers the
    * release listener. Idempotent per session: a re-install removes
    * the prior listener (and releases its outstanding permits into
    * its own pool) — without this, the OLD listener races the new one
    * on `held` and over-releases the old semaphore while permanently
    * leaking a permit from the new pool. */
  def install(spark: SparkSession, admission: Admission,
              pool: String = Admission.Query): Unit = {
    val listener = new SparkListener {
      private def release(key: String): Unit =
        if (held.remove((spark, key)) != null) admission.exit(pool)
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
      // ThriftEventCanarySpec pins the class/accessor names against
      // the installed Spark build.
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
    }
    val prev = registry.put(spark, Gate(admission, pool, listener))
    if (prev != null) {
      spark.sparkContext.removeSparkListener(prev.listener)
      drainHeld(spark, prev)
    }
    spark.sparkContext.addSparkListener(listener)
  }

  /** Stop gating `spark`: remove the release listener and return its
    * outstanding permits to their own pool. */
  def uninstall(spark: SparkSession): Unit = {
    val prev = registry.remove(spark)
    if (prev != null) {
      spark.sparkContext.removeSparkListener(prev.listener)
      drainHeld(spark, prev)
    }
  }

  /** Release every permit `spark` holds back into `gate`'s pool. */
  private def drainHeld(spark: SparkSession, gate: Gate): Unit = {
    val it = held.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if ((k._1 eq spark) && held.remove(k) != null)
        gate.admission.exit(gate.pool)
    }
  }

  /** Test/monitoring hook: permits currently held by `spark`. */
  def heldBy(spark: SparkSession): Int = {
    val it = held.keySet.iterator()
    var n = 0
    while (it.hasNext) if (it.next()._1 eq spark) n += 1
    n
  }

  /** Release held entries whose work is over but whose finish event
    * the listener bus dropped. An "e:" entry is released as soon as
    * its execution id stops resolving (and it is older than
    * `graceMs` — the id registers only once the execution RUNS, so a
    * just-admitted plan-time entry must not be swept); any entry
    * older than the hard TTL is released unconditionally. Runs in
    * O(|held|), which is bounded by pool + queue size. */
  private[plans] def reconcile(session: SparkSession,
                               now: Long = System.currentTimeMillis(),
                               graceMs: Long = 30000L): Unit = {
    val gate = registry.get(session)
    if (gate == null) return
    val it = held.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (s, key) = e.getKey
      if (s eq session) {
        val age = now - e.getValue
        val dead = age > reconcileTtlMs ||
          (age > graceMs && key.startsWith("e:") &&
            key.drop(2).toLongOption.exists(
              SQLExecution.getQueryExecution(_) == null))
        if (dead && held.remove(e.getKey) != null)
          gate.admission.exit(gate.pool)
      }
    }
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
    // opportunistic leak sweep, at most once per 30 s across sessions
    val now = System.currentTimeMillis()
    val last = lastSweep.get
    if (now - last > 30000L && lastSweep.compareAndSet(last, now))
      reconcile(session, now)
    val sc = session.sparkContext
    val key =
      Option(sc.getLocalProperty("spark.jobGroup.id")).map(g => s"g:$g")
        .orElse(Option(sc.getLocalProperty(SQLExecution.EXECUTION_ID_KEY))
          .map(e => s"e:$e"))
        .orNull
    if (key == null) return
    val k = (session, key)
    if (held.containsKey(k)) return
    if (reg.admission.enter(reg.pool) &&
        held.putIfAbsent(k, java.lang.Long.valueOf(now)) != null)
      reg.admission.exit(reg.pool) // lost an admit race for the same statement
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
