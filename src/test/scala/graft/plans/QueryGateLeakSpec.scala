package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SQLExecution
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Admission

/** Permit-leak backstops of [[QueryGate]]: release rides the async
  * listener bus, so a dropped finish event (listener-queue overflow)
  * or a second install on the same session must not leak pool permits
  * forever — leaked permits shrink the pool until every statement
  * sheds [426]. Exercises the reconciliation sweep (hard TTL and
  * execution-liveness paths) and the idempotent install/uninstall
  * drain, all with simulated clocks — no sleeps. */
class QueryGateLeakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("querygate-leak-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    QueryGate.uninstall(spark)
    spark.stop()
  }

  private def clearKeys(): Unit = {
    spark.sparkContext.clearJobGroup()
    spark.sparkContext.setLocalProperty(SQLExecution.EXECUTION_ID_KEY, null)
  }

  test("sweep releases a statement permit whose finish event was dropped") {
    val adm = new Admission(Map(Admission.Query -> 2), maxQueue = 1)
    QueryGate.install(spark, adm)
    try {
      spark.sparkContext.setJobGroup("qg-leak-g1", "spec", false)
      QueryGate.admit(spark)
      assert(QueryGate.heldBy(spark) == 1)
      assert(adm.gauges(Admission.Query).inUse == 1)
      // the finish event never arrives (dropped by the bus); before
      // the TTL the permit is legitimately held...
      QueryGate.reconcile(spark)
      assert(QueryGate.heldBy(spark) == 1)
      // ...past the hard TTL the sweep reclaims it
      QueryGate.reconcile(spark,
        now = System.currentTimeMillis() + QueryGate.reconcileTtlMs + 1000)
      assert(QueryGate.heldBy(spark) == 0)
      assert(adm.gauges(Admission.Query).inUse == 0)
    } finally { clearKeys(); QueryGate.uninstall(spark) }
  }

  test("sweep releases an execution permit once its id stops resolving") {
    val adm = new Admission(Map(Admission.Query -> 2), maxQueue = 1)
    QueryGate.install(spark, adm)
    try {
      // an execution id that provably isn't live: nothing registers it
      spark.sparkContext
        .setLocalProperty(SQLExecution.EXECUTION_ID_KEY, "987654321")
      QueryGate.admit(spark)
      assert(QueryGate.heldBy(spark) == 1)
      // past the grace window (but far under the TTL) the liveness
      // check — SQLExecution.getQueryExecution == null — reclaims it
      QueryGate.reconcile(spark,
        now = System.currentTimeMillis() + 60000)
      assert(QueryGate.heldBy(spark) == 0)
      assert(adm.gauges(Admission.Query).inUse == 0)
    } finally { clearKeys(); QueryGate.uninstall(spark) }
  }

  test("re-install drains the old gate instead of racing it") {
    val admA = new Admission(Map(Admission.Query -> 2), maxQueue = 1)
    val admB = new Admission(Map(Admission.Query -> 2), maxQueue = 1)
    QueryGate.install(spark, admA)
    try {
      spark.sparkContext.setJobGroup("qg-leak-g2", "spec", false)
      QueryGate.admit(spark)
      assert(admA.gauges(Admission.Query).inUse == 1)
      // second install: the old listener is removed and the old
      // gate's outstanding permit returns to ITS OWN pool — the new
      // pool starts whole
      QueryGate.install(spark, admB)
      assert(QueryGate.heldBy(spark) == 0)
      assert(admA.gauges(Admission.Query).inUse == 0)
      assert(admB.gauges(Admission.Query).inUse == 0)
      // and the fresh gate admits normally
      QueryGate.admit(spark)
      assert(admB.gauges(Admission.Query).inUse == 1)
    } finally { clearKeys(); QueryGate.uninstall(spark) }
  }

  test("uninstall returns outstanding permits") {
    val adm = new Admission(Map(Admission.Query -> 2), maxQueue = 1)
    QueryGate.install(spark, adm)
    spark.sparkContext.setJobGroup("qg-leak-g3", "spec", false)
    QueryGate.admit(spark)
    assert(adm.gauges(Admission.Query).inUse == 1)
    QueryGate.uninstall(spark)
    clearKeys()
    assert(QueryGate.heldBy(spark) == 0)
    assert(adm.gauges(Admission.Query).inUse == 0)
  }
}
