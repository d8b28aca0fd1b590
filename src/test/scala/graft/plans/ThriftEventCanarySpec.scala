package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Compile-against-the-installed-Spark canary for [[QueryGate]]'s
  * structural match on the Thrift server's operation events. The
  * events (o.a.s.sql.hive.thriftserver.ui.SparkListenerThriftServer
  * Operation{Start,Finish,Error,Canceled,Closed}) are
  * `private[thriftserver]` in Scala, so QueryGate resolves them by
  * SIMPLE CLASS NAME and reads `id()` / `groupId()` reflectively. A
  * Spark upgrade can rename either silently; without this spec the
  * only symptom is ServiceSpec timing out 30 s into an end-to-end
  * run (or, in production, a permit leak). Here each event class is
  * instantiated directly (JVM-public constructor via reflection,
  * dummy args) and the exact accessors QueryGate invokes are called —
  * a rename fails in milliseconds, naming the missing accessor. */
class ThriftEventCanarySpec extends AnyFunSuite {

  private val pkg = "org.apache.spark.sql.hive.thriftserver.ui"

  /** Instantiate `className` via its sole constructor with
    * type-appropriate dummy arguments. */
  private def mk(className: String): AnyRef = {
    val cls = Class.forName(s"$pkg.$className")
    val ctor = cls.getConstructors.minBy(_.getParameterCount)
    val args = ctor.getParameterTypes.map {
      case c if c == classOf[String] => "x"
      case c if c == java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
      case c if c == java.lang.Integer.TYPE => java.lang.Integer.valueOf(0)
      case c if c == java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
      case c if c == classOf[scala.Option[_]] => scala.None
      case _ => null
    }
    ctor.newInstance(args.toIndexedSeq: _*).asInstanceOf[AnyRef]
  }

  /** The accessor exactly as QueryGate reads it. */
  private def strField(e: AnyRef, f: String): String =
    e.getClass.getMethod(f).invoke(e).asInstanceOf[String]

  test("operation-start event exposes id() and groupId()") {
    val e = mk("SparkListenerThriftServerOperationStart")
    assert(strField(e, "id") == "x")
    assert(strField(e, "groupId") == "x")
  }

  test("every operation-end event QueryGate matches exposes id()") {
    for (name <- Seq("SparkListenerThriftServerOperationFinish",
        "SparkListenerThriftServerOperationError",
        "SparkListenerThriftServerOperationCanceled",
        "SparkListenerThriftServerOperationClosed")) {
      val e = mk(name)
      assert(strField(e, "id") == "x", s"$name.id()")
      // the simple-name dispatch in QueryGate depends on the class
      // name itself — pin it too
      assert(e.getClass.getSimpleName == name)
    }
  }
}
