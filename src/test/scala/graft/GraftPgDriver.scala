package graft

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, PreparedStatement, Statement}
import java.util.Properties
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import java.util.logging.Logger

/** A SECOND JDBC dialect for the io/Jdbc{Source,Writer} suite — within
  * what a zero-egress image allows. No second RDBMS engine ships here
  * (no H2/HSQLDB/SQLite jar resolves offline), so this is a test-scope
  * java.sql.Driver registered under `jdbc:graftpg:` that delegates
  * STORAGE to embedded Derby while exhibiting, at the JDBC seam, the
  * driver behavior the PostgreSQL/MySQL/Oracle family differs on and
  * Derby never shows:
  *
  *  - `PreparedStatement.executeBatch` returns
  *    `Statement.SUCCESS_NO_INFO` for every element (MySQL with
  *    rewriteBatchedStatements, Oracle's default batching, PgJDBC's
  *    batched-rewrite path) — the exact signal
  *    [[graft.io.JdbcWriter]]'s absent-row detection must NOT read as
  *    "present" (a guessed present silently drops inserts). Until this
  *    shim, no driver under test ever returned it, so the fallback
  *    (re-probe per row with an exact-count executeUpdate) was dead
  *    code in the suite.
  *
  * Because the underlying engine is the same Derby database, a
  * bootstrap written through `jdbc:derby:` is visible through
  * `jdbc:graftpg:` — specs can bootstrap DDL through Spark's JDBC
  * writer and then exercise the dialect path on the same rows, and any
  * behavioral divergence between the two URLs is BY CONSTRUCTION the
  * shimmed driver behavior, not storage noise.
  *
  * [[noInfoBatches]] counts intercepted executeBatch calls so a spec
  * can prove the withheld-count path actually ran.
  */
class GraftPgDriver extends Driver {
  import GraftPgDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours -> null
    val real = DriverManager.getConnection(
      "jdbc:derby:" + url.stripPrefix(Prefix), info)
    proxy[Connection](real, classOf[Connection]) { (m, args, target) =>
      val r = invoke(m, args, target)
      if (m.getName == "prepareStatement" && r != null)
        proxy[PreparedStatement](r, classOf[PreparedStatement]) { (m2, args2, t2) =>
          if (m2.getName == "executeBatch") {
            // run the real batch (rows DO land), withhold the counts —
            // the family behavior under test
            val counts = invoke(m2, args2, t2).asInstanceOf[Array[Int]]
            noInfoBatches.incrementAndGet()
            Array.fill(counts.length)(Statement.SUCCESS_NO_INFO)
          } else invoke(m2, args2, t2)
        }
      else r
    }
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: Logger = Logger.getLogger("graftpg")
}

object GraftPgDriver {
  val Prefix = "jdbc:graftpg:"

  /** executeBatch calls whose counts were withheld — spec evidence the
    * SUCCESS_NO_INFO path actually executed. */
  val noInfoBatches = new AtomicLong

  private val registered = new AtomicBoolean(false)

  /** Idempotent DriverManager registration (specs call this in setup;
    * DriverRegistry instantiates by class name on executors, where the
    * no-arg constructor suffices). */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true))
      DriverManager.registerDriver(new GraftPgDriver): Unit

  private def invoke(m: Method, args: Array[AnyRef], target: AnyRef): AnyRef =
    try m.invoke(target, args: _*)
    catch { case e: InvocationTargetException => throw e.getCause }

  private def proxy[T](target: AnyRef, iface: Class[T])(
      handler: (Method, Array[AnyRef], AnyRef) => AnyRef): T =
    Proxy.newProxyInstance(
      iface.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          handler(m, if (args == null) Array.empty else args, target)
      }).asInstanceOf[T]
}
