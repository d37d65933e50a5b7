package graft.sources

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Dialect shim for embedded DuckDB over Spark's JDBC source — the
  * per-database piece every JDBC connector deployment ships (the
  * reference's flink-connector-jdbc has the same concept as
  * `JdbcDialect`s per backend). Spark's generic dialect classifies
  * "object not found" by SQLState, which DuckDB's driver doesn't set,
  * so `tableExists` would rethrow instead of answering false; DuckDB
  * signals it in the message text.
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  override def isObjectNotFoundException(e: SQLException): Boolean = {
    // only MISSING RELATIONS count: DuckDB also says "does not exist"
    // for columns ("Binder Error: Referenced column ...") and for
    // functions/types ("Catalog Error: Scalar Function with name f
    // does not exist!"), and classifying those as table-missing would
    // send SaveMode paths into CREATE TABLE instead of surfacing the
    // real error. DuckDB's missing-relation messages are exactly
    // "Table with name X does not exist" / "View ..." / "Schema ...".
    val m = e.getMessage
    m != null && m.contains("does not exist") &&
      (m.contains("Table with name") || m.contains("View with name") ||
        m.contains("Schema with name"))
  }

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  @volatile private var registered = false

  /** Idempotently install the dialect (registerDialect prepends a
    * copy on every call, so guard). */
  def ensureRegistered(): Unit =
    if (!registered) synchronized {
      if (!registered) {
        JdbcDialects.registerDialect(this)
        registered = true
      }
    }
}
