package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's native functions
  * into the session FunctionRegistry, so SQL and `expr(...)` can call
  * them like built-ins: `SELECT graft_cosine(embedding, query) ...`.
  * Wired by graft.engine.Sessions via `builder.withExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(arrayA, arrayB) takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
