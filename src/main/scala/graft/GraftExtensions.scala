package graft

import graft.expressions.Md5Hash64
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: registers the library's native expressions as SQL
  * functions so `spark.sql("SELECT graft_md5hash64(x) ...")` works and the
  * DataFrame API can reach them by name. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_md5hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "graft_md5hash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_md5hash64 takes one argument")
        Md5Hash64(children.head)
      }))
  }
}
