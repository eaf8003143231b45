package graft

import org.apache.spark.sql.ColumnName

/** `$"col"` interpolator usable without a SparkSession in scope
  * (spark.implicits._ requires an instance; operator catalogs are static).
  */
object syntax {
  implicit class Dollar(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
