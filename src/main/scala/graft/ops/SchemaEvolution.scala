package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Schema evolution on file-backed tables (SURVEY.md §2.1 S10): the
  * reference probes information_schema and issues
  * `ALTER TABLE sources ADD COLUMN color`
  * (/root/reference/dags/etl/populate_sources_dag.py:89-107). A parquet
  * table has no ALTER; the equivalent is a guarded projection to the
  * superset schema at write time — existing rows take the default,
  * frames already carrying the column pass through untouched.
  */
object SchemaEvolution {

  /** Add each column that is absent, with its default expression;
    * present columns are left exactly as-is (the reference's
    * IF NOT EXISTS probe). */
  def ensureColumns(df: DataFrame, defaults: Seq[(String, Column)]): DataFrame =
    defaults.foldLeft(df) { case (d, (name, default)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, default)
    }
}
