package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.GraftCatalog
import graft.pipeline.GraftPipeline
import graft.write.{Append, Disposition, WriteConfig}

/** Top-level facade — the engine's equivalents of the reference's two
  * user entry points: `pipeline.run(resource)` (write path, §3.1) and
  * `pipeline.dataset().query(sql)` (read path, §3.2).
  *
  * {{{
  * val p = Graft.pipeline(spark, "/warehouse", namespace = "main")
  * p.run(df, "events")                                   // append
  * p.run(updates, "users", Merge("upsert"),
  *   WriteConfig(primaryKey = Seq("user_id")))           // merge
  * val ds = p.dataset()
  * ds.query("SELECT event_type, count(*) FROM events GROUP BY 1")
  * ds.table("users")                                      // DataFrame
  * }}}
  */
object Graft {
  def pipeline(spark: SparkSession, warehouse: String,
      namespace: String = "main", schemaName: String = "default",
      pipelineName: String = "pipeline"): GraftFacade =
    new GraftFacade(new GraftCatalog(spark, warehouse), namespace,
      schemaName, pipelineName)
}

final class GraftFacade(
    val catalog: GraftCatalog,
    namespace: String,
    schemaName: String,
    pipelineName: String) {

  val pipeline = new GraftPipeline(catalog, namespace, schemaName, pipelineName)

  /** One-call load: stage + complete, one snapshot per table — the
    * reference's `pipeline.run(resource, table_name=...,
    * write_disposition=..., primary_key=...)`. Returns the load id. */
  def run(df: DataFrame, table: String,
      disposition: Disposition = Append,
      cfg: WriteConfig = WriteConfig(),
      loadId: String = s"load-${java.util.UUID.randomUUID()}"): String = {
    pipeline.stage(table, df, disposition, cfg)
    pipeline.completeLoad(loadId)
    loadId
  }

  /** Read surface over the committed tables — the reference's
    * `pipeline.dataset()` backed by DuckDB views (`sql_client.py:101-149`),
    * here Spark temp views re-resolved to the CURRENT snapshot on every
    * call ("always replace view", sql_client.py:51-55). */
  def dataset(): GraftDataset = new GraftDataset(catalog, namespace)
}

final class GraftDataset(catalog: GraftCatalog, namespace: String) {

  /** Current-snapshot DataFrame for one table. */
  def table(name: String): DataFrame =
    catalog.loadTable(namespace, name).read()

  /** Register every committed table (including `_dlt_*`) as a temp view
    * at its CURRENT snapshot and run the SQL through Spark. */
  def query(sql: String): DataFrame = {
    catalog.listTables(namespace).foreach { t =>
      table(t).createOrReplaceTempView(t)
    }
    catalog.spark.sql(sql)
  }
}
