package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{ExtensionCatalog, ReferenceCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* catalogs; this object is the stable
  * façade the driver invokes. */
object SparkEntry {

  private def catalogs = ReferenceCatalog.all ++ ExtensionCatalog.all

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows > 0): revenue by region — lineitem ⋈ orders ⋈ customer ⋈
    * nation ⋈ region with partial-agg-friendly grouping, the archetypal
    * star join this engine is shaped around. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(desc("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2. ListMap:
    * callers iterate in CATALOG order (a plain toMap hashes the order,
    * so the dedup family's shared-stage build cost would land on an
    * arbitrary family member in benchmarks — with catalog order, x06
    * pays for candidates, x16 for verification, x18 for clusters). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap.from(catalogs.map(q => q.name -> q.fn))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap.from(
      catalogs.flatMap(q => q.sql.map(q.name -> _)))
}
