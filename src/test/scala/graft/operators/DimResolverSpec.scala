package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DimResolverSpec extends SparkSpec {
  import spark.implicits._

  test("J4 get-or-create: only unseen names inserted, keys deterministic") {
    val dim = Seq(("k-ca", "CA")).toDF("region_id", "name")
    val incoming = Seq("CA", "TX", "TX", "NY").toDF("name")
    val (dim1, created) = DimResolver.getOrCreate(dim, incoming)
    assert(dim1.count() == 3 && created.count() == 2)
    // deterministic: re-running the same create yields identical keys
    val (dim2, _) = DimResolver.getOrCreate(dim, incoming)
    assert(dim1.exceptAll(dim2).isEmpty)
    // resolved facts carry the dim key
    val facts = Seq(("TX", 1), ("CA", 2)).toDF("name", "v")
    val resolved = DimResolver.resolveKeys(facts, dim1, "name")
    assert(resolved.filter($"name" === "CA").select("region_id")
      .as[String].head() == "k-ca")
  }
}
