package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeysSpec extends SparkSpec {
  import spark.implicits._

  test("surrogate keys are deterministic, distinct per input, null-safe parts") {
    val df = Seq(("2024-01-15", "CA"), ("2024-01-15", "TX"), ("2024-01-16", "CA"))
      .toDF("d", "r")
    val keyed = df.select(
      Keys.surrogateKey($"d", $"r").as("k"),
      Keys.surrogateKey64($"d", $"r").as("k64"))
    val again = df.select(
      Keys.surrogateKey($"d", $"r").as("k"),
      Keys.surrogateKey64($"d", $"r").as("k64"))
    assert(keyed.collect().toSeq == again.collect().toSeq) // deterministic
    assert(keyed.select("k").distinct().count() == 3)
    assert(keyed.select("k64").distinct().count() == 3)
    // md5 form matches the oracle-reproducible md5(concat) convention
    val k = keyed.select("k").as[String].head()
    assert(k.matches("[0-9a-f]{32}"))
  }
}
