package graft

import org.apache.spark.sql.types._

/** Round-trip specs for the pure-JDK xlsx codec (graft.sources.Xlsx):
  * the writer exists to prove the reader (the PNG/GIF-encoder pattern).
  */
class XlsxSpec extends GraftSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_xlsx_spec").resolve(name).toString

  test("round-trip with pandas-style type inference: long, double, boolean, string") {
    val p = tmp("mixed.xlsx")
    graft.sources.Xlsx.write(p,
      Seq("id", "score", "flag", "name"),
      Seq(
        Seq(1L, 1.5, true, "alpha"),
        Seq(2L, 2.0, false, "beta & <gamma> \"quoted\""),
        Seq(3L, -0.25, true, "alpha"))) // repeated string exercises shared-string reuse
    val df = graft.sources.Xlsx.read(spark, p)
    assert(df.schema === StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("flag", BooleanType), StructField("name", StringType))))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5, 2.0, -0.25))
    assert(rows.map(_.getBoolean(2)).toSeq === Seq(true, false, true))
    assert(rows(1).getString(3) === "beta & <gamma> \"quoted\"")
  }

  test("sparse rows: omitted cells read back as nulls, mixed column falls back to string") {
    val p = tmp("sparse.xlsx")
    graft.sources.Xlsx.write(p,
      Seq("a", "b", "c"),
      Seq(
        Seq(1L, null, "x"),
        Seq(null, 2.5, null),
        Seq(3L, "oops", "z"))) // b mixes num+string -> STRING
    val df = graft.sources.Xlsx.read(spark, p)
    assert(df.schema("a").dataType === LongType)
    assert(df.schema("b").dataType === StringType)
    val rows = df.collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(0) && rows(1).isNullAt(2))
    assert(rows(1).getString(1) === "2.5")
    assert(rows(2).getString(1) === "oops")
  }

  test("wide sheet: column refs beyond Z (AA+) land in the right positions") {
    val p = tmp("wide.xlsx")
    val width = 30
    val header = (0 until width).map(i => s"col$i")
    val row = (0 until width).map(i => i.toLong: Any)
    graft.sources.Xlsx.write(p, header, Seq(row))
    val df = graft.sources.Xlsx.read(spark, p)
    assert(df.columns.toSeq === header)
    val r = df.collect()(0)
    (0 until width).foreach(i => assert(r.getLong(i) === i.toLong))
  }

  test("sheet selection: default is first sheet; unknown sheet names fail loudly") {
    val p = tmp("sheets.xlsx")
    graft.sources.Xlsx.write(p, Seq("v"), Seq(Seq(42L)), sheetName = "Data")
    assert(graft.sources.Xlsx.read(spark, p).collect()(0).getLong(0) === 42L)
    assert(graft.sources.Xlsx.read(spark, p, Some("Data")).collect()(0).getLong(0) === 42L)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Xlsx.read(spark, p, Some("Nope"))
    }
    assert(e.getMessage.contains("Nope") && e.getMessage.contains("Data"))
  }
}
