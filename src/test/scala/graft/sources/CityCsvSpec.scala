package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

class CityCsvSpec extends SparkTestBase {

  test("reads the reference's headerless city,state CSV with initial-space skipping") {
    val dir = Files.createTempDirectory("graft-citycsv")
    val p = dir.resolve("cities.csv")
    Files.writeString(p,
      "New York, New York\nLos Angeles,California\n Chicago , Illinois \nNoState,\n")
    val rows = CityCsv.read(spark, p.toString).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3) // the pairless row is dropped
    assert(rows.contains(("New York", "New York")))
    assert(rows.contains(("Chicago", "Illinois")))
  }

  test("write/read round-trip preserves the pair set") {
    val dir = Files.createTempDirectory("graft-citycsv-rt")
    val src = Files.createTempDirectory("graft-citycsv-src").resolve("c.csv")
    Files.writeString(src, "Austin, Texas\nBoise, Idaho\n")
    val df = CityCsv.read(spark, src.toString)
    CityCsv.write(df, s"$dir/out")
    val back = CityCsv.read(spark, s"$dir/out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("Austin", "Texas"), ("Boise", "Idaho")))
  }
}
