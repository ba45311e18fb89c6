package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("c34 patchify: full grid per image, offsets within the RGB buffer") {
    val r = Multimodal.c34Patchify(spark, sf)
    assert(r.count() > 0)
    // every retained image carries exactly n_cols*n_rows patches, indexed 0..n-1
    val bad = r.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("patch_idx").as("mx"),
        first("n_cols").as("c"), first("n_rows").as("rw"))
      .filter(col("n") =!= col("c") * col("rw") || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
    // patch origins stay inside the resized frame and offsets are in-bounds
    val dims = Multimodal.c16ResizePlan(spark, sf).select("doc_id", "out_w", "out_h")
    val oob = r.join(dims, "doc_id").filter(
      col("px") + Multimodal.PatchSide > col("out_w") ||
      col("py") + Multimodal.PatchSide > col("out_h") ||
      col("byte_offset") < 4 ||
      col("byte_offset") >= lit(4) + col("out_w") * col("out_h") * 3)
    assert(oob.count() == 0)
  }
}
