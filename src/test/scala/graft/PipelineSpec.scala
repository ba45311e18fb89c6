package graft

import java.nio.file.Files

class PipelineSpec extends SparkTestBase {

  test("run_entire_process composition: counts are consistent end-to-end") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val r = Pipeline.runEntireProcess(spark, sf, out)
    assert(r.searchTiles > 0)
    assert(r.scored > 0)
    assert(r.positives > 0)
    assert(r.clusters > 0 && r.clusters <= r.positives)
    assert(r.unmappedClusters <= r.clusters)
    // every challenge line belongs to a positive tile of an unmapped cluster
    assert(r.challengeLines <= r.positives)
    val first = spark.read.text(s"$out/challenge").head.getString(0)
    assert(first.contains("\"prediction_confidence\""))
    // clustered variant: exactly one document per unmapped cluster, each
    // a parseable FeatureCollection with a closed polygon ring
    assert(r.clusteredChallengeLines == r.unmappedClusters)
    val cc = spark.read.json(s"$out/challenge_clustered")
    assert(cc.count() == r.unmappedClusters)
    val doc = spark.read.text(s"$out/challenge_clustered").head.getString(0)
    assert(doc.startsWith("{\"type\": \"FeatureCollection\""))
    assert(doc.contains("\"coordinates\": [["))
  }
}
