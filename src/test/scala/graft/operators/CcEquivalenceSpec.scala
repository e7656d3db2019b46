package graft.operators

import graft.SparkSpec

import scala.util.Random

class CcEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("local and distributed CC agree on a 10k-edge random graph") {
    val rnd = new Random(61)
    val edges = Seq.fill(10000)((rnd.nextInt(4000).toLong, rnd.nextInt(4000).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
      .repartition(16)
    val local = ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = ConnectedComponents
      .run(edges, localThreshold = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(local == dist, "local union-find and distributed rounds disagree at 10k edges")
  }

  test("reliable-checkpoint mode (conf-driven) returns the same labeling") {
    // With a checkpoint dir configured on the context, CC's lineage cuts
    // switch from localCheckpoint to RELIABLE checkpoint() — results must
    // be identical in both modes, on both algorithm paths.
    val rnd = new Random(47)
    val edges = Seq.fill(3000)((rnd.nextInt(1200).toLong, rnd.nextInt(1200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val localMode = ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distLocalCp = ConnectedComponents
      .run(edges, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cpDir = java.nio.file.Files.createTempDirectory("graft-cc-cp")
    spark.sparkContext.setCheckpointDir(cpDir.toString)
    try {
      val reliableLocal =
        ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reliableDist = ConnectedComponents
        .run(edges, localThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliableLocal == localMode, "reliable checkpoint changed the union-find result")
      assert(reliableDist == distLocalCp, "reliable checkpoint changed the rounds result")
      // Reliable mode must have actually engaged: checkpoint() writes
      // rdd-N directories under the configured dir (setCheckpointDir's
      // own UUID subdir exists regardless, so a bare existence check
      // would be vacuous).
      val wroteRdd = java.nio.file.Files
        .walk(cpDir)
        .anyMatch(p => p.getFileName != null && p.getFileName.toString.startsWith("rdd-"))
      assert(wroteRdd, "checkpoint dir was configured but no rdd checkpoint was written")
    } finally {
      // The context-level setting would otherwise leak into every later
      // suite on this shared session; null restores the unset state.
      org.apache.spark.sql.graftshim.ColumnBridge.clearCheckpointDir(spark.sparkContext)
    }
  }

  test("local union-find, distributed min-label, and GraphX CC all agree on random graphs") {
    val rnd = new Random(29)
    (1 to 2).foreach { trial =>
      val edges = Seq.fill(120)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
        .filter { case (a, b) => a != b }
        .toDF("src", "dst")
      // Default run takes the single-task union-find path (tiny graph);
      // localThreshold = 0 forces the distributed label-propagation rounds.
      val local = ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dist = ConnectedComponents
        .run(edges, localThreshold = 0L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val gx = GraphXConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local == gx, s"trial $trial: local union-find CC != GraphX CC")
      assert(dist == gx, s"trial $trial: distributed CC != GraphX CC")
    }
  }
}
