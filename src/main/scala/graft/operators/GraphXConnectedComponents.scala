package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX-backed connected components with the same contract as the
  * DataFrame [[ConnectedComponents]]: (node, comp) where comp is the min
  * node id of the component. Kept as a swappable alternative (SURVEY §7.6):
  * GraphX's Pregel implementation wins on deep/graph-shaped data, the
  * DataFrame min-label loop keeps everything in Catalyst/Tungsten and AQE —
  * `CcEquivalenceSpec` pins them equal so either can back `er_cluster`.
  */
object GraphXConnectedComponents {

  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val spark: SparkSession = edges.sparkSession
    val edgeRdd = edges
      .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph.fromEdges(edgeRdd, ())
    // GraphX labels components by min vertex id — same convention as the
    // DataFrame implementation.
    val comps = graph.connectedComponents().vertices
    import spark.implicits._
    comps.toDF("node", "comp")
  }
}
