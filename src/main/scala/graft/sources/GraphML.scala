package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** GraphML debug sink (reference S11, `graph/src/main/com/thymeflow/graph/
  * serialization/GraphML.scala`, used by AgentMatchEnricher's debug dumps).
  * Debug-only like the reference: collects to the driver — use on small
  * diagnostic graphs, never on the distributed path. */
object GraphML {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** nodes: (id, label); edges: (src, dst, label). */
  def serialize(nodes: DataFrame, edges: DataFrame): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" + "\n"
    sb ++= """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""" + "\n"
    sb ++= """  <key id="label" for="all" attr.name="label" attr.type="string"/>""" + "\n"
    sb ++= """  <graph edgedefault="directed">""" + "\n"
    nodes.select("id", "label").collect().foreach { r =>
      sb ++= s"""    <node id="${esc(r.get(0).toString)}"><data key="label">${esc(
        Option(r.get(1)).map(_.toString).getOrElse(""))}</data></node>""" + "\n"
    }
    edges.select("src", "dst", "label").collect().zipWithIndex.foreach { case (r, i) =>
      sb ++= s"""    <edge id="e$i" source="${esc(r.get(0).toString)}" target="${esc(
        r.get(1).toString)}"><data key="label">${esc(
        Option(r.get(2)).map(_.toString).getOrElse(""))}</data></edge>""" + "\n"
    }
    sb ++= "  </graph>\n</graphml>\n"
    sb.toString
  }

  def write(nodes: DataFrame, edges: DataFrame, path: String): Unit =
    Files.writeString(Paths.get(path), serialize(nodes, edges))
}
