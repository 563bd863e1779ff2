package graft.tools
import java.nio.file.{Files, Paths}
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(args(0))
    val m = new java.util.TreeMap[String, String]()
    graft.SparkEntry.oracleSql.foreach { case (k, v) => m.put(k, v) }
    val sb = new StringBuilder("{")
    var first = true
    m.forEach { (k, v) =>
      if (!first) sb.append(",")
      first = false
      sb.append("\"").append(k).append("\":")
      sb.append(com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(v))
    }
    sb.append("}")
    Files.write(out, sb.toString.getBytes("UTF-8"))
  }
}
