package graft
object TmpOrder {
  def main(args: Array[String]): Unit = {
    val ks = SparkEntry.queries.keys.toSeq
    val i = ks.indexOf("x11_analyze_stats")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/order.txt"),
      s"idx=$i of ${ks.size}\n" + ks.zipWithIndex.map{case(k,j)=>s"$j $k"}.mkString("\n"))
  }
}
