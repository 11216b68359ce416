package graft.tools

object CatalogCount {
  def main(args: Array[String]): Unit = {
    val c = graft.SparkEntry.catalog
    println(s"COUNT ${c.size} ORACLE ${c.count(_.oracle.isDefined)}")
    println("NO_ORACLE " + c.filter(_.oracle.isEmpty).map(_.name).mkString(","))
  }
}
