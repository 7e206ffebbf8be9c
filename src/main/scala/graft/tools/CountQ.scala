package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val all = graft.operators.Catalog.all
    println(s"[countq] total=${all.size} oracled=${all.count(_.oracle.isDefined)} no_oracle=${all.filter(_.oracle.isEmpty).map(_.name).mkString(",")}")
  }
}
