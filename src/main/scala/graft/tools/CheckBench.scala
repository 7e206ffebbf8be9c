package graft.tools

/** Asserts every benchQueries name resolves in the catalog. */
object CheckBench {
  def main(args: Array[String]): Unit = {
    val b = graft.SparkEntry.benchQueries
    println(s"[checkbench] n=${b.length} distinct=${b.distinct.length}")
    val missing = b.filterNot(graft.operators.Catalog.all.map(_.name).toSet.contains)
    println(s"[checkbench] missing=${missing.mkString(",")}")
  }
}
