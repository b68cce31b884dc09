package graft.tools
object Consistency {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[consistency] queries=${q.size} oracles=${o.size}")
    println(s"[consistency] queries missing an oracle: ${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"[consistency] oracles without a query: ${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
