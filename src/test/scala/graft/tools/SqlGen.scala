package graft.tools
object SqlGen {
  def main(args: Array[String]): Unit =
    println(graft.ops.CorpusOps.bpeFertilityOracleSql(
      args(0).toInt, args(1).toInt))
}
