package pystreamsspark.tools
object KeyAudit {
  def main(args: Array[String]): Unit = {
    val registered = graft.SparkEntry.queries.keySet
    val oracled = graft.SparkEntry.oracleSql.keySet
    val survey = scala.io.Source.fromFile("/root/repo/SURVEY.md", "UTF-8").mkString
    val mentioned = "q[a-z0-9_]+".r.findAllIn(survey).toSet
      .filter(_.startsWith("q_")) ++ Set("q1_agg", "q3_join_topk")
    println(s"registered=${registered.size} oracled=${oracled.size} mentioned=${mentioned.size}")
    val missing = mentioned -- registered
    val unmentioned = registered -- mentioned
    println(s"MENTIONED-BUT-NOT-REGISTERED: ${missing.toSeq.sorted.mkString(", ")}")
    println(s"REGISTERED-BUT-NOT-IN-SURVEY: ${unmentioned.toSeq.sorted.mkString(", ")}")
    println(s"SMOKE-ONLY (no oracle): ${(registered -- oracled).toSeq.sorted.mkString(", ")}")
  }
}
