package graft.operators
import graft.Q
object EventOps {
  val queries: Seq[Q] = Seq()
}
