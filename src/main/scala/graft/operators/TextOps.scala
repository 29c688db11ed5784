package graft.operators
import graft.Q
object TextOps {
  val queries: Seq[Q] = Seq()
}
