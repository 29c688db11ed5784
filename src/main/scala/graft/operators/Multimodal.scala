package graft.operators
import graft.Q
object Multimodal {
  val queries: Seq[Q] = Seq()
}
