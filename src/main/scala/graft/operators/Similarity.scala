package graft.operators
import graft.Q
object Similarity {
  val queries: Seq[Q] = Seq()
}
