package graft.streaming

import graft.QDef

/** Structured Streaming queries (SURVEY.md §2B "Streaming") — filled in
  * milestone 2 (streaming-table layer). */
object StreamOps {
  val all: Seq[QDef] = Seq.empty
}
