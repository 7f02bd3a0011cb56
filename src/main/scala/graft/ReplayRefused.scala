package graft

/** The TYPED form of the persisted-index replay guard: thrown by every
  * append/landing path (the BM25 postings index, the vector index, the
  * MinHash dedup index, and the corpus landing zone) when a batch id
  * is already on the committed, retired, or landed record.
  *
  * The streaming sinks ([[graft.streaming.Bm25Stream]],
  * [[graft.streaming.VectorStream]], [[graft.streaming.CorpusStream]])
  * catch THIS TYPE — never a message substring — to turn foreachBatch's
  * at-least-once redelivery into exactly-once commitment: a redelivered
  * micro-batch whose content-derived id is already committed is
  * "already done", while any OTHER failure still fails the stream
  * loudly. Matching on the type instead of `getMessage.contains`
  * makes the contract structural: rewording a refusal message can no
  * longer silently change which failures a stream swallows.
  *
  * Extends IllegalStateException — a replay is a state conflict, and
  * callers that defensively catch the broad type keep working.
  */
final class ReplayRefused(msg: String) extends IllegalStateException(msg)
