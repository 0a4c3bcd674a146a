package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

/** The file store's CHANGE FEED — the zero-egress analogue of a
  * Firestore watch stream (listen/onSnapshot): every `commitBatch`
  * appends one durably-numbered entry under `<root>/_changelog/`, and
  * [[graft.sources.DocStoreMicroBatchStream]] tails the numbers as
  * streaming offsets.
  *
  * Write protocol (multi-writer safe on one filesystem, the store's
  * deployment unit):
  *  1. claim the next sequence with an atomic create-exclusive
  *     (`Files.createFile`) — concurrent writers collide forward, so
  *     claimed sequences are DENSE (no holes);
  *  2. write the entry body to a temp file and atomically rename it
  *     over the claimed placeholder.
  * A reader therefore sees either an empty placeholder (claimed,
  * content in flight) or a complete entry — never a torn write. The
  * streaming source's `latestOffset` only advances over the longest
  * fully-written PREFIX, so an in-flight claim at seq n holds the
  * offset at n−1 and nothing is ever skipped (exactly-once source
  * semantics under concurrent commits).
  *
  * Entries are one JSON object per line: {"collection","doc_id","count"}
  * — the DSv2 row shape, so the feed replays directly as source rows.
  */
object DocStoreChangelog {
  val DirName = "_changelog"

  private def dir(root: String): Path = Paths.get(root, DirName)

  /** Append one feed entry for a committed batch. Called by
    * [[FileDocumentStoreFactory]] AFTER the documents are durable, so a
    * feed entry always refers to readable state. */
  def append(root: String, collection: String,
             docs: Seq[(String, Map[String, Long])]): Unit = {
    Files.createDirectories(dir(root))
    val body = docs.map { case (id, fields) =>
      s"""{"collection": "$collection", "doc_id": "$id", """ +
        s""""count": ${fields.getOrElse("count", 0L)}}"""
    }.mkString("", "\n", "\n")
    var seq = maxClaimedSeq(root) + 1
    var claimed: Path = null
    while (claimed == null) {
      try claimed = Files.createFile(entryPath(root, seq))
      catch { case _: FileAlreadyExistsException => seq += 1 }
    }
    val tmp = Files.createTempFile(dir(root), s".c$seq", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, claimed, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def entryPath(root: String, seq: Long): Path =
    dir(root).resolve(f"$seq%012d.json")

  private def claimedSeqs(root: String): Seq[Long] = {
    val d = dir(root).toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith("."))
      .map(_.getName.stripSuffix(".json").toLong).sorted.toSeq
  }

  private def maxClaimedSeq(root: String): Long =
    claimedSeqs(root).lastOption.getOrElse(-1L)

  /** Largest sequence N such that every entry ≤ N is fully written —
    * the highest offset a streaming batch may safely cover. */
  def latestComplete(root: String): Long = {
    val seqs = claimedSeqs(root)
    var last = -1L
    for (s <- seqs if last == s - 1 &&
         Files.size(entryPath(root, s)) > 0) last = s
    last
  }

  /** Parsed rows of entries in (from, to] — (collection, doc_id, count). */
  def entries(root: String, from: Long, to: Long): Seq[(String, String, Long)] =
    ((from + 1) to to).flatMap { s =>
      val body = new String(Files.readAllBytes(entryPath(root, s)),
        StandardCharsets.UTF_8)
      body.split("\n").filter(_.trim.nonEmpty).map { line =>
        val m = "\"collection\": \"(.*?)\", \"doc_id\": \"(.*?)\", \"count\": (-?\\d+)".r
          .findFirstMatchIn(line)
          .getOrElse(sys.error(s"malformed changelog line: $line"))
        (m.group(1), m.group(2), m.group(3).toLong)
      }
    }
}
