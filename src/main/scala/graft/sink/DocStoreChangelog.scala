package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** The file store's CHANGE FEED — the zero-egress analogue of a
  * Firestore watch stream (listen/onSnapshot): every `commitBatch`
  * appends one durably-numbered entry under `<root>/_changelog/`, and
  * [[graft.sources.DocStoreMicroBatchStream]] tails the numbers as
  * streaming offsets.
  *
  * Write protocol (multi-writer safe on one filesystem, the store's
  * deployment unit):
  *  1. (keyed appends only) claim the batch's IDEMPOTENCY KEY with an
  *     atomic create-exclusive marker `.k<hash>` — a Spark task retry or
  *     speculative duplicate of the same logical batch finds the marker
  *     and publishes nothing, so the feed never replays a batch twice
  *     (document puts are idempotent overwrites; the feed append is the
  *     one non-idempotent side effect, hence the key gate);
  *  2. claim the next sequence with an atomic create-exclusive
  *     (`Files.createFile`) — concurrent writers collide forward, so
  *     claimed sequences are DENSE (no holes);
  *  3. write the entry body to a temp file and atomically rename it
  *     over the claimed placeholder.
  * A reader therefore sees either an empty placeholder (claimed,
  * content in flight) or a complete entry — never a torn write. The
  * streaming source's `latestOffset` only advances over the longest
  * fully-written PREFIX, so an in-flight claim at seq n holds the
  * offset at n−1 and nothing is ever skipped while a writer is live.
  *
  * Crash recovery: a writer that dies between claiming a sequence and
  * renaming the body would otherwise wedge the feed forever (the empty
  * placeholder never completes). [[latestComplete]] therefore RECLAIMS
  * zero-length placeholders older than `staleClaimMs` by renaming a
  * complete zero-row tombstone over them, and the feed advances. The
  * timeout must exceed any plausible write stall (default 60 s vs
  * sub-second appends): a writer that stalls PAST it and then completes
  * races the tombstone, and whichever rename lands last wins.
  * Net guarantees: per idempotency key the feed publishes AT MOST ONCE
  * always, and EXACTLY ONCE when the append does not crash mid-publish;
  * the document store itself stays exactly-once either way (keyed
  * last-write-wins upserts).
  *
  * Entries are one JSON object per line: {"collection","doc_id","count"}
  * — the DSv2 row shape, so the feed replays directly as source rows.
  * Strings are JSON-escaped on write and parsed with a real (if tiny)
  * JSON reader, so hostile ids (quotes, newlines, backslashes, control
  * characters) round-trip instead of poisoning the feed.
  */
object DocStoreChangelog {
  val DirName = "_changelog"

  /** Zero-length sequence claims older than this are treated as
    * abandoned by a crashed writer and reclaimed as zero-row entries. */
  val DefaultStaleClaimMs: Long = 60000L

  private def dir(root: String): Path = Paths.get(root, DirName)

  def entryPath(root: String, seq: Long): Path =
    dir(root).resolve(f"$seq%012d.json")

  private def keyMarker(root: String, key: String): Path =
    dir(root).resolve(s".k${keyHash(key)}")

  private def keyHash(key: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  // ---- JSON string escaping (the subset JSON mandates) ----

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  /** Append one feed entry for a committed batch. Called by
    * [[FileDocumentStoreFactory]] AFTER the documents are durable, so a
    * feed entry always refers to readable state.
    *
    * `idempotencyKey` identifies the LOGICAL batch across task retries
    * and speculative attempts (e.g. queryId/partition/flush-ordinal);
    * a second append under an already-claimed key is a no-op. Keyless
    * appends always publish (single-attempt callers, e.g. tests).
    *
    * Empty batches never append: a zero-doc entry carries no change
    * rows, and a zero-length FILE is the in-flight marker — appending
    * one would hold `latestComplete` back until the stale-claim reclaim
    * fired for no reason.
    */
  def append(root: String, collection: String,
             docs: Seq[(String, Map[String, Long])],
             idempotencyKey: Option[String] = None): Unit = {
    if (docs.isEmpty) return
    Files.createDirectories(dir(root))
    idempotencyKey.foreach { key =>
      try Files.createFile(keyMarker(root, key))
      catch { case _: FileAlreadyExistsException => return } // already published
    }
    val body = docs.map { case (id, fields) =>
      s"""{"collection": "${esc(collection)}", "doc_id": "${esc(id)}", """ +
        s""""count": ${feedValue(fields)}}"""
    }.mkString("", "\n", "\n")
    // amortized O(1) claims (review round-16: listing + sorting the
    // whole feed directory per append made N commits O(N^2) in dirent
    // churn — hours of pure listing for a naive per-element write).
    // The JVM-local hint is only a STARTING POINT: the collide-forward
    // create-exclusive loop below stays the source of truth for
    // multi-writer safety, and a hint whose entry no longer exists
    // (feed dir wiped/recreated between jobs) falls back to a full list.
    val hint = seqHint.get(root)
    var seq = hint match {
      case h: java.lang.Long if Files.exists(entryPath(root, h)) => h + 1L
      case _ => maxClaimedSeq(root) + 1
    }
    var claimed: Path = null
    while (claimed == null) {
      try claimed = Files.createFile(entryPath(root, seq))
      catch { case _: FileAlreadyExistsException => seq += 1 }
    }
    // plain put, not merge-max (review round-16): after a feed wipe the
    // fallback claims a LOW sequence, and a max-merge would pin the
    // stale high hint forever — every subsequent append re-listing the
    // whole directory until the counter climbed back. A racing writer
    // moving the hint down is harmless: the hint is only a probe start
    // and the existence check + collide-forward loop stay authoritative.
    seqHint.put(root, seq)
    val tmp = Files.createTempFile(dir(root), s".c$seq", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, claimed, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Last sequence this JVM claimed per store root — the probe start
    * hint for [[append]]; never trusted without an existence check. */
  private val seqHint =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The feed's `count` column value for a doc's field map: the `count`
    * field when present, else the single field's value (the sink writes
    * exactly one field under a caller-chosen name — review round-16: a
    * hardcoded `count` lookup silently published 0 for every doc written
    * with a non-default fieldName), else 0 for multi-field docs whose
    * map carries no `count` (no canonical value exists; the feed's row
    * shape is fixed). */
  private[graft] def feedValue(fields: Map[String, Long]): Long =
    fields.getOrElse("count",
      if (fields.size == 1) fields.head._2 else 0L)

  private def claimedSeqs(root: String): Seq[Long] = {
    val d = dir(root).toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith("."))
      .map(_.getName.stripSuffix(".json").toLong).sorted.toSeq
  }

  private def maxClaimedSeq(root: String): Long =
    claimedSeqs(root).lastOption.getOrElse(-1L)

  /** Largest sequence N such that every entry ≤ N is fully written —
    * the highest offset a streaming batch may safely cover. A
    * zero-length placeholder younger than `staleClaimMs` holds the
    * offset back (a live writer is mid-publish); an older one is an
    * abandoned claim from a crashed writer and is reclaimed in place
    * as a complete zero-row tombstone so the feed advances (see the
    * crash-recovery note in the object doc). */
  def latestComplete(root: String,
                     staleClaimMs: Long = DefaultStaleClaimMs): Long = {
    val seqs = claimedSeqs(root)
    var last = -1L
    var blocked = false
    for (s <- seqs if !blocked) {
      if (last != s - 1) blocked = true // hole (external deletion): stop
      else {
        val p = entryPath(root, s)
        if (Files.size(p) > 0) last = s
        else {
          val age = System.currentTimeMillis() -
            Files.getLastModifiedTime(p).toMillis
          if (age >= staleClaimMs) {
            val tmp = Files.createTempFile(dir(root), s".c$s", ".tmp")
            Files.write(tmp, "\n".getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
            last = s
          } else blocked = true
        }
      }
    }
    last
  }

  /** Parsed rows of entries in (from, to] — (collection, doc_id, count).
    * Zero-row tombstones (reclaimed claims) contribute nothing. */
  def entries(root: String, from: Long, to: Long): Seq[(String, String, Long)] =
    ((from + 1) to to).flatMap { s =>
      val body = new String(Files.readAllBytes(entryPath(root, s)),
        StandardCharsets.UTF_8)
      body.split("\n").filter(_.trim.nonEmpty).map(parseLine)
    }

  // ---- minimal JSON parser for the fixed entry shape ----
  // {"collection": <string>, "doc_id": <string>, "count": <long>}
  // A real parser (not a regex) so escaped quotes/backslashes/newlines
  // inside ids round-trip; anything else fails THAT line loudly.

  private def parseLine(line: String): (String, String, Long) = {
    var i = 0
    def fail(why: String): Nothing =
      sys.error(s"malformed changelog line ($why): $line")
    def ws(): Unit = while (i < line.length && line(i) == ' ') i += 1
    def expect(c: Char): Unit = {
      ws()
      if (i >= line.length || line(i) != c) fail(s"expected '$c' at $i")
      i += 1
    }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < line.length && line(i) != '"') {
        if (line(i) == '\\') {
          i += 1
          if (i >= line.length) fail("dangling escape")
          line(i) match {
            case '"'  => b.append('"')
            case '\\' => b.append('\\')
            case 'n'  => b.append('\n')
            case 'r'  => b.append('\r')
            case 't'  => b.append('\t')
            case 'u' =>
              if (i + 4 >= line.length) fail("truncated \\u escape")
              b.append(Integer.parseInt(line.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case o => fail(s"unknown escape \\$o")
          }
        } else b.append(line(i))
        i += 1
      }
      if (i >= line.length) fail("unterminated string")
      i += 1 // closing quote
      b.toString
    }
    def field(name: String): Unit = {
      val got = str()
      if (got != name) fail(s"expected key $name, got $got")
      expect(':')
    }
    def long(): Long = {
      ws()
      val start = i
      if (i < line.length && line(i) == '-') i += 1
      while (i < line.length && line(i).isDigit) i += 1
      if (i == start || (i == start + 1 && line(start) == '-'))
        fail("expected integer")
      line.substring(start, i).toLong
    }
    expect('{')
    field("collection"); val c = str()
    expect(',')
    field("doc_id"); val d = str()
    expect(',')
    field("count"); val n = long()
    expect('}')
    ws()
    if (i != line.length) fail("trailing content")
    (c, d, n)
  }
}
