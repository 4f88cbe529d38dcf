package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop implementations behind the native text-hash expressions.
  * Called from both interpreted eval and Janino-generated code (top-level
  * object => static forwarders).
  *
  * Hash parity contract: token/shingle hashes reproduce Spark's builtin
  * `xxhash64` exactly —
  *   xxhash64(token)        == XXH64.hashUnsafeBytes(bytes, 42)
  *   xxhash64(perm, token)  == XXH64.hashUnsafeBytes(bytes, hashInt(perm, 42))
  * and tokenization reproduces `split(text, " ")` (single-space regex,
  * limit -1: empty tokens between consecutive spaces are kept). Shingles
  * of k adjacent tokens joined by " " are therefore exactly the original
  * byte range from the first token's start to the last token's end — no
  * string materialization needed.
  */
object TextHashImpl {

  private final val Seed = 42L

  /** 64-bit SimHash over per-token xxhash64 bit votes — byte-range
    * tokenization, zero allocations beyond the vote array.
    */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature over k-word shingles: numPerms minima of
    * xxhash64(perm, shingle). Shingles are byte ranges over the original
    * string (k tokens + the k-1 separating spaces), so no per-shingle
    * allocation; docs shorter than k tokens use the whole string.
    */
  def minhash(s: UTF8String, numPerms: Int, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val n = bytes.length
    // token start offsets (token t spans [starts(t), ends(t)))
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0; var start = 0; i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val permSeeds = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) { permSeeds(p) = XXH64.hashInt(p, Seed); p += 1 }
    def addShingle(from: Int, until: Int): Unit = {
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashUnsafeBytes(bytes, off + from, until - from, permSeeds(p))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
    }
    if (nTokens < k) addShingle(0, n)
    else {
      var sIdx = 0
      while (sIdx <= nTokens - k) {
        addShingle(starts(sIdx), ends(sIdx + k - 1))
        sIdx += 1
      }
    }
    mins
  }

  /** Deterministic md5-permuted minhash BAND KEYS — the
    * dd_minhash_lsh_det / rl_stream_neardup_ingest banding as one tight
    * loop. Value-identical to the Column-tree form (parity-pinned in
    * NativeExpressionsSpec): per shingle and permutation p the hash is
    * md5Key60("p" + U+0001 + shingle) (= the top 60 bits of the md5,
    * exactly the first-15-hex-chars BIGINT parse), the signature is the
    * per-permutation min (duplicate shingles are harmless under min, so
    * the Column form's distinct() is pure work-saving), and band b's key
    * is md5Key60 of the comma-joined decimal signature slice
    * [b*rpb, (b+1)*rpb). Tokens/shingles match `split(text, " ")` /
    * `concat_ws(" ", slice(...))` byte-exactly (object scaladoc), so a
    * shingle IS the original byte range.
    */
  def detMinhashBands(s: UTF8String, numPerms: Int, bands: Int,
                      k: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0; var start = 0; i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    // per-permutation prefix bytes: "p" + U+0001 (ASCII-only)
    val prefixes = new Array[Array[Byte]](numPerms)
    var p = 0
    while (p < numPerms) {
      prefixes(p) = (p.toString + "\u0001").getBytes("UTF-8")
      p += 1
    }
    def key60(digest: Array[Byte]): Long = {
      // first 15 hex chars == top 60 bits: big-endian first-8-bytes >>> 4
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      h >>> 4
    }
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    def addShingle(from: Int, until: Int): Unit = {
      var p = 0
      while (p < numPerms) {
        md.reset()
        md.update(prefixes(p))
        md.update(bytes, from, until - from)
        val h = key60(md.digest())
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    if (nTokens < k) addShingle(0, n)
    else {
      var sIdx = 0
      while (sIdx <= nTokens - k) {
        addShingle(starts(sIdx), ends(sIdx + k - 1))
        sIdx += 1
      }
    }
    val rpb = numPerms / bands
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(rpb * 20)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rpb) {
        if (r > 0) sb.append(',')
        sb.append(sig(b * rpb + r))
        r += 1
      }
      md.reset()
      md.update(sb.toString.getBytes("UTF-8"))
      out(b) = key60(md.digest())
      b += 1
    }
    out
  }

  /** Repetition statistics in one pass:
    * [nTokens, distinctTokens, nShingles, distinctShingles] for k-word
    * shingles. Distinctness is counted over 64-bit xxhash64 of the token /
    * shingle byte ranges via an open-addressing set — equal strings always
    * collide (counts never overestimate distinctness), and a spurious
    * 64-bit collision (~1e-14 per doc) is the only way to undercount.
    * Token/shingle definitions match `split(text, " ")` /
    * `concat_ws(" ", slice(...))` byte-exactly (see the object scaladoc),
    * so the fractions equal the HOF/oracle formulation.
    */
  def repetitionStats(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val n = bytes.length
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    // fail loud BEFORE the per-token allocations (offset arrays + hash
    // table are ~24 bytes/token): Int sizing math would wrap around 2^30
    // tokens and hang the probe loop, and anything near that OOMs the
    // executor first. 2^26 tokens (~64M, far beyond any sane document)
    // caps worst-case scratch memory at ~1.5 GB.
    val MaxTokens = 1 << 26
    require(nTokens < MaxTokens,
      s"repetitionStats: document with $nTokens tokens is at/over the " +
        s"$MaxTokens-token limit; split the document upstream")
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0; var start = 0; i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    val nShingles = if (nTokens < k) 1 else nTokens - k + 1
    // open-addressing set sized for the larger population; 0 marks empty
    // (a real 0 hash remaps to 1 — only collision semantics, still exact
    // for equal inputs)
    val need = (math.max(nTokens, nShingles) + 1) * 2 // bounded by MaxTokens
    var cap = 4
    while (cap < need) cap <<= 1
    val set = new Array[Long](cap)
    val mask = cap - 1
    var setSize = 0
    def clear(): Unit = { java.util.Arrays.fill(set, 0L); setSize = 0 }
    def add(h0: Long): Unit = {
      val h = if (h0 == 0L) 1L else h0
      var idx = (h ^ (h >>> 32)).toInt & mask
      while (set(idx) != 0L && set(idx) != h) idx = (idx + 1) & mask
      if (set(idx) == 0L) { set(idx) = h; setSize += 1 }
    }
    var tok = 0
    while (tok < nTokens) {
      add(XXH64.hashUnsafeBytes(bytes, off + starts(tok),
        ends(tok) - starts(tok), Seed))
      tok += 1
    }
    val distinctTokens = setSize
    clear()
    if (nTokens < k) add(XXH64.hashUnsafeBytes(bytes, off, n, Seed))
    else {
      var sIdx = 0
      while (sIdx <= nTokens - k) {
        add(XXH64.hashUnsafeBytes(bytes, off + starts(sIdx),
          ends(sIdx + k - 1) - starts(sIdx), Seed))
        sIdx += 1
      }
    }
    Array(nTokens.toLong, distinctTokens.toLong, nShingles.toLong,
      setSize.toLong)
  }
}
