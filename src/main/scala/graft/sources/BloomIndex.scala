package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Per-file BLOOM-FILTER sidecar index for POINT LOOKUPS on columns
  * the table is NOT clustered by (r16). Min/max stats prune range
  * queries well only when files are clustered on the column; on an
  * unclustered table every file's [min, max] spans the whole key
  * space and a point delete/lookup rewrites or scans everything. A
  * bloom sidecar answers "can this file possibly hold key x?" with no
  * false negatives, so a negative is a SOUND skip (Delta's bloom
  * filter index, re-derived: Bloom 1970, CACM 13(7)).
  *
  * Layout: `_idx/bloom-<physCol>/` under the table root — one
  * `<sha1(file key)>.bloom` per data file (the same (file name +
  * partition values) identity and SHA-1 naming as DV sidecars; a
  * part-file name alone is NOT unique across partition clones) plus
  * an `index.json` descriptor. The index is deliberately OUTSIDE the
  * version log: a bloom file can only ever describe the exact
  * physical file it was built from, files written after the build
  * have no bloom and are conservatively kept, and a rewritten file's
  * new name misses the index the same way — soundness needs no
  * commit-protocol coupling. Rebuild after compaction to regain
  * skipping on the new files.
  *
  * Bit positions use DOUBLE HASHING over two polynomial char folds,
  * each passed through the square-mod-(2^31−1) mixing round — the
  * repo's standard fix for bit-position consumers (raw polynomial
  * folds concentrate short keys in a narrow band; see SrcBucket /
  * SimHash32 history).
  */
private[graft] object BloomIndex {
  /** Probe sets larger than this skip the bloom consult — the driver
    * tests keys × candidate files, which is a point-lookup device,
    * not a scan plan.
    */
  val ProbeCap = 4096

  private val P = 2147483647L // 2^31 - 1, prime

  private def mix(x: Long): Long = {
    val m = ((x % P) + P) % P
    (m * m) % P
  }

  /** (h1, h2) for double hashing; h2 forced non-zero. */
  def hashes(s: String): (Long, Long) = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toLong
      h1 = (h1 * 31 + c) % P
      h2 = (h2 * 131 + c) % P
      i += 1
    }
    (mix(h1), mix(h2 + 7) | 1L)
  }

  /** Optimal (bits m, hash count k) for n keys at `fpp`:
    * m = −n·ln(fpp)/ln²2, k = (m/n)·ln 2 — capped to keep a single
    * file's bloom an int-indexed bit array.
    */
  def sizeFor(n: Long, fpp: Double): (Int, Int) = {
    val nn = math.max(1L, n)
    val m = math.ceil(-nn * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val mc = math.max(64L, math.min(m, Int.MaxValue.toLong - 63)).toInt
    val k = math.max(1, math.round(mc.toDouble / nn * math.log(2)).toInt)
    (mc, math.min(k, 16))
  }

  def insert(bits: Array[Long], m: Int, k: Int, key: String): Unit = {
    val (h1, h2) = hashes(key)
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) % m).toInt
      bits(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def contains(bits: Array[Long], m: Int, k: Int, key: String): Boolean = {
    val (h1, h2) = hashes(key)
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) % m).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** SHA-1 of the file key (same device as DV sidecars — the raw key
    * carries  separators and hive values, not path-safe).
    */
  def fileName(fileKey: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(fileKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString + ".bloom"
  }

  def indexDir(table: String, colOrig: String): Path =
    Paths.get(table, "_idx", s"bloom-$colOrig")

  def write(path: Path, m: Int, k: Int, bits: Array[Long]): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path.toFile)))
    try {
      out.writeInt(m); out.writeInt(k); out.writeInt(bits.length)
      var i = 0
      while (i < bits.length) { out.writeLong(bits(i)); i += 1 }
    } finally out.close()
  }

  // driver-side probe cache: blooms are consulted per mutation/lookup
  // call over the candidate files; byte-bounded LRU so a wide table's
  // probe does not re-read the same sidecars every call
  private val MaxEntries = 256
  private val MaxBytes = 64L << 20
  private var cachedBytes = 0L
  private val cache =
    new java.util.LinkedHashMap[String, (Int, Int, Array[Long])](16, 0.75f, true)

  private def readFile(p: Path): (Int, Int, Array[Long]) = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(p.toFile)))
    try {
      val m = in.readInt(); val k = in.readInt(); val n = in.readInt()
      val bits = new Array[Long](n)
      var i = 0
      while (i < n) { bits(i) = in.readLong(); i += 1 }
      (m, k, bits)
    } finally in.close()
  }

  /** May the file behind `fileKey` contain ANY of `keys`? A missing
    * bloom file (post-build write, rewritten file) is an honest
    * "don't know" → true.
    */
  def mayContainAny(table: String, colOrig: String, fileKey: String,
      keys: Seq[String]): Boolean = {
    val p = indexDir(table, colOrig).resolve(fileName(fileKey))
    if (!Files.exists(p)) return true
    val ck = p.toString
    val entry = cache.synchronized { cache.get(ck) } match {
      case null =>
        val loaded = readFile(p)
        cache.synchronized {
          val raced = cache.get(ck)
          if (raced == null) {
            cachedBytes += loaded._3.length.toLong * 8
            cache.put(ck, loaded)
            val it = cache.entrySet().iterator()
            while ((cache.size() > MaxEntries || cachedBytes > MaxBytes) &&
                cache.size() > 1 && it.hasNext) {
              val e = it.next()
              cachedBytes -= e.getValue._3.length.toLong * 8
              it.remove()
            }
            loaded
          } else raced
        }
      case hit => hit
    }
    val (m, k, bits) = entry
    keys.exists(contains(bits, m, k, _))
  }

  /** Does a bloom index exist for this physical column? */
  def exists(table: String, colOrig: String): Boolean =
    Files.exists(indexDir(table, colOrig).resolve("index.json"))

  /** Drop the index (e.g. before a rebuild). */
  def drop(table: String, colOrig: String): Unit = {
    val dir = indexDir(table, colOrig)
    if (Files.isDirectory(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
    }
    cache.synchronized { cache.clear(); cachedBytes = 0L }
  }
}
