package graft.variant

/** JSONPath-lite used by `variant_get`: `$`, `.key`, `['key']`, `[123]`,
  * plus the `[*]` array wildcard (variant_get_all only). Parsed once at
  * analysis time; evaluated per row by walking views (the reference's
  * per-step analog is `VariantRef::field`,
  * /root/reference/open-variant/src/values/read.rs:87-93).
  */
sealed trait PathStep
object PathStep {
  final case class Key(name: String) extends PathStep {
    val utf8: Array[Byte] = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
  final case class Index(i: Int) extends PathStep
  case object Wildcard extends PathStep      // [*]: every array element
  case object KeyWildcard extends PathStep   // .*: every object field value
}

object VariantPath {

  /** Parse a path like `$.a.b[2]['c d']`. Throws IllegalArgumentException
    * on malformed input.
    */
  def parse(path: String): Array[PathStep] = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[PathStep]
    var i = 0
    val n = path.length
    if (n == 0 || path.charAt(0) != '$')
      throw new IllegalArgumentException(s"variant path must start with '$$': $path")
    i = 1
    while (i < n) {
      path.charAt(i) match {
        case '.' =>
          i += 1
          val start = i
          while (i < n && path.charAt(i) != '.' && path.charAt(i) != '[') i += 1
          if (i == start)
            throw new IllegalArgumentException(s"empty key in variant path: $path")
          val key = path.substring(start, i)
          steps += (if (key == "*") PathStep.KeyWildcard else PathStep.Key(key))
        case '[' =>
          i += 1
          if (i < n && (path.charAt(i) == '\'' || path.charAt(i) == '"')) {
            val quote = path.charAt(i)
            i += 1
            // backslash-escaped chars inside quoted keys (\' \" \\) so
            // every key variant_flatten emits replays through here
            val sb = new java.lang.StringBuilder
            var closed = false
            while (i < n && !closed) {
              path.charAt(i) match {
                case '\\' if i + 1 < n =>
                  sb.append(path.charAt(i + 1)); i += 2
                case `quote` => closed = true; i += 1
                case c => sb.append(c); i += 1
              }
            }
            if (!closed || i >= n || path.charAt(i) != ']')
              throw new IllegalArgumentException(s"unterminated quoted key in: $path")
            steps += PathStep.Key(sb.toString)
            i += 1
          } else {
            val start = i
            while (i < n && path.charAt(i) != ']') i += 1
            if (i >= n || i == start)
              throw new IllegalArgumentException(s"bad index in variant path: $path")
            val idx = path.substring(start, i)
            steps +=
              (if (idx == "*") PathStep.Wildcard
               else PathStep.Index(
                 try idx.toInt
                 catch {
                   case _: NumberFormatException =>
                     throw new IllegalArgumentException(s"bad index '$idx' in: $path")
                 }))
            i += 1
          }
        case c =>
          throw new IllegalArgumentException(s"unexpected '$c' at $i in variant path: $path")
      }
    }
    steps.toArray
  }

  /** Walk `steps` from the root value. Returns null when any step misses
    * (absent key, index out of bounds, or step applied to a scalar).
    */
  def walk(metadata: MetadataView, value: VariantView, steps: Array[PathStep]): VariantView =
    walkWithIds(value, steps, resolveIds(metadata, steps))

  /** Key→dictionary-id resolution for every Key step — the only part of
    * a path walk that touches the metadata dictionary. Resolving once
    * and reusing across rows restores the reference's batch-shared
    * amortization ("one find_string per batch",
    * /root/reference/arrow-open-variant/src/json.rs:51-63): variant
    * columns read back from parquet/shuffle repeat the same metadata
    * bytes on every row of a file/partition. Index steps get
    * [[IDX_STEP]]; missing keys get -1 (walk yields NULL).
    */
  final val IDX_STEP: Int = -2

  def resolveIds(metadata: MetadataView, steps: Array[PathStep]): Array[Int] = {
    val ids = new Array[Int](steps.length)
    var i = 0
    while (i < steps.length) {
      ids(i) = steps(i) match {
        case k: PathStep.Key => metadata.findKey(k.utf8)
        case _ => IDX_STEP
      }
      i += 1
    }
    ids
  }

  /** Walk with pre-resolved field ids (from [[resolveIds]], possibly
    * cached across rows sharing metadata bytes).
    */
  def walkWithIds(value: VariantView, steps: Array[PathStep], ids: Array[Int]): VariantView = {
    var cur = value
    var i = 0
    while (i < steps.length) {
      if (cur == null) return null
      steps(i) match {
        case _: PathStep.Key =>
          if (!cur.isObject) return null
          val id = ids(i)
          if (id < 0) return null
          cur = cur.getObject.getField(id)
        case PathStep.Index(idx) =>
          if (!cur.isArray) return null
          cur = cur.getArray.elementAt(idx)
        case PathStep.Wildcard | PathStep.KeyWildcard =>
          throw new IllegalArgumentException(
            "wildcard paths ([*] / .*) require variant_get_all")
      }
      i += 1
    }
    cur
  }

  /** Walk with `[*]` wildcards: collect EVERY match in document order
    * (array elements ascending, depth-first across wildcard branches).
    * A miss on any branch prunes that branch only; no matches → empty
    * result, never an error — the multi-valued twin of [[walkWithIds]].
    */
  def walkAll(metadata: MetadataView, value: VariantView, steps: Array[PathStep],
              ids: Array[Int],
              out: scala.collection.mutable.ArrayBuffer[VariantView]): Unit = {
    def go(cur: VariantView, i: Int): Unit = {
      if (cur == null) return
      if (i == steps.length) { out += cur; return }
      steps(i) match {
        case _: PathStep.Key =>
          if (!cur.isObject) return
          val id = ids(i)
          if (id < 0) return
          go(cur.getObject.getField(id), i + 1)
        case PathStep.Index(idx) =>
          if (!cur.isArray) return
          go(cur.getArray.elementAt(idx), i + 1)
        case PathStep.Wildcard =>
          if (!cur.isArray) return
          val arr = cur.getArray
          var j = 0
          val n = arr.numElements
          while (j < n) { go(arr.elementAt(j), i + 1); j += 1 }
        case PathStep.KeyWildcard =>
          if (!cur.isObject) return
          val o = cur.getObject
          val n = o.numElements
          if (metadata.sortedStrings) {
            // canonical writers (ours, Spark's) store object fields in
            // sorted-key order when the dictionary is sorted — stored
            // order IS the order the fused tree walk sorts to match
            var j = 0
            while (j < n) { go(o.valueAt(j), i + 1); j += 1 }
          } else {
            // byte-verbatim FOREIGN variants with first-seen-order
            // dictionaries: stored field order (sorted by field id) is
            // NOT key order — sort explicitly so .* emission matches
            // the fused path's canonical sorted-key order
            val keyBytes = Array.tabulate(n)(j =>
              metadata.getKey(o.fieldIdAt(j)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val idx = (0 until n).sortWith { (a, b) =>
              VariantMetadata.compareUtf8(keyBytes(a), keyBytes(b)) < 0
            }
            idx.foreach(j => go(o.valueAt(j), i + 1))
          }
      }
    }
    go(value, 0)
  }
}
