package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the text-hashing hot paths of the
  * dedup operators (SURVEY §7.3 preference order (b): custom Expression
  * before UDF when bench demands it).
  *
  * The composed-builtin formulations (K aggregate() lambdas over a
  * shingle array / 64 bit-count aggregates over token hashes) are
  * interpreted per element x per hash — the dominant cost of MinHash
  * LSH at scale. These expressions do one codegen'd pass per row:
  * elements x K seeded XXH64 calls with primitive min/count arrays.
  */
object TextHashExpressions {

  /** minhash_signature(shingles: array<string>, K): array<long> of
    * min_{s in shingles} xxh64(s, seed=i) for i in [0, K).
    * Empty/null-element-free input assumed (shingle arrays are).
    */
  case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        val s = arr.getUTF8String(j)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, i.toLong)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val mins = ctx.freshName("mins")
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        s"""
           |int $n = $x.numElements();
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $j = 0; $j < $n; $j++) {
           |  UTF8String $s = $x.getUTF8String($j);
           |  for (int $i = 0; $i < $numHashes; $i++) {
           |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
           |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $i);
           |    if ($h < $mins[$i]) $mins[$i] = $h;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** simhash64(tokens: array<string>): 64-bit SimHash — per-bit
    * majority vote over xxh64(token) hashes, one pass.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var j = 0
      while (j < n) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          counts(i) += ((h >>> i) & 1L).toInt
          i += 1
        }
        j += 1
      }
      var sig = 0L
      var i = 0
      while (i < 64) {
        if (counts(i) * 2 >= n) sig |= (1L << i)
        i += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val counts = ctx.freshName("counts")
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val sig = ctx.freshName("sig")
        s"""
           |int $n = $x.numElements();
           |int[] $counts = new int[64];
           |for (int $j = 0; $j < $n; $j++) {
           |  UTF8String $s = $x.getUTF8String($j);
           |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
           |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
           |  for (int $i = 0; $i < 64; $i++) { $counts[$i] += (int) (($h >>> $i) & 1L); }
           |}
           |long $sig = 0L;
           |for (int $i = 0; $i < 64; $i++) { if ($counts[$i] * 2 >= $n) $sig |= (1L << $i); }
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** band_buckets(sig: array<long>, bands, rowsPerBand): array<long> —
    * band b's bucket = XXH64 chain over its rowsPerBand signature
    * values, seeded per band. Replaces the composed-builtin
    * transform(slice + cast-to-string + concat_ws + xxhash64) tree,
    * which ran interpreted (nested HOF lambdas) and built two strings
    * per band per row. Equal (band, slice) always yields an equal
    * bucket, so candidate recall is identical to any injective
    * bucketing; hash collisions only ever ADD candidates, which the
    * exact-Jaccard verification prunes.
    */
  case class BandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "band_buckets"

    override def nullSafeEval(a: Any): Any = {
      val sig = a.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = XXH64.hashLong(b.toLong, 42L)
        var i = 0
        while (i < rowsPerBand) {
          acc = XXH64.hashLong(sig.getLong(b * rowsPerBand + i), acc)
          i += 1
        }
        out(b) = acc
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val out = ctx.freshName("out")
        s"""
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong((long) $b, 42L);
           |  for (int $i = 0; $i < $rowsPerBand; $i++) {
           |    $acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
           |      $x.getLong($b * $rowsPerBand + $i), $acc);
           |  }
           |  $out[$b] = $acc;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** word_shingles(text, K): distinct lowercase word K-grams in first-
    * occurrence order, one pass. Replaces the composed-builtin
    * transform(sequence, slice+array_join) tree, which materialized an
    * intermediate array per shingle under interpreted evaluation.
    * CodegenFallback is fine here: the cost is algorithmic (single
    * tokenize + StringBuilder pass), and it sits in a narrow projection.
    */
  case class WordShingles(child: Expression, k: Int) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"

    override def nullSafeEval(a: Any): Any = {
      val words = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
      val out = new java.util.LinkedHashSet[String]()
      if (words.length < k) {
        out.add(words.mkString(" "))
      } else {
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= words.length - k) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          out.add(sb.toString)
          i += 1
        }
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var i = 0
      while (it.hasNext) {
        arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        i += 1
      }
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** winnow_fingerprints(text, k, w): the per-document winnowing
    * selection (Schleimer et al. 2003) in ONE native pass — distinct
    * minima (first-occurrence order) of every `w` consecutive k-token
    * window md5s over the normalized (lower, trim, \s+-split) token
    * stream; empty array when the doc has no complete w-window.
    *
    * Expression-for-expression parity with the SQL formulation it
    * replaces (md5(array_join(slice(split(lower(trim(text))))))) +
    * sliding-min window + complete-window filter + distinct):
    * normalization goes through UTF8String.toLowerCase/trim — the
    * Lower/StringTrim code paths, so locale and space-only-trim
    * semantics match exactly — the window digest is the same md5 hex
    * of the UTF-8 bytes of the space-joined slice, and hex strings
    * compare identically under String and UTF8String binary order.
    *
    * WHY an expression: fingerprint selection is doc-local, but the
    * explode + (count window, sliding-min window) formulation forces a
    * full sort EXCHANGE of the O(tokens) window stream — the only sort
    * shuffle in the dedup family. This pass keeps selection inside the
    * scan stage; only the selected ~2/(w+1) fingerprints ever become
    * rows.
    */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(k > 0 && w > 0, "window sizes must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "winnow_fingerprints"

    override def nullSafeEval(a: Any): Any = {
      // limit -1: Spark's StringSplit keeps trailing empty strings
      // (visible when trim's space-only strip leaves a trailing tab)
      val words = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toLowerCase.trim.toString.split("\\s+", -1)
      val m = words.length - (k - 1) // complete k-windows
      if (m < w) return new GenericArrayData(Array.empty[Any])
      val md = java.security.MessageDigest.getInstance("MD5")
      val hashes = new Array[String](m)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        md.reset()
        val dig = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(b * 2) = Character.forDigit((dig(b) >> 4) & 0xf, 16)
          hex(b * 2 + 1) = Character.forDigit(dig(b) & 0xf, 16)
          b += 1
        }
        hashes(i) = new String(hex)
        i += 1
      }
      // distinct sliding minima over complete w-windows of the hash
      // stream, first-occurrence order (w is small: the O(m*w) rescan
      // beats deque bookkeeping at these widths)
      val out = new java.util.LinkedHashSet[String]()
      i = 0
      while (i <= m - w) {
        var mn = hashes(i)
        var j = 1
        while (j < w) {
          val h = hashes(i + j)
          if (h.compareTo(mn) < 0) mn = h
          j += 1
        }
        out.add(mn)
        i += 1
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      i = 0
      while (it.hasNext) {
        arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        i += 1
      }
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jaccard_sets(a, b): |A ∩ B| / |A ∪ B| of two string arrays
    * (duplicate elements on either side are ignored — true set
    * semantics), rounded to 4dp (HALF_UP, matching Spark round);
    * 0.0 when the union is empty. One hash-set pass instead of the
    * interpreted array_intersect + array_union pair — this sits in the
    * quadratic candidate-verification stage, the exact spot the module
    * doc says must not run interpreted.
    */
  case class JaccardSets(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sets"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      val bb = b.asInstanceOf[ArrayData]
      val na = aa.numElements()
      val nb = bb.numElements()
      val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
      var i = 0
      while (i < na) { setA.add(aa.getUTF8String(i)); i += 1 }
      // distinct-count b and the intersection in the same pass, so the
      // union formula stays exact even when inputs carry duplicates
      val setB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nb * 2)
      var inter = 0
      i = 0
      while (i < nb) {
        val e = bb.getUTF8String(i)
        if (setB.add(e) && setA.contains(e)) inter += 1
        i += 1
      }
      val union = setA.size + setB.size - inter
      if (union <= 0) 0.0
      else java.math.BigDecimal.valueOf(inter.toDouble / union)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }

    // Real codegen, NOT CodegenFallback: this expression sits inside
    // the quadratic verify stage of every dedup/similarity query, and a
    // fallback would force a per-pair InternalRow materialization (the
    // joined row copies BOTH shingle arrays) around an otherwise
    // codegen'd crossJoin/filter/agg pipeline — measured 2.5x on the
    // q_sim_jacc exact gate at sf0.1.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val setA = ctx.freshName("setA")
        val setB = ctx.freshName("setB")
        val i = ctx.freshName("i")
        val e = ctx.freshName("e")
        val inter = ctx.freshName("inter")
        val union = ctx.freshName("union")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $setA =
           |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>($na * 2);
           |for (int $i = 0; $i < $na; $i++) { $setA.add($a.getUTF8String($i)); }
           |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $setB =
           |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>($nb * 2);
           |int $inter = 0;
           |for (int $i = 0; $i < $nb; $i++) {
           |  org.apache.spark.unsafe.types.UTF8String $e = $b.getUTF8String($i);
           |  if ($setB.add($e) && $setA.contains($e)) $inter++;
           |}
           |int $union = $setA.size() + $setB.size() - $inter;
           |${ev.value} = ($union <= 0) ? 0.0D
           |  : java.math.BigDecimal.valueOf((double) $inter / $union)
           |      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** text_stats_counts(text, families): ONE char-level pass computing
    * every token/character count the stats annotation needs, replacing
    * a split + one interpreted higher-order filter PER family + two
    * regexp scans. Returns array<long> laid out as
    * `[n_toks, perFamilyCount..., n_nonws_cp, n_punct_cp]` where:
    *
    *  - `n_toks` / per-family counts replicate
    *    `size(split(lower(trim(text)), "\\s+"))` and
    *    `size(filter(tokens, isin(family)))` EXACTLY, including the
    *    edges: Spark `trim` strips 0x20 only, and Spark's `split`
    *    passes limit -1 to Java `Pattern.split`, so BOTH a leading
    *    empty token (post-trim leading tab) AND a trailing empty token
    *    (post-trim trailing tab/newline) are kept — unlike Java's
    *    default split — and "" splits to [""];
    *  - `n_nonws_cp` = code points of the ORIGINAL text outside Java
    *    regex `\s` (= the 6 ASCII whitespace chars) — the value of
    *    `length(regexp_replace(text, "\\s+", ""))`;
    *  - `n_punct_cp` = code points matching `[^A-Za-z0-9\s]` — the
    *    value of `size(regexp_extract_all(text, "[^A-Za-z0-9\\s]"))`.
    */
  case class TextStatsCounts(child: Expression, families: Seq[Seq[String]])
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "text_stats_counts"

    @transient private lazy val sets: Array[java.util.HashSet[String]] =
      families.map { f =>
        val s = new java.util.HashSet[String](f.size * 2)
        f.foreach(s.add)
        s
      }.toArray

    // Java regex \s — ASCII-only, NOT Character.isWhitespace
    private def isWs(c: Int): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

    override def nullSafeEval(a: Any): Any = {
      val u = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val full = u.toString
      val nFam = sets.length
      val out = new Array[Long](nFam + 3)
      var i = 0
      while (i < full.length) {
        val cp = full.codePointAt(i)
        if (!isWs(cp)) {
          out(nFam + 1) += 1
          val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
            (cp >= '0' && cp <= '9')
          if (!alnum) out(nFam + 2) += 1
        }
        i += Character.charCount(cp)
      }
      // trim + lowercase via UTF8String — the EXACT code paths of
      // Spark's Trim/Lower expressions (ASCII fast path, JVM-default-
      // locale slow path), so tokenization stays expression-for-
      // expression identical to the lower(trim(text)) scalar pipeline
      // under ANY default locale (tr/az/lt cased non-ASCII included)
      val s = u.trim().toLowerCase().toString
      if (s.isEmpty) out(0) = 1L // "".split -> [""]
      else {
        if (isWs(s.charAt(0))) out(0) += 1 // post-trim leading \t etc.
        if (isWs(s.charAt(s.length - 1))) out(0) += 1 // trailing \t/\n (limit -1)
        val sb = new java.lang.StringBuilder(16)
        var inTok = false
        var j = 0
        def flush(): Unit = {
          out(0) += 1
          val tok = sb.toString
          var f = 0
          while (f < nFam) {
            if (sets(f).contains(tok)) out(1 + f) += 1
            f += 1
          }
          sb.setLength(0)
        }
        while (j < s.length) {
          val c = s.charAt(j)
          if (isWs(c)) { if (inTok) { flush(); inTok = false } }
          else { sb.append(c); inTok = true }
          j += 1
        }
        if (inTok) flush()
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Static scanner for [[WindowHashes128]]: one 16-byte hash per
    * k-token window of `arr`, from TWO independently-seeded XXH64
    * chains over per-token hashes. Equivalent to hashing
    * `array_join(slice(toks, s, k), " ")` — whitespace-split tokens
    * never contain the joiner, so the joined string is a bijection of
    * the token sequence — at 128-bit strength (the md5 the span
    * operators used), but with NO window string, NO slice array and
    * NO hex encoding: per window the only allocation is its 16-byte
    * key, and the per-token byte hashing happens once per token
    * instead of once per covering window.
    */
  def windowHashes128(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[AnyRef])
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      th1(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 0L)
      th2(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 0x9e3779b97f4a7c15L)
      i += 1
    }
    val out = new Array[AnyRef](n - k + 1)
    var s0 = 0
    while (s0 <= n - k) {
      var h1 = 0L
      var h2 = 0x5bd1e9955bd1e995L
      var j = 0
      while (j < k) {
        h1 = XXH64.hashLong(th1(s0 + j), h1)
        h2 = XXH64.hashLong(th2(s0 + j), h2)
        j += 1
      }
      val b = new Array[Byte](16)
      var m = 0
      while (m < 8) {
        b(m) = (h1 >>> (56 - 8 * m)).toByte
        b(m + 8) = (h2 >>> (56 - 8 * m)).toByte
        m += 1
      }
      out(s0) = b
      s0 += 1
    }
    new GenericArrayData(out)
  }

  /** Static scanner for [[HashEmbedding]]: the feature-hashing
    * ("hashing trick") signed bag-of-words sum in ONE pass per row,
    * byte-exact with the composed form it replaced —
    * `explode(split(lower(trim(text)), "\\s+"))` → per-token
    * `conv(substring(md5(tok),1,4),16,10) % dim` bucket and
    * `conv(substring(md5(tok),5,1),16,10) % 2` sign → (id, dim)
    * aggregation → map assembly. The composed pipeline shuffled the
    * corpus's ENTIRE token stream twice (the (id, dim) aggregate and
    * the per-id map assembly); the embedding is a pure per-row
    * function, so none of that needs to leave the scan. Split warts
    * (leading/trailing "" tokens under limit -1, "" → [""]) and
    * Spark's trim/toLowerCase are reproduced exactly: the first 4 hex
    * chars of md5 are bytes 0-1, the 5th hex char is the high nibble
    * of byte 2.
    */
  def hashEmbedding(s: org.apache.spark.unsafe.types.UTF8String,
                    dim: Int): GenericArrayData = {
    val out = new Array[Double](dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    def add(tokBytes: Array[Byte], from: Int, len: Int): Unit = {
      md.reset()
      md.update(tokBytes, from, len)
      md.digest(dig, 0, 16)
      val d = (((dig(0) & 0xff) << 8) | (dig(1) & 0xff)) % dim
      val sign = if (((dig(2) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
      out(d) += sign
    }
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (i < n && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      // trim spaces, lower into one copied buffer, walk split tokens
      var t0 = 0
      while (t0 < n && s.getByte(t0) == ' ') t0 += 1
      var t1 = n
      while (t1 > t0 && s.getByte(t1 - 1) == ' ') t1 -= 1
      val low = new Array[Byte](t1 - t0)
      var p = t0
      while (p < t1) {
        val b = s.getByte(p)
        low(p - t0) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        p += 1
      }
      def ws(b: Byte): Boolean =
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      val m = low.length
      if (m == 0) add(low, 0, 0) // "" splits to [""]
      else {
        var i2 = 0
        var tokStart = 0
        var done = false
        while (!done) {
          if (i2 == m || ws(low(i2))) {
            add(low, tokStart, i2 - tokStart)
            if (i2 == m) done = true
            else {
              while (i2 < m && ws(low(i2))) i2 += 1
              tokStart = i2
              if (i2 == m) { add(low, i2, 0); done = true }
            }
          } else i2 += 1
        }
      }
    } else {
      // exact fallback: the same UTF8String trim/toLowerCase +
      // java.util.regex split the builtins use
      val lowStr = s.trim().toLowerCase.toString
      val toks: Array[String] =
        if (lowStr.isEmpty) Array("")
        else wsSplitPattern.split(lowStr, -1)
      toks.foreach { t =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        add(b, 0, b.length)
      }
    }
    new GenericArrayData(out)
  }

  private val wsSplitPattern = java.util.regex.Pattern.compile("\\s+")

  /** hash_embedding(text, dim): the deterministic, vocabulary-free
    * dense doc representation (Weinberger et al. 2009, the "hashing
    * trick") as one codegen scan — integer-valued components, so
    * downstream dot/norm stays exact in double.
    */
  case class HashEmbedding(child: Expression, dim: Int)
      extends UnaryExpression {
    require(dim > 0 && dim <= 65536,
      "dim in [1, 65536] (the bucket draws 16 bits of md5)")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "hash_embedding"

    override def nullSafeEval(a: Any): Any =
      hashEmbedding(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x =>
        s"graft.functions.TextHashExpressions.hashEmbedding($x, $dim)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** window_hashes128(toks, k): 16-byte hash per k-token window. */
  case class WindowHashes128(child: Expression, k: Int)
      extends UnaryExpression {
    require(k > 0, "window must be positive")
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "window_hashes128"

    override def nullSafeEval(a: Any): Any =
      windowHashes128(a.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x =>
        s"graft.functions.TextHashExpressions.windowHashes128($x, $k)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Static merge-scan |A ∩ B| for [[SortedIntersectSize]] — static so
    * generated code calls it directly.
    */
  def intersectSizeSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  /** Long-array variant of [[intersectSizeSorted]] — same ascending-
    * distinct caller contract, primitive comparisons (the hash-carry
    * verify stage: token sets travel as sorted xxhash64 arrays).
    */
  def intersectSizeSortedLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** sorted_token_hashes(tokens: array<string>) → ascending DISTINCT
    * array<long> of per-token xxhash64 (seed 42, Spark's own string
    * hash): the set-of-tokens representation the all-pairs join
    * carries INSTEAD of string arrays (round 15 — the verify stage's
    * sort-merge joins were sorting/spilling gigabytes of shingle-
    * string payload at sf30; 8-byte elements shrink it ~8× and make
    * the merge intersect primitive-compare). Input need not be
    * distinct or sorted; equal hashes collapse (a cross-token
    * collision merges two tokens into one set element on EVERY doc
    * containing either — the 2^-64-scale equivalence posture of the
    * prefix stage, now applied to the verify side and spec-pinned
    * against the string form). Null elements are ignored (split/
    * shingle outputs never produce them).
    */
  def sortedTokenHashes(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val buf = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        buf(m) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, m)
    // collapse equal neighbors: the output is a SET
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || buf(w - 1) != buf(i)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(buf, 0, out, 0, w)
    new GenericArrayData(out)
  }

  case class SortedTokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "sorted_token_hashes"

    override def nullSafeEval(input: Any): Any =
      sortedTokenHashes(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.TextHashExpressions.sortedTokenHashes($a)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def sorted_token_hashes(tokens: Column): Column =
    column(SortedTokenHashes(expression(tokens)))

  /** sorted_intersect_size(a, b): |A ∩ B| of two string arrays that
    * are ASCENDING AND DISTINCT (the caller's contract —
    * [[graft.ops.AllPairs.tokenSets]] sorts its distinct shingle
    * arrays exactly so this works) via one merge scan: no per-pair
    * hash set, no materialized intersection array. UTF8String's
    * compareTo is binary, the same ordering sort_array applies to
    * strings, so the merge is sound. This sits in the all-pairs
    * verify stage where [[JaccardSets]]'s rounded output cannot be
    * used — the threshold test there is the exact integer form
    * |a∩b| >= tau·|a∪b|.
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_size"

    // element-type dispatch: string arrays (the original contract) or
    // long arrays (the hash-carry verify stage) — resolved once at
    // plan time, primitive merge in both generated paths
    private def longElems: Boolean = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }

    // BOTH sides must be arrays of the SAME supported element type:
    // left-only dispatch would let array<long> vs array<string> pass
    // analysis and silently merge getLong reads over string bytes
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(lt, _), ArrayType(rt, _))
            if lt == rt && (lt == StringType || lt == LongType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "sorted_intersect_size requires two arrays of the same " +
              s"element type (string or bigint), got ${l.catalogString} " +
              s"and ${r.catalogString}")
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      if (longElems)
        intersectSizeSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else
        intersectSizeSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (longElems) "intersectSizeSortedLong" else "intersectSizeSorted"
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.TextHashExpressions.$fn($a, $b)")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Shannon entropy (bits) of the codepoint distribution of `text` —
    * the classic cheap quality/garbage signal: natural prose sits
    * around 4–4.5 bits, template spam / repeated-char junk collapses
    * toward 0, and base64/binary blobs push past 5.5. One map-side
    * pass per row (ASCII counts in a flat 128-slot array, a spillover
    * map only for non-ASCII codepoints); no shuffle anywhere.
    * Empty/whitespace-free strings are total: entropy of "" is 0.
    */
  def charEntropy(u: org.apache.spark.unsafe.types.UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val slot = other.computeIfAbsent(cp, _ => new Array[Long](1))
        slot(0) += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    val ln2 = java.lang.Math.log(2.0)
    var h = 0.0
    var c = 0
    while (c < 128) {
      val cnt = ascii(c)
      if (cnt > 0) {
        val p = cnt.toDouble / n
        h -= p * (java.lang.Math.log(p) / ln2)
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val p = it.next()(0).toDouble / n
        h -= p * (java.lang.Math.log(p) / ln2)
      }
    }
    h
  }

  /** char_entropy(text): double — see [[charEntropy]]. Codegen emits a
    * call to the static helper so the surrounding stage stays inside
    * whole-stage codegen (the filter/projection pipelines this feeds
    * are the C4/Gopher-style quality gates, always in the hot scan).
    */
  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "char_entropy"

    override def nullSafeEval(a: Any): Any =
      charEntropy(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        s"${ev.value} = graft.functions.TextHashExpressions.charEntropy($x);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def char_entropy(text: Column): Column =
    column(CharEntropy(expression(text)))

  def text_stats_counts(text: Column, families: Seq[Seq[String]]): Column =
    column(TextStatsCounts(expression(text), families))

  def jaccard_sets(a: Column, b: Column): Column =
    column(JaccardSets(expression(a), expression(b)))

  def sorted_intersect_size(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))

  def window_hashes128(toks: Column, k: Int): Column =
    column(WindowHashes128(expression(toks), k))

  def hash_embedding(text: Column, dim: Int): Column =
    column(HashEmbedding(expression(text), dim))

  def minhash_signature(shingles: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(shingles), numHashes))

  def band_buckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    column(BandBuckets(expression(sig), bands, rowsPerBand))

  def word_shingles(text: Column, k: Int): Column =
    column(WordShingles(expression(text), k))

  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(text), k, w))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  /** Register for spark.sql use (simhash64 only; minhash_signature
    * needs a literal int arg and is Column-API-first).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
  }
}
