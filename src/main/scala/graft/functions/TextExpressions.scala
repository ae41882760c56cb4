package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WORD_SHINGLES(tokens, n): distinct n-word shingles of a token array,
  * space-joined — the hot inner loop of every near-dup operator
  * (SURVEY.md §2 training-pipeline dedup).
  *
  * Native codegen replaces the composed-HOF form
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))`, which
  * evaluates interpreted (higher-order lambdas never enter whole-stage
  * codegen) and re-reads the token array per element. One tight loop with
  * a LinkedHashSet reproduces array_distinct's first-occurrence order
  * exactly. Empty result when the doc has fewer than n tokens.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val num = arr.numElements()
    val set = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i + n - 1 < num) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      set.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val sep = ctx.addReferenceObj("shingleSep", UTF8String.fromString(" "), utf8)
      val set = ctx.freshName("set")
      val parts = ctx.freshName("parts")
      val num = ctx.freshName("num")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |final int $num = $a.numElements();
         |final java.util.LinkedHashSet<$utf8> $set = new java.util.LinkedHashSet<$utf8>();
         |final $utf8[] $parts = new $utf8[$n];
         |for (int $i = 0; $i + ${n - 1} < $num; $i++) {
         |  for (int $k = 0; $k < $n; $k++) {
         |    $parts[$k] = $a.getUTF8String($i + $k);
         |  }
         |  $set.add($utf8.concatWs($sep, $parts));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** MINHASH_SIG(shingles, numHashes): per hash seed i, the lexicographic
  * minimum of md5Hex("i:" + shingle) over the shingle set — one native
  * loop instead of numHashes interpreted transform/array_min pipelines.
  * Identical values to `array_min(transform(sh, s -> md5('i:' || s)))`
  * (hex strings compare bytewise = lexicographically). Null entries for
  * an empty shingle set, matching array_min's null on empty input. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(MinHashSignature.compute(arr, numHashes)
      .asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $helper.compute($a, $numHashes));
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** shared tight loop: hex md5 minima per seed (called from codegen) */
  def compute(arr: ArrayData, numHashes: Int): Array[UTF8String] = {
    val num = arr.numElements()
    val out = new Array[UTF8String](numHashes)
    var h = 0
    while (h < numHashes) {
      val prefix = s"$h:".getBytes("UTF-8")
      var best: String = null
      var i = 0
      while (i < num) {
        // input arrays may carry null entries (containsNull accepted);
        // array_min(transform(...)) skips nulls, so the native loop must too
        if (!arr.isNullAt(i)) {
          val sb = arr.getUTF8String(i).getBytes
          val buf = new Array[Byte](prefix.length + sb.length)
          System.arraycopy(prefix, 0, buf, 0, prefix.length)
          System.arraycopy(sb, 0, buf, prefix.length, sb.length)
          val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(buf)
          if (best == null || hex.compareTo(best) < 0) best = hex
        }
        i += 1
      }
      out(h) = if (best == null) null else UTF8String.fromString(best)
      h += 1
    }
    out
  }
}

/** SIMHASH64(tokens): 64-bit SimHash as a 64-char '0'/'1' string — bit
  * 4d+j (0-indexed) is the majority vote over all tokens of bit (3-j)
  * of hex digit d+1 of md5Hex(token): every bit of the first 16 md5
  * nibbles, a 2^64 signature space. Native codegen replaces the
  * composed-HOF form (md5 transform + 64-wide aggregate/zip_with),
  * which evaluates interpreted and allocates a 64-element array per
  * token; one tight loop accumulates all 64 bit counts per doc.
  * Identical values to the HOF composition (DedupSpec gates it); the
  * DuckDB oracle replays the same bit rule over list_transform(w, md5).
  * Null token entries are skipped in the counts but stay in the
  * majority denominator, matching size(w). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** shared tight loop: 64 bit-majority counters (called from codegen) */
  def compute(arr: ArrayData): UTF8String = {
    val num = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val hex = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(arr.getUTF8String(i).getBytes)
        var d = 0
        while (d < 16) {
          val c = hex.charAt(d)
          val v = if (c <= '9') c - '0' else c - 'a' + 10
          val base = d << 2
          counts(base) += (v >> 3) & 1
          counts(base + 1) += (v >> 2) & 1
          counts(base + 2) += (v >> 1) & 1
          counts(base + 3) += v & 1
          d += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var p = 0
    while (p < 64) {
      out(p) = if (counts(p) * 2 >= num) '1'.toByte else '0'.toByte
      p += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** NORMALIZE_UNICODE(text): Unicode normalization (NFC/NFD/NFKC/NFKD)
  * via `java.text.Normalizer` as a native codegen expression — Spark
  * has no builtin normalizer, and web-crawl text mixes composed and
  * decomposed forms that break exact dedup/fingerprinting. The DuckDB
  * oracle's `nfc_normalize` matches form = NFC. */
case class NormalizeUnicode(child: Expression, form: String) extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"unknown form $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($a.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

/** Static kernel shared by DeflateRatio's interpreted and generated
  * paths (codegen calls it by fully-qualified name). */
/** GEAR_BOUNDARIES(text, bits): 1-based char positions where a Gear
  * rolling hash (h = (h << 1) + G[char & 0xFF]) masks to zero over the
  * trailing window — TRUE O(n) content-defined chunk boundaries (one
  * table lookup + shift + add per char), the 100 TB complement to
  * [[graft.operators.TextAnalysis.cdcChunks]]' oracle-replayable
  * md5-window rule (which recomputes a hash per position). Expected
  * chunk length is 2^bits chars. Deterministic: the 256-entry gear
  * table derives from a fixed xorshift64 seed.
  */
case class GearBoundaries(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 30, s"bits must be in [1,30], got $bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.gearBoundaries(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.gearBoundaries($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

object TextKernels {
  /** the Gear random table: 256 fixed u64s from a seeded xorshift64 */
  val gearTable: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x
    }
  }

  /** see [[GearBoundaries]]; shared by interpreted eval and codegen.
    * Walks CODE POINTS and emits 1-based code-point positions, because the
    * consumer ([[graft.operators.TextAnalysis.chunksFromBoundaries]]) slices
    * with Spark `substr`/`length`, which count code points — a UTF-16
    * char-unit walk would shift every boundary after a supplementary-plane
    * character (emoji are routine in web corpora) and could emit positions
    * past `length(text)`. */
  def gearBoundaries(s: UTF8String, bits: Int): ArrayData = {
    val mask = (1L << bits) - 1
    val str = s.toString
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var i = 0
    var cp = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      i += Character.charCount(c)
      cp += 1
      h = (h << 1) + gearTable(c & 0xFF)
      if ((h & mask) == 0L) out.add(cp)
    }
    new GenericArrayData(out.toArray)
  }

  /** One HTML block: visible text + how many of its chars came from
    * inside <a> anchors (the link-density signal boilerplate removal
    * keys on). */
  final case class HtmlBlock(text: String, linkChars: Int)

  private val blockTags = Set("p", "div", "br", "li", "ul", "ol", "tr",
    "td", "th", "table", "h1", "h2", "h3", "h4", "h5", "h6", "section",
    "article", "header", "footer", "nav", "aside", "blockquote", "pre",
    "form", "main", "figure", "figcaption", "hr", "dl", "dt", "dd")
  // whole-container drops. "head" is NOT here: its end tag is optional in
  // HTML5 (auto-closes at <body>/flow content) and sloppy pages omit it, so
  // skip-to-</head> would swallow the whole document; instead the <head> tag
  // itself is ignored and its only text-bearing child, <title>, is dropped
  // as a container (an unclosed <title> eating to EOF matches browsers).
  private val dropTags = Set("script", "style", "noscript", "template",
    "svg", "title", "iframe")

  /** Segment an HTML document into visible-text blocks with per-block
    * anchor-char counts — ONE deterministic O(n) index walk, no regex
    * (regex tag-stripping backtracks catastrophically on adversarial
    * web junk). Handles: `<script>/<style>/<head>/…` containers dropped
    * whole, `<!-- -->` comments, CDATA, block-level tags as block
    * boundaries, named + decimal + hex entities, tag-soup tolerance
    * (an unclosed `<` near EOF is literal text; attributes may contain
    * `>` inside quotes). */
  def htmlBlocks(html: String): Array[HtmlBlock] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[HtmlBlock]
    val sb = new java.lang.StringBuilder
    var linkChars = 0
    var inA = 0
    var lastSpace = true
    def flush(): Unit = {
      // trim trailing space
      while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
        sb.setLength(sb.length - 1)
      if (sb.length > 0) out += HtmlBlock(sb.toString, math.min(linkChars, sb.length))
      sb.setLength(0); linkChars = 0; lastSpace = true
    }
    def emit(c: Char): Unit =
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u00A0') {
        if (!lastSpace && sb.length > 0) { sb.append(' '); if (inA > 0) linkChars += 1 }
        lastSpace = true
      } else {
        sb.append(c); if (inA > 0) linkChars += 1; lastSpace = false
      }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i + 1, "!--", 0, 3)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, i + 1, "![CDATA[", 0, 8)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          // markup declaration / PI (<!DOCTYPE …>, <?xml …?>): never text
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else {
          // tag name
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(ns, j).toLowerCase
          if (ns == j && !closing) { emit('<'); i += 1 } // bare '<': literal
          else {
            // advance past the tag, honoring quoted attribute values
            var q = '\u0000'
            while (j < n && (q != '\u0000' || html.charAt(j) != '>')) {
              val ch = html.charAt(j)
              if (q == '\u0000' && (ch == '"' || ch == '\'')) q = ch
              else if (ch == q) q = '\u0000'
              j += 1
            }
            val selfClosed = j <= n && j > i && html.charAt(math.max(i, j - 1)) == '/'
            i = if (j < n) j + 1 else n
            if (!closing && dropTags(name) && !selfClosed) {
              // skip the whole container to its close tag
              val close = s"</$name"
              val e = indexOfIgnoreCase(html, close, i)
              if (e < 0) i = n
              else {
                val gt = html.indexOf('>', e)
                i = if (gt < 0) n else gt + 1
              }
            } else if (name == "a") {
              if (closing) inA = math.max(0, inA - 1) else if (!selfClosed) inA += 1
            } else if (blockTags(name)) flush()
          }
        }
      } else if (c == '&') {
        val (decoded, len) = decodeEntity(html, i)
        decoded.foreach(emit)
        i += len
      } else { emit(c); i += 1 }
    }
    flush()
    out.toArray
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** decode the entity starting at `i` ('&'); returns (text, consumed).
    * Unknown entities pass through literally (web reality). */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) return ("&", 1)
    val body = s.substring(i + 1, semi)
    val decoded = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try new String(Character.toChars(Integer.parseInt(b.drop(2), 16)))
        catch { case _: Exception => null }
      case b if b.startsWith("#") =>
        try new String(Character.toChars(Integer.parseInt(b.drop(1))))
        catch { case _: Exception => null }
      case _ => null
    }
    if (decoded == null) ("&", 1) else (decoded, semi - i + 1)
  }

  /** all visible text, blocks joined with newlines — the plain
    * tag-strip (see [[StripHtml]]) */
  def stripHtml(s: UTF8String): UTF8String =
    UTF8String.fromString(htmlBlocks(s.toString).map(_.text).mkString("\n"))

  /** boilerplate-filtered main content (see [[ExtractMainContent]]):
    * keep blocks long enough AND not link-dominated */
  def extractMain(s: UTF8String, minChars: Int, maxLinkDensity: Double): UTF8String =
    UTF8String.fromString(
      htmlBlocks(s.toString).collect {
        case b if b.text.length >= minChars &&
          b.linkChars.toDouble / math.max(b.text.length, 1) <= maxLinkDensity =>
          b.text
      }.mkString("\n"))

  // ------------------------------------------------------- mojibake
  // UTF-8 bytes decoded as Windows-1252/latin-1 is the dominant
  // crawl-corpus encoding failure ("é" → "Ã©", "—" → "â€”"); the ftfy
  // repair is to re-encode the TEXT as (sloppy) cp1252 and re-decode
  // the bytes as STRICT UTF-8. The repair applies only when that
  // round-trip is exact — every char maps to a byte AND the bytes form
  // valid UTF-8 — which genuine non-ASCII text essentially never
  // satisfies ("café" → bytes 63 61 66 E9 → E9 is an invalid UTF-8
  // lead → unchanged), while real mojibake satisfies by construction.
  // ASCII round-trips to itself and stops the loop. Up to
  // `MojibakeRounds` passes unwind double-encoded text.

  private val MojibakeRounds = 3

  // "sloppy windows-1252" inverse (the ftfy convention): the 27 defined
  // 0x80–0x9F specials map back to their byte; C1 controls (what a
  // latin-1 decoder — or a WHATWG cp1252 decoder on the five undefined
  // slots — emitted for those bytes) pass through as their own byte, so
  // BOTH mangle flavors found in real crawls reverse exactly.
  private val inv1252: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]
    val specials = Seq(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    specials.foreach { case (b, c) => m.put(c, b.toByte) }
    m
  }

  private val mojibakeDec = ThreadLocal.withInitial[java.nio.charset.CharsetDecoder](() =>
    java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT))

  /** one sloppy-cp1252-encode → strict-UTF-8-decode pass; null when the
    * string does not round-trip (= is not mojibake) */
  private def repairMojibakeOnce(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte // ASCII + latin-1 + C1 pass-through
      else {
        val b = inv1252.get(c)
        if (b == null) return null // not a cp1252 decoder's output
        bytes(i) = b
      }
      i += 1
    }
    try mojibakeDec.get().reset()
      .decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** FIX_MOJIBAKE kernel (see [[FixMojibake]]) */
  def fixMojibake(s: UTF8String): UTF8String = {
    var cur = s.toString
    var changed = false
    var i = 0
    var done = false
    while (i < MojibakeRounds && !done) {
      val r = repairMojibakeOnce(cur)
      if (r == null || r == cur) done = true
      else { cur = r; changed = true }
      i += 1
    }
    if (changed) UTF8String.fromString(cur) else s
  }

  private val md5Tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** HASH_UNIFORM kernel (see [[HashUniform]]): the 31-ary fold of the
    * 32 lowercase md5 hex chars, mapped to a uniform in (0, 1] (closed)
    * or (0, 1) (open, +0.5 — what Gumbel double-logs need). EXACTLY the
    * value of the Column-level fold it replaces
    * (`aggregate(transform(sequence(1,32), ascii∘substr(md5 …))))` —
    * same integer fold, same final double ops — so every DuckDB oracle
    * replaying the fold via list_reduce stays bit-identical. Native
    * because the higher-order-function form is interpreted (no codegen)
    * and re-evaluates the md5 subtree per lambda element: ~40µs/row
    * against this kernel's ~1µs — the difference between a sampler scan
    * that keeps up with the reader and one 30x behind it. */
  def hashUniform(s: UTF8String, open: Boolean): Double = {
    val md = md5Tl.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    var code = 0L
    var i = 0
    while (i < 16) {
      val b = dig(i) & 0xFF
      code = (code * 31 + HexChars(b >>> 4)) % 1000003L
      code = (code * 31 + HexChars(b & 0xF)) % 1000003L
      i += 1
    }
    if (open) (code.toDouble + 0.5) / 1000004.0
    else (code + 1).toDouble / 1000004.0
  }

  /** CHAR_ENTROPY kernel (see [[CharEntropy]]): Shannon entropy in bits
    * over the CODE-POINT distribution of the string — the classic
    * gibberish/low-information signal (near-0 for repeated filler like
    * "aaaa…", ~log2(alphabet) for keyboard mash or base64 blobs; natural
    * prose sits in between). Code points, not UTF-16 units, so a
    * supplementary-plane emoji counts once, matching engines whose
    * character unit is the code point (DuckDB's `string_split(s,'')`
    * oracle replay). Accumulation runs in sorted-code-point order so the
    * float sum is deterministic across JVMs and row orders. */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    val ln2 = math.log(2.0)
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * (math.log(p) / ln2)
    }
    h
  }

  /** REDACT_CARDS kernel (see [[RedactCards]]): find runs of 13–19
    * digits (single spaces or dashes between groups allowed), replace
    * with `<CARD>` ONLY when the digits pass the Luhn checksum — the
    * validation a bare payment-card regex lacks (any 16-digit id would
    * false-positive; 90% of random digit strings fail Luhn). One O(n)
    * scan, no regex. */
  def redactCards(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c < '0' || c > '9') { sb.append(c); i += 1 }
      else {
        // candidate run: digit GROUPS with single ' '/'-' separators.
        // The card may be any contiguous SPAN of groups — a card next
        // to its CVC ("4111... 123") or after a phone number must still
        // redact, so spans are tried greedily longest-first per start
        // instead of only the whole run (a merged run fails Luhn or
        // length and a whole-run-only check would LEAK the card).
        val starts = new java.util.ArrayList[Integer]
        val ends = new java.util.ArrayList[Integer] // exclusive
        var j = i
        var lastDigit = i - 1
        var ok = true
        while (ok && j < n) {
          val ch = str.charAt(j)
          if (ch >= '0' && ch <= '9') {
            if (starts.size == ends.size) starts.add(j)
            lastDigit = j; j += 1
            if (j >= n || str.charAt(j) < '0' || str.charAt(j) > '9')
              ends.add(j)
          }
          else if ((ch == ' ' || ch == '-') && j + 1 < n &&
            str.charAt(j + 1) >= '0' && str.charAt(j + 1) <= '9' &&
            j == lastDigit + 1) j += 1
          else ok = false
        }
        val m = starts.size
        // digit prefix-sums: digitsUpTo(k) = digits in groups [0, k)
        val pre = new Array[Int](m + 1)
        var gp = 0
        while (gp < m) {
          pre(gp + 1) = pre(gp) + (ends.get(gp) - starts.get(gp)); gp += 1
        }
        def spanDigits(a: Int, b: Int): Int = pre(b + 1) - pre(a)
        var emitted = i
        var g = 0
        while (g < m) {
          // longest Luhn-valid 13-19-digit span starting at group g.
          // Every group holds >=1 digit, so a <=19-digit span covers at
          // most 19 groups: cap h at g+18 — keeps the scan O(m*19) even
          // on adversarial thousand-group runs ("1 2 3 ... 20000").
          var hit = -1
          var h = math.min(g + 18, m - 1)
          while (hit < 0 && h >= g) {
            val d = spanDigits(g, h)
            if (d >= 13 && d <= 19 &&
              luhnValid(str.substring(starts.get(g), ends.get(h)))) hit = h
            h -= 1
          }
          if (hit >= 0) {
            sb.append(str, emitted, starts.get(g).intValue)
            sb.append("<CARD>")
            emitted = ends.get(hit)
            g = hit + 1
          } else g += 1
        }
        sb.append(str, emitted, lastDigit + 1)
        i = lastDigit + 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Luhn checksum over the digits of `s` (separators ignored) */
  private def luhnValid(s: String): Boolean = {
    var sum = 0
    var alt = false
    var i = s.length - 1
    while (i >= 0) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** deflate(bytes).length / bytes.length at zlib level 6 (raw stream,
    * no header), the Gopher/Dolma compression-ratio quality heuristic:
    * templated/repetitive junk compresses far below natural text.
    * Empty input defines as 1.0 (nothing to compress). */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) 1.0
    else {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](4096)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        n.toDouble / bytes.length
      } finally d.end()
    }
  }
}

/** HASH_UNIFORM(key): deterministic uniform in (0, 1] (or (0, 1) when
  * `open`) from the md5-fold of the key — THE sampling/shuffle/walk key
  * of the whole engine ([[graft.operators.Sampling.hashUniform]] and
  * every consumer route through here). Codegen'd native kernel; the
  * math is unchanged from the Column-level fold, so the DuckDB oracles
  * replaying it via list_reduce remain bit-identical. */
case class HashUniform(child: Expression, open: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.hashUniform(input.asInstanceOf[UTF8String], open)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.hashUniform($a, $open);")

  override protected def withNewChildInternal(newChild: Expression): HashUniform =
    copy(child = newChild)
}

/** CHAR_ENTROPY(text): Shannon entropy (bits) of the code-point
  * distribution — a map-side, shuffle-free gibberish detector (Dolma /
  * Gopher-style quality filters pair it with [[DeflateRatio]]: entropy
  * catches low-diversity filler, deflate catches long-range repetition).
  * One O(n) pass per row, codegen'd; kernel in
  * [[TextKernels.charEntropy]]. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.charEntropy($a);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** DEFLATE_RATIO(text): compressed-size / raw-size quality signal
  * (Rae et al. 2021 "Gopher" repetition filters; Dolma's zlib ratio) as
  * a native codegen expression — a Deflater pass per row, map-side
  * only, no shuffle anywhere. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.deflateRatio($a);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** STRIP_HTML(html): all visible text of an HTML document — containers
  * (`script/style/head/...`) dropped whole, comments/CDATA removed,
  * entities decoded, block-level tags become newlines, whitespace
  * collapsed. ONE O(n) native walk per row ([[TextKernels.htmlBlocks]]),
  * no regex (regex tag-stripping backtracks catastrophically on
  * adversarial web junk), map-side only — the first step of every
  * web-corpus ingest (C4/RefinedWeb/FineWeb start here). */
case class StripHtml(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.stripHtml(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.stripHtml($a);")

  override protected def withNewChildInternal(newChild: Expression): StripHtml =
    copy(child = newChild)
}

/** EXTRACT_TEXT(html[, minChars, maxLinkDensity]): boilerplate-filtered
  * main content — the jusText/boilerpipe heuristic in its
  * distribution-friendly form: segment into blocks at block-level tags,
  * then keep only blocks that are (a) long enough to be prose
  * (>= minChars visible chars) and (b) not link-dominated (anchor-text
  * chars / total chars <= maxLinkDensity). Navigation bars, footers,
  * tag clouds and related-links rails are short and link-dense, so both
  * tests reject them; article paragraphs pass. Same single O(n) walk as
  * [[StripHtml]] plus a per-block filter — map-side, no shuffle. */
case class ExtractMainContent(child: Expression, minChars: Int,
    maxLinkDensity: Double) extends UnaryExpression {
  require(minChars >= 0, "minChars must be >= 0")
  require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
    "maxLinkDensity must be in [0,1]")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.extractMain(input.asInstanceOf[UTF8String], minChars, maxLinkDensity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.extractMain($a, $minChars, $maxLinkDensity);")

  override protected def withNewChildInternal(newChild: Expression): ExtractMainContent =
    copy(child = newChild)
}

/** REDACT_CARDS(text): replace Luhn-valid 13–19-digit payment-card
  * numbers (spaces/dashes between groups allowed) with `<CARD>` — the
  * checksum-validated PII detector a bare digit regex cannot be (any
  * invoice/tracking number would false-positive). Codegen'd single-row
  * kernel, map-side only. */
case class RedactCards(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.redactCards(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.redactCards($a);")

  override protected def withNewChildInternal(newChild: Expression): RedactCards =
    copy(child = newChild)
}

/** FIX_MOJIBAKE(text): repair UTF-8-decoded-as-Windows-1252 text (the
  * ftfy recipe, the dominant crawl-corpus encoding failure): re-encode
  * as cp1252 and strictly re-decode as UTF-8, applied only when the
  * round-trip is exact — genuine non-ASCII text fails the strict decode
  * and passes through unchanged; up to three passes unwind
  * double-encodings. Codegen'd single-row kernel, map-side only. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.fixMojibake(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.fixMojibake($a);")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

/** Aho-Corasick automaton (Aho & Corasick 1975): simultaneous matching
  * of a whole phrase dictionary in ONE O(n) pass per row, independent
  * of dictionary size — the scale-correct form of wordlist filtering
  * (a per-token IN filter handles single tokens only and re-scans per
  * phrase; real blocklists are thousands of entries, many multi-word).
  *
  * Matching is char-exact and WORD-BOUNDARY aware: an occurrence
  * [s, e] counts only when text[s-1] and text[e+1] are absent or
  * non-word chars (word char = [0-9A-Za-z_], RE2's \b class), so
  * "ass" never fires inside "class" — C4's wordlist semantics.
  * Occurrences of DIFFERENT phrases may overlap and each counts;
  * self-overlapping occurrences of one phrase all count ("aa" in
  * "aaa" ends at positions 2 and 3). Emission order is deterministic:
  * by end position, longest phrase first at a shared end (the output
  * suffix-link chain's natural order).
  *
  * Built once on the driver from the phrase list and shipped to
  * generated code as a codegen reference object — per-row work never
  * rebuilds state. */
final class AhoCorasick(phraseSeq: Seq[String]) extends Serializable {
  require(phraseSeq.nonEmpty, "phrase list must be non-empty")
  require(phraseSeq.forall(_.nonEmpty), "phrases must be non-empty")
  private val phrases: Array[String] = phraseSeq.toArray
  private val outputs: Array[UTF8String] =
    phrases.map(UTF8String.fromString)
  private val phraseLen: Array[Int] = phrases.map(_.length)

  // trie: per-node char->child map (dictionaries are small; the text
  // walk is one map lookup per char)
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
  private val nodeOut = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
  private val fail = scala.collection.mutable.ArrayBuffer[Int](0)

  phrases.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    var i = 0
    while (i < p.length) {
      val c = Character.valueOf(p.charAt(i))
      val nxt = children(s).get(c)
      if (nxt == null) {
        children += new java.util.HashMap[Character, Integer]()
        nodeOut += Nil
        fail += 0
        children(s).put(c, children.size - 1)
        s = children.size - 1
      } else s = nxt
      i += 1
    }
    nodeOut(s) = pi :: nodeOut(s)
  }
  // longest-first at a node (a node can end several identical-length
  // phrases only if duplicated; insertion order breaks that tie)
  (0 until nodeOut.size).foreach(s => nodeOut(s) = nodeOut(s).sortBy(identity))

  locally { // BFS fail links; merge suffix outputs so emission is one list walk
    val q = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) => fail(v) = 0; q.add(v) }
    while (!q.isEmpty) {
      val u = q.poll()
      children(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(c)) f = fail(f)
        val fc = children(f).get(c)
        fail(v) = if (fc != null && fc != v) fc.intValue() else 0
        // longest phrase first: the node's own (deepest) outputs, then
        // the suffix chain's (already merged, already ordered)
        nodeOut(v) = nodeOut(v) ::: nodeOut(fail(v))
        q.add(v)
      }
    }
  }

  private val childArr: Array[java.util.HashMap[Character, Integer]] =
    children.toArray
  private val failArr: Array[Int] = fail.toArray
  private val outArr: Array[Array[Int]] = nodeOut.map(_.toArray).toArray

  @inline private def isWordChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
      (c >= 'A' && c <= 'Z') || c == '_'

  /** every boundary-valid occurrence, as an array of matched phrase
    * strings ordered (end position, longest first) */
  def matchAll(text: UTF8String): GenericArrayData = {
    val str = text.toString
    val n = str.length
    val hits = new scala.collection.mutable.ArrayBuffer[Any]()
    var s = 0
    var i = 0
    while (i < n) {
      val c = Character.valueOf(str.charAt(i))
      while (s != 0 && !childArr(s).containsKey(c)) s = failArr(s)
      val nxt = childArr(s).get(c)
      s = if (nxt != null) nxt.intValue() else 0
      val outs = outArr(s)
      if (outs.length > 0 && (i + 1 >= n || !isWordChar(str.charAt(i + 1)))) {
        var j = 0
        while (j < outs.length) {
          val pi = outs(j)
          val start = i - phraseLen(pi) + 1
          if (start == 0 || !isWordChar(str.charAt(start - 1)))
            hits += outputs(pi)
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(hits.toArray)
  }
}

/** MATCH_KEYWORDS(text): all boundary-valid occurrences of a phrase
  * dictionary as an array of matched phrase strings — one automaton
  * pass per row ([[AhoCorasick]]), codegen'd via a reference object so
  * the hot path stays inside whole-stage codegen. */
case class MatchKeywords(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  @transient private lazy val ac = new AhoCorasick(phrases)

  override def nullSafeEval(input: Any): Any =
    ac.matchAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acRef = ctx.addReferenceObj("ahoCorasick", ac,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $acRef.matchAll($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): MatchKeywords =
    copy(child = newChild)
}
