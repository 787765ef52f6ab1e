package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for the sketch/hash primitives Spark lacks
 * (SURVEY §2.6: the reference has no expression library — these are the
 * green-field analytics additions; design follows the guide's preference
 * order: native `Expression` over UDF for the hot path).
 *
 * All hashing is seed-deterministic so results are reproducible across runs
 * and partitionings.
 */
object HashUtil {
  /** FNV-1a 64-bit over UTF-8 bytes — cheap, stable, good diffusion. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Deterministic affine permutation parameters for MinHash. */
  def permParams(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd => bijective mod 2^64
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  /** Seed-deterministic Gaussian hyperplanes — the single source of truth
    * shared by the executor-side `HyperplaneLshBucket` expression and the
    * driver-side query bucketing in `Similarity.lshTopK` (which must agree
    * bit-for-bit or multi-probe targets the wrong buckets). */
  def hyperplanes(numBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }
}

/**
 * doGenCode that keeps the containing plan inside whole-stage codegen by
 * invoking this expression's interpreted kernel through a bound reference.
 * `CodegenFallback` would instead make `CollapseCodegenStages` exclude the
 * entire stage from WSCG — so every scan/filter/project around a sketch
 * expression would drop to interpreted volcano iteration. The per-row cost
 * here is one virtual call + boxing, which is noise next to the kernels'
 * own work (hashing, shingling, plane dot products).
 */
trait RefEvalCodegen { self: UnaryExpression =>
  /** Public bridge so generated Java (another package) can reach the
    * protected nullSafeEval. */
  def refEval(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[RefEvalCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      val javaT = CodeGenerator.javaType(dataType)
      val boxedT = CodeGenerator.boxedType(dataType)
      // `ev.isNull` may only be WRITTEN when the expression is nullable:
      // in the non-nullable branch nullSafeCodeGen never declares the
      // isNull variable (it substitutes FalseLiteral into the RETURNED
      // ExprCode only), so referencing it here produced uncompilable code
      // ("isNull_0 is not an rvalue") and silently disabled whole-stage
      // codegen for every span containing a non-nullable RefEvalCodegen
      // expression (bloom_might_contain_bc over xxhash64: 136 failed
      // Janino compiles per bench run, each span dropping to interpreted).
      if (nullable) {
        s"""
           |Object $r = $ref.refEval($c);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ($javaT)(($boxedT) $r); }
         """.stripMargin
      } else {
        // refEval cannot return null here: nullSafeEval only runs on
        // non-null input and a non-nullable kernel always produces a value
        s"${ev.value} = ($javaT)(($boxedT) $ref.refEval($c));"
      }
    })
  }
}

/**
 * MinHash signature of a set of string shingles: `numHashes` 64-bit values,
 * h_i = min over shingles of (a_i * fnv1a(shingle) + b_i), unsigned order.
 * One base hash per shingle + k affine permutations — O(n + n*k) cheap ops
 * rather than k full hash passes, so a 128-perm signature over 100-shingle
 * docs stays CPU-light at 100 TB scan widths.
 *
 * Returns null for null/empty input arrays.
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  @transient private lazy val (pa, pb) = HashUtil.permParams(numHashes, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    // sentinel must be the unsigned maximum (-1L = 0xFFFF...), NOT
    // Long.MaxValue which is only the signed max — otherwise slots whose
    // hashed values all have the top bit set would keep the sentinel
    val sig = Array.fill(numHashes)(-1L)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.fnv1a64(arr.getUTF8String(i))
        var k = 0
        while (k < numHashes) {
          val v = pa(k) * h + pb(k)
          // unsigned comparison: flip sign bit
          if ((v ^ Long.MinValue) < (sig(k) ^ Long.MinValue)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * 64-bit SimHash over string tokens: bit j of the result is 1 iff the sum of
 * (+1/-1) votes from token-hash bit j is positive. Near-duplicate documents
 * have small Hamming distance between SimHashes.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.fnv1a64(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * Unicode NFC normalization (canonical composition) — the hygiene step that
 * makes "é" spelled as e+COMBINING ACUTE byte-identical to precomposed "é",
 * so content hashes, shingles and dedup see one document, not two. Both
 * engines implement the same Unicode standard (DuckDB twin:
 * `nfc_normalize`), so the result is oracle-exact.
 */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/**
 * FNV-1a 64-bit hash of one string — the cross-engine scalar feature hash
 * (DuckDB twin: [[graft.functions.TextFunctions.sqlFnv1a64]]); used for
 * hashed n-gram feature buckets (DSIR-style importance weighting).
 */
case class Fnv1a64(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fnv1a64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashUtil.fnv1a64(input.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/**
 * Cosine similarity between two numeric arrays, computed in double precision
 * with a single sequential pass (same accumulation order as a left-to-right
 * SQL fold, so results are bit-comparable with the DuckDB oracle).
 * Null if either side is null/empty or lengths differ.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  /** Full codegen (not CodegenFallback): the similarity scan is the hot loop
    * of ANN search, so the dot-product stays inside whole-stage codegen with
    * no boxing. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : CosineSimilarity = copy(left = newLeft, right = newRight)
}

/**
 * Random-hyperplane LSH bucket for a numeric vector: bit j = sign of the dot
 * product with a seed-deterministic Gaussian hyperplane. Vectors with high
 * cosine similarity collide with high probability; the bucket id (a Long of
 * `numBits` sign bits) is a shuffle key, so candidate generation is a
 * hash-partitioned groupBy — no all-pairs join at scale.
 */
case class HyperplaneLshBucket(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression with RefEvalCodegen {
  require(numBits > 0 && numBits <= 63, s"numBits must be in [1,63], got $numBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_lsh_bucket"

  // hyperplanes materialized lazily once the vector dimension is known
  @transient private var planes: Array[Array[Double]] = _
  @transient private var planeDim: Int = -1

  private def planesFor(dim: Int): Array[Array[Double]] = {
    if (planes == null || planeDim != dim) {
      planes = HashUtil.hyperplanes(numBits, dim, seed)
      planeDim = dim
    }
    planes
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    val ps = planesFor(n)
    var bucket = 0L
    var j = 0
    while (j < numBits) {
      val p = ps(j)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * p(i); i += 1 }
      if (dot >= 0) bucket |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}

/**
 * Single-pass heuristic language id: split on single spaces, count marker
 * words per language, return the first language (in declared order) whose
 * count is positive and maximal, else "und". Semantics are exactly the
 * composed-builtin form `foldRight(when(count(lang) > 0 && count(lang) ===
 * greatest(counts), lang)...)` and the DuckDB rendering in
 * `TextFunctions.sqlLangIdGuess` — but one tight pass instead of one
 * interpreted `filter` HOF per language.
 */
case class LangIdGuess(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id_guess"

  @transient private lazy val langNames = markers.map(_._1).toArray
  @transient private lazy val markerSets: Array[java.util.HashSet[String]] =
    markers.map { case (_, ms) =>
      val s = new java.util.HashSet[String]()
      ms.foreach(s.add)
      s
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val langUtf8 = langNames.map(UTF8String.fromString)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](markerSets.length)
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        val w = text.substring(start, i)
        var l = 0
        while (l < markerSets.length) {
          if (markerSets(l).contains(w)) counts(l) += 1
          l += 1
        }
        start = i + 1
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < counts.length) { if (counts(l) > best) best = counts(l); l += 1 }
    if (best == 0) und
    else {
      var k = 0
      while (k < counts.length && counts(k) != best) k += 1
      langUtf8(k)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdGuess =
    copy(child = newChild)
}

/**
 * IVF cell assignment: arg-max over a fixed centroid matrix of
 * cosine(v, centroid_i), ties resolving to the lowest cell id. The matrix
 * rides along in the serialized expression (KB-sized — nCells × dim
 * doubles), so executors evaluate one tight O(cells × dim) kernel per row
 * inside whole-stage codegen via `RefEvalCodegen`, replacing an interpreted
 * `transform`/`aggregate` HOF fold that evaluated lambda trees per
 * centroid per row. Vectors whose cosine is undefined against every
 * centroid (zero/empty/length-mismatched) land in cell 0 — probeable,
 * never -1.
 */
case class BestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with RefEvalCodegen {
  require(centroids.nonEmpty, "centroid matrix must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "best_centroid"

  /** Plan rendering prints a DIGEST, not the matrix: the centroid literals
    * (nCells × dim doubles) appear in every copy of an index subtree, and
    * stringifying them inline made the driver's plan-description strings
    * (rebuilt for every AQE listener update) a measured ~0.5 s/run cost on
    * centroid gates — thousands of Double.toString calls per description.
    * Equality/canonicalization still see the full `centroids` field. */
  override def stringArgs: Iterator[Any] = Iterator(child,
    s"<centroids ${centroids.length}x${centroids.headOption.map(_.size).getOrElse(0)}>")

  @transient private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val cNorms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val arr = new Array[Double](n)
    var nv = 0.0
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) {
      if (v.isNullAt(i)) hasNull = true
      else { val x = v.getDouble(i); arr(i) = x; nv += x * x; i += 1 }
    }
    // a vector containing null elements is invalid: cosine is undefined, so
    // it lands in cell 0 like the zero/empty/mismatched cases (matching the
    // HOF fold this kernel replaced, where a null cosine coalesced to cell 0)
    if (hasNull) return java.lang.Integer.valueOf(0)
    val vNorm = math.sqrt(nv)
    var best = 0
    var bestScore = 0.0
    var found = false
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length == n && n > 0 && vNorm > 0.0 && cNorms(c) > 0.0) {
        var dot = 0.0
        i = 0
        while (i < n) { dot += arr(i) * cent(i); i += 1 }
        val s = dot / (vNorm * cNorms(c))
        if (!found || s > bestScore) { best = c; bestScore = s; found = true }
      }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def withNewChildInternal(newChild: Expression): BestCentroid =
    copy(child = newChild)
}

/** Column-level entry points. */
object hashFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def minhash_signature(c: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    column(MinHashSignature(expression(c), numHashes, seed))
  def word_shingles(c: Column, k: Int): Column =
    column(WordShingles(expression(c), k))
  def rolling_fingerprints(c: Column, ngram: Int = 8, window: Int = 4): Column =
    column(RollingFingerprints(expression(c), ngram, window))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def fnv1a64(c: Column): Column = column(Fnv1a64(expression(c)))
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a.cast("array<double>")),
      expression(b.cast("array<double>"))))
  def hyperplane_lsh_bucket(c: Column, numBits: Int = 16, seed: Long = 42L): Column =
    column(HyperplaneLshBucket(expression(c.cast("array<double>")), numBits, seed))
  def lang_id_guess(c: Column, markers: Seq[(String, Seq[String])]): Column =
    column(LangIdGuess(expression(c), markers))
  def best_centroid(c: Column, cents: Array[Array[Double]]): Column =
    column(BestCentroid(expression(c.cast("array<double>")),
      cents.map(_.toSeq).toSeq))

  /** Membership probe against a serialized `util.sketch.BloomFilter` built
    * over `xxhash64(value)` longs — Spark's own runtime-row-filter
    * expression (BloomFilterMightContain), so the probe stays inside
    * whole-stage codegen and deserializes the filter once per task. The
    * probe hash is XxHash64 seed 42, matching the `xxhash64()` function the
    * build side uses — both sides MUST hash identically. */
  def bloom_might_contain(bloomBytes: Array[Byte], value: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(bloomBytes, org.apache.spark.sql.types.BinaryType),
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(expression(value)), 42L)))

  /** [[bloom_might_contain]] with the filter shipped as a BROADCAST instead
    * of a plan literal: at the decontamination cap the serialized filter is
    * ~20 MB, and a literal that size rides in every task binary and explain
    * dump, while a broadcast ships once per executor through the block
    * manager (the broadcast-join path). Same probe semantics bit-for-bit.
    * The broadcast is memoized by filter CONTENT in a small LRU
    * ([[BloomBcCache]]): rebuilding the same benchmark's filter serializes
    * identically (the partial-filter OR-merge is order-independent), so
    * repeated batch decontaminations and every micro-batch of a stream
    * reuse ONE broadcast; evicted entries drop their strong reference and
    * Spark's ContextCleaner reclaims the executor blocks. */
  def bloom_might_contain_bc(
      spark: org.apache.spark.sql.SparkSession,
      bloomBytes: Array[Byte], value: Column): Column = {
    val (bc, digest) = BloomBcCache.getOrCreate(spark, bloomBytes)
    column(BloomMightContainBroadcast(bc, digest,
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(expression(value)), 42L)))
  }
}

/** Content-keyed LRU of bloom-filter broadcasts (see
  * [[hashFunctions.bloom_might_contain_bc]]). Bounded so distinct filters
  * cannot accumulate broadcasts for the driver's lifetime: beyond
  * [[BloomBcCache.MaxEntries]] the eldest entry is dropped, and entries
  * from previous applications are evicted on every access — either way the
  * broadcast becomes ContextCleaner-collectable once no running plan
  * references it. */
private[functions] object BloomBcCache {
  private val MaxEntries = 4
  /** Full-content MD5-prefix digest memoized per array IDENTITY (weak keys):
    * a streaming caller re-plans with the SAME array object every
    * micro-batch, so the O(bytes) hash runs once per distinct filter, not
    * per plan build. Content equality is still verified on every cache hit.
    * The digest also SHIPS inside [[BloomMightContainBroadcast]] as the
    * executor-side deserialized-filter memo key — a 64-bit content digest
    * cannot collide across restarted SparkContexts the way (broadcast id,
    * identityHashCode) could (broadcast ids restart from 0 per context). */
  private val digests = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Byte], java.lang.Long]())
  private def digestOf(bytes: Array[Byte]): Long = {
    val cached = digests.get(bytes)
    if (cached != null) cached.longValue
    else {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val fresh = java.nio.ByteBuffer.wrap(md).getLong
      digests.put(bytes, java.lang.Long.valueOf(fresh))
      fresh
    }
  }
  private type Key = (String, Int, Long) // (appId, byte length, content digest)
  private type Entry = (Array[Byte], org.apache.spark.broadcast.Broadcast[Array[Byte]])
  private val cache = new java.util.LinkedHashMap[Key, Entry](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, Entry]): Boolean =
      size() > MaxEntries
  }
  /** The (memoized) broadcast for these filter bytes plus their content
    * digest (the executor memo key). */
  def getOrCreate(spark: org.apache.spark.sql.SparkSession, bytes: Array[Byte])
      : (org.apache.spark.broadcast.Broadcast[Array[Byte]], Long) = cache.synchronized {
    val appId = spark.sparkContext.applicationId
    cache.entrySet().removeIf(_.getKey._1 != appId)
    val digest = digestOf(bytes)
    val key = (appId, bytes.length, digest)
    val cached = cache.get(key)
    if (cached != null && java.util.Arrays.equals(cached._1, bytes)) (cached._2, digest)
    else {
      val fresh = spark.sparkContext.broadcast(bytes)
      cache.put(key, (bytes, fresh))
      (fresh, digest)
    }
  }
}

/** Bloom membership probe over a broadcast filter (see
  * [[hashFunctions.bloom_might_contain_bc]]). The child is the pre-hashed
  * 64-bit value (XxHash64, matching what the filter's builder inserted);
  * the filter deserializes once per EXECUTOR per broadcast (companion memo)
  * — each task deserializes its own plan copy of this expression, so an
  * instance-local lazy val would re-read the ~20 MB bytes per task. */
case class BloomMightContainBroadcast(
    bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    contentDigest: Long,
    child: Expression)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain_bc"

  @transient private lazy val filter =
    BloomMightContainBroadcast.filterFor(bcast, contentDigest)

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}

object BloomMightContainBroadcast {
  /** Executor-side memo of deserialized filters, keyed by the filter's
    * CONTENT digest (computed once driver-side in [[BloomBcCache]] and
    * shipped in the expression). Content keying makes cross-SparkContext
    * collisions practically impossible — broadcast ids restart from 0 per
    * context and identity hashes are not unique, so an id-based key could
    * silently probe the WRONG filter in a long-lived JVM spanning restarts
    * (wrong decontamination pruning, no error). Equal-content broadcasts
    * share one deserialized filter. Cleared wholesale past a handful of
    * entries — live filter count is already bounded by the driver-side
    * [[BloomBcCache]] LRU. */
  private val filters = new java.util.concurrent.ConcurrentHashMap[
    Long, org.apache.spark.util.sketch.BloomFilter]()
  private[functions] def filterFor(
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]], digest: Long)
      : org.apache.spark.util.sketch.BloomFilter = {
    if (filters.size > 8) filters.clear()
    filters.computeIfAbsent(digest, _ =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bc.value)))
  }
}

/**
 * k-word shingles of a space-separated string: returns the array
 * ["w1 w2 .. wk", "w2 .. wk+1", ...] (empty when fewer than k words).
 * Semantics identical to the composed built-in form
 * `transform(sequence(...), i -> concat_ws(' ', element_at(words, i)...))`
 * but evaluated in one tight pass — the HOF form costs ~1 ms/doc interpreted,
 * which dominates dedup scans at corpus scale.
 */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // split(" ") with Java semantics matches Spark's split(text, " ") and
    // DuckDB's string_split: "" -> [""], consecutive separators -> empty words
    val words = text.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/**
 * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's algorithm, the
 * standard rolling-hash fingerprinting for near-copy detection): polynomial
 * rolling hash over every `ngram`-byte window of the UTF-8 text, then the
 * minimum hash of each `window`-sized span of consecutive window hashes
 * (rightmost minimum, deduplicated). Any shared substring of length >=
 * ngram + window - 1 bytes is guaranteed to share a fingerprint.
 */
case class RollingFingerprints(child: Expression, ngram: Int, window: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(ngram >= 2 && window >= 1, s"bad winnowing params ($ngram, $window)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fingerprints"

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - ngram + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling polynomial hashes of all ngram-byte windows
    var pow = 1L
    var i = 1
    while (i < ngram) { pow *= Base; i += 1 }
    val hs = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < ngram) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + ngram - 1) & 0xff)
      hs(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each `window` consecutive hashes
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last = -1
    var w = 0
    val spans = math.max(1, n - window + 1)
    while (w < spans) {
      var minIdx = w
      var j = w
      val end = math.min(n, w + window)
      while (j < end) {
        if ((hs(j) ^ Long.MinValue) <= (hs(minIdx) ^ Long.MinValue)) minIdx = j
        j += 1
      }
      if (minIdx != last) { out += hs(minIdx); last = minIdx }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprints =
    copy(child = newChild)
}
