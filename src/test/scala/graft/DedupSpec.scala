package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.VectorFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 2 planted near-dup pairs + unrelated docs
  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (2L, "completely different content about databases and query optimization engines"),
    (3L, "entirely unrelated text discussing volcanoes glaciers and tectonic plates"),
    (4L, "completely different content about databases and query optimization engines"),
    (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
  ).toDF("doc_id", "text")

  test("exactByContent groups identical texts") {
    val groups = Dedup.exactByContent(corpus, "doc_id", "text")
    assert(groups.count() == 5) // 6 docs, one exact-dup pair (2,4)
    val dup = groups.filter($"n_copies" === 2).select("keep_id").as[Long].head()
    assert(dup == 2L)
  }

  test("dropExactDuplicates keeps min-id survivor") {
    val out = Dedup.dropExactDuplicates(corpus, "doc_id", "text")
    assert(out.count() == 5)
    assert(!out.select("doc_id").as[Long].collect().contains(4L))
  }

  test("minhashLshPairs finds planted near-dups and skips unrelated") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleN = 2, k = 64, bands = 16, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccardPairs: exact all-pairs verification") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 2, threshold = 0.5)
    val m = pairs.select("a_id", "b_id", "jaccard").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(m((2L, 4L)) == 1.0)
    assert(m((0L, 1L)) > 0.8 && m((0L, 1L)) < 1.0)
  }

  test("ngramJaccardPairs plans hash joins, never a nested loop") {
    val plan = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 2, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(2000))
  }

  test("ngramJaccardPairs bucket blocking loses no pair vs unblocked all-pairs") {
    // docs spanning several length buckets, incl. ratio right at the 2× edge
    val docs = (0L until 24L).map { i =>
      val len = 3 + (i % 12).toInt * 2
      (i, Seq.tabulate(len)(j => s"w${j % (3 + i % 5)}").mkString(" "))
    }.toDF("doc_id", "text")
    // threshold BELOW 0.5 exercises the threshold-derived probe radius
    // (±2 buckets for 1/0.3 ≈ 3.33×) — the fixed 2× bound silently
    // dropped pairs with size ratio in (2, 3.33] here
    val blocked = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.3)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    // reference: TRUE all-pairs, no ratio bound, no bucketing
    val t = docs.select(col("doc_id").as("id"),
      graft.functions.TextFunctions.shingles(col("text"), 2).as("sh"))
    val a = t.select(col("id").as("a_id"), col("sh").as("a_sh"))
    val b = t.select(col("id").as("b_id"), col("sh").as("b_sh"))
    val ref = a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard", round(col("inter") /
        (size(col("a_sh")) + size(col("b_sh")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.3)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(blocked == ref)
    assert(blocked.nonEmpty)
  }

  test("incremental LSH pairs == full-corpus pairs restricted to the increment") {
    val docs = Tables.load(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val increment = docs.filter(col("doc_id") % 4 === 0)
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val incIds = increment.select("doc_id").as[Long].collect().toSet
    val expected = full.filter(p => incIds(p._1) || incIds(p._2))
    val got = Dedup.minhashLshPairsIncremental(corpus, increment,
      "doc_id", "text", shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    // sanity: the full set has corpus-corpus pairs the incremental path
    // must NOT produce (otherwise this test proves nothing)
    assert(full.exists(p => !incIds(p._1) && !incIds(p._2)))
    assert(expected.nonEmpty)
  }

  test("contaminated flags docs overlapping the test set, broadcast plan") {
    val test = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "he saw the quick brown fox jumps far away"), // 3 shared 3-grams
      (11L, "a quick brown cat sat on the mat"),           // 0 shared
      (12L, "completely unrelated text about spark plans entirely")) // 0
      .toDF("doc_id", "text")
    val out = Dedup.contaminated(corpus, test, "doc_id", "text",
      n = 3, minShared = 2)
    val got = out.as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(10L))
    assert(got(10L) == 3L) // "the quick brown","quick brown fox","brown fox jumps"
    // the test-shingle side must broadcast (corpus never shuffles its text)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("ngramDupStats: per-group share of globally duplicated n-grams") {
    // 2-grams, minDocs=2. Doc grams:
    //  a1: {x y, y z}   a2: {x y, y q}   b1: {x y, y z}   b2: {p q, q r}
    // global dup grams (>=2 docs): "x y" (3 docs), "y z" (2 docs)
    // group a distinct grams: {x y, y z, y q} -> 2/3 dup
    // group b distinct grams: {x y, y z, p q, q r} -> 2/4 dup
    val docs = Seq(
      (1L, "x y z", "a"), (2L, "x y q", "a"),
      (3L, "x y z", "b"), (4L, "p q r", "b")
    ).toDF("doc_id", "text", "src")
    val out = Dedup.ngramDupStats(docs, "doc_id", "text", "src", n = 2)
      .orderBy("src")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 3L, 2L, 0.6667), ("b", 4L, 2L, 0.5)))
  }

  test("ngramDupStats drops docs shorter than n tokens") {
    val docs = Seq((1L, "only two", "g"), (2L, "a b c d", "g"))
      .toDF("doc_id", "text", "src")
    // n=3: doc 1 yields nothing; doc 2 yields {a b c, b c d}, none dup
    val out = Dedup.ngramDupStats(docs, "doc_id", "text", "src", n = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("g", 2L, 0L, 0.0)))
  }

  test("sourceOverlap: hand-computed pair matrix, non-overlapping pair absent") {
    val docs = Seq(
      (0L, "a", "one two three four"),     // grams: {one two, two three, three four}
      (1L, "b", "two three four five"),    // {two three, three four, four five}
      (2L, "c", "nine ten eleven twelve"), // disjoint from a and b
      (3L, "a", "one two three four")      // duplicate doc: distinct per source
    ).toDF("doc_id", "src", "text")
    val out = Dedup.sourceOverlap(docs, "src", "text", n = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq.sorted
    // a∩b = {two three, three four} → 2 of (3 + 3 - 2) = 0.5; c pairs absent
    assert(out == Seq(("a", "b", 2L, 3L, 3L, 0.5)))
  }

  test("dedupFamilies: transitive chains collapse to one family, singletons stay") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 0-1, 1-2 (transitive family {0,1,2}), pair {4,5}, singletons 3,6
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("a_id", "b_id")
    val fam = Dedup.dedupFamilies(ids, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(fam == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("dedupFamilies: long path converges within iteration budget") {
    val n = 12L
    val ids = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val fam = Dedup.dedupFamilies(ids, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(fam.values.toSet == Set(0L)) // one family, rooted at min id
  }

  test("dedupFamilies releases the edge cache even when a round throws") {
    val ids = Seq(0L, 1L).toDF("doc_id")
    // assert_true(a_id < 0) detonates on first evaluation — the edge set's
    // first action is INSIDE the try, so the failure exercises the finally
    val pairs = Seq((0L, 1L)).toDF("a_id", "b_id")
      .select((col("a_id") + assert_true(col("a_id") < 0).cast("long"))
        .as("a_id"), col("b_id"))
    intercept[Exception] {
      Dedup.dedupFamilies(ids, pairs, "doc_id").count()
    }
    // the cache registration happens eagerly at .cache(); only the
    // blocking finally-unpersist can have emptied the registry here
    assert(spark.sharedState.cacheManager.isEmpty,
      "dedupFamilies leaked its edge cache after a mid-run failure")
  }

  test("leakageSafeSplit: families are split-atomic and both splits occur") {
    // many singleton families so both split labels appear, plus one chain
    val ids = (0L until 60L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Dedup.leakageSafeSplit(ids, pairs, "doc_id")
      .as[(Long, Long, String)].collect()
    val split = out.map(r => r._1 -> r._3).toMap
    // connected docs never straddle splits
    assert(split(0L) == split(1L) && split(1L) == split(2L))
    assert(split(10L) == split(11L))
    assert(out.map(_._3).toSet == Set("train", "test"))
    // deterministic under re-run
    val again = Dedup.leakageSafeSplit(ids, pairs, "doc_id")
      .as[(Long, Long, String)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("winnowingPairs finds the planted near-dups via shared fingerprints") {
    val pairs = Dedup.winnowingPairs(corpus, "doc_id", "text",
      shingleN = 2, window = 3, minShared = 1, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhashPairs: identical and near docs collide, distant do not") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", bands = 4, maxHamming = 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 4L))) // identical → hamming 0
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhashPairs crossEngineHash: md5 fingerprint matches an independent " +
      "reference and pairs equal the relational definition") {
    import graft.functions.{HashExpressions, TextFunctions}
    // plain-JVM reference of the SimHash64Md5 contract (bit 4d+k of the
    // fingerprint = bit k of hex digit d of md5(shingle)) — the same
    // derivation the DuckDB oracle replays via substr(md5(f), d+1, 1)
    def refShingles(text: String): Seq[String] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      else Seq(toks.mkString(" "))
    }
    def refSim(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      for (f <- refShingles(text)) {
        val dg = md.digest(f.getBytes("UTF-8"))
        for (d <- 0 until 16; k <- 0 until 4) {
          val byte = dg(d / 2) & 0xff
          val digit = if (d % 2 == 0) byte >> 4 else byte & 0xf
          if (((digit >> k) & 1) == 1) votes(4 * d + k) += 1
          else votes(4 * d + k) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val texts = corpus.as[(Long, String)].collect()
    val fps = corpus.select($"doc_id",
        HashExpressions.simhash64Md5(TextFunctions.shingles($"text", 3)).as("sim"))
      .as[(Long, Long)].collect().toMap
    for ((id, t) <- texts) assert(fps(id) == refSim(t), s"fingerprint of doc $id")
    // banding is pigeonhole-exact at maxHamming <= bands-1, so the operator
    // output must EQUAL the all-pairs definition
    val got = Dedup.simhashPairs(corpus, "doc_id", "text", crossEngineHash = true)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      h = java.lang.Long.bitCount(refSim(ta) ^ refSim(tb)) if h <= 7
      sa = refShingles(ta).toSet; sb = refShingles(tb).toSet
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.5
    } yield (a, b, h)).toSet
    assert(got == want)
    assert(want.contains((2L, 4L, 0))) // identical docs: hamming 0
  }

  test("embedding near-dup: brute force finds the planted pair") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.1f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.95, lshBits = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embedding near-dup LSH path: same pair, fewer comparisons") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.2f, 0.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.95, lshBits = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L))) // near-identical vectors share all hyperplane signs
  }

  test("embedding near-dup deterministic mode: LshBitsDet matches an " +
      "independent reference and finds the planted pair") {
    import graft.functions.HashExpressions
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.1f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.2f, 0.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    // plain-JVM reference of the LshBitsDet contract: Rademacher sign =
    // bit 0 of the FIRST hex digit of md5("lsh:<seed>:<j>:<i>"), exact
    // integer projection over floor(v_i * 1e6)
    def refSig(v: Array[Float], bits: Int, seed: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until bits).foldLeft(0L) { (acc, j) =>
        val proj = v.indices.map { i =>
          val dg = md.digest(s"lsh:$seed:$j:$i".getBytes("UTF-8"))
          val s = if ((((dg(0) & 0xff) >> 4) & 1) == 1) 1L else -1L
          s * math.floor(v(i).toDouble * 1000000.0).toLong
        }.sum
        if (proj >= 0) acc | (1L << j) else acc
      }
    }
    val sigs = vecs.select($"vec_id",
        HashExpressions.lshBitsDet($"embedding", 6, seed = 1001L).as("sig"))
      .as[(Long, Long)].collect().toMap
    val raw = vecs.as[(Long, Array[Float])].collect()
    for ((id, v) <- raw)
      assert(sigs(id) == refSig(v, 6, 1001L), s"signature of vec $id")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.95, lshBits = 4, deterministic = true)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ngramContainmentPairs: quote inside a longer doc scores c_max 1") {
    // doc 1 is QUOTED whole inside doc 2: Jaccard is small (2 shared of
    // 12 grams) but containment in the A-direction is exactly 1.0
    val quote = "alpha beta gamma delta epsilon zeta"
    val host = quote + " one two three four five six seven eight nine ten"
    val docs = Seq((1L, quote), (2L, host),
      (3L, "totally unrelated content with many different words here"))
      .toDF("id", "txt")
    val got = Dedup.ngramContainmentPairs(docs, "id", "txt",
      n = 5, threshold = 0.9, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.length == 1)
    val (a, b, shared, nA, _, cMax) = got.head
    assert((a, b) == (1L, 2L) && shared == nA && cMax == 1.0)
    // same pair is invisible to Jaccard at any usable threshold
    val j = Dedup.ngramJaccardPairs(docs, "id", "txt", n = 5, threshold = 0.5)
    assert(j.count() == 0)
  }

  test("ngramContainmentPairs: maxDf cap drops boilerplate grams") {
    // the same 5-gram in every doc is capped out at maxDf=2, so no
    // pair survives; raising the cap brings the pairs back
    val boiler = "common header line repeated verbatim"
    val docs = Seq((1L, boiler + " tail one"), (2L, boiler + " tail two"),
      (3L, boiler + " tail three")).toDF("id", "txt")
    val capped = Dedup.ngramContainmentPairs(docs, "id", "txt",
      n = 5, threshold = 0.3, maxDf = 2)
    assert(capped.count() == 0)
    val uncapped = Dedup.ngramContainmentPairs(docs, "id", "txt",
      n = 5, threshold = 0.3, maxDf = 50)
    assert(uncapped.count() == 3)
  }

  test("prefixFilterJaccardPairs == brute-force Jaccard (exactness lemma)") {
    // near-dup cluster + unrelated docs + a short doc (size-ratio edge)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"), // J=4/6 vs 1
      (3L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (4L, "one two three four five"),
      (5L, "one two three four six"), // J=4/6 vs 4
      (6L, "alpha beta"), // small vs 1: J=2/5
      (7L, "totally different words here now")
    ).toDF("doc_id", "text")
    def brute(theta: Double): Set[(Long, Long)] = {
      val t = docs.select(col("doc_id").as("id"),
        array_distinct(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
      t.select(col("id").as("a_id"), col("tk").as("a_tk"))
        .crossJoin(t.select(col("id").as("b_id"), col("tk").as("b_tk")))
        .filter(col("a_id") < col("b_id"))
        .withColumn("i", size(array_intersect(col("a_tk"), col("b_tk"))))
        .withColumn("j", col("i") /
          (size(col("a_tk")) + size(col("b_tk")) - col("i")))
        .filter(round(col("j"), 6) >= theta)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    }
    for (theta <- Seq(0.5, 0.66, 0.8, 1.0)) {
      val got = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", theta)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == brute(theta), s"theta=$theta")
    }
  }

  test("prefix filtering prunes by content: a universal token generates no candidates") {
    // every doc shares 'common'; the other 4 tokens are globally unique.
    // prefix length at theta=0.8 is 5 - 4 + 1 = 2 rarest tokens — the
    // universal token (df = n) sorts LAST and never enters a prefix, so
    // the candidate set is EMPTY while brute pairs would be C(40,2)
    val n = 40
    val docs = (0 until n).map { i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d common")
    }.toDF("doc_id", "text")
    val tokSets = docs.select(col("doc_id").as("id"),
      array_distinct(graft.functions.TextFunctions.tokens(col("text"))).as("toks"))
    assert(Dedup.prefixCandidates(tokSets, 0.8).count() == 0L)
    // sanity of the premise: at a LOW threshold the prefix lengthens to
    // include the hot token and candidates appear — the pruning is the
    // threshold-scaled prefix, not an accident of the fixture
    assert(Dedup.prefixCandidates(tokSets, 0.2).count() > 0L)
  }

  test("cosine matches hand computation") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    val d = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(math.abs(d) < 1e-12)
  }

  test("hammingPairs equals brute force when maxHamming <= bands-1 (pigeonhole)") {
    val rnd = new scala.util.Random(7)
    val hashes = (1L to 150L).map(id => (id, rnd.nextLong()))
    val df = hashes.toDF("id", "h")
    val got = Dedup.hammingPairs(df, "id", "h", bits = 64, bands = 8,
        maxHamming = 7)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d)).toSet
    assert(got == brute)
    // random 64-bit hashes are ~32 bits apart; make sure the planted
    // case actually exercises the pair path too
    val planted = (hashes :+ (999L, hashes.head._2 ^ 3L)).toDF("id", "h")
    val p = Dedup.hammingPairs(planted, "id", "h", bits = 64, bands = 8,
      maxHamming = 7).filter(col("b_id") === 999L).head()
    assert(p.getAs[Long]("a_id") == 1L && p.getAs[Int]("hamming") == 2)
  }

  test("hammingPairsMultiIndex equals brute force AND the single-chunk " +
      "banded join wherever both are exact") {
    val rnd = new scala.util.Random(11)
    val hashes = (1L to 150L).map(id => (id, rnd.nextLong())) ++
      Seq((991L, 0x0L), (992L, 0x3L), (993L, 0x8001L), // planted close pairs
        (994L, 0x8000000000000001L))
    val df = hashes.toDF("id", "h")
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "fixture must contain close pairs")
    val multi = Dedup.hammingPairsMultiIndex(df, "id", "h", bits = 64,
        blocks = 4, maxHamming = 2)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(multi == brute)
    val single = Dedup.hammingPairs(df, "id", "h", bits = 64, bands = 4,
        maxHamming = 2)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(multi == single)
  }

  test("hammingPairsMultiIndex: cross-block flips, the bucket cap, and " +
      "the blocks<=maxHamming guard") {
    // two flips in DIFFERENT blocks: caught because t=2 of 4 blocks
    // still agree (the case a naive 2-wide-band split would need
    // per-half recursion for)
    val base = 0x123456789abcdefL
    val flipped = base ^ (1L << 3) ^ (1L << 60) // blocks 0 and 3
    val df = Seq((1L, base), (2L, flipped)).toDF("id", "h")
    val got = Dedup.hammingPairsMultiIndex(df, "id", "h", bits = 64,
      blocks = 4, maxHamming = 2).select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 2)))
    // degenerate bucket cap drops all-identical hashes
    val degen = (1L to 50L).map((_, 42L)).toDF("id", "h")
    assert(Dedup.hammingPairsMultiIndex(degen, "id", "h", bits = 64,
      blocks = 4, maxHamming = 2, maxBucketSize = 10).count() == 0L)
    // pigeonhole precondition enforced loudly
    intercept[IllegalArgumentException] {
      Dedup.hammingPairsMultiIndex(df, "id", "h", bits = 64, blocks = 4,
        maxHamming = 4)
    }
  }

  test("hammingPairs: sub-64-bit hashes and the degenerate-bucket cap") {
    // 16-bit hashes, bands=4: exact for maxHamming<=3
    val hs = Seq((1L, 0x0f0fL), (2L, 0x0f0eL), (3L, 0xf0f0L), (4L, 0x0f1eL))
    val df = hs.toDF("id", "h")
    val got = Dedup.hammingPairs(df, "id", "h", bits = 16, bands = 4,
      maxHamming = 3).select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 4L, 2), (2L, 4L, 1)))
    // all-identical hashes with a tiny bucket cap → candidates dropped
    val degen = (1L to 50L).map((_, 42L)).toDF("id", "h")
    assert(Dedup.hammingPairs(degen, "id", "h", bits = 16, bands = 4,
      maxHamming = 3, maxBucketSize = 10).count() == 0L)
  }
}
