package graft

import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------- range join ----------

  test("pointInInterval equals the brute-force inequality join") {
    val points = (0L until 50L).map(i => (i, (i * 7) % 101 - 20))
      .toDF("p_id", "v")
    val intervals = (0L until 12L).map { i =>
      val lo = i * 9 - 25
      (i, lo, lo + (i % 4) * 6) // i % 4 == 0 → empty interval
    }.toDF("i_id", "lo", "hi")
    val got = graft.ext.RangeJoin.pointInInterval(
        points, intervals, "v", "lo", "hi", binWidth = 8)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("pointInInterval boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq((1L, 8L), (2L, 16L), (3L, 15L)).toDF("p_id", "v")
    val intervals = Seq((10L, 8L, 16L)).toDF("i_id", "lo", "hi")
    val got = graft.ext.RangeJoin.pointInInterval(
        points, intervals, "v", "lo", "hi", binWidth = 8)
      .select("p_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L)) // 8 in, 16 out, 15 in
  }

  test("pointInInterval fails loudly on an interval past the cell cap " +
    "instead of exploding billions of rows") {
    val points = Seq((1L, 8L)).toDF("p_id", "v")
    // the open-ended sentinel encoding: hi = Long.MaxValue at binWidth 1
    // would sequence ~9.2e18 cells from ONE row
    val sentinel = Seq((10L, 0L, Long.MaxValue)).toDF("i_id", "lo", "hi")
    val e = intercept[Exception] {
      graft.ext.RangeJoin.pointInInterval(
        points, sentinel, "v", "lo", "hi", binWidth = 1).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("grid cells"),
      s"wrong failure: ${e.getMessage}")
    // a sane span at the same binWidth still works
    val ok = Seq((10L, 0L, 100L)).toDF("i_id", "lo", "hi")
    assert(graft.ext.RangeJoin.pointInInterval(
      points, ok, "v", "lo", "hi", binWidth = 1).count() == 1)
  }

  test("pointInInterval honors equality keys") {
    val points = Seq(("a", 5L, 1L), ("b", 5L, 2L)).toDF("grp", "v", "p_id")
    val intervals = Seq(("a", 0L, 10L, 7L)).toDF("grp", "lo", "hi", "i_id")
    val got = graft.ext.RangeJoin.pointInInterval(
        points, intervals, "v", "lo", "hi", binWidth = 4, keys = Seq("grp"))
      .select("p_id").as[Long].collect().toSeq
    assert(got == Seq(1L)) // group b has no interval
  }

  test("pointInInterval is exact past 2^53 (epoch-nano keys)") {
    // doubles are 128 apart at 1e18: both base-1 and base-10 round to
    // base, so the old floor(x / w) double division collapsed the cells
    val base = 1000000000000000000L
    val points = Seq((1L, base - 1L), (2L, base), (3L, base - 11L))
      .toDF("p_id", "v")
    val intervals = Seq((10L, base - 10L, base)).toDF("i_id", "lo", "hi")
    val got = graft.ext.RangeJoin.pointInInterval(
        points, intervals, "v", "lo", "hi", binWidth = 10)
      .select("p_id").as[Long].collect().toSet
    assert(got == Set(1L)) // base-1 in [base-10, base); base out; base-11 out
  }

  test("range joins reject mixed exact/floating key types loudly") {
    // a long point column against double interval bounds computes grid
    // cells in different arithmetic — silently lossy past 2^53, so the
    // pairing must refuse up front
    val pts = Seq((1L, 5L)).toDF("p_id", "v")
    val ivals = Seq((1L, 0.0, 10.0)).toDF("i_id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      graft.ext.RangeJoin.pointInInterval(pts, ivals, "v", "lo", "hi", 4)
    }
    assert(e.getMessage.contains("cast one side"))
  }

  test("intervalOverlap is exact past 2^53") {
    val base = 1000000000000000000L
    val left = Seq((1L, base - 20L, base - 5L)).toDF("a_id", "a_lo", "a_hi")
    val right = Seq((2L, base - 10L, base)).toDF("b_id", "b_lo", "b_hi")
    val got = graft.ext.RangeJoin.intervalOverlap(left, right,
        "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("intervalOverlap equals brute force with no duplicate pairs") {
    val left = (0L until 16L).map { i =>
      val lo = i * 5 - 20
      (i, lo, lo + (i % 5) * 4)
    }.toDF("a_id", "a_lo", "a_hi")
    val right = (0L until 14L).map { j =>
      val lo = j * 7 - 30
      (j, lo, lo + (j % 3) * 9)
    }.toDF("b_id", "b_lo", "b_hi")
    val gotRows = graft.ext.RangeJoin.intervalOverlap(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(gotRows.size == gotRows.toSet.size) // canonical-cell dedup works
    val want = left.filter(col("a_hi") > col("a_lo")).crossJoin(
        right.filter(col("b_hi") > col("b_lo")))
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(gotRows.toSet == want)
    assert(want.nonEmpty)
  }

  // ---------- column profile ----------

  test("profile summarizes counts, distincts, min/max, string lengths") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "x", 1.5), (2L, null, 2.5), (2L, "yyy", null))
      .toDF("id", "s", "v")
    val out = graft.ext.Profile.summarize(df, Seq("id", "s", "v"))
      .orderBy("column").collect()
    val id = out(0); val s = out(1); val v = out(2)
    assert(id.getAs[String]("column") == "id")
    assert(id.getAs[Long]("n_rows") == 3 && id.getAs[Long]("n_nonnull") == 3)
    assert(id.getAs[Long]("n_distinct") == 2)
    assert(id.getAs[Double]("min_num") == 1.0 &&
      id.getAs[Double]("max_num") == 2.0)
    assert(id.isNullAt(id.fieldIndex("min_str")))
    assert(s.getAs[Long]("n_nonnull") == 2 && s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[String]("min_str") == "x" &&
      s.getAs[String]("max_str") == "yyy")
    assert(s.getAs[Double]("avg_len") == 2.0)
    assert(s.isNullAt(s.fieldIndex("min_num")))
    assert(v.getAs[Long]("n_nonnull") == 2)
    assert(v.getAs[Double]("min_num") == 1.5 &&
      v.getAs[Double]("max_num") == 2.5)
  }

  test("profile approx mode keeps one row per column, no Expand") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = graft.ext.Profile.summarize(df, Seq("id", "s"),
      exactDistinct = false)
    assert(out.count() == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
  }

  // ---------- URL hygiene ----------

  test("normalizeUrl canonicalizes case, ports, params, fragments") {
    val urls = Seq(
      "HTTPS://WWW.News.Example.co.uk:443/Path/Sub/?utm_campaign=x&z=9&a=1#top",
      "http://example.com:8080/",
      "https://Example.COM/a?fbclid=123",
      "http://example.com:80/p").toDF("u")
    val got = urls.select(graft.ext.Web.normalizeUrl(col("u")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "https://news.example.co.uk/Path/Sub?a=1&z=9",
      "http://example.com:8080",
      "https://example.com/a",
      "http://example.com/p"))
  }

  test("normalizeUrl passes scheme-less inputs through unchanged") {
    // without scheme://host the authority regexes extract nothing and the
    // old rewrite degenerated to "://" + input
    val raw = Seq("example.com/path?a=1", "//cdn.example.com/x", "localhost")
    val got = raw.toDF("u")
      .select(graft.ext.Web.normalizeUrl(col("u")).as("n"))
      .as[String].collect().toSeq
    assert(got == raw)
  }

  test("registeredDomain: PSL two-level suffixes, bare hosts, ports") {
    val got = Seq(
      "https://www.news.example.co.uk/x",
      "example.com",
      "a.b.c.example.com:9090",
      "localhost").toDF("u")
      .select(graft.ext.Web.registeredDomain(col("u")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.co.uk", "example.com", "example.com",
      "localhost"))
  }

  test("registeredDomain: scheme-less paths, protocol-relative, userinfo") {
    val got = Seq(
      "example.com/page",                 // path must not ride into labels
      "example.com?q=1",
      "//cdn.example.com/asset.js",       // protocol-relative ref
      "http://trusted.com@evil.com/x",    // userinfo spoof → evil.com
      "user@example.com").toDF("u")
      .select(graft.ext.Web.registeredDomain(col("u")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "example.com", "example.com",
      "evil.com", "example.com"))
  }

  test("stripHtml removes script/style/comments/tags, decodes entities") {
    val html = "<html><head><script>var a = '</p>' + 1;</script>" +
      "<style>p { x: '<'; }</style></head><body>\n" +
      "<h1 class=\"t\">Title</h1><p>one &amp;&nbsp;two &lt;3&gt;</p>" +
      "<!-- secret --><br/>tail &amp;lt;</body></html>"
    val got = Seq(html).toDF("h")
      .select(graft.ext.Web.stripHtml(col("h")).as("t"))
      .as[String].collect().head
    // &amp; decodes last: "&amp;lt;" → "&lt;", never "<"
    assert(got == "Title one & two <3> tail &lt;")
  }

  test("filterBlockedDomains drops blocklisted registrable domains") {
    val docs = Seq(
      (1L, "https://www.spam.com/buy"),
      (2L, "https://news.example.org/a"),
      (3L, "http://sub.spam.com/x")).toDF("id", "url")
    val block = Seq("Spam.com").toDF("domain")
    val kept = graft.ext.Web.filterBlockedDomains(docs, "url", block,
      "domain").select("id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  // ---------- per-group cap ----------

  test("capPerGroup keeps exactly n deterministic rows per group") {
    val df = (0L until 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val a = graft.ext.Sampling.capPerGroup(df, "grp", "id", n = 5, seed = 1)
      .select("id").as[Long].collect().toSet
    val b = graft.ext.Sampling.capPerGroup(df, "grp", "id", n = 5, seed = 1)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 15) // 3 groups × 5, stable across runs
    // different seed → (almost surely) different selection, same size
    val c = graft.ext.Sampling.capPerGroup(df, "grp", "id", n = 5, seed = 2)
      .select("id").as[Long].collect().toSet
    assert(c.size == 15 && c != a)
    // groups under the cap pass through whole
    val small = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(graft.ext.Sampling.capPerGroup(small, "grp", "id", 5)
      .count() == 2)
  }

  // ---------- SCD2 ----------

  test("scd2 build tiles each key's timeline with half-open windows") {
    val chg = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "silver"), (1L, 35L, "gold"),
      (2L, 15L, "bronze")).toDF("cust", "ts", "tier")
    val dim = graft.ops.Scd2.build(chg, "cust", "ts")
      .orderBy("cust", "effective_from")
      .select("cust", "effective_from", "effective_to", "tier", "is_current")
      .collect()
    assert(dim.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3),
      r.getBoolean(4))).toSeq == Seq(
      (1L, 10L, 20L, "bronze", false),
      (1L, 20L, 35L, "silver", false),
      (1L, 35L, -1L, "gold", true),
      (2L, 15L, -1L, "bronze", true)))
  }

  test("scd2 lookup resolves facts to the version in force") {
    val dim = graft.ops.Scd2.build(Seq(
      (1L, 10L, "bronze"), (1L, 20L, "silver")).toDF("cust", "ts", "tier"),
      "cust", "ts")
    val facts = Seq(
      (100L, 1L, 5L),   // before first version → null tier
      (101L, 1L, 10L),  // exactly at from → bronze
      (102L, 1L, 19L),  // last instant of bronze
      (103L, 1L, 20L),  // switch instant → silver (from inclusive)
      (104L, 1L, 99L),  // open-ended current
      (105L, 7L, 50L))  // unknown key → null
      .toDF("fact_id", "cust", "fts")
    val got = graft.ops.Scd2.lookup(facts, dim, "cust", "fts")
      .orderBy("fact_id")
      .select("fact_id", "dim_tier").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "-" else r.getString(1)))
    assert(got.toSeq == Seq((100L, "-"), (101L, "bronze"), (102L, "bronze"),
      (103L, "silver"), (104L, "silver"), (105L, "-")))
  }

  // ---------- BPE ----------

  test("bpe train learns frequency-ordered merges deterministically") {
    val docs = Seq("aaab aaab", "aaab aab aab").toDF("text")
    val merges = graft.ext.Bpe.train(docs, "text", numMerges = 3)
    // pair counts round 1: (a,a)=8, (a,b)=5 → merge (a,a)
    // round 2: (aa,a)=3, (a,b)=3 tie → lexicographically smaller (a,b)
    // round 3: (aa,ab)=3 beats (aa,b)=2
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("bpe encode applies merges greedily by rank; unseen chars pass") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = Seq("aaab", "aab", "ba", "xyz", "AAab  ba")
      .toDF("t")
      .select(graft.ext.Bpe.encode(col("t"), merges).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("aaab"))
    assert(got(1) == Seq("aa", "b"))
    assert(got(2) == Seq("b", "a"))
    assert(got(3) == Seq("x", "y", "z"))
    // lowercased, whitespace-split: "aaab" + "ba"
    assert(got(4) == Seq("aaab", "b", "a"))
  }

  test("bpe treats non-BMP code points as whole symbols") {
    // per-UTF-16-char seeding would split the 😀 surrogate pair into two
    // lone surrogates and emit malformed UTF-8 tokens
    val docs = Seq("😀😀 😀😀").toDF("text")
    val merges = graft.ext.Bpe.train(docs, "text", numMerges = 1)
    assert(merges == Seq(("😀", "😀")))
    val got = Seq("😀😀a").toDF("text")
      .select(graft.ext.Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].collect().head
    assert(got == Seq("😀😀", "a"))
  }

  test("bpe incremental trainer ≡ the naive full-recount reference " +
    "(selection order and merge application bit-for-bit)") {
    // the reference algorithm the incremental heap version replaced:
    // full pair recount + full word rescan per round
    def naive(freq: Seq[(String, Long)], numMerges: Int)
        : Seq[(String, String)] = {
      val words = freq.map { case (w, n) =>
        (graft.functions.BpeEncode.codePointSymbols(w), n)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var round = 0
      while (round < numMerges) {
        val pc = scala.collection.mutable.HashMap
          .empty[(String, String), Long]
        words.foreach { case (syms, n) =>
          var i = 0
          while (i < syms.length - 1) {
            pc.update((syms(i), syms(i + 1)),
              pc.getOrElse((syms(i), syms(i + 1)), 0L) + n)
            i += 1
          }
        }
        if (pc.isEmpty) round = numMerges
        else {
          val (best, _) = pc.maxBy { case ((a, b), n) => (n, a, b) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))
          out += best
          words.foreach { case (syms, _) =>
            var j = 0
            while (j < syms.length - 1) {
              if (syms(j) == best._1 && syms(j + 1) == best._2) {
                syms(j) = best._1 + best._2
                syms.remove(j + 1)
              } else j += 1
            }
          }
          round += 1
        }
      }
      out.toSeq
    }
    // several corpora with ties, overlapping runs, multi-word reuse
    val corpora = Seq(
      Seq("aaab aaab", "aaab aab aab"),
      Seq("abab abab baba", "aabb bbaa abab"),
      Seq("the cat sat on the mat", "the cat", "mat mat mat"),
      Seq("xxxxxx", "xxx xx x", "yxy xyx yyx"))
    corpora.foreach { corpus =>
      val docs = corpus.toDF("text")
      val got = graft.ext.Bpe.train(docs, "text", numMerges = 12)
      val words = docs
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").count()
        .orderBy(col("count").desc, col("w"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == naive(words, 12), s"diverged on $corpus")
    }
  }

  test("bpe train caps the word table but still merges head pairs") {
    val docs = (0 until 200).map(i => s"zz$i common common").toDF("text")
    val merges = graft.ext.Bpe.train(docs, "text", numMerges = 1,
      maxWords = 50)
    assert(merges.nonEmpty) // "common" dominates the capped table
  }

  // ---------- fuzzy matching join ----------

  test("fuzzyMatch finds every pair within maxDist and nothing beyond") {
    val watch = Seq((1L, "jonathan smith"), (2L, "acme corp"))
      .toDF("w_id", "w_name")
    val corpus = Seq(
      (10L, "Jonathan Smith"),   // dist 0 (case-insensitive)
      (11L, "jonathan smyth"),   // dist 1
      (12L, "jonathen smythe"),  // dist 3: out at maxDist 2
      (13L, "acme corp."),       // dist 1
      (14L, "acme inc"))         // dist 4: out
      .toDF("c_id", "c_name")
    val out = graft.ext.FuzzyJoin.fuzzyMatch(watch, corpus,
        "w_id", "w_name", "c_id", "c_name", maxDist = 2)
      .select("w_id", "c_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((1L, 10L, 0L), (1L, 11L, 1L), (2L, 13L, 1L)))
  }

  test("fuzzyMatch equals brute force on a low-entropy shared-prefix corpus") {
    // every name shares "Customer#0000" — naive gram blocking would match
    // everything to everything; rare-gram prefix filtering must still
    // return EXACTLY the brute-force answer
    val corpus = (0L until 200L).map(i => (i, f"Customer#${i}%09d"))
      .toDF("c_id", "c_name")
    val watch = (0L until 200L by 41L)
      .map(i => (i + 9000L, f"Customer#${i}%09d".patch(12, "", 1)))
      .toDF("w_id", "w_name")
    val got = graft.ext.FuzzyJoin.fuzzyMatch(watch, corpus,
        "w_id", "w_name", "c_id", "c_name", maxDist = 1)
      .select("w_id", "c_id").as[(Long, Long)].collect().toSet
    val brute = (for {
      (wid, wn) <- (0L until 200L by 41L)
        .map(i => (i + 9000L, f"Customer#${i}%09d".patch(12, "", 1)))
      (cid, cn) <- (0L until 200L).map(i => (i, f"Customer#${i}%09d"))
      if levenshteinDist(wn.toLowerCase, cn.toLowerCase) <= 1
    } yield (wid, cid)).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("fuzzyMatch handles names shorter than the gram size and nulls") {
    val watch = Seq((1L, "ab"), (2L, null.asInstanceOf[String]))
      .toDF("w_id", "w_name")
    val corpus = Seq((10L, "ab"), (11L, "ax"), (12L, "abcdef"))
      .toDF("c_id", "c_name")
    val out = graft.ext.FuzzyJoin.fuzzyMatch(watch, corpus,
        "w_id", "w_name", "c_id", "c_name", maxDist = 1)
      .select("w_id", "c_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    // "ab"→"ab" dist 0; "ab"→"ax" dist 1; null watch row matches nothing
    assert(out == Set((1L, 10L, 0L), (1L, 11L, 1L)))
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---------- funnel / retention ----------

  test("funnel counts stage survivors in strict order") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1 completes the whole funnel in order
      (1L, ts(0), "signup"), (1L, ts(1), "view"), (1L, ts(2), "click"),
      (1L, ts(3), "purchase"),
      // user 2: view BEFORE signup (must not count), clicks after
      (2L, ts(5), "view"), (2L, ts(6), "signup"), (2L, ts(7), "click"),
      // user 3: signup only
      (3L, ts(0), "signup"),
      // user 4: never signs up — excluded from every stage
      (4L, ts(0), "view"), (4L, ts(1), "click"), (4L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.ext.Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .collect()
    val byStage = out.map(r => r.getAs[String]("stage") ->
      r.getAs[Long]("n_users")).toMap
    assert(byStage == Map("signup" -> 3L, "view" -> 1L, "click" -> 1L,
      "purchase" -> 1L))
    val pcts = out.sortBy(_.getAs[Long]("stage_idx"))
      .map(_.getAs[Double]("pct_of_first")).toSeq
    assert(pcts == Seq(1.0, 0.333333, 0.333333, 0.333333))
  }

  test("funnel with an equal-timestamp stage pair requires strict progress") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // view at the exact signup instant does NOT advance the funnel
    val events = Seq((1L, ts(0), "signup"), (1L, ts(0), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.ext.Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "view")).collect()
    val byStage = out.map(r => r.getAs[String]("stage") ->
      r.getAs[Long]("n_users")).toMap
    assert(byStage == Map("signup" -> 1L, "view" -> 0L))
  }

  test("retention buckets users by first day with exact rates") {
    def ts(d: Int, h: Int = 9) =
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")
    val events = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(4)),   // cohort d1, back d2 d4
      (2L, ts(1)), (2L, ts(1, 23)),            // cohort d1, only d1 (2 events)
      (3L, ts(2)), (3L, ts(4)))                // cohort d2, back d4
      .toDF("user_id", "ts")
    val out = graft.ext.Funnel.retention(events, "user_id", "ts",
        maxOffset = 14)
      .orderBy("cohort_day", "day_offset")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect().toSeq
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-03-$i%02d")
    assert(out == Seq(
      (d(1), 0L, 2L, 2L, 1.0),    // both cohort-d1 users active day 0
      (d(1), 1L, 1L, 2L, 0.5),    // user 1 back on day 2
      (d(1), 3L, 1L, 2L, 0.5),    // user 1 back on day 4
      (d(2), 0L, 1L, 1L, 1.0),
      (d(2), 2L, 1L, 1L, 1.0)))   // user 3 back on day 4
  }

  test("Scd2.build drops null-ts changes instead of minting an " +
    "unreachable oldest version") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val chg = Seq((1L, Option(ts(0)), "a"), (1L, Option.empty[java.sql.Timestamp], "junk"),
      (2L, Option.empty[java.sql.Timestamp], "only-junk"))
      .toDF("k", "ts", "v")
    val dim = graft.ops.Scd2.build(chg, "k", "ts").collect()
    // key 1 keeps ONLY its real change (current); key 2 vanishes — a
    // null-ts change evidences no point in time, and before the filter
    // it became an is_current version lookup could never match
    assert(dim.length == 1)
    assert(dim.head.getAs[Long]("k") == 1L &&
      dim.head.getAs[String]("v") == "a" &&
      dim.head.getAs[Boolean]("is_current"))
  }

  test("funnel and retention exclude NULL users (a null key is not a user)") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (Option(1L), ts(0), "signup"), (Option(1L), ts(1), "view"),
      // a null-user signup: without the filter it counts into stage 0
      // (inflating the denominator) but can never convert
      (Option.empty[Long], ts(0), "signup"),
      (Option.empty[Long], ts(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val f = graft.ext.Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "view")).collect()
    val byStage = f.map(r => r.getAs[String]("stage") ->
      r.getAs[Long]("n_users")).toMap
    assert(byStage == Map("signup" -> 1L, "view" -> 1L))
    assert(f.forall(_.getAs[Double]("pct_of_first") == 1.0))
    val r = graft.ext.Funnel.retention(events, "user_id", "ts", 14)
      .collect()
    // one real user, one cohort row at offset 0, denominator 1 (the null
    // user must not inflate n_cohort)
    assert(r.length == 1 && r.head.getAs[Long]("n_cohort") == 1L &&
      r.head.getAs[Double]("retention") == 1.0)
  }

  test("GapFill.daily: null-key observations survive the spine join " +
    "(null-safe key equality)") {
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-03-$i%02d")
    val df = Seq(
      (Option("a"), d(1), 5L), (Option("a"), d(3), 7L),
      // a null-key group: its own span creates spine rows, so its
      // observations must match back instead of zero-filling
      (Option.empty[String], d(1), 9L), (Option.empty[String], d(2), 11L))
      .toDF("k", "day", "n")
    val out = graft.ext.GapFill.daily(df, "k", "day", fillZero = Seq("n"))
      .orderBy(col("k").asc_nulls_first, col("day")).collect()
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.map(r => (r.getDate(1).toString, r.getLong(2),
      r.getBoolean(3))).toSeq == Seq(
      ("2024-03-01", 9L, false), ("2024-03-02", 11L, false)))
    val aRows = out.filterNot(_.isNullAt(0))
    assert(aRows.map(r => (r.getDate(1).toString, r.getLong(2),
      r.getBoolean(3))).toSeq == Seq(
      ("2024-03-01", 5L, false), ("2024-03-02", 0L, true),
      ("2024-03-03", 7L, false)))
  }

  test("GapFill.daily: column names containing dots resolve (handle-based " +
    "projection, no string-path interpolation)") {
    val d = (i: Int) => java.sql.Date.valueOf(f"2024-03-$i%02d")
    val df = Seq(("a", d(1), 5L, 2L), ("a", d(3), 7L, 3L))
      .toDF("the.key", "obs.day", "metric.n", "metric.z")
    val out = graft.ext.GapFill.daily(df, "the.key", "obs.day",
        fillZero = Seq("metric.z"), fillForward = Seq("metric.n"))
      .orderBy(col("`obs.day`")).collect()
    assert(out.map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3),
      r.getBoolean(4))).toSeq == Seq(
      ("2024-03-01", 5L, 2L, false), ("2024-03-02", 5L, 0L, true),
      ("2024-03-03", 7L, 3L, false)))
  }

  test("IncrementalAgg: merged partition states equal the full recompute") {
    import graft.ops.IncrementalAgg._
    val full = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val parts = Seq(0, 1, 2).map(i => full.filter(col("event_id") % 3 === i))
    val keys = Seq("event_type")
    val merged = finalizeState(
      mergeStates(parts.map(aggState(_, keys, "value")), keys), keys)
      .orderBy("event_type").collect().toSeq
    val direct = finalizeState(aggState(full, keys, "value"), keys)
      .orderBy("event_type").collect().toSeq
    assert(merged == direct) // bit-exact, decimal state algebra
    // merge is associative: ((a ⊕ b) ⊕ c) == (a ⊕ (b ⊕ c))
    val s = parts.map(aggState(_, keys, "value"))
    val left = finalizeState(
      mergeStates(Seq(mergeStates(Seq(s(0), s(1)), keys), s(2)), keys), keys)
      .orderBy("event_type").collect().toSeq
    val right = finalizeState(
      mergeStates(Seq(s(0), mergeStates(Seq(s(1), s(2)), keys)), keys), keys)
      .orderBy("event_type").collect().toSeq
    assert(left == right && left == direct)
  }

  test("IncrementalAgg: aggState keeps the caller's decimal SCALE — a " +
      "scale-4 rate sum is not rounded to cents") {
    import graft.ops.IncrementalAgg._
    import org.apache.spark.sql.types.DecimalType
    val rates = Seq(("eur", 1.0843), ("eur", 0.9121), ("usd", 1.0001))
      .toDF("ccy", "rate")
    val st = aggState(rates, Seq("ccy"), "rate", DecimalType(18, 4))
    assert(st.schema("sum_v").dataType == DecimalType(38, 4))
    val eur = st.filter(col("ccy") === "eur")
      .select(col("sum_v").cast("string")).head().getString(0)
    assert(eur == "1.9964") // 38,2 realignment would have made it 2.00
  }

  test("IncrementalAgg: distinct state retracts through a change feed") {
    import graft.ops.IncrementalAgg._
    val keys = Seq("g")
    // base: g=A carries users 1 (twice), 2; g=B carries users 2, 3
    val base = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("g", "u")
    val state0 = distinctState(base, keys, "u")
    // feed: delete ONE copy of (A,1) — distinct must NOT drop (m 2→1);
    // delete (A,2) — last carrier, distinct drops; insert (B,9);
    // update moves (B,3) to (A,3): preimage retraction + postimage insert
    val cdf = Seq(
      ("delete", "A", 1L), ("delete", "A", 2L), ("insert", "B", 9L),
      ("update_preimage", "B", 3L), ("update_postimage", "A", 3L))
      .toDF("_change_type", "g", "u")
    val got = finalizeDistinct(
      applyChangeFeedDistinct(state0, cdf, keys, "u"), keys)
      .orderBy("g").as[(String, Long)].collect().toSeq
    // final rows: A:{1,3}, B:{2,9}
    assert(got == Seq(("A", 2L), ("B", 2L)))
    // maintained state ≡ recomputed state from the final rows, exactly
    val finalRows = Seq(("A", 1L), ("A", 3L), ("B", 2L), ("B", 9L))
      .toDF("g", "u")
    val maintained = applyChangeFeedDistinct(state0, cdf, keys, "u")
      .orderBy("g", "u").collect().toSeq
    val recomputed = distinctState(finalRows, keys, "u")
      .orderBy("g", "u").collect().toSeq
    assert(maintained == recomputed)
  }

  test("IncrementalAgg: HLL sketch states merge to the union estimate") {
    import graft.ops.IncrementalAgg._
    val keys = Seq("g")
    val full = spark.range(20000).select(
      (col("id") % 2).cast("string").as("g"),
      // overlapping value domains across the two halves: distinct ≈ 10k/group
      (col("id") % 10000).as("u"))
    val parts = Seq(0, 1, 2).map(i => full.filter(col("id") % 3 === i))
    val merged = finalizeHll(
      mergeHllStates(parts.map(hllState(_, keys, "u")), keys), keys)
      .orderBy("g").as[(String, Long)].collect().toSeq
    val exact = full.groupBy("g").agg(countDistinct(col("u")).as("n"))
      .orderBy("g").as[(String, Long)].collect().toMap
    assert(merged.size == 2)
    merged.foreach { case (g, est) =>
      val ex = exact(g).toDouble
      assert(math.abs(est - ex) / ex < 0.05,
        s"group $g: estimate $est vs exact $ex")
    }
    // merge order invariance: ((a ⊕ b) ⊕ c) == (a ⊕ (b ⊕ c)) estimates
    val s = parts.map(hllState(_, keys, "u"))
    val left = finalizeHll(mergeHllStates(
      Seq(mergeHllStates(Seq(s(0), s(1)), keys), s(2)), keys), keys)
      .orderBy("g").collect().toSeq
    val right = finalizeHll(mergeHllStates(
      Seq(s(0), mergeHllStates(Seq(s(1), s(2)), keys)), keys), keys)
      .orderBy("g").collect().toSeq
    assert(left == right)
  }

  test("IncrementalAgg: KLL quantile states merge within rank-error bound") {
    import graft.ops.IncrementalAgg._
    val keys = Seq("g")
    // two groups with different, known distributions over 30k values
    val full = spark.range(30000).select(
      (col("id") % 2).cast("string").as("g"),
      (col("id") % 10007).cast("double").as("v"))
    val parts = Seq(0, 1, 2).map(i => full.filter(col("id") % 3 === i))
    val merged = finalizeQuantiles(
      mergeQuantileStates(parts.map(quantileState(_, keys, "v")), keys),
      keys, Seq(0.5, 0.95))
      .orderBy("g").collect()
    val exact = full.groupBy("g").agg(
        expr("percentile(v, array(0.5D, 0.95D))").as("qs"))
      .orderBy("g").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(merged.length == 2)
    merged.foreach { r =>
      val ex = exact(r.getString(0))
      // KLL k=200: ~1.65% normalized rank error; values are ranks/10007
      // here, so value error tracks rank error — allow 3%
      assert(math.abs(r.getDouble(1) - ex(0)) / 10007.0 < 0.03,
        s"p50: ${r.getDouble(1)} vs ${ex(0)}")
      assert(math.abs(r.getDouble(2) - ex(1)) / 10007.0 < 0.03,
        s"p95: ${r.getDouble(2)} vs ${ex(1)}")
    }
    // single-pass state equals the merged partition states' accuracy too
    val direct = finalizeQuantiles(quantileState(full, keys, "v"), keys,
      Seq(0.5, 0.95)).orderBy("g").collect()
    direct.foreach { r =>
      val ex = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - ex(0)) / 10007.0 < 0.03)
    }
  }

  test("IncrementalAgg: empty delta is the merge identity") {
    import graft.ops.IncrementalAgg._
    val full = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
    val keys = Seq("event_type")
    val state = aggState(full, keys, "value")
    val empty = aggState(full.filter(lit(false)), keys, "value")
    val merged = finalizeState(mergeStates(Seq(state, empty), keys), keys)
      .orderBy("event_type").collect().toSeq
    val direct = finalizeState(state, keys)
      .orderBy("event_type").collect().toSeq
    assert(merged == direct)
  }
}
