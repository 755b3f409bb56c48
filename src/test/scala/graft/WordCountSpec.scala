package graft

import graft.operators.WordCount

/** Unit + property tests for the core word-count pipeline — the test
  * vectors in `cleaning semantics` are the empirically-verified table
  * from SURVEY.md §2 row 4 (reference `sendFileByFile.cpp:89-97`).
  * Property tests use seeded generators (no external generator dep).
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: String*): Map[String, Long] =
    WordCount.wordCount(texts.toDF("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("cleaning semantics: longest allowed prefix, then lowercase") {
    assert(run("Hello,") == Map("hello" -> 1L))          // trailing punct cut
    assert(run("co-op") == Map("co" -> 1L))              // cut at '-'
    assert(run("123abc") == Map.empty)                   // leading digit -> empty
    assert(run("[bracket]") == Map("[bracket]" -> 1L))   // ASCII 91-93 allowed
    assert(run("don't") == Map("don't" -> 1L))           // apostrophe allowed
    assert(run("Mixed CASE Words") == Map("mixed" -> 1L, "case" -> 1L, "words" -> 1L))
  }

  test("golden corpus end-to-end") {
    val got = run("the cat sat", "the cat", "THE")
    assert(got == Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L))
  }

  test("output is ordered alphabetically (reference std::map order)") {
    val words = WordCount.wordCount(Seq("b a c b").toDF("text"))
      .collect().map(_.getString(0)).toSeq
    assert(words == words.sorted)
  }

  test("RDD and DataFrame formulations agree on testdata") {
    val docs = Tables.documents(spark, sf0001)
    val df = WordCount.wordCount(docs).collect().map(r => (r.getString(0), r.getLong(1)))
    val rdd = WordCount.wordCountRdd(spark, docs).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(df.toSeq == rdd.toSeq)
  }

  private val vocab = Seq("the", "Cat!", "123", "don't", "[x]", "Big", "a-b", "Zoo")

  test("property: counts are partition-additive (map-side combine law)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val a = Seq.fill(rnd.nextInt(20) + 1)(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(20) + 1)(vocab(rnd.nextInt(vocab.size)))
      val merged = run(a.mkString(" ") + " " + b.mkString(" "))
      val parts = (run(a.mkString(" ")).toSeq ++ run(b.mkString(" ")).toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      assert(merged == parts)
    }
  }

  test("property: total count equals number of surviving tokens") {
    val rnd = new scala.util.Random(7)
    val re = WordCount.CleanPattern.r
    for (_ <- 1 to 10) {
      val toks = Seq.fill(rnd.nextInt(30) + 1)(
        rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString)
      val surviving = toks.flatMap(t => re.findFirstIn(t)).count(_.nonEmpty)
      val total = run(toks.mkString(" ")).values.sum
      assert(total == surviving)
    }
  }

  /** Literal simulation of the reference cleaner (`sendFileByFile.cpp:
    * 89-93`): scan for the first char outside {`'`, ASCII 65..122},
    * truncate there (single-arg `erase` semantics), then ASCII
    * tolower — differentially fuzzed against our regex formulation.
    */
  private def referenceClean(token: String): String = {
    val cut = token.indexWhere(c => !(c == '\'' || (c >= 65 && c <= 122)))
    val kept = if (cut < 0) token else token.substring(0, cut)
    kept.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
  }

  test("differential fuzz: regex cleaner == reference C++ semantics") {
    val rnd = new scala.util.Random(99)
    val pool = ('!' to '~') ++ Seq('\'', '[', '\\', ']', '^', '_', '`')
    val re = WordCount.CleanPattern.r
    for (_ <- 1 to 2000) {
      val tok = Seq.fill(rnd.nextInt(12) + 1)(pool(rnd.nextInt(pool.size))).mkString
      val viaRegex = re.findFirstIn(tok).getOrElse("")
        .map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      assert(viaRegex == referenceClean(tok), s"token <$tok>")
    }
  }

  test("reference defects NOT reproduced: long tokens and multibyte input") {
    // >=30-char tokens are buffer-overflow UB in the reference
    // (sendFileByFile.cpp:95); here they count like any other token
    val long = "x" * 500
    assert(run(s"$long $long") == Map(long -> 2L))
    // multibyte chars truncate at the first disallowed char (signed-char
    // comparison made this accidental in the reference; defined here)
    assert(run("héllo") == Map("h" -> 1L))
    assert(run("日本語") == Map.empty)
  }

  test("salted word count equals plain word count") {
    val docs = Tables.documents(spark, sf0001)
    val plain = WordCount.wordCount(docs).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = WordCount.wordCountSalted(docs, 16).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(plain == salted)
  }

  test("topK takes by count desc then word asc") {
    val top = WordCount.topK(Seq("b b a a c").toDF("text"), 2)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("a", "b"))
  }
}
