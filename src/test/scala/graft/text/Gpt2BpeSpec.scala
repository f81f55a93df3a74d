package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the byte-level GPT-2-format tokenizer against PUBLISHED facts of
  * the format: the `bytes_to_unicode` table values, the byte-unit id
  * layout of GPT-2's own vocab.json (ids 0..255), the pre-tokenizer
  * regex's documented splits, the vocab.json/merges.txt parse +
  * export round-trip, and byte-level's defining law — lossless decode of
  * ANY string.
  */
class Gpt2BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bytes_to_unicode matches the published table: identity ranges, " +
       "shifted controls, bijection") {
    // published known values (OpenAI encoder.py): space->U+0120 'Gdot',
    // newline->U+010A, tab->U+0109
    assert(Gpt2Bpe.byteToChar(0x20) == 'Ġ')
    assert(Gpt2Bpe.byteToChar(0x0A) == 'Ċ')
    assert(Gpt2Bpe.byteToChar(0x09) == 'ĉ')
    // printable ranges map to themselves
    ((33 to 126) ++ (161 to 172) ++ (174 to 255)).foreach { b =>
      assert(Gpt2Bpe.byteToChar(b) == b.toChar, s"byte $b must self-map")
    }
    // bijection: 256 distinct chars, inverse round-trips every byte
    assert(Gpt2Bpe.byteToChar.distinct.length == 256)
    (0 until 256).foreach { b =>
      assert(Gpt2Bpe.charToByte(Gpt2Bpe.byteToChar(b).toInt) == b)
    }
    // toByteUnits/fromByteUnits round-trip multi-byte UTF-8
    val s = "café über 日本 😀\ttab"
    assert(Gpt2Bpe.fromByteUnits(Gpt2Bpe.toByteUnits(s)) == s)
  }

  test("byte-unit vocab order reproduces GPT-2's published ids 0..255") {
    val units = Gpt2Bpe.byteUnitsInVocabOrder
    assert(units.length == 256 && units.distinct.length == 256)
    // published GPT-2 vocab.json facts: '!'=0, 'A'=32, 'a'=64, '~'=93,
    // space ('Ġ')=220, newline ('Ċ')=198
    assert(units(0) == "!")
    assert(units(32) == "A")
    assert(units(64) == "a")
    assert(units(93) == "~")
    assert(units(220) == "Ġ")
    assert(units(198) == "Ċ")
  }

  test("pre-tokenizer: published GPT-2 regex splits — leading space rides " +
       "the word, contractions split, case preserved, full tiling") {
    assert(Gpt2Bpe.preTokenize("Hello world!") ==
      Seq("Hello", " world", "!"))
    assert(Gpt2Bpe.preTokenize("don't") == Seq("don", "'t"))
    assert(Gpt2Bpe.preTokenize("I've 12 apples") ==
      Seq("I", "'ve", " 12", " apples"))
    // interior multi-space: the run keeps all but the last space, which
    // attaches to the following word
    assert(Gpt2Bpe.preTokenize("a  b") == Seq("a", " ", " b"))
    // trailing whitespace is its own token; newline splits
    assert(Gpt2Bpe.preTokenize("hi \n") == Seq("hi", " \n"))
    // tiling law: concatenating the pre-tokens reproduces the input
    val texts = Seq("Mixed CASE, 42 numbers\tand\nlines  here! éè",
      "", " ", "  leading", "trailing  ")
    texts.foreach { t =>
      assert(Gpt2Bpe.preTokenize(t).mkString == t, s"tiling broke on '$t'")
    }
  }

  test("a hand-built GPT-2-format vocab.json/merges.txt loads and encodes " +
       "by the greedy rank loop") {
    // mini model: byte units at ids 0..255 (the format's layout), then
    // merge products. merges: h+e, l+l, he+ll, hell+o, Ġ+h
    val units = Gpt2Bpe.byteUnitsInVocabOrder
    val products = Vector("he", "ll", "hell", "hello", "Ġh")
    val vocabJson = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.createObjectNode()
      (units ++ products).zipWithIndex.foreach { case (t, i) => node.put(t, i) }
      m.writeValueAsString(node)
    }
    val mergesTxt =
      "#version: 0.2\nh e\nl l\nhe ll\nhell o\nĠ h\n"
    val model = Gpt2Bpe.load(vocabJson, mergesTxt)
    assert(model.merges == Vector(("h", "e"), ("l", "l"), ("he", "ll"),
      ("hell", "o"), ("Ġ", "h")))
    // "hello" fully merges: [he,l,l,o]->[he,ll,o]->[hell,o]->[hello]
    assert(Gpt2Bpe.encodeIds("hello", model.ranks, model.ids).toSeq ==
      Seq(256 + 3))
    // " hello": Ġ+h fires only AFTER h is a bare symbol — but h e
    // (rank 0) beats it, so [Ġ,he,ll,o] -> no (Ġ,he) rule ->
    // 1 + merged-word pieces; greedy rank order is what's being pinned
    val spaceHello = Gpt2Bpe.encodeIds(" hello", model.ranks, model.ids)
    assert(Gpt2Bpe.decode(spaceHello.toSeq, model) == " hello")
    // case preserved: "Hello" has no h merge (capital H), so H e l l o
    // merges only l+l: [H,e,ll,o]
    val hello2 = Gpt2Bpe.encodeIds("Hello", model.ranks, model.ids)
    assert(hello2.length == 4, s"got ${hello2.length}")
    assert(Gpt2Bpe.decode(hello2.toSeq, model) == "Hello")
    // count and ids walk the same loop
    Seq("hello", " hello", "Hello world!", "don't\n").foreach { t =>
      assert(Gpt2Bpe.countTokens(t, model.ranks) ==
        Gpt2Bpe.encodeIds(t, model.ranks, model.ids).length.toLong)
    }
  }

  test("load keeps '#'-initial merge rules — only a first-line '#version' " +
       "header is a comment ('#' is a real byte unit)") {
    // encoder.py skips exactly one line; HF tokenizers skips only a
    // '#version' header. The published GPT-2 merges.txt contains real
    // rules whose first symbol starts with '#' (e.g. '# #' -> '##').
    val units = Gpt2Bpe.byteUnitsInVocabOrder
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def vocabOf(products: Seq[String]): String = {
      val node = m.createObjectNode()
      (units ++ products).zipWithIndex.foreach { case (t, i) => node.put(t, i) }
      m.writeValueAsString(node)
    }
    val model = Gpt2Bpe.load(vocabOf(Seq("##", "###")),
      "#version: 0.2\n# #\n## #\n")
    assert(model.merges == Vector(("#", "#"), ("##", "#")),
      "'#'-initial rules after the header must be kept")
    // '##' is ONE token; '#' alone is the byte unit (id 35-33 = 2)
    assert(Gpt2Bpe.encodeIds("##", model.ranks, model.ids).toSeq == Seq(256))
    assert(Gpt2Bpe.encodeIds("###", model.ranks, model.ids).toSeq == Seq(257))
    // greedy: rank-0 '# #' fires twice before rank-1 '## #' can
    assert(Gpt2Bpe.encodeIds("####", model.ranks, model.ids).toSeq ==
      Seq(256, 256))
    assert(Gpt2Bpe.decode(Seq(256, 256), model) == "####")
    // a headerless merges.txt keeps its first line as a real rule
    val noHeader = Gpt2Bpe.load(vocabOf(Seq("##")), "# #\n")
    assert(noHeader.merges == Vector(("#", "#")))
    // export -> load round-trips a model whose first merge is '#'-initial
    val re = Gpt2Bpe.load(Gpt2Bpe.exportVocabJson(noHeader),
      Gpt2Bpe.exportMergesTxt(noHeader))
    assert(re.merges == noHeader.merges && re.encoder == noHeader.encoder)
  }

  test("load reproduces the real pretrained GPT-2 tokenization on the " +
       "published head of merges.txt — ' the' is token 262") {
    // The first 25 rules of OpenAI's published gpt-2 merges.txt, in rank
    // order. Merge products take ids 256+rank in vocab.json, so these
    // pin widely-published real token ids: 'Ġthe' (' the') = 262,
    // 'ing' = 278, 'at' = 265, 'is' = 271, 'he' = 258.
    val publishedMerges = Vector(
      "Ġ t", "Ġ a", "h e", "i n", "r e", "o n", "Ġt he", "e r", "Ġ s",
      "a t", "Ġ w", "Ġ o", "e n", "Ġ c", "i t", "i s", "a n", "o r",
      "e s", "Ġ b", "e d", "Ġ f", "in g", "Ġ p", "o u")
    val products = publishedMerges.map(l => l.split(' ').mkString)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    (Gpt2Bpe.byteUnitsInVocabOrder ++ products).zipWithIndex.foreach {
      case (t, i) => node.put(t, i)
    }
    node.put("<|endoftext|>", 50256) // GPT-2's real placement
    val model = Gpt2Bpe.load(m.writeValueAsString(node),
      "#version: 0.2\n" + publishedMerges.mkString("\n") + "\n")
    assert(model.encoder("Ġthe") == 262 && model.encoder("Ġt") == 256)
    def ids(t: String) = Gpt2Bpe.encodeIds(t, model.ranks, model.ids).toSeq
    // the famous one: ' the' is a single token, id 262, built
    // Ġ+t (rank 0) then h+e (rank 2) then Ġt+he (rank 6)
    assert(ids(" the") == Seq(262))
    // words that resolve fully inside the published head
    assert(ids("he") == Seq(258))
    assert(ids("at") == Seq(265))
    assert(ids("is") == Seq(271))
    assert(ids("on") == Seq(261))
    assert(ids("ing") == Seq(278)) // in+g via rank 22, after i+n rank 3
    // greedy rank order, not longest-match: 'the' (no leading space)
    // has no 't he' rule in the head, so it is [t, he] = [83, 258]
    assert(ids("the") == Seq(83, 258))
    // ' at': Ġ+a (rank 1) beats a+t (rank 9), leaving [Ġa, t]
    assert(ids(" at") == Seq(257, 83))
    // pre-tokenizer composes: ' the the' is two identical tokens
    assert(ids(" the the") == Seq(262, 262))
    assert(Gpt2Bpe.decode(ids(" the is at ing"), model) == " the is at ing")
  }

  test("load validation refuses a vocab missing byte units or merge products") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val bad1 = m.createObjectNode(); bad1.put("x", 0)
    val e1 = intercept[IllegalArgumentException](
      Gpt2Bpe.load(m.writeValueAsString(bad1), ""))
    assert(e1.getMessage.contains("byte unit"))
    val bad2 = m.createObjectNode()
    Gpt2Bpe.byteUnitsInVocabOrder.zipWithIndex.foreach { case (t, i) =>
      bad2.put(t, i)
    }
    val e2 = intercept[IllegalArgumentException](
      Gpt2Bpe.load(m.writeValueAsString(bad2), "a b\n"))
    assert(e2.getMessage.contains("merge product"))
  }

  test("fit -> export -> load round-trips the model through the public " +
       "format; encodings agree") {
    val d = Seq((1L, "low low low lower lowest the the the"),
      (2L, "The lowest low, lower than low.")).toDF("doc_id", "text")
    val fitted = Gpt2Bpe.fit(d, "text", numMerges = 30)
    assert(fitted.merges.nonEmpty)
    assert(fitted.encoder.contains("<|endoftext|>"),
      "format convention: the special token closes the id space")
    val reloaded = Gpt2Bpe.load(
      Gpt2Bpe.exportVocabJson(fitted), Gpt2Bpe.exportMergesTxt(fitted))
    assert(reloaded.encoder == fitted.encoder)
    assert(reloaded.merges == fitted.merges)
    Seq("low lower lowest", "The THE the", "unseen words here").foreach { t =>
      assert(Gpt2Bpe.encodeIds(t, reloaded.ranks, reloaded.ids).toSeq ==
        Gpt2Bpe.encodeIds(t, fitted.ranks, fitted.ids).toSeq)
    }
    // training is deterministic
    assert(Gpt2Bpe.fit(d, "text", numMerges = 30).merges == fitted.merges)
  }

  test("byte-level law: decode(encode(t)) == t for ANY string — case, " +
       "whitespace, unicode, emoji") {
    val d = Seq((1L, "some training text, quite unrelated")).toDF("doc_id", "text")
    val model = Gpt2Bpe.fit(d, "text", numMerges = 10)
    val tricky = Seq(
      "MiXeD CaSe PRESERVED",
      "  leading and trailing  ",
      "tabs\there\nnewlines\r\nCRLF",
      "café über straße",
      "日本語 한국어",
      "emoji 😀🎉 and zwj 👨‍💻",
      "quotes “curly” and 'straight'",
      "")
    tricky.foreach { t =>
      val ids = Gpt2Bpe.encodeIds(t, model.ranks, model.ids)
      assert(Gpt2Bpe.decode(ids.toSeq, model) == t,
        s"round-trip broke on '$t'")
    }
    // random ASCII+unicode fuzz (seeded): sample whole CODE POINTS so
    // every generated string is well-formed (no lone surrogates)
    val rnd = new scala.util.Random(7L)
    val alphabet = Vector("a", "b", "A", "B", "1", "2", " ", "\t", "\n",
      ".", ",", "!", "?", "é", "中", "😀")
    (1 to 50).foreach { _ =>
      val t = (1 to rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val ids = Gpt2Bpe.encodeIds(t, model.ranks, model.ids)
      assert(Gpt2Bpe.decode(ids.toSeq, model) == t,
        s"fuzz round-trip broke on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("added tokens encode atomically: '<|endoftext|>' inside a document " +
       "is ONE id with addedTokens, many pieces without") {
    val d = Seq((1L, "some words to learn a few merges from, words words"))
      .toDF("doc_id", "text")
    val model = Gpt2Bpe.fit(d, "text", numMerges = 12)
    val eot = "<|endoftext|>"
    val eotId = model.encoder(eot)
    val sp = Gpt2Bpe.specialsOf(model, Seq(eot))
    val text = s"doc one$eot doc two"
    val plain = Gpt2Bpe.encodeIds(text, model.ranks, model.ids).toSeq
    val withSp = Gpt2Bpe.encodeIdsSpecial(text, model.ranks, model.ids, sp).toSeq
    assert(!plain.contains(eotId), "plain encode must split the literal")
    assert(withSp.count(_ == eotId) == 1, "added-token encode emits one id")
    // the surrounding text still decodes losslessly
    assert(Gpt2Bpe.decode(withSp, model) == text)
    // count agrees with ids length on both paths
    assert(Gpt2Bpe.countTokensSpecial(text, model.ranks, sp) == withSp.length)
    assert(Gpt2Bpe.countTokens(text, model.ranks) == plain.length)
    // segments are tokenized INDEPENDENTLY (HF behavior): the pre-token
    // regex cannot ride a space across the boundary
    assert(Gpt2Bpe.encodeIdsSpecial(s"$eot$eot", model.ranks, model.ids,
      sp).toSeq == Seq(eotId, eotId))
    // leading/trailing placement
    assert(Gpt2Bpe.encodeIdsSpecial(eot, model.ranks, model.ids, sp).toSeq ==
      Seq(eotId))
    // unknown added token refuses
    val e = intercept[IllegalArgumentException](
      Gpt2Bpe.specialsOf(model, Seq("<|missing|>")))
    assert(e.getMessage.contains("not in the vocab"))
    // column API: codegen path agrees with the driver walk
    val docs = Seq((1L, text), (2L, s"$eot alone"), (3L, "no special here"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Gpt2Bpe.encode(col("text"), model, Seq(eot)).as("ids"),
        Gpt2Bpe.tokenCount(col("text"), model, Seq(eot)).as("n"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2)))
      .sortBy(_._1)
    docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .zip(got).foreach { case ((_, t), (_, ids, n)) =>
        assert(ids == Gpt2Bpe.encodeIdsSpecial(t, model.ranks, model.ids,
          sp).toSeq)
        assert(n == ids.length.toLong)
      }
  }

  test("overlapping added tokens: longest match wins at a tied position " +
       "(HF AddedToken semantics)") {
    val units = Gpt2Bpe.byteUnitsInVocabOrder
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    units.zipWithIndex.foreach { case (t, i) => node.put(t, i) }
    node.put("<s>", 256)
    node.put("<ss>", 257)
    val model = Gpt2Bpe.load(m.writeValueAsString(node), "")
    val sp = Gpt2Bpe.specialsOf(model, Seq("<s>", "<ss>"))
    // '<ss>' starts where '<s>' also matches — longest-first wins; note
    // '<s' of a would-be '<s>' overlaps '<ss>' only as full literals
    val ids = Gpt2Bpe.encodeIdsSpecial("<ss><s>", model.ranks, model.ids, sp)
    assert(ids.toSeq == Seq(257, 256))
  }

  test("column API: codegen'd encode/tokenCount agree with the driver-side " +
       "walk over a DataFrame") {
    val docs = Seq(
      (1L, "The quick Brown fox"),
      (2L, "jumps over the lazy dog!"),
      (3L, "the the the and AND And"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val model = Gpt2Bpe.fit(docs.filter(col("text").isNotNull), "text",
      numMerges = 25)
    val got = docs.select(col("doc_id"),
        Gpt2Bpe.encode(col("text"), model).as("ids"),
        Gpt2Bpe.tokenCount(col("text"), model).as("n"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Int](1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sortBy(_._1)
    docs.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1))).sortBy(_._1)
      .zip(got).foreach { case ((_, text), (_, ids, n)) =>
        if (text == null) assert(ids == null && n == -1L)
        else {
          assert(ids == Gpt2Bpe.encodeIds(text, model.ranks, model.ids).toSeq)
          assert(n == ids.length.toLong)
          assert(Gpt2Bpe.decode(ids, model) == text)
        }
      }
  }

  test("tokenizer.json round-trips and reads both merge encodings") {
    import spark.implicits._
    val model = Gpt2Bpe.fit(
      Seq("hello hi hello world", "hi there hello").toDF("text"),
      "text", numMerges = 10)
    val (back, specials) = Gpt2Bpe.loadTokenizerJson(
      Gpt2Bpe.exportTokenizerJson(model, Seq("<|endoftext|>")))
    assert(back == model)
    assert(specials == Vector("<|endoftext|>"))
    // the tokenizers >= 0.20 pair-array merge encoding parses
    // identically: rewrite the exported "a b" strings into ["a","b"]
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Gpt2Bpe.exportTokenizerJson(model))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val m = root.get("model")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val pairs = mapper.createArrayNode()
    m.get("merges").elements().forEachRemaining { n =>
      val sp = n.asText().indexOf(' ')
      val arr = mapper.createArrayNode()
      arr.add(n.asText().substring(0, sp))
      arr.add(n.asText().substring(sp + 1))
      pairs.add(arr)
      ()
    }
    m.set("merges", pairs)
    val (fromPairs, none) =
      Gpt2Bpe.loadTokenizerJson(mapper.writeValueAsString(root))
    assert(fromPairs == model)
    assert(none.isEmpty)
    // non-BPE files are refused, not mis-read
    val e = intercept[IllegalArgumentException] {
      Gpt2Bpe.loadTokenizerJson(
        """{"model": {"type": "WordPiece", "vocab": {}}}""")
    }
    assert(e.getMessage.contains("not BPE"))
  }

  test("tokenizer.json specials: only special:true added_tokens surface") {
    import spark.implicits._
    val model = Gpt2Bpe.fit(Seq("some text here").toDF("text"),
      "text", numMerges = 5)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Gpt2Bpe.exportTokenizerJson(model))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val added = root.putArray("added_tokens")
    val a1 = added.addObject()
    a1.put("id", model.encoder.size)
    a1.put("content", "<|endoftext|>")
    a1.put("special", true)
    val a2 = added.addObject()
    a2.put("id", model.encoder.size + 1)
    a2.put("content", "madeupword")
    a2.put("special", false)
    val (m2, specials) =
      Gpt2Bpe.loadTokenizerJson(mapper.writeValueAsString(root))
    assert(m2 == model)
    assert(specials == Vector("<|endoftext|>"),
      "non-special added tokens must not become specials")
  }
}
