package graft

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** The custom codegen'd DoubleArrayDot expression must agree exactly
  * with the interpreted HOF formulation (same sequential fold order →
  * bit-identical doubles), survive nulls, and reject wrong types. */
class ExpressionSpec extends SparkSpec {

  test("dotFast equals HOF dotD bit-for-bit on random-ish vectors") {
    import spark.implicits._
    val rows = (1 to 100).map { i =>
      val a = Array.tabulate(64)(j => math.sin(i * 64 + j))
      val b = Array.tabulate(64)(j => math.cos(i * 64 + j))
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        (V.dotFast($"a", $"b") - V.dotD($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).head.getDouble(0)
    assert(diff == 0.0, s"codegen vs interpreted drift: $diff")
  }

  test("dotFast null semantics: null array → null result") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(V.dotFast($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("dotFast rejects non-double arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(V.dotFast($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double_array_dot") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }

  test("dotFast handles length mismatch by folding the shorter prefix") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    assert(df.select(V.dotFast($"a", $"b")).head.getDouble(0) == 50.0)
  }

  test("normalizeFast equals the HOF normalize bit-for-bit (float and double inputs)") {
    import spark.implicits._
    val rowsF = (1 to 100).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }
    val dfF = rowsF.toDF("id", "v")
    val hof = dfF
      .withColumn("__nrm", V.l2Norm($"v"))
      .select(transform($"v", x =>
        when($"__nrm" =!= 0.0, x.cast("double") / $"__nrm")
          .otherwise(lit(0.0))).as("nemb"))
    val fast = dfF.select(V.normalizeFast($"v").as("nemb"))
    val drift = hof.select(explode($"nemb").as("x")).withColumn("rid", monotonically_increasing_id())
      .join(fast.select(explode($"nemb").as("y")).withColumn("rid", monotonically_increasing_id()), "rid")
      .agg(max(abs($"x" - $"y"))).head.getDouble(0)
    assert(drift == 0.0, s"codegen vs interpreted normalize drift: $drift")
    // double input path too
    val dfD = Seq((1L, Array(3.0, 4.0))).toDF("id", "v")
    val r = dfD.select(V.normalizeFast($"v")).head.getSeq[Double](0)
    assert(r == Seq(0.6, 0.8))
  }

  test("DoubleArrayQuantizeFloor equals the HOF floor-transform bit-for-bit; null edge") {
    import spark.implicits._
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.tabulate(64)(j => (math.sin(i * 64 + j) * 2).toFloat))
    }
    val df = rows.toDF("id", "v")
    def fast(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.DoubleArrayQuantizeFloor(
          org.apache.spark.sql.GraftExpressionBridge.expression(c), 1000.0))
    val drift = df
      .select($"id", fast($"v").as("a"),
        transform($"v", x => floor(x.cast("double") * 1000.0).cast("double")).as("b"))
      .select(explode(zip_with($"a", $"b", (x, y) => abs(x - y))).as("d"))
      .agg(max($"d")).head.getDouble(0)
    assert(drift == 0.0, s"codegen vs interpreted quantize drift: $drift")
    val withNull = Seq((1L, Array(0.5f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val out = withNull.select(fast($"v").as("q")).collect()
    assert(out(0).getSeq[Double](0) == Seq(500.0))
    assert(out(1).isNullAt(0), "null array must stay null")
  }

  test("normalizeFast: zero vector → zeros; null array → null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f, 0.0f))),
      (2L, Option.empty[Array[Float]])
    ).toDF("id", "v")
    val rows = df.select($"id", V.normalizeFast($"v").as("n")).orderBy($"id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
    assert(rows(1).isNullAt(1))
  }

  test("normalizeFast rejects non-numeric-array input at analysis time") {
    import spark.implicits._
    val df = Seq((Array("a", "b"))).toDF("v")
    val e = intercept[Exception] {
      df.select(V.normalizeFast($"v")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double_array_normalize") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }

  test("MinhashSignature equals the old explode→xxhash64→min-groupBy plan bit-for-bit") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val shingled = graft.api.Dedup.shingles(docs, "doc_id", "text", 3)
    val numHashes = 64
    val numSeeds = numHashes / 2
    // the pre-round-8 formulation, reconstructed verbatim
    val post = shingled.select($"doc_id", explode($"shingles").as("sh"))
    val withH = post.select($"doc_id" +:
      (0 until numSeeds).map(i => xxhash64($"sh", lit(i)).as(s"h$i")): _*)
    val minAggs = (0 until numSeeds).flatMap(i => Seq(
      min(shiftright(col(s"h$i"), 32).bitwiseAND(lit(4294967295L))).as(s"f${2 * i}"),
      min(col(s"h$i").bitwiseAND(lit(4294967295L))).as(s"f${2 * i + 1}")))
    val old = withH.groupBy($"doc_id").agg(minAggs.head, minAggs.tail: _*)
      .withColumn("old_sig", array((0 until numHashes).map(j => col(s"f$j")): _*))
      .select($"doc_id", $"old_sig")
    val neu = graft.api.Dedup.minhashSignatures(shingled, numHashes)
    assert(neu.count() == old.count(), "row counts differ (shingle-less doc exclusion?)")
    val mismatches = neu.join(old, "doc_id")
      .filter($"sig" =!= $"old_sig").count()
    assert(mismatches == 0L, s"$mismatches docs with differing signatures")
  }

  test("MinhashSignature: empty shingle array → null; null array → null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a b c", "b c d"))),
      (2L, Some(Seq.empty[String])),
      (3L, Option.empty[Seq[String]])
    ).toDF("doc_id", "shingles")
    val out = graft.api.Dedup.minhashSignatures(df, 8)
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(out.head.getSeq[Long](1).length == 8)
  }

  test("SimhashSignature equals the old explode→md5→vote-groupBy plan bit-for-bit") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val shingled = graft.api.Dedup.shingles(docs, "doc_id", "text", 3)
    // the pre-round-8 formulation, reconstructed verbatim
    val hex = md5($"sh".cast("binary"))
    val docTok = shingled
      .select($"doc_id", explode($"shingles").as("sh"))
      .withColumn("h1", conv(substring(hex, 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(hex, 9, 8), 16, 10).cast("long"))
    val bitSums = (0 until 64).map { j =>
      val (pa, pb) = graft.api.Dedup.simhashPlanes(j)
      sum(shiftright($"h1" * lit(pa) + $"h2" * lit(pb), 15)
        .bitwiseAND(lit(1L))).as(s"b$j")
    }
    val old = docTok.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), bitSums: _*)
      .withColumn("old_sig", (0 until 64).map(j =>
        when(col(s"b$j") * 2 > $"n", shiftleft(lit(1L), j)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)))
      .select($"doc_id", $"old_sig")
    val neu = shingled.select($"doc_id",
      org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.SimhashSignature(
          org.apache.spark.sql.GraftExpressionBridge.expression($"shingles"))).as("sig"))
      .filter($"sig".isNotNull)
    assert(neu.count() == old.count(), "row counts differ (shingle-less doc exclusion?)")
    val mismatches = neu.join(old, "doc_id").filter($"sig" =!= $"old_sig").count()
    assert(mismatches == 0L, s"$mismatches docs with differing simhash signatures")
  }

  test("WordShingles equals the old HOF lambda formulation bit-for-bit on real data") {
    import spark.implicits._
    for (n <- Seq(3, 8); sf <- Seq("sf0.001", "sf0.01")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      // the pre-round-8 lambda formulation, reconstructed verbatim
      val old = docs.select($"doc_id", expr(
        s"""transform(array(split(text, ' ')), t ->
           |  CASE WHEN size(t) >= $n THEN
           |    array_distinct(transform(sequence(1, size(t) - ${n - 1}), i ->
           |      concat_ws(' ', ${(0 until n).map(j => s"t[i-1+$j]").mkString(", ")})))
           |  ELSE array() END)[0]""".stripMargin).as("old_sh"))
      val neu = graft.api.Dedup.shingles(docs, "doc_id", "text", n)
      val bad = neu.join(old, "doc_id")
        .filter(not($"shingles" <=> $"old_sh")).count()
      assert(bad == 0L, s"$bad docs with differing shingle sets at $sf n=$n")
    }
  }

  test("WordShingles edge semantics: null text, short text, repeats, multi-space") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a b c d")),           // 2 shingles at n=3
      (2L, Some("a b")),               // shorter than n → empty
      (3L, Option.empty[String]),      // null → empty (old CASE semantics)
      (4L, Some("x y x y x y x y")),   // repeated shingles → distinct
      (5L, Some("a  b c"))             // double space → empty token kept
    ).toDF("doc_id", "text")
    val out = graft.api.Dedup.shingles(df, "doc_id", "text", 3)
      .orderBy($"doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1).isEmpty)
    assert(out(2).getSeq[String](1).isEmpty)
    assert(out(3).getSeq[String](1) == Seq("x y x", "y x y"))
    assert(out(4).getSeq[String](1) == Seq("a  b", " b c"))
  }

  test("SortedTokenSetKey equals the native sort/distinct/join chain on real data") {
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      val native = array_join(array_sort(array_distinct(split($"text", " "))), " ")
      val fast = org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.SortedTokenSetKey(
          org.apache.spark.sql.GraftExpressionBridge.expression($"text")))
      val bad = docs.select($"doc_id", native.as("a"), fast.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad == 0L, s"$bad docs with differing normalization keys at $sf")
    }
    // edge rows: null text → null; empty → ""; dup/unsorted tokens
    val df = Seq(
      (1L, Some("b a b c a")),
      (2L, Some("")),
      (3L, Option.empty[String])
    ).toDF("doc_id", "text")
    val fast = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.SortedTokenSetKey(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("text"))))
    val rows = df.select(fast).collect()
    assert(rows(0).getString(0) == "a b c")
    assert(rows(1).getString(0) == "")
    assert(rows(2).isNullAt(0))
  }

  test("TokenRunLengths equals the interpreted run-length lambda on real data") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val lambda = expr(
      """transform(array(sort_array(split(text, ' '))), s ->
        |  transform(array(filter(sequence(1, size(s)),
        |                         i -> i = 1 OR element_at(s, i) != element_at(s, i - 1))), st ->
        |    transform(sequence(1, size(st)), j -> struct(
        |      element_at(s, element_at(st, j)) AS token,
        |      CAST(coalesce(try_element_at(st, j + 1), size(s) + 1)
        |           - element_at(st, j) AS BIGINT) AS tf))
        |  )[0]
        |)[0]""".stripMargin)
    val fast = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.TokenRunLengths(
        org.apache.spark.sql.GraftExpressionBridge.expression($"text")))
    val bad = docs.select($"doc_id", lambda.as("a"), fast.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(bad == 0L, s"$bad docs with differing run-length sets")
    // null text → null
    val r = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.TokenRunLengths(
          org.apache.spark.sql.GraftExpressionBridge.expression(col("text"))))).head
    assert(r.isNullAt(0))
  }

  test("NgramRunLengths(n=1) equals TokenRunLengths on real data") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val one = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.NgramRunLengths(
        org.apache.spark.sql.GraftExpressionBridge.expression($"text"), 1))
    val tok = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.TokenRunLengths(
        org.apache.spark.sql.GraftExpressionBridge.expression($"text")))
    val bad = docs.select($"doc_id", one.as("a"), tok.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(bad == 0L, s"$bad docs where NgramRunLengths(1) != TokenRunLengths")
  }

  test("NgramRunLengths(n=2) equals the lambda bigram counts on real data") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    // independent formulation: positional lambda bigrams, exploded and
    // counted — the (doc, bigram) multiset the compiled pass must match
    val lambdaBg = expr(
      """CASE WHEN size(split(text, ' ')) >= 2 THEN
        |  transform(sequence(1, size(split(text, ' ')) - 1), i ->
        |    concat_ws(' ', element_at(split(text, ' '), i),
        |                   element_at(split(text, ' '), i + 1)))
        |ELSE array() END""".stripMargin)
    val a = docs.select($"doc_id", explode(lambdaBg).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("tf"))
    val b = docs.select($"doc_id", explode(
        org.apache.spark.sql.GraftExpressionBridge.column(
          graft.plans.NgramRunLengths(
            org.apache.spark.sql.GraftExpressionBridge.expression($"text"), 2))).as("e"))
      .select($"doc_id", $"e.token".as("bg"), $"e.tf".as("tf"))
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L,
      "bigram (doc, token, tf) multisets differ")
    // < n tokens → empty array (doc drops out of the explode); null → null
    val edge = Seq((1L, Some("solo")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
      .select(org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.NgramRunLengths(
          org.apache.spark.sql.GraftExpressionBridge.expression(col("text")), 2)))
      .collect()
    assert(edge(0).getSeq[Any](0).isEmpty)
    assert(edge(1).isNullAt(0))
  }

  test("BoundedCollectList: complete under cap, truncated at cap+1 over it, count-independent") {
    import spark.implicits._
    // 3 keys: occupancy 2 (under), 5 (at cap), 40 (over) — spread over
    // many partitions so merge() truncation is exercised, not just update()
    val rows = (1 to 2).map(i => ("a", i.toLong)) ++
      (1 to 5).map(i => ("b", i.toLong)) ++
      (1 to 40).map(i => ("c", i.toLong))
    val df = spark.createDataFrame(rows).toDF("k", "v").repartition(16)
    val out = df.groupBy($"k")
      .agg(graft.plans.BoundedCollectList.agg($"v", 5).as("ds"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1).sorted, r.getLong(2))).toMap
    assert(out("a") == (Seq(1L, 2L), 2L), "under-cap list must be complete")
    assert(out("b")._1 == (1L to 5L) && out("b")._2 == 5L, "at-cap list must be complete")
    assert(out("c")._1.length == 6 && out("c")._2 == 40L,
      s"over-cap list must truncate at cap+1 with the true count intact, got ${out("c")}")
    assert(out("c")._1.forall(v => v >= 1 && v <= 40))
  }

  test("double_array_dot is SQL-callable after GraftFunctions.register") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("dot_in")
    val r = spark.sql("SELECT double_array_dot(a, b) AS d FROM dot_in").head.getDouble(0)
    assert(r == 11.0)
  }

  test("the round-8 text/vector expressions are SQL-callable after register") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, "b a b c", Array(3.0f, 4.0f))).toDF("id", "t", "v")
      .createOrReplaceTempView("expr_in")
    val r = spark.sql(
      """SELECT word_shingles(t, 2) AS sh, sorted_token_set_key(t) AS k,
        |       token_run_lengths(t) AS rl, double_array_normalize(v) AS nv,
        |       ngram_run_lengths(t, 2) AS brl
        |FROM expr_in""".stripMargin).head
    assert(r.getSeq[String](0) == Seq("b a", "a b", "b c"))
    assert(r.getString(1) == "a b c")
    assert(r.getSeq[org.apache.spark.sql.Row](2).map(x => (x.getString(0), x.getLong(1)))
      == Seq(("a", 1L), ("b", 2L), ("c", 1L)))
    assert(r.getSeq[Double](3) == Seq(0.6, 0.8))
    assert(r.getSeq[org.apache.spark.sql.Row](4).map(x => (x.getString(0), x.getLong(1)))
      == Seq(("a b", 1L), ("b a", 1L), ("b c", 1L)))
  }

  test("CharPolyHash equals the interpreted per-char aggregate fold on real data x2 SFs") {
    import spark.implicits._
    val lambda = expr(
      "aggregate(split(text, ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.documents(spark, sf)
      val fast = org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.CharPolyHash(
          org.apache.spark.sql.GraftExpressionBridge.expression($"text")))
      val bad = docs.select($"doc_id", lambda.as("a"), fast.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad == 0L, s"$bad docs with differing fingerprints at $sf")
    }
  }

  test("CharPolyHash edge cases: empty string, punctuation, null, non-ASCII code points") {
    import spark.implicits._
    val lambda = expr(
      "aggregate(split(text, ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)")
    val fast = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.CharPolyHash(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("text"))))
    val df = Seq(
      (1L, Some("")),                       // [""] -> ascii 0 -> fp 0
      (2L, Some("a")),
      (3L, Some("Hello, wor4ld! \t~")),
      (4L, Option.empty[String]),
      (5L, Some("caf\u00e9 \u4e2d\u6587")),    // 2- and 3-byte UTF-8 code points
    ).toDF("doc_id", "text")
    val rows = df.select($"doc_id", lambda.as("a"), fast.as("b"))
      .orderBy($"doc_id").collect()
    assert(rows(0).getLong(2) == 0L)
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2), s"doc ${r.getLong(0)}: null mismatch")
      else assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: lambda ${r.getLong(1)} != compiled ${r.getLong(2)}")
    }
  }

  test("CharPolyHash.compute never reads past the buffer on malformed UTF-8") {
    import org.apache.spark.unsafe.types.UTF8String
    // Malformed sequences a well-formed UTF8String never contains; the
    // unchecked unsafe getByte reads must stay inside numBytes. Each
    // invalid/truncated byte is consumed as its own code point (= the
    // byte value), so results are deterministic and, crucially, the
    // fold cannot walk off the end of the buffer (the ADVICE r9 case:
    // a truncated multibyte LEADER at the end of the buffer).
    def fp(bytes: Array[Byte]): Long =
      graft.plans.CharPolyHash.compute(UTF8String.fromBytes(bytes))
    val p = 1000000007L
    // truncated 2-byte leader at end: 0xC3 alone -> one cp 0xC3
    assert(fp(Array(0xC3.toByte)) == 0xC3L)
    // truncated 3-byte sequence (leader + one continuation) at end
    assert(fp(Array(0xE4.toByte, 0xB8.toByte)) == (0xE4L * 31 + 0xB8) % p)
    // truncated 4-byte sequence at end, after valid ASCII
    assert(fp(Array('a'.toByte, 0xF0.toByte, 0x9F.toByte)) ==
      (('a'.toLong * 31 + 0xF0) * 31 + 0x9F) % p)
    // bare continuation byte: must NOT select a multibyte branch
    assert(fp(Array(0x80.toByte)) == 0x80L)
    // invalid 0xF8+ leader: ditto (previously fell into the 4-byte branch)
    assert(fp(Array(0xF9.toByte)) == 0xF9L)
    // well-formed input is untouched by the guard: "café" = 5 bytes
    val wellFormed = "café".getBytes("UTF-8")
    assert(fp(wellFormed) ==
      graft.plans.CharPolyHash.compute(UTF8String.fromString("café")))
  }

  test("SpanDigests: rolling digests equal direct recomputation; equal spans collide; edges") {
    import org.apache.spark.unsafe.types.UTF8String
    def dig(text: String, len: Int): Seq[Long] = {
      val a = graft.plans.SpanDigests.compute(UTF8String.fromString(text), len)
      (0 until a.numElements()).map(a.getLong)
    }
    // rolling == direct: every window digest equals the digest of that
    // window rendered as its own text (the rolling subtraction must be
    // exact under mod-2^64 wraparound)
    val toks = Seq("alpha", "b", "gamma42", "b", "alpha", "zz")
    val text = toks.mkString(" ")
    for (len <- 1 to toks.length) {
      val rolled = dig(text, len)
      val direct = toks.sliding(len).map(w => dig(w.mkString(" "), len).head).toSeq
      assert(rolled == direct, s"len=$len: $rolled != $direct")
    }
    // equal spans collide, unequal spans don't (on this fixture)
    val d2 = dig(text, 1)
    assert(d2(0) == d2(4) && d2(1) == d2(3), "equal tokens must share a digest")
    assert(d2.distinct.size == 4, s"distinct tokens collided: $d2")
    // edges: fewer tokens than len -> empty; null handled by the
    // expression's null-safe wrapper (not compute)
    assert(dig("a b", 3).isEmpty)
    assert(dig("", 1).size == 1) // split("") = [""] -> one span
  }

  test("RepetitionStats equals the interpreted gopher lambda struct on real data x2 SFs") {
    import spark.implicits._
    val lambda = expr(
      """transform(array(split(text, ' ')), t -> struct(
        |  size(t) AS n_tokens,
        |  aggregate(array_sort(t),
        |    struct(0 AS best, 0 AS cur, CAST(NULL AS STRING) AS prev),
        |    (a, x) -> struct(
        |      greatest(a.best, IF(a.prev IS NOT NULL AND x = a.prev, a.cur + 1, 1)) AS best,
        |      IF(a.prev IS NOT NULL AND x = a.prev, a.cur + 1, 1) AS cur,
        |      x AS prev),
        |    a -> a.best) AS top_tok,
        |  IF(size(t) < 2, 0,
        |    size(array_distinct(transform(sequence(1, size(t) - 1),
        |      i -> concat_ws(' ', t[i-1], t[i]))))) AS n_bi_distinct
        |))[0]""".stripMargin)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.documents(spark, sf)
      val fast = org.apache.spark.sql.GraftExpressionBridge.column(
        graft.plans.RepetitionStats(
          org.apache.spark.sql.GraftExpressionBridge.expression($"text")))
      val bad = docs.select($"doc_id", lambda.as("a"), fast.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad == 0L, s"$bad docs with differing repetition stats at $sf")
    }
  }

  test("RepetitionStats edge cases: 1-token doc, empty string, repeats, null") {
    import spark.implicits._
    val fast = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.RepetitionStats(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("text"))))
    val rows = Seq(
      (1L, Some("solo")),            // (1, 1, 0): <2 tokens -> 0 bigrams
      (2L, Some("")),                // split("")=[""]: (1, 1, 0)
      (3L, Some("a b a b a")),       // (5, 3, 2): runs a=3; bigrams {a b, b a}
      (4L, Some("x x x x")),         // (4, 4, 1)
      (5L, Option.empty[String]),
    ).toDF("doc_id", "text").select($"doc_id", fast.as("s")).orderBy($"doc_id").collect()
    def st(i: Int) = { val r = rows(i).getStruct(1); (r.getInt(0), r.getInt(1), r.getInt(2)) }
    assert(st(0) == ((1, 1, 0)))
    assert(st(1) == ((1, 1, 0)))
    assert(st(2) == ((5, 3, 2)))
    assert(st(3) == ((4, 4, 1)))
    assert(rows(4).isNullAt(1))
  }
}
